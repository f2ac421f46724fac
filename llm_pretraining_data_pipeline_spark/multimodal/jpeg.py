"""Pure-stdlib JPEG/JFIF header parser for the image path.

Web-curation pipelines sniff JPEG dimensions from the first few hundred
bytes of the payload (the ``imagesize`` pattern) — decoding is never needed
to gate on resolution, aspect ratio, or progressive encoding. This module
is that sniff, done properly: a strict ITU-T T.81 marker-segment walk from
``SOI`` to the first frame header, returning precision, height, width,
component count, and whether the frame is progressive (SOF2-family).

Together with ``png.py`` (full pixel decode), ``wav.py`` (sample decode)
and ``mp4.py`` (container walk) this completes the image/audio/video
metadata surface — every format the media fixtures exercise is parsed from
REAL bytes, not trusted side metadata.

Guards mirror the other codecs: segment lengths are validated against the
physical payload before any slice, a dimensions-of-zero frame raises, the
walk refuses to run past ``SOS`` (entropy-coded data — headers must appear
before it), and standalone/fill bytes are handled per spec (0xFF padding
before a marker, RST/TEM have no length field).

``encode_jpeg_stub`` emits a structurally valid SOI+APP0(JFIF)+SOF+SOS+EOI
stream from closed-form parameters so the parser is verified end-to-end
(encode → parse → stats equals the closed form, recomputed independently
by the DuckDB referee in ``mm_jpeg_meta``).
"""

from __future__ import annotations

import struct

# Frame markers (SOFn). C4=DHT, C8=JPG (reserved), CC=DAC are NOT frames.
_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}
# Standalone markers with no length field.
_STANDALONE = {0x01} | set(range(0xD0, 0xD8))  # TEM, RST0-7


def encode_jpeg_stub(
    width: int,
    height: int,
    components: int = 3,
    progressive: bool = False,
) -> bytes:
    """Minimal structurally-valid JFIF stream (headers + empty scan)."""
    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError(f"encode_jpeg_stub: bad dims {width}x{height}")
    if components not in (1, 3):
        raise ValueError(f"encode_jpeg_stub: components={components}")
    app0 = b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00"
    sof_marker = 0xC2 if progressive else 0xC0
    comp_specs = b"".join(
        bytes([cid, 0x11, 0 if cid == 1 else 1])
        for cid in range(1, components + 1)
    )
    sof = struct.pack(">BHH", 8, height, width) + bytes([components]) + comp_specs
    sos = bytes([components]) + b"".join(
        bytes([cid, 0x00]) for cid in range(1, components + 1)
    ) + bytes([0, 63, 0])

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    return (
        b"\xff\xd8"  # SOI
        + seg(0xE0, app0)
        + seg(sof_marker, sof)
        + seg(0xDA, sos)
        + b"\xff\xd9"  # EOI
    )


def parse_jpeg_meta(data: bytes) -> dict:
    """Parse frame metadata from a JPEG stream's marker segments.

    Returns ``{width, height, components, precision, progressive, jfif}``.
    Raises ``ValueError`` on anything malformed (no SOI, truncated
    segments, zero dimensions, SOS before any frame header).
    """
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("parse_jpeg: missing SOI marker")
    jfif = False
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(
                f"parse_jpeg: expected marker at offset {pos}, "
                f"got 0x{data[pos]:02x}"
            )
        # 0xFF fill bytes may pad before the marker id.
        while pos < n and data[pos] == 0xFF:
            pos += 1
        if pos >= n:
            raise ValueError("parse_jpeg: truncated at fill bytes")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI before any frame header
            raise ValueError("parse_jpeg: EOI before frame header")
        if marker in _STANDALONE:
            continue
        if pos + 2 > n:
            raise ValueError("parse_jpeg: truncated segment length")
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if seg_len < 2:
            raise ValueError(f"parse_jpeg: invalid segment length {seg_len}")
        if pos + seg_len > n:
            raise ValueError(
                f"parse_jpeg: segment 0x{marker:02x} declares {seg_len} "
                f"bytes, {n - pos} remain"
            )
        body = pos + 2
        if marker == 0xE0 and data[body : body + 5] == b"JFIF\x00":
            jfif = True
        if marker in _SOF_MARKERS:
            if seg_len < 2 + 6:
                raise ValueError("parse_jpeg: SOF segment too short")
            precision, height, width = struct.unpack_from(">BHH", data, body)
            components = data[body + 5]
            if width == 0 or height == 0:
                raise ValueError(
                    f"parse_jpeg: zero frame dimension {width}x{height}"
                )
            if seg_len < 2 + 6 + 3 * components:
                raise ValueError("parse_jpeg: SOF component specs truncated")
            return {
                "width": width,
                "height": height,
                "components": components,
                "precision": precision,
                "progressive": marker in _PROGRESSIVE,
                "jfif": jfif,
            }
        if marker == 0xDA:
            raise ValueError("parse_jpeg: SOS before frame header")
        pos += seg_len
    raise ValueError("parse_jpeg: no frame header before end of stream")
