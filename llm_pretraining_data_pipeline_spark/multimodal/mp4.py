"""Pure-stdlib MP4/ISO-BMFF metadata parser for the video path.

Completes the modality trio of REAL parsers — PNG decodes pixels, WAV
decodes samples, MP4 parses the container header — so video frame-sampling
plans (``media.frame_sample_plan``) can run from durations read out of the
ACTUAL payload bytes instead of trusted side-channel metadata. This is the
metadata-only design the multimodal charter mandates for video: no codec
work, just the ISO 14496-12 box walk — ``ftyp`` (brand), ``moov/mvhd``
(timescale + duration, version 0 and 1), ``moov/trak/tkhd`` (16.16
fixed-point presentation width/height). Everything a sampling planner
needs; frame DECODE stays behind the ffmpeg swap-in documented in
``media.py``.

Guards mirror ``png.py``/``wav.py``: declared box sizes are validated
against the physical payload before any slice (a 2^32-1 size field must
surface as decode_ok=false, never a giant allocation), box headers shorter
than 8 bytes raise, recursion depth is capped, and a missing ``mvhd``
raises rather than defaulting.

The matching ``encode_mp4_stub`` builds a minimal valid ftyp+moov payload
from closed-form parameters so the parser is verified END-TO-END
(encode → parse → stats equals the closed form, recomputed independently
by the DuckDB referee in ``mm_mp4_meta``).
"""

from __future__ import annotations

import struct

_MAX_DEPTH = 8


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_mp4_stub(
    timescale: int,
    duration: int,
    width: int,
    height: int,
    brand: bytes = b"isom",
    mvhd_version: int = 0,
) -> bytes:
    """Minimal valid ftyp + moov(mvhd + trak(tkhd)) container."""
    if mvhd_version == 0:
        mvhd = _box(
            b"mvhd",
            struct.pack(
                ">B3x4s4sII",
                0,
                b"\x00" * 4,
                b"\x00" * 4,
                timescale,
                duration,
            )
            + b"\x00" * 80,  # rate/volume/matrix/predefines/next_track_id
        )
    elif mvhd_version == 1:
        mvhd = _box(
            b"mvhd",
            struct.pack(
                ">B3x8s8sIQ",
                1,
                b"\x00" * 8,
                b"\x00" * 8,
                timescale,
                duration,
            )
            + b"\x00" * 80,
        )
    else:
        raise ValueError(f"encode_mp4_stub: mvhd_version={mvhd_version}")
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + b"\x00" * 4  # creation
        + b"\x00" * 4  # modification
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4  # reserved
        + struct.pack(">I", duration if duration < 2**32 else 0)
        + b"\x00" * 8  # reserved
        + b"\x00" * 2 * 3  # layer / alternate_group / volume
        + b"\x00" * 2  # reserved
        + b"\x00" * 36  # matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    return ftyp + moov


def _walk(data: bytes, start: int, end: int, depth: int = 0):
    """Yield (box_type, payload_start, payload_end) at one nesting level."""
    if depth > _MAX_DEPTH:
        raise ValueError("parse_mp4: box nesting deeper than supported")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("parse_mp4: truncated box header")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if body + 8 > end:
                raise ValueError("parse_mp4: truncated largesize header")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            if size < 16:
                raise ValueError(f"parse_mp4: invalid largesize {size}")
        elif size == 0:  # box extends to end of file
            size = end - pos
        elif size < 8:
            raise ValueError(f"parse_mp4: invalid box size {size}")
        if pos + size > end:
            raise ValueError(
                f"parse_mp4: box {btype!r} declares {size} bytes, "
                f"{end - pos} remain"
            )
        yield btype, body, pos + size
        pos += size


def parse_mp4_meta(data: bytes) -> dict:
    """Parse container metadata: brand, timescale, duration, width, height.

    Raises ``ValueError`` on anything malformed (bad sizes, truncation,
    missing moov/mvhd, non-MP4 payloads)."""
    if len(data) < 12:
        raise ValueError("parse_mp4: payload shorter than one box header")
    brand = None
    timescale = None
    duration = None
    width = None
    height = None
    saw_moov = False
    for btype, body, boxend in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            if boxend - body < 4:
                raise ValueError("parse_mp4: ftyp too short")
            brand = data[body : body + 4].decode("latin-1")
        elif btype == b"moov":
            saw_moov = True
            for ityp, ibody, iend in _walk(data, body, boxend, 1):
                if ityp == b"mvhd":
                    version = data[ibody]
                    if version == 0:
                        if iend - ibody < 4 + 4 + 4 + 4 + 4:
                            raise ValueError("parse_mp4: mvhd v0 too short")
                        timescale, duration = struct.unpack_from(
                            ">II", data, ibody + 12
                        )
                    elif version == 1:
                        if iend - ibody < 4 + 8 + 8 + 4 + 8:
                            raise ValueError("parse_mp4: mvhd v1 too short")
                        (timescale,) = struct.unpack_from(
                            ">I", data, ibody + 20
                        )
                        (duration,) = struct.unpack_from(
                            ">Q", data, ibody + 24
                        )
                    else:
                        raise ValueError(
                            f"parse_mp4: mvhd version {version}"
                        )
                elif ityp == b"trak":
                    for ttyp, tbody, tend in _walk(data, ibody, iend, 2):
                        if ttyp == b"tkhd":
                            if tend - tbody < 84:
                                raise ValueError(
                                    "parse_mp4: tkhd too short"
                                )
                            w_fixed, h_fixed = struct.unpack_from(
                                ">II", data, tend - 8
                            )
                            w, h = w_fixed >> 16, h_fixed >> 16
                            # Real MP4s carry multiple tracks and audio
                            # tkhds declare 0x0 per spec — keep the first
                            # track's dims but let a later NON-ZERO track
                            # replace a zero placeholder, so the video
                            # track wins regardless of track order.
                            if width is None or (
                                (width, height) == (0, 0) and (w or h)
                            ):
                                width, height = w, h
    if not saw_moov:
        raise ValueError("parse_mp4: missing moov box")
    if timescale is None or duration is None:
        raise ValueError("parse_mp4: missing mvhd box")
    if timescale == 0:
        raise ValueError("parse_mp4: mvhd timescale is zero")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": duration * 1000.0 / timescale,
        "width": width,
        "height": height,
    }
