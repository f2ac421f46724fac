"""Pure-stdlib GIF (87a/89a) STRUCTURE parser — the animation tier of
the image codec set (png = compressed stills, bmp = uncompressed, jpeg
= headers, gif = multi-frame/animation metadata).

Scope matches ``mp4.py``: structural walk, not pixel decode — frame
COUNT, logical-screen geometry, color-table shape, and the NETSCAPE
looping extension are what a multimodal curation pipeline needs to
route/filter animated media (an animated banner ad and a photo are
different corpus citizens); LZW pixel decoding is a gated heavy step a
real pipeline runs after triage, like JPEG entropy decode.

Strictness matches the codec trio: exact magic, bounds-checked logical
screen descriptor, every block walked to the trailer, sub-block chains
validated byte-exactly, declared-dimension decompression-bomb guards
BEFORE any allocation, a block-count cap against hostile streams, and
no trailing garbage. Malformed input raises ``ValueError`` — callers
surface it as ``decode_ok=false`` data rows.
"""

from __future__ import annotations

import struct

# Bomb guard on DECLARED pixel counts (logical screen and per frame) —
# same discipline as png.py's max_pixels: reject before allocating.
MAX_PIXELS = 1 << 24
# A hostile stream of empty extension blocks must not spin forever.
MAX_BLOCKS = 1 << 16


def _sub_blocks(
    data: bytes, pos: int, ctx: str, keep: bool = True
) -> tuple[bytes, int]:
    """Walk a GIF sub-block chain (len byte + payload, 0-terminated).
    Returns (concatenated payload, position after the terminator).
    ``keep=False`` validates and skips without copying — what the
    image-data path uses, since a structure-only parser would
    otherwise duplicate the whole LZW stream per frame just to
    discard it (review finding)."""
    out = bytearray() if keep else None
    n = len(data)
    blocks = 0
    while True:
        if pos >= n:
            raise ValueError(f"parse_gif: truncated sub-blocks in {ctx}")
        size = data[pos]
        pos += 1
        if size == 0:
            return (bytes(out) if keep else b""), pos
        blocks += 1
        if blocks > MAX_BLOCKS:
            raise ValueError(f"parse_gif: sub-block cap exceeded in {ctx}")
        if pos + size > n:
            raise ValueError(
                f"parse_gif: sub-block runs past buffer in {ctx}"
            )
        if keep:
            out += data[pos : pos + size]
        pos += size


def parse_gif(data: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Parse GIF structure. Returns ``{version, width, height, gct_flag,
    gct_colors, n_frames, animated, loop_count, n_extensions}`` —
    ``loop_count`` is the NETSCAPE 2.0 iteration count (0 = forever,
    None when the extension is absent), ``animated`` = more than one
    frame. Raises ``ValueError`` on anything malformed."""
    n = len(data)
    if n < 13:
        raise ValueError("parse_gif: shorter than header + LSD")
    magic = data[:6]
    if magic not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"parse_gif: bad magic {magic[:6]!r}")
    width, height = struct.unpack_from("<HH", data, 6)
    if width == 0 or height == 0:
        raise ValueError("parse_gif: zero logical screen dimension")
    if width * height > max_pixels:
        raise ValueError(
            f"parse_gif: logical screen {width}x{height} exceeds "
            f"{max_pixels} pixels (bomb guard)"
        )
    packed = data[10]
    gct_flag = bool(packed & 0x80)
    gct_colors = 2 << (packed & 0x07) if gct_flag else 0
    pos = 13
    if gct_flag:
        end = pos + 3 * gct_colors
        if end > n:
            raise ValueError("parse_gif: truncated global color table")
        pos = end

    n_frames = 0
    n_extensions = 0
    loop_count: int | None = None
    blocks = 0
    while True:
        if pos >= n:
            raise ValueError("parse_gif: missing trailer")
        blocks += 1
        if blocks > MAX_BLOCKS:
            raise ValueError("parse_gif: block cap exceeded")
        intro = data[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            if pos != n:
                raise ValueError(
                    f"parse_gif: {n - pos} trailing bytes after trailer"
                )
            break
        if intro == 0x21:  # extension
            if pos >= n:
                raise ValueError("parse_gif: truncated extension label")
            label = data[pos]
            pos += 1
            n_extensions += 1
            payload, pos = _sub_blocks(data, pos, f"ext 0x{label:02X}")
            if label == 0xFF and payload[:11] == b"NETSCAPE2.0":
                # app data: sub-block id 0x01 + LE16 loop count — the
                # chain above already concatenated the app sub-blocks
                if len(payload) >= 14 and payload[11] == 0x01:
                    loop_count = struct.unpack_from("<H", payload, 12)[0]
        elif intro == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("parse_gif: truncated image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
            fpacked = data[pos + 8]
            pos += 9
            if fw == 0 or fh == 0:
                raise ValueError("parse_gif: zero frame dimension")
            if fw * fh > max_pixels:
                raise ValueError("parse_gif: frame exceeds pixel cap")
            if left + fw > width or top + fh > height:
                raise ValueError(
                    "parse_gif: frame rect outside logical screen"
                )
            if fpacked & 0x80:  # local color table
                lct = 2 << (fpacked & 0x07)
                if pos + 3 * lct > n:
                    raise ValueError(
                        "parse_gif: truncated local color table"
                    )
                pos += 3 * lct
            if pos >= n:
                raise ValueError("parse_gif: truncated LZW code size")
            pos += 1  # LZW minimum code size (pixel decode out of scope)
            _, pos = _sub_blocks(data, pos, "image data", keep=False)
            n_frames += 1
        else:
            raise ValueError(
                f"parse_gif: unknown block introducer 0x{intro:02X}"
            )
    if n_frames == 0:
        raise ValueError("parse_gif: no image descriptors")
    return {
        "version": magic[3:6].decode("ascii"),
        "width": width,
        "height": height,
        "gct_flag": gct_flag,
        "gct_colors": gct_colors,
        "n_frames": n_frames,
        "animated": n_frames > 1,
        "loop_count": loop_count,
        "n_extensions": n_extensions,
    }


def encode_gif(
    width: int,
    height: int,
    n_frames: int = 1,
    loop: int | None = None,
    version: bytes = b"GIF89a",
) -> bytes:
    """Minimal spec-shaped GIF for fixtures/round-trips: 2-color global
    table, optional NETSCAPE loop extension, ``n_frames`` full-screen
    image descriptors with per-frame graphic-control extensions and a
    deterministic dummy LZW payload (this parser validates structure,
    not pixels)."""
    out = bytearray()
    out += version
    out += struct.pack("<HH", width, height)
    out += bytes([0x80, 0, 0])  # GCT flag, 2 colors; bg 0; aspect 0
    out += b"\x00\x00\x00\xff\xff\xff"  # GCT: black, white
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    for i in range(n_frames):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", 4 * (i + 1))
        out += b"\x00\x00"  # GCE: delay, no transparency
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += b"\x00"  # no local table
        out += bytes([2])  # LZW min code size
        body = bytes((i + j) % 256 for j in range(3))
        out += bytes([len(body)]) + body + b"\x00"
    out += b"\x3b"
    return bytes(out)
