"""Pure-stdlib WebP STRUCTURE parser — the modern-web tier of the
image codec set (png/bmp = legacy stills, jpeg = photographic, gif =
legacy animation, webp = what CDNs actually serve today; a real
CommonCrawl image payload stream is full of it).

Scope matches ``gif.py``/``mp3.py``: container walk and header fields,
not pixel decode — dimensions, lossy/lossless/extended format, alpha,
animation frame count. All three header shapes are parsed:

- ``VP8 `` (lossy): keyframe tag + 0x9D012A start code + 14-bit dims
- ``VP8L`` (lossless): 0x2F signature + packed 14-bit dims + alpha bit
- ``VP8X`` (extended): feature flags + 24-bit canvas dims; ``ANMF``
  sub-chunks counted for animations

Strictness matches the codec family: exact RIFF framing walked
chunk-by-chunk to the declared end (odd-size pad bytes included),
declared-dimension bomb guards before anything else, chunk caps, typed
``ValueError`` on anything malformed.
"""

from __future__ import annotations

import struct

MAX_PIXELS = 1 << 24
MAX_CHUNKS = 1 << 12


def _parse_vp8(payload: bytes) -> tuple[int, int]:
    if len(payload) < 10:
        raise ValueError("parse_webp: VP8 payload too short")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 0x1:
        raise ValueError("parse_webp: VP8 first frame is not a keyframe")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("parse_webp: bad VP8 start code")
    w = struct.unpack_from("<H", payload, 6)[0] & 0x3FFF
    h = struct.unpack_from("<H", payload, 8)[0] & 0x3FFF
    return w, h


def _parse_vp8l(payload: bytes) -> tuple[int, int, bool]:
    if len(payload) < 5:
        raise ValueError("parse_webp: VP8L payload too short")
    if payload[0] != 0x2F:
        raise ValueError("parse_webp: bad VP8L signature byte")
    bits = struct.unpack_from("<I", payload, 1)[0]
    w = (bits & 0x3FFF) + 1
    h = ((bits >> 14) & 0x3FFF) + 1
    alpha = bool((bits >> 28) & 0x1)
    if (bits >> 29) & 0x7:
        raise ValueError("parse_webp: nonzero VP8L version bits")
    return w, h, alpha


def parse_webp(data: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Parse WebP structure. Returns ``{format, width, height,
    has_alpha, animated, n_frames}`` — ``format`` ∈ {lossy, lossless,
    extended}. Raises ``ValueError`` on anything malformed."""
    n = len(data)
    if n < 12:
        raise ValueError("parse_webp: shorter than RIFF header")
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("parse_webp: bad RIFF/WEBP magic")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if 8 + riff_size != n:
        raise ValueError(
            f"parse_webp: RIFF declares {riff_size} bytes, "
            f"{n - 8} present"
        )
    pos = 12
    fmt = None
    width = height = None
    has_alpha = False
    vp8x_anim = False
    n_anmf = 0
    chunks = 0
    while pos < n:
        if pos + 8 > n:
            raise ValueError("parse_webp: truncated chunk header")
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        pos += 8
        if pos + size > n:
            raise ValueError(
                f"parse_webp: chunk {fourcc!r} runs past buffer"
            )
        payload = data[pos : pos + size]
        pos += size + (size & 1)  # odd sizes carry a pad byte
        chunks += 1
        if chunks > MAX_CHUNKS:
            raise ValueError("parse_webp: chunk cap exceeded")
        if fourcc == b"VP8 " and fmt is None:
            width, height = _parse_vp8(payload)
            fmt = "lossy"
        elif fourcc == b"VP8L" and fmt is None:
            width, height, has_alpha = _parse_vp8l(payload)
            fmt = "lossless"
        elif fourcc == b"VP8X":
            if fmt is not None:
                raise ValueError("parse_webp: VP8X after an image chunk")
            if size != 10:
                raise ValueError("parse_webp: VP8X size must be 10")
            flags = payload[0]
            has_alpha = bool(flags & 0x10)
            vp8x_anim = bool(flags & 0x02)
            width = (
                payload[4] | (payload[5] << 8) | (payload[6] << 16)
            ) + 1
            height = (
                payload[7] | (payload[8] << 8) | (payload[9] << 16)
            ) + 1
            fmt = "extended"
        elif fourcc == b"ANMF":
            if size < 16:
                raise ValueError("parse_webp: ANMF shorter than params")
            n_anmf += 1
        # ANIM/ICCP/EXIF/XMP /ALPH and unknown chunks: framing already
        # validated above; contents are out of structural scope
    if fmt is None:
        raise ValueError("parse_webp: no image chunk (VP8/VP8L/VP8X)")
    if width == 0 or height == 0:
        raise ValueError("parse_webp: zero dimension")
    if width * height > max_pixels:
        raise ValueError(
            f"parse_webp: {width}x{height} exceeds {max_pixels} pixels "
            "(bomb guard)"
        )
    animated = vp8x_anim and n_anmf > 0
    return {
        "format": fmt,
        "width": width,
        "height": height,
        "has_alpha": has_alpha,
        "animated": animated,
        "n_frames": n_anmf if animated else 1,
    }


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def encode_webp_stub(
    width: int,
    height: int,
    fmt: str = "lossy",
    alpha: bool = False,
    n_frames: int = 0,
) -> bytes:
    """Spec-shaped WebP for fixtures: valid container framing + valid
    image-chunk HEADERS with deterministic dummy bitstream bytes (this
    parser validates structure, not pixels). ``n_frames > 0`` builds an
    animated VP8X file with that many ANMF chunks."""
    if fmt == "lossy":
        tag = b"\x00\x00\x00"  # keyframe
        body = tag + b"\x9d\x01\x2a"
        body += struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        body += bytes((i * 3) % 256 for i in range(6))
        chunks = _chunk(b"VP8 ", body)
    elif fmt == "lossless":
        bits = (width - 1) & 0x3FFF
        bits |= ((height - 1) & 0x3FFF) << 14
        if alpha:
            bits |= 1 << 28
        body = b"\x2f" + struct.pack("<I", bits)
        body += bytes((i * 5) % 256 for i in range(5))
        chunks = _chunk(b"VP8L", body)
    elif fmt == "extended":
        flags = (0x10 if alpha else 0) | (0x02 if n_frames else 0)
        body = bytes([flags, 0, 0, 0])
        body += struct.pack("<I", width - 1)[:3]
        body += struct.pack("<I", height - 1)[:3]
        chunks = _chunk(b"VP8X", body)
        if n_frames:
            chunks += _chunk(b"ANIM", b"\x00" * 6)
            for i in range(n_frames):
                params = bytes((i + j) % 256 for j in range(16))
                chunks += _chunk(b"ANMF", params + b"\x01\x02\x03")
    else:
        raise ValueError(f"encode_webp_stub: unknown fmt {fmt!r}")
    riff = b"WEBP" + chunks
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
