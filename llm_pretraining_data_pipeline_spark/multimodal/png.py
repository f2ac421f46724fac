"""Pure-stdlib PNG codec for the multimodal image path.

Replaces the round-6 decode stub with a REAL decoder: zlib inflate of the
IDAT stream + full scanline filter reconstruction (all five filter types of
the PNG spec, RFC 2083 §6), for 8-bit greyscale / grey+alpha / RGB / RGBA,
non-interlaced. That covers every payload the engine's deterministic
fixtures emit and the dominant web-scrape encoding; palette/16-bit/Adam7
raise ``ValueError`` with the exact unsupported field (a real deployment
swaps in Pillow for the long tail — same operator shape, see
``media.png_feature_stats``).

The matching ``encode_png`` exists so tests and fixtures can build valid
PNGs from closed-form pixel functions — the decoder is then verified
END-TO-END: encode(pixels) → decode → stats must equal the closed form,
which a DuckDB oracle recomputes independently from the same formula
(the ``mm_png_features`` referee).

Everything here is driver/executor-side pure Python over ``bytes`` —
stdlib ``zlib``/``struct`` only — invoked from Arrow-batched
``mapInPandas`` (one Python init per partition, no per-row overhead).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Decompression-bomb guard: reject images whose DECLARED dimensions exceed
# this many pixels before any pixel buffer is allocated, and inflate the
# IDAT stream with a hard output cap. A web-scrape payload can declare
# 2^32-1 × 2^32-1 in IHDR or pack a high-ratio deflate stream into a few
# KB — either must surface as decode_ok=false, never an executor OOM.
# 64 MP ≈ 8192×8192 RGBA = 256 MB raw, comfortably above real web images.
DEFAULT_MAX_PIXELS = 64_000_000


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Build a valid non-interlaced 8-bit PNG from raw samples.

    ``pixels`` is row-major sample bytes (``width*height*channels``);
    ``filter_type`` (0-4) is applied to EVERY scanline so tests can pin
    each reconstruction path individually.
    """
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color_type={color_type}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"invalid filter_type={filter_type}")
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixels must be width*height*channels={stride * height} bytes, "
            f"got {len(pixels)}"
        )
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if filter_type == 0:
                v = line[x]
            elif filter_type == 1:
                v = line[x] - a
            elif filter_type == 2:
                v = line[x] - b
            elif filter_type == 3:
                v = line[x] - (a + b) // 2
            else:
                v = line[x] - _paeth(a, b, c)
            raw.append(v & 0xFF)
        prior = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(
    data: bytes, max_pixels: int = DEFAULT_MAX_PIXELS
) -> tuple[int, int, int, int, bytes]:
    """Decode a PNG to ``(width, height, bit_depth, channels, pixels)``
    with ``pixels`` the reconstructed row-major samples.

    Supports what ``encode_png`` can produce plus any conforming encoder's
    8-bit non-interlaced grey/grey+alpha/RGB/RGBA stream (multiple IDAT
    chunks are concatenated per spec; trailing/ancillary chunks skipped).

    ``max_pixels`` caps ``width * height`` as declared by IHDR, checked
    BEFORE any pixel-sized allocation, and the IDAT inflate is bounded to
    the expected raw size — decompression bombs raise ``ValueError`` (so
    they land in the callers' decode_ok=false arm) instead of OOMing the
    executor.
    """
    if data[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    try:
        return _decode_png_body(data, max_pixels)
    except (zlib.error, struct.error) as exc:
        # Truncated CRC fields, short IHDR bodies, and corrupt deflate
        # streams surface as zlib.error/struct.error — normalise to the
        # ValueError contract so callers' single except arm (decode_ok
        # bookkeeping in media.png_feature_stats) always holds.
        raise ValueError(f"corrupt PNG: {exc}") from exc


def _decode_png_body(
    data: bytes, max_pixels: int = DEFAULT_MAX_PIXELS
) -> tuple[int, int, int, int, bytes]:
    pos = len(PNG_SIGNATURE)
    width = height = bit_depth = color_type = None
    interlace = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        expect_crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != expect_crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit_depth={bit_depth} (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color_type={color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNGs unsupported")
    if width == 0 or height == 0:
        raise ValueError(f"zero-dimension image {width}x{height}")
    # Bomb guard 1: the declared dimensions bound every allocation below,
    # so validate them BEFORE computing stride or touching the IDAT stream.
    if width * height > max_pixels:
        raise ValueError(
            f"declared {width}x{height} exceeds max_pixels={max_pixels}"
        )
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    expected = (stride + 1) * height
    # Bomb guard 2: bounded inflate. max_length caps the OUTPUT buffer, so
    # a high-ratio deflate stream cannot allocate past expected+1 bytes no
    # matter what it encodes; one extra byte distinguishes "inflates past
    # the declared size" (error) from "exactly the declared size" (ok).
    # No flush() afterwards — flush would inflate the remainder unbounded.
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) > expected:
        raise ValueError(
            f"IDAT inflates past expected {expected} bytes (bomb guard)"
        )
    if len(raw) != expected:
        raise ValueError(
            f"decompressed size {len(raw)} != expected {expected}"
        )
    # A truncated IDAT cut after exactly `expected` output bytes (before
    # the deflate final block / Adler-32 trailer) passes both size checks,
    # so require the decoder to have actually reached end-of-stream — this
    # restores the truncation + checksum detection the unbounded
    # zlib.decompress gave, without reopening the bomb (eof is a flag
    # check, no further inflation).
    if not dec.eof:
        raise ValueError("IDAT stream truncated (deflate EOF not reached)")
    out = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + a) & 0xFF
        elif ftype == 2:
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ftype == 3:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (a + prior[x]) // 2) & 0xFF
        elif ftype == 4:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prior[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prior[x], c)) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return width, height, bit_depth, bpp, bytes(out)


def png_stats(data: bytes) -> dict:
    """Decode + per-image sample statistics (the feature-extraction
    contract of ``media.png_feature_stats``): dimensions, channel count,
    pixel count, and integer sample sum / min / max — integers so the
    DuckDB referee can recompute them bit-exactly from a closed-form
    fixture formula."""
    width, height, bit_depth, channels, pixels = decode_png(data)
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "channels": channels,
        "n_pixels": width * height,
        "px_sum": sum(pixels),
        "px_min": min(pixels) if pixels else 0,
        "px_max": max(pixels) if pixels else 0,
    }


def ahash_bits(data: bytes, grid: int = 8) -> tuple[int, int]:
    """Integer average-hash (aHash) of a decoded PNG — the classic
    perceptual image fingerprint (block-mean thresholding), defined here
    entirely in INTEGER arithmetic so an independent referee can recompute
    it from a closed-form pixel formula with no image machinery:

      grey(x,y)   = floor(sum over channels / channels)
      block(bx,by)= x in [floor(bx*w/g), floor((bx+1)*w/g)) etc.
      m(bx,by)    = floor(sum grey in block / block pixel count)
      M           = floor(sum of all block means / g*g)
      bit(by*g+bx)= 1 iff m(bx,by) > M

    Returns ``(hash_hi, hash_lo)`` — bits 32..63 and 0..31 as two
    non-negative ints < 2^32, so the pair fits signed 64-bit columns on
    any engine (a single 64-bit value would collide with bigint sign /
    ANSI overflow).  Requires width >= grid and height >= grid (floor
    boundaries then guarantee non-empty blocks).
    """
    width, height, _bd, channels, pixels = decode_png(data)
    if width < grid or height < grid:
        raise ValueError(
            f"image {width}x{height} smaller than ahash grid {grid}"
        )
    # integer grey plane
    if channels == 1:
        grey = list(pixels)
    else:
        grey = [
            sum(pixels[i : i + channels]) // channels
            for i in range(0, len(pixels), channels)
        ]
    means = []
    for by in range(grid):
        y0, y1 = by * height // grid, (by + 1) * height // grid
        for bx in range(grid):
            x0, x1 = bx * width // grid, (bx + 1) * width // grid
            s = cnt = 0
            for y in range(y0, y1):
                row = y * width
                for x in range(x0, x1):
                    s += grey[row + x]
                    cnt += 1
            means.append(s // cnt)
    overall = sum(means) // (grid * grid)
    hi = lo = 0
    for i, m in enumerate(means):
        if m > overall:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return hi, lo
