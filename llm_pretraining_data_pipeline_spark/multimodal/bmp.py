"""Pure-stdlib BMP (Windows DIB) codec — the second uncompressed image
tier next to PNG.

BMP is the other format a multimodal ingest meets in bulk (screenshots,
scanned documents, Windows-origin crawls). This decoder covers the
dominant honest subset: ``BM`` file header, BITMAPINFOHEADER (biSize=40),
uncompressed ``BI_RGB`` pixel data at 24 or 32 bits per pixel, bottom-up
(positive height — the common case) or top-down (negative height) row
order. Everything else — RLE compression, bitfield masks, palette depths,
V4/V5 headers — raises ``ValueError`` naming the exact field, mirroring
the png.py/wav.py strictness discipline. Decoded pixels are normalised to
TOP-DOWN row-major B,G,R channel ints (the 32-bit reserved/alpha byte is
excluded from the channel stream but its presence is validated), so
downstream statistics are layout-independent.

Guards mirror png.py: the DECLARED pixel count is capped before any
buffer allocation (``max_pixels``), the pixel-array offset and the padded
row stride are validated against the physical payload, and a payload
shorter than its declared geometry raises (never silently zero-pads).

``encode_bmp`` builds canonical files from closed-form pixel bytes so the
decoder is verified end-to-end: encode(pixels) → decode → stats must
equal the closed form, which the DuckDB referee in ``mm_bmp_features``
recomputes independently from the same formula (both bottom-up and
top-down encodings must yield identical normalised stats).

Reference parity note: the reference pipeline is text-only (README.md:
1-40); the image path is mandated multimodal extension surface, not a
reference port.
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"

# Allocation guard: 64M pixels * 3 channels ≈ 192 MB of ints — above any
# real web image, far below executor OOM (same rationale as png.py).
DEFAULT_MAX_PIXELS = 64_000_000

_BI_RGB = 0
_INFOHEADER_SIZE = 40
_FILEHEADER_SIZE = 14


def _row_stride(width: int, bpp: int) -> int:
    return ((width * bpp // 8) + 3) & ~3  # rows pad to 4-byte boundaries


def encode_bmp(
    width: int,
    height: int,
    pixels: bytes,
    bpp: int = 24,
    top_down: bool = False,
) -> bytes:
    """Build a canonical BI_RGB BMP payload.

    ``pixels`` is TOP-DOWN row-major B,G,R bytes (3 per pixel, no
    padding, no alpha — the encoder adds row padding and, at
    ``bpp=32``, a zero reserved byte per pixel).
    """
    if bpp not in (24, 32):
        raise ValueError(f"encode_bmp: unsupported bpp={bpp}")
    if width < 1 or height < 1:
        raise ValueError(f"encode_bmp: bad dims {width}x{height}")
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"encode_bmp: expected {width * height * 3} pixel bytes, "
            f"got {len(pixels)}"
        )
    stride = _row_stride(width, bpp)
    rows = []
    row_range = range(height) if top_down else range(height - 1, -1, -1)
    for y in row_range:
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            row += pixels[base + 3 * x : base + 3 * x + 3]
            if bpp == 32:
                row.append(0)  # reserved byte
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    body = b"".join(rows)
    offset = _FILEHEADER_SIZE + _INFOHEADER_SIZE
    file_header = BMP_MAGIC + struct.pack(
        "<IHHI", offset + len(body), 0, 0, offset
    )
    info_header = struct.pack(
        "<IiiHHIIiiII",
        _INFOHEADER_SIZE,
        width,
        -height if top_down else height,
        1,              # planes
        bpp,
        _BI_RGB,
        len(body),
        2835, 2835,     # 72 DPI in px/metre
        0, 0,           # palette sizes (none at 24/32 bpp)
    )
    return file_header + info_header + body


def decode_bmp(
    data: bytes, max_pixels: int = DEFAULT_MAX_PIXELS
) -> tuple[int, int, int, list[int]]:
    """Decode a BI_RGB BMP → (width, height, bpp, channel_values).

    ``channel_values`` is TOP-DOWN row-major B,G,R ints (3 per pixel
    regardless of bpp; the 32-bit reserved byte is validated present but
    excluded). Raises ``ValueError`` on anything malformed, compressed,
    paletted, or over the allocation guard.
    """
    if len(data) < _FILEHEADER_SIZE + _INFOHEADER_SIZE:
        raise ValueError("decode_bmp: payload shorter than headers")
    if data[:2] != BMP_MAGIC:
        raise ValueError("decode_bmp: not a BM payload")
    _file_size, _r1, _r2, offset = struct.unpack_from("<IHHI", data, 2)
    (
        bi_size, width, raw_height, planes, bpp, compression,
        _img_size, _xppm, _yppm, clr_used, _clr_important,
    ) = struct.unpack_from("<IiiHHIIiiII", data, _FILEHEADER_SIZE)
    if bi_size != _INFOHEADER_SIZE:
        raise ValueError(
            f"decode_bmp: unsupported header biSize={bi_size} "
            "(only BITMAPINFOHEADER/40)"
        )
    if planes != 1:
        raise ValueError(f"decode_bmp: planes={planes}")
    if compression != _BI_RGB:
        raise ValueError(
            f"decode_bmp: unsupported biCompression={compression} "
            "(only BI_RGB)"
        )
    if bpp not in (24, 32):
        raise ValueError(f"decode_bmp: unsupported bpp={bpp}")
    if clr_used != 0:
        raise ValueError(f"decode_bmp: unexpected palette (biClrUsed={clr_used})")
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    if width < 1 or height < 1:
        raise ValueError(f"decode_bmp: bad dims {width}x{raw_height}")
    if width * height > max_pixels:
        raise ValueError(
            f"decode_bmp: {width * height} pixels exceeds "
            f"max_pixels={max_pixels}"
        )
    if offset < _FILEHEADER_SIZE + _INFOHEADER_SIZE or offset > len(data):
        raise ValueError(f"decode_bmp: bad pixel-array offset {offset}")
    stride = _row_stride(width, bpp)
    if offset + stride * height > len(data):
        raise ValueError(
            f"decode_bmp: pixel array declares {stride * height} bytes, "
            f"{len(data) - offset} remain"
        )
    unit = bpp // 8
    out: list[int] = []
    row_range = range(height) if top_down else range(height - 1, -1, -1)
    for y in row_range:
        base = offset + y * stride
        for x in range(width):
            p = base + x * unit
            out.extend(data[p : p + 3])
    return width, height, bpp, out


def bmp_stats(data: bytes, max_pixels: int = DEFAULT_MAX_PIXELS) -> dict:
    """Decode + integer-accumulator image statistics (the refereed
    surface): width/height/bpp/n_pixels plus px_sum / px_min / px_max
    over the B,G,R channel values — exact bigint arithmetic, no
    float-summation-order hazard, layout-normalised (bottom-up and
    top-down encodings of the same image give identical stats)."""
    width, height, bpp, vals = decode_bmp(data, max_pixels)
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "n_pixels": width * height,
        "px_sum": sum(vals),
        "px_min": min(vals),
        "px_max": max(vals),
    }
