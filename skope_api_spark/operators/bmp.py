"""Pure-stdlib BMP (Windows bitmap) codec — the fourth REAL image decode
kernel next to png.py / jpeg.py / gif.py.

BMP needs no compression library at all: a fixed header pair
(BITMAPFILEHEADER + BITMAPINFOHEADER) and raw bottom-up BGR scanlines
padded to 4-byte boundaries. Supported: uncompressed (BI_RGB) 24-bit
BGR and 8-bit paletted, the two layouts that cover practically every
real-world .bmp. RLE compression and 16/32-bit masks raise with a clear
message (same injectable-decoder seam as png.py).

Same defensive discipline as the other codecs: dimensions are
attacker-controlled fields, so the shared 64 MP cap bounds memory before
any allocation; truncated pixel data is rejected, not zero-filled.
"""

from __future__ import annotations

import struct

MAX_PIXELS = 64_000_000


def bmp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BMP to ``(width, height, 3, RGB bytes)`` in top-down
    scanline order, mirroring ``png.png_decode``'s contract."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if planes != 1:
        raise ValueError(f"unsupported plane count {planes}")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    if width * height > MAX_PIXELS:
        raise ValueError(f"BMP {width}x{height} exceeds MAX_PIXELS")

    palette: list[bytes] | None = None
    if bpp == 8:
        (used,) = struct.unpack_from("<I", data, 46)
        n_colors = used or 256
        pal_off = 14 + hdr_size
        if len(data) < pal_off + 4 * n_colors:
            raise ValueError("truncated BMP palette")
        palette = [
            data[pal_off + 4 * i + 2 : pal_off + 4 * i + 3]  # R
            + data[pal_off + 4 * i + 1 : pal_off + 4 * i + 2]  # G
            + data[pal_off + 4 * i : pal_off + 4 * i + 1]  # B
            for i in range(n_colors)
        ]

    bytes_per_px = bpp // 8
    stride = (width * bytes_per_px + 3) & ~3  # rows pad to 4 bytes
    if len(data) < pix_off + stride * height:
        raise ValueError("truncated BMP pixel data")

    rows: list[bytes] = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        line = data[pix_off + src * stride : pix_off + src * stride + width * bytes_per_px]
        if bpp == 24:
            # BGR -> RGB swap
            out = bytearray(width * 3)
            out[0::3] = line[2::3]
            out[1::3] = line[1::3]
            out[2::3] = line[0::3]
            rows.append(bytes(out))
        else:
            assert palette is not None
            try:
                rows.append(b"".join(palette[b] for b in line))
            except IndexError:
                raise ValueError("BMP palette index out of range") from None
    return width, height, 3, b"".join(rows)


def bmp_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Build an uncompressed 24-bit BMP from raw RGB bytes (top-down
    input, stored bottom-up per the format). Fixtures/tests + round-trip
    proof for the decoder."""
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up storage
        line = pixels[r * width * 3 : (r + 1) * width * 3]
        out = bytearray(width * 3)
        out[0::3] = line[2::3]  # RGB -> BGR
        out[1::3] = line[1::3]
        out[2::3] = line[0::3]
        body += out + pad
    pix_off = 14 + 40
    file_size = pix_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)
