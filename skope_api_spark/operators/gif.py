"""Pure-stdlib GIF codec (LZW) — a REAL image decode kernel.

Extends the real-pixel multimodal coverage (PNG in ``operators.png``,
baseline JPEG in ``operators.jpeg``) to the third classic web format.
GIF needs no codec library: the only compression is LZW with variable
code width (ITU/CompuServe GIF87a/89a, public specification), and the
rest is block framing + palette lookup.

Supported: GIF87a and GIF89a, global and local color tables, interlaced
and non-interlaced frames, graphic-control/comment/application
extensions (skipped), FIRST frame decoded (features want one raster;
multi-frame sampling stays in ``multimodal.sample_frames``).
Transparency is ignored (the palette color is used as-is — features
want pixel statistics, not compositing). Malformed streams raise
``ValueError``; the feature kernel's fallback ladder catches them.

Same ``MAX_PIXELS`` discipline as PNG: the logical-screen and image
descriptors are attacker-controlled 16-bit fields, and LZW expands —
a few-KB stream can decode to 256x the bytes. The cap bounds the
decoded raster BEFORE any allocation.

The encoder writes a minimal valid stream for fixtures/round-trip
tests: literal LZW codes with clear-code resets before the code width
would grow — the classic "uncompressed GIF" trick, decodable by any
conforming reader.
"""

from __future__ import annotations

import struct

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

MAX_PIXELS = 64_000_000


# --- decode ---------------------------------------------------------------


def _read_color_table(data: bytes, off: int, packed: int) -> tuple[list[bytes], int]:
    if not packed & 0x80:
        return [], off
    size = 2 << (packed & 0x07)
    end = off + 3 * size
    if end > len(data):
        raise ValueError("truncated color table")
    table = [data[i : i + 3] for i in range(off, end, 3)]
    return table, end


def _skip_subblocks(data: bytes, off: int) -> int:
    while True:
        if off >= len(data):
            raise ValueError("truncated sub-blocks")
        n = data[off]
        off += 1
        if n == 0:
            return off
        off += n


def _collect_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if off >= len(data):
            raise ValueError("truncated LZW sub-blocks")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        parts.append(data[off : off + n])
        if len(parts[-1]) != n:
            raise ValueError("truncated LZW sub-block payload")
        off += n


def _lzw_decode(stream: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF LZW: variable code width, LSB-first bit packing, 4096-entry
    dictionary, clear/end control codes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary as list of bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(stream):
                raise ValueError("LZW stream exhausted before raster filled")
            acc |= stream[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


def _deinterlace(idx: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(len(idx))
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = idx[src : src + w]
            src += w
    return out


def gif_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first frame -> (width, height, 3, RGB bytes)."""
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw * sh > MAX_PIXELS:
        raise ValueError(f"logical screen {sw}x{sh} exceeds MAX_PIXELS")
    gct, off = _read_color_table(data, 13, packed)
    while True:
        if off >= len(data):
            raise ValueError("no image descriptor before EOF")
        block = data[off]
        off += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-blocks
            if off >= len(data):
                raise ValueError("truncated extension")
            off = _skip_subblocks(data, off + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        if off + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB", data[off : off + 9])
        off += 9
        if w == 0 or h == 0 or w * h > MAX_PIXELS:
            raise ValueError(f"image {w}x{h} out of bounds")
        lct, off = _read_color_table(data, off, ipacked)
        palette = lct or gct
        if not palette:
            raise ValueError("no color table for frame")
        if off >= len(data):
            raise ValueError("missing LZW minimum code size")
        min_code = data[off]
        off += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        stream, off = _collect_subblocks(data, off)
        idx = _lzw_decode(stream, min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("LZW raster shorter than frame")
        if ipacked & 0x40:
            idx = _deinterlace(idx, w, h)
        # 256-entry LUT hoists the bounds branch out of the per-pixel loop
        np = len(palette)
        lut = [
            palette[i] if i < np else b"\x00\x00\x00" for i in range(256)
        ]
        rgb = b"".join(map(lut.__getitem__, idx))
        return w, h, 3, rgb


def gif_pixel_features(data: bytes, *, dim: int = 16) -> list[float]:
    """REAL image features from decoded GIF pixels — same per-quadrant
    per-channel mean shape as ``png.png_pixel_features``."""
    from skope_api_spark.operators.png import quadrant_features

    return quadrant_features(*gif_decode(data), dim=dim)


# --- encode (fixtures / round-trip proof) ---------------------------------


def gif_encode(
    width: int, height: int, indices: bytes, palette: list[tuple[int, int, int]]
) -> bytes:
    """Minimal valid GIF89a: one non-interlaced frame over a global color
    table, LZW-encoded as literal codes with clear-code resets before
    the width would grow (the standard uncompressed-GIF writer)."""
    if not palette or len(palette) > 256:
        raise ValueError("palette must have 1..256 entries")
    if len(indices) != width * height:
        raise ValueError("indices length must equal width*height")
    if any(i >= len(palette) for i in indices):
        raise ValueError("index out of palette range")
    bits = max(2, (max(len(palette) - 1, 1)).bit_length())
    table_size = 1 << bits
    gct = b"".join(
        bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
        for i in range(table_size)
    )
    clear = 1 << bits
    end = clear + 1
    width_codes = bits + 1

    # literal-code LZW: after CLEAR, the decoder adds one table entry per
    # emitted code; reset before next_code hits 2^(bits+1) so the code
    # width never grows past bits+1
    out_bits: list[int] = []

    def emit(code: int) -> None:
        for b in range(width_codes):
            out_bits.append((code >> b) & 1)

    emit(clear)
    budget = (1 << width_codes) - end - 2
    count = 0
    for i in indices:
        if count >= budget:
            emit(clear)
            count = 0
        emit(i)
        count += 1
    emit(end)
    payload = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            byte |= bit << j
        payload.append(byte)
    subblocks = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        subblocks.append(len(chunk))
        subblocks += chunk
    subblocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
        + gct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([bits])
        + bytes(subblocks)
        + b"\x3b"
    )
