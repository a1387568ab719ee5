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


def gif_frames(
    data: bytes,
    *,
    every_n: int = 1,
    max_frames: int | None = None,
) -> list[tuple[int, int, int, bytes]]:
    """Decode an ANIMATED GIF into composited full-canvas frames —
    the one honest pure-stdlib "video" decode (every other video codec
    needs a codec library; the ffmpeg seam in
    ``multimodal.sample_frames`` stays for those).

    Full GIF89a animation semantics: per-frame graphic-control
    extensions (transparency index, disposal method), local color
    tables, sub-rectangle placement on the logical screen, interlace.
    Compositing follows what a viewer shows on an opaque surface:

    - the canvas starts as the background color (global-palette entry
      named by the header, else black) — RGB output has no alpha, so
      "transparent" canvas renders as background;
    - each frame draws its non-transparent pixels into its rect
      (clipped to the canvas — descriptor fields are untrusted);
    - disposal 0/1 leave the canvas, 2 restores the frame's rect to
      background, 3 restores the pre-frame canvas.

    Returns ``(byte_offset_of_image_descriptor, width, height, rgb)``
    for frames ``0, every_n, 2·every_n, …`` (at most ``max_frames``).
    EVERY frame up to the last sampled one is decoded and composited —
    frame k's pixels depend on 0..k-1; a stride only thins the OUTPUT.
    The ``MAX_PIXELS`` cap bounds the TOTAL decoded raster across
    frames (an animation bomb is many frames, not one big one).
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw * sh > MAX_PIXELS:
        raise ValueError(f"logical screen {sw}x{sh} exceeds MAX_PIXELS")
    gct, off = _read_color_table(data, 13, packed)
    bg_rgb = gct[bg_idx] if gct and bg_idx < len(gct) else b"\x00\x00\x00"
    canvas = bytearray(bg_rgb * (sw * sh))

    frames: list[tuple[int, int, int, bytes]] = []
    frame_no = 0
    decoded_pixels = 0
    # GCE state applies to the NEXT image descriptor only
    disposal = 0
    transparent: int | None = None
    while True:
        if off >= len(data):
            raise ValueError("GIF ended without trailer")
        block = data[off]
        block_off = off
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if off >= len(data):
                raise ValueError("truncated extension")
            label = data[off]
            if label == 0xF9 and off + 5 < len(data) and data[off + 1] == 4:
                gpacked = data[off + 2]
                disposal = (gpacked >> 2) & 0x07
                transparent = data[off + 5] if gpacked & 0x01 else None
            off = _skip_subblocks(data, off + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if off + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[off : off + 9])
        off += 9
        if w == 0 or h == 0 or w * h > MAX_PIXELS:
            raise ValueError(f"image {w}x{h} out of bounds")
        decoded_pixels += w * h
        if decoded_pixels > MAX_PIXELS:
            raise ValueError(
                f"animation exceeds MAX_PIXELS across frames "
                f"({decoded_pixels} > {MAX_PIXELS})"
            )
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

        prev = bytes(canvas) if disposal == 3 else None
        np_ = len(palette)
        lut = [palette[i] if i < np_ else b"\x00\x00\x00" for i in range(256)]
        for fy in range(h):
            cy = top + fy
            if cy >= sh:
                break
            row = idx[fy * w : (fy + 1) * w]
            base = (cy * sw + left) * 3
            for fx, pix in enumerate(row):
                if pix == transparent or left + fx >= sw:
                    continue
                canvas[base + fx * 3 : base + fx * 3 + 3] = lut[pix]

        if frame_no % every_n == 0:
            frames.append((block_off, sw, sh, bytes(canvas)))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        frame_no += 1

        if disposal == 2:  # restore rect to background
            for fy in range(h):
                cy = top + fy
                if cy >= sh:
                    break
                run_w = min(w, sw - left) if left < sw else 0
                base = (cy * sw + left) * 3
                canvas[base : base + run_w * 3] = bg_rgb * run_w
        elif disposal == 3 and prev is not None:
            canvas[:] = prev
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def gif_pixel_features(data: bytes, *, dim: int = 16) -> list[float]:
    """REAL image features from decoded GIF pixels — same per-quadrant
    per-channel mean shape as ``png.png_pixel_features``."""
    from skope_api_spark.operators.png import quadrant_features

    return quadrant_features(*gif_decode(data), dim=dim)


# --- encode (fixtures / round-trip proof) ---------------------------------


def _palette_bits(n_colors: int) -> int:
    return max(2, (max(n_colors - 1, 1)).bit_length())


def _color_table_bytes(palette, bits: int) -> bytes:
    table_size = 1 << bits
    return b"".join(
        bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
        for i in range(table_size)
    )


def _lzw_literal_payload(indices: bytes, bits: int) -> bytes:
    """Literal-code LZW: after CLEAR, the decoder adds one table entry
    per emitted code; reset before next_code hits 2^(bits+1) so the
    code width never grows past bits+1 (the standard uncompressed-GIF
    writer), framed into 255-byte sub-blocks."""
    clear = 1 << bits
    end = clear + 1
    width_codes = bits + 1
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
    subblocks = bytearray([bits])
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        subblocks.append(len(chunk))
        subblocks += chunk
    subblocks.append(0)
    return bytes(subblocks)


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
    bits = _palette_bits(len(palette))
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
        + _color_table_bytes(palette, bits)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + _lzw_literal_payload(indices, bits)
        + b"\x3b"
    )


def gif_encode_animation(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[dict],
    *,
    bg_index: int = 0,
) -> bytes:
    """Multi-frame GIF89a fixture encoder (the animated counterpart of
    ``gif_encode``, for ``gif_frames`` tests — no external animated-GIF
    golden exists in this environment, so correctness is pinned by
    hand-computed compositing expectations, the VP8L-constructed-stream
    pattern).

    Each frame dict: ``indices`` (bytes, row-major over its rect) and
    optional ``left``/``top`` (default 0), ``w``/``h`` (default full
    canvas), ``disposal`` (0-3, default 0), ``transparent`` (palette
    index or None), ``local_palette`` (list of RGB tuples or None),
    ``interlace`` (bool, default False)."""
    if not palette or len(palette) > 256:
        raise ValueError("palette must have 1..256 entries")
    bits = _palette_bits(len(palette))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), bg_index, 0)
    out += _color_table_bytes(palette, bits)
    for f in frames:
        w = f.get("w", width)
        h = f.get("h", height)
        indices = f["indices"]
        if len(indices) != w * h:
            raise ValueError("frame indices length must equal w*h")
        disposal = f.get("disposal", 0)
        transparent = f.get("transparent")
        # graphic-control extension (one per frame, like real encoders)
        gpacked = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gpacked, 0, 0, transparent or 0, 0])
        lct = f.get("local_palette")
        fbits = _palette_bits(len(lct)) if lct else bits
        ipacked = 0
        if lct:
            ipacked |= 0x80 | (fbits - 1)
        if f.get("interlace"):
            ipacked |= 0x40
        out += b"\x2c"
        out += struct.pack(
            "<HHHHB", f.get("left", 0), f.get("top", 0), w, h, ipacked
        )
        if lct:
            out += _color_table_bytes(lct, fbits)
        idx = indices
        if f.get("interlace"):
            # store rows in interlace pass order so decode deinterlaces
            reordered = bytearray()
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, h, step):
                    reordered += indices[y * w : (y + 1) * w]
            idx = bytes(reordered)
        out += _lzw_literal_payload(idx, fbits)
    out += b"\x3b"
    return bytes(out)
