"""Pure-stdlib PNG codec (zlib + struct) — a REAL image decode kernel.

Replaces the hash-stub default in ``operators.multimodal`` for PNG blobs:
this environment has no image libraries, but PNG's format needs none —
DEFLATE is ``zlib`` (stdlib) and the rest is chunk framing + per-scanline
filters. Supported: 8-bit depth, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), non-interlaced — the overwhelming majority of
real-world PNGs. Palette (type 3), 16-bit and Adam7 raise
``NotImplementedError`` with a clear message (inject a PIL-backed decoder
for those; the seam is unchanged).

Performance note: this is per-pixel Python inside an Arrow-batched
``mapInPandas`` kernel — correct-but-slow by design. The Spark plumbing is
the scale-relevant part; a production deployment swaps this callable for
PIL/libpng (C speed) through the same ``decoder=``/``encoder=`` seam.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type

# IHDR width/height are attacker-controlled 32-bit fields; without a cap a
# forged 2^32-1 × 2^32-1 header overflows zlib's max_length (OverflowError,
# uncaught by callers' ValueError fallback) and a forged-large-but-valid
# header makes the decompression cap meaningless (a 255 KB bomb IDAT could
# inflate hundreds of MB before the length check fires). 64 MP ≈ a 256 MB
# RGBA raster — far beyond anything this per-pixel-Python kernel should eat.
MAX_PIXELS = 64_000_000


def png_encode(width: int, height: int, pixels: bytes, *, channels: int = 3) -> bytes:
    """Build a valid non-interlaced 8-bit PNG from raw interleaved pixels
    (filter 0 on every scanline). Used for fixtures/tests and as the
    write-side proof that the decoder round-trips."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"channels must be 1/2/3/4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"expected {stride * height} pixel bytes, got {len(pixels)}"
        )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` — raw 8-bit
    interleaved, scanline order. Verifies every chunk CRC; undoes all five
    scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat: list[bytes] = []
    width = height = channels = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            # short payload/CRC would feed struct.unpack <4 bytes and leak
            # struct.error past callers' ValueError handling
            raise ValueError(f"truncated PNG: {ctype!r} chunk exceeds data")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError(f"malformed IHDR (length {length})")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
            if color not in _CHANNELS:
                raise NotImplementedError(f"color type {color} (palette unsupported)")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("invalid compression/filter method")
            if width == 0 or height == 0:
                raise ValueError("zero-dimension PNG")
            if width * height > MAX_PIXELS:
                raise ValueError(
                    f"PNG dimensions {width}x{height} exceed MAX_PIXELS "
                    f"({MAX_PIXELS}); refusing to decode"
                )
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")

    stride = width * channels
    expected = (stride + 1) * height  # bounded: width*height <= MAX_PIXELS
    # cap decompression at the size IHDR promises: a crafted
    # decompression-bomb IDAT must fail cheaply (ValueError → callers'
    # fallback path), not expand unboundedly in executor memory
    dobj = zlib.decompressobj()
    raw = dobj.decompress(b"".join(idat), expected)
    # a valid stream may leave only its end marker in unconsumed_tail;
    # one more bounded call distinguishes that from surplus pixel data
    if len(raw) != expected or dobj.decompress(dobj.unconsumed_tail, 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    p = 0
    for row in range(height):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown scanline filter {f}")
        out[row * stride : (row + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def png_pixel_features(data: bytes, *, dim: int = 16) -> list[float]:
    """REAL image features from decoded pixels: per-quadrant per-channel
    mean intensity in [0, 1] (2×2 spatial grid × up to 4 channels),
    zero-padded/truncated to ``dim`` — the deterministic stand-in shape of
    a pooled conv feature, computed from actual pixel values."""
    return quadrant_features(*png_decode(data), dim=dim)


def quadrant_features(
    w: int, h: int, ch: int, px: bytes, *, dim: int = 16
) -> list[float]:
    """Per-quadrant per-channel mean intensity over a raw interleaved
    8-bit raster — shared by the PNG and JPEG feature kernels."""
    sums = [0] * (4 * ch)
    counts = [0] * 4
    for y in range(h):
        qy = 0 if y < (h + 1) // 2 else 1
        row = y * w * ch
        for x in range(w):
            q = qy * 2 + (0 if x < (w + 1) // 2 else 1)
            counts[q] += 1
            base = row + x * ch
            for c in range(ch):
                sums[q * ch + c] += px[base + c]
    feats = [
        sums[q * ch + c] / (255.0 * counts[q]) if counts[q] else 0.0
        for q in range(4)
        for c in range(ch)
    ]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))
