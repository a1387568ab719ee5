"""Pure-stdlib baseline JPEG codec — the second REAL image decode kernel.

Closes the last multimodal ``partial`` (VERDICT r06 item 7): with PNG
(``operators.png``) and baseline JPEG both decoded for real, the two
dominant web image formats produce actual-pixel features through the
``pixel_or_hash_encoder`` seam; the hash pseudo-embedding remains only for
formats that genuinely need codec libraries (GIF/WebP/audio/video).

Implements ITU-T T.81 (public spec) baseline sequential DCT AND
progressive DCT (SOF2, the format ~most large web photos actually use):

- marker parse (SOI/APPn/COM/DQT/DHT/SOF0/1/2/SOS/DRI/EOI), 8-bit
  precision, 1- or 3-component scans, arbitrary sampling factors up to
  2x2 (4:4:4, 4:2:2, 4:2:0), restart markers;
- canonical Huffman tables (BITS/HUFFVAL -> code assignment in length
  then value order), byte unstuffing (FF 00), receive/extend;
- progressive scan accumulation (T.81 G.2): interleaved/non-interleaved
  DC first + refinement, per-component AC spectral bands with EOB runs,
  AC refinement (newly-significant insertion + correction bits),
  per-scan DHT redefinition; coefficients integrate across scans and
  IDCT once at EOI;
- dequantize -> de-zigzag -> separable float IDCT -> level shift;
- chroma upsample by replication, YCbCr -> RGB (BT.601 as in T.871).

Lossless (SOF3), arithmetic coding, 12-bit precision and CMYK raise
``NotImplementedError`` — inject a PIL-backed decoder for those; the seam
is unchanged. Encoders exist for fixtures/tests: baseline (Annex K
tables, optional chroma subsampling) and progressive
(``jpeg_encode_progressive``: spectral selection + successive
approximation over the SAME quantized coefficients, which makes
progressive-vs-baseline decode comparisons pixel-EXACT — the round-trip
tests' lever). Compatibility with real encoder output is pinned by a
libjpeg-produced golden file (tests/test_jpeg.py).

Performance note: per-pixel Python inside an Arrow-batched ``mapInPandas``
kernel — correct-but-slow by design, same trade as ``operators.png``; the
Spark plumbing is the scale-relevant part and a production deployment
swaps in libjpeg through the same callable seam.
"""

from __future__ import annotations

import math
import struct

from skope_api_spark.operators.png import MAX_PIXELS

JPEG_SOI = b"\xff\xd8"

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.1/K.2 example quantization tables (quality ~50)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# separable (I)DCT basis: COS[u][x] = c(u)/2 * cos((2x+1)u*pi/16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in canonical order (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitReader:
    """MSB-first reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_block(coef: list[float]) -> list[int]:
    """8x8 separable inverse DCT + level shift, clamped to 0..255."""
    tmp = [0.0] * 64
    for y in range(8):  # rows: 1-D IDCT over u
        base = y * 8
        row = coef[base : base + 8]
        for x in range(8):
            tmp[base + x] = sum(row[u] * _COS[u][x] for u in range(8))
    out = [0] * 64
    for x in range(8):  # cols: 1-D IDCT over v
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            s = sum(col[v] * _COS[v][y] for v in range(8)) + 128.0
            out[y * 8 + x] = 0 if s < 0 else (255 if s > 255 else int(s + 0.5))
    return out


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff (FF 00 -> FF) and split on restart markers; returns the
    list of entropy segments and the position of the terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker (EOI or next header)
            break
    segs.append(bytes(cur))
    return segs, i


def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline JPEG to ``(width, height, channels, pixels)`` —
     8-bit interleaved scanline order (grayscale or RGB), mirroring
    ``png.png_decode``'s contract."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (w, h, [(comp_id, h, v, tq), ...])
    progressive = False
    coefs: dict[int, list[list[int]]] = {}  # cid -> per-block zigzag coefs
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    quant[tq] = list(seg[i : i + 64])
                    i += 64
                else:  # 16-bit table
                    quant[tq] = [
                        struct.unpack(">H", seg[i + 2 * k : i + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    i += 128
                if len(quant[tq]) != 64:
                    raise ValueError("short DQT table")
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nval = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nval])
                if len(vals) != nval:
                    raise ValueError("short DHT table")
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                i += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"precision {prec} (only 8 supported)")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG unsupported")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension JPEG")
            if w * h > MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} exceed MAX_PIXELS "
                    f"({MAX_PIXELS}); refusing to decode"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(
                        f"sampling factors {ch}x{cv} unsupported"
                    )
                comps.append((cid, ch, cv, tq))
            frame = (w, h, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/extended/arithmetic JPEG unsupported "
                "(baseline + progressive Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            scan_order = []  # component order as listed in this SOS
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
                scan_order.append(cid)
            if progressive:
                ss, se, aa = seg[1 + 2 * ns : 4 + 2 * ns]
                segs, endpos = _split_entropy(data, pos + 2 + seglen)
                _progressive_scan(
                    frame, coefs, scan_order, scan_tables,
                    ss, se, aa >> 4, aa & 0x0F,
                    huff_dc, huff_ac, restart_interval, segs,
                )
                pos = endpos
                continue
            # Ns=1 on a multi-component frame is a legal non-interleaved
            # baseline layout (one scan per component, T.81 A.2.2) that
            # this single-scan decoder does not implement — refuse
            # cleanly rather than KeyError into the batch
            missing = [
                cid for cid, *_ in frame[2] if cid not in scan_tables
            ]
            if missing:
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG unsupported "
                    f"(scan covers {sorted(scan_tables)} of frame "
                    f"components {[c[0] for c in frame[2]]})"
                )
            segs, endpos = _split_entropy(data, pos + 2 + seglen)
            return _decode_scan(
                frame, scan_tables, quant, huff_dc, huff_ac,
                restart_interval, segs,
            )
        pos += 2 + seglen
    if progressive and coefs:
        return _finish_progressive(frame, coefs, quant)
    raise ValueError("no SOS scan found in JPEG")


def _decode_scan(frame, scan_tables, quant, huff_dc, huff_ac, dri, segs):
    w, h, comps = frame
    if len(comps) == 1:
        # single-component frames are non-interleaved by definition
        # (T.81 A.2.2): one 8x8 block per MCU over the full pixel grid —
        # declared sampling factors are irrelevant and must be ignored
        # (some encoders keep 2x2 luma factors when writing grayscale)
        cid, _ch, _cv, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = bytearray(mcux * ch * 8 * mcuy * cv * 8)
    preds = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    reader = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:  # restart: next segment, reset DC
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment in JPEG stream")
            reader = _BitReader(segs[seg_idx])
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(m, mcux)
        for cid, ch, cv, tq in comps:
            td, ta = scan_tables[cid]
            try:
                qt = quant[tq]
                dct, act = huff_dc[td], huff_ac[ta]
            except KeyError:
                raise ValueError("JPEG references undefined DQT/DHT table")
            plane = planes[cid]
            pw = mcux * ch * 8
            for by in range(cv):
                for bx in range(ch):
                    t = reader.decode_symbol(dct)
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    preds[cid] += diff
                    coef = [0.0] * 64
                    coef[0] = preds[cid] * qt[0]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC coefficient index overflow")
                        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) * qt[k]
                        k += 1
                    block = _idct_block(coef)
                    x0 = (mx * ch + bx) * 8
                    y0 = (my * cv + by) * 8
                    for yy in range(8):
                        row = (y0 + yy) * pw + x0
                        plane[row : row + 8] = bytes(
                            block[yy * 8 : yy * 8 + 8]
                        )
    return _planes_to_pixels(w, h, comps, planes, mcux, hmax, vmax)


def _planes_to_pixels(w, h, comps, planes, mcux, hmax, vmax):
    """Upsample to full resolution + color convert, cropped to (w, h) —
    shared tail of the baseline and progressive reconstruction paths."""
    nch = len(comps)
    out = bytearray(w * h * (3 if nch == 3 else 1))
    if nch == 1:
        cid, ch, cv, _ = comps[0]
        plane, pw = planes[cid], mcux * ch * 8
        for y in range(h):
            src = y * pw
            out[y * w : (y + 1) * w] = plane[src : src + w]
        return w, h, 1, bytes(out)
    (yid, yh, yv, _), (cbid, bh, bv, _), (crid, rh, rv, _) = comps
    py, pb, pr = planes[yid], planes[cbid], planes[crid]
    wy, wb, wr = mcux * yh * 8, mcux * bh * 8, mcux * rh * 8
    sxb, syb = hmax // bh, vmax // bv
    sxr, syr = hmax // rh, vmax // rv
    sxy, syy = hmax // yh, vmax // yv
    for y in range(h):
        oy = y * w * 3
        ry = (y // syy) * wy
        rb = (y // syb) * wb
        rr = (y // syr) * wr
        for x in range(w):
            Y = py[ry + x // sxy]
            cb = pb[rb + x // sxb] - 128
            cr = pr[rr + x // sxr] - 128
            r = Y + 1.402 * cr
            g = Y - 0.344136 * cb - 0.714136 * cr
            b = Y + 1.772 * cb
            o = oy + x * 3
            out[o] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            out[o + 2] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
    return w, h, 3, bytes(out)


def _frame_geometry(frame):
    """Shared frame geometry: single-component frames are non-interleaved
    by definition (T.81 A.2.2) so their declared sampling factors are
    normalized to 1x1, exactly as the baseline path does."""
    w, h, comps = frame
    if len(comps) == 1:
        cid, _ch, _cv, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return w, h, comps, hmax, vmax, mcux, mcuy


def _comp_block_grid(w, h, ch, cv, hmax, vmax):
    """Non-interleaved block grid of one component: T.81 A.2.2 — blocks
    cover the component's ACTUAL sample dimensions ceil'd to 8, NOT the
    MCU-padded grid (the padded dummy blocks are coded only in
    interleaved scans)."""
    cw = (w * ch + hmax - 1) // hmax
    chh = (h * cv + vmax - 1) // vmax
    return (cw + 7) // 8, (chh + 7) // 8


def _progressive_scan(
    frame, coefs, scan_order, scan_tables, ss, se, ah, al,
    huff_dc, huff_ac, dri, segs,
):
    """Decode one progressive scan (T.81 G.2) into the coefficient store.

    ``coefs[cid]`` holds one 64-int list per block (zigzag order, raw
    unquantized values) on the MCU-padded grid; scans accumulate bits of
    precision into it and ``_finish_progressive`` dequantizes + IDCTs
    once at EOI. Four scan kinds: DC first (Ss=0, Ah=0), DC refinement
    (Ss=0, Ah>0), AC first (Ss>0, Ah=0) and AC refinement (Ss>0, Ah>0)
    with EOB-run skipping; DC scans may be interleaved (Ns>1, MCU
    order), AC scans are single-component by construction (B.2.3) and
    walk the component's own block raster."""
    w, h, comps, hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    byid = {c[0]: c for c in comps}
    for cid, ch, cv, _tq in comps:
        if cid not in coefs:
            coefs[cid] = [
                [0] * 64 for _ in range(mcux * ch * mcuy * cv)
            ]
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan_order) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ss > se or se > 63:
        raise ValueError(f"bad spectral band {ss}..{se}")

    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = {cid: 0 for cid in scan_order}
    eobrun = 0

    def restart():
        nonlocal seg_idx, reader, eobrun
        seg_idx += 1
        if seg_idx >= len(segs):
            raise ValueError("missing restart segment in JPEG stream")
        reader = _BitReader(segs[seg_idx])
        for cid in preds:
            preds[cid] = 0
        eobrun = 0

    def dc_first(cid, block):
        td = scan_tables[cid][0]
        try:
            dct = huff_dc[td]
        except KeyError:
            raise ValueError("JPEG references undefined DHT table")
        t = reader.decode_symbol(dct)
        diff = _extend(reader.read_bits(t), t) if t else 0
        preds[cid] += diff
        block[0] = preds[cid] << al

    def dc_refine(block):
        if reader.read_bit():
            block[0] |= 1 << al

    def ac_first(act, block):
        nonlocal eobrun
        if eobrun:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC coefficient index overflow")
            block[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def ac_refine(act, block):
        # T.81 G.1.2.3 (same structure as libjpeg's AC refinement):
        # correction bits for already-nonzero coefficients interleave
        # with run-length-coded newly-significant ±1·2^Al insertions;
        # an EOB run covers the band tails of the next ``eobrun`` blocks
        # (correction bits still read inside each covered tail).
        nonlocal eobrun
        p1 = 1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                elif s == 1:
                    newval = p1 if reader.read_bit() else -p1
                else:
                    raise ValueError(
                        "AC refinement magnitude must be 1"
                    )
                while k <= se:
                    c = block[k]
                    if c != 0:
                        if reader.read_bit() and not (abs(c) & p1):
                            block[k] = c + (p1 if c > 0 else -p1)
                    else:
                        if r == 0:
                            if newval:
                                block[k] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= se:
                c = block[k]
                if c != 0:
                    if reader.read_bit() and not (abs(c) & p1):
                        block[k] = c + (p1 if c > 0 else -p1)
                k += 1
            eobrun -= 1

    if ss == 0 and len(scan_order) > 1:
        # interleaved DC scan: MCU traversal over the padded grid
        for m in range(mcux * mcuy):
            if dri and m and m % dri == 0:
                restart()
            my, mx = divmod(m, mcux)
            for cid in scan_order:
                _cid, ch, cv, _tq = byid[cid]
                bw = mcux * ch
                for by in range(cv):
                    for bx in range(ch):
                        block = coefs[cid][
                            (my * cv + by) * bw + mx * ch + bx
                        ]
                        if ah == 0:
                            dc_first(cid, block)
                        else:
                            dc_refine(block)
    else:
        # non-interleaved: raster over the component's own block grid
        cid = scan_order[0]
        _cid, ch, cv, _tq = byid[cid]
        bw = mcux * ch
        nbx, nby = _comp_block_grid(w, h, ch, cv, hmax, vmax)
        act = None
        if ss > 0:
            try:
                act = huff_ac[scan_tables[cid][1]]
            except KeyError:
                raise ValueError("JPEG references undefined DHT table")
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if dri and n and n % dri == 0:
                    restart()
                n += 1
                block = coefs[cid][by * bw + bx]
                if ss == 0:
                    if ah == 0:
                        dc_first(cid, block)
                    else:
                        dc_refine(block)
                elif ah == 0:
                    ac_first(act, block)
                else:
                    ac_refine(act, block)


def _finish_progressive(frame, coefs, quant):
    """Dequantize + IDCT every accumulated block, then reuse the shared
    upsample/color-convert tail."""
    w, h, comps, hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    planes = {}
    for cid, ch, cv, tq in comps:
        try:
            qt = quant[tq]
        except KeyError:
            raise ValueError("JPEG references undefined DQT table")
        bw, bh = mcux * ch, mcuy * cv
        pw = bw * 8
        plane = bytearray(pw * bh * 8)
        blocks = coefs.get(cid)
        if blocks is None:
            raise ValueError(f"no scan data for component {cid}")
        for bi, zz in enumerate(blocks):
            by, bx = divmod(bi, bw)
            coef = [0.0] * 64
            for k in range(64):
                if zz[k]:
                    coef[ZIGZAG[k]] = zz[k] * qt[k]
            block = _idct_block(coef)
            x0, y0 = bx * 8, by * 8
            for yy in range(8):
                row = (y0 + yy) * pw + x0
                plane[row : row + 8] = bytes(block[yy * 8 : yy * 8 + 8])
        planes[cid] = plane
    return _planes_to_pixels(w, h, comps, planes, mcux, hmax, vmax)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


def _encode_planes(width, height, pixels, channels, hs, vs):
    """Color convert + chroma box-subsample front end shared by the
    baseline and progressive encoders. Returns (planes, comp_geom) with
    comp_geom rows (cid, h, v, tq, plane_w, plane_h)."""
    if channels == 1:
        return [list(pixels)], [(1, hs, vs, 0, width, height)]
    ny = [0.0] * (width * height)
    ncb = [0.0] * (width * height)
    ncr = [0.0] * (width * height)
    for i in range(width * height):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        ny[i] = 0.299 * r + 0.587 * g + 0.114 * b
        ncb[i] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        ncr[i] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cw = (width + hs - 1) // hs
    chh = (height + vs - 1) // vs

    def box(src):
        out = [0.0] * (cw * chh)
        for yy in range(chh):
            for xx in range(cw):
                acc, n = 0.0, 0
                for dy in range(vs):
                    for dx in range(hs):
                        sy, sx = yy * vs + dy, xx * hs + dx
                        if sy < height and sx < width:
                            acc += src[sy * width + sx]
                            n += 1
                out[yy * cw + xx] = acc / n
        return out

    return [ny, box(ncb), box(ncr)], [
        (1, hs, vs, 0, width, height),
        (2, 1, 1, 1, cw, chh),
        (3, 1, 1, 1, cw, chh),
    ]


def _fdct_block(block: list[int]) -> list[float]:
    # _COS carries c(u)/2 per axis, so two passes give the spec's
    # 1/4·c(u)c(v) scaling (A.3.3) with no extra factor
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        row = [block[base + x] - 128 for x in range(8)]
        for u in range(8):
            tmp[base + u] = sum(row[x] * _COS[u][x] for x in range(8))
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            out[v * 8 + u] = sum(col[y] * _COS[v][y] for y in range(8))
    return out


def _mag_category(v: int) -> int:
    t = 0
    a = abs(v)
    while a:
        a >>= 1
        t += 1
    return t


def _encode_block(
    bw: _BitWriter, block: list[int], qt: list[int],
    dc_codes, ac_codes, pred: int,
) -> int:
    coef = _fdct_block(block)
    q = [int(round(coef[ZIGZAG[k]] / qt[k])) for k in range(64)]
    diff = q[0] - pred
    t = _mag_category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if q[k]), default=0)
    for k in range(1, last_nz + 1):
        if q[k] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _mag_category(q[k])
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        v = q[k]
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return q[0]


def jpeg_encode(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsample: tuple[int, int] = (1, 1),
) -> bytes:
    """Baseline JPEG from raw 8-bit interleaved pixels (gray or RGB) with
    the Annex K example tables. ``subsample=(2, 2)`` emits 4:2:0 (chroma
    box-filtered), exercising the decoder's general MCU path. Fixture/
    round-trip counterpart of ``jpeg_decode`` (lossy: expect tolerance)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    hs, vs = subsample
    if channels == 1:
        hs = vs = 1
    if not (1 <= hs <= 2 and 1 <= vs <= 2):
        raise ValueError("subsample factors must be 1 or 2")

    planes, comp_geom = _encode_planes(width, height, pixels, channels, hs, vs)
    mcux = (width + 8 * hs - 1) // (8 * hs)
    mcuy = (height + 8 * vs - 1) // (8 * vs)

    luma_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    luma_ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    chroma_codes = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    chroma_ac = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = {cid: 0 for cid, *_ in comp_geom}
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (cid, ch, cv, tq, pw, ph) in enumerate(comp_geom):
            plane = planes[ci]
            qt = [
                (QUANT_LUMA if tq == 0 else QUANT_CHROMA)[ZIGZAG[k]]
                for k in range(64)
            ]
            for by in range(cv):
                for bx in range(ch):
                    x0, y0 = (mx * ch + bx) * 8, (my * cv + by) * 8
                    block = [0] * 64
                    for yy in range(8):
                        sy = min(y0 + yy, ph - 1)
                        for xx in range(8):
                            sx = min(x0 + xx, pw - 1)
                            block[yy * 8 + xx] = int(plane[sy * pw + sx] + 0.5)
                    preds[cid] = _encode_block(
                        bw,
                        block,
                        qt,
                        luma_codes if tq == 0 else chroma_codes,
                        luma_ac if tq == 0 else chroma_ac,
                        preds[cid],
                    )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    zz = bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64))
    zzc = bytes(QUANT_CHROMA[ZIGZAG[k]] for k in range(64))
    out = bytearray(JPEG_SOI)
    out += seg(0xDB, b"\x00" + zz)
    if channels == 3:
        out += seg(0xDB, b"\x01" + zzc)
    sof = bytearray(struct.pack(">BHHB", 8, height, width, channels))
    for cid, ch, cv, tq, _pw, _ph in comp_geom:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if channels == 3:
        out += seg(0xC4, bytes([0x01] + DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11] + AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    sos = bytearray([channels])
    for cid, *_ in comp_geom:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """Canonical Huffman table with every symbol at one length L chosen so
    2^L > n — valid per T.81 C.2 and the all-ones code stays unused (so
    1-bit padding can never alias a real symbol). Fixture-grade: ~8 bits
    per AC symbol instead of entropy-optimal, irrelevant for tests."""
    n = len(symbols)
    L = max(1, n.bit_length())  # smallest L with 2^L >= n + 1
    bits = [0] * 16
    bits[L - 1] = n
    vals = sorted(symbols)
    return bits, vals, _canonical_codes(bits, vals)


def _shrink(v: int, al: int) -> int:
    """AC successive-approximation point transform: divide by 2^Al rounded
    TOWARD ZERO (T.81 G.1.2.2) — distinct from the DC arithmetic shift."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgressiveWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with the
    shared EOB-run machinery (pending run + buffered refinement
    correction bits, T.81 G.1.2.2-3 / figure G.7 structure)."""

    def __init__(self, ac_codes) -> None:
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits riding the EOB run

    def sym(self, s: int) -> None:
        code, length = self.ac[s]
        self.bw.write(code, length)

    def flush_eob(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def count_eob(self, bits: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(bits)
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def jpeg_encode_progressive(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsample: tuple[int, int] = (1, 1),
    successive: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JPEG from raw 8-bit interleaved pixels.

    Quantizes with the same Annex K tables and FDCT as ``jpeg_encode``,
    so the coefficient set is IDENTICAL to the baseline encoding of the
    same pixels — which makes ``jpeg_decode`` of the two streams
    pixel-for-pixel equal, the exactness lever the round-trip tests use.

    Scan script with ``successive=True`` exercises every progressive
    decode path: interleaved DC first at Al=1, DC refinement, per-
    component AC spectral bands (1-5, 6-63) at Al=1 with EOB runs and
    ZRL, then AC refinement scans (newly-significant insertion +
    correction bits + EOB-run bit buffering). ``successive=False`` emits
    plain spectral selection (single-precision scans, Al=0), the
    simplest legal progressive layout. Huffman tables are flat
    fixed-length (``_flat_table``) — EOBn symbols up to r=14 need codes
    the Annex K tables don't carry. ``restart_interval`` emits DRI + RSTn
    markers every N MCUs (DC scans) / N blocks (AC scans): restart
    boundaries reset DC predictors AND terminate EOB runs, the subtlety
    the decoder's restart path must honor (camera/web JPEGs ship DRI
    routinely)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    hs, vs = subsample
    if channels == 1:
        hs = vs = 1
    if not (1 <= hs <= 2 and 1 <= vs <= 2):
        raise ValueError("subsample factors must be 1 or 2")

    planes, comp_geom = _encode_planes(width, height, pixels, channels, hs, vs)
    hmax = max(g[1] for g in comp_geom)
    vmax = max(g[2] for g in comp_geom)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag coefficient blocks per component, padded MCU grid
    blocks: dict[int, list[list[int]]] = {}
    for ci, (cid, ch, cv, tq, pw, ph) in enumerate(comp_geom):
        plane = planes[ci]
        qt = [
            (QUANT_LUMA if tq == 0 else QUANT_CHROMA)[ZIGZAG[k]]
            for k in range(64)
        ]
        bw_, bh_ = mcux * ch, mcuy * cv
        comp_blocks = []
        for bi in range(bw_ * bh_):
            by, bx = divmod(bi, bw_)
            x0, y0 = bx * 8, by * 8
            block = [0] * 64
            for yy in range(8):
                sy = min(y0 + yy, ph - 1)
                for xx in range(8):
                    sx = min(x0 + xx, pw - 1)
                    block[yy * 8 + xx] = int(plane[sy * pw + sx] + 0.5)
            coef = _fdct_block(block)
            comp_blocks.append(
                [int(round(coef[ZIGZAG[k]] / qt[k])) for k in range(64)]
            )
        blocks[cid] = comp_blocks

    dc_bits, dc_vals, dc_codes = _flat_table(list(range(12)))
    ac_bits, ac_vals, ac_codes = _flat_table(list(range(0xFF)))
    byid = {g[0]: g for g in comp_geom}
    cids = [g[0] for g in comp_geom]
    dri = int(restart_interval)

    def _rst(bw, n):
        # pad to a byte boundary, then the marker goes in RAW (markers
        # are never byte-stuffed)
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + (n % 8)])

    def dc_scan(al: int) -> bytes:
        bw = _BitWriter()
        preds = {cid: 0 for cid in cids}
        for m in range(mcux * mcuy):
            if dri and m and m % dri == 0:
                _rst(bw, m // dri - 1)
                preds = {cid: 0 for cid in cids}
            my, mx = divmod(m, mcux)
            for cid in cids:
                _c, ch, cv, _tq, _pw, _ph = byid[cid]
                gw = mcux * ch
                for by in range(cv):
                    for bx in range(ch):
                        dc = blocks[cid][(my * cv + by) * gw + mx * ch + bx][0]
                        d = dc >> al  # arithmetic shift (G.1.2.1)
                        diff = d - preds[cid]
                        preds[cid] = d
                        t = _mag_category(diff)
                        code, length = dc_codes[t]
                        bw.write(code, length)
                        if t:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
        bw.flush()
        return bytes(bw.out)

    def dc_refine_scan(al: int) -> bytes:
        bw = _BitWriter()
        for m in range(mcux * mcuy):
            if dri and m and m % dri == 0:
                _rst(bw, m // dri - 1)
            my, mx = divmod(m, mcux)
            for cid in cids:
                _c, ch, cv, _tq, _pw, _ph = byid[cid]
                gw = mcux * ch
                for by in range(cv):
                    for bx in range(ch):
                        dc = blocks[cid][(my * cv + by) * gw + mx * ch + bx][0]
                        bw.write((dc >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def comp_grid(cid):
        _c, ch, cv, _tq, _pw, _ph = byid[cid]
        gw = mcux * ch
        nbx, nby = _comp_block_grid(width, height, ch, cv, hmax, vmax)
        return [blocks[cid][by * gw + bx] for by in range(nby) for bx in range(nbx)]

    def ac_first_scan(cid, ss, se, al) -> bytes:
        w = _ProgressiveWriter(ac_codes)
        for n, zz in enumerate(comp_grid(cid)):
            if dri and n and n % dri == 0:
                w.flush_eob()  # an EOB run cannot span a restart
                _rst(w.bw, n // dri - 1)
            av = [_shrink(zz[k], al) for k in range(64)]
            last = max((k for k in range(ss, se + 1) if av[k]), default=None)
            if last is None:
                w.count_eob([])
                continue
            w.flush_eob()
            run = 0
            for k in range(ss, last + 1):
                v = av[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    w.sym(0xF0)  # ZRL
                    run -= 16
                s = _mag_category(v)
                w.sym((run << 4) | s)
                w.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last < se:
                w.eobrun = 1
        w.flush_eob()
        w.bw.flush()
        return bytes(w.bw.out)

    def ac_refine_scan(cid, ss, se, al) -> bytes:
        # mirror of the decoder's G.1.2.3 walk (and libjpeg's
        # encode_mcu_AC_refine): r counts zero-HISTORY positions only;
        # correction bits buffer until the next emitted symbol; ZRLs
        # flush only bits lying within their 16-zero advance (guaranteed
        # because every nonzero position re-checks the r > 15 condition
        # before buffering its own bit).
        w = _ProgressiveWriter(ac_codes)
        for n, zz in enumerate(comp_grid(cid)):
            if dri and n and n % dri == 0:
                w.flush_eob()  # pending run + correction bits end here
                _rst(w.bw, n // dri - 1)
            absv = [abs(_shrink(zz[k], al)) for k in range(64)]
            eob = max(
                (k for k in range(ss, se + 1) if absv[k] == 1), default=ss - 1
            )
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    w.flush_eob()
                    w.sym(0xF0)
                    r -= 16
                    for b in br:
                        w.bw.write(b, 1)
                    br = []
                if t > 1:  # history coefficient: next magnitude bit
                    br.append(t & 1)
                    continue
                # newly significant +-1<<al
                w.flush_eob()
                w.sym((r << 4) | 1)
                w.bw.write(1 if zz[k] > 0 else 0, 1)
                for b in br:
                    w.bw.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                w.count_eob(br)
        w.flush_eob()
        w.bw.flush()
        return bytes(w.bw.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(JPEG_SOI)
    out += seg(0xDB, b"\x00" + bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64)))
    if channels == 3:
        out += seg(
            0xDB, b"\x01" + bytes(QUANT_CHROMA[ZIGZAG[k]] for k in range(64))
        )
    sof = bytearray(struct.pack(">BHHB", 8, height, width, channels))
    for cid, ch, cv, tq, _pw, _ph in comp_geom:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC2, bytes(sof))  # SOF2: progressive DCT, Huffman
    out += seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))

    def sos(comps: list[int], ss, se, ah, al, entropy: bytes) -> bytes:
        hdr = bytearray([len(comps)])
        for cid in comps:
            hdr += bytes([cid, 0x00])  # Td=0, Ta=0 (shared flat tables)
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(hdr)) + entropy

    if successive:
        out += sos(cids, 0, 0, 0, 1, dc_scan(1))
        out += sos(cids, 0, 0, 1, 0, dc_refine_scan(0))
        for cid in cids:
            out += sos([cid], 1, 5, 0, 1, ac_first_scan(cid, 1, 5, 1))
            out += sos([cid], 6, 63, 0, 1, ac_first_scan(cid, 6, 63, 1))
        for cid in cids:
            out += sos([cid], 1, 5, 1, 0, ac_refine_scan(cid, 1, 5, 0))
            out += sos([cid], 6, 63, 1, 0, ac_refine_scan(cid, 6, 63, 0))
    else:
        out += sos(cids, 0, 0, 0, 0, dc_scan(0))
        for cid in cids:
            out += sos([cid], 1, 63, 0, 0, ac_first_scan(cid, 1, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_pixel_features(data: bytes, *, dim: int = 16) -> list[float]:
    """REAL image features from decoded JPEG pixels — same per-quadrant
    per-channel mean shape as ``png.png_pixel_features``."""
    from skope_api_spark.operators.png import quadrant_features

    return quadrant_features(*jpeg_decode(data), dim=dim)
