"""Pure-stdlib baseline JPEG codec — the second REAL image decode kernel.

Closes the last multimodal ``partial`` (VERDICT r06 item 7): with PNG
(``operators.png``) and baseline JPEG both decoded for real, the two
dominant web image formats produce actual-pixel features through the
``pixel_or_hash_encoder`` seam; the hash pseudo-embedding remains only for
formats that genuinely need codec libraries (GIF/WebP/audio/video).

Implements ITU-T T.81 (public spec) baseline sequential DCT:

- marker parse (SOI/APPn/COM/DQT/DHT/SOF0/SOS/DRI/EOI), 8-bit precision,
  1- or 3-component scans, arbitrary sampling factors up to 2x2 (4:4:4,
  4:2:2, 4:2:0), restart markers;
- canonical Huffman tables (BITS/HUFFVAL -> code assignment in length
  then value order), byte unstuffing (FF 00), receive/extend;
- dequantize -> de-zigzag -> separable float IDCT -> level shift;
- chroma upsample by replication, YCbCr -> RGB (BT.601 as in T.871).

Progressive (SOF2), arithmetic coding, 12-bit precision and CMYK raise
``NotImplementedError`` — inject a PIL-backed decoder for those; the seam
is unchanged. The encoder (baseline, Annex K example tables, optional
chroma subsampling) exists for fixtures/tests and the round-trip proof —
JPEG is lossy, so round-trips assert tolerance, not equality.

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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended/arithmetic JPEG unsupported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
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
    # upsample to full resolution + color convert, cropped to (w, h)
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

    # color convert to per-component planes
    if channels == 1:
        planes = [list(pixels)]
    else:
        ny = [0.0] * (width * height)
        ncb = [0.0] * (width * height)
        ncr = [0.0] * (width * height)
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            ny[i] = 0.299 * r + 0.587 * g + 0.114 * b
            ncb[i] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            ncr[i] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        # chroma subsample by box average
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
        planes = [ny, box(ncb), box(ncr)]

    comp_geom = (
        [(1, hs, vs, 0, width, height)]
        if channels == 1
        else [
            (1, hs, vs, 0, width, height),
            (2, 1, 1, 1, (width + hs - 1) // hs, (height + vs - 1) // vs),
            (3, 1, 1, 1, (width + hs - 1) // hs, (height + vs - 1) // vs),
        ]
    )
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


def jpeg_pixel_features(data: bytes, *, dim: int = 16) -> list[float]:
    """REAL image features from decoded JPEG pixels — same per-quadrant
    per-channel mean shape as ``png.png_pixel_features``."""
    from skope_api_spark.operators.png import quadrant_features

    return quadrant_features(*jpeg_decode(data), dim=dim)
