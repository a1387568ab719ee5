"""VP8L (lossless WebP) codec: the entropy core is pinned by a REAL
libwebp-produced alpha stream shipped in the container's stdlib test
data; the pixel path round-trips exactly through the module's own
literal-only encoder; each transform is exercised by a bit-for-bit
constructed stream whose decode must recover hand-computed originals."""

from __future__ import annotations

import hashlib
import os
import random
import struct

import pytest

from skope_api_spark.operators.vp8l import (
    _DIST_MAP,
    _LsbWriter,
    _emit_codes_and_pixels,
    _emit_image_literal,
    vp8l_decode,
    vp8l_decode_stream,
    vp8l_encode,
    webp_alpha_plane,
)

GOLDEN = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
    "test_email/data/python.webp"
)


def _rand_argb(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(1 << 32) for _ in range(n)]


def _wrap_stream(body: _LsbWriter) -> bytes:
    return bytes(body.bytes())


class TestGolden:
    def test_libjpeg_alpha_plane_is_the_python_logo(self):
        """External pin for the WHOLE entropy layer (code-length codes
        with repeats, canonical prefixes, LZ77 2D distances, color
        cache): the stdlib webp's 194-byte libwebp-produced VP8L alpha
        stream must decode to the Python-logo silhouette."""
        if not os.path.exists(GOLDEN):
            pytest.skip("stdlib webp fixture not present")
        w, h, plane = webp_alpha_plane(open(GOLDEN, "rb").read())
        assert (w, h) == (16, 16)
        # the logo: opaque snakes on transparent corners
        assert plane[0] < 32 and plane[15] < 32  # top corners transparent
        assert plane[5 * 16 + 2] > 200  # snake body opaque
        mask = "".join(
            "#" if plane[i] > 128 else "." for i in range(256)
        )
        assert mask.count("#") > 80  # a real shape, not noise
        # regression pin (recorded round 9)
        assert hashlib.sha256(plane).hexdigest() == (
            "00d64fd72159f0e240eac94eb2a256366dad5e267b45a1920aa72771a8e6ff8c"
        )


class TestRoundTrip:
    @pytest.mark.parametrize(
        "w,h,c", [(7, 5, 4), (16, 16, 3), (33, 9, 4), (1, 1, 4), (64, 2, 4)]
    )
    def test_literal_encoder_exact(self, w, h, c):
        rng = random.Random(w * 131 + h)
        px = bytes(rng.randrange(256) for _ in range(w * h * c))
        W, H, C, out = vp8l_decode(vp8l_encode(w, h, px, channels=c))
        assert (W, H, C) == (w, h, 4)
        if c == 4:
            assert out == px
        else:
            assert out == b"".join(
                px[3 * i : 3 * i + 3] + b"\xff" for i in range(w * h)
            )


# libwebp's kCodeToPlane table (src/dsp/lossless_common.h domain): each
# byte encodes (yoffset = code >> 4, xoffset = 8 - (code & 0xF)).  This is
# the authoritative 120-entry mapping for distance codes 1..120; pinning
# ALL entries catches domain errors that only diverge in the tail (codes
# 97-120), where dy == 8 / dx == -8 candidates would otherwise sneak in.
_K_CODE_TO_PLANE = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
]


class TestDistanceMap:
    def test_first_entries_match_spec(self):
        """RFC 9649's dist_map opening sequence (xoffset, yoffset)."""
        assert _DIST_MAP[:24] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
            (-3, 2), (0, 4), (4, 0),
        ]
        assert len(_DIST_MAP) == 120
        assert len(set(_DIST_MAP)) == 120

    def test_all_120_entries_match_libwebp_plane_codes(self):
        """Every entry pinned against libwebp's kCodeToPlane byte table —
        in particular the tail: (8,0),(4,7),(-4,7),(7,4)... at codes
        97-100 and (7,7),(-7,7),(8,6),(8,7) at codes 117-120."""
        expected = [(8 - (c & 0xF), c >> 4) for c in _K_CODE_TO_PLANE]
        assert _DIST_MAP == expected
        assert _DIST_MAP[96:100] == [(8, 0), (4, 7), (-4, 7), (7, 4)]
        assert _DIST_MAP[-4:] == [(7, 7), (-7, 7), (8, 6), (8, 7)]


def _decode_constructed(bw: _LsbWriter, w: int, h: int):
    return vp8l_decode_stream(_wrap_stream(bw), w, h)


class TestTransforms:
    def test_subtract_green(self):
        w, h = 6, 4
        actual = _rand_argb(w * h, seed=1)
        residue = [
            (p & 0xFF00FF00)
            | ((((p >> 16) - (p >> 8)) & 0xFF) << 16)
            | ((p - (p >> 8)) & 0xFF)
            for p in actual
        ]
        bw = _LsbWriter()
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # subtract-green
        bw.write(0, 1)  # end of transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        _emit_codes_and_pixels(bw, residue)
        assert _decode_constructed(bw, w, h) == actual

    def test_predictor_all_14_modes(self):
        """4x4 blocks (size_bits=2), 14 blocks in a 16x14... use a
        16x16 image = 4x4 blocks = 16 blocks cycling through all 14
        modes. Residues computed with a forward predictor that mirrors
        the spec's neighbor rules; decode must reproduce the original
        exactly."""
        from skope_api_spark.operators import vp8l as V

        w = h = 16
        bits = 2  # 4x4 blocks
        sw = (w + 3) >> 2
        actual = _rand_argb(w * h, seed=2)
        modes = [(i % 14) for i in range(sw * ((h + 3) >> 2))]

        def predict(i, x, y):
            if x == 0 and y == 0:
                return 0xFF000000
            if y == 0:
                return actual[i - 1]
            if x == 0:
                return actual[i - w]
            m = modes[(y >> bits) * sw + (x >> bits)]
            L, T, TL = actual[i - 1], actual[i - w], actual[i - w - 1]
            # linear addressing: x == w-1 wraps to actual[y*w] (spec rule)
            TR = actual[i - w + 1]
            return [
                lambda: 0xFF000000, lambda: L, lambda: T, lambda: TR,
                lambda: TL, lambda: V._avg2(V._avg2(L, TR), T),
                lambda: V._avg2(L, TL), lambda: V._avg2(L, T),
                lambda: V._avg2(TL, T), lambda: V._avg2(T, TR),
                lambda: V._avg2(V._avg2(L, TL), V._avg2(T, TR)),
                lambda: V._select(T, L, TL),
                lambda: V._cas_full(L, T, TL),
                lambda: V._cas_half(L, T, TL),
            ][m]()

        def sub(a, b):  # per-channel (a - b) & 0xff
            return (
                ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
                | (((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8)
                | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
            )

        residue = [
            sub(actual[y * w + x], predict(y * w + x, x, y))
            for y in range(h)
            for x in range(w)
        ]
        mode_img = [0xFF000000 | (m << 8) for m in modes]
        bw = _LsbWriter()
        bw.write(1, 1)
        bw.write(0, 2)  # predictor
        bw.write(bits - 2, 3)
        _emit_image_literal(bw, mode_img)  # sub-image (level0=False)
        bw.write(0, 1)  # end transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        _emit_codes_and_pixels(bw, residue)
        assert _decode_constructed(bw, w, h) == actual

    def test_color_transform(self):
        from skope_api_spark.operators.vp8l import _ct_delta

        w, h = 8, 4
        bits = 2  # one 4x4 block column pair
        sw = (w + 3) >> 2
        actual = _rand_argb(w * h, seed=3)
        # one CTE per block: green_to_red (blue ch), green_to_blue
        # (green ch), red_to_blue (red ch)
        ctes = [0xFF000000 | (17 << 16) | (200 << 8) | 99,
                0xFF000000 | (250 << 16) | (3 << 8) | 128]

        def forward(p, cte):
            g = (p >> 8) & 0xFF
            g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            res_r = (r - _ct_delta(g2r, g)) & 0xFF
            res_b = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            return (p & 0xFF00FF00) | (res_r << 16) | res_b

        residue = [
            forward(actual[y * w + x], ctes[(y >> bits) * sw + (x >> bits)])
            for y in range(h)
            for x in range(w)
        ]
        bw = _LsbWriter()
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bw.write(bits - 2, 3)
        _emit_image_literal(bw, ctes)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _emit_codes_and_pixels(bw, residue)
        assert _decode_constructed(bw, w, h) == actual

    @pytest.mark.parametrize("ncolors", [3, 5, 12, 200])
    def test_palette_with_and_without_packing(self, ncolors):
        rng = random.Random(ncolors)
        w, h = 13, 5  # odd width exercises packed-row truncation
        palette = [rng.randrange(1 << 32) for _ in range(ncolors)]
        idx = [rng.randrange(ncolors) for _ in range(w * h)]
        actual = [palette[i] for i in idx]
        # delta-encode the palette sub-image (component-wise)
        def sub(a, b):
            return (
                ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
                | (((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8)
                | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
            )

        pal_img = [palette[0]] + [
            sub(palette[i], palette[i - 1]) for i in range(1, ncolors)
        ]
        if ncolors <= 2:
            pbits = 3
        elif ncolors <= 4:
            pbits = 2
        elif ncolors <= 16:
            pbits = 1
        else:
            pbits = 0
        bw = _LsbWriter()
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(ncolors - 1, 8)
        _emit_image_literal(bw, pal_img)
        bw.write(0, 1)  # end transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        if pbits:
            ibits = 8 >> pbits
            per = 8 // ibits
            pw = (w + per - 1) // per
            packed = []
            for y in range(h):
                for xb in range(pw):
                    g = 0
                    for k in range(per):
                        x = xb * per + k
                        if x < w:
                            g |= idx[y * w + x] << (k * ibits)
                    packed.append(0xFF000000 | (g << 8))
            _emit_codes_and_pixels(bw, packed)
        else:
            _emit_codes_and_pixels(
                bw, [0xFF000000 | (i << 8) for i in idx]
            )
        assert _decode_constructed(bw, w, h) == actual


class TestAlph:
    def test_raw_method_with_gradient_filter(self):
        w, h = 9, 6
        rng = random.Random(4)
        plane = [rng.randrange(256) for _ in range(w * h)]
        # forward-filter (gradient) the plane
        def clamp(v):
            return 0 if v < 0 else (255 if v > 255 else v)

        filtered = []
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = plane[i - 1]
                elif x == 0:
                    pred = plane[i - w]
                else:
                    pred = clamp(plane[i - 1] + plane[i - w] - plane[i - w - 1])
                filtered.append((plane[i] - pred) & 0xFF)
        from skope_api_spark.operators.vp8l import alph_decode

        payload = bytes([0x0C]) + bytes(filtered)  # method 0, filter 3
        assert list(alph_decode(payload, w, h)) == plane

    def test_reserved_method_rejected(self):
        from skope_api_spark.operators.vp8l import alph_decode

        with pytest.raises(ValueError, match="reserved"):
            alph_decode(b"\x03" + bytes(16), 4, 4)


class TestGuards:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            vp8l_decode(b"\x00\x01\x02\x03")

    def test_lossy_webp_rejected(self):
        chunk = b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(ValueError, match="lossless"):
            vp8l_decode(data)

    def test_oversized_rejected(self):
        bw = _LsbWriter()
        bw.write(0x2F, 8)
        bw.write((1 << 14) - 1, 14)
        bw.write((1 << 14) - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        with pytest.raises(ValueError, match="MAX_PIXELS"):
            vp8l_decode(bytes(bw.bytes()))


class TestSparkSeam:
    def test_vp8l_through_feature_extraction(self, spark):
        """A lossless-webp blob must yield REAL pixel features through
        the mapInPandas seam; a lossy (VP8) webp still hash-falls-back."""
        from skope_api_spark.operators import multimodal as mm

        w, h = 16, 16
        red = bytes([250, 10, 10, 255] * (w * h))
        lossless = vp8l_encode(w, h, red)
        lossy = (
            b"RIFF" + struct.pack("<I", 12) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        )
        df = spark.createDataFrame(
            [(1, bytearray(lossless)), (2, bytearray(lossy))],
            "media_id long, content binary",
        )
        rows = {
            r.media_id: r.feature for r in mm.extract_features(df).collect()
        }
        assert abs(rows[1][0] - 250 / 255) < 0.02  # real red mean
        assert rows[2] == [
            pytest.approx(v) for v in mm.hash_pseudo_encoder()(bytes(lossy))
        ]


class TestTailDistanceCodes:
    """Decode-path coverage for the 2D distance-map TAIL (codes 97-120)
    — the region the r10 domain fix changed. Streams are constructed
    bit-for-bit: literals, then one LZ77 backref whose distance prefix
    symbol is 13 (_prefix_value: 97 + 5 extra bits -> dcodes 97..128).
    Under the old (dy<=8, dx>=-8) map these copies either read the
    wrong offset or threw out-of-range."""

    @staticmethod
    def _emit_body(bw, literals, n_tail, length_sym, dist_extra):
        from skope_api_spark.operators import vp8l as V

        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta prefix
        V._emit_green_code(bw)
        V._emit_all8_code(bw)  # red
        V._emit_all8_code(bw)  # blue
        V._emit_all8_code(bw)  # alpha
        V._emit_single_symbol_code(bw, 13)  # distance prefix symbol 13

        def emit_literal(p):
            c, ln = V._green_code((p >> 8) & 0xFF)
            bw.write_code(c, ln)
            bw.write_code((p >> 16) & 0xFF, 8)
            bw.write_code(p & 0xFF, 8)
            bw.write_code((p >> 24) & 0xFF, 8)

        for p in literals:
            emit_literal(p)
        # LZ77 copy: green length symbol, then the 5 distance extra bits
        c, ln = V._green_code(length_sym)
        bw.write_code(c, ln)
        bw.write(dist_extra, 5)
        for p in n_tail:
            emit_literal(p)

    def test_dcode_97_copies_dist_8(self):
        """dcode 97 -> plane (8,0) -> dist = 0*w + 8 (the first entry
        the buggy map displaced: old (0,8) meant dist 128, out of range
        here)."""
        from skope_api_spark.operators.vp8l import _LsbWriter

        w, h = 16, 2
        lits = _rand_argb(24, seed=7)
        tail = _rand_argb(4, seed=8)
        bw = _LsbWriter()
        # length 4 = green sym 259 (code 3, no extra); extra bits 0 -> 97
        self._emit_body(bw, lits, tail, 259, 0)
        out = vp8l_decode_stream(_wrap_stream(bw), w, h)
        expect = lits + [lits[16], lits[17], lits[18], lits[19]] + tail
        assert out == expect

    def test_dcode_120_copies_dist_120(self):
        """dcode 120 (the map's last entry) -> plane (8,7) -> dist =
        7*16 + 8 = 120."""
        from skope_api_spark.operators.vp8l import _LsbWriter

        w, h = 16, 10
        lits = _rand_argb(128, seed=9)
        tail = _rand_argb(28, seed=10)
        bw = _LsbWriter()
        # extra bits 23 -> dcode 97 + 23 = 120
        self._emit_body(bw, lits, tail, 259, 23)
        out = vp8l_decode_stream(_wrap_stream(bw), w, h)
        expect = lits + [lits[8], lits[9], lits[10], lits[11]] + tail
        assert out == expect
