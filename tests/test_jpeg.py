"""Pure-stdlib JPEG codec: baseline lossy round-trips within tolerance,
PROGRESSIVE (SOF2) decode pixel-exact against the baseline path on
identical coefficients (plus a libjpeg golden file), grayscale and 4:2:0
subsampled scans, guard rails (MAX_PIXELS, lossless/arithmetic rejection,
truncation), and the real-pixel feature kernel through the Spark
mapInPandas stage."""

from __future__ import annotations

import struct

import pytest

from skope_api_spark.operators.jpeg import (
    JPEG_SOI,
    jpeg_decode,
    jpeg_encode,
    jpeg_pixel_features,
)


def _gradient_rgb(w, h):
    return bytes(
        (x * 255) // max(w - 1, 1)
        if c == 0
        else ((y * 255) // max(h - 1, 1) if c == 1 else 128)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


class TestRoundTrip:
    def test_uniform_color_nearly_exact(self):
        w, h = 16, 16
        px = bytes([200, 30, 90] * (w * h))
        w2, h2, ch, out = jpeg_decode(jpeg_encode(w, h, px))
        assert (w2, h2, ch) == (w, h, 3)
        assert max(abs(out[i] - px[i]) for i in range(len(px))) <= 3

    def test_smooth_gradient_within_tolerance(self):
        px = _gradient_rgb(32, 32)
        _, _, _, out = jpeg_decode(jpeg_encode(32, 32, px))
        err = max(abs(out[i] - px[i]) for i in range(len(px)))
        assert err <= 16  # quantization + block boundaries, no more

    def test_grayscale_single_component(self):
        w, h = 24, 24
        px = bytes((x * 8 + y) % 256 for y in range(h) for x in range(w))
        w2, h2, ch, out = jpeg_decode(jpeg_encode(w, h, px, channels=1))
        assert (w2, h2, ch) == (w, h, 1)
        assert max(abs(out[i] - px[i]) for i in range(len(px))) <= 4

    def test_420_subsampling_and_odd_dimensions(self):
        """2x2 chroma subsampling + width/height not multiples of the MCU
        exercises the general multi-block MCU path and edge cropping."""
        w, h = 20, 14
        px = bytes(
            [(x * 12) % 256, (y * 17) % 256, 80][c]
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        w2, h2, ch, out = jpeg_decode(jpeg_encode(w, h, px, subsample=(2, 2)))
        assert (w2, h2, ch) == (w, h, 3)
        mean_err = sum(abs(out[i] - px[i]) for i in range(len(px))) / len(px)
        assert mean_err <= 12  # chroma is quarter-res; luma stays tight

    def test_non_multiple_of_8_444(self):
        w, h = 11, 7
        px = _gradient_rgb(w, h)
        w2, h2, ch, out = jpeg_decode(jpeg_encode(w, h, px))
        assert (w2, h2, ch) == (w, h, 3)


class TestGuards:
    def test_not_jpeg_rejected(self):
        with pytest.raises(ValueError, match="SOI"):
            jpeg_decode(b"PK\x03\x04 not a jpeg")

    def test_oversized_dimensions_rejected(self):
        """A forged SOF0 claiming gigapixel dimensions must fail the
        MAX_PIXELS check before any allocation."""
        data = bytearray(jpeg_encode(8, 8, bytes(192)))
        sof = data.index(b"\xff\xc0")
        data[sof + 5 : sof + 9] = struct.pack(">HH", 65000, 65000)
        with pytest.raises(ValueError, match="MAX_PIXELS"):
            jpeg_decode(bytes(data))

    def test_baseline_relabeled_progressive_rejected_not_crashed(self):
        # a baseline stream with SOF0 rewritten to SOF2 is MALFORMED
        # progressive (its single scan claims the full 0..63 band, which
        # a progressive DC scan cannot) — clean error, not garbage pixels
        data = bytearray(jpeg_encode(8, 8, bytes(192)))
        sof = data.index(b"\xff\xc0")
        data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="Se=0"):
            jpeg_decode(bytes(data))

    def test_lossless_sof3_rejected_not_crashed(self):
        data = bytearray(jpeg_encode(8, 8, bytes(192)))
        sof = data.index(b"\xff\xc0")
        data[sof + 1] = 0xC3  # SOF3 lossless
        with pytest.raises(NotImplementedError, match="lossless"):
            jpeg_decode(bytes(data))

    def test_truncated_entropy_data_rejected(self):
        data = jpeg_encode(16, 16, _gradient_rgb(16, 16))
        with pytest.raises(ValueError):
            jpeg_decode(data[: len(data) // 2])

    def test_zero_dimension_rejected(self):
        data = bytearray(jpeg_encode(8, 8, bytes(192)))
        sof = data.index(b"\xff\xc0")
        data[sof + 5 : sof + 9] = struct.pack(">HH", 0, 8)
        with pytest.raises(ValueError, match="zero-dimension"):
            jpeg_decode(bytes(data))


class TestFeatures:
    def test_quadrant_features_reflect_real_pixels(self):
        """Left half red, right half blue: the red-channel means of the
        left quadrants must dominate, proving features come from decoded
        pixels, not a hash."""
        w, h = 16, 16
        px = bytes(
            ([250, 10, 10] if x < 8 else [10, 10, 250])[c]
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        f = jpeg_pixel_features(jpeg_encode(w, h, px))
        # layout: quadrant-major, channel-minor (q0=TL, q1=TR, q2=BL, q3=BR)
        assert f[0] > 0.85 and f[2 * 3 + 0] > 0.85  # left: red high
        assert f[1 * 3 + 2] > 0.85 and f[3 * 3 + 2] > 0.85  # right: blue high
        assert f[1 * 3 + 0] < 0.2 and f[3 * 3 + 0] < 0.2  # right: red low

    def test_encoder_seam_uses_jpeg_pixels_and_falls_back(self, spark):
        """pixel_or_hash_encoder: real decode for valid baseline JPEG,
        deterministic hash fallback for a corrupt one — batch survives."""
        from skope_api_spark.operators import multimodal as mm

        good = jpeg_encode(16, 16, bytes([250, 10, 10] * 256))
        corrupt = good[:40] + b"\x00" * 10  # broken mid-header
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(corrupt))],
            "media_id long, content binary",
        )
        rows = {r.media_id: r.feature for r in mm.extract_features(df).collect()}
        assert abs(rows[1][0] - 250 / 255) < 0.05  # real red mean
        assert rows[2] == [
            pytest.approx(v) for v in mm.hash_pseudo_encoder()(bytes(corrupt))
        ]

    def test_sniffer_reports_jpeg_dims(self):
        from skope_api_spark.operators.multimodal import _sniff_image

        fmt, w, h = _sniff_image(jpeg_encode(20, 14, bytes(20 * 14 * 3)))
        assert (fmt, w, h) == ("jpeg", 20, 14)
        assert jpeg_encode(8, 8, bytes(192))[:2] == JPEG_SOI


class TestScanLayouts:
    def test_partial_multi_component_scan_rejected_cleanly(self):
        """SOS covering 1 of 3 frame components (legal non-interleaved
        multi-scan baseline) must raise NotImplementedError — not KeyError,
        which would escape the multimodal fallback seam."""
        data = bytearray(jpeg_encode(8, 8, bytes([10, 20, 30] * 64)))
        sos = data.index(b"\xff\xda")
        # rewrite SOS: ns=1, component 1 only, then the 3 fixed bytes
        new_sos = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        data[sos : sos + 14] = new_sos  # old SOS was 2+2+1+6+3 = 14 bytes
        with pytest.raises(NotImplementedError, match="non-interleaved"):
            jpeg_decode(bytes(data))
        # and the encoder seam falls back instead of crashing the batch
        from skope_api_spark.operators import multimodal as mm

        feats = mm.pixel_or_hash_encoder()(bytes(data))
        assert feats == mm.hash_pseudo_encoder()(bytes(data))

    def test_grayscale_with_declared_2x2_sampling_decodes(self):
        """Single-component frames are non-interleaved by definition; some
        encoders keep 2x2 luma factors when writing grayscale. Forcing the
        factors in the header must not change the decode."""
        w, h = 24, 16
        px = bytes((3 * x + 2 * y) % 200 for y in range(h) for x in range(w))
        data = bytearray(jpeg_encode(w, h, px, channels=1))
        sof = data.index(b"\xff\xc0")
        assert data[sof + 11] == 0x11  # declared 1x1
        data[sof + 11] = 0x22  # pretend 2x2 sampling
        w2, h2, ch, out = jpeg_decode(bytes(data))
        assert (w2, h2, ch) == (w, h, 1)
        assert max(abs(out[i] - px[i]) for i in range(len(px))) <= 4


class TestProgressive:
    """Progressive (SOF2) decode: the exactness lever is that
    ``jpeg_encode_progressive`` quantizes with the same FDCT + Annex K
    tables as ``jpeg_encode``, so the two streams carry IDENTICAL
    coefficients and must decode to IDENTICAL pixels — every assertion
    here is exact equality, not lossy tolerance."""

    CASES = [
        (16, 16, 3, (1, 1), "gradient"),
        (24, 17, 3, (2, 2), "random"),  # 4:2:0, odd height
        (21, 13, 3, (2, 1), "random"),  # 4:2:2, odd dims
        (19, 11, 1, (1, 1), "random"),  # grayscale, odd dims
        (40, 33, 3, (2, 2), "random"),  # multi-MCU + padded block column
    ]

    @staticmethod
    def _img(w, h, c, kind, seed=0):
        if kind == "random":
            import random

            rng = random.Random(seed * 7919 + w * 31 + h)
            return bytes(rng.randrange(256) for _ in range(w * h * c))
        return bytes(
            (x * 3 + y * 5 + ch * 40) % 256
            for y in range(h)
            for x in range(w)
            for ch in range(c)
        )

    @pytest.mark.parametrize("case", CASES)
    @pytest.mark.parametrize("successive", [False, True])
    def test_pixel_exact_vs_baseline(self, case, successive):
        from skope_api_spark.operators.jpeg import jpeg_encode_progressive

        w, h, c, sub, kind = case
        img = self._img(w, h, c, kind)
        base = jpeg_decode(jpeg_encode(w, h, img, channels=c, subsample=sub))
        prog = jpeg_decode(
            jpeg_encode_progressive(
                w, h, img, channels=c, subsample=sub, successive=successive
            )
        )
        assert prog == base

    def test_successive_approximation_exercises_refinement(self):
        """The Al=1 first scans must leave a stream whose refinement
        scans carry real information: decoding a TRUNCATED successive
        stream (refinement scans dropped) must differ from the full
        decode — proves the refinement paths change pixels."""
        from skope_api_spark.operators.jpeg import jpeg_encode_progressive

        w, h = 24, 16
        img = self._img(w, h, 3, "random", seed=3)
        data = jpeg_encode_progressive(w, h, img, successive=True)
        # drop everything from the first REFINEMENT SOS (3rd of 10 scans
        # is the first AC scan; refinements start after 2 + 2*3 scans)
        sos_positions = []
        i = 2
        while True:
            j = data.find(b"\xff\xda", i)
            if j < 0:
                break
            sos_positions.append(j)
            i = j + 2
        # 14 scans: DC first + DC refine + 6 AC first + 6 AC refine
        assert len(sos_positions) == 14
        truncated = data[: sos_positions[8]] + b"\xff\xd9"  # drop refines
        full = jpeg_decode(data)
        part = jpeg_decode(truncated)
        assert part[:3] == full[:3]
        assert part[3] != full[3]

    def test_eob_run_paths(self):
        """A mostly-flat image makes nearly every AC block empty, driving
        EOBRUN accumulation (including the multi-block EOBn encode/decode
        path) on both first and refinement scans."""
        from skope_api_spark.operators.jpeg import jpeg_encode_progressive

        w, h = 64, 48  # 48 luma blocks, almost all AC-empty
        img = bytearray([77] * (w * h * 3))
        img[0] = 200  # one busy corner block
        img = bytes(img)
        base = jpeg_decode(jpeg_encode(w, h, img))
        for successive in (False, True):
            prog = jpeg_decode(
                jpeg_encode_progressive(w, h, img, successive=successive)
            )
            assert prog == base

    def test_golden_libjpeg_progressive_file(self):
        """Real progressive JPEG produced by a production encoder (libjpeg
        scan script with successive approximation), shipped in the
        container's rust docs. Proves scan-structure compatibility beyond
        our own encoder's dialect: interleaved DC, per-component spectral
        bands, DC+AC refinement, per-scan DHT redefinition."""
        import os

        path = (
            "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/"
            "share/doc/rust/html/embedded-book/assets/f3.jpg"
        )
        if not os.path.exists(path):
            pytest.skip("golden progressive fixture not present")
        data = open(path, "rb").read()
        w, h, c, px = jpeg_decode(data)
        assert (w, h, c) == (720, 477, 3)
        n = len(px)
        assert n == w * h * 3
        mean = sum(px) / n
        sample = px[::97]
        var = sum((p - mean) ** 2 for p in sample) / len(sample)
        # a natural photo: mid-range mean, substantial variance
        assert 40 < mean < 220
        assert var ** 0.5 > 20
        # regression pin: future decoder refactors must reproduce this
        # output byte-for-byte (stability guard, recorded round 9)
        import hashlib

        assert hashlib.sha256(px).hexdigest() == (
            "5158c38d6e8df942c7c3188daf3bddb7"
            "c2116bd330a5b6f07a3031ff650f0d94"
        )

    def test_progressive_through_spark_feature_seam(self, spark):
        """A progressive (SOF2) JPEG must produce REAL pixel features
        through the mapInPandas extract_features path — before round 9 it
        fell to the hash pseudo-encoder."""
        from skope_api_spark.operators import multimodal as mm
        from skope_api_spark.operators.jpeg import jpeg_encode_progressive

        w, h = 16, 16
        px = bytes([250, 10, 10] * (w * h))  # solid red
        prog = jpeg_encode_progressive(w, h, px)
        df = spark.createDataFrame(
            [(1, bytearray(prog))], "media_id long, content binary"
        )
        rows = {r.media_id: r.feature for r in mm.extract_features(df).collect()}
        assert abs(rows[1][0] - 250 / 255) < 0.05  # real red mean, not hash
        assert rows[1] != mm.hash_pseudo_encoder()(prog)

    @pytest.mark.parametrize("dri", [1, 3])
    @pytest.mark.parametrize("successive", [False, True])
    def test_restart_markers_in_progressive_scans(self, dri, successive):
        """DRI + RSTn inside progressive scans: restart boundaries reset
        DC predictors AND terminate EOB runs mid-scan — still pixel-exact
        against the baseline decode of the same coefficients."""
        from skope_api_spark.operators.jpeg import jpeg_encode_progressive

        w, h = 40, 33
        img = self._img(w, h, 3, "random", seed=11)
        base = jpeg_decode(jpeg_encode(w, h, img, subsample=(2, 2)))
        prog = jpeg_decode(
            jpeg_encode_progressive(
                w, h, img, subsample=(2, 2),
                successive=successive, restart_interval=dri,
            )
        )
        assert prog == base


class TestProgressiveProperties:
    """Property-based sweep: ANY (dims, channels, subsample, scan script,
    restart interval, pixel content) must decode progressive == baseline
    pixel-exactly, because both encoders quantize identically."""

    def test_random_configs_pixel_exact(self):
        from hypothesis import given, settings, strategies as st

        from skope_api_spark.operators.jpeg import jpeg_encode_progressive

        @settings(max_examples=12, deadline=None)
        @given(
            w=st.integers(8, 36),
            h=st.integers(8, 36),
            gray=st.booleans(),
            sub=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
            successive=st.booleans(),
            dri=st.sampled_from([0, 1, 3]),
            seed=st.integers(0, 2**31),
        )
        def check(w, h, gray, sub, successive, dri, seed):
            import random

            c = 1 if gray else 3
            rng = random.Random(seed)
            img = bytes(rng.randrange(256) for _ in range(w * h * c))
            base = jpeg_decode(
                jpeg_encode(w, h, img, channels=c, subsample=sub)
            )
            prog = jpeg_decode(
                jpeg_encode_progressive(
                    w, h, img, channels=c, subsample=sub,
                    successive=successive, restart_interval=dri,
                )
            )
            assert prog == base

        check()
