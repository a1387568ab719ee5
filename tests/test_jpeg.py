"""Pure-stdlib baseline JPEG codec: lossy round-trips within tolerance,
grayscale and 4:2:0 subsampled scans, guard rails (MAX_PIXELS, progressive
rejection, truncation), and the real-pixel feature kernel through the
Spark mapInPandas stage."""

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

    def test_progressive_rejected_not_crashed(self):
        data = bytearray(jpeg_encode(8, 8, bytes(192)))
        sof = data.index(b"\xff\xc0")
        data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError, match="progressive"):
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
