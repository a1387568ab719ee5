"""Pure-stdlib WAV decode + audio features (operators/wav.py)."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from skope_api_spark.operators.wav import (
    decode_audio_features,
    decode_wav,
    wav_features,
)


def _sine_wav(freq=440.0, rate=8000, seconds=0.5, amp=0.6, channels=1,
              sampwidth=2):
    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            v = amp * math.sin(2 * math.pi * freq * i / rate)
            if sampwidth == 2:
                s = struct.pack("<h", int(v * 32767))
            elif sampwidth == 1:
                s = struct.pack("B", int(v * 127) + 128)
            else:
                s = struct.pack("<i", int(v * 2147483647))
            frames += s * channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_sine_16bit():
    data = _sine_wav()
    samples, rate, n_ch = decode_wav(data)
    assert rate == 8000 and n_ch == 1
    assert samples.shape == (4000, 1)
    assert np.abs(samples).max() == pytest.approx(0.6, abs=0.01)


def test_features_match_theory():
    # sine: RMS = amp/sqrt(2), ZCR = 2*freq crossings per second
    f = wav_features(_sine_wav(freq=440.0, amp=0.6))
    assert f["duration_s"] == pytest.approx(0.5)
    assert f["rms"] == pytest.approx(0.6 / math.sqrt(2), rel=0.01)
    assert f["peak"] == pytest.approx(0.6, abs=0.01)
    assert f["zcr_hz"] == pytest.approx(2 * 440.0, rel=0.02)


def test_stereo_and_8bit():
    st = wav_features(_sine_wav(channels=2))
    assert st["n_channels"] == 2 and st["n_frames"] == 4000
    lo = wav_features(_sine_wav(sampwidth=1))
    assert lo["rms"] == pytest.approx(0.6 / math.sqrt(2), rel=0.05)


def test_32bit_pcm():
    f = wav_features(_sine_wav(sampwidth=4))
    assert f["rms"] == pytest.approx(0.6 / math.sqrt(2), rel=0.01)


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    data = bytearray(_sine_wav())
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_wav(bytes(data[: len(data) // 2]))


def test_skips_unknown_chunks():
    data = _sine_wav()
    # splice a LIST chunk between fmt and data
    fmt_end = data.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    samples, rate, _ = decode_wav(spliced)
    assert samples.shape[0] == 4000 and rate == 8000


def test_spark_batch_features_with_quarantine(spark):
    good = _sine_wav()
    rows = [(1, bytearray(good)), (2, bytearray(b"broken bytes"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert out[1]["error"] is None
    assert out[1]["duration_s"] == pytest.approx(0.5)
    assert out[1]["zcr_hz"] == pytest.approx(880.0, rel=0.02)
    assert out[2]["error"] is not None and out[2]["duration_s"] is None


def test_spectral_features_pure_sine():
    from skope_api_spark.operators.wav import wav_spectral_features

    f = wav_spectral_features(_sine_wav(freq=440.0, rate=8000, seconds=1.0))
    # resolution is rate/n = 1 Hz at 1 s; Hann leakage stays within ~2 Hz
    assert abs(f["dominant_hz"] - 440.0) <= 2.0
    assert abs(f["centroid_hz"] - 440.0) <= 5.0
    assert f["bandwidth_hz"] < 30.0  # energy concentrated at one tone
    assert abs(f["rolloff_hz"] - 440.0) <= 5.0


def test_spectral_features_two_tone_centroid_between():
    import numpy as np

    from skope_api_spark.operators.wav import wav_spectral_features

    # mix 300 Hz and 900 Hz at equal amplitude by summing payloads
    rate, seconds = 8000, 1.0
    n = int(rate * seconds)
    t = np.arange(n) / rate
    mix = 0.3 * np.sin(2 * np.pi * 300 * t) + 0.3 * np.sin(2 * np.pi * 900 * t)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((mix * 32767).astype("<i2").tobytes())
    f = wav_spectral_features(buf.getvalue())
    assert 550 <= f["centroid_hz"] <= 650  # midpoint of equal tones
    assert min(abs(f["dominant_hz"] - 300.0), abs(f["dominant_hz"] - 900.0)) <= 2.0
    assert 250 <= f["bandwidth_hz"] <= 350  # two tones 300 Hz either side


def test_spectral_quarantine_path(spark):
    from skope_api_spark.operators.wav import decode_spectral_features

    good = _sine_wav(freq=200.0, rate=4000, seconds=0.25)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a wav"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in decode_spectral_features(df).collect()}
    assert rows[1]["error"] is None
    assert abs(rows[1]["dominant_hz"] - 200.0) <= 5.0
    assert rows[2]["error"] is not None and rows[2]["dominant_hz"] is None


def test_sample_cap_fires_before_conversion():
    """r14 megablob: MAX_SAMPLES must reject from the BYTE LENGTH alone,
    before the float64 conversion — an after-the-fact check would let a
    2 GB data chunk transiently allocate 8 GB (8 bytes/sample), the
    exact amplification the cap exists to prevent. Verified here by
    tracing numpy.frombuffer: it must never be called."""
    from unittest import mock

    from skope_api_spark.operators import wav as wav_mod

    n = wav_mod.MAX_SAMPLES + 1_000_000
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    data = (
        b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2 * n) + b"\x00" * (2 * n)
    )
    with mock.patch.object(np, "frombuffer",
                           side_effect=AssertionError("allocated!")):
        with pytest.raises(ValueError, match="exceeds cap"):
            decode_wav(data)

def test_unsupported_encoding_keeps_specific_error_even_oversized():
    """r15 ADVICE: an unsupported encoding (e.g. float fmt=3 at 16-bit, or
    a compressed codec) must report 'unsupported WAV encoding' — not
    'exceeds cap' — even when the data chunk is over the sample cap, and
    must still reject without any numpy allocation."""
    from unittest import mock

    from skope_api_spark.operators import wav as wav_mod

    n = wav_mod.MAX_SAMPLES + 1_000_000
    for audio_fmt, bits, width in ((3, 16, 2), (2, 16, 2), (85, 16, 2)):
        fmt = struct.pack("<HHIIHH", audio_fmt, 1, 16000, 32000, width, bits)
        data = (
            b"RIFF" + struct.pack("<I", 36 + width * n) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", width * n) + b"\x00" * (width * n)
        )
        with mock.patch.object(np, "frombuffer",
                               side_effect=AssertionError("allocated!")):
            with pytest.raises(ValueError, match="unsupported WAV encoding"):
                decode_wav(data)


def test_supported_oversized_still_capped_allocation_free():
    """The reorder must not weaken the megablob guarantee: a SUPPORTED
    float32 (fmt=3) bomb over the cap still rejects from byte length
    alone."""
    from unittest import mock

    from skope_api_spark.operators import wav as wav_mod

    n = wav_mod.MAX_SAMPLES + 1_000_000
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    data = (
        b"RIFF" + struct.pack("<I", 36 + 4 * n) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4 * n) + b"\x00" * (4 * n)
    )
    with mock.patch.object(np, "frombuffer",
                           side_effect=AssertionError("allocated!")):
        with pytest.raises(ValueError, match="exceeds cap"):
            decode_wav(data)
