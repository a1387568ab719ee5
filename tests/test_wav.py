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
