"""Pure-stdlib WAV (RIFF/PCM) decoder + audio feature extraction.

Closes the audio leg of the multimodal surface the way png.py/jpeg.py/
gif.py closed images: the dominant UNCOMPRESSED interchange format is
decoded for real (RIFF chunk walk, PCM 8/16/32-bit and IEEE-float frames
→ numpy samples), so audio features (duration, RMS, peak, zero-crossing
rate) are computed from actual waveforms. Compressed codecs (MP3/AAC/
Opus) remain the documented injectable seam — they genuinely need codec
libraries this environment does not ship.

Parsing is defensive for corpus work: unknown chunks are skipped (WAV
files routinely carry LIST/fact/bext chunks), truncated data is rejected
with a clear error, and a sample-count cap bounds memory against
decompression-bomb-style inputs (same discipline as png.py MAX_PIXELS).

Spark integration (``decode_audio_features``) is an Arrow-batched
mapInPandas over an opaque binary column — decode stays per-row local,
nothing but the fixed-width feature row crosses the exchange.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

# 64M samples ~ 256 MiB of float32 — same bomb-cap discipline as png.py
MAX_SAMPLES = 64_000_000

_PCM_FMT = {8: "u1", 16: "<i2", 32: "<i4"}
_PCM_SCALE = {8: 128.0, 16: 32768.0, 32: 2147483648.0}


def decode_wav(data: bytes):
    """Decode a RIFF/WAVE blob to (samples, sample_rate, n_channels).

    ``samples`` is a float64 numpy array of shape (n_frames, n_channels)
    scaled to [-1, 1]. Supports PCM (format 1: 8-bit unsigned, 16/32-bit
    signed little-endian) and IEEE float32 (format 3). Raises ValueError
    on anything else — a real error path, not a stub.
    """
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack(
            "<I", data[pos + 4 : pos + 8]
        )[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated data chunk")
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_ch, rate, _, block_align, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError("invalid channel count or sample rate")
    # Support check FIRST so an unsupported encoding keeps its specific
    # error even when oversized (r15 ADVICE), THEN cap BEFORE any
    # conversion: the sample count is known from the byte length alone,
    # and converting first would allocate 8 bytes/sample of float64 — the
    # exact amplification MAX_SAMPLES exists to prevent (a 2 GB data
    # chunk would transiently take 8 GB before an after-the-fact check
    # fired; found by the r14 megablob campaign). Neither path allocates.
    if not (
        (audio_fmt == 1 and bits in _PCM_FMT)
        or (audio_fmt == 3 and bits == 32)
    ):
        raise ValueError(
            f"unsupported WAV encoding (format {audio_fmt}, {bits}-bit); "
            "compressed codecs need an injected decoder"
        )
    if len(raw) // (bits // 8) > MAX_SAMPLES:
        raise ValueError(
            f"sample count {len(raw) // (bits // 8)} exceeds cap "
            f"{MAX_SAMPLES}"
        )
    if audio_fmt == 1:
        arr = np.frombuffer(raw[: len(raw) - len(raw) % (bits // 8)],
                            dtype=_PCM_FMT[bits]).astype(np.float64)
        if bits == 8:
            arr = arr - 128.0
        arr = arr / _PCM_SCALE[bits]
    else:  # audio_fmt == 3, IEEE float32
        arr = np.frombuffer(
            raw[: len(raw) - len(raw) % 4], dtype="<f4"
        ).astype(np.float64)
    if arr.size > MAX_SAMPLES:
        raise ValueError(f"sample count {arr.size} exceeds cap {MAX_SAMPLES}")
    n_frames = arr.size // n_ch
    return arr[: n_frames * n_ch].reshape(n_frames, n_ch), rate, n_ch


def wav_features(data: bytes) -> dict:
    """Waveform features from a decoded WAV: duration, RMS, peak,
    zero-crossing rate (per second, averaged over channels)."""
    import numpy as np

    samples, rate, n_ch = decode_wav(data)
    n_frames = samples.shape[0]
    duration = n_frames / rate
    if n_frames == 0:
        return {
            "sample_rate": rate, "n_channels": n_ch, "n_frames": 0,
            "duration_s": 0.0, "rms": 0.0, "peak": 0.0, "zcr_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(samples**2)))
    peak = float(np.abs(samples).max())
    signs = np.signbit(samples)
    crossings = np.count_nonzero(signs[1:] != signs[:-1]) / n_ch
    zcr = float(crossings / duration) if duration > 0 else 0.0
    return {
        "sample_rate": rate, "n_channels": n_ch, "n_frames": int(n_frames),
        "duration_s": float(duration), "rms": rms, "peak": peak,
        "zcr_hz": zcr,
    }


def decode_audio_features(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched WAV feature extraction over an opaque binary column.

    Returns (id, sample_rate, n_channels, n_frames, duration_s, rms,
    peak, zcr_hz, error) — malformed blobs land in ``error`` with NULL
    features (quarantine pattern), never fail the job.
    """
    import pandas as pd

    schema = (
        f"{id_col} long, sample_rate int, n_channels int, n_frames long, "
        "duration_s double, rms double, peak double, zcr_hz double, "
        "error string"
    )

    feature_keys = (
        "sample_rate", "n_channels", "n_frames", "duration_s", "rms",
        "peak", "zcr_hz",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    f = wav_features(bytes(blob))
                    rows.append({id_col: mid, **f, "error": None})
                except (ValueError, struct.error) as ex:
                    quarantined = {k: None for k in feature_keys}
                    quarantined[id_col] = mid
                    quarantined["error"] = str(ex)[:200]
                    rows.append(quarantined)
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(batches, schema=schema)


def wav_spectral_features(data: bytes) -> dict:
    """Frequency-domain features from the decoded waveform via numpy's
    real FFT (Hann-windowed, channel-mixed to mono): dominant frequency,
    spectral centroid, bandwidth (magnitude-weighted std around the
    centroid), and the 85% spectral rolloff. All are standard public DSP
    definitions; resolution is rate/n_frames Hz (the full-signal FFT —
    input size is already bounded by the decoder's MAX_SAMPLES cap)."""
    import numpy as np

    samples, rate, n_ch = decode_wav(data)
    n = samples.shape[0]
    base = {"sample_rate": rate, "n_channels": n_ch, "n_frames": int(n)}
    if n < 2:
        return {
            **base, "dominant_hz": 0.0, "centroid_hz": 0.0,
            "bandwidth_hz": 0.0, "rolloff_hz": 0.0,
        }
    mono = samples.mean(axis=1)
    win = np.hanning(n)
    mag = np.abs(np.fft.rfft(mono * win))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    # exclude DC from the dominant bin (windowed means can leak into it)
    dom = float(freqs[1 + int(np.argmax(mag[1:]))]) if len(mag) > 1 else 0.0
    total = float(mag.sum())
    if total <= 0.0:
        return {
            **base, "dominant_hz": 0.0, "centroid_hz": 0.0,
            "bandwidth_hz": 0.0, "rolloff_hz": 0.0,
        }
    centroid = float((freqs * mag).sum() / total)
    bandwidth = float(
        np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total)
    )
    rolloff = float(freqs[int(np.searchsorted(np.cumsum(mag), 0.85 * total))])
    return {
        **base, "dominant_hz": dom, "centroid_hz": centroid,
        "bandwidth_hz": bandwidth, "rolloff_hz": rolloff,
    }


def decode_spectral_features(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched spectral feature extraction — same quarantine
    contract as ``decode_audio_features``: malformed blobs yield an
    ``error`` row with NULL features instead of failing the job; only
    the fixed-width feature row crosses the exchange."""
    import pandas as pd

    schema = (
        f"{id_col} long, sample_rate int, n_channels int, n_frames long, "
        "dominant_hz double, centroid_hz double, bandwidth_hz double, "
        "rolloff_hz double, error string"
    )
    feature_keys = (
        "sample_rate", "n_channels", "n_frames", "dominant_hz",
        "centroid_hz", "bandwidth_hz", "rolloff_hz",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    f = wav_spectral_features(bytes(blob))
                    rows.append({id_col: mid, **f, "error": None})
                except (ValueError, struct.error) as ex:
                    quarantined = {k: None for k in feature_keys}
                    quarantined[id_col] = mid
                    quarantined["error"] = str(ex)[:200]
                    rows.append(quarantined)
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(batches, schema=schema)
