"""Perceptual-hash tests: invariance properties on real encoded PNGs
(repo codec), plus the banded near-dup join on Spark."""

from __future__ import annotations

import numpy as np
import pytest

from skope_api_spark.operators.phash import (
    _box_resize,
    image_phash,
    phash64,
    phash_near_duplicates,
)
from skope_api_spark.operators.png import png_encode


def _textured_png(w=64, h=48, *, bright=1.0, noise_seed=None, seed=5):
    """Deterministic low-frequency textured scene: a seeded 12×16 field
    upsampled to (h, w). pHash needs texture — on a perfectly smooth
    gradient every AC coefficient is ~0 and the median thresholds ties,
    which is the documented flat-image caveat, not a bug."""
    if noise_seed is not None:
        rng = np.random.default_rng(noise_seed)
        g = rng.uniform(0, 255, size=(h, w))
    else:
        rng = np.random.default_rng(seed)
        field = rng.uniform(40, 215, (12, 16))
        g = field[np.arange(h) * 12 // h][:, np.arange(w) * 16 // w]
    g = g * bright
    rgb = np.stack([g, g * 0.9, g * 0.7], axis=2).clip(0, 255)
    return png_encode(w, h, rgb.astype(np.uint8).tobytes(), channels=3)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_deterministic_and_brightness_invariant():
    base = phash64(_textured_png())
    assert base == phash64(_textured_png())
    # global brightness scaling barely moves a median-threshold hash
    dim = phash64(_textured_png(bright=0.8))
    assert _ham(base, dim) <= 6


def test_phash_separates_unrelated_images():
    a = phash64(_textured_png(noise_seed=1))
    b = phash64(_textured_png(noise_seed=2))
    g = phash64(_textured_png())
    assert _ham(a, b) >= 16  # random-vs-random: ~32 expected
    assert _ham(a, g) >= 16


def test_phash_resize_invariant():
    # same scene at two sizes: box-mean grid makes hashes near-identical
    small = phash64(_textured_png(w=32, h=24))
    large = phash64(_textured_png(w=128, h=96))
    assert _ham(small, large) <= 6


def test_box_resize_paths():
    img = np.arange(12.0).reshape(3, 4)
    up = _box_resize(img, 8)
    assert up.shape == (8, 8)
    down = _box_resize(np.ones((100, 70)), 32)
    assert down.shape == (32, 32)
    assert np.allclose(down, 1.0)
    with pytest.raises(ValueError, match="empty"):
        _box_resize(np.ones((0, 5)), 8)


def test_image_phash_and_near_duplicates(spark):
    blobs = [
        (1, _textured_png()),
        (2, _textured_png(bright=0.85)),  # near-dup of 1
        (3, _textured_png(noise_seed=7)),  # unrelated
        (4, b"not an image"),  # quarantined
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs], "media_id long, content binary"
    )
    hashes = image_phash(df)
    rows = {r["media_id"]: r for r in hashes.collect()}
    assert rows[1]["error"] is None and rows[1]["width"] == 64
    assert rows[4]["error"] is not None and rows[4]["phash"] is None

    pairs = phash_near_duplicates(hashes, max_hamming=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    assert all(3 not in p for p in found)
