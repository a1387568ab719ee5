"""Perceptual image hashing (pHash) + banded image near-dup.

Closes the image leg of near-duplicate detection the way SimHash closes
text: a 64-bit DCT perceptual hash per image (the public pHash recipe —
grayscale → 32×32 box-mean → 2D DCT-II → low-frequency 8×8 block →
median threshold), robust to re-encoding, mild brightness shifts and
resizing, then the SAME pigeonhole band join as
``dedup.simhash_near_duplicates`` for candidate pairs with Hamming ≤ k.

Decoding uses the repo's own pure-stdlib codecs (png.py / jpeg.py /
gif.py), so the hash is computed from REAL pixels for the three formats
this sandbox can decode; other formats quarantine with an error, never
fail the job. The DCT runs in numpy inside an Arrow-batched mapInPandas
— per-image local, only (id, 64-bit hash) crosses the exchange, so the
downstream near-dup join is a skinny ~16 B/row shuffle regardless of
image sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_BITS = 64
_GRID = 32  # DCT input size; top-left 8x8 of the spectrum feeds the hash


def _decode_any(data: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic bytes to the repo's pure-stdlib decoders."""
    from skope_api_spark.operators.bmp import bmp_decode
    from skope_api_spark.operators.gif import gif_decode
    from skope_api_spark.operators.jpeg import jpeg_decode
    from skope_api_spark.operators.png import png_decode

    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode(data)
    if data[:2] == b"\xff\xd8":
        return jpeg_decode(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return gif_decode(data)
    if data[:2] == b"BM":
        return bmp_decode(data)
    raise ValueError("unsupported image format for phash")


def _gray_matrix(w: int, h: int, channels: int, raw: bytes):
    """Rec.601 luma as a float64 (h, w) matrix."""
    import numpy as np

    px = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    if channels == 1:
        return px.reshape(h, w)
    px = px.reshape(h, w, channels)
    # ignore alpha if present; 601 luma over RGB
    return (
        0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    )


def _box_resize(img, size: int = _GRID):
    """Resample to size×size, per axis: box-mean (area average) when
    shrinking — each output band averages rows [i·n//s, (i+1)·n//s), an
    exact partition with strictly increasing edges since n > s — and
    nearest-neighbor duplication when the image is smaller than the
    grid. No interpolation kernel needed for a hash."""
    import numpy as np

    if img.shape[0] == 0 or img.shape[1] == 0:
        raise ValueError("empty image")
    out = img
    for axis in (0, 1):
        n = out.shape[axis]
        if n == size:
            continue
        if n > size:
            edges = np.arange(size + 1) * n // size
            sums = np.add.reduceat(out, edges[:-1], axis=axis)
            counts = np.diff(edges).astype(np.float64)
            shape = [1, 1]
            shape[axis] = size
            out = sums / counts.reshape(shape)
        else:
            idx = np.arange(size) * n // size
            out = np.take(out, idx, axis=axis)
    return out


def _dct2(m):
    """Orthonormal 2D DCT-II via the explicit cosine basis matrix —
    m is small (32×32), so two 32×32 matmuls beat any FFT plumbing."""
    import numpy as np

    n = m.shape[0]
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis *= np.sqrt(2.0 / n)
    basis[0, :] = np.sqrt(1.0 / n)
    return basis @ m @ basis.T


def phash64(data: bytes) -> int:
    """64-bit DCT perceptual hash of one image (public pHash recipe).

    Bit i is set iff the i-th coefficient of the low-frequency 8×8 DCT
    block exceeds the block's median — comparing against the median
    (not the mean) makes exactly half the bits 1, maximizing entropy and
    making the hash invariant to global brightness/contrast scaling.
    """
    w, h, channels, raw = _decode_any(data)
    gray = _gray_matrix(w, h, channels, raw)
    small = _box_resize(gray, _GRID)
    spec = _dct2(small)[:8, :8].flatten()
    med = float(sorted(spec)[len(spec) // 2])
    bits = 0
    for i, c in enumerate(spec):
        if c > med:
            bits |= 1 << i
    # clear the sign bit's slot into int64 range: bit 63 may be set, so
    # reinterpret as signed 64-bit (Spark LongType)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def image_phash(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched pHash over an opaque binary column with the standard
    quarantine contract: (id, phash, width, height, error)."""
    import pandas as pd

    schema = f"{id_col} long, phash long, width int, height int, error string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    b = bytes(blob)
                    w, h, _, _ = _decode_any(b)
                    rows.append(
                        {
                            id_col: mid,
                            "phash": phash64(b),
                            "width": w,
                            "height": h,
                            "error": None,
                        }
                    )
                except (ValueError, KeyError, IndexError) as ex:
                    rows.append(
                        {
                            id_col: mid,
                            "phash": None,
                            "width": None,
                            "height": None,
                            "error": str(ex)[:200],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(batches, schema=schema)


def phash_near_duplicates(
    hashes: DataFrame,
    *,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 6,
) -> DataFrame:
    """Image near-dup pairs with pHash Hamming ≤ ``max_hamming`` — the
    SAME pigeonhole band layout as ``dedup.simhash_near_duplicates``:
    ``max_hamming + 1`` blocks, any qualifying pair agrees exactly on ≥1
    block (guaranteed recall), candidates come from a per-block
    equi-join (skinny shuffle, never all-pairs), exact Hamming verify
    via bit_count(xor) on the candidates only."""
    n_blocks = max_hamming + 1
    block_bits = PHASH_BITS // n_blocks
    sig = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("sig")
    )
    blocks = [
        F.struct(
            F.lit(i).alias("block"),
            F.shiftrightunsigned(F.col("sig"), i * block_bits)
            .bitwiseAND(F.lit((1 << block_bits) - 1))
            .alias("block_val"),
        )
        for i in range(n_blocks)
    ]
    banded = sig.select(
        "doc_id", "sig", F.explode(F.array(*blocks)).alias("bb")
    ).select(
        "doc_id",
        "sig",
        F.col("bb.block").alias("block"),
        F.col("bb.block_val").alias("block_val"),
    )
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
