"""Multimodal (image/audio/video) column operators.

Design (per the large-scale training-data pipeline pattern): media are
opaque ``binary`` columns with a typed metadata struct alongside; decode /
feature-extraction / frame-sampling run as Arrow-batched ``mapInPandas``
stages so bytes never round-trip through per-row Python.

The decode kernels themselves are STUBBED here — this environment has no
image/audio libraries — behind ``_HAVE_PIL``-style gates: with the real
library absent, ``decode_image_metadata`` parses only what pure Python can
(PNG/JPEG/GIF headers — real parsing, no library), and ``extract_features``
produces a deterministic hash-derived pseudo-embedding with the exact
shape/type a real encoder would emit. The Spark-side plumbing — schemas,
batch iteration, partition sizing — is real and tested; swapping in a real
decoder changes only the kernel body.

Scale notes: binary payloads dominate partition size, so callers should
size input splits by bytes (``spark.sql.files.maxPartitionBytes``) and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (default 10k rows of
multi-MB blobs would OOM an Arrow batch; set ~64-256 for media tables).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("byte_offset", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def _sniff_image(data: bytes) -> tuple[str | None, int | None, int | None]:
    """Header-only dimension sniffing for PNG / GIF / JPEG (pure Python).

    This part is real: PNG IHDR and GIF logical-screen headers carry
    dimensions at fixed offsets; JPEG requires walking segment markers to
    the first SOFn. Anything else → (None, None, None).
    """
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def decode_image_metadata(df: DataFrame) -> DataFrame:
    """Decode stage: binary → typed metadata via Arrow-batched mapInPandas.

    With PIL absent (this environment), dimensions come from the pure-Python
    header sniffer; a real deployment swaps ``_sniff_image`` for
    ``PIL.Image.open`` inside the same batch loop.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts, ws, hs, sizes = [], [], [], []
            for blob in pdf["content"]:
                b = bytes(blob)
                fmt, w, h = _sniff_image(b)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_bytes": sizes,
                }
            )

    return df.mapInPandas(batches, IMAGE_META_SCHEMA)


def extract_features(df: DataFrame, *, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage: binary → array<float> pseudo-embedding.

    STUB KERNEL: the vector is derived from sha256(content) — deterministic,
    unit-scaled, correct shape/dtype — standing in for a real image/audio
    encoder. The mapInPandas plumbing (Arrow batches in, list-typed column
    out) is exactly what a real encoder uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for blob in pdf["content"]:
                digest = hashlib.sha256(bytes(blob)).digest()
                vec = [
                    (digest[i % 32] - 127.5) / 127.5 for i in range(dim)
                ]
                feats.append(vec)
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, *, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage for video-ish blobs: emit ≤ ``max_frames`` chunks
    at fixed byte strides (1 row in → N rows out, the fan-out shape real
    frame extraction has). STUB: strides stand in for keyframe offsets."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, frames = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                for k in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    off = k * every_n_bytes
                    ids.append(mid)
                    idxs.append(k)
                    offs.append(off)
                    frames.append(b[off : off + 64])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "byte_offset": offs,
                    "frame_bytes": frames,
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def binary_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """JVM-native binary column metrics (no Python): length + digest.

    The cheap path for dedup/audit over media tables — exact-duplicate
    detection on blobs is a group-by on ``sha2(content, 256)``.
    """
    return df.select(
        "media_id",
        F.length(F.col(content_col)).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(content_col), 256).alias("content_sha256"),
        F.crc32(F.col(content_col)).alias("content_crc32"),
    )
