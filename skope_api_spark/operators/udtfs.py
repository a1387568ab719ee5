"""Python UDTF surface (SURVEY §2.9) — the table-function extensibility seam.

The reference's UDF surface is numpy/numba kernels called per request
(`timeseries/app/routers/timeseries.py:34-42`); our engine replaces every
hot-path kernel with native window/array expressions. This module covers
the remaining seam: logic that genuinely needs Python AND fans one row out
to many (a real tokenizer library, a parser, a model-server call) maps to
a Python UDTF (Spark 3.5+): per-row ``eval`` yields output rows, usable
from the DataFrame API or as ``LATERAL udtf(...)`` in SQL.

Honesty about the hot path: ``ChunkTextUDTF`` reimplements
``operators.text.chunk_documents`` deliberately — the native
sequence/slice/posexplode version IS the production path (whole-stage
codegen, scan throughput); the UDTF exists to prove the seam end-to-end
(``tests/test_udtf.py`` asserts row-identical output), so a deployment
can swap a real BPE tokenizer into ``eval`` with zero plumbing changes.
Python UDTFs execute row-at-a-time in a Python worker — budget them like
any Python boundary (mapInPandas notes in ``operators/multimodal.py``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

CHUNK_SCHEMA = (
    "chunk_id: int, n_chunks: int, chunk_text: string, n_chunk_tokens: int"
)


@udtf(returnType=CHUNK_SCHEMA)
class ChunkTextUDTF:
    """Overlapping token-window chunker, UDTF form.

    Same semantics as ``operators.text.chunk_documents`` (windows start
    every ``chunk_tokens - overlap`` tokens; final chunk may be short):
    the parity test pins the two implementations together.
    """

    def eval(self, text: str, chunk_tokens: int, overlap: int):
        if text is None:
            return
        if not 0 <= overlap < chunk_tokens:
            raise ValueError(
                f"need 0 <= overlap={overlap} < chunk_tokens={chunk_tokens}"
            )
        toks = text.split(" ")
        stride = chunk_tokens - overlap
        n_chunks = max(1, -(-(len(toks) - overlap) // stride))
        for i in range(n_chunks):
            window = toks[i * stride : i * stride + chunk_tokens]
            yield i, n_chunks, " ".join(window), len(window)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface for SQL use:
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_text(d.text, 32, 8) c``.
    """
    spark.udtf.register("chunk_text", ChunkTextUDTF)
