"""Python UDTF surface: parity with the native chunker, SQL LATERAL use,
and error propagation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skope_api_spark.operators.text import chunk_documents
from skope_api_spark.operators.udtfs import ChunkTextUDTF, register_udtfs
from skope_api_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


class TestChunkUDTFParity:
    def test_rows_identical_to_native_chunker(self, spark):
        """The UDTF seam must produce exactly what the JVM-native hot path
        produces — swap-in safety for a real tokenizer."""
        docs = load(spark, SF_DIR, "documents")
        native = sorted(
            (r.doc_id, r.chunk_id, r.n_chunks, r.chunk_text, r.n_chunk_tokens)
            for r in chunk_documents(
                docs, chunk_tokens=32, overlap=8
            ).collect()
        )
        register_udtfs(spark)
        docs.createOrReplaceTempView("udtf_docs")
        via_udtf = sorted(
            (r.doc_id, r.chunk_id, r.n_chunks, r.chunk_text, r.n_chunk_tokens)
            for r in spark.sql(
                "SELECT d.doc_id, c.* "
                "FROM udtf_docs d, LATERAL chunk_text(d.text, 32, 8) c"
            ).collect()
        )
        assert via_udtf == native and len(native) > 0

    def test_dataframe_api_call(self, spark):
        out = ChunkTextUDTF(
            F.lit("a b c d e"), F.lit(2), F.lit(0)
        ).collect()
        assert [(r.chunk_id, r.chunk_text) for r in out] == [
            (0, "a b"),
            (1, "c d"),
            (2, "e"),
        ]

    def test_null_text_yields_no_rows(self, spark):
        out = ChunkTextUDTF(
            F.lit(None).cast("string"), F.lit(4), F.lit(1)
        ).collect()
        assert out == []

    def test_bad_params_raise(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        with pytest.raises((PythonException, Py4JJavaError)):
            ChunkTextUDTF(F.lit("a b"), F.lit(2), F.lit(2)).collect()
