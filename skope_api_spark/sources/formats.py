"""Source/sink format support beyond Parquet.

The lake's canonical format is Parquet (columnar, stats, pruning), but an
engine replacing the reference must also ingest/export the interchange
formats a pipeline meets at its edges: CSV (headers + explicit schema —
never inference in production paths), JSON lines, and ORC. All writers
take a ``coalesce`` hint so exports don't scatter tiny files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, *, n_files: int | None = None) -> None:
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    # explicit schema: CSV inference costs an extra full scan and guesses
    return spark.read.option("header", "true").schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str, *, n_files: int | None = None) -> None:
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, *, n_files: int | None = None) -> None:
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
