"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-events source with real partition planning.

Why this exists: the reference's sources are all file-backed; a complete
Spark-4 engine also exposes the NEW Python data-source surface, which is
how users plug in REST feeds, queue snapshots, or synthetic load without
JVM code. This implementation demonstrates the full contract:

- ``schema()`` — fixed typed schema;
- ``partitions()`` — the source splits its keyspace into N ranges, so
  Spark schedules N parallel reader tasks (this is the piece naive
  examples skip: a single-partition reader serializes the whole read);
- ``read(partition)`` — per-partition deterministic generation from the
  shared ``md5``-free arithmetic hash (splittable, seed + row index), so
  the SAME rows come back for a given (seed, n_rows) regardless of
  partition count — re-partitioning the source cannot change the data;
- registration via ``spark.dataSource.register`` and use through
  ``spark.read.format("skope_synth_events")``.

The generator is integer arithmetic only (LCG-style mixing), so rows are
reproducible across Python versions and machines.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_MASK = (1 << 63) - 1


def _mix(x: int) -> int:
    # splitmix64-style integer mixing (public domain algorithm), masked
    # to 63 bits so values stay positive in a Spark LongType
    x = (x + 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return (z ^ (z >> 31)) & _MASK


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.seed = int(options.get("seed", 7))
        self.n_parts = max(1, int(options.get("partitions", 4)))
        if self.n_rows < 0:
            raise ValueError("n_rows must be >= 0")

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, step)
        ] or [_RangePartition(0, 0, self.seed)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            h = _mix(partition.seed * 1_000_003 + i)
            yield (
                i,
                h % 500,  # user_id
                _EVENT_TYPES[h % len(_EVENT_TYPES)],
                ((h >> 16) % 100_000) / 100.0,  # value, 2dp
            )


class SynthEventsDataSource(DataSource):
    """``spark.read.format("skope_synth_events")`` options:
    n_rows, seed, partitions."""

    @classmethod
    def name(cls):
        return "skope_synth_events"

    def schema(self):
        return (
            "event_id long, user_id long, event_type string, value double"
        )

    def reader(self, schema):
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthEventsDataSource)


# --- streaming reader (Spark 4 SimpleDataSourceStreamReader) -----------------
#
# The same deterministic generator exposed as a STREAM: offsets are row
# indices, each microbatch covers [offset, offset + batch_rows), and
# ``readBetweenOffsets`` regenerates any committed range bit-identically —
# which is exactly the replayability contract Structured Streaming needs
# from a source for end-to-end exactly-once (the sink side is proven in
# tests/test_streaming.py's idempotent foreachBatch). A bounded
# ``n_rows`` makes the stream quiesce (empty batches) so tests can drain
# it with processAllAvailable; production sources leave it unbounded.

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 7))
        self.batch_rows = max(1, int(options.get("batch_rows", 100)))
        n = options.get("n_rows")
        self.n_rows = int(n) if n is not None else None

    def initialOffset(self):
        return {"index": 0}

    def _gen(self, lo: int, hi: int):
        for i in range(lo, hi):
            h = _mix(self.seed * 1_000_003 + i)
            yield (
                i,
                h % 500,
                _EVENT_TYPES[h % len(_EVENT_TYPES)],
                ((h >> 16) % 100_000) / 100.0,
            )

    def read(self, start):
        lo = start["index"]
        hi = lo + self.batch_rows
        if self.n_rows is not None:
            hi = min(hi, self.n_rows)
        return iter(list(self._gen(lo, hi))), {"index": max(hi, lo)}

    def readBetweenOffsets(self, start, end):
        # deterministic replay of any committed range — same generator,
        # same rows, regardless of when or where the retry runs
        return iter(list(self._gen(start["index"], end["index"])))
