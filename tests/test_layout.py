"""Z-order layout: Morton code correctness + the partition-range property
the layout exists for (contiguous non-overlapping code ranges per
partition → Parquet min/max stats prune both dimensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from skope_api_spark.operators.layout import morton_code, zorder_layout


class TestMortonCode:
    def test_known_interleavings(self, spark):
        rows = [(1, 1, 1), (2, 2, 3), (3, 0, 0), (4, 7, 0)]
        df = spark.createDataFrame(rows, "i long, x long, y long")
        out = {
            r.i: r.m
            for r in df.select(
                "i", morton_code(F.col("x"), F.col("y"), bits=4).alias("m")
            ).collect()
        }
        # x bits land at even positions, y bits at odd
        assert out[1] == 0b11  # (1,1) -> 3
        assert out[2] == 0b1110  # x=10 -> pos2, y=11 -> pos1+pos3 = 14
        assert out[3] == 0
        assert out[4] == 0b010101  # x=111 -> 21

    def test_locality_beats_lexicographic(self, spark):
        """Neighbors in (x, y) must be nearer in z-order than points far
        in y — the property column-major or row-major order lacks."""
        df = spark.createDataFrame(
            [(0, 0), (1, 1), (0, 15)], "x long, y long"
        )
        m = {
            (r.x, r.y): r.m
            for r in df.select(
                "x", "y", morton_code(F.col("x"), F.col("y"), bits=4).alias("m")
            ).collect()
        }
        assert abs(m[(1, 1)] - m[(0, 0)]) < abs(m[(0, 15)] - m[(0, 0)])


class TestZorderLayout:
    def test_partitions_cover_disjoint_code_ranges(self, spark):
        df = spark.range(0, 1024).select(
            (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
        )
        out = zorder_layout(df, "x", "y", bits=5, n_partitions=4)
        ranges = (
            out.select("zorder", F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .agg(F.min("zorder").alias("lo"), F.max("zorder").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(ranges) > 1
        for prev, cur in zip(ranges, ranges[1:]):
            assert prev.hi <= cur.lo  # contiguous, non-overlapping

    def test_rows_sorted_within_partition(self, spark):
        df = spark.range(0, 256).select(
            (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
        )
        out = zorder_layout(df, "x", "y", bits=4, n_partitions=4)
        # monotonically_increasing_id is increasing in row order within a
        # partition — sort by it per partition and the codes must be sorted
        rows = out.select(
            "zorder",
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
        ).collect()
        by_pid: dict[int, list] = {}
        for r in rows:
            by_pid.setdefault(r.pid, []).append((r.mid, r.zorder))
        for seq in by_pid.values():
            zs = [z for _, z in sorted(seq)]
            assert zs == sorted(zs)


class TestMortonAgainstPythonMirror:
    def test_random_pairs_match_reference_interleave(self, spark):
        import random

        def py_morton(x, y, bits):
            m = 0
            for i in range(bits):
                m |= ((x >> i) & 1) << (2 * i)
                m |= ((y >> i) & 1) << (2 * i + 1)
            return m

        rng = random.Random(42)
        pairs = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
        df = spark.createDataFrame(pairs, "x long, y long")
        got = {
            (r.x, r.y): r.m
            for r in df.select(
                "x", "y", morton_code(F.col("x"), F.col("y"), bits=16).alias("m")
            ).collect()
        }
        for x, y in pairs:
            assert got[(x, y)] == py_morton(x, y, 16)
