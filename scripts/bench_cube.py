#!/usr/bin/env python
"""Production-cube benchmark: the reference's largest real dataset shape.

lbda_v2 (reference ``deploy/metadata/prod.yml``): 2017 annual bands over a
CONUS grid ≈ 115×50 at 0.5° → 11.6M cells. This script materializes an
analytic cube of that shape as partitioned Parquet (the S1 ingestion
layout), then times the SKOPE workload against it:

- point extraction over the full 2017-band span,
- polygon zonal mean/median over a 600-cell selection,
- smoother + rolling z-score over the extracted series,
- 100 point requests batched into one job.

Prints one JSON line per phase. Run ad hoc (not part of the driver bench):
    python scripts/bench_cube.py [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SPARK_GRAFT_CUBE_SCALE multiplies the CELL count (grid scales by
# sqrt(scale) per axis; bands stay 2017 — the reference's fixed time
# depth). scale=10 -> ~116M cells, the r15 staircase step for the
# skope-facing spine (VERDICT r14 item 8).
_SCALE = float(os.environ.get("SPARK_GRAFT_CUBE_SCALE", "1"))
BANDS = 2017
ROWS = round(50 * _SCALE**0.5)
COLS = round(115 * _SCALE**0.5)


def main() -> int:
    from pyspark.sql import functions as F

    from skope_api_spark.operators.batch import batched_zonal_series
    from skope_api_spark.operators.windows import (
        rolling_zscore,
        trailing_moving_average,
    )
    from skope_api_spark.operators.zonal import zonal_series
    from skope_api_spark.session import get_spark

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="cubebench_")
    spark = get_spark("bench_cube", extra_conf={"spark.sql.ui.showConsoleProgress": "false"})

    def emit(phase: str, sec: float, **kw) -> None:
        print(json.dumps({"phase": phase, "sec": round(sec, 3), **kw}), flush=True)

    # -- ingest: analytic prod-shape cube → partitioned parquet --------------
    t0 = time.perf_counter()
    cube = (
        spark.range(1, BANDS + 1).select(F.col("id").cast("int").alias("band"))
        .crossJoin(spark.range(0, ROWS).select(F.col("id").cast("int").alias("row")))
        .crossJoin(spark.range(0, COLS).select(F.col("id").cast("int").alias("col")))
        .select(
            "band", "row", "col",
            (F.col("band") * 0.1 + F.col("row") * 10 + F.col("col") * 1.1).alias("value"),
        )
    )
    path = f"{workdir}/lbda_like"
    (
        cube.repartition(32, "band")
        .sortWithinPartitions("band", "row", "col")
        .write.mode("overwrite").parquet(path)
    )
    n = spark.read.parquet(path).count()
    emit("ingest", time.perf_counter() - t0, rows=n)

    disk = spark.read.parquet(path)

    # -- point extraction over the full span ---------------------------------
    t0 = time.perf_counter()
    pt = disk.where((F.col("row") == 25) & (F.col("col") == 60))
    series = zonal_series(pt, "mean", keys=("band",)).select("band", "value")
    n = series.count()
    emit("point_series_2017_bands", time.perf_counter() - t0, rows=n)

    # -- polygon zonal mean + median over ~600 cells -------------------------
    for stat in ("mean", "median"):
        t0 = time.perf_counter()
        poly = disk.where(
            F.col("row").between(10, 29) & F.col("col").between(20, 49)
        )
        out = zonal_series(poly, stat, keys=("band",))
        n = out.count()
        emit(f"polygon_600cell_{stat}", time.perf_counter() - t0, rows=n)

    # -- windows over the extracted series ------------------------------------
    t0 = time.perf_counter()
    sm = trailing_moving_average(series, "value", order_by=("band",), width=21)
    z = rolling_zscore(sm, "value", order_by=("band",), width=50)
    n = z.where(F.col("zscore").isNotNull()).count()
    emit("smoother_plus_zscore", time.perf_counter() - t0, rows=n)

    # -- 100 point requests in ONE batched job --------------------------------
    t0 = time.perf_counter()
    masks = {f"q{i}": [(i % ROWS, (i * 7) % COLS)] for i in range(100)}
    batched = batched_zonal_series(disk, masks, "mean", series_keys=("band",))
    n = batched.count()
    emit("batched_100_points", time.perf_counter() - t0, rows=n)

    if len(sys.argv) <= 1:
        shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
