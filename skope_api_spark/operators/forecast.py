"""Per-key time-series forecasting: Holt's linear (double-exponential)
smoothing as a pure in-engine sequential fold.

Exponential smoothing is an inherently sequential recurrence —
s_t = f(s_{t-1}, x_t) — which a window expression cannot express. The
standard escape hatch is a Python loop per key (applyInPandas); this
implementation stays JVM-side instead:

- the per-key series is assembled once with
  ``array_sort(collect_list(struct(order, value)))`` (one shuffle, the
  groupBy the operator needs anyway);
- the recurrence runs as an ``F.aggregate`` fold over that array with an
  ``[level, trend]`` accumulator — whole-stage-codegen arithmetic, no
  Python, no UDF;
- state per key is the series array, bounded by series length: right for
  the daily/hourly rollup series this targets (hundreds-to-thousands of
  points); for million-point raw series, pre-aggregate first (you should
  anyway) or fall back to an applyInPandas seam.

Cross-engine determinism: the fold is a fixed IEEE evaluation order, so
given bit-identical inputs (use exact decimal sums for the series values)
the smoothed level/trend are bit-identical to DuckDB's ``list_reduce``
replay of the same lambda — the contract query needs no tolerance.

Recurrence (Holt 1957, public):
  level_t = α·x_t + (1-α)·(level_{t-1} + trend_{t-1})
  trend_t = β·(level_t − level_{t-1}) + (1-β)·trend_{t-1}
  init: level_1 = x_1, trend_1 = 0
  forecast: x̂_{T+h} = level_T + h·trend_T
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Holt's linear smoothing per key; returns key cols +
    (n_points, level, trend, forecast_1 .. forecast_h).

    ``order_col`` should be unique per key (pre-aggregate to it first).
    Duplicate order values still sort deterministically — by (order,
    value) — but the recurrence then treats them as consecutive points,
    which is almost never what you want.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("need 0 < alpha <= 1 and 0 <= beta <= 1")
    if horizon < 0:
        raise ValueError("horizon must be >= 0")
    a, b = F.lit(float(alpha)), F.lit(float(beta))
    # NULL observations are dropped BEFORE the fold: a NULL inside the
    # recurrence would poison level/trend for the rest of the series
    clean = df.where(F.col(value_col).isNotNull())
    series = clean.groupBy(*key_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ),
            lambda s: s["v"],
        ).alias("__vals")
    )

    def step(acc, x):
        lvl, tr = F.element_at(acc, 1), F.element_at(acc, 2)
        new_level = a * x + (F.lit(1.0) - a) * (lvl + tr)
        # new_level is inlined twice; IEEE arithmetic is deterministic, so
        # this matches a stored intermediate bit-for-bit (and matches the
        # DuckDB list_reduce replay, which has no let-binding either)
        new_trend = b * (new_level - lvl) + (F.lit(1.0) - b) * tr
        return F.array(new_level, new_trend)

    init = F.array(F.element_at("__vals", 1), F.lit(0.0))
    rest = F.slice("__vals", 2, F.greatest(F.size("__vals") - 1, F.lit(0)))
    acc = F.aggregate(rest, init, step)
    out = series.select(
        *key_cols,
        F.size("__vals").alias("n_points"),
        F.element_at(acc, 1).alias("level"),
        F.element_at(acc, 2).alias("trend"),
    )
    for h in range(1, horizon + 1):
        out = out.withColumn(
            f"forecast_{h}", F.col("level") + F.lit(float(h)) * F.col("trend")
        )
    return out


def lttb_downsample(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    n_out: int,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    public) per key — the visually-faithful reduction a dashboard runs
    before plotting a million-point series.

    Sequential per series (each bucket's pick depends on the previous
    pick), so it runs as Arrow-batched ``applyInPandas`` per key — the
    legitimate per-key-Python seam, same contract as the stateful
    streaming kernels: one series must fit a worker, which a plotting
    reduction target guarantees in practice (pre-aggregate first
    otherwise). Always keeps the first and last points; deterministic
    (ties resolve to the earliest candidate via strict > comparison).

    Returns key cols + (order_col, value_col) for the selected points.
    """
    import numpy as np

    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    out_schema = df.select(*keys, order_col, value_col).schema

    def pick(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[[*keys, order_col, value_col]]
        x = pdf[order_col].astype("int64" if pdf[order_col].dtype.kind in "iu" else "float64").to_numpy(dtype=np.float64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        idx = [0]
        # n_out-2 interior buckets over points 1..n-2
        bounds = np.linspace(1, n - 1, n_out - 1).astype(int)
        a = 0
        for b in range(n_out - 2):
            lo, hi = bounds[b], bounds[b + 1]
            nxt_lo, nxt_hi = hi, (bounds[b + 2] if b + 2 < len(bounds) else n)
            avg_x = x[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else x[-1]
            avg_y = y[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else y[-1]
            seg_x, seg_y = x[lo:hi], y[lo:hi]
            area = np.abs(
                (x[a] - avg_x) * (seg_y - y[a]) - (x[a] - seg_x) * (avg_y - y[a])
            )
            a = lo + int(np.argmax(area))
            idx.append(a)
        idx.append(n - 1)
        return pdf.iloc[idx][[*keys, order_col, value_col]]

    return (
        df.select(*keys, order_col, value_col)
        .groupBy(*keys)
        .applyInPandas(pick, schema=out_schema)
    )
