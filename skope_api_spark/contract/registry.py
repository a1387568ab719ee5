"""Registration plumbing for the driver contract.

Usage in a theme module::

    @query("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir) -> DataFrame: ...

Rules enforced by convention (see tests/test_contract.py):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- order-dependent float aggregates (sum/avg/stddev over doubles) are rounded
  in BOTH plans (same decimals) so cross-engine accumulation-order noise
  cannot flip the value hash;
- counts are cast to BIGINT on the DuckDB side (DuckDB widens integer sums
  to HUGEINT, which Spark has no analogue for);
- NEVER round a revenue-style sum to cents: price (2dp) x rate-complement
  (2dp) products are exactly 4 decimal places, so rounded-to-2 sums hit
  half-cent ties where the engines' tie rules differ (Spark HALF_UPs the
  shortest decimal repr of the double; DuckDB rounds the binary value).
  Preferred exact form (round 8): ``money_ticks`` below — per-row
  ``CAST(ROUND(expr·10000) AS BIGINT)``, exact long sums, ONE division
  at output; order/compare on the integer sum (see
  top_parts_by_revenue, q8-q11, q15). Same exact rational and output
  doubles as the older per-row CAST to DECIMAL(18,4) accumulation, at
  long-add speed instead of decimal128 codegen. The DECIMAL pattern
  remains correct and is still the right choice when a single group's
  sum could exceed 9.2e18 ten-thousandths (global rollups at extreme
  SF). ROUND(SUM(...), 2) on doubles stays safe only while no group
  lands on a boundary (q1/q3/q5/q7 keep that legacy form for exactly
  that reason — their few giant groups sit far from boundaries, and
  their group sums are the BIGINT-overflow case); never use it for new
  money-sum queries.
- NEVER emit an IEEE ``-0.0``: ``ROUND()`` of a tiny negative double yields
  ``-0.0`` on both engines, but WHICH side of zero a near-zero result lands
  on is accumulation-order noise, so one engine can print ``0.0`` where the
  other prints ``-0.0`` — numerically equal (so local value compares pass)
  yet distinct under the driver's byte/string value hash (this exact class
  cost the round-7 gate its one red, `sim_embedding_covariance`). Rule: any
  rounded float that can be negative — z-scores, covariances, correlations,
  slopes, residuals, log-ratios, divergences — goes through ``round_nz``
  on the Spark side and ``(ROUND(x, n) + 0.0)`` in the oracle SQL
  (IEEE ``-0.0 + 0.0 = +0.0``; non-zero values and NULLs are unchanged).
  ``scripts/check_correctness.py`` flags any ``-0.0`` cell on either
  engine as a hard failure, so regressions in this class cannot pass the
  local gate.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def money_ticks(expr: Column) -> Column:
    """Per-row money expression as exact BIGINT ten-thousandths.

    price (2dp) × rate-complement (2dp) products are exactly 4 decimal
    places, so ``expr · 10000`` is an integer whose double evaluation
    sits within ~1e-6 of it — ``ROUND`` recovers it exactly, and the
    subsequent BIGINT sum is exact integer arithmetic. Equivalent to the
    registry's DECIMAL(18,4) accumulation rule (same exact rational, so
    the output double is bit-identical) but sums as cheap long addition
    instead of decimal128 codegen — measured ~2× on the money-heavy
    aggregations (VERDICT r7 #2). Oracle-side equivalent:
    ``SUM(CAST(ROUND(expr * 10000) AS BIGINT))``; divide the sum once at
    output with ``CAST(... AS DOUBLE) / 10000`` (Spark: ``/ 10000.0``).
    Keep ORDER BY / comparisons on the integer sum, not the double.
    Overflow headroom: |sum| < 9.2e18 ten-thousandths ≈ $920 trillion
    per group — fine for any per-group rollup; for a single global total
    at extreme scale, fall back to the DECIMAL pattern.
    """
    return F.round(expr * F.lit(10000)).cast("long")


def int_bracket_sql(rel: str, col: str, nums: Sequence[int], denom: int) -> str:
    """Oracle-side mirror of ``operators/stats.py:exact_quantile_brackets``:
    a DuckDB subquery producing, for each prob num/denom over the integral
    column ``col`` of relation ``rel``, the percentile_cont BRACKET values
    (vlo, vhi) at rank h = (n−1)·num/denom plus rem = (n−1)·num mod denom,
    packed as a struct list ordered by num. Consumers then evaluate
    ``x > quantile`` by integer cross-multiplication
    ``denom·x > denom·vlo + rem·(vhi − vlo)`` — the engine-build-proof
    replacement for ``x > ROUND(quantile_cont(...), k)`` (a last-ulp
    interpolation difference between DuckDB builds flipped the r8 rfm
    gate; this form has no float threshold to flip)."""
    nums_sql = ", ".join(f"({int(k)})" for k in nums)
    return f"""
  SELECT list(struct_pack(vlo := vlo, vhi := vhi, rem := rem)
              ORDER BY k) AS t
  FROM (
    SELECT g.k AS k,
           MAX(CASE WHEN r.rn = ((r.n - 1) * g.k) // {denom}
               THEN r.v END) AS vlo,
           MAX(CASE WHEN r.rn = ((r.n - 1) * g.k) // {denom}
                         + CASE WHEN ((r.n - 1) * g.k) % {denom} > 0
                                THEN 1 ELSE 0 END
               THEN r.v END) AS vhi,
           ANY_VALUE(((r.n - 1) * g.k) % {denom}) AS rem
    FROM (SELECT CAST({col} AS BIGINT) AS v,
                 ROW_NUMBER() OVER (ORDER BY {col}) - 1 AS rn,
                 COUNT(*) OVER () AS n
          FROM {rel}) r
    CROSS JOIN (VALUES {nums_sql}) g(k)
    GROUP BY g.k
  )
"""


def round_nz(col: Column | str, scale: int) -> Column:
    """``ROUND(col, scale)`` with ``-0.0`` normalized to ``+0.0``.

    ``+ 0.0`` is exact for every other finite double and propagates NULL,
    so the ONLY value it changes is the sign bit of negative zero — use
    for every rounded float column that can be negative (registry rule
    above). Oracle-side equivalent: ``(ROUND(x, n) + 0.0)``.
    """
    return F.round(col, scale) + F.lit(0.0)


def safe_corr(x: Column | str, y: Column | str, over=None) -> Column:
    """Pearson correlation that returns NULL (not an ANSI
    DIVIDE_BY_ZERO error) when either series has zero variance.

    ``F.corr`` divides by the variance product INSIDE the aggregate, so
    a constant window/group throws under Spark-4 ANSI mode and a
    ``F.when`` guard around it cannot help — the window/aggregate
    processor evaluates the aggregate before the projection. Composing
    from ``covar_pop`` / ``stddev_pop`` (each divides only by n) with
    ``try_divide`` keeps the whole thing aggregate-safe; the value is
    the same Welford co-moment ratio ``ck / sqrt(xMk * yMk)`` modulo
    last-ulp rounding, and matching oracles (DuckDB ``CORR``) return
    NULL in exactly the same zero-variance case. At 100 TB a
    zero-variance group is a certainty, not an edge case — never use
    raw ``F.corr`` in a contract query.

    ``over``: optional Window spec — applied to each component aggregate
    (``try_divide(...)`` itself is a projection, not a window function).

    Pairwise completeness: ``corr`` restricts BOTH moment computations
    to rows where both inputs are non-NULL; a bare ``stddev_pop(x)``
    would also count rows where only ``y`` is NULL (e.g. lag columns),
    so both inputs are masked to the pairwise-complete subset first.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    both = xc.isNotNull() & yc.isNotNull()
    xm = F.when(both, xc)
    ym = F.when(both, yc)

    def _ov(c: Column) -> Column:
        return c.over(over) if over is not None else c

    return F.try_divide(
        _ov(F.covar_pop(xm, ym)),
        _ov(F.stddev_pop(xm)) * _ov(F.stddev_pop(ym)),
    )


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def register(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate contract query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return register
