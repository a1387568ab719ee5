"""Bloom-filter runtime pruning for large joins.

Spark's optimizer injects bloom runtime filters for some shuffle joins
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but the expression
(`bloom_filter_agg`) is internal — not callable from the public API — and
the automatic rule only fires for shapes it recognizes. This module is the
engine-side equivalent, built from public DataFrame ops, usable anywhere:
prefilter a 100 TB fact table against a filtered dimension BEFORE the
shuffle join, so the shuffle moves ~|matching rows| instead of |fact|.

Shape (all JVM expressions, no Python):

- build: explode k=``num_hashes`` positions per dim key
  (``xxhash64(key, j) mod m``), ``bit_or`` the per-position masks into
  m/64 words (map-side partial agg on a 12-byte row), assemble ONE row
  holding ``bits: array<long>`` — ``num_bits/8`` bytes total, independent
  of dim cardinality, always broadcastable.
- probe: cross-join the 1-row bloom (broadcast), test all k bits with
  ``bit_get`` in the scan projection. No shuffle of the fact side.
- exactness: a Bloom filter has no false negatives, so
  ``prefilter → exact join`` returns exactly the join's rows; false
  positives only cost wasted shuffle rows (rate set by ``bloom_params``).

The sketch-as-DataFrame pattern matches ``operators/sketches.py`` (CMS).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for ``n_items`` keys at false-positive
    rate ``fpp``: m = -n ln p / (ln 2)^2, k = (m/n) ln 2."""
    if n_items < 1 or not (0.0 < fpp < 1.0):
        raise ValueError("need n_items >= 1 and 0 < fpp < 1")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    k = max(1, round(m / n_items * math.log(2)))
    return _round_up_64(m), k


# The filter materializes as ONE row holding m/64 longs and broadcasts to
# every task: past ~2^28 bits (32 MiB) that stops being a cheap broadcast
# and the single-row final aggregation becomes the bottleneck — the same
# reason Spark caps its internal runtime filter at 67M bits
# (spark.sql.optimizer.runtime.bloomFilter.maxNumBits). Beyond this cap
# (≳10^8 distinct keys), shard the dim by key range and prefilter with one
# bloom per shard, or fall back to the plain shuffle join.
MAX_NUM_BITS = 1 << 28


def _round_up_64(num_bits: int) -> int:
    if num_bits < 1:
        raise ValueError("num_bits must be >= 1")
    num_bits = max(num_bits, 64)  # one word minimum
    if num_bits > MAX_NUM_BITS:
        raise ValueError(
            f"num_bits {num_bits} exceeds MAX_NUM_BITS ({MAX_NUM_BITS}); "
            "a bloom this size is no longer a cheap broadcast — shard the "
            "dim side or use the plain shuffle join"
        )
    return ((num_bits + 63) // 64) * 64


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # k hashes via xxhash64 over the (key, j) tuple — independent,
    # deterministic, and identical on build and probe sides.
    # xxhash64 hashes the BYTES of its input, so `1` as int and `1` as
    # bigint would hash differently and silently DROP true matches; the
    # cast-to-string canonicalizes every integer width (and strings pass
    # through) so the public build/probe pair agrees without the caller
    # thinking about dtypes. Float keys must be cast to double by the
    # caller (a float and the double it widens to print different
    # strings) — bloom_prefilter enforces that via _normalized_key.
    canon = key.cast("string")
    return [
        F.pmod(F.xxhash64(canon, F.lit(j)), F.lit(num_bits))
        for j in range(num_hashes)
    ]


# Normalization for the DataFrame-level entry points: widen integrals to
# bigint and floats to double so equal values on differently-typed sides
# canonicalize identically, and refuse key types that can't be unified.
_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}


def _normalized_key(df: DataFrame, key_col: str) -> tuple[Column, str]:
    """(column, normalized-dtype) for ``df[key_col]`` with integral types
    widened to bigint and floats to double so build and probe hash the
    same byte representation of equal values."""
    dtype = dict(df.dtypes).get(key_col)
    if dtype is None:
        raise ValueError(f"column {key_col!r} not found in {df.columns}")
    col = F.col(key_col)
    if dtype in _INTEGRAL_TYPES:
        return col.cast("long"), "bigint"
    if dtype in _FLOAT_TYPES:
        return col.cast("double"), "double"
    return col, dtype


def bloom_build(
    dim: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """One-row DataFrame ``(bits: array<long>)`` — the Bloom filter of
    ``dim[key_col]``. m/64 longs regardless of dim row count."""
    m = _round_up_64(int(num_bits))
    n_words = m // 64
    key, _ = _normalized_key(dim, key_col)
    pos = dim.select(
        F.explode(F.array(*_positions(key, m, num_hashes))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
    )
    # densify to a fixed-length array (words with no set bits are absent)
    return words.agg(
        F.map_from_arrays(
            F.collect_list("w"), F.collect_list("bits")
        ).alias("__wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at("__wm", i), F.lit(0).cast("long")),
        ).alias("bits")
    )


def bloom_might_contain(
    key: Column,
    bits: Column,
    *,
    num_bits: int,
    num_hashes: int = 4,
) -> Column:
    """Predicate: all ``num_hashes`` bits for ``key`` are set in ``bits``.
    Pure scan-projection expression (pmod/xxhash64/bit_get) — k is small,
    so the conjunction is unrolled rather than a ``forall`` loop.

    Keys hash through their string canonicalization, so any integer width
    (and string keys) probe a bloom built from any integer width with no
    caller-side cast; FLOAT key columns must be ``.cast('double')`` first
    to match a double-built bloom (use ``bloom_prefilter``, which
    normalizes and validates both sides, when working from DataFrames)."""
    m = _round_up_64(int(num_bits))

    def bit_ok(pos: Column) -> Column:
        word = F.element_at(bits, (pos / 64).cast("int") + 1)
        return F.bit_get(word, F.pmod(pos, F.lit(64)).cast("int")) == 1

    return reduce(
        lambda a, b: a & b, [bit_ok(p) for p in _positions(key, m, num_hashes)]
    )


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Fact rows whose key MIGHT be in ``dim[dim_key]`` — a superset of the
    semi-join (no false negatives) computed without shuffling ``fact``:
    the 1-row bloom broadcasts and the k bit tests run in the projection."""
    fact_norm, fact_type = _normalized_key(fact, fact_key)
    _, dim_type = _normalized_key(dim, dim_key)
    if fact_type != dim_type:
        raise ValueError(
            f"bloom key dtype mismatch: fact[{fact_key}] normalizes to "
            f"{fact_type} but dim[{dim_key}] to {dim_type}; xxhash64 is "
            "byte-sensitive, so mismatched types would hash equal values "
            "differently and silently DROP true matches — cast one side"
        )
    bloom = bloom_build(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    return (
        fact.join(F.broadcast(bloom))
        .where(
            bloom_might_contain(
                fact_norm,
                F.col("bits"),
                num_bits=num_bits,
                num_hashes=num_hashes,
            )
        )
        .drop("bits")
    )


# Below this estimated fact size the bloom build+probe costs more than it
# saves (PERF.md measured it ~0.2 s SLOWER than the plain semi-join at
# sf0.1, where the whole shuffle is memory-speed); the win only appears
# when the avoided shuffle is disk/network-bound. 1 GiB is a deliberately
# conservative floor — roughly the point where a fact side stops fitting a
# single executor's shuffle buffers.
DEFAULT_MIN_FACT_BYTES = 1 << 30


def _estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate — file-size based for scans
    with filter/project selectivity factored in; no job is triggered."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def bloom_pruned_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    min_fact_bytes: int = DEFAULT_MIN_FACT_BYTES,
) -> DataFrame:
    """EXACT semi-join with a Bloom prefilter: the bloom drops non-matching
    fact rows before the shuffle, the left-semi join removes the false
    positives. At 100 TB this is the difference between shuffling the full
    fact table and shuffling ~|matching| + fpp·|fact| rows.

    Costing guard: when Catalyst's size estimate for ``fact`` is below
    ``min_fact_bytes`` the bloom cannot pay for its build+probe (measured
    regression in PERF.md's local-regime audit) and the call falls through
    to the plain left-semi join — same rows either way, since both paths
    are exact. Pass ``min_fact_bytes=0`` to force the bloom path."""
    fact_type = _normalized_key(fact, fact_key)[1]
    dim_type = _normalized_key(dim, dim_key)[1]
    if fact_type != dim_type:
        raise ValueError(
            f"bloom key dtype mismatch: fact[{fact_key}] normalizes to "
            f"{fact_type} but dim[{dim_key}] to {dim_type} — cast one side"
        )
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if _estimated_size_bytes(fact) < int(min_fact_bytes):
        return fact.join(dim_keys, fact_key, "left_semi")
    pruned = bloom_prefilter(
        fact, dim, fact_key, dim_key, num_bits=num_bits, num_hashes=num_hashes
    )
    return pruned.join(dim_keys, fact_key, "left_semi")
