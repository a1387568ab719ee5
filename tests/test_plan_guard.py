"""Registry-wide physical-plan guard: no contract query may plan a
CartesianProduct.

A cartesian is the canonical scale-killer — O(|A|·|B|) rows moved — and
it can appear silently when a join loses its equi-conjunct in a refactor
(e.g. a key rename turning `a.k == b.k` into a trivially-true literal
comparison). Planning is cheap (no job runs: `executedPlan()` stops at
the initial adaptive plan), so every registered query is checked.

1-row broadcast cross joins (scalar-aggregate broadcasts: TF-IDF corpus
size, q22's average, the bloom filter row) plan as
BroadcastNestedLoopJoin with a 1-row build side — bounded and
intentional — so BNLJ is NOT flagged; only CartesianProduct is.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_no_query_plans_a_cartesian_product(spark):
    import __spark_entry__ as entry

    offenders = []
    for name, fn in entry.queries().items():
        plan = (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == [], (
        f"queries planning a CartesianProduct: {offenders}"
    )


def test_no_query_plans_row_python_udf(spark):
    """Registry-wide: no query may plan a BatchEvalPython stage — the
    row-at-a-time Python UDF executor (each row round-trips through
    pickle, ~10-100× slower than Arrow batches). Vectorized boundaries
    (ArrowEvalPython, MapInPandas, FlatMapGroupsInPandas) stay legal;
    the ban is specifically on the per-row interpreter loop, which has
    been an engine-wide invariant since round 1 but was only enforced
    by grep until now."""
    import __spark_entry__ as entry

    offenders = []
    for name, fn in entry.queries().items():
        plan = (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert offenders == [], (
        f"queries planning a row-Python UDF stage: {offenders}"
    )


def test_qshape_scan_pushdown_and_topk_shapes(spark):
    """Pins the r11 plan audit of the newly-gated TPC-H q-shapes: the
    selective predicates must reach the parquet scan (PushedFilters) and
    the top-k queries must compile to TakeOrderedAndProject — a refactor
    that wraps a filtered column in an expression (killing pushdown) or
    replaces limit-after-sort (materializing a global sort) fails here
    before it costs anything at scale."""
    import __spark_entry__ as entry

    qs = entry.queries()

    def plan_of(name):
        return (
            qs[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # predicate -> scan pushdown (representatives of each pushdown kind
    # seen in the audit: date range, equality, string prefix). Matched
    # with tolerant regexes — filter tag + column inside a PushedFilters
    # list — not the exact `EqualTo(col,val)` rendering, which is
    # engine-version-sensitive formatting (ADVICE r11).
    import re

    def pushed(plan, tag, col):
        return any(
            re.search(rf"{tag}\([^)]*{col}", blk)
            for blk in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        )

    p = plan_of("q4_order_priority_check")
    assert pushed(p, "GreaterThanOrEqual", "o_orderdate")
    assert pushed(p, "LessThan", "o_orderdate")
    p = plan_of("q10_returned_item_customers")
    assert pushed(p, "EqualTo", "l_returnflag")
    assert "TakeOrderedAndProject" in p
    p = plan_of("q20_part_supplier_shortlist")
    assert pushed(p, "StringStartsWith", "p_name")
    p = plan_of("q18_large_volume_customers")
    assert "TakeOrderedAndProject" in p
    # scalar-subquery thresholds stay 1-row broadcasts, not cartesians
    p = plan_of("q22_dormant_rich_customers")
    assert "CartesianProduct" not in p
