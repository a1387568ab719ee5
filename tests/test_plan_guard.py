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
