"""Fleet-wide physical-plan audit: every declared query's plan is swept
for the operators that kill 100 TB runs. A new query (or a regression in
an operator) that introduces a cartesian product, a row-at-a-time Python
UDF, or an unexpected whole-table single-partition funnel fails here —
with an allowlist that documents WHY each accepted hit is safe.
"""

import pytest

from local_pubchem_db_spark.queries import QUERIES

# name -> {pattern: max_count} with the justification for each entry.
ALLOWED = {
    # global COUNT(*): the final reduce of per-partition partial counts —
    # one row per partition reaches the single task, never the data
    "count_star": {"SinglePartition": 1},
    # global sketch aggregate: same shape (partial HLL/GK merge)
    "approx_sketches": {"SinglePartition": 1},
    # distributed_ntile: the <= num_buckets-row offsets prefix-sum (also
    # pinned structurally by test_plans.py)
    "ntile_price_deciles": {"SinglePartition": 1},
    # range join: non-equi predicates plan BroadcastNestedLoopJoin with
    # the SMALL side broadcast — the documented strategy; the loop join
    # never materializes a cartesian (predicates filter in the join)
    "price_band_pairs": {"BroadcastNestedLoopJoin": 2},
    # r15: the split-form snapshot totals ride a broadcast 1-ROW cross
    # join (the scalar-attach pattern replacing a driver .first()); the
    # build side is a global aggregate — SinglePartition carries one row
    # per upstream partition and the loop join multiplies by exactly 1
    "token_drift": {"BroadcastNestedLoopJoin": 2, "SinglePartition": 1},
}

RED_FLAGS = [
    "CartesianProduct",       # unbounded pair blow-up
    "BatchEvalPython",        # row-at-a-time Python UDF (Arrow is ArrowEvalPython)
    "SinglePartition",        # whole-input funnel unless aggregate-fed
    "BroadcastNestedLoopJoin",  # quadratic unless one side is tiny by design
]


def _plan(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_killers_in_plan(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    allowed = ALLOWED.get(name, {})
    for bad in RED_FLAGS:
        count = plan.count(bad)
        assert count <= allowed.get(bad, 0), (
            f"{name}: {bad} x{count} in physical plan "
            f"(allowed {allowed.get(bad, 0)}) — justify it in ALLOWED or "
            f"fix the plan\n{plan}"
        )
