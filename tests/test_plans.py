"""Physical-plan regression tests: the optimizations the engine relies on
at scale must be visible in the plan, not assumed.

- filters reach the parquet scan (PushedFilters),
- projections prune the read schema (ReadSchema),
- dimension joins broadcast (no sort-merge shuffle of the fact table),
- aggregations are partial (map-side combine before the shuffle).
"""

import re

import pytest

from local_pubchem_db_spark.queries import QUERIES


def plan_of(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def test_point_lookup_pushdown(spark, sf_dir):
    plan = plan_of(spark, "point_lookup", sf_dir)
    assert "PushedFilters" in plan and "EqualTo(o_orderkey,42)" in plan


def test_range_filter_pushdown(spark, sf_dir):
    plan = plan_of(spark, "range_filter", sf_dir)
    assert "GreaterThanOrEqual(p_retailprice,1200.0)" in plan
    assert "LessThanOrEqual(p_retailprice,1400.0)" in plan


def test_prefix_filter_pushdown(spark, sf_dir):
    plan = plan_of(spark, "prefix_filter", sf_dir)
    assert "StringStartsWith(c_name," in plan


def test_projection_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, "projection_scan", sf_dir)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert cols == ["o_orderkey", "o_custkey"]


def test_pricing_summary_scan_is_minimal(spark, sf_dir):
    plan = plan_of(spark, "pricing_summary", sf_dir)
    # shipdate predicate pushed to the scan
    assert "LessThanOrEqual(l_shipdate," in plan
    # only the 7 referenced columns are read from the 16-column table
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    # partial aggregation: two HashAggregates around one exchange
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "name,n_broadcasts",
    [
        ("top_unshipped_orders", 1),   # customer dim broadcast
        ("revenue_by_nation", 3),      # supplier, nation, region
        ("brand_volume", 2),           # part, supplier
    ],
)
def test_dim_joins_broadcast(spark, sf_dir, name, n_broadcasts):
    plan = plan_of(spark, name, sf_dir)
    assert plan.count("BroadcastHashJoin") >= n_broadcasts, plan


def test_anti_join_shape(spark, sf_dir):
    plan = plan_of(spark, "customers_without_orders", sf_dir)
    assert "LeftAnti" in plan


def test_semi_join_shape(spark, sf_dir):
    plan = plan_of(spark, "customers_with_urgent_orders", sf_dir)
    assert "LeftSemi" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "top_unshipped_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan
