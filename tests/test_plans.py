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


def test_indexed_filters_pushdown(spark, sf_dir):
    plan = plan_of(spark, "indexed_filters", sf_dir)
    # range predicate pushed to the orders scan
    assert "GreaterThanOrEqual(o_totalprice,50000.0)" in plan
    assert "LessThanOrEqual(o_totalprice,200000.0)" in plan
    # prefix predicate pushed to the customer scan
    assert "StringStartsWith(c_name," in plan
    # 10-row prefix side broadcast, not shuffled
    assert "BroadcastHashJoin" in plan


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
    plan = plan_of(spark, "customers_no_recent_orders", sf_dir)
    assert "LeftAnti" in plan


def test_semi_join_shape(spark, sf_dir):
    plan = plan_of(spark, "customers_with_urgent_orders", sf_dir)
    assert "LeftSemi" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "top_unshipped_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan


def _op_count(plan, op):
    # formatted explain lists each operator twice (tree + details); the
    # detail headers "(<id>) <Op>" appear exactly once per operator
    return len(re.findall(r"\(\d+\) " + op, plan))


def test_event_windows_single_shuffle(spark, sf_dir):
    # lag + two running frames share one (user_id) sort — merging the two
    # r1 queries must not have added a second exchange or scan
    plan = plan_of(spark, "event_windows", sf_dir)
    assert _op_count(plan, "Exchange") == 1, plan
    assert _op_count(plan, "Scan parquet") == 1, plan


def test_json_variant_props_one_pass(spark, sf_dir):
    # classic JSON and variant extraction verified against each other in
    # ONE scan + one partial-agg shuffle, not a self-join
    plan = plan_of(spark, "json_variant_props", sf_dir)
    assert _op_count(plan, "Scan parquet") == 1, plan
    assert _op_count(plan, "Exchange") == 1, plan
    assert _op_count(plan, "HashAggregate") == 2  # partial + final


def test_sample_splits_reuses_window_partitioning(spark, sf_dir):
    # groupBy(lang, split) is satisfied by the window's hash(lang)
    # partitioning (grouping keys are a superset), so ONE exchange total
    plan = plan_of(spark, "sample_splits", sf_dir)
    assert _op_count(plan, "Exchange") == 1, plan


def test_order_date_parts_single_scan(spark, sf_dir):
    # date parts + conditional aggs + decimal totals in one scan of orders
    plan = plan_of(spark, "order_date_parts", sf_dir)
    assert _op_count(plan, "Scan parquet") == 1, plan


def test_ntile_has_no_single_partition_exchange(spark, sf_dir):
    # A bare Window.orderBy plans Exchange SinglePartition — the whole
    # table through one task. distributed_ntile must not: the DATA window
    # partitions by __bucket, and the only SinglePartition exchange in the
    # plan is the offsets prefix-sum over the <= num_buckets-row AGGREGATE
    # (broadcast-joined back; no driver collect, no separate counts job).
    plan = plan_of(spark, "ntile_price_deciles", sf_dir)
    assert plan.count("SinglePartition") == 1, plan
    assert "hashpartitioning(__bucket" in plan, plan  # data-side window
    assert "BroadcastHashJoin" in plan  # offsets joined broadcast
    # offsets come from an in-query aggregate, not a collected local table
    assert "LocalTableScan" not in plan, plan


def test_distributed_ntile_matches_builtin(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.topk import distributed_ntile

    # 1013 rows (not divisible by 10), heavy ties on the range column
    df = spark.range(1013).select(
        F.col("id").alias("k"), (F.col("id") % 37).cast("double").alias("v")
    )
    want = df.select(
        "k", F.ntile(10).over(Window.orderBy("v", "k")).alias("tile")
    ).collect()
    got = distributed_ntile(
        df, 10, [F.col("v").asc(), F.col("k").asc()], range_col="v",
        num_buckets=8,
    ).select("k", "tile").collect()
    assert sorted((r.k, r.tile) for r in got) == sorted(
        (r.k, r.tile) for r in want
    )


def test_incremental_dedup_scans_persisted_index(spark, sf_dir):
    # The incremental contract: history is joined via its persisted
    # (band, bucket) index table — never re-shingled inline.
    plan = plan_of(spark, "incremental_dedup", sf_dir)
    assert "lsh_hist_idx" in plan, plan


def test_distributed_ntile_fewer_rows_than_tiles(spark):
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.topk import distributed_ntile

    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").cast("double").alias("v"))
    got = distributed_ntile(
        df, 10, [F.col("v").asc(), F.col("k").asc()], range_col="v"
    ).select("k", "tile").collect()
    assert sorted((r.k, r.tile) for r in got) == [(0, 1), (1, 2), (2, 3)]


def test_distributed_rank_matches_global_row_number(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.topk import distributed_rank

    df = spark.range(777).select(
        F.col("id").alias("k"), (F.col("id") % 13).cast("double").alias("v")
    )
    want = {
        r["k"]: r["r"]
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("v", "k")).alias("r")
        ).collect()
    }
    ranked = distributed_rank(
        df, [F.col("v").asc(), F.col("k").asc()], range_col="v",
        num_buckets=8, total_col="tot",
    )
    rows = ranked.select("k", "rank", "tot").collect()
    assert all(r["tot"] == 777 for r in rows)
    got = {r["k"]: r["rank"] for r in rows}
    assert got == want


def test_broadcast_if_small_gate(spark, sf_dir):
    """broadcast_if_small (r10): hint only when plan stats PROVE the
    relation small — a provably-tiny dim gets the hint (skipping the
    AQE shuffle-write), anything above the ceiling or with broadcast
    disabled stays unhinted (the never-OOM AQE path; a forced broadcast
    of a scaling dim OOMed the sf100 run)."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.util import broadcast_if_small

    small = spark.read.parquet(f"{sf_dir}/customer.parquet")
    fact = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def joined_plan(dim):
        return (
            fact.join(dim, fact.o_custkey == dim.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # tiny relation under the default ceiling: hinted
    assert "BroadcastHashJoin" in joined_plan(broadcast_if_small(small))
    # explicit 1-byte ceiling: provably NOT small -> unhinted plan
    # (initial plan shows the un-broadcast join; AQE may still convert
    # at runtime — that is exactly the intended fallback)
    unhinted = broadcast_if_small(small, max_bytes=1)
    assert unhinted is small  # no hint node added at all
    # broadcast disabled in-session: never hint regardless of size.
    # Restore the value the session actually HAD, not a hardcoded one —
    # a hardcoded restore silently mutates shared-session state for
    # later tests when the default differs (ADVICE r10).
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert broadcast_if_small(small) is small
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_sized_shuffle_partitions_and_scale_shuffle(spark, sf_dir):
    """Per-query shuffle sizing (r11, verdict Next #1): below the
    volume threshold the fact is untouched (small-SF plans keep AQE
    freedom); above it, the explicit keyed repartition carries the
    computed count as a user REPARTITION_BY_NUM exchange that the
    downstream sort-merge join adopts on BOTH sides — the plan gains no
    exchange, the one shuffle is just sized to the data."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.util import (
        scale_shuffle,
        sized_shuffle_partitions,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # sf0.001 lineitem is far under default x 128 MB: no-op
    assert sized_shuffle_partitions(li) is None
    assert scale_shuffle(li, "l_orderkey") is li

    # force engagement with a tiny per-task budget
    n = sized_shuffle_partitions(li, bytes_per_task=1 << 10)
    assert n is not None and n > default
    sized = scale_shuffle(li, "l_orderkey", bytes_per_task=1 << 10)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            sized.join(orders, sized.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert f"hashpartitioning(l_orderkey#" in plan
    assert "REPARTITION_BY_NUM" in plan
    # both join inputs aligned to the computed count; the grouped agg
    # reuses the join partitioning (subset key) — exactly 2 exchanges
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count(f", {n})") == 2

    # a provably-broadcastable dim suppresses the fact shuffle: the
    # join will be broadcast-hash with no fact exchange at all
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    assert (
        scale_shuffle(li, "l_orderkey", bytes_per_task=1 << 10, dim=nation)
        is li
    )


def test_scale_shuffle_rows_identical(spark, sf_dir):
    """Sized and default plans agree on content."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.util import scale_shuffle

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = (
        li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    sized = (
        scale_shuffle(li, "l_orderkey", bytes_per_task=1 << 10)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, base)) == sorted(map(tuple, sized))


def test_table_loader_schema_memo_job_free(spark, sf_dir):
    """r15: t() memoizes each parquet path's SCHEMA (metadata only, no
    rows) so repeat reads skip Spark 4's 1-task footer-inference job —
    query construction paid one fixed driver round trip per table read.
    Pin: a repeat read launches zero jobs and yields the identical
    schema + identical rows as a memo-free read."""
    from local_pubchem_db_spark.queries import _SCHEMA_MEMO, t

    sc = spark.sparkContext

    def n_jobs():
        ids = sc.statusTracker().getJobIdsForGroup(None) or []
        return max(ids) + 1 if ids else 0

    import os

    t(spark, sf_dir, "nation")  # ensure memoized
    path = f"{sf_dir}/nation.parquet"
    assert (path, os.path.getmtime(path)) in _SCHEMA_MEMO
    j0 = n_jobs()
    df = t(spark, sf_dir, "nation")
    assert n_jobs() - j0 == 0, "memoized read must not launch a job"
    fresh = spark.read.parquet(f"{sf_dir}/nation.parquet")
    assert df.schema == fresh.schema
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_table_loader_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    """r16 (VERDICT r15 What's-wrong #4 / ADVICE): a parquet fixture
    REGENERATED at the same path within one process must be re-inferred,
    not read with the stale memoized schema (which would silently null
    the new columns). The memo key carries the path's mtime."""
    import os
    import time

    from local_pubchem_db_spark.queries import t

    sf = str(tmp_path)
    p = f"{sf}/nation.parquet"
    spark.range(3).selectExpr("id AS n_nationkey").write.parquet(p)
    assert t(spark, sf, "nation").columns == ["n_nationkey"]
    time.sleep(0.05)  # ensure a distinct directory mtime
    spark.range(3).selectExpr(
        "id AS n_nationkey", "CAST(id AS STRING) AS n_name"
    ).write.mode("overwrite").parquet(p)
    os.utime(p)  # belt and braces on coarse-mtime filesystems
    got = t(spark, sf, "nation")
    assert got.columns == ["n_nationkey", "n_name"], (
        "stale schema served after fixture rewrite"
    )
    assert got.count() == 3
