"""Physical-design tests: bucketed joins avoid the shuffle, salted
aggregation matches direct aggregation."""

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.physical import (
    bucketed_join,
    salted_group_count,
    save_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # spark.sql.warehouse.dir is static; park the tables at a tmp path
    # via the external-table `path` option instead.
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    save_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b", ["orderkey"], 8, sort_cols=["orderkey"],
        path=str(wh / "orders_b"),
    )
    save_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "lineitem_b", ["orderkey"], 8, sort_cols=["orderkey"],
        path=str(wh / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # At test scale Catalyst would broadcast the small side; disable that to
    # surface the plan the bucketing is for (big-big join at 100 TB).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it actually joins correctly
    li = spark.table(right)
    assert joined.count() == li.join(
        spark.table(left), "orderkey", "left_semi"
    ).count()


def test_bucketed_join_correct_rows(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, ["orderkey"]).count()
    want = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want


def test_salted_group_count_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["n"]
        for r in salted_group_count(li, "l_returnflag", salt=16).collect()
    }
    want = {
        r["l_returnflag"]: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    assert got == want
