"""Misra-Gries heavy hitters: classic sketch guarantees checked against
exact counts on skewed data with deliberately tight capacity (so the
eviction path actually runs)."""

import numpy as np
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.topk import misra_gries_topk


def test_mg_bounds_and_heavy_hitter_guarantee(spark):
    rng = np.random.default_rng(7)
    # Zipf over a 500-item domain: a few heavy items, long tail
    items = [f"tok{v}" for v in np.minimum(rng.zipf(1.3, 4000), 500)]
    df = spark.createDataFrame([(t,) for t in items], "item string").repartition(8)
    n = len(items)
    cap = 16

    exact = {}
    for t in items:
        exact[t] = exact.get(t, 0) + 1

    got = {
        r["item"]: r["est_count"]
        for r in misra_gries_topk(df, "item", k=10, capacity=cap).collect()
    }
    assert got, "sketch must produce output"
    slack = n / (cap + 1)
    for item, est in got.items():
        true = exact.get(item, 0)
        assert est <= true, (item, est, true)
        assert true - est <= slack, (item, est, true, slack)

    # guarantee: every item with true frequency above n/(cap+1) surfaces
    heavy = {t for t, c in exact.items() if c > slack}
    assert heavy, "test data must contain guaranteed-heavy items"
    assert heavy <= set(got), sorted(heavy - set(got))

    # the true #1 item must rank #1 in the sketch too (its undercount is
    # bounded while every other estimate never overcounts true #2's mass
    # plus slack — holds comfortably at this skew)
    true_top = max(exact, key=lambda t: (exact[t], t))
    sketch_top = max(got, key=lambda t: (got[t], t))
    assert sketch_top == true_top


def test_mg_exact_when_capacity_covers_domain(spark):
    # capacity >= distinct items: MG degenerates to exact counting
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "item string"
    ).repartition(4)
    got = {
        r["item"]: r["est_count"]
        for r in misra_gries_topk(df, "item", k=3, capacity=64).collect()
    }
    assert got == {"a": 5, "b": 3, "c": 1}


def test_mg_validates_arguments(spark):
    import pytest

    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="capacity >= k"):
        misra_gries_topk(df, "item", k=10, capacity=5)


def test_skew_report_flags_hot_keys(spark):
    from local_pubchem_db_spark.operators.topk import skew_report

    import pytest as _pytest
    from pyspark.sql import functions as F

    # 10k rows: key column 'a' has one 40% hot key; 'b' is uniform
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 4, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 997).cast("string")))
        .alias("a"),
        (F.col("id") % 500).alias("b"),
    )
    rep = skew_report(df, ["a", "b"], k=5).collect()
    by_col = {}
    for r in rep:
        by_col.setdefault(r["column"], []).append(r)
    assert set(by_col) == {"a", "b"}
    top_a = max(by_col["a"], key=lambda r: r["est_count"])
    assert top_a["key"] == "HOT"
    # MG only undercounts: estimated share <= true 40%, but well above
    # the uniform background and the guarantee floor
    assert 0.3 <= top_a["est_share"] <= 0.4
    # the uniform column's heaviest key holds ~1/500 of rows
    top_b = max(by_col["b"], key=lambda r: r["est_count"])
    assert top_b["est_share"] < 0.01
    with _pytest.raises(ValueError):
        skew_report(df, [])


def test_skew_report_single_scan_for_all_columns(spark, tmp_path):
    """One report over 3 columns must read the input ONCE: all columns'
    MG summaries come from a single mapInPandas over a single file scan
    (r6 looped misra_gries_topk per column = k+1 scans)."""
    from local_pubchem_db_spark.operators.topk import skew_report

    from pyspark.sql import functions as F

    path = str(tmp_path / "keys")
    spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("a"),
        (F.col("id") % 11).cast("string").alias("b"),
        (F.col("id") % 13).cast("string").alias("c"),
    ).write.parquet(path)
    df = spark.read.parquet(path)
    plan = (
        skew_report(df, ["a", "b", "c"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert plan.count("FileScan parquet") == 1


def test_mg_summaries_match_per_column_sketch_semantics(spark):
    """The fused multi-column summarizer degenerates to exact counts per
    column when capacity covers each domain, independent of the other
    columns sharing the pass."""
    from local_pubchem_db_spark.operators.topk import misra_gries_summaries

    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "x")] * 3 + [("a", "y")] * 2,
        "k1 string, k2 string",
    ).repartition(4)
    got = {
        (r["column"], r["item"]): r["est_count"]
        for r in misra_gries_summaries(df, ["k1", "k2"], capacity=64).collect()
    }
    assert got == {
        ("k1", "a"): 7,
        ("k1", "b"): 3,
        ("k2", "x"): 8,
        ("k2", "y"): 2,
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        misra_gries_summaries(df, ["k1", "k1"])


def test_skew_report_counts_null_keys_exactly(spark):
    from local_pubchem_db_spark.operators.topk import skew_report

    from pyspark.sql import functions as F

    # 90% of rows have a NULL key: one reducer would carry them all
    df = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, F.concat(F.lit("k"), F.col("id").cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("user"),
    )
    rep = {r["key"]: r for r in skew_report(df, ["user"], k=5).collect()}
    assert "<null>" in rep
    assert rep["<null>"]["est_count"] == 900  # exact, not sketched
    assert rep["<null>"]["est_share"] == 0.9


def test_skew_report_validates_k_capacity(spark):
    """The per-column path used to inherit misra_gries_topk's check;
    the fused path must fail loudly too, not silently truncate."""
    import pytest as _pytest

    from local_pubchem_db_spark.operators.topk import skew_report

    df = spark.createDataFrame([("a",)], "k string")
    with _pytest.raises(ValueError, match="capacity >= k"):
        skew_report(df, ["k"], k=50, capacity=10)
    with _pytest.raises(ValueError, match="capacity >= k"):
        skew_report(df, ["k"], k=0)
