"""Deterministic split/sample operators: stability, fractions, exactness."""

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.sampling import hash_split, stratified_sample


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_hash_split_fractions(spark, ids):
    counts = {
        r["split"]: r["n"]
        for r in hash_split(ids, "doc_id").groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_hash_split_deterministic_and_seeded(spark, ids):
    a = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id").collect()}
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids, "doc_id", seed="other").collect()
    }
    assert a != c  # a different seed reshuffles membership


def test_hash_split_bad_fractions(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", {"train": 0.5, "val": 0.1})


def test_stratified_sample_exact_group_sizes(spark, ids):
    df = ids.withColumn("g", (F.col("doc_id") % 4).cast("string"))
    got = stratified_sample(df, "g", 0.25, "doc_id")
    sizes = {
        r["g"]: r["n"]
        for r in got.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # each group has 500 rows -> exactly ceil(500 * 0.25) = 125 sampled
    assert sizes == {"0": 125, "1": 125, "2": 125, "3": 125}


def test_stratified_sample_deterministic(spark, ids):
    df = ids.withColumn("g", (F.col("doc_id") % 4).cast("string"))
    a = sorted(r["doc_id"] for r in stratified_sample(df, "g", 0.25, "doc_id").collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, "g", 0.25, "doc_id").collect())
    assert a == b


def test_deterministic_shuffle_matches_md5_oracle_and_partitioning(spark):
    import hashlib

    from local_pubchem_db_spark.operators.sampling import deterministic_shuffle

    rows = [(i, f"doc {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed="s1").collect()]
    want = sorted(range(200), key=lambda i: hashlib.md5(f"s1:{i}".encode()).hexdigest())
    assert got == want                      # exact engine-portable order
    assert sorted(got) == list(range(200))  # a permutation, nothing lost

    # same permutation under a different physical layout
    got13 = [
        r["doc_id"]
        for r in deterministic_shuffle(df.repartition(13), "doc_id", seed="s1").collect()
    ]
    assert got13 == want

    # a different seed gives a different permutation
    got_s2 = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed="s2").collect()]
    assert got_s2 != want and sorted(got_s2) == list(range(200))

    # keep_key exposes the audit column; default drops it
    with_key = deterministic_shuffle(df, "doc_id", keep_key=True)
    assert with_key.columns == ["doc_id", "text", "shuffle_key"]

    # the sort is range-partitioned (parallel), not a single-partition funnel
    qe = deterministic_shuffle(df, "doc_id")._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_sample_per_key_exact_deterministic_nested(spark, sf_dir):
    from local_pubchem_db_spark.operators.sampling import sample_per_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n")).collect()}

    s5 = sample_per_key(docs, "source", "doc_id", 5)
    got = {r["source"]: r["n"] for r in s5.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {src: min(5, n) for src, n in sizes.items()}

    # deterministic across runs and input partitionings
    a = sorted((r["source"], r["doc_id"]) for r in s5.collect())
    b = sorted((r["source"], r["doc_id"]) for r in sample_per_key(
        docs.repartition(13), "source", "doc_id", 5).collect())
    assert a == b

    # nesting: the k=3 sample is a subset of the k=5 sample per key
    s3 = {(r["source"], r["doc_id"]) for r in sample_per_key(
        docs, "source", "doc_id", 3).collect()}
    assert s3 <= set(a)

    # different seed -> different (but still exact-size) selection
    alt = sorted((r["source"], r["doc_id"]) for r in sample_per_key(
        docs, "source", "doc_id", 5, seed="other").collect())
    assert alt != a and len(alt) == len(a)
