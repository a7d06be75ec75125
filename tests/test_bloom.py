"""Distributed Bloom filter: no false negatives ever, sized FPR,
partitioning-invariant bytes, and the bloom decontamination path
over-approximating the exact one."""

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    decontaminate_bloom,
)
from local_pubchem_db_spark.operators.dedup import decontaminate

N_BITS = 1 << 17  # 16 KiB bitmap
K = 5


def test_no_false_negatives_and_bounded_fpr(spark):
    members = spark.range(0, 5000).select(F.col("id").alias("key"))
    bitmap = bloom_build(members, "key", n_bits=N_BITS, k=K)
    assert len(bitmap) == N_BITS // 8

    probe = spark.range(0, 20000).select(F.col("id").alias("key"))
    hits = probe.filter(bloom_contains(probe, "key", bitmap, k=K)).collect()
    hit_ids = {r["key"] for r in hits}
    # every inserted key must test positive
    assert set(range(5000)) <= hit_ids
    # m/n = 26 bits/key, k=5 -> theoretical FPR ~0.1%; allow 1%
    false_pos = len(hit_ids) - 5000
    assert false_pos / 15000 < 0.01, false_pos


def test_bitmap_bytes_partition_invariant(spark):
    keys = spark.range(0, 3000).select(F.col("id").alias("key"))
    b1 = bloom_build(keys, "key", n_bits=N_BITS, k=K)
    b2 = bloom_build(keys.repartition(13), "key", n_bits=N_BITS, k=K, build_partitions=5)
    assert b1 == b2


def test_tree_fold_collects_exactly_one_partial(spark):
    """Driver traffic must be ONE bitmap's worth of rows regardless of
    how many partials the build produced: the tree fold reduces them
    executor-side through real shuffle barriers (repartition levels, so
    the parallel set_bits stage is not serialized), and the folded bytes
    match a single-partition build exactly."""
    import numpy as np
    import pandas as pd

    from local_pubchem_db_spark.operators.bloom import _tree_or_fold

    keys = spark.range(0, 3000).select(F.col("id").alias("key"))
    # byte-identity across fold shapes, including a multi-level tree
    b_flat = bloom_build(keys, "key", n_bits=N_BITS, k=K, build_partitions=1)
    b_tree = bloom_build(
        keys, "key", n_bits=N_BITS, k=K, build_partitions=32, fold_fanin=4
    )
    assert b_flat == b_tree

    # the folded relation itself: one row, and the plan shows the
    # executor-side fold levels (repartition Exchanges + MapInPandas)
    partials = spark.createDataFrame(
        pd.DataFrame(
            {
                "chunk": [0] * 8,
                "partial": [bytes([1 << i] + [0] * 7) for i in range(8)],
            }
        )
    )
    folded = _tree_or_fold(partials, width=8, fanin=2)
    rows = folded.collect()
    assert len(rows) == 1
    assert np.frombuffer(rows[0]["partial"], dtype=np.uint8)[0] == 0xFF
    # AQE's toString prints Final and Initial plans; count the final only
    plan = (
        folded._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("MapInPandas") == 3  # 8 -> 4 -> 2 -> by-chunk 1
    with pytest.raises(ValueError):
        bloom_build(keys, "key", n_bits=N_BITS, fold_fanin=1)


def test_map_only_build_no_exchange_before_partials(spark):
    """The default build must NOT shuffle the position stream: partials
    are computed on the key relation's natural partitions, so the only
    Exchanges in the whole build plan are the one-row fold levels ABOVE
    the first MapInPandas (r8: the r7 shape repartitioned n_keys x k
    longs first)."""
    from local_pubchem_db_spark.operators.bloom import _positions

    keys = spark.range(0, 3000, 1, 7).select(F.col("id").alias("key"))
    pos = keys.select(
        F.explode(_positions(F.col("key"), N_BITS, K)).alias("pos")
    )
    plan = pos._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # position stream is map-only
    # end-to-end: natural-partition build == legacy repartitioned build
    assert bloom_build(keys, "key", n_bits=N_BITS, k=K) == bloom_build(
        keys, "key", n_bits=N_BITS, k=K, build_partitions=5
    )


def test_chunked_and_partition_by_chunk_builds_identical(spark):
    """Chunked partial rows (chunk_bytes < n_bytes) and the
    partition-by-chunk shuffle mode must produce byte-identical bitmaps
    to the single-chunk build — and a probe over them sees no false
    negatives."""
    keys = spark.range(0, 4000, 1, 9).select(F.col("id").alias("key"))
    whole = bloom_build(keys, "key", n_bits=N_BITS, k=K)
    chunked = bloom_build(
        keys, "key", n_bits=N_BITS, k=K, chunk_bytes=N_BITS // 8 // 5
    )
    sharded = bloom_build(
        keys,
        "key",
        n_bits=N_BITS,
        k=K,
        chunk_bytes=N_BITS // 8 // 5,
        partition_by_chunk=True,
    )
    assert whole == chunked == sharded
    probe = spark.range(0, 4000).select(F.col("id").alias("key"))
    got = {
        r["key"]
        for r in probe.filter(
            bloom_contains(probe, "key", sharded, k=K)
        ).collect()
    }
    assert got == set(range(4000))


def test_bloom_contains_accepts_broadcast_handle(spark):
    """Repeated probes must be able to share ONE broadcast (the r6 shape
    re-broadcast the bitmap every call and never unpersisted)."""
    from local_pubchem_db_spark.operators.bloom import bloom_broadcast

    members = spark.range(0, 100).select(F.col("id").alias("key"))
    bitmap = bloom_build(members, "key", n_bits=1 << 12, k=4)
    probe = spark.range(0, 200).select(F.col("id").alias("key"))
    bc = bloom_broadcast(probe, bitmap)
    try:
        got1 = {
            r["key"]
            for r in probe.filter(bloom_contains(probe, "key", bc, k=4)).collect()
        }
        got2 = {
            r["key"]
            for r in probe.filter(bloom_contains(probe, "key", bc, k=4)).collect()
        }
        assert set(range(100)) <= got1 and got1 == got2
    finally:
        bc.unpersist()


def test_build_validates_args(spark):
    keys = spark.range(10).select(F.col("id").alias("key"))
    with pytest.raises(ValueError):
        bloom_build(keys, "key", n_bits=100)  # not a multiple of 8
    with pytest.raises(ValueError):
        bloom_build(keys, "key", k=0)


def test_string_keys_work(spark):
    members = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "key string"
    )
    bitmap = bloom_build(members, "key", n_bits=1 << 12, k=4)
    probe = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",), ("epsilon",)],
        "key string",
    )
    got = {
        r["key"]
        for r in probe.filter(
            bloom_contains(probe, "key", bitmap, k=4)
        ).collect()
    }
    assert {"alpha", "beta", "gamma"} <= got


def test_bloom_decontaminate_superset_of_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    eval_df = docs.filter(F.col("doc_id") % 7 == 0)

    exact_kept = {
        r["doc_id"]
        for r in decontaminate(train, eval_df, "doc_id", "text").collect()
    }
    bloom_kept = {
        r["doc_id"]
        for r in decontaminate_bloom(train, eval_df, "doc_id", "text").collect()
    }
    # false positives only ever drop MORE: bloom keep-set within exact's
    assert bloom_kept <= exact_kept
    # and at default sizing (2 MiB bitmap vs a few thousand fps) the
    # FPR is ~0: the two must agree exactly on this corpus
    assert bloom_kept == exact_kept
    all_train = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert exact_kept < all_train, "fixture lost its planted contamination"
