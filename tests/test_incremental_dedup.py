"""Incremental dedup: a batch vs a persisted LSH history index."""

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.dedup import (
    incremental_minhash_new_ids,
    lsh_bucket_index,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely different content about spark shuffles and parquet row groups"


def test_incremental_dedup(spark, tmp_path):
    history = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    idx_path = str(tmp_path / "lsh_index")
    lsh_bucket_index(history, "doc_id", "text").write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    batch = spark.createDataFrame(
        [
            (10, BASE),  # exact dup of history -> dropped
            (11, "fresh unseen sentence with tokens nobody wrote before now ok"),
            (12, "fresh unseen sentence with tokens nobody wrote before now ok"),
            # 11/12 duplicate each other -> keep lowest id only
            (13, "another novel document mentioning broadcast joins and codegen"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_minhash_new_ids(batch, idx, "doc_id", "text").collect()
    )
    assert got == [11, 13]


def test_short_docs_are_kept(spark, tmp_path):
    # A doc with fewer than shingle_len tokens produces no shingles,
    # collides with nothing, and by the module contract must be KEPT —
    # deriving the id universe from the shingled relation used to drop it.
    history = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    idx_path = str(tmp_path / "lsh_index")
    lsh_bucket_index(history, "doc_id", "text").write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    batch = spark.createDataFrame(
        [(20, "hi"), (21, "two words"), (22, BASE), (23, "")],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_minhash_new_ids(batch, idx, "doc_id", "text").collect()
    )
    assert got == [20, 21, 23]  # 22 is a history dup; the short docs stay


def test_index_shape(spark):
    history = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    idx = lsh_bucket_index(history, "doc_id", "text", bands=32)
    rows = idx.collect()
    assert len(rows) == 32  # one bucket per band per doc
    assert {r["band"] for r in rows} == set(range(32))


def test_incremental_quality_mode_keeps_best_not_lowest(spark):
    """quality_col re-ranks only the batch-internal survivor; the id
    universe (short docs kept, history hits dropped) is unchanged."""
    from local_pubchem_db_spark.operators.dedup import (
        incremental_minhash_new_ids,
    )

    text = " ".join(f"w{i} alpha beta" for i in range(40))
    batch = spark.createDataFrame(
        [
            (1, text, 0.2),
            (2, text, 0.8),  # near-dup of 1, better quality
            (3, "tiny", 0.9),  # too short to shingle: always kept
        ],
        "doc_id long, text string, q double",
    )
    ids_default = {
        r["doc_id"]
        for r in incremental_minhash_new_ids(
            batch, [], "doc_id", "text"
        ).collect()
    }
    assert ids_default == {1, 3}
    ids_quality = {
        r["doc_id"]
        for r in incremental_minhash_new_ids(
            batch, [], "doc_id", "text", quality_col="q"
        ).collect()
    }
    assert ids_quality == {2, 3}


def test_incremental_collapse_exact_keepset_identical(spark, sf_dir):
    """Flood batch (3-way exact replicas) against a history index: the
    collapsed path must return the identical keep-set as the direct
    path, in both id mode and quality mode."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.dedup import (
        incremental_minhash_new_ids,
        lsh_bucket_index,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(30)
    )
    history_docs = docs.limit(10)
    history = lsh_bucket_index(history_docs, "doc_id", "text")
    hist_max = history_docs.agg(F.max("doc_id")).first()[0]
    batch_base = docs.filter(F.col("doc_id") > hist_max).withColumn(
        "q", (F.col("doc_id") % 7).cast("double")
    )
    batch = batch_base
    for rep in (1, 2):
        batch = batch.unionByName(
            batch_base.select(
                (F.col("doc_id") + 100000 * rep).alias("doc_id"),
                "text",
                (F.col("q") + rep).alias("q"),
            )
        )

    def keep(collapse, quality=None):
        return {
            r["doc_id"]
            for r in incremental_minhash_new_ids(
                batch, [history], "doc_id", "text",
                quality_col=quality, collapse_exact=collapse,
            ).collect()
        }

    assert keep(True) == keep(False)
    assert keep(True, "q") == keep(False, "q")
    # the flood collapses: at most one survivor per 3-way replica group
    kept = keep(True)
    assert kept and all(k > hist_max for k in kept)
    base_ids = {r["doc_id"] for r in batch_base.collect()}
    assert len(kept) <= len(base_ids)
    # quality mode must prefer the rep+2 copies (highest q per group)
    kept_q = keep(True, "q")
    assert any(k > 200000 for k in kept_q)


def test_index_build_fused_one_crossing_and_bit_identical(spark):
    """r15 (VERDICT r14 What's-missing #1): lsh_bucket_index must cross
    into Python exactly ONCE (the fused text->bands UDF) and emit the
    bit-identical row set of the pre-r15 two-stage shingle+band plan —
    persisted history indexes stay valid across the upgrade."""
    from local_pubchem_db_spark.operators import dedup as D

    long_a = " ".join(f"alpha{i} beta gamma delta" for i in range(40))
    docs = spark.createDataFrame(
        [(i, long_a + f" tail{i}") for i in range(12)]
        + [(50, "short"), (51, None)],  # short + null: no bucket rows
        "doc_id long, text string",
    )
    fused = D.lsh_bucket_index(docs, "doc_id", "text")
    two_stage = D._minhash_buckets(
        D._with_shingles(docs, "doc_id", "text", 3), 128, 32
    )
    assert fused.exceptAll(two_stage).isEmpty()
    assert two_stage.exceptAll(fused).isEmpty()
    assert fused.filter(F.col("id").isin(50, 51)).count() == 0

    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan, plan
