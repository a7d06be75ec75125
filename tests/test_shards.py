"""Training-shard sink: deterministic membership, one file per shard,
manifest parity, pruned reads."""

import os

from pyspark.sql import functions as F

from local_pubchem_db_spark.sources.shards import (
    read_shard_manifest,
    read_training_shards,
    shard_assignment,
    write_training_shards,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        (F.col("id") * 37 + 11).alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id")).alias("text"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, num_shards=8)

    back = read_training_shards(spark, out)
    assert back.count() == 200
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )

    manifest = {r["shard"]: r["n_rows"] for r in read_shard_manifest(spark, out).collect()}
    actual = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert manifest == actual
    assert sum(manifest.values()) == 200


def test_membership_deterministic_and_one_file_per_shard(spark, tmp_path):
    docs = _docs(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # different input partitioning must not change shard membership
    write_training_shards(docs, a, num_shards=8)
    write_training_shards(docs.repartition(13), b, num_shards=8)
    rows_a = {(r["doc_id"], r["shard"]) for r in read_training_shards(spark, a).collect()}
    rows_b = {(r["doc_id"], r["shard"]) for r in read_training_shards(spark, b).collect()}
    assert rows_a == rows_b

    # membership matches the exposed assignment expression
    expected = {
        (r["doc_id"], r["s"])
        for r in docs.select("doc_id", shard_assignment("doc_id", 8).alias("s")).collect()
    }
    assert rows_a == expected

    # one parquet file per shard dir: the sequential-scan layout
    data_dir = os.path.join(a, "data")
    shard_dirs = [d for d in os.listdir(data_dir) if d.startswith("shard=")]
    assert shard_dirs
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(data_dir, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_pruned_read_touches_selected_shards(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, num_shards=8)
    some = read_training_shards(spark, out, shards=[0, 3])
    got = {r["shard"] for r in some.select("shard").distinct().collect()}
    assert got <= {0, 3}
    # partition pruning reaches the scan: the shard filter appears as a
    # partition filter, not a post-scan filter
    plan = some._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters", 1)[1][:200]


def test_clean_corpus_composes_into_shards(spark, tmp_path, sf_dir):
    # The full export story: documents -> clean_corpus -> shard sink ->
    # pruned read. Chunk rows shard on the document id, so sibling
    # chunks always land in the same shard (locality for packing-aware
    # readers).
    from local_pubchem_db_spark.corpus_pipeline import clean_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    chunks = clean_corpus(
        docs, min_tokens=8, languages=None, min_quality=0,
        chunk_size=16, stride=16,
    )["chunks"]
    out = str(tmp_path / "corpus_shards")
    write_training_shards(chunks, out, num_shards=4)

    back = read_training_shards(spark, out)
    assert back.count() == chunks.count()
    # sibling chunks co-sharded
    spread = (
        back.groupBy("doc_id")
        .agg(F.countDistinct("shard").alias("k"))
        .agg(F.max("k").alias("mx"))
        .first()["mx"]
    )
    assert spread == 1
    spark.catalog.clearCache()


def test_incremental_append_rewrites_only_affected_shards(spark, tmp_path):
    from local_pubchem_db_spark.sources.shards import append_to_training_shards

    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, num_shards=8)
    data_dir = os.path.join(out, "data")

    def snapshot():
        snap = {}
        for d in os.listdir(data_dir):
            if d.startswith("shard="):
                p = os.path.join(data_dir, d)
                snap[d] = sorted(
                    (f, os.path.getsize(os.path.join(p, f)))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return snap

    before = snapshot()

    # batch: one REPLACED id (doc_id 11 == id 0) + two new ids
    batch = spark.createDataFrame(
        [(11, "replaced body"), (100011, "new body a"), (100048, "new body b")],
        "doc_id long, text string",
    )
    affected = append_to_training_shards(batch, out)
    assert affected == sorted(
        r["s"]
        for r in batch.select(shard_assignment("doc_id", 8).alias("s"))
        .distinct()
        .collect()
    )

    after = snapshot()
    # untouched shards: byte-for-byte identical file listings
    for d, files in before.items():
        shard_id = int(d.split("=")[1])
        if shard_id not in affected:
            assert after[d] == files, d

    back = read_training_shards(spark, out)
    assert back.count() == 202  # 200 - 1 replaced + 3 batch rows
    assert back.filter(F.col("doc_id") == 11).first()["text"] == "replaced body"
    assert back.filter(F.col("doc_id") == 100011).count() == 1

    # replay idempotence: re-appending the same batch changes nothing
    append_to_training_shards(batch, out)
    back = read_training_shards(spark, out)  # fresh frame: replay rewrote files
    assert back.count() == 202

    manifest = read_shard_manifest(spark, out)
    counts = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    actual = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == actual
    assert {r["num_shards"] for r in manifest.collect()} == {8}


def test_insert_only_append_leaves_existing_files_untouched(spark, tmp_path):
    from local_pubchem_db_spark.sources.shards import append_to_training_shards

    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, num_shards=4)
    data_dir = os.path.join(out, "data")

    def files_of(shard):
        p = os.path.join(data_dir, f"shard={shard}")
        return sorted(
            (f, os.path.getsize(os.path.join(p, f)))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    # a batch of only NEW ids: every touched shard takes the append fast
    # path — the original file must survive byte-identically with a new
    # file alongside
    batch = spark.createDataFrame(
        [(900001, "fresh a"), (900002, "fresh b"), (900005, "fresh c")],
        "doc_id long, text string",
    )
    shards_hit = {
        r["s"]
        for r in batch.select(shard_assignment("doc_id", 4).alias("s")).collect()
    }
    before = {s: files_of(s) for s in shards_hit}
    append_to_training_shards(batch, out)
    for s in shards_hit:
        after = files_of(s)
        assert set(before[s]) <= set(after), s  # originals untouched
        assert len(after) > len(before[s]), s  # new file appended

    back = read_training_shards(spark, out)
    assert back.count() == 203
    # replay: the inserted ids now exist, so the collision probe routes
    # them through the rewrite path — still idempotent
    append_to_training_shards(batch, out)
    assert read_training_shards(spark, out).count() == 203
    manifest = {r["shard"]: r["n_rows"] for r in read_shard_manifest(spark, out).collect()}
    assert sum(manifest.values()) == 203


def test_append_auto_compacts_at_file_ceiling(spark, tmp_path):
    """10 successive insert-only appends must never leave a shard with
    more than max_files_per_shard files (the append fast path promotes
    at-ceiling shards into the rewrite tier, which compacts), and the
    final row set must be exactly the union of everything appended."""
    from local_pubchem_db_spark.sources.shards import append_to_training_shards

    out = str(tmp_path / "shards")
    base = _docs(spark, 40)
    write_training_shards(base, out, num_shards=4)
    want = {r["doc_id"] for r in base.collect()}

    for i in range(1, 11):
        batch = spark.range(1000 * i, 1000 * i + 25).select(
            (F.col("id") * 37 + 11).alias("doc_id"),
            F.concat(F.lit("batch "), F.col("id")).alias("text"),
        )
        append_to_training_shards(batch, out, max_files_per_shard=8)
        want |= {r["doc_id"] for r in batch.collect()}

    data_dir = os.path.join(out, "data")
    for d in sorted(os.listdir(data_dir)):
        if not d.startswith("shard="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(data_dir, d))
            if f.endswith(".parquet")
        ]
        assert len(files) <= 8, (d, len(files))

    back = read_training_shards(spark, out)
    assert {r["doc_id"] for r in back.collect()} == want

    # The manifest's n_files mirrors the on-disk state per shard.
    manifest = {
        r["shard"]: (r["n_rows"], r["n_files"])
        for r in read_shard_manifest(spark, out).collect()
    }
    actual_rows = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for shard, (n_rows, n_files) in manifest.items():
        assert n_rows == actual_rows[shard]
        on_disk = len(
            [
                f
                for f in os.listdir(os.path.join(data_dir, f"shard={shard}"))
                if f.endswith(".parquet")
            ]
        )
        assert n_files == on_disk, (shard, n_files, on_disk)
