"""Training-shard sink: deterministic content-keyed sharding + manifest.

The export counterpart of the corpus readers (``sources/corpus.py``):
after cleaning/dedup/packing, a training corpus ships as N addressable
shards plus a manifest — the same bookkeeping contract as the
reference's ``sdf_file`` manifest table (reference utils.py:222-227,
327-332), generalized from "which input files are ingested" to "which
output shards exist and what they contain".

Why CONTENT-keyed (``shard = pmod(xxhash64(id), n)``) rather than
whatever partitioning the upstream plan happens to have:

- membership is a pure function of the id — stable across cluster
  sizes, partition counts, AQE decisions, and reruns, so two builds of
  the same corpus produce byte-comparable shard membership;
- incremental rebuilds touch only the shards whose documents changed;
- training jobs can address/sample shards stably (shard k is the same
  document population every run).

Scale shape: one hash repartition on the shard key, one writer task per
shard (each shard = one parquet file + its dictionary/stats), manifest
derived map-side from the same frame. At 100 TB pick num_shards so each
shard lands in the 0.5-2 GB range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_assignment(id_col: str, num_shards: int):
    """The shard key expression: ``pmod(xxhash64(id), num_shards)``.

    Exposed so readers/rebuilders can recompute membership without
    consulting any stored state — the assignment IS the contract.
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_shards: int = 64,
) -> None:
    """Write ``df`` as ``path/data/shard=K/*.parquet`` (one file per
    shard) plus ``path/_shard_manifest`` (shard, n_rows) parquet.

    The repartition puts each shard's rows in exactly one task, so every
    shard is one contiguous parquet file — the layout a training reader
    wants (sequential scans, no tiny files). The manifest is counted
    from a POST-write read of the data dir, not from ``df``'s lineage:
    counting the input frame would execute the whole upstream pipeline
    (cleaning/dedup, not just a parquet scan) a second time, and the
    read-back also makes the manifest the truth of what is on disk.
    Data first, manifest last — a crash between the two leaves a
    readable data dir and a stale manifest, which readers treat as
    advisory.
    """
    spark = df.sparkSession
    sharded = df.withColumn("shard", shard_assignment(id_col, num_shards))
    (
        sharded.repartition(num_shards, "shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(f"{path}/data")
    )
    spark.catalog.refreshByPath(f"{path}/data")
    (
        _shard_counts(read_training_shards(spark, path))
        .withColumn("num_shards", F.lit(num_shards))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_shard_manifest")
    )
    spark.catalog.refreshByPath(f"{path}/_shard_manifest")


def _shard_counts(df: DataFrame) -> DataFrame:
    """Per-shard (n_rows, n_files) counted from the files actually being
    scanned — ``input_file_name`` makes the file count part of the same
    single pass as the row count, engine-side and FS-agnostic."""
    # input_file_name() is nondeterministic to the analyzer and may not
    # sit directly inside an aggregate — project it first.
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("__file")).alias("n_files"),
        )
    )


def append_to_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    max_files_per_shard: int = 8,
) -> list[int]:
    """Incremental upsert into an existing shard layout: ONLY the shards
    that receive rows are rewritten; every other shard's files are left
    byte-for-byte untouched. Returns the affected shard ids.

    This is the output-side mirror of the reference's incremental ingest
    (manifest anti-join + per-file txn, reference utils.py:272-282,322):
    membership is recomputed from the id (``shard_assignment``, with
    ``num_shards`` read from the manifest, never guessed), rows whose id
    reappears in the batch REPLACE the stored rows (so replaying a batch
    is idempotent — the exactly-once property the rest of this repo's
    ingest paths keep), and rewrites use dynamic partition overwrite so
    untouched partitions are never listed, rewritten, or dropped.

    Scale shape — two tiers, because content-hash sharding SCATTERS a
    random batch across ~min(|batch|, num_shards) shards and a naive
    "rewrite every shard the batch touches" would approach a full
    corpus rewrite for any batch larger than num_shards:

    - shards where the batch only INSERTS (no stored id reappears):
      the new rows are appended as additional parquet files — existing
      data is never read or rewritten; cost = the batch itself.
    - shards where the batch REPLACES stored ids: full partition
      rewrite (replace cannot be expressed as an append); cost = those
      shards' data.

    Compaction is automatic, not a separate maintenance cadence: an
    insert-only shard already holding ``max_files_per_shard - 1`` files
    (counted on disk, not trusted from the manifest) is promoted into
    the rewrite tier for THIS append, folding its accumulated small
    files plus the new rows into one file — so an unattended ingest
    loop keeps every shard at <= ``max_files_per_shard`` files and read
    performance never degrades silently. The manifest records per-shard
    ``n_files`` so the file-count state is observable.

    Concurrency contract: SINGLE WRITER per shard layout. Two
    concurrent appenders race on dynamic-overwrite of the same shard
    partitions and on the one ``_shard_manifest`` file (last writer
    wins; counts diverge from data). Serialize appends per ``path`` —
    the same isolation q_incremental_dedup gets from per-applicationId
    state dirs. A crash between the rewrite and the insert-append
    leaves a partially applied batch; replaying the SAME batch heals it
    (the upsert is idempotent).
    """
    spark = df.sparkSession
    meta = read_shard_manifest(spark, path).select("num_shards").first()
    num_shards = int(meta["num_shards"])
    # Materialize the batch once: its lineage is otherwise executed
    # several times (shard-distinct collect, collision probe, writes).
    # Batches are small by the incremental contract.
    new = df.withColumn(
        "shard", shard_assignment(id_col, num_shards)
    ).localCheckpoint()
    affected = sorted(
        r["shard"] for r in new.select("shard").distinct().collect()
    )
    if not affected:
        return []
    existing = read_training_shards(spark, path, shards=affected)
    # Which shards actually contain a replaced id? Only those need the
    # expensive rewrite; pure-insert shards take the append fast path.
    replaced = {
        r["shard"]
        for r in existing.join(
            new.select(id_col).distinct(), id_col, "left_semi"
        )
        .select("shard")
        .distinct()
        .collect()
    }
    # Promote insert-only shards at the file-count ceiling into the
    # rewrite tier: the rewrite IS the compaction (one task per shard →
    # one file), so the append fast path can never accumulate more than
    # max_files_per_shard files. Counts come from the files on disk
    # (same pass layout as the manifest), never from a possibly-stale
    # manifest.
    on_disk_files = {
        r["shard"]: r["n_files"] for r in _shard_counts(existing).collect()
    }
    rewrite = sorted(
        replaced
        | {
            s
            for s in affected
            if s not in replaced
            and on_disk_files.get(s, 0) + 1 > max_files_per_shard
        }
    )
    insert_only = new.filter(~F.col("shard").isin(rewrite)) if rewrite else new
    if rewrite:
        survivors = read_training_shards(spark, path, shards=rewrite).join(
            new.select(id_col).distinct(), id_col, "left_anti"
        )
        merged = survivors.unionByName(
            new.filter(F.col("shard").isin(rewrite)).select(*survivors.columns)
        )
        (
            merged.repartition(len(rewrite), "shard")
            .write.partitionBy("shard")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{path}/data")
        )
    (
        insert_only.repartition(max(len(affected) - len(rewrite), 1), "shard")
        .write.partitionBy("shard")
        .mode("append")
        .parquet(f"{path}/data")
    )
    # Invalidate the cached file listing: the session's FileStatusCache
    # still holds the pre-write file set for this path, and a fresh
    # DataFrame would otherwise try to scan replaced files.
    spark.catalog.refreshByPath(f"{path}/data")
    # Post-write counts come from the files actually on disk (a fresh
    # read, since `merged`'s lineage points at the pre-overwrite files
    # the rewrite just replaced); the surviving manifest rows are
    # localCheckpoint-materialized before their own file is overwritten.
    new_counts = _shard_counts(read_training_shards(spark, path, shards=affected))
    prior = read_shard_manifest(spark, path)
    if "n_files" not in prior.columns:  # manifest written before n_files
        prior = prior.withColumn("n_files", F.lit(None).cast("long"))
    manifest = (
        prior.filter(~F.col("shard").isin(affected))
        .select("shard", "n_rows", "n_files")
        .localCheckpoint()
        .unionByName(new_counts)
        .withColumn("num_shards", F.lit(num_shards))
    )
    manifest.localCheckpoint().coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_shard_manifest"
    )
    spark.catalog.refreshByPath(f"{path}/_shard_manifest")
    return affected


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read back a sharded corpus; ``shards`` prunes to the named shard
    partitions (partition pruning — the unread shards' files are never
    opened, the point of stable shard addressing)."""
    df = spark.read.parquet(f"{path}/data")
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def read_shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/_shard_manifest")
