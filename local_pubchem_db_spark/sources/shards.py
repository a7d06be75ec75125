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
    wants (sequential scans, no tiny files). The manifest is computed
    from the same frame in the same job lineage; a rewrite overwrites
    both atomically enough for the batch contract (data first, manifest
    last — a crash between the two leaves a readable data dir and a
    stale manifest, which ``read_training_shards`` treats as advisory).
    """
    sharded = df.withColumn("shard", shard_assignment(id_col, num_shards))
    (
        sharded.repartition(num_shards, "shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(f"{path}/data")
    )
    (
        sharded.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_shard_manifest")
    )


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
