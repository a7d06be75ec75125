"""Shared physical-layout helpers for CPU-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition UP to the cluster's parallelism when the input has fewer
    partitions — and only then.

    CPU-heavy per-row work (shingling, hashing, vector math) is gated by
    the scan's partition count: one small parquet file = one task = one
    core, regardless of cluster size. A 100 TB input already has thousands
    of splits, so this is a no-op there; for few-file inputs it buys full
    parallelism for the price of shuffling the (small) input once.

    Uses an explicit-N round-robin repartition: AQE does not coalesce
    user-specified REPARTITION_BY_NUM shuffles, so the fan-out survives
    adaptive re-planning.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def shared(df: DataFrame) -> DataFrame:
    """Persist a relation that the surrounding plan references multiple
    times (e.g. a shingle set used by both LSH bucketing and exact-Jaccard
    verification). Without this, each subtree recomputes the full lineage.
    MEMORY_AND_DISK: spills instead of OOM-ing when the relation is large.

    Lifetime contract: the cache lives until the session ends or the
    caller releases it. Operators return lazy DataFrames, so they cannot
    unpersist eagerly themselves (the cache must outlive the caller's
    action). Long-lived sessions running many dedup/similarity operator
    invocations should call ``release_shared_caches(spark)`` (or
    ``spark.catalog.clearCache()``) between invocations — bench.py does.
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def release_shared_caches(spark) -> None:
    """Drop every cached relation in the session — the release half of
    ``shared()``'s contract for long-lived sessions. Storage-only: does
    not touch persisted tables or checkpoints."""
    spark.catalog.clearCache()
