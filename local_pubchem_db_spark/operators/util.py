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
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK)
