"""Shared physical-layout helpers for CPU-heavy operators."""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# plans (by semanticHash) this module eagerly filled, per session — the
# gate that lets shared() skip its count ONLY for its own prior fills.
# A hash collision is possible (32-bit) but requires the colliding plan
# to ALSO be cache-resident, and the consequence is perf-only (a
# skipped count = the pre-r8 fill race), never wrong data.
_EAGER_FILLED: WeakKeyDictionary = WeakKeyDictionary()

# every session-keyed memo that must die with the caches: operators
# register theirs here so release_shared_caches() is the ONE release
# point for all derived warm-path state.
_SESSION_MEMOS: list = [_EAGER_FILLED]


def register_session_memo(memo) -> None:
    """Register a WeakKeyDictionary keyed by SparkSession to be dropped
    by ``release_shared_caches`` alongside the cache itself."""
    _SESSION_MEMOS.append(memo)


def fan_out(
    df: DataFrame,
    target: int | None = None,
    min_bytes_per_task: int | None = None,
) -> DataFrame:
    """Repartition UP to the cluster's parallelism when the input has fewer
    partitions — and only then.

    CPU-heavy per-row work (shingling, hashing, vector math) is gated by
    the scan's partition count: one small parquet file = one task = one
    core, regardless of cluster size. A 100 TB input already has thousands
    of splits, so this is a no-op there; for few-file inputs it buys full
    parallelism for the price of shuffling the (small) input once. Spark
    sizes scans by COMPRESSED bytes, so a highly compressible text corpus
    (25:1 on the replicated scale floods) under-splits long before the
    decompressed CPU work stops mattering — measured at sf30, the
    map-only retrieval query ran 100+ s on a 4-split scan and ~7 s fanned.

    ``min_bytes_per_task``: optional size gate for call sites where the
    input may be SMALL enough that 2-stage scheduling overhead exceeds
    the parallelism win (~0.2 s per query on a 32-core local session) —
    skip the fan-out when the plan-stats estimate gives each new task
    less than this many (compressed) bytes. Sites whose downstream cost
    is superlinear in per-task input (the LSH/shingle pipelines) should
    NOT gate: they were tuned with the unconditional rebalance.

    Uses an explicit-N round-robin repartition: AQE does not coalesce
    user-specified REPARTITION_BY_NUM shuffles, so the fan-out survives
    adaptive re-planning.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if min_bytes_per_task is not None:
        try:
            raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            # py4j hands scala.math.BigInt back as a Python int when it
            # fits; older bridges return a JavaObject needing toString().
            size = raw if isinstance(raw, int) else int(raw.toString())
        except Exception:  # noqa: BLE001 — stats probe; fan out on doubt
            size = None
        if size is not None and size < min_bytes_per_task * target:
            return df
    return df.repartition(target)


def shared(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist a relation that the surrounding plan references multiple
    times (e.g. a shingle set used by both LSH bucketing and exact-Jaccard
    verification). Without this, each subtree recomputes the full lineage.
    MEMORY_AND_DISK: spills instead of OOM-ing when the relation is large.

    ``eager`` (default) fills the cache with one count() job up front:
    ``persist`` alone does NOT stop sibling subtrees of ONE action racing
    to compute the same partitions — measured on the LSH pipeline, the
    race recomputes the shingle UDF up to 3x on first run (4.0s vs 2.4s
    at sf0.1; at 100 TB that is three full passes vs one). The cost is
    one serial pass and that query construction triggers a job; pass
    eager=False to keep construction lazy.

    Lifetime contract: the cache lives until the session ends or the
    caller releases it. Operators return lazy DataFrames, so they cannot
    unpersist eagerly themselves (the cache must outlive the caller's
    action). Long-lived sessions running many dedup/similarity operator
    invocations should call ``release_shared_caches(spark)`` (or
    ``spark.catalog.clearCache()``) between invocations — bench.py does.

    Warm-service re-invocations: the eager count is skipped only when
    THIS function already eagerly filled the identical plan in this
    session (tracked by ``semanticHash``) AND the CacheManager still
    holds it — then the fill race the count exists to prevent cannot
    recur (our entries are MEMORY_AND_DISK: they spill rather than
    evict, so a prior fill stays filled). A cache entry someone ELSE
    created (``shared(eager=False)``, a caller's own ``persist()`` at
    any storage level) is NOT proof of a fill, so it does not skip the
    count — the hash gate is what keeps the lazy path honest.
    """
    session_filled = _EAGER_FILLED.setdefault(df.sparkSession, set())
    h = df.semanticHash() if eager else None
    if eager and h in session_filled and _already_cached(df):
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
        session_filled.add(h)
    return out


def _already_cached(df: DataFrame) -> bool:
    """True if the plan has a CacheManager entry (canonical-plan match)."""
    try:
        jspark = df.sparkSession._jsparkSession
        return (
            jspark.sharedState()
            .cacheManager()
            .lookupCachedData(df._jdf)
            .isDefined()
        )
    except Exception:  # noqa: BLE001 — internal API probe, fail open
        return False


def release_shared_caches(spark) -> None:
    """Drop every cached relation in the session — the release half of
    ``shared()``'s contract for long-lived sessions. Storage-only: does
    not touch persisted tables or checkpoints. Also forgets the
    eager-fill ledger (the cache presence check would invalidate the
    skip anyway; dropping the set keeps it from growing unboundedly)."""
    spark.catalog.clearCache()
    for memo in _SESSION_MEMOS:
        memo.pop(spark, None)

