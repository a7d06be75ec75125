"""Top-k operators.

Global top-k (orderBy + limit) plans as TakeOrderedAndProject — per
partition heaps + a driver merge, no full sort, no shuffle of the full
data. Per-group top-k uses a ranked window; Spark 3.5+ pushes the rank
filter into the shuffle as a group-limit, so only k rows per group per
partition survive the exchange. ``misra_gries_topk`` is the sketch tier:
heavy hitters from bounded per-partition state when the domain is too
large to exact-count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """k best rows per group. ``order_cols`` must impose a total order
    (include a unique tiebreaker) for deterministic results."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def distributed_rank(
    df: DataFrame,
    order_cols: list[Column],
    range_col: str,
    rank_col: str = "rank",
    num_buckets: int = 64,
    total_col: str | None = None,
) -> DataFrame:
    """Exact global 1-based row_number over ``order_cols`` WITHOUT the
    single-partition sort a bare ``Window.orderBy`` plans.

    Range-bucket on ``range_col`` via loose ``approxQuantile`` boundaries
    (any boundaries are correct — they only bound per-task sort size; ties
    on ``range_col`` share a bucket so concatenated bucket-local order IS
    the global order), then ONE query: per-bucket ``row_number`` (parallel
    window, one hash shuffle of the data) joined with a broadcast subplan
    that computes per-bucket counts, their prefix-sum offsets, and the
    grand total — a <= ``num_buckets``-row aggregate over a column-pruned
    scan of ``range_col`` alone. Nothing is collected to the driver and no
    separate counts job runs (the lone Exchange SinglePartition in the
    plan carries the <= ``num_buckets`` aggregated rows, never the data).

    ``order_cols`` must start with ``range_col`` and include a unique
    tiebreaker. Pass ``total_col`` to keep the total row count as a
    column (lets callers do follow-up arithmetic, e.g. ntile, without
    another action)."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    # loose accuracy on purpose: boundaries only balance bucket sizes, the
    # rank arithmetic is exact regardless; 0.02 runs ~4x faster than the
    # GK sketch at 0.001 with worst-case bucket imbalance of a few percent
    cuts = sorted(set(df.approxQuantile(range_col, probs, 0.02)))

    bucket = F.lit(0)
    for i, c in enumerate(cuts):
        bucket = F.when(F.col(range_col) > F.lit(c), i + 1).otherwise(bucket)
    b = df.withColumn("__bucket", bucket)

    # per-bucket counts -> prefix-sum offsets (+ total), all inside the
    # query as a broadcast subplan: the windows below run over the tiny
    # AGGREGATED relation (<= num_buckets rows), not the data
    w_prev = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = (
        b.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__n").over(w_prev), F.lit(0)).alias("__offset"),
            F.sum("__n").over(w_all).alias("__total"),
        )
    )

    w = Window.partitionBy("__bucket").orderBy(*order_cols)
    ranked = (
        b.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off), "__bucket")
        .withColumn(rank_col, F.col("__offset") + F.col("__rn"))
    )
    if total_col is not None:
        ranked = ranked.withColumnRenamed("__total", total_col)
        return ranked.drop("__bucket", "__rn", "__offset")
    return ranked.drop("__bucket", "__rn", "__offset", "__total")


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[Column],
    range_col: str,
    tile_col: str = "tile",
    num_buckets: int = 64,
) -> DataFrame:
    """Global ``ntile(n)`` without a single-partition sort.

    ``Window.orderBy`` with no ``partitionBy`` funnels the ENTIRE input
    through one task — correct at test scale, a scale-killer at 100 TB.
    This computes the identical assignment in three distributed steps:

    1. Range-bucket on ``range_col`` using ``approxQuantile`` boundaries
       (any boundaries are CORRECT — they only bound per-task sort size;
       the quantile sketch just keeps buckets balanced under skew).
       Rows tying on ``range_col`` share a bucket, so bucket-local order
       by ``order_cols`` concatenated across buckets IS the global order.
    2. Per-bucket ``row_number`` (parallel window, one hash shuffle) plus
       a broadcast join of per-bucket rank offsets (a <= ``num_buckets``
       row aggregate computed as a subplan of the same query — nothing
       is collected to the driver) gives each row its exact global rank.
    3. Spark's ntile arithmetic on (rank, N): the first N mod n tiles
       hold ceil(N/n) rows, the rest floor(N/n).

    ``order_cols`` must start with ``range_col`` and impose a total order
    (unique tiebreaker) for deterministic output. For >>64-way skew,
    raise ``num_buckets`` (the boundary CASE-chain stays codegen-friendly
    to a few hundred)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ranked = distributed_rank(
        df, order_cols, range_col, rank_col="__rank",
        num_buckets=num_buckets, total_col="__nrows",
    )
    # Column arithmetic on (rank, total): no action, no driver round-trip.
    # Double division then truncation == floor here (operands positive and
    # < 2^53 — a row count past that exceeds any real table).
    total = F.col("__nrows")
    big = total % n
    size = F.floor(total / n).cast("long")  # 0 only when total < n; then
    threshold = big * (size + 1)  # no row reaches the else branch below
    tile = F.when(
        F.col("__rank") <= threshold,
        ((F.col("__rank") - 1) / (size + 1)).cast("long") + 1,
    ).otherwise(
        ((F.col("__rank") - threshold - 1) / F.greatest(size, F.lit(1))).cast(
            "long"
        )
        + big
        + 1
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop(
        "__rank", "__nrows"
    )


def misra_gries_topk(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    capacity: int = 1024,
) -> DataFrame:
    """Approximate heavy hitters: top ``k`` items by estimated frequency
    from a Misra-Gries summary of ``capacity`` counters per partition.

    Returns (item, est_count) with the classic guarantees, which hold
    under merging per-partition summaries by summation:

    - est_count <= true_count (MG only undercounts), and
    - true_count - est_count <= n / (capacity + 1) summed over
      partitions' local n — so any item with true frequency above
      n / (capacity + 1) is GUARANTEED to surface.

    Scale shape: the data is never shuffled — each task compresses its
    partition to <= ``capacity`` (item, count) rows in one pass of plain
    dict arithmetic (per-batch ``value_counts`` does the heavy lifting
    vectorized), and only the tiny summaries shuffle into the merge
    (map-side combinable sum) and a TakeOrdered top-k. Exact counting
    (token_topk) shuffles one row per DISTINCT item; this caps executor
    memory and shuffle volume at ``capacity`` rows per task regardless
    of domain size — the operator for quadrillion-item domains.
    """
    if k <= 0 or capacity < k:
        raise ValueError(f"need capacity >= k >= 1, got k={k}, capacity={capacity}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters = _mg_ingest(
                counters, pdf.iloc[:, 0].value_counts(), capacity
            )
        yield pd.DataFrame(
            {"item": list(counters), "est_count": list(counters.values())}
        )

    summaries = df.select(F.col(item_col).cast("string")).mapInPandas(
        summarize, "item string, est_count long"
    )
    return (
        summaries.groupBy("item")
        .agg(F.sum("est_count").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("item").asc())
        .limit(k)
    )


def _mg_ingest(counters: dict, value_counts, capacity: int) -> dict:
    """Fold one batch's ``value_counts`` series into a Misra-Gries
    summary of at most ``capacity`` counters; returns the (possibly
    rebuilt) dict. Vectorized arrival (whole-batch counts, not row by
    row) keeps the eviction loop rare."""
    for item, cnt in value_counts.items():
        if item is None:
            continue
        if item in counters:
            counters[item] += int(cnt)
        elif len(counters) < capacity:
            counters[item] = int(cnt)
        else:
            # decrement-all by the smallest deficit that evicts at least
            # one counter
            dec = min(int(cnt), min(counters.values()))
            counters = {i: c - dec for i, c in counters.items() if c > dec}
            rem = int(cnt) - dec
            if rem > 0 and len(counters) < capacity:
                counters[item] = rem
    return counters


def misra_gries_summaries(
    df: DataFrame,
    item_cols: list[str],
    capacity: int = 1024,
) -> DataFrame:
    """(column, item, est_count): merged Misra-Gries summaries for ALL
    of ``item_cols`` from ONE pass over the data.

    Each task maintains one ``capacity``-bounded counter dict per column
    inside a single ``mapInPandas``, so k candidate columns cost one
    scan, not k — at the 100 TB scale a pre-flight diagnostic targets,
    scan count IS the cost. Only the <= capacity × k summary rows per
    task shuffle into the merge (map-side combinable sum)."""
    if not item_cols:
        raise ValueError("item_cols must be non-empty")
    if len(set(item_cols)) != len(item_cols):
        raise ValueError(f"duplicate columns in item_cols: {item_cols}")
    if capacity < 1:
        raise ValueError(f"need capacity >= 1, got {capacity}")
    aliases = [f"__c{i}" for i in range(len(item_cols))]
    proj = df.select(
        *[F.col(c).cast("string").alias(a) for c, a in zip(item_cols, aliases)]
    )
    names = list(item_cols)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: list[dict] = [{} for _ in names]
        for pdf in batches:
            for j, a in enumerate(aliases):
                counters[j] = _mg_ingest(
                    counters[j], pdf[a].value_counts(), capacity
                )
        yield pd.DataFrame(
            {
                "column": [n for j, n in enumerate(names) for _ in counters[j]],
                "item": [i for ctr in counters for i in ctr],
                "est_count": [c for ctr in counters for c in ctr.values()],
            }
        )

    summaries = proj.mapInPandas(
        summarize, "column string, item string, est_count long"
    )
    return summaries.groupBy("column", "item").agg(
        F.sum("est_count").alias("est_count")
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    k: int = 10,
    capacity: int = 1024,
) -> DataFrame:
    """(column, key, est_count, est_share): the heaviest keys of each
    candidate join/groupBy column in ONE pass per column with no data
    shuffle — the pre-flight check before keying a 100 TB shuffle.
    ``est_share`` is the key's estimated fraction of all rows: a key
    near 1/shuffle-partitions or above means one reducer will carry it —
    salt it (``salted_group_count``), broadcast the other side, or let
    AQE's skew-join split it.

    Uses the merged Misra-Gries summaries of ``misra_gries_summaries``,
    so counts only undercount (never inflate a skew alarm) and any key
    above n/(capacity+1) is guaranteed to appear. NULL keys — the most
    common real-world hot key, since they form ONE group under
    groupBy/join — are counted EXACTLY (one agg alongside the row
    count) and reported as a ``<null>`` row per column. Cost: ONE MG
    pass for ALL columns (k counter dicts in a single mapInPandas —
    r6's per-column loop scanned the table k times) plus one counting
    pass; the per-column top-k runs over the tiny merged summaries.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if k <= 0 or capacity < k:
        raise ValueError(
            f"need capacity >= k >= 1, got k={k}, capacity={capacity}"
        )
    counts = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{i}")
            for i, c in enumerate(key_cols)
        ],
    ).first()
    n = counts["__n"]
    spark = df.sparkSession
    w = Window.partitionBy("column").orderBy(
        F.col("est_count").desc(), F.col("item").asc()
    )
    top = (
        misra_gries_summaries(df, key_cols, capacity=capacity)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select(
            "column",
            F.col("item").cast("string").alias("key"),
            F.col("est_count"),
            (F.col("est_count") / F.lit(float(max(n, 1)))).alias("est_share"),
        )
    )
    null_rows = [
        (c, "<null>", counts[f"__nulls_{i}"], counts[f"__nulls_{i}"] / max(n, 1))
        for i, c in enumerate(key_cols)
        if counts[f"__nulls_{i}"]
    ]
    if null_rows:
        from local_pubchem_db_spark.operators.util import driver_rows_df

        top = top.unionByName(
            driver_rows_df(
                spark,
                null_rows,
                "column string, key string, est_count long, est_share double",
            )
        )
    return top
