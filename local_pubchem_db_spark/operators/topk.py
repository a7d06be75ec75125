"""Top-k operators.

Global top-k (orderBy + limit) plans as TakeOrderedAndProject — per
partition heaps + a driver merge, no full sort, no shuffle of the full
data. Per-group top-k uses a ranked window; Spark 3.5+ pushes the rank
filter into the shuffle as a group-limit, so only k rows per group per
partition survive the exchange.
"""

from __future__ import annotations

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
