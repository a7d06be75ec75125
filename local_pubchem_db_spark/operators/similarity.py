"""Similarity search over an embedding column (array<float>).

Two tiers, per the scale plan:

- ``brute_force_knn``: exact top-k for a (small) query set — the query
  side is broadcast, the corpus is scanned once, scoring is a JVM
  higher-order-function dot product, and per-query top-k is a window
  ranked by (score desc, id asc). Linear in corpus size; the correctness
  baseline.
- ``ivf_within_partition_pairs``: IVF-style search — vectors carry a
  coarse partition id (cluster/label); candidate generation only compares
  vectors within the same partition, turning the O(n^2) all-pairs problem
  into sum of per-partition squares. With balanced partitions this is the
  100 TB shape: the self-join shuffles on the partition key once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from local_pubchem_db_spark.functions.vectors import cosine_similarity
from local_pubchem_db_spark.operators.util import fan_out, shared


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, rank). Self-matches are excluded; ties
    break on neighbor id ascending, so results are fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # fan_out: the dot-product scan is CPU-bound; a single-file corpus
    # would otherwise score on one core.
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_within_partition_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """IVF-bucketed near-neighbor pairs: (id1 < id2) within the same coarse
    partition with cosine >= threshold.

    Returns (id1, id2, partition). The equi-join on the partition key
    co-locates each bucket on one executor — per-bucket work is quadratic
    only in bucket size.
    """
    base = shared(
        fan_out(
            df.select(
                F.col(partition_col).alias("part"),
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
            )
        )
    )
    a = base.select("part", F.col("id").alias("id1"), F.col("v").alias("v1"))
    b = base.select("part", F.col("id").alias("id2"), F.col("v").alias("v2"))
    return (
        a.join(b, "part")
        .filter(F.col("id1") < F.col("id2"))
        .filter(cosine_similarity(F.col("v1"), F.col("v2")) >= threshold)
        .select("id1", "id2", F.col("part"))
    )
