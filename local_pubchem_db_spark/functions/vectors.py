"""Dense-vector column functions over ``array<float|double>`` embeddings.

Pure JVM higher-order functions (``zip_with`` + ``aggregate``) — the
embedding column stays columnar end-to-end, no Python in the scoring path.
Accumulation is sequential left-to-right in double precision, which is
also how DuckDB's list functions fold — keeping cross-engine results
bit-stable enough for membership/top-k comparisons (never compare raw
float columns in the correctness gate; compare id sets).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product. SQL: list_dot_product / SUM over unnest."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision.
    SQL (DuckDB): list_cosine_similarity(a, b)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """L2-normalize; unit vectors make cosine a plain dot product (cheaper
    inner loop for repeated scoring)."""
    n = l2_norm(a)
    return F.transform(_to_double(a), lambda x: x / n)
