"""Non-equi join operators.

``range_join`` generalizes the reference's indexed mass-window workload
(README.md:76: range constraints on the indexed ``exact_mass`` column) to
a distributed range join: probe rows join reference rows whose value falls
inside [probe - tol, probe + tol].

Scale strategy: the probe side is broadcast when small (mass lookups are a
handful of query masses against billions of compounds — the common case),
so the big side is never shuffled; each executor scans its partitions once
and emits matches. When both sides are large, fall back to banding: both
sides get a quantized band key, the join becomes an equi-join on band with
a residual range predicate — bounded fan-out instead of a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    reference: DataFrame,
    probes: DataFrame,
    ref_col: str,
    probe_col: str,
    tolerance: float,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Pairs (probe, reference) with |ref - probe| <= tolerance."""
    p = F.broadcast(probes) if broadcast_probes else probes
    lo = F.col(probe_col) - tolerance
    hi = F.col(probe_col) + tolerance
    return reference.join(p, F.col(ref_col).between(lo, hi))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the columns of the LATEST right row
    with ``right_ts <= left_ts`` within the same key (DuckDB/kdb ASOF JOIN
    semantics; right columns are NULL when no prior right row exists).

    Distributed shape: instead of a per-row subquery (quadratic) the two
    sides are UNIONed, shuffled ONCE on the key, sorted by time within the
    partition, and swept with ``last_value(ignoreNulls)`` — the merge-sweep
    formulation. At equal timestamps the right row sorts first, so a
    same-instant right row IS matched (ASOF >= semantics). Ties among
    right rows at one instant resolve to the greatest ``right_ts`` then
    input order of the window frame — pre-dedupe the right side per
    (key, ts) if that matters.
    """
    from pyspark.sql import Window

    lt = F.col(left_ts)
    l_tagged = left.select(
        *key_cols,
        lt.alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = l_tagged.unionByName(r_tagged).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out_left = [F.col("__l")[c].alias(c) for c in left.columns]
    out_right = [F.col("__match")[c].alias(c) for c in right_cols]
    return swept.filter(F.col("__is_left") == 1).select(*out_left, *out_right)


def banded_range_join(
    reference: DataFrame,
    probes: DataFrame,
    ref_col: str,
    probe_col: str,
    tolerance: float,
) -> DataFrame:
    """Large-large range join via band quantization.

    Each reference row lands in one band of width ``tolerance``; each probe
    probes its own band and both neighbors, so every true match shares an
    equi-join key. Shuffles both sides once on the band key.
    """
    band = (F.col(ref_col) / tolerance).cast("long")
    r = reference.withColumn("__band", band)
    probe_bands = F.explode(
        F.array(
            (F.col(probe_col) / tolerance).cast("long") - 1,
            (F.col(probe_col) / tolerance).cast("long"),
            (F.col(probe_col) / tolerance).cast("long") + 1,
        )
    )
    p = probes.withColumn("__band", probe_bands)
    return (
        r.join(p, "__band")
        .filter(
            F.col(ref_col).between(
                F.col(probe_col) - tolerance, F.col(probe_col) + tolerance
            )
        )
        .drop("__band")
    )
