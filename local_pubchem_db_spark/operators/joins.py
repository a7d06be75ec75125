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
