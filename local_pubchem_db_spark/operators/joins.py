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


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """Exact string-similarity join: all pairs with
    levenshtein(left_col, right_col) <= max_distance.

    Generalizes the reference's fuzzy chemistry lookups (InChIKey
    prefix-block index, default_db_layout.json:20-26 + README.md:76)
    from "same 14-char prefix" blocking to a COMPLETE edit-distance
    join — no true pair is missed.

    Candidate generation is the segment pigeonhole (PassJoin — Li,
    Deng & Feng, ICDE 2011): split each indexed string of length L
    into d+1 segments; if ed(a, b) <= d, some segment of ``a`` is
    untouched by every edit, so it occurs VERBATIM in ``b`` at a start
    shifted by at most d. The probe side therefore emits, for every
    in-window indexed length L in [len(b)-d, len(b)+d], each substring
    matching segment i's length at starts within +/-d of segment i's
    position. Matching (L, i, content) keys is then ONE equi-join
    shuffle; exact ``levenshtein`` verifies candidates, so precision
    is 1.0 and the pigeonhole only bounds candidate volume (substring
    diversity keeps buckets small — the all-pairs cross product never
    materializes).

    Strings shorter than d+1 chars have no nonzero segment scheme
    (edits can touch every segment); those left rows pair via a tiny
    length-banded block (left len <= d can only match right len <= 2d
    — both sets are degenerate-short strings, bounded in any real
    corpus).

    Segment/probe emission is one Arrow crossing per side (position
    arithmetic per row — Spark's interpreted higher-order functions
    price this out JVM-side); the verify is the built-in codegen'd
    ``levenshtein``. Returns (left_id, right_id, distance) distinct
    pairs.
    """
    from collections.abc import Iterator

    import pandas as pd

    d = int(max_distance)
    if d < 0:
        raise ValueError("max_distance must be >= 0")
    if d == 0:
        out = left.select(
            F.col(left_id), F.col(left_col).alias("__k")
        ).join(
            right.select(F.col(right_id), F.col(right_col).alias("__k")),
            "__k",
        )
        return out.select(left_id, right_id, F.lit(0).alias("distance"))
    k = d + 1

    def _segments(L: int) -> list[tuple[int, int, int]]:
        """(i, start, seg_len) for the even split of length L into k parts
        (first parts get the remainder — any fixed scheme works)."""
        base, rem = divmod(L, k)
        out, pos = [], 0
        for i in range(k):
            ln = base + (1 if i < rem else 0)
            out.append((i, pos, ln))
            pos += ln
        return out

    def emit_index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, Ls, idxs, keys = [], [], [], []
            for rid, s in zip(pdf["id"], pdf["s"]):
                L = len(s)
                if L < k:
                    continue  # short path handles these rows
                for i, pos, ln in _segments(L):
                    ids.append(rid)
                    Ls.append(L)
                    idxs.append(i)
                    keys.append(s[pos : pos + ln])
            yield pd.DataFrame({"id": ids, "L": Ls, "i": idxs, "key": keys})

    def emit_probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, Ls, idxs, keys = [], [], [], []
            for rid, s in zip(pdf["id"], pdf["s"]):
                M = len(s)
                for L in range(max(k, M - d), M + d + 1):
                    for i, pos, ln in _segments(L):
                        for p in range(max(0, pos - d), min(M - ln, pos + d) + 1):
                            ids.append(rid)
                            Ls.append(L)
                            idxs.append(i)
                            keys.append(s[p : p + ln])
            yield pd.DataFrame({"id": ids, "L": Ls, "i": idxs, "key": keys})

    # Arrow schemas derive the id dtype from the input — the operator's
    # motivating keys are string InChIKeys, and a hardcoded `id long`
    # would fail (or worse, coerce) them.
    l_norm = left.select(F.col(left_id).alias("id"), F.col(left_col).alias("s"))
    r_norm = right.select(F.col(right_id).alias("id"), F.col(right_col).alias("s"))

    seg = l_norm.mapInPandas(
        emit_index, f"id {dict(l_norm.dtypes)['id']}, L int, i int, key string"
    )
    probe = r_norm.mapInPandas(
        emit_probe, f"id {dict(r_norm.dtypes)['id']}, L int, i int, key string"
    )
    cand = (
        seg.join(probe.withColumnRenamed("id", "rid"), ["L", "i", "key"])
        .select(F.col("id").alias("lid"), "rid")
        .distinct()
    )

    # short-left path: len(a) <= d forces len(b) <= 2d. BROADCAST the
    # right block (r16, guide §3): a bare crossJoin plans a
    # CartesianProduct whose task count is left partitions x right
    # partitions — measured 12 s on a 3x2-row fixture at local[32]
    # (32x32 tasks), and at corpus scale the degenerate-short filter
    # still inherits the FULL scan's partitioning, so the product is
    # quadratic in partition count. The short-right block is bounded
    # tiny by construction (strings of <= 2d chars), exactly the
    # broadcast contract; the plan becomes a BroadcastNestedLoopJoin
    # streaming the left side once.
    short_l = l_norm.filter(F.length("s") < k).withColumnRenamed("id", "lid")
    short_r = r_norm.filter(F.length("s") <= 2 * d).withColumnRenamed("id", "rid")
    short_cand = short_l.crossJoin(F.broadcast(short_r)).select("lid", "rid")

    pairs = cand.union(short_cand).distinct()
    verified = (
        pairs.join(l_norm.select(F.col("id").alias("lid"), F.col("s").alias("__a")), "lid")
        .join(r_norm.select(F.col("id").alias("rid"), F.col("s").alias("__b")), "rid")
        .withColumn("distance", F.levenshtein("__a", "__b"))
        .filter(F.col("distance") <= d)
    )
    return verified.select(
        F.col("lid").alias(left_id),
        F.col("rid").alias(right_id),
        "distance",
    )
