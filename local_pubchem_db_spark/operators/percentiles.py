"""Grouped percentiles at three scale tiers — the missing middle being
the point: an EXACT percentile whose parallelism does not collapse to
one task per key.

Spark's built-in exact ``median`` / ``percentile`` is a buffering
aggregate: every value of a group ships to ONE reduce task that holds a
value->count map of the group (so its memory grows with the group's
VALUE CARDINALITY, and a high-cardinality group sorts single-threaded).
Correct, oracle-matchable — and at 100 TB with a low-cardinality key
(8 event types, say) the job runs on 8 cores no matter how many
executors the cluster has. ``percentile_approx`` fixes the memory and
parallelism but surrenders exactness. ``method="selection"`` here is
the classic distributed-selection third way (the TeraSort-style recipe:
global range partitioning + per-slice local ranks + prefix offsets turn
order statistics into a rank lookup):

1. range-partition the (key, value) stream — equal tuples co-locate,
   every partition holds one contiguous slice of the global
   (key, value) order;
2. per-(slice, key) local ranks via ``row_number`` — the window
   partitions on (partition-id, key), so a hot key's groups are bounded
   by SLICE size, not key volume: full cluster parallelism;
3. per-(slice, key) counts roll into prefix offsets (a window over the
   tiny slices-x-keys relation) — local rank + slice offset = exact
   global rank;
4. the two ranks straddling each ``p * (n-1)`` (Spark/DuckDB's linear
   interpolation) are picked out with a broadcast key->targets map and
   interpolated — EVERY requested percentile rides the same two
   shuffles, so quartiles/deciles cost one pass.

Cost: one full-data range shuffle (plus repartitionByRange's sampling
pass) + one full-data hash shuffle for the rank window, vs the buffering
aggregate's single shuffle INTO #keys tasks. Measured at sf30 (30M rows,
`tools/measure_percentiles.py`): with repeating values or many keys the
buffer tier wins (its count-map buffer stays tiny); ONE group of 30M
continuous values runs 15.4s under selection vs 105-120s under buffer —
and the buffer gap grows without bound in group cardinality. The tier
choice is about value cardinality per group and key count, not volume.
selection == buffer equality is pinned by tests across odd/even counts,
ties, and partitionings, including Spark's exact interpolation formula.

Degenerate-tie caveat: the range partitioner cannot split rows with
IDENTICAL (key, value) tuples across slices, so a massive tie group
concentrates in one slice's rank window (correct, but that slice is a
straggler). That shape — few distinct values repeated enormously — is
exactly where the buffer tier excels (its value->count buffer collapses
the ties); pick tiers by value cardinality, as above.

No reference parity: the reference (utils.py) has no aggregate surface;
this extends SURVEY.md §2 C10 (approx percentiles) with the exact-at-
scale tier the training-data pipelines need (per-domain length/quality
cutoffs are percentile queries over few-key groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

METHODS = ("buffer", "sketch", "selection", "auto", "hist")

# Per-group distinct-value count past which the selection tier wins:
# buffer's per-key task holds (and sorts) a value->count map of the
# group's DISTINCT values, so its cost curve bends at value cardinality,
# not row count. Measured on one 30M-row all-distinct group
# (tools/measure_percentiles.py): selection 15.4s vs buffer 105-120s;
# at ~1M distinct the buffer map (~tens of MB) still sorts in seconds —
# the crossover sits between, and 1M errs toward buffer (mis-picking
# buffer costs time; mis-picking selection costs two extra shuffles on
# data too small to care).
AUTO_SELECTION_MIN_DISTINCT_PER_GROUP = 1_000_000

# Relative per-row constant of selection's machinery vs buffer's map
# insert: selection moves every ROW through a range exchange plus a
# rank window plus the offsets pass (~3 shuffle-grade passes), while
# buffer pays ~one hash-map insert per row and then sorts only the
# DISTINCT values. Calibrated against the five measured regimes in
# tools/measure_percentiles.py (see choose_percentile_method).
AUTO_SELECTION_PASS_COST = 3.0

# Per-group distinct count past which buffer is rejected REGARDLESS of
# the cost model: each buffer task materializes and sorts the group's
# value->count map, so ~64M distinct doubles is ~0.5-1 GB in one task —
# the OOM/spill regime where only selection's bounded-task-memory shape
# is safe, even when the wall-clock model would say buffer.
AUTO_SELECTION_MEMORY_CAP_DISTINCT = 64_000_000

# The hist tier enters auto's candidate set only when SEVERAL order
# statistics reuse ONE histogram (``reuse_stats >= 2`` — e.g.
# robust_outliers' med+MAD): hist's saving is the (s-1) full combine
# passes buffer would pay per statistic, so a single statistic never
# benefits. Two measured gates (ROUND12_NOTES §9b; re-measured r13 in
# bench_artifacts/PCT_TIERS_hist_*.json):
#
# - row floor: below ~2M rows the hist tier's extra persist job and
#   second derived aggregation dominate what the saved pass saves —
#   sf0.1 events (~100k rows) ran ~1.4x WORSE under hist while sf10
#   (10M rows) ran 1.5x better (sf30 2-3x, sf100 3x), so the boundary
#   sits between 100k and 10M; 2M errs toward buffer (mis-picking
#   buffer costs a bounded constant factor on data this small).
# - compression floor: the histogram must be >= 4x smaller than the
#   rows — each statistic re-runs the per-key cumulative window over
#   the histogram, so at low compression that window re-pays most of
#   the full pass the single combine was supposed to save.
AUTO_HIST_MIN_ROWS = 2_000_000
AUTO_HIST_MIN_COMPRESSION = 4.0


def choose_percentile_method(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    min_distinct_per_group: int = AUTO_SELECTION_MIN_DISTINCT_PER_GROUP,
    selection_pass_cost: float = AUTO_SELECTION_PASS_COST,
    memory_cap_distinct: int = AUTO_SELECTION_MEMORY_CAP_DISTINCT,
    reuse_stats: int = 1,
    hist_min_rows: int = AUTO_HIST_MIN_ROWS,
    hist_min_compression: float = AUTO_HIST_MIN_COMPRESSION,
) -> str:
    """Pick the exact tier from a COST MODEL over one probe scan
    (count + two HLL sketches, map-side combinable):

    - ``buffer_cost ~ nkv / min(nk, parallelism)``: buffer's critical
      path holds the DISTINCT (key, value) pairs of its largest funnel
      lane — repeats collapse into its value->count map, so row count
      barely matters;
    - ``selection_cost ~ pass_cost * n_rows / parallelism``: selection
      range-partitions every ROW across the cluster (~3 shuffle-grade
      passes), so distinct count barely matters.

    Selection wins when its cost is lower AND the per-group cardinality
    clears ``min_distinct_per_group`` (below it, fixed stage overheads
    dominate and buffer is instant anyway). A per-group cardinality
    past ``memory_cap_distinct`` forces selection regardless — buffer's
    per-task value map would not fit task memory (the safety case the
    wall-clock model doesn't get to override).

    The model reproduces every measured regime
    (tools/measure_percentiles.py, sf10 + the sf100 A/B):
    natural-keys/repeating (nkv 48k, rows 10M) -> buffer (measured 19x);
    one-group all-distinct (nkv=rows=10M) -> selection (14x);
    one-group massive ties (nkv 3) -> buffer (21x);
    few-parallel-keys all-distinct (nk 5, nkv=rows) -> selection
    (3.5x — the r11 regime5 a key-count-only rule gets wrong in one
    direction, and r11's own first funnel-based fix got wrong in the
    other); sf100 raw events (rows 100M, nkv 48k) -> buffer (2.7x).
    ``reuse_stats`` (r13, verdict Next #1): how many order statistics
    the CALLER will derive from one relation (``robust_outliers`` passes
    2 — med + MAD). At >= 2 the ``hist`` tier joins the candidate set:
    wherever the model would pick buffer, it upgrades to hist when the
    measured compression (``nkv`` distinct pairs vs ``n_rows``) clears
    ``hist_min_compression`` and the data clears ``hist_min_rows`` —
    exactly the regime the r12 ts_outliers measurements pinned (1.4x
    worse at sf0.1's ~100k rows, 1.5-3x better at sf10-100). The signal
    is already in the probe; no extra scan. A single statistic
    (``reuse_stats=1``) never picks hist — its saving IS the reuse.

    Probe cost and amortization (r13, round gap #1): the probe is one
    full scan of the relation, and its three numbers depend only on the
    RELATION (not on the decision parameters) — so they are memoized per
    (session, plan semanticHash, key/value columns) through the same
    ``_memo_probe`` registry the fan-out gates use. A service calling
    ``robust_outliers(method="auto")`` repeatedly over the same relation
    pays the scan once per session, not per call; the memo dies with
    ``release_shared_caches`` and carries that family's documented
    staleness contract (a table rewritten in place mid-session serves
    the old cardinalities until the caches are released — perf-only
    here: both candidate tiers are exact, so a stale TIER choice can
    never change values).
    """
    from local_pubchem_db_spark.operators.util import _memo_probe

    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism

    def compute(d: DataFrame):
        st = (
            d.filter(F.col(value_col).isNotNull())
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.approx_count_distinct(F.struct(*key_cols)).alias("nk"),
                F.approx_count_distinct(
                    F.struct(*key_cols, value_col)
                ).alias("nkv"),
            )
            .first()
        )
        return (
            int(st["n_rows"] or 0),
            int(st["nk"] or 0),
            int(st["nkv"] or 0),
        )

    kind = f"pct_cardinality:{','.join(key_cols)}:{value_col}"
    n_rows, nk, nkv = _memo_probe(df, kind, compute)

    def _hist_upgrade(method: str) -> str:
        if (
            method == "buffer"
            and reuse_stats >= 2
            and n_rows >= hist_min_rows
            and nkv * hist_min_compression <= n_rows
        ):
            return "hist"
        return method

    if nk == 0:
        return "buffer"
    per_group = nkv / nk
    if per_group >= memory_cap_distinct:
        return "selection"
    if per_group < min_distinct_per_group:
        return _hist_upgrade("buffer")
    buffer_cost = nkv / min(nk, par)
    selection_cost = selection_pass_cost * n_rows / par
    return (
        "selection"
        if selection_cost < buffer_cost
        else _hist_upgrade("buffer")
    )


def grouped_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    ps: list[float],
    method: str = "buffer",
    accuracy: int = 10_000,
    out_col: str = "pcts",
    num_slices: int | None = None,
) -> DataFrame:
    """One row per key with ``out_col`` an ``array<double>`` of the
    ``ps``-th percentiles (aligned with ``ps``), linear interpolation —
    the same definition Spark's ``percentile``/DuckDB's
    ``quantile_cont`` use, so results are oracle-portable.

    - ``method="buffer"``: Spark's exact aggregate — one task per key,
      per-task memory ~ the group's value cardinality. The small-data
      default.
    - ``method="sketch"``: ``percentile_approx`` — bounded-memory
      mergeable KLL-style sketch, rank error ~ 1/``accuracy``.
    - ``method="selection"``: exact AND parallelism ~ data volume, not
      key count (see module docstring); all of ``ps`` share one pass.
      ``num_slices`` overrides the range-slice count (default: session
      shuffle partitions).
    - ``method="auto"``: one cheap cardinality probe (an extra scan,
      map-side combined to one row) picks buffer vs selection by the
      decision rule in ``choose_percentile_method`` — both tiers are
      exact, so auto never changes results, only the plan.
    - ``method="hist"``: exact via an explicit (key, value)->count
      histogram and ``weighted_percentiles`` — same cost class as
      buffer (one combinable shuffle; per-key work ~ distinct values),
      but the histogram is a first-class DataFrame the CALLER can
      persist and reuse across several order statistics of the same
      relation (the ``robust_outliers`` med+MAD case: one data pass
      serves both). Not in THIS function's auto candidate set — all of
      ``ps`` already share one pass in every tier here, so there is no
      reuse for hist to win on; callers composing SEVERAL percentile
      relations over one input (robust_outliers) resolve the tier via
      ``choose_percentile_method(..., reuse_stats=2)``, where hist is
      a candidate (r13).

    Null values are ignored; keys whose values are all null (or absent)
    produce no row. Values are computed as double (interpolation is a
    double formula in every engine).
    """
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}, got {method!r}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not ps:
        raise ValueError("ps must be non-empty")
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"every p must be in [0, 1], got {p}")
    if method == "auto":
        method = choose_percentile_method(df, key_cols, value_col)
    x = F.col(value_col).cast("double")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *[F.col(k) for k in key_cols], x.alias("__v")
    )
    p_arr = F.array(*[F.lit(float(p)) for p in ps])

    if method == "buffer":
        return base.groupBy(*key_cols).agg(
            F.percentile("__v", p_arr).alias(out_col)
        )
    if method == "hist":
        hist = base.groupBy(*key_cols, "__v").agg(
            F.count(F.lit(1)).alias("__w")
        )
        return weighted_percentiles(
            hist, key_cols, "__v", "__w", ps, out_col=out_col
        )
    if method == "sketch":
        return base.groupBy(*key_cols).agg(
            F.percentile_approx("__v", p_arr, F.lit(accuracy))
            .cast("array<double>")
            .alias(out_col)
        )

    # --- selection ---
    spark = df.sparkSession
    n_slices = num_slices or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # 1. one contiguous slice of the global (key, value) order per
    #    partition; equal tuples co-locate, so rank picks are stable.
    #
    #    INVARIANT (ADVICE r9): the `ranked` and `cnt` branches below
    #    must read the SAME materialization of this range exchange —
    #    repartitionByRange samples its boundaries non-deterministically,
    #    so two independent materializations can place identical rows in
    #    different slices, making `__off` inconsistent with `__lr` and
    #    the result silently wrong. With exchange reuse on (Spark's
    #    default; AQE's stage cache honors the same conf) the two
    #    subtrees canonicalize to ONE exchange — pinned by a plan-level
    #    test (test_percentiles.py). If this session disabled reuse, pin
    #    the slice assignment explicitly instead: shared() persists the
    #    ranged relation and eagerly fills it in one materialization
    #    (the eager count matters — a lazy persist lets the two branches
    #    race-fill from DIFFERENT boundary samples).
    ranged = base.repartitionByRange(n_slices, *key_cols, "__v").withColumn(
        "__slice", F.spark_partition_id()
    )
    if str(
        spark.conf.get("spark.sql.exchange.reuse", "true")
    ).lower() != "true":
        from local_pubchem_db_spark.operators.util import shared

        ranged = shared(ranged)

    # 2. local rank within (slice, key): the window's hash shuffle keys
    #    on (__slice, key), so group size is bounded by slice volume —
    #    a hot key fans out across its slices instead of funneling into
    #    one task.
    w_local = Window.partitionBy("__slice", *key_cols).orderBy("__v")
    ranked = ranged.withColumn("__lr", F.row_number().over(w_local))

    # 3. per-(slice, key) counts -> prefix offsets. Counted off the
    #    RANGED relation (not the ranked one) so this branch reuses the
    #    range exchange without re-evaluating the rank window; the
    #    relation is slices x touched-keys rows — tiny.
    cnt = ranged.groupBy("__slice", *key_cols).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_off = (
        Window.partitionBy(*key_cols)
        .orderBy("__slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = cnt.withColumn("__off", F.coalesce(F.sum("__c").over(w_off), F.lit(0)))

    # 4. target ranks per requested percentile: idx_i = p_i*(n-1)
    #    zero-based, straddled by floor/ceil — long-form (key, pi, f,
    #    cl, idx) rows, |ps| per key, exploded from one array so the
    #    totals aggregate runs once.
    tot = off.groupBy(*key_cols).agg(F.sum("__c").alias("__n"))
    nm1 = (F.col("__n") - 1).cast("double")
    target_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("__pi"),
                F.floor(F.lit(float(p)) * nm1).cast("long").alias("__f"),
                F.ceil(F.lit(float(p)) * nm1).cast("long").alias("__cl"),
                (F.lit(float(p)) * nm1).alias("__idx"),
            )
            for i, p in enumerate(ps)
        ]
    )
    targets = tot.select(*key_cols, F.explode(target_structs).alias("__t")).select(
        *key_cols, "__t.__pi", "__t.__f", "__t.__cl", "__t.__idx"
    )

    # 5. pick the straddling ranks: broadcast the key->targets map so
    #    the filter runs map-side over the ranked stream (a row joins
    #    once per requested percentile and survives only if it is one
    #    of that percentile's two ranks), then a tiny two-level agg
    #    interpolates and assembles the ps-aligned array.
    g = ranked.join(off.select("__slice", *key_cols, "__off"), ["__slice", *key_cols])
    g = g.withColumn("__gr", (F.col("__lr") + F.col("__off") - 1))  # zero-based
    picked = g.join(F.broadcast(targets), key_cols).filter(
        (F.col("__gr") == F.col("__f")) | (F.col("__gr") == F.col("__cl"))
    )
    lo = F.first(F.when(F.col("__gr") == F.col("__f"), F.col("__v")), ignorenulls=True)
    hi = F.first(F.when(F.col("__gr") == F.col("__cl"), F.col("__v")), ignorenulls=True)
    # Spark's Percentile interpolates as lo*(ceil-pos) + hi*(pos-floor)
    # (NOT lo + (hi-lo)*frac — the two differ in the last ulp, e.g.
    # 8.799999999999999 vs 8.8 at p=0.9 over {7,9}); replicate it
    # literally so selection == buffer is BIT-exact, with the
    # degenerate integral-position case returned directly.
    interp = F.when(F.col("__f") == F.col("__cl"), F.col("__lo")).otherwise(
        F.col("__lo") * (F.col("__cl") - F.col("__idx"))
        + F.col("__hi") * (F.col("__idx") - F.col("__f"))
    )
    per_p = (
        picked.groupBy(*key_cols, "__pi")
        .agg(
            lo.alias("__lo"),
            hi.alias("__hi"),
            F.first("__f").alias("__f"),
            F.first("__cl").alias("__cl"),
            F.first("__idx").alias("__idx"),
        )
        .select(*key_cols, "__pi", interp.alias("__pct"))
    )
    # assemble ps order: array_sort on (pi, pct) structs sorts by pi
    # (ints, distinct), then strip to the values
    return (
        per_p.groupBy(*key_cols)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pi"), F.col("__pct")))
                ),
                lambda s: s.getField("__pct"),
            ).alias(out_col)
        )
    )


def grouped_percentile(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: float = 0.5,
    method: str = "buffer",
    accuracy: int = 10_000,
    out_col: str = "pct",
    num_slices: int | None = None,
) -> DataFrame:
    """Single-percentile convenience over ``grouped_percentiles`` (see
    that docstring for the method tiers): one row per key, ``out_col``
    a double."""
    multi = grouped_percentiles(
        df,
        key_cols,
        value_col,
        ps=[p],
        method=method,
        accuracy=accuracy,
        out_col="__ps",
        num_slices=num_slices,
    )
    return multi.select(
        *key_cols, F.element_at("__ps", 1).alias(out_col)
    )


def grouped_median(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    method: str = "buffer",
    accuracy: int = 10_000,
    out_col: str = "med",
    num_slices: int | None = None,
) -> DataFrame:
    """``grouped_percentile`` at p=0.5 (see ``grouped_percentiles`` for
    the method tiers)."""
    return grouped_percentile(
        df,
        key_cols,
        value_col,
        p=0.5,
        method=method,
        accuracy=accuracy,
        out_col=out_col,
        num_slices=num_slices,
    )


def weighted_percentiles(
    hist: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
    ps: list[float],
    out_col: str = "pcts",
) -> DataFrame:
    """EXACT percentiles of a pre-aggregated weighted relation: ``hist``
    holds one row per (key, value) with ``weight_col`` the number of
    underlying occurrences, and the result equals Spark's exact
    ``percentile`` over the EXPANDED relation bit-for-bit (the same
    ``lo*(ceil-pos) + hi*(pos-floor)`` interpolation the selection tier
    replicates; test-pinned against the buffer aggregate).

    Why it exists (r12): monitoring/telemetry stores often hold
    histograms rather than raw samples, and several order statistics of
    ONE relation should not each pay a full data pass — build the
    histogram once (one map-side-combinable shuffle over the raw rows,
    output = distinct (key, value) pairs), persist it, and every
    subsequent statistic (median, MAD via a derived deviation
    histogram, any quantile) runs over the tiny weighted relation.
    ``robust_outliers(method="hist")`` is the shipped composition.

    Scale shape: the cumulative-weight window partitions by key and
    sorts each key's DISTINCT values in one task — buffer's memory
    shape as a compute shape, so this tier suits the repeating-values
    regime (distinct << rows). For few-key groups of mostly-distinct
    values use ``method="selection"`` on the raw rows instead.

    Weights must be positive INTEGERS — occurrence counts. Rows with
    null value or non-positive weight are dropped (a zero-weight value
    does not exist in the expanded relation); keys with no surviving
    rows produce no output. A weight column of fractional TYPE is
    accepted only while every surviving value is integral: the previous
    silent ``cast(long)`` truncated 1.7 -> 1 and dropped 0.5 entirely,
    yielding quietly wrong percentiles (ADVICE r12) — now any
    fractional weight raises, JVM-side, with the offending value.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not ps:
        raise ValueError("ps must be non-empty")
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"every p must be in [0, 1], got {p}")
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
    )

    wt = hist.schema[weight_col].dataType
    w_long = F.col(weight_col).cast("long")
    integral = isinstance(
        wt, (ByteType, ShortType, IntegerType, LongType)
    ) or (isinstance(wt, DecimalType) and wt.scale == 0)
    if not integral:
        w_long = F.when(
            w_long.cast("double") == F.col(weight_col).cast("double"),
            w_long,
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "weighted_percentiles: fractional weight in "
                        f"{weight_col!r}: "
                    ),
                    F.col(weight_col).cast("string"),
                    F.lit(" — weights are occurrence counts (integers)"),
                )
            ).cast("long")
        )
    g = (
        hist.filter(
            F.col(value_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .select(
            *[F.col(k) for k in key_cols],
            F.col(value_col).cast("double").alias("__v"),
            w_long.alias("__w"),
        )
    )
    # cumulative weight in value order + the key total, both as window
    # columns so the per-percentile target ranks are row-local
    # expressions — no join against a separate totals relation. The two
    # windows share one (key)-clustered exchange; the cumulative sort
    # funnels each key's DISTINCT values into one task (see docstring).
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*key_cols)
    g = g.withColumn("__cum", F.sum("__w").over(w_cum)).withColumn(
        "__n", F.sum("__w").over(w_all)
    )
    # a hist row covers the zero-based global ranks
    # [__cum - __w, __cum - 1] of the expanded relation; for each
    # requested percentile the straddling ranks are floor/ceil of
    # idx = p*(n-1) — EXACTLY the selection tier's targets, computed
    # with the same double arithmetic so interpolation is bit-equal.
    prev = F.col("__cum") - F.col("__w")
    nm1 = (F.col("__n") - 1).cast("double")
    aggs = []
    for i, p in enumerate(ps):
        idx = F.lit(float(p)) * nm1
        fl = F.floor(idx).cast("long")
        cl = F.ceil(idx).cast("long")
        aggs.extend(
            [
                F.max(
                    F.when((prev <= fl) & (fl < F.col("__cum")), F.col("__v"))
                ).alias(f"__lo{i}"),
                F.max(
                    F.when((prev <= cl) & (cl < F.col("__cum")), F.col("__v"))
                ).alias(f"__hi{i}"),
                F.first(fl).alias(f"__f{i}"),
                F.first(cl).alias(f"__cl{i}"),
                F.first(idx).alias(f"__idx{i}"),
            ]
        )
    per_key = g.groupBy(*key_cols).agg(*aggs)
    outs = []
    for i in range(len(ps)):
        lo, hi = F.col(f"__lo{i}"), F.col(f"__hi{i}")
        fl, cl, idx = (
            F.col(f"__f{i}"),
            F.col(f"__cl{i}"),
            F.col(f"__idx{i}"),
        )
        # Spark's Percentile formula, replicated literally (see the
        # selection tier's comment: lo + (hi-lo)*frac differs in the
        # last ulp)
        outs.append(
            F.when(fl == cl, lo).otherwise(
                lo * (cl - idx) + hi * (idx - fl)
            )
        )
    return per_key.select(*key_cols, F.array(*outs).alias(out_col))
