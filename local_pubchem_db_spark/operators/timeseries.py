"""Time-series regularization: gap-fill an irregular event stream onto
a fixed time grid per key, with LOCF / linear-interpolation fills — the
TimescaleDB ``time_bucket_gapfill`` + ``locf()`` / ``interpolate()``
family, the query-side complement of the continuous aggregate in
``streaming/rollup.py`` (SURVEY.md §2 C11 extension: the reference's
closest surface is the manifest's time-stamped incremental state,
utils.py:292-334; dashboards over rollups need the EMPTY buckets too).

Spark-first shape (no UDFs anywhere):

1. observations bucket to the grid with epoch-millis arithmetic
   (``floor(ts_millis / step) * step`` — unix-epoch-aligned exactly like
   ``F.window``, immune to session timezone);
2. each key generates its dense grid with ``sequence()`` + ``explode``
   (bounded by its own [min, max] bucket, or a caller-pinned global
   [start, end]) — rows out = keys x grid length, the inherent output
   size;
3. one left join plants observations on the grid (both sides share the
   (key, bucket) shuffle key);
4. fills are codegen'd windows per key ordered by bucket:
   LOCF = ``last(value, ignorenulls)`` over the preceding frame;
   linear = LOCF's prev (value, ts) + the mirrored ``first`` over the
   following frame, combined with the fractional-position formula.

Cost at scale: one shuffle for the join + one window sort per key —
both partitioned by the key columns, so a 100 TB metric store fans out
by series exactly like the sessionization operators. The grid explode
is an array expression (codegen), never a driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _step_millis(step: str | int) -> int:
    """Accept an integer millisecond step or a '5 minutes'-style
    interval string (seconds/minutes/hours/days)."""
    if isinstance(step, int):
        if step <= 0:
            raise ValueError("step must be positive")
        return step
    parts = step.strip().split()
    if len(parts) != 2:
        raise ValueError(f"step must be '<n> <unit>' or millis, got {step!r}")
    n = int(parts[0])
    unit = parts[1].rstrip("s").lower()
    scale = {"second": 1000, "minute": 60_000, "hour": 3_600_000,
             "day": 86_400_000}.get(unit)
    if scale is None or n <= 0:
        raise ValueError(f"unsupported step {step!r}")
    return n * scale


def gap_fill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_cols: list[str],
    step: str | int = "1 hour",
    fill: str = "locf",
    start=None,
    end=None,
) -> DataFrame:
    """One row per (key, grid bucket) over a dense, fixed-step time
    grid; buckets with no observation are filled per ``fill``:

    - ``"null"``: planted as null (the honest gap marker);
    - ``"locf"``: last observation carried forward (leading gaps stay
      null — there is nothing to carry);
    - ``"linear"``: linear interpolation between the surrounding
      observations' TRUE event times (not bucket midpoints); leading /
      trailing gaps fall back to the one-sided neighbor (= locf /
      next-observation-carried-backward), matching TimescaleDB's
      ``interpolate`` at the series edges.

    Multiple observations in one bucket reduce to their mean (the
    conventional downsample; feed pre-aggregated rollups to make this
    moot). ``start`` / ``end`` (timestamps or epoch millis) pin a
    GLOBAL grid for every key — a dashboard's x-axis — otherwise each
    key spans its own [min, max]. Output: key columns,
    ``bucket_start`` (timestamp), one column per value col, and
    ``is_gap`` (true where no observation landed in the bucket).

    Nulls: rows with a null timestamp or null key are dropped (a grid
    position cannot be assigned); a null VALUE inside an observed
    bucket behaves like a gap for filling purposes but keeps
    ``is_gap`` false.
    """
    if fill not in ("null", "locf", "linear"):
        raise ValueError(f"fill must be null|locf|linear, got {fill!r}")
    if not key_cols or not value_cols:
        raise ValueError("key_cols and value_cols must be non-empty")
    ms = _step_millis(step)
    t = F.unix_millis(F.col(ts_col).cast("timestamp"))
    bucket = (F.floor(t / F.lit(ms)) * F.lit(ms)).cast("long")
    keys = [F.col(k) for k in key_cols]

    obs = (
        df.filter(F.col(ts_col).isNotNull())
        .na.drop(subset=key_cols)
        .select(
            *keys,
            bucket.alias("__b"),
            t.alias("__t"),
            *[F.col(v) for v in value_cols],
        )
        .groupBy(*key_cols, "__b")
        .agg(
            F.avg("__t").alias("__t"),
            *[F.avg(v).alias(v) for v in value_cols],
        )
    )

    if start is not None and end is not None and _to_millis(end) < _to_millis(start):
        raise ValueError(
            f"end ({end!r}) precedes start ({start!r}): the grid is empty"
        )
    lo = F.lit(_to_millis(start)) if start is not None else F.min("__b")
    hi = F.lit(_to_millis(end)) if end is not None else F.max("__b")
    grid = (
        obs.groupBy(*key_cols)
        .agg(
            (F.floor(lo / F.lit(ms)) * F.lit(ms)).cast("long").alias("__lo"),
            (F.floor(hi / F.lit(ms)) * F.lit(ms)).cast("long").alias("__hi"),
        )
        # One-sided pinning can leave a key with an EMPTY grid window —
        # start pinned but every observation older than it (__hi < __lo),
        # or end pinned but every observation newer. sequence() rejects
        # lo > hi with a positive step, so one stale key would kill the
        # whole query (ADVICE r8); an empty window means the key has no
        # buckets to show, so it is dropped, not clamped.
        .filter(F.col("__hi") >= F.col("__lo"))
        .select(
            *key_cols,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(ms).cast("long"))
            ).alias("__b"),
        )
    )

    joined = grid.join(obs, [*key_cols, "__b"], "left").withColumn(
        "__gap", F.col("__t").isNull()
    )

    out_vals: list[Column] = []
    if fill == "null":
        out_vals = [F.col(v) for v in value_cols]
    else:
        w = Window.partitionBy(*key_cols).orderBy("__b")
        prev_f = w.rowsBetween(Window.unboundedPreceding, 0)
        next_f = w.rowsBetween(0, Window.unboundedFollowing)
        for v in value_cols:
            if fill == "locf":
                out_vals.append(
                    F.last(v, ignorenulls=True).over(prev_f).alias(v)
                )
                continue
            # anchor (event time, value) as ONE struct so a bucket whose
            # observation carried a null value can never contribute a
            # time without a value (the pairs must move together)
            pair = F.when(
                F.col(v).isNotNull(),
                F.struct(F.col("__t").alias("t"), F.col(v).alias("x")),
            )
            prev_s = F.last(pair, ignorenulls=True).over(prev_f)
            next_s = F.first(pair, ignorenulls=True).over(next_f)
            # grid midpoint of the bucket anchors the interpolation
            mid = (F.col("__b") + F.lit(ms / 2.0)).cast("double")
            same = prev_s["t"] == next_s["t"]  # at an observation
            frac = (mid - prev_s["t"]) / (next_s["t"] - prev_s["t"])
            interp = prev_s["x"] + (next_s["x"] - prev_s["x"]) * frac
            out_vals.append(
                F.when(F.col(v).isNotNull(), F.col(v))
                .when(prev_s.isNull(), next_s["x"])  # leading gap
                .when(next_s.isNull() | same, prev_s["x"])  # trailing
                .otherwise(interp)
                .alias(v)
            )

    return joined.select(
        *key_cols,
        F.timestamp_millis(F.col("__b")).alias("bucket_start"),
        *out_vals,
        F.col("__gap").alias("is_gap"),
    )


def robust_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: float = 3.5,
    approx: bool = False,
    accuracy: int = 10_000,
    reuse: bool = False,
    method: str | None = None,
) -> DataFrame:
    """Per-key robust outlier detection: flag rows where
    ``|x − median| > k · MAD`` (MAD = median absolute deviation) — the
    Hampel / modified-z-score filter, the standard robust alternative to
    mean±3σ for telemetry with heavy tails. Returns ONLY the flagged
    rows, with every input column preserved plus ``med`` and ``mad``.

    Two grouped exact-median aggregations (Spark's ``median`` is the
    exact interpolated percentile, not a sketch) feeding ONE key-sized
    (key, med, mad) stats relation joined back once; ``reuse=True``
    caches the null-filtered input so the three passes scan the source
    ONCE — measured SLOWER on local parquet (sf30: 24s vs 15s lazy; the
    median shuffles dominate and the cache fill adds a serial pass), so
    it defaults off; flip it when the source is remote object storage
    and scans are the expensive term. Keys whose MAD is 0 (constant series)
    flag every deviating row, which is the conventional degenerate-case
    behavior. Null values are ignored for the statistics and never
    flagged.

    Determinism note: medians interpolate on doubles identically across
    engines for the even-count midpoint; the registry twin
    (``ts_outliers``) is verified value-exact against DuckDB.

    Median tiers (``method``, see ``operators/percentiles.py``):
    ``"buffer"`` (default) is Spark's exact aggregate — one task per
    key, per-task memory ~ group size (fine to ~10M rows/series);
    ``"sketch"`` (or legacy ``approx=True``) is ``percentile_approx``'s
    bounded-memory mergeable sketch, rank error ~1/``accuracy``;
    ``"selection"`` is EXACT with parallelism proportional to data
    volume instead of key count — the tier for true 100 TB per-key
    volumes where buffer funnels the cluster into #keys tasks and the
    statistic must still be exact; ``"auto"`` (r10) probes key count
    and per-group value cardinality once and picks buffer vs selection
    by the measured decision rule (both exact, so the choice never
    changes values — see ``choose_percentile_method``); ``"hist"``
    (r12) builds the (key, value)->count histogram ONCE and derives
    BOTH medians from it via ``weighted_percentiles`` — exact and
    bit-equal to buffer (test-pinned), with one full-data combine pass
    instead of two plus a full-data join pass: the right tier for
    repeating-value telemetry where distinct (key, value) pairs are
    far fewer than rows.

    ``"auto"`` resolves ONCE, here, with ``reuse_stats=2`` — the Hampel
    filter derives TWO order statistics from one relation, which is
    exactly the reuse the hist tier's saving depends on (r13, verdict
    Next #1): the probe's measured compression (distinct (key, value)
    pairs vs rows) picks hist on repeating-value telemetry past the
    measured row floor, buffer below it, selection for few-key
    mostly-distinct groups. Resolving at this level also means the two
    ``grouped_median`` calls below stop paying one probe EACH."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    from local_pubchem_db_spark.operators.percentiles import grouped_median

    m = method or ("sketch" if approx else "buffer")
    x = F.col(value_col)

    # Null-value rows can never be flagged, so drop them once up front.
    # reuse=True pins that relation in the block cache so the med pass,
    # the mad pass, and the output pass read the input ONCE instead of
    # three scans (the joins themselves are key-sized — AQE converts
    # them to broadcast from runtime stats).
    base = df.filter(x.isNotNull())
    if reuse:
        from local_pubchem_db_spark.operators.util import shared

        base = shared(base)
    if m == "auto":
        from local_pubchem_db_spark.operators.percentiles import (
            choose_percentile_method,
        )

        m = choose_percentile_method(
            base, key_cols, value_col, reuse_stats=2
        )
    if m == "hist":
        # One data pass serves BOTH statistics (r12): the med pass and
        # the mad pass above each scan-and-combine the full relation —
        # but the MAD's deviation histogram is a pure function of the
        # VALUE histogram once the median is known (|v − med| with the
        # same weights, re-summed where two values collide). So build
        # the (key, value)->count histogram once (one map-side-
        # combinable shuffle, output = distinct pairs — the repeating-
        # values telemetry regime), persist it, and both medians run
        # over the tiny weighted relation via ``weighted_percentiles``
        # (bit-equal to the buffer aggregate, test-pinned). Total full-
        # data work: ONE combine pass + the final scan-join — vs
        # buffer's two combine passes + a join pass + the final scan.
        from local_pubchem_db_spark.operators.percentiles import (
            weighted_percentiles,
        )
        from local_pubchem_db_spark.operators.util import shared

        hist = shared(
            base.groupBy(*key_cols, x.alias("__hv")).agg(
                F.count(F.lit(1)).alias("__w")
            )
        )
        med = weighted_percentiles(
            hist, key_cols, "__hv", "__w", [0.5], out_col="__m"
        ).select(*key_cols, F.element_at("__m", 1).alias("med"))
        # No broadcast hint on the per-key median relation: for a
        # low-cardinality key it is tiny and AQE broadcasts it from
        # runtime stats anyway, while a FORCED hint on a
        # high-cardinality key column could exceed the broadcast limit
        # or OOM the driver — the buffer path already leaves this
        # same join to AQE (ADVICE r12).
        devh = (
            hist.join(med, key_cols)
            .select(
                *key_cols,
                F.abs(F.col("__hv") - F.col("med")).alias("__dv"),
                "__w",
            )
            .groupBy(*key_cols, "__dv")
            .agg(F.sum("__w").alias("__w"))
        )
        mad = weighted_percentiles(
            devh, key_cols, "__dv", "__w", [0.5], out_col="__m"
        ).select(*key_cols, F.element_at("__m", 1).alias("mad"))
        stats = med.join(mad, key_cols)
        return base.join(stats, key_cols).filter(
            F.abs(x - F.col("med")) > F.lit(k) * F.col("mad")
        )
    med = grouped_median(
        base, key_cols, value_col, method=m, accuracy=accuracy, out_col="med"
    )
    dev = base.join(med, key_cols).withColumn("__ad", F.abs(x - F.col("med")))
    mad = grouped_median(
        dev, key_cols, "__ad", method=m, accuracy=accuracy, out_col="mad"
    )
    # ONE key-sized stats relation (key, med, mad) joined back once: the
    # output subtree materializes a single wide join.
    stats = med.join(mad, key_cols)
    return base.join(stats, key_cols).filter(
        F.abs(x - F.col("med")) > F.lit(k) * F.col("mad")
    )


def _to_millis(v) -> int:
    """Timestamp-ish -> epoch millis (int millis pass through)."""
    if isinstance(v, int):
        return v
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    raise ValueError(f"start/end must be epoch millis or datetime, got {v!r}")
