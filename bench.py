"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints TWO JSON lines: a diagnostics line first ({"diagnostics": {runs,
spread, drift_vs_prev, ...}}), then the compact headline record LAST:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The compact record must stay last and small: the round driver captures a
bounded tail of stdout and parses the final line. In round 6 the enriched
payload was a single line that outgrew that buffer and truncated from the
FRONT, so BENCH_r06.json recorded `parsed: null` and the best-ever number
survived only as prose. Splitting the output keeps the machine-read record
~500 bytes regardless of how much diagnostics grow.

Execution is forced with the noop sink (full pipeline runs on executors,
nothing collected to the driver) so the timing measures the distributed
plan, not driver-side materialization.

Set SPARK_GRAFT_BENCH_RECORD=1 to also append the full payload to the
per-sf artifact series under bench_artifacts/ (BENCH_sf{sf}_seq{N}.json).
This is how non-driver scales (sf1 replicas) get a diffable history:
drift_vs_prev is computed within the same-sf series only.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_pubchem_db_spark.queries import QUERIES
from local_pubchem_db_spark.session import get_spark

# Representative slice of the corpus: scans, star joins, windows,
# sessionization, dedup (exact + MinHash-LSH), similarity search, text.
HEADLINE = [
    "pricing_summary",
    "top_unshipped_orders",
    "revenue_by_nation",
    "brand_volume",
    "top_orders_per_customer",
    "event_windows",
    "session_window",
    "events_hourly",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine",
    "token_topk",
    "doc_chunks",
    "sample_splits",
    "text_signals",
]


def calibration_run(spark, scale: int = 1) -> float:
    """ONE pinned workload, timed: a fixed 600k-row range scan-agg —
    no UDFs, no files, no cache, byte-identical every round — so the
    artifact carries a measurement of the HOST, not the engine. The r7
    verdict could not arbitrate a 10.7s driver record against an 8.2s
    builder band because nothing in the artifact measured the machine;
    dividing per-query drift by calibration drift separates host noise
    (uniform, shows up here too) from real regressions (isolated,
    doesn't)."""
    import time as _time

    from pyspark.sql import functions as F

    t0 = _time.perf_counter()
    (
        spark.range(0, 600_000 * scale, 1, 32)
        .select(
            ((F.col("id") * 2654435761) % 1048576).alias("k"),
            (F.col("id") % 97).alias("g"),
        )
        .groupBy("g")
        .agg(F.sum("k"), F.avg("k"), F.count(F.lit(1)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(_time.perf_counter() - t0, 4)


def calibration_py_run(spark, scale: int = 1) -> float:
    """Second calibration axis (r10): the PYTHON-WORKER path. The r10
    session showed untouched pandas-UDF/multi-stage queries drifting
    1.15-1.5x at EQUAL JVM calibration — the pure-JVM rangescan
    (calibration_run) cannot see Arrow transfer + Python worker cost,
    so host drift in that dimension was unattributable. This pins it:
    a fixed 256k-row Arrow round trip through a pandas UDF + one
    aggregation, byte-identical every round."""
    import time as _time

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _cal(s: pd.Series) -> pd.Series:
        return (s * 2654435761) % 1048576

    t0 = _time.perf_counter()
    (
        spark.range(0, 256_000 * scale, 1, 32)
        .select(_cal("id").alias("k"))
        .agg(F.sum("k"), F.count(F.lit(1)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(_time.perf_counter() - t0, 4)


def decompose_calibration(
    t1: float, t_big: float, scale_big: int
) -> dict | None:
    """Split a calibration probe into fixed job overhead (intercept)
    and per-unit compute cost (slope) from the SAME workload timed at
    1x and ``scale_big``x rows (r13, round gap #5): with a ~0.3 s probe
    on a fast host, fixed overhead is a large fraction of the probe, so
    dividing rows by the whole probe OVER-corrects — every untouched
    row showed ~1.4x normalized vs the previous round while raw rows
    were flat (the §8d signature; the sf0.01 smoke here measured the
    probe as ~0.5 s intercept + ~0.04 s compute, i.e. >90% overhead).
    Modeling ``t = intercept + slope * units`` gives ``slope =
    (t_big - t1) / (scale_big - 1)`` — a pure compute-speed measure a
    fast host actually scales; normalizing by IT removes the
    over-correction while the intercept stays visible in the artifact.
    ``scale_big`` must put the DIFFERENCE of the two probes in the
    compute-dominated regime: both probes measured >90% fixed overhead
    on this host (the 600k-row range-agg computes in single-digit ms on
    32 cores), so at 4-256x the difference is comparable to per-probe
    noise and the slope is mush — the callers use 2048x for the JVM
    probe (~1 s of extra compute) and 256x for the Python-worker probe,
    measured to give a difference ~10x the per-probe noise. None when
    noise inverts the probes (t_big <= t1) — consumers fall back to
    whole-probe normalization."""
    if t1 is None or t_big is None or t_big <= t1 or t1 <= 0:
        return None
    slope = (t_big - t1) / float(scale_big - 1)
    # 6 decimals: the JVM slope lands near 5e-4 s/unit, where 4-decimal
    # rounding would quantize away ~3% of the measurement
    return {
        "slope": round(slope, 6),
        "intercept": round(t1 - slope, 4),
    }


def slope_normalized(
    timings: dict, axes: dict, cal_decomp: dict
) -> dict:
    """Per-row slope normalization with a PER-AXIS fallback: a row
    whose OWN axis failed to decompose is OMITTED from this block
    (consumers fall back to the whole-probe queries_normalized for it)
    rather than silently normalized by the other axis's slope — the
    two slopes differ ~5x, so cross-axis substitution would record a
    scale shift indistinguishable from a huge regression on an
    untouched query (r13 review finding)."""
    out = {}
    for q, v in timings.items():
        d = cal_decomp.get("py" if axes.get(q) == "py" else "jvm")
        if d and d.get("slope"):
            out[q] = round(v / d["slope"], 3)
    return out


def compute_drift(
    timings: dict,
    prev_queries: dict,
    cal: float | None = None,
    prev_cal: float | None = None,
    cal_py: float | None = None,
    prev_cal_py: float | None = None,
    axes: dict | None = None,
    prev_axes: dict | None = None,
) -> tuple[dict, dict | None]:
    """(raw drift, calibration-normalized drift) vs the previous
    artifact. Raw: t_now / t_prev per query. Normalized: raw divided by
    the host-drift factor (cal_now / cal_prev) — a query whose
    normalized drift is ~1.0 ran the same ENGINE cost on a
    differently-loaded host. Normalized is None unless both artifacts
    carry a calibration.

    ``axes`` (r11, verdict Next #2): per-query calibration axis —
    queries whose plan crosses the Python worker (``axes[q] == "py"``)
    normalize by the PYTHON-axis factor (cal_py / prev_cal_py) when
    both artifacts carry it; pure-JVM rows keep the JVM axis. The r10
    session showed pandas-UDF rows drifting 1.15-1.5x at EQUAL JVM
    calibration — one axis cannot attribute drift in the other path.

    ``prev_axes`` (when the previous artifact recorded drift_axis —
    self-recorded series do, driver compact records do not): a query
    whose axis FLIPPED between artifacts (a refactor moved it across
    the Python boundary) gets no normalized entry at all — the raw
    ratio mixes two execution paths and dividing it by either single
    host factor would produce an unattributable number (r11 review
    finding)."""
    raw = {
        q: round(timings[q] / prev_queries[q], 3)
        for q in timings
        if prev_queries.get(q)
    }
    if not cal or not prev_cal:
        return raw, None
    host_factor = cal / prev_cal
    py_factor = (
        cal_py / prev_cal_py if cal_py and prev_cal_py else None
    )
    norm = {
        q: round(
            v
            / (
                py_factor
                if py_factor and axes and axes.get(q) == "py"
                else host_factor
            ),
            3,
        )
        for q, v in raw.items()
        if not (
            prev_axes
            and axes
            and q in prev_axes
            and q in axes
            and prev_axes[q] != axes[q]
        )
    }
    return raw, norm


def drift_verdict(
    slope_now: dict,
    slope_prev: dict,
    spread: dict,
    axes: dict | None = None,
    prev_axes: dict | None = None,
    fallbacks: tuple = (),
    host_band: float = 1.2,
    isolation: float = 1.5,
    tight_spread: float = 1.3,
) -> str:
    """One-line host-vs-real classifier — the ROUND14 §11 protocol,
    encoded so the every-round adjudication stops being hand arithmetic
    (r15, VERDICT r14 What's-missing #4):

    - compare MEDIANS of slope-normalized shared rows (axis-flipped
      rows excluded, same rule as compute_drift — their raw ratio
      mixes execution paths);
    - median < 1.2x → the level shift is host; median >= 1.2x →
      ``elevated_median:<x>`` (a whole-level engine shift, or a probe
      failure — either way a human reads the two blocks);
    - within the host band, name only ISOLATED rows: drift >= 1.5x the
      shared median AND this run's own sample spread tight (max/min
      <= 1.3). A drifted row whose own samples spread wide ran inside
      a host burst (the 2.9-6.9 s band the MINHASH_r14 artifacts
      document) — its drift number is soft, so it is NOT named; a row
      that timed consistently yet shifted is the code-suspect shape
      worth a look.

    ``fallbacks``: ordered (basis, ratio_dict) pairs (whole-probe
    normalized, then raw) used when either artifact lacks the slope
    block — e.g. comparing against a driver compact record. The basis
    is suffixed to the verdict so a raw-basis read is never mistaken
    for a slope-basis one. The axis-flip exclusion applies to EVERY
    basis, not just slope (r15 review finding): a query whose plan
    moved between the jvm and py axes mixes execution paths in its raw
    ratio (~5x per this module's slope docs), and on a fallback basis
    with few shared rows one such row can drag the median across the
    host band — the exact misread compute_drift's prev_axes exclusion
    exists to prevent."""

    def _drop_axis_flipped(d: dict) -> dict:
        return {
            q: r
            for q, r in d.items()
            if not (
                axes
                and prev_axes
                and q in axes
                and q in prev_axes
                and axes[q] != prev_axes[q]
            )
        }

    ratios = _drop_axis_flipped(
        {
            q: slope_now[q] / slope_prev[q]
            for q in slope_now
            if slope_prev.get(q)
        }
    )
    basis = "slope"
    if not ratios:
        for name, fb in fallbacks:
            fb = _drop_axis_flipped(dict(fb)) if fb else {}
            if fb:
                ratios, basis = fb, name
                break
    if not ratios:
        return "no_prev"
    med = statistics.median(ratios.values())
    suffix = "" if basis == "slope" else f" [{basis}-basis]"
    if med >= host_band:
        return f"elevated_median:{round(med, 3)}{suffix}"
    isolated = sorted(
        q
        for q, r in ratios.items()
        if r >= isolation * med and spread.get(q, float("inf")) <= tight_spread
    )
    if isolated:
        # bounded: the verdict rides the COMPACT record, whose total
        # size is driver-capped — name the worst few, count the rest
        named, extra = isolated[:5], len(isolated) - 5
        tail = f",+{extra}" if extra > 0 else ""
        return "isolated:" + ",".join(named) + tail + suffix
    return f"host{suffix}"


# The Python-worker operator NODE names (not bare substrings: a scan
# path or pushed literal containing "pandas" must not flip a pure-JVM
# query onto the py axis — r11 review finding).
_PY_NODE_RE = None


def _plan_axis(df) -> str:
    """Which calibration axis a query's EXECUTED plan belongs to:
    "py" when it crosses the Python worker (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas / python UDAF nodes), else
    "jvm". Empirical, not a hand-kept list — refactors that move a
    query across the boundary re-classify it automatically. Matches
    operator NODE names only, so data that merely mentions
    python/pandas (paths, literals, column names) cannot misclassify."""
    import re

    global _PY_NODE_RE
    if _PY_NODE_RE is None:
        _PY_NODE_RE = re.compile(
            r"ArrowEvalPython|BatchEvalPython|MapInPandas|MapInArrow"
            r"|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"
            r"|AggregateInPandas|WindowInPandas|PythonUDF|PythonUDAF"
            r"|ApplyInPandas"
        )
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:  # noqa: BLE001 — classification is best-effort
        return "jvm"
    return "py" if _PY_NODE_RE.search(plan) else "jvm"


def evict_page_cache(path: str) -> int:
    """Best-effort page-cache eviction of every file under ``path`` via
    POSIX_FADV_DONTNEED (drops CLEAN cached pages of each file — no
    privileges needed, unlike /proc/sys/vm/drop_caches). The cold-IO
    axis of the scale series (r13, verdict Next #3): r12's sf100
    improvement was confounded by reused replicas whose pages were
    already resident — an artifact labeled ``cold: true`` had this run
    against it immediately before, so the IO-warmth fraction of any
    gain is measurable instead of acknowledged. Returns the number of
    files evicted."""
    os.sync()  # fadvise drops only clean pages
    n = 0
    for root, _dirs, fns in os.walk(path):
        for fn in fns:
            try:
                fd = os.open(os.path.join(root, fn), os.O_RDONLY)
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                finally:
                    os.close(fd)
                n += 1
            except OSError:
                pass
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Cold-IO mode (r13): evict the sf dir's page cache and warm the
    # JVM on a synthetic range instead of a parquet read, so the first
    # touch of every table in the measured queries is a REAL disk read.
    # Within the run, later reps/queries are warm — the same profile as
    # a cold-started service; the artifact-level flag is what the
    # series analysis compares (runs[] carries the per-rep samples).
    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD") == "1"
    if cold:
        evicted = evict_page_cache(sf_dir)
        print(json.dumps({"evicted_files": evicted, "dir": sf_dir}))
        from pyspark.sql import functions as _F

        (
            spark.range(0, 1_000_000, 1, 32)
            .groupBy((_F.col("id") % 17).alias("g"))
            .agg(_F.sum("id"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    else:
        # Warm the JVM/session so q1 doesn't pay one-time start-up costs.
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Warm the Python UDF workers too: the first pandas UDF otherwise pays
    # a one-time fork+import on every core (~1s on 32) that long-lived
    # executors never see again.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    from local_pubchem_db_spark.operators.util import release_shared_caches

    # min-of-3 per query: a single timed run makes the recorded number
    # hostage to host load (the r2 artifact inflated 1.4-2.6x uniformly
    # from sandbox noise). The min is the honest estimate of the code's
    # cost; all samples ship in "runs" so variance stays visible.
    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    axes: dict[str, str] = {}  # per-row calibration axis (jvm | py)

    # Host calibration, min-of-REPS like every other row (first sample
    # pays the agg's one-time codegen compile; the min is the host).
    # two-point decomposition (r13): the same probes at a
    # compute-dominated second point give slope (per-unit compute, the
    # honest host-speed divisor) and intercept (fixed job overhead) —
    # see decompose_calibration for the scale sizing. The 1x and big
    # samples INTERLEAVE so both points see the same load profile:
    # sequential blocks let a load burst inflate one point only,
    # inverting the difference (observed in the first sf0.01 smoke).
    CAL_JVM_BIG, CAL_PY_BIG = 2048, 256
    cal_runs: list[float] = []
    cal_big_runs: list[float] = []
    cal_py_runs: list[float] = []
    cal_py_big_runs: list[float] = []
    for _ in range(max(REPS, 3)):
        cal_runs.append(calibration_run(spark))
        cal_big_runs.append(calibration_run(spark, scale=CAL_JVM_BIG))
        cal_py_runs.append(calibration_py_run(spark))
        cal_py_big_runs.append(
            calibration_py_run(spark, scale=CAL_PY_BIG)
        )
    calibration = min(cal_runs)
    calibration_py = min(cal_py_runs)
    cal_decomp = {
        "jvm": decompose_calibration(
            calibration, min(cal_big_runs), CAL_JVM_BIG
        ),
        "py": decompose_calibration(
            calibration_py, min(cal_py_big_runs), CAL_PY_BIG
        ),
    }
    for name in HEADLINE:
        fn = QUERIES[name]
        samples = []
        # One broken query must never zero the whole artifact (the r4
        # failure mode): record the error, keep measuring the rest, and
        # always emit the final JSON line.
        try:
            for _ in range(REPS):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
                # shared() relations are per-invocation scratch; dropping them
                # between repetitions keeps every sample a COLD run and keeps
                # storage memory flat across the sweep.
                release_shared_caches(spark)
            # axis probe ONCE per row, after the reps (identical every
            # rep; stringifying a large adaptive plan per rep is a
            # wasted JVM round trip — r11 review finding)
            axes[name] = _plan_axis(df)
        except Exception as e:  # noqa: BLE001 — survey harness, not control flow
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            release_shared_caches(spark)
        # a rep that failed after earlier successful reps must not leave
        # a clean-looking min-of-REPS row next to its errors entry — a
        # partial row is indistinguishable from a real measurement
        # (ADVICE r9); the error entry alone tells the story.
        if samples and name not in errors:
            timings[name] = min(samples)
            runs[name] = samples

    # Warm-path evidence for the one cache-dependent headline query: the
    # steady state of an LSH index kept resident (no release between
    # runs) — the deployment shape for a long-lived dedup service.
    name = "dedup_minhash_lsh"
    try:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm_samples = []
        for _ in range(2):  # min-of-2: one warm sample is hostage to a
            t0 = time.perf_counter()  # GC pause (the sf1 26s-vs-7s case)
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            warm_samples.append(round(time.perf_counter() - t0, 3))
        axes[name + "_warm"] = _plan_axis(df)
        timings[name + "_warm"] = min(warm_samples)
        runs[name + "_warm"] = warm_samples
    except Exception as e:  # noqa: BLE001
        errors[name + "_warm"] = f"{type(e).__name__}: {e}"[:500]
    release_shared_caches(spark)

    # Newest-operator drift protection (the r7 lesson: a component with
    # no bench row can regress silently): gap_fill regularizes the
    # events stream per type with linear interpolation — one join + one
    # window sort, the whole time-series surface in one number.
    try:
        from local_pubchem_db_spark.operators.timeseries import gap_fill

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = gap_fill(
                ev, "ts", ["event_type"], ["value"], "1 hour", fill="linear"
            )
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        axes["gap_fill"] = _plan_axis(df)
        timings["gap_fill"] = min(samples)
        runs["gap_fill"] = samples
    except Exception as e:  # noqa: BLE001
        errors["gap_fill"] = f"{type(e).__name__}: {e}"[:500]

    # Compressed-tier ANN (IVF-PQ residual + exact re-rank): the index
    # build (k-means fit + residual codebooks + encode) happens ONCE per
    # corpus in a search service, so it is prepared outside the timer
    # and the SEARCH is the measured row — the same warm-index shape as
    # dedup_minhash_lsh_warm. Keeps the newest large component under the
    # same drift protection as everything else (r7 What's missing #1).
    try:
        _bench_ivf_pq(spark, sf_dir, REPS, timings, runs, axes)
    except Exception as e:  # noqa: BLE001
        errors["ivf_pq_search"] = f"{type(e).__name__}: {e}"[:500]
    release_shared_caches(spark)

    # Persisted-IVF-PQ service path (r13): save_ivf_pq's catalog-table
    # shape — partition-pruned reads off DISK, the restart-safe twin of
    # the in-memory ivf_pq_search row. Index built+saved untimed (a
    # service pays it per corpus version); the timed row is the search
    # through load-free ivf_pq_search_persisted with a preloaded tuple.
    try:
        _bench_ivf_pq_persisted(spark, sf_dir, REPS, timings, runs, axes)
    except Exception as e:  # noqa: BLE001
        errors["ivf_pq_persisted"] = f"{type(e).__name__}: {e}"[:500]
    release_shared_caches(spark)

    # MMR diversity pass (r13): the newest retrieval component under
    # the same drift protection (r7 What's missing #1 — a component
    # with no bench row regresses silently).
    try:
        _bench_mmr_rerank(spark, sf_dir, REPS, timings, runs, axes)
    except Exception as e:  # noqa: BLE001
        errors["mmr_rerank"] = f"{type(e).__name__}: {e}"[:500]
    release_shared_caches(spark)

    # Warm-postings retrieval (r10, verdict Next #3): the retrieval_topk
    # aux row times the direct (index-free) route only — the amortized
    # postings path, the shape a query service actually runs (index
    # built once, persisted/bucketed; each request pays only the
    # query-side joins), had no bench presence and could drift silently.
    # The index build is prepared OUTSIDE the timer like ivf_pq_search.
    try:
        _bench_retrieval_warm(spark, sf_dir, REPS, timings, runs, axes)
    except Exception as e:  # noqa: BLE001
        errors["retrieval_warm"] = f"{type(e).__name__}: {e}"[:500]
    release_shared_caches(spark)

    # r9 operators under the same drift protection, as AUX rows
    # (excluded from headline_total so round-over-round totals stay
    # comparable): retrieval = index build + coordination query;
    # ts_outliers = two grouped exact medians + joins over events;
    # token_drift = two token histograms + vocab-sized outer join;
    # pct_selection = the distributed-selection exact median (range
    # shuffle + rank window + broadcast rank pick). pct_selection's
    # FORCED method="selection" tier — and its ~11 exec jobs — IS the
    # row's contract: this row exists to demonstrate/track the
    # distributed-selection operator (few-keys/huge-groups 100 TB
    # regime) at bench scale, where the auto router would pick the
    # cheaper memoized-probe tier (r13). Its raw wall is therefore a
    # deliberate floor, not an unoptimized query.
    for aux in ("retrieval_topk", "ts_outliers", "token_drift",
                "pct_selection"):
        # reset BEFORE the try: a failed registry lookup must not let
        # the previous aux's samples be re-recorded under this name
        samples = []
        try:
            # token_drift: time the decimal(38,0)-exact OPERATOR, not
            # the registry query — its trailing long cast exists only
            # for the sf0.01 oracle's BIGINT hash parity and would
            # overflow at large-sf token totals (ADVICE r10); the bench
            # runs at every sf, so it times the deployment arithmetic.
            fn = _token_drift_uncast if aux == "token_drift" else QUERIES[aux]
            for _ in range(REPS):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
                # cold samples, like the headline loop: token_drift's
                # shared() histogram must not serve rep 2 from cache
                release_shared_caches(spark)
            axes[aux] = _plan_axis(df)  # once per row, not per rep
        except Exception as e:  # noqa: BLE001
            errors[aux] = f"{type(e).__name__}: {e}"[:500]
            release_shared_caches(spark)
        # never record partial timings next to an errors entry (ADVICE r9)
        if samples and aux not in errors:
            timings[aux] = min(samples)
            runs[aux] = samples

    # Bucketed-catalog retrieval (r11, verdict Next #3): the service
    # deployment shape — index persisted via save_postings (bucketed,
    # stats table alongside), queried through load_index with the
    # persisted scalars, so bucket-pruning or stats regressions at any
    # sf surface as timing drift, not only as a test failure. The warm
    # hybrid row (r12, verdict Next #5) reuses the SAME persisted
    # index: persisted-BM25 + IVF-PQ ANN + rrf_fuse — the deployment
    # composition behind hybrid_rrf's oracle-shaped registry twin.
    idx_name = "bench_retrieval_idx"
    idx = None
    try:
        idx = _prepare_retrieval_index(spark, sf_dir, idx_name)
        _bench_retrieval_bucketed(spark, REPS, timings, runs, axes, idx)
    except Exception as e:  # noqa: BLE001
        errors["retrieval_bucketed"] = f"{type(e).__name__}: {e}"[:500]
    try:
        if idx is None:
            raise RuntimeError("retrieval index prepare failed")
        _bench_hybrid_warm(spark, sf_dir, REPS, timings, runs, axes, idx)
    except Exception as e:  # noqa: BLE001
        errors["hybrid_warm"] = f"{type(e).__name__}: {e}"[:500]
    try:
        from local_pubchem_db_spark.operators.retrieval import drop_index

        drop_index(spark, idx_name)
    except Exception:  # noqa: BLE001 — warehouse scratch cleanup
        pass
    release_shared_caches(spark)

    AUX = ("ivf_pq_search", "ivf_pq_persisted", "gap_fill",
           "retrieval_topk", "ts_outliers", "token_drift",
           "pct_selection", "retrieval_warm", "retrieval_bucketed",
           "hybrid_warm", "hybrid_batch", "mmr_rerank")
    total = round(
        sum(
            v
            for k, v in timings.items()
            if not k.endswith("_warm") and k not in AUX
        ),
        3,
    )
    # Full-surface correctness record (r10, verdict Next #7): the
    # driver's gate caps at the first 50 registry entries, so the
    # past-cap queries sat outside the official record by construction.
    # Run the local full-surface oracle (tools/oracle_check.py — every
    # registry entry vs its DuckDB twin at sf0.01, ~75s) and embed the
    # summary in the artifact the driver parses. Opt out with
    # SPARK_GRAFT_BENCH_ORACLE=0; skipped automatically when the oracle
    # sf dir is absent (scale-replica hosts).
    past_cap = None
    if os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0":
        oracle_sf = os.environ.get(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
        )
        if os.path.isdir(oracle_sf):
            try:
                sys.path.insert(
                    0,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)), "tools"
                    ),
                )
                from oracle_check import run_check

                past_cap = run_check(spark, oracle_sf, verbose=False)
            except Exception as e:  # noqa: BLE001 — record, never kill bench
                past_cap = {"error": f"{type(e).__name__}: {e}"[:300]}
            release_shared_caches(spark)

    # Self-normalizing rows (r13, verdict Next #7): calibration drifted
    # 0.39 -> 0.51 -> 0.62 across three driver rounds, so every raw
    # round-over-round comparison needed hand-normalization. Each row
    # divided by ITS axis's calibration (py rows by the Python-worker
    # probe, jvm rows by the rangescan probe) is in host-independent
    # "calibration units" — two rounds' normalized rows compare
    # directly, no dance.
    queries_normalized = {
        q: round(
            v
            / (
                calibration_py
                if axes.get(q) == "py" and calibration_py
                else calibration
            ),
            3,
        )
        for q, v in timings.items()
        if calibration
    }
    # slope-normalized rows (r13, round gap #5): divide by the per-unit
    # compute cost instead of the whole probe, so a fast host's large
    # fixed-overhead FRACTION stops over-correcting every row (the §8d
    # signature: uniform ~1.4x normalized on flat raw rows). Per-axis
    # fallback semantics in slope_normalized.
    queries_normalized_slope = slope_normalized(timings, axes, cal_decomp)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_normalized": queries_normalized,
        "queries_normalized_slope": queries_normalized_slope,
        "cold": cold,
        "calibration": calibration,
        "calibration_py": calibration_py,
        "calibration_decomposed": cal_decomp,
        "runs": runs,
        "calibration_runs": cal_runs,
        "calibration_py_runs": cal_py_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if past_cap is not None:
        out["past_cap_oracle"] = past_cap
    # Self-verification against the previous round's artifact: the r5
    # artifact drifted 1.2-1.4x on byte-identical queries and nothing in
    # the artifact itself could separate host noise from a real
    # regression. Two signals fix that: per-query drift vs the last
    # recorded round (uniform drift across untouched queries = host;
    # isolated drift = suspect code), and per-query spread (max/min of
    # this run's own samples — high spread means the host was noisy
    # WHILE this artifact was recorded, so its drift numbers are soft).
    prev_name, prev = _load_previous_artifact(sf=out["sf"])
    if prev and prev.get("sf") != out["sf"]:
        prev = None  # cross-sf ratios would be meaningless
    if prev:
        drift, norm = compute_drift(
            timings,
            prev.get("queries", {}),
            cal=calibration,
            prev_cal=prev.get("calibration"),
            cal_py=calibration_py,
            prev_cal_py=prev.get("calibration_py"),
            axes=axes,
            prev_axes=prev.get("drift_axis"),
        )
        out["prev_artifact"] = prev_name
        out["prev_total"] = prev.get("value")
        out["drift_vs_prev"] = drift
        if norm is not None:
            out["host_drift"] = round(
                calibration / prev["calibration"], 3
            )
            if prev.get("calibration_py"):
                out["host_drift_py"] = round(
                    calibration_py / prev["calibration_py"], 3
                )
            out["drift_vs_prev_normalized"] = norm
    out["drift_axis"] = axes
    out["spread"] = {
        q: round(max(s) / min(s), 3) for q, s in runs.items() if min(s) > 0
    }
    # One-line host-vs-real verdict (r15 — the §11 protocol, encoded):
    # slope-basis when both artifacts carry the slope block, else the
    # whole-probe / raw fallbacks, basis-tagged. Compact-record field:
    # it is the line the round notes read INSTEAD of hand arithmetic.
    if prev:
        out["drift_verdict"] = drift_verdict(
            queries_normalized_slope,
            prev.get("queries_normalized_slope") or {},
            out["spread"],
            axes=axes,
            prev_axes=prev.get("drift_axis"),
            fallbacks=(
                ("norm", out.get("drift_vs_prev_normalized")),
                ("raw", out.get("drift_vs_prev")),
            ),
        )
    else:
        out["drift_verdict"] = "no_prev"
    if errors:
        out["errors"] = errors
        out["incomplete"] = True
    record_dir = None
    if os.environ.get("SPARK_GRAFT_BENCH_RECORD") == "1":
        record_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_artifacts"
        )
    emit(out, record_dir=record_dir)


def _token_drift_uncast(spark, sf_dir: str):
    """The token_drift OPERATOR without the registry query's trailing
    long cast — decimal(38,0)-exact at every sf (the cast is safe only
    at the sf0.01 oracle gate; ADVICE r10)."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.drift import token_drift_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_drift_split(docs, F.col("doc_id") % 2 == 0, top_n=20)


def _prepare_retrieval_index(spark, sf_dir: str, name: str):
    """Build + persist the bucketed inverted index ONCE (untimed — a
    service pays this per corpus version) and return the loaded
    ``load_index`` tuple. Shared by the retrieval_bucketed and
    hybrid_warm rows; the caller drops the tables afterwards."""
    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        calibrate_cost_ratio,
        drop_index,
        load_index,
        save_postings,
    )

    corpus = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(corpus)
    postings, doc_stats = build_postings(docs)
    drop_index(spark, name)  # clear stale catalog entries/locations
    # the r13 deployment shape: corpus pointer persisted (so a bare
    # bm25_topk_auto(spark, name, terms) routes), cost ratio measured
    # on THIS corpus/host at build time instead of the baked constant
    save_postings(postings, doc_stats, name, buckets=8, corpus_table=corpus)
    try:
        ratio = calibrate_cost_ratio(spark, name, docs=docs, reps=2)
        print(json.dumps({"index_cost_ratio": round(ratio, 2)}))
    except Exception:  # noqa: BLE001 — calibration is best-effort here
        pass
    return load_index(spark, name)


def _bench_retrieval_bucketed(
    spark, reps: int, timings, runs, axes, idx
) -> None:
    """The bucketed-catalog service path, timed per sf (r11): bm25_topk
    over the persisted index with the persisted (N, avgdl, term df) —
    the query issues zero jobs before its scoring job and the ``IN``
    probe prunes buckets."""
    import time as _time

    from local_pubchem_db_spark.operators.retrieval import bm25_topk

    p, ds, (n_docs, avgdl), tdf = idx
    samples = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        df = bm25_topk(
            p, ds, ["hash", "spark", "stream", "vector"], k=10,
            n_docs=n_docs, avgdl=avgdl, term_df=tdf,
        )
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(_time.perf_counter() - t0, 3))
    axes["retrieval_bucketed"] = _plan_axis(df)
    timings["retrieval_bucketed"] = min(samples)
    runs["retrieval_bucketed"] = samples


def _bench_hybrid_warm(
    spark, sf_dir: str, reps: int, timings, runs, axes, idx
) -> None:
    """The warm HYBRID service composition, timed per sf (r12, verdict
    Next #5): persisted-index BM25 (top 20, ranked) fused with IVF-PQ
    ANN (top 20 around doc 0's embedding, residual+rerank — the
    scale-path ANN, not brute force) via Reciprocal Rank Fusion. The
    registry twin ``hybrid_rrf`` deliberately uses the direct lexical
    route + brute-force kNN for its DuckDB oracle; THIS row times the
    deployment shape, so a regression in either persisted path or in
    the fusion join surfaces as drift at every sf. Index and encoded
    corpus are prepared outside the timer."""
    import time as _time

    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import (
        ivf_pq_search,
        pq_encode,
        pq_fit,
    )
    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
        with_rank,
    )
    from pyspark.sql import functions as F

    p, ds, (n_docs, avgdl), tdf = idx
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    codebooks = pq_fit(assigned, m=8, k=16, centroids=centroids)
    encoded = pq_encode(assigned, codebooks, centroids=centroids).persist()
    encoded.count()
    probe = emb.filter(F.col("vec_id") == 0)
    samples = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        lex = with_rank(
            bm25_topk(
                p, ds, ["hash", "spark", "stream", "vector"], k=20,
                n_docs=n_docs, avgdl=avgdl, term_df=tdf,
            ),
            F.desc("score"),
            F.asc("doc_id"),
        ).select("doc_id", "rank")
        vec = ivf_pq_search(
            encoded, probe, centroids, codebooks,
            k=20, nprobe=4, residual=True, rerank=50,
        ).select(F.col("neighbor_id").alias("doc_id"), "rank")
        df = rrf_fuse([lex, vec], top_n=10)
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(_time.perf_counter() - t0, 3))
    axes["hybrid_warm"] = _plan_axis(df)
    timings["hybrid_warm"] = min(samples)
    runs["hybrid_warm"] = samples

    # the BATCHED hybrid deployment shape (r14, verdict Next #7): 8
    # queries through BM25 + IVF-PQ + RRF with ONE union-pruned
    # postings probe, ONE PQ probe batch, and ONE fused plan — compare
    # against 8x the hybrid_warm row to read the amortization directly.
    from local_pubchem_db_spark.operators.retrieval import (
        hybrid_topk_batch,
    )

    batch_queries = {
        str(i): terms
        for i, terms in enumerate(
            [
                ["hash", "spark"],
                ["stream", "vector"],
                ["shuffle", "join"],
                ["data", "batch"],
                ["hash", "stream", "vector"],
                ["spark", "vector"],
                ["join", "stream"],
                ["hash", "join", "spark"],
            ]
        )
    }
    probes_b = emb.filter(F.col("vec_id") < 8)
    samples_b = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        dfb = hybrid_topk_batch(
            p, ds, batch_queries, encoded, probes_b, centroids,
            codebooks, k_lex=20, k_vec=20, top_n=10,
            n_docs=n_docs, avgdl=avgdl, term_df=tdf,
            nprobe=4, residual=True, rerank=50,
        )
        dfb.write.format("noop").mode("overwrite").save()
        samples_b.append(round(_time.perf_counter() - t0, 3))
    axes["hybrid_batch"] = _plan_axis(dfb)
    encoded.unpersist()
    timings["hybrid_batch"] = min(samples_b)
    runs["hybrid_batch"] = samples_b


def _bench_ivf_pq_persisted(
    spark, sf_dir: str, reps: int, timings, runs, axes
) -> None:
    """The persisted IVF-PQ service path (r13): index fit + encode +
    save_ivf_pq run untimed, then the measured row is
    ivf_pq_search_persisted over the cluster-partitioned CATALOG table
    with a preloaded index tuple — the partition-pruned-from-disk twin
    of ivf_pq_search's in-memory row."""
    import time as _time

    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import (
        drop_ivf_pq,
        ivf_pq_search_persisted,
        load_ivf_pq,
        pq_encode,
        pq_fit,
        save_ivf_pq,
    )

    name = "bench_ivfpq_idx"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    codebooks = pq_fit(assigned, m=8, k=16, centroids=centroids)
    encoded = pq_encode(assigned, codebooks, centroids=centroids)
    drop_ivf_pq(spark, name)
    try:
        save_ivf_pq(encoded, centroids, codebooks, name, residual=True)
        idx = load_ivf_pq(spark, name)
        probes = emb.orderBy("vec_id").limit(16)
        samples = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            df = ivf_pq_search_persisted(
                spark, name, probes, k=10, nprobe=4, rerank=50, index=idx
            )
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(_time.perf_counter() - t0, 3))
        axes["ivf_pq_persisted"] = _plan_axis(df)
        timings["ivf_pq_persisted"] = min(samples)
        runs["ivf_pq_persisted"] = samples
    finally:
        drop_ivf_pq(spark, name)


def _bench_mmr_rerank(
    spark, sf_dir: str, reps: int, timings, runs, axes
) -> None:
    """The MMR diversity pass over a 200-candidate top-N (r13): the
    scale-sensitive half is the broadcast semi-join that fetches the
    candidates' vectors from the sf-scaled embeddings relation (the
    corpus side never shuffles); the greedy loop itself is O(k*N) on
    data tiny by construction. Candidates carry a deterministic
    hash-derived relevance so the row is byte-identical every round.
    Timed inside the call — mmr_rerank materializes eagerly."""
    import time as _time

    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.retrieval import mmr_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ranked = (
        emb.select("vec_id")
        .orderBy("vec_id")
        .limit(200)
        .select(
            "vec_id",
            (F.pmod(F.hash(F.col("vec_id")), F.lit(1000)))
            .cast("double")
            .alias("score"),
        )
    )
    samples = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        df = mmr_rerank(
            ranked, emb, lambda_=0.7, k=20, id_col="vec_id",
            max_candidates=500,
        )
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(_time.perf_counter() - t0, 3))
    axes["mmr_rerank"] = "jvm"  # fetch join + driver loop, no UDF path
    timings["mmr_rerank"] = min(samples)
    runs["mmr_rerank"] = samples


def _bench_retrieval_warm(
    spark, sf_dir: str, reps: int, timings, runs, axes
) -> None:
    """Build the inverted index once (persisted + eagerly filled,
    untimed — a service pays this per corpus version, not per query),
    then time the postings-route BM25 query min-of-reps."""
    import time as _time

    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk,
        build_postings,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings, doc_stats = build_postings(docs)
    postings = postings.persist()
    doc_stats = doc_stats.persist()
    postings.count()
    doc_stats.count()
    samples = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        df = bm25_topk(
            postings, doc_stats, ["hash", "spark", "stream", "vector"], k=10
        )
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(_time.perf_counter() - t0, 3))
    axes["retrieval_warm"] = _plan_axis(df)
    postings.unpersist()
    doc_stats.unpersist()
    timings["retrieval_warm"] = min(samples)
    runs["retrieval_warm"] = samples


def _bench_ivf_pq(spark, sf_dir: str, reps: int, timings, runs, axes) -> None:
    """Build the IVF-PQ index (untimed), persist the encoded corpus,
    time the residual+rerank search min-of-reps."""
    import time as _time

    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import (
        ivf_pq_search,
        pq_encode,
        pq_fit,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    codebooks = pq_fit(assigned, m=8, k=16, centroids=centroids)
    encoded = pq_encode(assigned, codebooks, centroids=centroids).persist()
    encoded.count()
    probes = emb.orderBy("vec_id").limit(16)
    samples = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        df = ivf_pq_search(
            encoded,
            probes,
            centroids,
            codebooks,
            k=10,
            nprobe=4,
            residual=True,
            rerank=50,
        )
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(_time.perf_counter() - t0, 3))
    axes["ivf_pq_search"] = _plan_axis(df)
    encoded.unpersist()
    timings["ivf_pq_search"] = min(samples)
    runs["ivf_pq_search"] = samples


# Fields that belong to the diagnostics line, not the compact tail record.
# The three r13 normalized/decomposed blocks live HERE, not in the compact
# record: 27 long-named rows x 3 blocks pushed the final line past the
# driver's 2,000-byte tail and BENCH_r13.json recorded parsed:null — the
# exact round-6 failure mode the module docstring warns about. They persist
# in the per-sf artifact and the diagnostics line, which is where
# round-over-round normalized comparisons read them from anyway.
_DIAG_KEYS = (
    "queries_normalized",
    "queries_normalized_slope",
    "calibration_decomposed",
    "runs",
    "calibration_runs",
    "calibration_py_runs",
    "spread",
    "prev_artifact",
    "prev_total",
    "drift_vs_prev",
    "drift_vs_prev_normalized",
    "host_drift",
    "host_drift_py",
    "drift_axis",
    "errors",
)


def split_payload(out: dict) -> tuple[dict, dict]:
    """(compact, diagnostics): compact is the driver-parsed tail record and
    must stay bounded (metric/value/unit/sf/queries/incomplete); everything
    sized by REPS or by history goes to diagnostics."""
    compact = {k: v for k, v in out.items() if k not in _DIAG_KEYS}
    diag = {k: v for k, v in out.items() if k in _DIAG_KEYS}
    return compact, diag


def emit(out: dict, stream=None, record_dir: str | None = None) -> None:
    """Print diagnostics first, compact record LAST (the driver parses the
    final line of a bounded tail — see module docstring). Optionally append
    the full payload to the per-sf series under record_dir."""
    stream = stream or sys.stdout
    compact, diag = split_payload(out)
    print(json.dumps({"diagnostics": diag}), file=stream)
    if record_dir:
        # best-effort: a failed optional recording (read-only checkout,
        # full disk) must never kill the machine-read tail record
        try:
            path = _record_artifact(out, record_dir)
            print(json.dumps({"recorded": path}), file=stream)
        except OSError as e:
            print(json.dumps({"record_error": str(e)[:200]}), file=stream)
    print(json.dumps(compact), file=stream)


def _sf_tag(sf) -> str:
    return str(sf).replace("/", "_")


def _record_artifact(out: dict, record_dir: str) -> str:
    """Append the full payload to bench_artifacts/BENCH_sf{sf}_seq{N}.json
    (next free N in this sf's series)."""
    import re

    os.makedirs(record_dir, exist_ok=True)
    tag = _sf_tag(out.get("sf"))
    pat = re.compile(rf"BENCH_sf{re.escape(tag)}_seq(\d+)\.json")
    seqs = [
        int(m.group(1))
        for fn in os.listdir(record_dir)
        if (m := pat.fullmatch(fn))
    ]
    path = os.path.join(
        record_dir, f"BENCH_sf{tag}_seq{(max(seqs) + 1 if seqs else 1):03d}.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return path


def _load_previous_artifact(
    root: str | None = None, sf=None
) -> tuple[str | None, dict | None]:
    """The yardstick drift_vs_prev is computed against.

    Two same-sf series, driver-first: the most recent BENCH_r{N}.json whose
    driver-parsed payload matches `sf` (artifacts with `parsed: null` —
    the r6 truncation casualty — are skipped); if no driver artifact
    matches (e.g. sf1 replica runs the driver never records), fall back to
    the newest self-recorded bench_artifacts/BENCH_sf{sf}_seq{N}.json.
    """
    import re

    root = root or os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str, dict] | None = None
    for fn in os.listdir(root):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        try:
            with open(os.path.join(root, fn)) as f:
                payload = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = payload.get("parsed")
        if not isinstance(parsed, dict) or not parsed.get("queries"):
            continue
        if sf is not None and parsed.get("sf") != sf:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, fn, parsed)
    if best:
        return best[1], best[2]
    # Same-sf self-recorded series (sf1 and other non-driver scales).
    art_dir = os.path.join(root, "bench_artifacts")
    if sf is not None and os.path.isdir(art_dir):
        pat = re.compile(rf"BENCH_sf{re.escape(_sf_tag(sf))}_seq(\d+)\.json")
        local: tuple[int, str, dict] | None = None
        for fn in os.listdir(art_dir):
            m = pat.fullmatch(fn)
            if not m:
                continue
            try:
                with open(os.path.join(art_dir, fn)) as f:
                    payload = json.load(f)
            except (OSError, ValueError):
                continue
            if not payload.get("queries"):
                continue
            n = int(m.group(1))
            if local is None or n > local[0]:
                local = (n, fn, payload)
        if local:
            return os.path.join("bench_artifacts", local[1]), local[2]
    return (None, None)


if __name__ == "__main__":
    main()
