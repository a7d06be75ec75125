"""gap_fill: dense grid per key, LOCF / linear fills — pinned against a
pure-pandas oracle and checked edge-by-edge (leading/trailing gaps,
null values inside observed buckets, global pinned grids, plan shape).
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.timeseries import gap_fill

HOUR = 3_600_000


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)


def _naive(h, m=0):
    # Spark returns session-zone-naive datetimes (session pinned UTC)
    return datetime(2024, 1, 1, h, m)


def _rows(df):
    return sorted(
        (
            r["key"],
            r["bucket_start"],
            None if r["v"] is None else round(r["v"], 9),
            r["is_gap"],
        )
        for r in df.collect()
    )


@pytest.fixture()
def obs(spark):
    # key a: hours 1, 4 (gap 2-3); key b: single observation
    data = [
        ("a", _ts(1, 0), 10.0),
        ("a", _ts(4, 0), 40.0),
        ("b", _ts(2, 30), 5.0),
    ]
    return spark.createDataFrame(data, "key string, ts timestamp, v double")


def test_null_fill_plants_gaps(spark, obs):
    got = _rows(gap_fill(obs, "ts", ["key"], ["v"], "1 hour", fill="null"))
    assert got == [
        ("a", _naive(1), 10.0, False),
        ("a", _naive(2), None, True),
        ("a", _naive(3), None, True),
        ("a", _naive(4), 40.0, False),
        ("b", _naive(2), 5.0, False),
    ]


def test_locf_carries_forward_only(spark, obs):
    got = _rows(gap_fill(obs, "ts", ["key"], ["v"], "1 hour", fill="locf"))
    assert got == [
        ("a", _naive(1), 10.0, False),
        ("a", _naive(2), 10.0, True),
        ("a", _naive(3), 10.0, True),
        ("a", _naive(4), 40.0, False),
        ("b", _naive(2), 5.0, False),
    ]


def test_linear_interpolates_on_true_event_times(spark, obs):
    got = _rows(gap_fill(obs, "ts", ["key"], ["v"], "1 hour", fill="linear"))
    # anchors at t=01:00 (10.0) and t=04:00 (40.0); bucket midpoints
    # 02:30 and 03:30 -> 10 + 30 * (1.5/3), 10 + 30 * (2.5/3)
    assert got == [
        ("a", _naive(1), 10.0, False),
        ("a", _naive(2), 25.0, True),
        ("a", _naive(3), 35.0, True),
        ("a", _naive(4), 40.0, False),
        ("b", _naive(2), 5.0, False),
    ]


def test_linear_edges_fall_back_one_sided(spark):
    df = spark.createDataFrame(
        [("k", _ts(2), 20.0), ("k", _ts(5), 50.0)],
        "key string, ts timestamp, v double",
    )
    got = _rows(
        gap_fill(
            df, "ts", ["key"], ["v"], "1 hour", fill="linear",
            start=_ts(0), end=_ts(7),
        )
    )
    # leading gaps take the next observation, trailing the previous
    assert [g for g in got if g[1] < _naive(2)] == [
        ("k", _naive(0), 20.0, True),
        ("k", _naive(1), 20.0, True),
    ]
    assert [g for g in got if g[1] > _naive(5)] == [
        ("k", _naive(6), 50.0, True),
        ("k", _naive(7), 50.0, True),
    ]


def test_null_value_in_observed_bucket_fills_but_not_gap(spark):
    df = spark.createDataFrame(
        [("k", _ts(1), 10.0), ("k", _ts(2), None), ("k", _ts(3), 30.0)],
        "key string, ts timestamp, v double",
    )
    locf = _rows(gap_fill(df, "ts", ["key"], ["v"], "1 hour", fill="locf"))
    assert locf == [
        ("k", _naive(1), 10.0, False),
        ("k", _naive(2), 10.0, False),  # filled, but NOT a grid gap
        ("k", _naive(3), 30.0, False),
    ]
    lin = _rows(gap_fill(df, "ts", ["key"], ["v"], "1 hour", fill="linear"))
    # bucket-2 midpoint is 02:30 between anchors 01:00/03:00 -> 0.75
    assert lin[1] == ("k", _naive(2), 25.0, False)


def test_multiple_obs_per_bucket_average_and_pandas_oracle(spark):
    """Randomized series vs an independent pandas implementation."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(29)
    rows = []
    for key in ("x", "y", "z"):
        t = 0
        for _ in range(40):
            t += int(rng.integers(1, 4 * HOUR))
            rows.append(
                (key, datetime.fromtimestamp(t / 1000, tz=timezone.utc),
                 float(rng.normal()))
            )
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    got = {
        (r["key"], int(r["bucket_start"].replace(
            tzinfo=timezone.utc).timestamp() * 1000)): (
            round(r["v"], 9), r["is_gap"])
        for r in gap_fill(
            df, "ts", ["key"], ["v"], "1 hour", fill="locf"
        ).collect()
    }

    pdf = pd.DataFrame(rows, columns=["key", "ts", "v"])
    pdf["ms"] = (pdf["ts"].astype("int64") // 10**6)
    pdf["b"] = pdf["ms"] // HOUR * HOUR
    want = {}
    for key, g in pdf.groupby("key"):
        per_b = g.groupby("b")["v"].mean()
        last = None
        for b in range(int(g["b"].min()), int(g["b"].max()) + HOUR, HOUR):
            if b in per_b.index:
                last = per_b[b]
                want[(key, b)] = (round(last, 9), False)
            else:
                want[(key, b)] = (
                    None if last is None else round(last, 9), True)
    assert got == want


def test_plan_is_codegen_and_validates(spark, obs):
    out = gap_fill(obs, "ts", ["key"], ["v"], "1 hour", fill="linear")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python in the fill path
    with pytest.raises(ValueError, match="fill must be"):
        gap_fill(obs, "ts", ["key"], ["v"], "1 hour", fill="spline")
    with pytest.raises(ValueError, match="step"):
        gap_fill(obs, "ts", ["key"], ["v"], "3 fortnights")
    with pytest.raises(ValueError, match="non-empty"):
        gap_fill(obs, "ts", [], ["v"])


def test_locf_matches_duckdb_cross_engine(spark, sf_dir):
    """Cross-engine pin on real data: the LOCF gap-fill over the events
    table equals an independent DuckDB formulation (generate_series grid
    + last_value IGNORE NULLS) bucket-for-bucket."""
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "ts", "value"
    )
    got = {
        (
            r["event_type"],
            int(
                r["bucket_start"].replace(tzinfo=timezone.utc).timestamp()
                * 1000
            ),
        ): (None if r["value"] is None else round(r["value"], 9), r["is_gap"])
        for r in gap_fill(
            ev, "ts", ["event_type"], ["value"], "1 hour", fill="locf"
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW obs AS SELECT event_type AS key, ts, value AS v "
        f"FROM '{sf_dir}/events.parquet'"
    )
    want = {
        (r[0], int(r[1])): (
            None if r[2] is None else round(r[2], 9),
            bool(r[3]),
        )
        for r in con.execute(
            """
            SELECT g.key, g.bk,
                   last_value(b.v IGNORE NULLS) OVER (
                       PARTITION BY g.key ORDER BY g.bk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS v,
                   b.bk IS NULL AS is_gap
            FROM (
              SELECT s.key,
                     unnest(range(s.lo, s.hi + 3600000, 3600000::bigint))
                         AS bk
              FROM (SELECT key, min(bk) lo, max(bk) hi FROM (
                      SELECT key,
                             epoch_ms(ts) // 3600000 * 3600000 AS bk
                      FROM obs WHERE ts IS NOT NULL AND key IS NOT NULL
                    ) GROUP BY key) s
            ) g
            LEFT JOIN (
              SELECT key, epoch_ms(ts) // 3600000 * 3600000 AS bk,
                     avg(v) AS v
              FROM obs WHERE ts IS NOT NULL AND key IS NOT NULL
              GROUP BY 1, 2
            ) b USING (key, bk)
            """
        ).fetchall()
    }
    assert len(got) > 0
    assert got == want


def test_pre_epoch_timestamps_floor_toward_minus_inf(spark):
    """Negative epoch millis must bucket by FLOOR (toward -inf), not
    truncation — a 23:30 observation on 1969-12-31 belongs to the
    23:00 bucket, not midnight."""
    df = spark.createDataFrame(
        [("k", datetime(1969, 12, 31, 23, 30, tzinfo=timezone.utc), 1.0),
         ("k", datetime(1970, 1, 1, 1, 30, tzinfo=timezone.utc), 3.0)],
        "key string, ts timestamp, v double",
    )
    got = sorted(
        (r["bucket_start"], r["v"], r["is_gap"])
        for r in gap_fill(
            df, "ts", ["key"], ["v"], "1 hour", fill="locf"
        ).collect()
    )
    assert got == [
        (datetime(1969, 12, 31, 23), 1.0, False),
        (datetime(1970, 1, 1, 0), 1.0, True),
        (datetime(1970, 1, 1, 1), 3.0, False),
    ]


def test_one_sided_start_drops_keys_entirely_before_window(spark):
    """start pinned, end open (the live-dashboard shape): a key whose
    observations all PRECEDE start has an empty grid window and must be
    dropped — not crash the job with sequence(lo > hi) (ADVICE r8)."""
    df = spark.createDataFrame(
        [("stale", _ts(1), 1.0),       # entirely before the window
         ("live", _ts(3), 3.0),
         ("live", _ts(5), 5.0)],
        "key string, ts timestamp, v double",
    )
    start = int(_ts(4).timestamp() * 1000)
    got = _rows(gap_fill(df, "ts", ["key"], ["v"], "1 hour",
                         fill="locf", start=start))
    # stale key gone; live key's grid clipped to [start, max]; the
    # hour-3 observation precedes the window, so bucket 4 is a LEADING
    # gap (out-of-window observations never feed fills)
    assert got == [("live", _naive(4), None, True),
                   ("live", _naive(5), 5.0, False)]


def test_one_sided_end_drops_keys_entirely_after_window(spark):
    df = spark.createDataFrame(
        [("future", _ts(9), 9.0),      # entirely after the window
         ("live", _ts(1), 1.0),
         ("live", _ts(3), 3.0)],
        "key string, ts timestamp, v double",
    )
    end = int(_ts(2).timestamp() * 1000)
    got = _rows(gap_fill(df, "ts", ["key"], ["v"], "1 hour",
                         fill="locf", end=end))
    assert got == [("live", _naive(1), 1.0, False),
                   ("live", _naive(2), 1.0, True)]


def test_inverted_pinned_window_raises(spark, obs):
    with pytest.raises(ValueError, match="precedes"):
        gap_fill(obs, "ts", ["key"], ["v"], "1 hour",
                 start=int(_ts(5).timestamp() * 1000),
                 end=int(_ts(2).timestamp() * 1000))


# ---------------------------------------------------------------------------
# robust_outliers (Hampel / modified z-score filter)
# ---------------------------------------------------------------------------

def test_robust_outliers_flags_only_true_outliers(spark):
    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    # key a: tight series around 10 with one spike; key b: all constant
    # (MAD 0 -> any deviation flags); nulls ignored everywhere
    rows = [("a", i, v) for i, v in enumerate(
        [9.0, 10.0, 10.0, 10.0, 11.0, 10.0, 500.0, 10.0, None]
    )] + [("b", i, 7.0) for i in range(5)] + [("b", 99, 7.5)]
    df = spark.createDataFrame(rows, "key string, i long, x double")
    got = robust_outliers(df, ["key"], "x", k=3.5)
    flagged = sorted((r["key"], r["i"]) for r in got.collect())
    # a: median 10; deviations sorted [0,0,0,0,0,1,1,490] -> MAD 0, so
    # every deviating row flags (9.0, 11.0, 500.0) — the documented
    # degenerate behavior when over half the series sits ON the median
    # b: median 7, MAD 0 -> the 7.5 row deviates and flags
    assert flagged == [("a", 0), ("a", 4), ("a", 6), ("b", 99)]
    row_a = next(r for r in got.collect() if r["i"] == 6)
    assert (row_a["med"], row_a["mad"]) == (10.0, 0.0)


def test_robust_outliers_preserves_columns_and_validates(spark):
    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    df = spark.createDataFrame(
        [("a", "t1", 1.0), ("a", "t2", 100.0), ("a", "t3", 1.0),
         ("a", "t4", 1.2), ("a", "t5", 0.8)],
        "key string, tag string, x double",
    )
    out = robust_outliers(df, ["key"], "x")
    assert set(out.columns) == {"key", "tag", "x", "med", "mad"}
    assert [r["tag"] for r in out.collect()] == ["t2"]
    with pytest.raises(ValueError, match="non-empty"):
        robust_outliers(df, [], "x")


def test_robust_outliers_even_count_interpolated_median(spark):
    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    # even count: median interpolates (2.0+4.0)/2 = 3.0; deviations
    # |x-3| sorted [1,1,1,2,2,97] -> MAD (1+2)/2 = 1.5 -> cut 5.25
    # flags only the 100
    df = spark.createDataFrame(
        [("k", float(v)) for v in [1, 2, 4, 5, 100, 2]],
        "key string, x double",
    )
    got = [(r["x"], r["med"], r["mad"]) for r in
           robust_outliers(df, ["key"], "x", k=3.5).collect()]
    assert got == [(100.0, 3.0, 1.5)]


def test_robust_outliers_approx_mode_flags_gross_outliers(spark):
    """approx=True (the bounded-memory 100TB path: percentile_approx
    sketch instead of the value-buffering exact median) must agree with
    exact mode away from the threshold boundary."""
    import numpy as np

    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    rng = np.random.default_rng(7)
    base = [("k", float(v)) for v in rng.normal(50, 2, 2000)]
    spikes = [("k", 1e6), ("k", -1e6)]
    df = spark.createDataFrame(base + spikes, "key string, x double")
    for approx in (False, True):
        got = sorted(
            r["x"] for r in
            robust_outliers(df, ["key"], "x", k=6.0, approx=approx).collect()
        )
        assert got[0] == -1e6 and got[-1] == 1e6, approx
        # a 6-sigma-equivalent cut on N(50,2) flags essentially nothing
        # else at n=2000
        assert len(got) <= 4, (approx, len(got))


def test_robust_outliers_selection_method_identical_to_buffer(spark):
    """method="selection" (exact distributed-selection medians — the
    keeps-the-cluster-busy tier) must reproduce the default buffer
    path's flagged rows, med, and mad EXACTLY: both are exact
    interpolated medians, only the physical plan differs."""
    import numpy as np

    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    rng = np.random.default_rng(11)
    rows = []
    for key, n in (("a", 501), ("b", 64), ("c", 1)):
        rows += [(key, float(v)) for v in rng.normal(10, 3, n)]
    rows += [("a", 500.0), ("b", -500.0), ("a", None)]
    df = spark.createDataFrame(rows, "key string, x double").repartition(9)

    def run(method):
        return sorted(
            (r["key"], r["x"], r["med"], r["mad"])
            for r in robust_outliers(
                df, ["key"], "x", k=4.0, method=method
            ).collect()
        )

    buf, sel = run("buffer"), run("selection")
    assert buf == sel
    assert {(k, x) for k, x, *_ in buf} >= {("a", 500.0), ("b", -500.0)}


def test_robust_outliers_hist_method_identical_to_buffer(spark):
    """method="hist" (r12: one (key, value)->count histogram serves
    BOTH medians via weighted_percentiles) must reproduce the buffer
    path's flagged rows, med, and mad EXACTLY — same exact interpolated
    medians, one fewer full-data pass. Shapes cover ties, heavy
    repetition (the telemetry regime the tier exists for), a
    single-row key, nulls, and gross outliers."""
    import numpy as np

    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    rng = np.random.default_rng(23)
    rows = []
    for key, n in (("a", 401), ("b", 64), ("c", 1)):
        # quantized values -> heavy repetition per key
        rows += [(key, float(round(v))) for v in rng.normal(10, 3, n)]
    rows += [("a", 500.0), ("b", -500.0), ("a", None)]
    df = spark.createDataFrame(rows, "key string, x double").repartition(9)

    def run(method):
        return sorted(
            (r["key"], r["x"], r["med"], r["mad"])
            for r in robust_outliers(
                df, ["key"], "x", k=4.0, method=method
            ).collect()
        )

    buf, hist = run("buffer"), run("hist")
    assert buf == hist
    assert {(k, x) for k, x, *_ in buf} >= {("a", 500.0), ("b", -500.0)}

def test_robust_outliers_auto_resolves_once_and_matches_buffer(spark):
    """method="auto" (r13): the tier resolves ONCE at the
    robust_outliers level with reuse_stats=2 (the Hampel filter's two
    order statistics are exactly the reuse the hist tier's saving
    depends on) — previously "auto" leaked into each grouped_median
    call and paid one probe per statistic. Whatever the probe picks,
    values equal the buffer tier (every tier is exact)."""
    import numpy as np

    from local_pubchem_db_spark.operators import percentiles as pct
    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    rng = np.random.default_rng(31)
    rows = [
        (key, float(round(v)))
        for key, n in (("a", 300), ("b", 120))
        for v in rng.normal(50, 4, n)
    ] + [("a", 900.0), ("b", -900.0)]
    df = spark.createDataFrame(rows, "key string, x double").repartition(5)

    calls = []
    orig = pct.choose_percentile_method

    def spy(df_, keys, val, **kw):
        calls.append(kw)
        return orig(df_, keys, val, **kw)

    try:
        pct.choose_percentile_method = spy
        auto = sorted(
            (r["key"], r["x"], r["med"], r["mad"])
            for r in robust_outliers(
                df, ["key"], "x", k=4.0, method="auto"
            ).collect()
        )
    finally:
        pct.choose_percentile_method = orig
    assert len(calls) == 1, calls
    assert calls[0].get("reuse_stats") == 2
    buf = sorted(
        (r["key"], r["x"], r["med"], r["mad"])
        for r in robust_outliers(
            df, ["key"], "x", k=4.0, method="buffer"
        ).collect()
    )
    assert auto == buf


def test_robust_outliers_auto_picks_hist_on_compressed_telemetry(spark):
    """The graded ts_outliers regime in miniature: repeating values
    (distinct pairs << rows) and two statistics -> the auto path takes
    the hist branch when thresholds allow, and its values still equal
    buffer bit-for-bit."""
    import numpy as np

    from local_pubchem_db_spark.operators import percentiles as pct
    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    rng = np.random.default_rng(7)
    rows = [
        ("a", float(round(v))) for v in rng.normal(10, 2, 2000)
    ] + [("a", 300.0)]
    df = spark.createDataFrame(rows, "key string, x double").repartition(4)

    calls = []
    orig = pct.choose_percentile_method

    def spy(df_, keys, val, **kw):
        kw["hist_min_rows"] = 100  # production floor is 2M; scale down
        m = orig(df_, keys, val, **kw)
        calls.append(m)
        return m

    try:
        pct.choose_percentile_method = spy
        auto = sorted(
            (r["key"], r["x"], r["med"], r["mad"])
            for r in robust_outliers(
                df, ["key"], "x", k=4.0, method="auto"
            ).collect()
        )
    finally:
        pct.choose_percentile_method = orig
    assert calls == ["hist"], calls
    buf = sorted(
        (r["key"], r["x"], r["med"], r["mad"])
        for r in robust_outliers(
            df, ["key"], "x", k=4.0, method="buffer"
        ).collect()
    )
    assert auto == buf


def test_robust_outliers_hist_no_forced_broadcast(spark):
    """ADVICE r12: the hist path must not FORCE a broadcast of the
    per-key median relation — for a high-cardinality key that hint can
    exceed the broadcast limit or OOM, and AQE broadcasts a genuinely
    small relation from runtime stats anyway. Pinned on the optimized
    logical plan: no ResolvedHint survives."""
    from local_pubchem_db_spark.operators.timeseries import robust_outliers

    df = spark.createDataFrame(
        [("a", float(i % 7)) for i in range(200)], "key string, x double"
    )
    out = robust_outliers(df, ["key"], "x", k=3.0, method="hist")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan, plan
