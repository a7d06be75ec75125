"""bench.py helper contracts (no Spark needed): the drift yardstick must
pick the highest parsed round and skip unparsed/corrupt artifacts — the
r4 artifact was parsed:null and must never become the baseline."""

import json


def test_load_previous_artifact_picks_highest_parsed(tmp_path):
    from bench import _load_previous_artifact

    def write(n, payload):
        (tmp_path / f"BENCH_r{n}.json").write_text(json.dumps(payload))

    write(3, {"parsed": {"value": 9.6, "sf": 0.1, "queries": {"q": 1.0}}})
    write(4, {"parsed": None, "rc": 1})  # the r4 shape: never a baseline
    write(5, {"parsed": {"value": 11.5, "sf": 0.1, "queries": {"q": 1.2}}})
    (tmp_path / "BENCH_r6.json").write_text("{corrupt")  # unreadable
    (tmp_path / "BENCH_rX.json").write_text("{}")  # non-matching name

    name, parsed = _load_previous_artifact(str(tmp_path))
    assert name == "BENCH_r5.json"
    assert parsed["value"] == 11.5 and parsed["queries"] == {"q": 1.2}


def test_load_previous_artifact_empty_dir(tmp_path):
    from bench import _load_previous_artifact

    assert _load_previous_artifact(str(tmp_path)) == (None, None)


def test_loader_picks_own_round_over_unparseable_sibling(tmp_path):
    """The r6 regression, pinned: with an unparseable (parsed: null) r6
    sibling present, a parsed r7 artifact must be the yardstick."""
    from bench import _load_previous_artifact

    (tmp_path / "BENCH_r6.json").write_text(
        json.dumps({"parsed": None, "raw_tail": '..."queries": {"q": 1.0}}'})
    )
    (tmp_path / "BENCH_r7.json").write_text(
        json.dumps({"parsed": {"value": 9.1, "sf": 0.1, "queries": {"q": 0.9}}})
    )
    name, parsed = _load_previous_artifact(str(tmp_path), sf=0.1)
    assert name == "BENCH_r7.json"
    assert parsed["value"] == 9.1


def test_loader_filters_by_sf_and_falls_back_to_local_series(tmp_path):
    """sf1 runs have no driver artifacts: the loader must skip the sf0.1
    driver series and pick the newest self-recorded same-sf artifact."""
    from bench import _load_previous_artifact

    (tmp_path / "BENCH_r5.json").write_text(
        json.dumps({"parsed": {"value": 11.5, "sf": 0.1, "queries": {"q": 1.2}}})
    )
    art = tmp_path / "bench_artifacts"
    art.mkdir()
    (art / "BENCH_sf1.0_seq001.json").write_text(
        json.dumps({"value": 49.1, "sf": 1.0, "queries": {"q": 40.0}})
    )
    (art / "BENCH_sf1.0_seq002.json").write_text(
        json.dumps({"value": 36.0, "sf": 1.0, "queries": {"q": 30.0}})
    )
    name, parsed = _load_previous_artifact(str(tmp_path), sf=1.0)
    assert name.endswith("BENCH_sf1.0_seq002.json")
    assert parsed["value"] == 36.0
    # and the sf0.1 path still prefers the driver series
    name01, parsed01 = _load_previous_artifact(str(tmp_path), sf=0.1)
    assert name01 == "BENCH_r5.json" and parsed01["value"] == 11.5


def test_emit_compact_record_is_last_line_and_bounded(tmp_path):
    """The driver parses the FINAL line of a bounded stdout tail: emit()
    must print the compact record last, keep it small, and push runs/
    drift/spread to an earlier diagnostics line."""
    import io

    from bench import emit

    out = {
        "metric": "headline_total",
        "value": 9.1,
        "unit": "sec",
        "queries": {f"q{i}": 0.5 for i in range(16)},
        "runs": {f"q{i}": [0.5, 0.6, 0.7] * 20 for i in range(16)},
        "spread": {f"q{i}": 1.4 for i in range(16)},
        "drift_vs_prev": {f"q{i}": 0.9 for i in range(16)},
        "prev_artifact": "BENCH_r5.json",
        "prev_total": 11.5,
        "sf": 0.1,
    }
    buf = io.StringIO()
    emit(out, stream=buf, record_dir=str(tmp_path / "bench_artifacts"))
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert last["value"] == 9.1 and len(last["queries"]) == 16
    assert "runs" not in last and "drift_vs_prev" not in last
    assert len(lines[-1]) < 2000  # bounded regardless of diagnostics size
    diag = json.loads(lines[0])["diagnostics"]
    assert diag["runs"] and diag["drift_vs_prev"]
    # full payload recorded to the per-sf series
    rec = json.loads(
        (tmp_path / "bench_artifacts" / "BENCH_sf0.1_seq001.json").read_text()
    )
    assert rec["runs"] and rec["value"] == 9.1
    # a second emit appends seq002, not overwrite
    emit(out, stream=io.StringIO(), record_dir=str(tmp_path / "bench_artifacts"))
    assert (tmp_path / "bench_artifacts" / "BENCH_sf0.1_seq002.json").exists()


def test_compute_drift_normalization_arithmetic():
    """Normalized drift = raw drift / host-drift factor: a query that is
    1.3x slower on a host whose calibration also ran 1.3x slower has
    normalized drift 1.0 (pure host noise); an isolated regression keeps
    its ratio. No calibration on either side -> normalized is None."""
    from bench import compute_drift

    timings = {"q1": 1.3, "q2": 2.6, "q3": 0.5}
    prev = {"q1": 1.0, "q2": 1.0, "q4": 9.9}
    raw, norm = compute_drift(timings, prev, cal=0.26, prev_cal=0.2)
    assert raw == {"q1": 1.3, "q2": 2.6}  # q3/q4 unmatched -> dropped
    assert norm == {"q1": 1.0, "q2": 2.0}  # host factor 1.3 divided out
    raw2, norm2 = compute_drift(timings, prev)
    assert raw2 == raw and norm2 is None
    # prev artifact without calibration (pre-r8): raw only
    assert compute_drift(timings, prev, cal=0.3, prev_cal=None)[1] is None


def test_emit_keeps_calibration_in_compact_record(tmp_path):
    """The compact (driver-parsed) record must carry `calibration` —
    next round's normalization reads it from the parsed payload — while
    calibration_runs / host_drift / normalized drift stay diagnostics."""
    import io

    from bench import emit

    out = {
        "metric": "headline_total",
        "value": 9.1,
        "unit": "sec",
        "queries": {"q1": 0.5},
        "calibration": 0.21,
        "calibration_runs": [0.5, 0.22, 0.21],
        "host_drift": 1.05,
        "drift_vs_prev_normalized": {"q1": 1.0},
        "sf": 0.1,
    }
    buf = io.StringIO()
    emit(out, stream=buf)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert last["calibration"] == 0.21
    assert "calibration_runs" not in last and "host_drift" not in last
    diag = json.loads(lines[0])["diagnostics"]
    assert diag["calibration_runs"] and diag["host_drift"] == 1.05
    assert diag["drift_vs_prev_normalized"] == {"q1": 1.0}


def test_compute_drift_per_axis_normalization():
    """r11 (verdict Next #2): rows whose plan crosses the Python worker
    normalize by the PYTHON calibration axis, pure-JVM rows by the JVM
    axis — host drift isolated to one path no longer reads as an engine
    regression in the other. Without py-axis data, everything falls
    back to the JVM factor (the pre-r11 behavior)."""
    from bench import compute_drift

    timings = {"jvm_q": 1.3, "py_q": 1.5}
    prev = {"jvm_q": 1.0, "py_q": 1.0}
    axes = {"jvm_q": "jvm", "py_q": "py"}
    # JVM host drifted 1.3x, the Python worker path drifted 1.5x:
    # with per-axis normalization both rows are pure host noise (1.0)
    raw, norm = compute_drift(
        timings, prev, cal=0.26, prev_cal=0.2,
        cal_py=0.6, prev_cal_py=0.4, axes=axes,
    )
    assert raw == {"jvm_q": 1.3, "py_q": 1.5}
    assert norm == {"jvm_q": 1.0, "py_q": 1.0}
    # no py calibration in either artifact: everything on the JVM axis
    _, norm2 = compute_drift(
        timings, prev, cal=0.26, prev_cal=0.2, axes=axes,
    )
    assert norm2["jvm_q"] == 1.0 and abs(norm2["py_q"] - 1.154) < 1e-3

def test_queries_normalized_per_axis_and_cold_flag_in_compact(tmp_path):
    """r13 (verdict Next #7 + #3): the compact record must carry (a)
    queries_normalized — each row divided by ITS axis's calibration, so
    rounds compare without hand-normalization — and (b) the cold flag
    that labels a page-cache-evicted run in the scale series."""
    import io

    from bench import emit

    out = {
        "metric": "headline_total",
        "value": 2.0,
        "unit": "sec",
        "queries": {"jvm_q": 1.0, "py_q": 1.0},
        "queries_normalized": {"jvm_q": 2.0, "py_q": 2.5},
        "cold": True,
        "calibration": 0.5,
        "calibration_py": 0.4,
        "runs": {"jvm_q": [1.0], "py_q": [1.0]},
        "sf": 0.1,
    }
    buf = io.StringIO()
    emit(out, stream=buf)
    last = json.loads(
        [ln for ln in buf.getvalue().splitlines() if ln.strip()][-1]
    )
    # r14: queries_normalized moved to the DIAGNOSTICS line — riding the
    # compact record blew the driver's 2,000-byte tail in r13
    # (BENCH_r13.json parsed:null). The cold flag is tiny and stays.
    assert "queries_normalized" not in last
    assert last["cold"] is True
    diag = json.loads(
        [ln for ln in buf.getvalue().splitlines() if ln.strip()][0]
    )["diagnostics"]
    assert diag["queries_normalized"] == {"jvm_q": 2.0, "py_q": 2.5}


def test_evict_page_cache_walks_and_survives_errors(tmp_path):
    """evict_page_cache: best-effort fadvise over every file; unreadable
    entries are skipped, the count reports what was evicted."""
    from bench import evict_page_cache

    d = tmp_path / "sf"
    (d / "sub").mkdir(parents=True)
    (d / "a.parquet").write_bytes(b"x" * 1024)
    (d / "sub" / "b.parquet").write_bytes(b"y" * 2048)
    assert evict_page_cache(str(d)) == 2


def test_decompose_calibration_slope_intercept_and_fallback():
    """r13 (round gap #5): the two-point decomposition models
    t = intercept + slope * units from the same probe at 1x and 4x —
    slope is the marginal cost of three more units, the pure
    compute-speed divisor that stops a fast host's fixed-overhead
    FRACTION from over-correcting every normalized row (the §8d
    signature). Noise-inverted probes (t4 <= t1) decompose to None so
    consumers fall back to whole-probe normalization."""
    from bench import decompose_calibration

    d = decompose_calibration(0.40, 1.00, scale_big=4)
    assert d == {"slope": 0.2, "intercept": 0.2}
    # pure-compute probe (no overhead): intercept ~ 0
    d2 = decompose_calibration(0.25, 1.00, scale_big=4)
    assert d2["slope"] == 0.25 and d2["intercept"] == 0.0
    # 16x denominator: slope = (t16 - t1) / 15
    d3 = decompose_calibration(0.5, 2.0, 16)
    assert d3["slope"] == 0.1 and d3["intercept"] == 0.4
    assert decompose_calibration(0.5, 0.5, 16) is None
    assert decompose_calibration(0.5, 0.4, 16) is None
    assert decompose_calibration(None, 1.0, 16) is None
    assert decompose_calibration(0.0, 1.0, 16) is None


def test_queries_normalized_slope_rides_diagnostics_line():
    """r14 (verdict Next #1): the slope-normalized block and the
    decomposition ride the DIAGNOSTICS line and the per-sf artifact, NOT
    the compact record — the r13 test that pinned them to the compact
    record is exactly what pushed the final line past the driver's
    2,000-byte tail and nulled BENCH_r13.json. Cross-round comparisons
    read the diagnostics line / artifact series, which both carry the
    full payload."""
    import io

    from bench import emit

    out = {
        "metric": "headline_total",
        "value": 2.0,
        "unit": "sec",
        "queries": {"q": 1.0},
        "queries_normalized": {"q": 2.0},
        "queries_normalized_slope": {"q": 5.0},
        "calibration_decomposed": {
            "jvm": {"slope": 0.2, "intercept": 0.3},
            "py": None,
        },
        "calibration": 0.5,
        "runs": {"q": [1.0]},
        "sf": 0.1,
    }
    buf = io.StringIO()
    emit(out, stream=buf)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert "queries_normalized_slope" not in last
    assert "calibration_decomposed" not in last
    assert "runs" not in last
    assert last["calibration"] == 0.5  # scalar calibration stays compact
    diag = json.loads(lines[0])["diagnostics"]
    assert diag["queries_normalized_slope"] == {"q": 5.0}
    assert diag["calibration_decomposed"]["jvm"]["slope"] == 0.2


def test_emit_production_shaped_compact_record_fits_driver_tail(tmp_path):
    """r14 (verdict Next #1): the r13 bounded-record test passed on a
    synthetic payload (16 two-char names, none of the new blocks) while
    the PRODUCTION record overflowed. This test builds the production
    shape — 27 real headline query names, all three normalized/decomposed
    blocks, a past_cap_oracle summary, cold flag, every calibration
    scalar — and asserts the final line stays under 1,800 bytes with
    margin below the driver's 2,000-byte tail."""
    import io

    from bench import HEADLINE, emit

    # HEADLINE plus every aux/warm row a production run adds (the r13
    # driver record had 27 rows; the synthetic 16-short-name payload of
    # the old test is what let the overflow through).
    names = list(HEADLINE) + [
        "dedup_minhash_lsh_warm",
        "gap_fill",
        "ivf_pq_search",
        "ivf_pq_persisted",
        "mmr_rerank",
        "retrieval_warm",
        "retrieval_topk",
        "ts_outliers",
        "token_drift",
        "pct_selection",
        "retrieval_bucketed",
        "hybrid_warm",
        "hybrid_batch",
    ]
    assert len(names) >= 28, "production payload under-modeled"
    out = {
        "metric": "headline_total",
        "value": 17.712,
        "unit": "sec",
        "queries": {q: 1.234 for q in names},
        "queries_normalized": {q: 1.234 for q in names},
        "queries_normalized_slope": {q: 1.234 for q in names},
        "calibration_decomposed": {
            "jvm": {"slope": 0.207, "intercept": 0.331},
            "py": {"slope": 0.114, "intercept": 0.207},
        },
        "cold": False,
        "calibration": 0.744,
        "calibration_py": 0.512,
        "runs": {q: [1.234, 1.345, 1.456] for q in names},
        "calibration_runs": [0.7, 0.71, 0.74],
        "calibration_py_runs": [0.5, 0.51, 0.52],
        "spread": {q: 1.18 for q in names},
        "drift_vs_prev": {q: 1.05 for q in names},
        "drift_vs_prev_normalized": {q: 0.95 for q in names},
        "prev_artifact": "BENCH_sf0.1_seq034.json",
        "prev_total": 11.44,
        "host_drift": 1.21,
        "host_drift_py": 1.18,
        "drift_axis": "uniform",
        "drift_verdict": "isolated:dedup_minhash_lsh,retrieval_topk",
        "past_cap_oracle": {
            "ok": 55,
            "rows_only": 4,
            "fail": 0,
            "entries": 59,
            "failed": [],
        },
        "sf": 0.1,
    }
    buf = io.StringIO()
    emit(out, stream=buf, record_dir=str(tmp_path / "bench_artifacts"))
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert last["value"] == 17.712 and len(last["queries"]) == len(names)
    assert len(lines[-1]) < 1800, len(lines[-1])
    # the full payload still survives in the artifact series
    rec = json.loads(
        (tmp_path / "bench_artifacts" / "BENCH_sf0.1_seq001.json").read_text()
    )
    assert rec["queries_normalized_slope"] and rec["runs"]


def test_slope_normalized_per_axis_fallback():
    """r13 review finding: a row whose OWN axis failed to decompose
    must be OMITTED from the slope block (whole-probe normalization is
    its fallback), never normalized by the other axis's ~5x-different
    slope — that cross-axis substitution would record a scale shift
    indistinguishable from a huge regression on an untouched query."""
    from bench import slope_normalized

    timings = {"j": 1.0, "p": 1.0}
    axes = {"j": "jvm", "p": "py"}
    both = {"jvm": {"slope": 0.001}, "py": {"slope": 0.005}}
    assert slope_normalized(timings, axes, both) == {
        "j": 1000.0, "p": 200.0
    }
    py_failed = {"jvm": {"slope": 0.001}, "py": None}
    assert slope_normalized(timings, axes, py_failed) == {"j": 1000.0}
    jvm_failed = {"jvm": None, "py": {"slope": 0.005}}
    assert slope_normalized(timings, axes, jvm_failed) == {"p": 200.0}
    assert slope_normalized(timings, axes, {"jvm": None, "py": None}) == {}


def test_drift_verdict_classifier():
    """r15 (VERDICT r14 What's-missing #4): the §11 host-vs-real
    protocol as ONE recorded line — slope-basis medians, burst-aware
    isolation, axis-flip exclusion, basis-tagged fallbacks."""
    from bench import drift_verdict

    now = {f"q{i}": 1.05 for i in range(10)}
    prev = {f"q{i}": 1.0 for i in range(10)}
    tight = {f"q{i}": 1.05 for i in range(10)}

    # uniform sub-band drift -> host
    assert drift_verdict(now, prev, tight) == "host"

    # one row drifts 1.8x with TIGHT own-spread -> named
    now2 = dict(now, q3=1.8)
    assert drift_verdict(now2, prev, tight) == "isolated:q3"

    # same drifted row but its own samples spread 1.9x (it ran inside a
    # host burst) -> drift number is soft, NOT named
    wide = dict(tight, q3=1.9)
    assert drift_verdict(now2, prev, wide) == "host"

    # whole-level shift >= 1.2x median -> elevated, regardless of rows
    up = {q: 1.3 for q in now}
    v = drift_verdict(up, prev, tight)
    assert v.startswith("elevated_median:1.3")

    # axis-flipped rows are excluded from the comparison (their ratio
    # mixes execution paths): flipping the ONLY drifted row back to
    # host-band median and no isolation
    axes = {q: "jvm" for q in now}
    prev_axes = dict(axes, q3="py")
    assert drift_verdict(now2, prev, tight, axes=axes, prev_axes=prev_axes) == "host"

    # missing slope blocks -> ordered fallbacks, basis tagged
    fb = ("raw", {q: 1.02 for q in now})
    assert drift_verdict({}, {}, tight, fallbacks=(("norm", None), fb)) == (
        "host [raw-basis]"
    )

    # r15 review finding: the axis-flip exclusion applies on FALLBACK
    # bases too — a row whose plan moved between the jvm and py axes
    # carries a path-mixed raw ratio (~5x) that must not drag the
    # median or be named as isolated
    few = {"q0": 1.02, "q1": 1.05, "q2": 5.0}
    assert drift_verdict(
        {},
        {},
        {"q0": 1.05, "q1": 1.05, "q2": 1.05},
        axes={"q0": "jvm", "q1": "jvm", "q2": "jvm"},
        prev_axes={"q0": "jvm", "q1": "jvm", "q2": "py"},
        fallbacks=(("raw", few),),
    ) == "host [raw-basis]"

    # nothing to compare
    assert drift_verdict({}, {}, {}) == "no_prev"
