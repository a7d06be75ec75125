"""grouped_percentile: the three method tiers must agree where their
contracts say they do — selection is EXACT, so it must match the buffer
aggregate bit-for-bit on every shape; sketch must land within its rank
error. Also pins the scale contract: the selection plan must contain no
per-key funnel (no hash partitioning on the bare key columns over the
full data stream)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.percentiles import (
    grouped_median,
    grouped_percentile,
)


def _collect(df, keys=("k",), out="pct"):
    return {
        tuple(getattr(r, c) for c in keys): getattr(r, out)
        for r in df.collect()
    }


def _mk(spark, rows, parts=7):
    return spark.createDataFrame(rows, "k string, v double").repartition(parts)


CASES = [
    # odd count
    [("a", float(x)) for x in [5, 1, 3, 2, 4]],
    # even count -> interpolated midpoint
    [("a", float(x)) for x in [10, 20, 30, 40]],
    # ties straddling the midpoint
    [("a", v) for v in [1.0, 2.0, 2.0, 2.0, 3.0, 3.0]],
    # single value
    [("a", 42.0)],
    # two keys, very different sizes
    [("a", float(x)) for x in range(101)] + [("b", 7.0), ("b", 9.0)],
    # negative + fractional values
    [("a", v) for v in [-3.5, -1.25, 0.0, 2.75]],
]


@pytest.mark.parametrize("rows", CASES)
@pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_selection_equals_buffer(spark, rows, p):
    df = _mk(spark, rows)
    got = _collect(grouped_percentile(df, ["k"], "v", p=p, method="selection"))
    want = _collect(grouped_percentile(df, ["k"], "v", p=p, method="buffer"))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0.0), (k, p)


def test_selection_equals_buffer_randomized(spark):
    rng = random.Random(1234)
    rows = []
    for ki in range(17):  # keys of size 1..40, duplicates common
        n = rng.randint(1, 40)
        vals = [float(rng.randint(-50, 50)) for _ in range(n)]
        rows += [(f"k{ki}", v) for v in vals]
    df = _mk(spark, rows, parts=13)
    for p in (0.1, 0.5, 0.77):
        got = _collect(grouped_percentile(df, ["k"], "v", p=p, method="selection"))
        want = _collect(grouped_percentile(df, ["k"], "v", p=p, method="buffer"))
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12), (k, p)


def test_matches_spark_median_builtin(spark):
    rows = [("a", float(x)) for x in range(10)] + [("b", float(x)) for x in (3, 1, 4, 1, 5)]
    df = _mk(spark, rows)
    want = {
        r.k: r.m
        for r in df.groupBy("k").agg(F.median("v").alias("m")).collect()
    }
    got = _collect(grouped_median(df, ["k"], "v", method="selection"), out="med")
    assert {k: got[(k,)] for k in want} == pytest.approx(want)


def test_nulls_ignored_and_all_null_key_absent(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("z", None)],
        "k string, v double",
    )
    for method in ("buffer", "selection"):
        got = _collect(grouped_percentile(df, ["k"], "v", method=method))
        assert got == {("a",): 2.0}


def test_partitioning_invariance(spark):
    rows = [(f"k{i%5}", float((i * 37) % 101)) for i in range(400)]
    a = _collect(
        grouped_percentile(_mk(spark, rows, parts=3), ["k"], "v", method="selection")
    )
    b = _collect(
        grouped_percentile(
            _mk(spark, rows, parts=29), ["k"], "v", method="selection", num_slices=5
        )
    )
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)


def test_sketch_within_rank_error(spark):
    rows = [("a", float(x)) for x in range(1000)]
    df = _mk(spark, rows)
    got = _collect(grouped_percentile(df, ["k"], "v", method="sketch", accuracy=100))
    # rank error ~ n/accuracy = 10 ranks -> value error <= ~10 here
    assert abs(got[("a",)] - 499.5) <= 11


def test_no_per_key_funnel_in_selection_plan(spark):
    """The scale contract: the full-data stream must never hash-shuffle
    on the bare key columns (that is the buffer path's one-task-per-key
    funnel). Key-only partitioings may appear only downstream of the
    slices-x-keys relations (offsets/targets/final tiny agg); the
    full-data exchanges are the range shuffle and the (slice, key)
    window shuffle."""
    df = _mk(spark, [("a", float(i)) for i in range(100)])
    plan = (
        grouped_percentile(df, ["k"], "v", method="selection")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    # the rank window partitions on (__slice, k) — never on k alone
    # ahead of a Window that consumes the full stream
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "__slice" in line


def test_selection_reuses_one_range_exchange(spark):
    """Slice-id consistency invariant (ADVICE r9): the ranked and cnt
    branches must read ONE materialization of the range exchange —
    repartitionByRange samples boundaries non-deterministically, so two
    independent materializations could put identical rows in different
    slices and silently corrupt the exact result. Pinned here: the
    post-execution adaptive plan must show the range exchange REUSED by
    the second branch, never re-executed."""
    df = _mk(
        spark,
        [("a", float(i)) for i in range(500)]
        + [("b", float(i % 3)) for i in range(100)],
    )
    out = grouped_percentile(df, ["k"], "v", method="selection")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    reused = [
        ln
        for ln in plan.splitlines()
        if "ReusedExchange" in ln and "rangepartitioning" in ln
    ]
    assert reused, f"range exchange not reused:\n{plan}"


def test_selection_correct_with_exchange_reuse_disabled(spark):
    """A session with spark.sql.exchange.reuse=false loses the implicit
    dedup, so selection must pin the slice assignment explicitly (the
    eagerly-filled persist fallback) and still match buffer exactly."""
    from local_pubchem_db_spark.operators.util import release_shared_caches

    rows = [("a", float(i)) for i in range(501)] + [
        ("b", float(i * 2)) for i in range(40)
    ]
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df = _mk(spark, rows, parts=13)
        sel_df = grouped_percentile(df, ["k"], "v", method="selection")
        sel = _collect(sel_df)
        buf = _collect(grouped_percentile(df, ["k"], "v", method="buffer"))
        assert sel.keys() == buf.keys()
        for k in buf:
            assert sel[k] == buf[k], k
        # the fallback actually engaged: the branches read the cache
        plan = sel_df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        spark.conf.unset("spark.sql.exchange.reuse")
        release_shared_caches(spark)


def test_auto_method_decision_rule(spark):
    """choose_percentile_method encodes the documented rule: many keys
    -> buffer; few keys with small distinct-value groups -> buffer; few
    keys with huge-cardinality groups -> selection."""
    from local_pubchem_db_spark.operators.percentiles import (
        choose_percentile_method,
    )

    par = spark.sparkContext.defaultParallelism
    many_keys = _mk(
        spark, [(f"k{i % (par * 2)}", float(i)) for i in range(par * 20)]
    )
    assert choose_percentile_method(many_keys, ["k"], "v") == "buffer"
    few_small = _mk(spark, [("a", float(i % 5)) for i in range(200)])
    assert choose_percentile_method(few_small, ["k"], "v") == "buffer"
    few_huge = _mk(spark, [("a", float(i)) for i in range(3000)])
    # the probe measures cardinality, the threshold scales it: at the
    # test's 3k distinct rows a 2k threshold plays the 1M role
    assert (
        choose_percentile_method(
            few_huge, ["k"], "v", min_distinct_per_group=2000
        )
        == "selection"
    )
    empty = _mk(spark, [], parts=1) if False else spark.createDataFrame(
        [], "k string, v double"
    )
    assert choose_percentile_method(empty, ["k"], "v") == "buffer"


def test_auto_equals_buffer(spark):
    """method='auto' only changes the plan, never the values."""
    rows = [("a", float(i % 11)) for i in range(300)] + [
        ("b", float(i)) for i in range(77)
    ]
    df = _mk(spark, rows)
    auto = _collect(grouped_percentile(df, ["k"], "v", method="auto"))
    buf = _collect(grouped_percentile(df, ["k"], "v", method="buffer"))
    assert auto == buf


def test_bad_args(spark):
    df = _mk(spark, [("a", 1.0)])
    with pytest.raises(ValueError):
        grouped_percentile(df, [], "v")
    with pytest.raises(ValueError):
        grouped_percentile(df, ["k"], "v", method="magic")
    with pytest.raises(ValueError):
        grouped_percentile(df, ["k"], "v", p=1.5)


def test_multi_percentiles_selection_equals_buffer(spark):
    """grouped_percentiles: the ps-aligned array (deliberately UNSORTED
    ps) must agree element-wise between the exact tiers, and all ps must
    ride one pass in selection."""
    from local_pubchem_db_spark.operators.percentiles import grouped_percentiles

    rows = [("a", float((i * 17) % 29)) for i in range(57)] + [
        ("b", float(v)) for v in (5, 1, 9, 7)
    ]
    df = _mk(spark, rows, parts=11)
    ps = [0.9, 0.1, 0.5, 1.0, 0.0]
    got = _collect(grouped_percentiles(df, ["k"], "v", ps, method="selection"), out="pcts")
    want = _collect(grouped_percentiles(df, ["k"], "v", ps, method="buffer"), out="pcts")
    assert got.keys() == want.keys()
    for k in want:
        assert len(got[k]) == len(ps)
        for g, w in zip(got[k], want[k]):
            assert g == pytest.approx(w, abs=0.0), k


def test_multi_percentiles_matches_singles(spark):
    """Each element of the multi-p array equals the single-p call."""
    from local_pubchem_db_spark.operators.percentiles import (
        grouped_percentile,
        grouped_percentiles,
    )

    rows = [("a", float(v)) for v in (3, 1, 4, 1, 5, 9, 2, 6)]
    df = _mk(spark, rows)
    ps = [0.25, 0.5, 0.75]
    multi = _collect(grouped_percentiles(df, ["k"], "v", ps, method="selection"), out="pcts")
    for i, p in enumerate(ps):
        single = _collect(grouped_percentile(df, ["k"], "v", p=p, method="selection"))
        for k in multi:
            assert multi[k][i] == pytest.approx(single[k], abs=0.0), (k, p)


def test_multi_percentiles_sketch_shape(spark):
    from local_pubchem_db_spark.operators.percentiles import grouped_percentiles

    rows = [("a", float(x)) for x in range(100)]
    got = _collect(
        grouped_percentiles(_mk(spark, rows), ["k"], "v", [0.1, 0.9], method="sketch"),
        out="pcts",
    )
    v = got[("a",)]
    assert len(v) == 2 and v[0] < v[1]


def test_multi_percentiles_bad_ps(spark):
    from local_pubchem_db_spark.operators.percentiles import grouped_percentiles

    df = _mk(spark, [("a", 1.0)])
    with pytest.raises(ValueError):
        grouped_percentiles(df, ["k"], "v", [])
    with pytest.raises(ValueError):
        grouped_percentiles(df, ["k"], "v", [0.5, 2.0])


def test_auto_rule_cost_model_boundaries(spark):
    """r11 final rule (pinned against the five measured regimes in
    tools/measure_percentiles.py): buffer's cost tracks DISTINCT values
    through the key funnel, selection's tracks ROWS across the cluster.
    Shapes are built RELATIVE to the session's parallelism so the pins
    hold on any core count (the first cut hard-coded shapes that only
    chose selection past 15 cores — r11 review, execution-confirmed)."""
    from local_pubchem_db_spark.operators.percentiles import (
        choose_percentile_method,
    )

    par = spark.sparkContext.defaultParallelism
    if par <= 3:
        import pytest as _pt

        _pt.skip("cost model needs parallelism > pass_cost to ever pick selection")
    # few keys, every row a distinct value (rows == distinct):
    # selection_cost = 3*rows/par < buffer_cost = rows/nk whenever
    # 3*nk < par — pick nk to guarantee it on this host
    nk = max(1, par // 4)
    rows_per_key = 800
    distinct_rows = _mk(
        spark,
        [(f"k{i % nk}", float(i)) for i in range(nk * rows_per_key)],
    )
    assert (
        choose_percentile_method(
            distinct_rows, ["k"], "v", min_distinct_per_group=500
        )
        == "selection"
    )
    # same keys and per-group cardinality, but repeat COLLAPSE of
    # 2*par: buffer processes nk*600 distinct while selection pays
    # nk*600*2*par rows -> selection_cost/buffer_cost = 6*nk >= 1.5
    # -> buffer, on any par
    collapsed = _mk(
        spark,
        [
            (f"k{i % nk}", float(i % (nk * 600) // nk))
            for i in range(nk * 600 * 2 * par)
        ],
    )
    assert (
        choose_percentile_method(
            collapsed, ["k"], "v", min_distinct_per_group=500
        )
        == "buffer"
    )
    # memory cap overrides the model: per-group distinct past the cap
    # would not fit a buffer task, whatever the wall-clock says
    assert (
        choose_percentile_method(
            collapsed, ["k"], "v", min_distinct_per_group=500,
            memory_cap_distinct=500,
        )
        == "selection"
    )


def test_weighted_percentiles_equal_buffer_on_expansion(spark):
    """weighted_percentiles over a (key, value, weight) histogram must
    equal the buffer aggregate over the EXPANDED relation BIT-exactly
    (same interpolation formula), across odd/even totals, ties, weights
    > 1, and unsorted ps — the exactness contract the hist tier and
    robust_outliers(method="hist") stand on (r12)."""
    import random

    import pytest

    from local_pubchem_db_spark.operators.percentiles import (
        grouped_percentiles,
        weighted_percentiles,
    )

    rng = random.Random(29)
    hist_rows = []
    for key, n_vals in (("a", 37), ("b", 4), ("c", 1)):
        vals = sorted(rng.sample(range(1000), n_vals))
        for v in vals:
            hist_rows.append((key, float(v) / 7.0, rng.randint(1, 9)))
    hist = spark.createDataFrame(
        hist_rows, "k string, v double, w long"
    ).repartition(7)
    expanded = spark.createDataFrame(
        [(k, v) for k, v, w in hist_rows for _ in range(w)],
        "k string, v double",
    ).repartition(5)
    ps = [0.75, 0.0, 0.5, 1.0, 0.31]
    got = {
        r["k"]: list(r["pcts"])
        for r in weighted_percentiles(hist, ["k"], "v", "w", ps).collect()
    }
    want = {
        r["k"]: list(r["pcts"])
        for r in grouped_percentiles(
            expanded, ["k"], "v", ps, method="buffer"
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert g == pytest.approx(w, abs=0.0), k
    # degenerate inputs: zero/negative weights and null values vanish
    # (they do not exist in the expanded relation)
    weird = spark.createDataFrame(
        [("a", 1.0, 2), ("a", 9.0, 0), ("a", None, 5), ("b", 3.0, -1)],
        "k string, v double, w long",
    )
    out = {
        r["k"]: list(r["pcts"])
        for r in weighted_percentiles(weird, ["k"], "v", "w", [0.5]).collect()
    }
    assert out == {"a": [1.0]}  # only the w=2 value survives; b vanishes


def test_hist_method_equals_buffer(spark):
    """grouped_percentiles(method="hist") — build-the-histogram-then-
    weighted-percentiles — must equal buffer bit-exactly on raw rows."""
    import pytest

    from local_pubchem_db_spark.operators.percentiles import (
        grouped_percentiles,
    )

    rows = [("a", float((i * 13) % 41)) for i in range(200)] + [
        ("b", 2.0),
        ("b", 2.0),
        ("b", 8.0),
        ("a", None),
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(9)
    ps = [0.5, 0.9]
    got = {
        r["k"]: list(r["pcts"])
        for r in grouped_percentiles(df, ["k"], "v", ps, method="hist").collect()
    }
    want = {
        r["k"]: list(r["pcts"])
        for r in grouped_percentiles(
            df, ["k"], "v", ps, method="buffer"
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert g == pytest.approx(w, abs=0.0), k


def test_weighted_percentiles_plan_one_exchange_no_python(spark):
    """weighted_percentiles' scoring plan: the cumulative window, the
    totals window, and the per-key aggregation must all ride ONE
    key-clustered exchange (the groupBy reuses the windows'
    partitioning), and nothing crosses into Python — the shape that
    keeps the hist tier one-combinable-shuffle cheap at scale."""
    import re

    from local_pubchem_db_spark.operators.percentiles import (
        weighted_percentiles,
    )

    hist = spark.createDataFrame(
        [("a", float(i % 37), (i % 5) + 1) for i in range(500)],
        "k string, v double, w long",
    )
    plan = (
        weighted_percentiles(hist, ["k"], "v", "w", [0.5, 0.9])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange", plan)) == 1, plan
    assert not re.findall(r"EvalPython|ArrowEval|MapInPandas", plan)

def test_auto_hist_candidate_rule(spark):
    """r13 (verdict Next #1): the hist tier joins auto's candidate set
    only when (a) the caller declares reuse (reuse_stats >= 2), (b) the
    relation clears the row floor, and (c) the probe measures enough
    compression (distinct (key, value) pairs << rows). Thresholds are
    scaled down so the pins run on test-sized data — the production
    constants play the same roles at 2M rows / 4x compression."""
    from local_pubchem_db_spark.operators.percentiles import (
        choose_percentile_method,
    )

    # 5 keys x 2000 rows, values collapse to 10 distinct per key:
    # nkv ~ 50 << 10_000 rows — the repeating-value telemetry shape
    compressed = _mk(
        spark,
        [(f"k{i % 5}", float(i % 10)) for i in range(10_000)],
    )
    kw = dict(hist_min_rows=1_000, hist_min_compression=4.0)
    assert (
        choose_percentile_method(compressed, ["k"], "v", reuse_stats=2, **kw)
        == "hist"
    )
    # (a) no reuse -> hist's saving (the second combine pass) does not
    # exist; stay on buffer
    assert (
        choose_percentile_method(compressed, ["k"], "v", reuse_stats=1, **kw)
        == "buffer"
    )
    # (b) row floor: same shape, below the floor -> buffer
    assert (
        choose_percentile_method(
            compressed, ["k"], "v", reuse_stats=2,
            hist_min_rows=100_000, hist_min_compression=4.0,
        )
        == "buffer"
    )
    # (c) compression floor: nearly-distinct values (nkv ~ rows) -> the
    # per-statistic window over the histogram re-pays the saved pass
    distinct = _mk(
        spark, [(f"k{i % 5}", float(i)) for i in range(10_000)]
    )
    assert (
        choose_percentile_method(distinct, ["k"], "v", reuse_stats=2, **kw)
        != "hist"
    )
    # selection regimes keep precedence over hist: few keys, huge
    # all-distinct groups (scaled threshold as in the r11 pins)
    par = spark.sparkContext.defaultParallelism
    if par > 3:
        few_huge = _mk(spark, [("a", float(i)) for i in range(3000)])
        assert (
            choose_percentile_method(
                few_huge, ["k"], "v", reuse_stats=2,
                min_distinct_per_group=2000, hist_min_rows=1_000,
            )
            == "selection"
        )


def test_weighted_percentiles_fractional_weight_raises(spark):
    """ADVICE r12: a fractional weight must raise, not silently
    truncate (1.7 -> 1) or vanish (0.5 -> 0). A fractional TYPE whose
    values are all integral keeps working and matches the long-typed
    result exactly."""
    from local_pubchem_db_spark.operators.percentiles import (
        weighted_percentiles,
    )

    bad = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 1.7)], "k string, v double, w double"
    )
    with pytest.raises(Exception, match="fractional weight"):
        weighted_percentiles(bad, ["k"], "v", "w", [0.5]).collect()
    half = spark.createDataFrame(
        [("a", 1.0, 0.5), ("a", 2.0, 3.0)], "k string, v double, w double"
    )
    with pytest.raises(Exception, match="fractional weight"):
        weighted_percentiles(half, ["k"], "v", "w", [0.5]).collect()

    rows = [("a", 1.0, 2), ("a", 5.0, 3), ("b", 7.0, 1)]
    as_long = spark.createDataFrame(rows, "k string, v double, w long")
    as_double = spark.createDataFrame(
        [(k, v, float(w)) for k, v, w in rows], "k string, v double, w double"
    )
    ps = [0.25, 0.5, 0.75]
    got_l = {
        tuple(r[:1]): r["pcts"]
        for r in weighted_percentiles(as_long, ["k"], "v", "w", ps).collect()
    }
    got_d = {
        tuple(r[:1]): r["pcts"]
        for r in weighted_percentiles(as_double, ["k"], "v", "w", ps).collect()
    }
    assert got_l == got_d


def test_auto_probe_memoized_per_relation(spark):
    """r13 (round gap #1): auto's cardinality probe is one full scan
    whose result depends only on the relation, so it is memoized per
    (session, plan, columns) through the shared probe registry — a
    service calling method="auto" repeatedly over one relation pays the
    scan once. Pinned by tampering the memoized tuple: if the second
    call re-ran the probe it would see the true compressed shape and
    pick hist; serving the tampered all-distinct tuple proves the memo
    is the source. release_shared_caches drops it (the family's
    documented invalidation point)."""
    from local_pubchem_db_spark.operators.percentiles import (
        choose_percentile_method,
    )
    from local_pubchem_db_spark.operators.util import (
        _PROBE_MEMO,
        release_shared_caches,
    )

    df = _mk(spark, [(f"k{i % 5}", float(i % 10)) for i in range(10_000)])
    kw = dict(hist_min_rows=1_000, hist_min_compression=4.0)
    release_shared_caches(spark)
    assert (
        choose_percentile_method(df, ["k"], "v", reuse_stats=2, **kw)
        == "hist"
    )
    memo = _PROBE_MEMO[spark]
    keys = [k for k in memo if k[1].startswith("pct_cardinality:")]
    assert len(keys) == 1 and keys[0][1] == "pct_cardinality:k:v"
    memo[keys[0]] = (10_000, 5, 10_000)  # nkv == rows: no compression
    assert (
        choose_percentile_method(df, ["k"], "v", reuse_stats=2, **kw)
        == "buffer"
    )
    # decision params are NOT part of the memo key: a different rule
    # over the same relation reuses the same (tampered) stats
    assert (
        choose_percentile_method(df, ["k"], "v", reuse_stats=1, **kw)
        == "buffer"
    )
    release_shared_caches(spark)
    assert (
        choose_percentile_method(df, ["k"], "v", reuse_stats=2, **kw)
        == "hist"
    )
