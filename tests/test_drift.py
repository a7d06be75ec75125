"""Drift family: exact integer drift ranking vs a pure-Python oracle,
JS divergence vs a pure-Python oracle (bounds + symmetry), and the
vocabulary-churn edge cases."""

import math
import re
from collections import Counter

import pytest

from local_pubchem_db_spark.operators.drift import (
    js_divergence,
    token_drift,
    token_histogram,
)

A = [
    (0, "spark spark data Shuffle join."),
    (1, "data quality filter; spark"),
    (2, None),
]
B = [
    (0, "vector vector vector index"),
    (1, "data join spark"),
    (2, "   "),
]


def _toks(text):
    if text is None:
        return []
    t = re.sub(r"[.,!?;:]", "", text.lower())
    return [w for w in re.split(r"\s+", t.strip()) if w]


def _hist(rows):
    c = Counter()
    for _, t in rows:
        c.update(_toks(t))
    return c


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(A), mk(B)


def test_histogram_matches_counter(spark, frames):
    da, _ = frames
    got = {r["token"]: r["cnt"] for r in token_histogram(da).collect()}
    assert got == dict(_hist(A))


def test_token_drift_exact(spark, frames):
    da, db = frames
    ha, hb = _hist(A), _hist(B)
    na, nb = sum(ha.values()), sum(hb.values())
    want = sorted(
        (
            (tok, ha.get(tok, 0), hb.get(tok, 0),
             abs(ha.get(tok, 0) * nb - hb.get(tok, 0) * na))
            for tok in set(ha) | set(hb)
        ),
        key=lambda r: (-r[3], r[0]),
    )
    got = [
        (r["token"], r["cnt_a"], r["cnt_b"], r["drift"])
        for r in token_drift(da, db, top_n=100).collect()
    ]
    assert got == want
    # vocabulary churn is visible: 'vector' exists only in B
    assert ("vector", 0, 3, 3 * na) in got


def test_js_divergence_matches_pure_python(spark, frames):
    da, db = frames
    ha, hb = _hist(A), _hist(B)
    vocab = sorted(set(ha) | set(hb))
    s = 0.5
    na = sum(ha.values()) + s * len(vocab)
    nb = sum(hb.values()) + s * len(vocab)
    want = 0.0
    for tok in vocab:
        pa = (ha.get(tok, 0) + s) / na
        pb = (hb.get(tok, 0) + s) / nb
        m = 0.5 * (pa + pb)
        want += 0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m)
    got = js_divergence(da, db)
    assert got == pytest.approx(want, rel=1e-12)
    assert 0.0 <= got <= math.log(2) + 1e-12
    # symmetric by construction
    assert js_divergence(db, da) == pytest.approx(got, rel=1e-12)
    # identical snapshots -> ~0
    assert js_divergence(da, da) == pytest.approx(0.0, abs=1e-15)


def test_empty_snapshots(spark, frames):
    da, _ = frames
    empty = da.sparkSession.createDataFrame([], "doc_id long, text string")
    assert js_divergence(empty, empty) == 0.0
    # one empty side: every A token drifts by cnt_a * 0 - 0 * na = 0...
    # with nb=0 the exact statistic is cnt_a*0 - 0*na = 0 for all tokens;
    # the ranking is then pure token order — still well-defined
    rows = token_drift(da, empty, top_n=5).collect()
    assert [r["token"] for r in rows] == sorted(
        set(_hist(A))
    )[:5]
    assert all(r["drift"] == 0 and r["cnt_b"] == 0 for r in rows)


def test_split_form_drops_null_side_rows(spark, frames):
    """Rows whose side expression is NULL belong to NEITHER snapshot —
    the two-frame form drops them (NULL passes neither filter), so the
    split form must too; before the r10 fix a token appearing only in
    null-side rows surfaced with NULL counts and NULL drift (ADVICE r9)."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.drift import token_drift_split

    da, db = frames
    tagged = (
        da.withColumn("side", F.lit(True))
        .unionByName(db.withColumn("side", F.lit(False)))
        .unionByName(
            da.sparkSession.createDataFrame(
                [(99, "nullonly nullonly phantom")],
                "doc_id long, text string",
            ).withColumn("side", F.lit(None).cast("boolean"))
        )
    )
    rows = token_drift_split(tagged, F.col("side"), top_n=100).collect()
    toks = {r["token"] for r in rows}
    assert "nullonly" not in toks and "phantom" not in toks
    assert all(
        r["cnt_a"] is not None
        and r["cnt_b"] is not None
        and r["drift"] is not None
        for r in rows
    )
    # and the identity with the two-frame form still holds exactly
    want = [
        (r["token"], r["cnt_a"], r["cnt_b"], r["drift"])
        for r in token_drift(da, db, top_n=100).collect()
    ]
    got = [(r["token"], r["cnt_a"], r["cnt_b"], r["drift"]) for r in rows]
    assert got == want


def test_drift_statistic_exact_past_int64(spark):
    """The cross products are decimal(38,0): counts near long-max must
    produce the exact integer drift, where int64 arithmetic would fail
    under ANSI (or silently wrap without it) — ADVICE r9."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.drift import _cross_drift

    c_a, c_b = 4_000_000_000, 1
    na, nb = 9_000_000_000, 8_000_000_000
    df = spark.createDataFrame([(c_a, c_b)], "cnt_a long, cnt_b long")
    out = df.select(
        _cross_drift(F.col("cnt_a"), F.col("cnt_b"), na, nb).alias("d")
    ).first()["d"]
    assert out == Decimal(abs(c_a * nb - c_b * na))  # 3.2e19 > 2^63-1
    assert str(df.select(
        _cross_drift(F.col("cnt_a"), F.col("cnt_b"), na, nb).alias("d")
    ).schema["d"].dataType) == "DecimalType(38,0)"


def test_split_form_equals_two_frame_form(spark, frames):
    """token_drift_split(docs, side) must equal
    token_drift(docs.filter(side), docs.filter(~side)) row-for-row —
    one scan and no join instead of two scans + full outer join."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.drift import token_drift_split

    da, db = frames
    tagged = da.withColumn("side", F.lit(True)).unionByName(
        db.withColumn("side", F.lit(False))
    )
    split_rows = [
        (r["token"], r["cnt_a"], r["cnt_b"], r["drift"])
        for r in token_drift_split(
            tagged, F.col("side"), top_n=100
        ).collect()
    ]
    two_frame = [
        (r["token"], r["cnt_a"], r["cnt_b"], r["drift"])
        for r in token_drift(da, db, top_n=100).collect()
    ]
    assert split_rows == two_frame


def test_split_form_construction_job_free_one_scan(spark, frames):
    """r15 structural pin for the split form's totals refactor: the
    snapshot totals ride a broadcast 1-row cross join over the SAME
    grouped-histogram exchange the ranking branch reads, so (a) query
    CONSTRUCTION runs zero Spark jobs (the old form paid a shared()
    cache fill + a driver ``.first()``), and (b) the executed adaptive
    plan contains a ReusedExchange of the token-histogram shuffle —
    i.e. ONE corpus scan+explode serves both the counts and the
    totals."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.drift import token_drift_split

    da, db = frames
    tagged = da.withColumn("side", F.lit(True)).unionByName(
        db.withColumn("side", F.lit(False))
    )
    sc = spark.sparkContext
    sc.setJobGroup("drift_construct", "job-free construction pin")
    try:
        q = token_drift_split(tagged, F.col("side"), top_n=100)
    finally:
        sc.setJobGroup("", "")
    assert sc.statusTracker().getJobIdsForGroup("drift_construct") == []

    assert len(q.collect()) > 0
    plan = q._jdf.queryExecution().executedPlan().toString()
    reused = [
        ln
        for ln in plan.splitlines()
        if "ReusedExchange" in ln and "hashpartitioning(token" in ln
    ]
    assert len(reused) == 1, plan
