"""DSIR importance resampling vs an independent pure-Python oracle.

The operator's whole contract is engine-portable md5 math, so the oracle
reimplements featurization, smoothing, weighting, Gumbel noise, and
top-k selection from scratch (hashlib + math) and the test demands exact
id-set equality and tight float agreement on the weights.
"""

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.resampling import (
    bucket_counts,
    dsir_logweights,
    dsir_select,
    hashed_ngram_buckets,
)

RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock markets rally as tech shares surge higher today"),
    (3, "the dog sat on the log, happily."),
    (4, "Buy cheap pills online!!! best price best price best price"),
    (5, "Photosynthesis converts light energy into chemical energy."),
    (6, "the the the the the the"),
    (7, "quantum entanglement links particle states across distance"),
    (8, ""),
    (9, "cells divide through mitosis; chromosomes align and separate"),
    (10, "click here to win a FREE prize click here click here"),
]
TARGET = [
    (100, "Photosynthesis stores chemical energy in plant cells."),
    (101, "Mitosis separates chromosomes into daughter cells."),
    (102, "Quantum states of entangled particles correlate across distance."),
]
B = 64
SEED = "42"


def _norm_tokens(text):
    t = re.sub(r"[.,!?;:]", "", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return [w for w in t.split(" ") if w] if t else []


def _bucket(ngram, seed=SEED, b=B):
    h = hashlib.md5(f"{seed}:{ngram}".encode()).hexdigest()[:8]
    return int(h, 16) % b


def _features(text):
    toks = _norm_tokens(text)
    grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(g) for g in grams]


def _dist(rows):
    c = Counter()
    for _, text in rows:
        c.update(_features(text))
    return c


def _oracle_logweights():
    raw_d, tgt_d = _dist(RAW), _dist(TARGET)
    n_raw, n_tgt = sum(raw_d.values()), sum(tgt_d.values())
    out = {}
    for i, text in RAW:
        feats = _features(text)
        if not feats:
            continue
        out[i] = sum(
            math.log((tgt_d.get(f, 0) + 1) / (n_tgt + B))
            - math.log((raw_d.get(f, 0) + 1) / (n_raw + B))
            for f in feats
        )
    return out


def _oracle_gumbel(doc_id, seed=SEED):
    h = hashlib.md5(f"gumbel:{seed}:{doc_id}".encode()).hexdigest()[:8]
    u = (int(h, 16) + 0.5) / 2**32
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_features_match_oracle(frames):
    raw, _ = frames
    got = Counter(
        (r["id"], r["bucket"])
        for r in hashed_ngram_buckets(raw, n_buckets=B, seed=SEED).collect()
    )
    want = Counter()
    for i, text in RAW:
        for f in _features(text):
            want[(i, f)] += 1
    assert got == want


def test_bucket_counts_bounded(frames):
    raw, _ = frames
    d = bucket_counts(hashed_ngram_buckets(raw, n_buckets=B, seed=SEED))
    rows = d.collect()
    assert len(rows) <= B
    assert sum(r["n"] for r in rows) == sum(_dist(RAW).values())


def test_logweights_match_oracle(frames):
    raw, tgt = frames
    got = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweights(raw, tgt, n_buckets=B, seed=SEED).collect()
    }
    want = _oracle_logweights()
    assert set(got) == set(want)  # doc 8 (empty) absent from both
    assert 8 not in got
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9), i


def test_select_matches_oracle_and_is_partition_invariant(frames):
    raw, tgt = frames
    want_w = _oracle_logweights()
    scored = sorted(
        ((want_w[i] + _oracle_gumbel(i), -i) for i in want_w), reverse=True
    )
    want_ids = {-x[1] for x in scored[:4]}
    got = dsir_select(raw, tgt, k=4, n_buckets=B, seed=SEED)
    assert {r["doc_id"] for r in got.collect()} == want_ids
    assert set(got.columns) == {"doc_id", "text", "dsir_logweight", "dsir_score"}
    got2 = dsir_select(raw.repartition(7), tgt.repartition(3), k=4, n_buckets=B, seed=SEED)
    assert {r["doc_id"] for r in got2.collect()} == want_ids


def test_target_like_docs_outrank_spam_without_noise(frames):
    """Deterministic sanity: zero-noise ranking puts the science docs
    (sharing target vocabulary) above spam/repetition. Use the weights
    directly so Gumbel noise can't blur the semantics under test."""
    raw, tgt = frames
    w = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweights(raw, tgt, n_buckets=B, seed=SEED).collect()
    }
    science = {5, 7, 9}
    junk = {4, 6, 10}
    assert min(w[i] for i in science) > max(w[j] for j in junk)


def test_select_validates_args(frames):
    raw, tgt = frames
    with pytest.raises(ValueError):
        dsir_select(raw, tgt, k=0)
    with pytest.raises(ValueError):
        dsir_select(raw, tgt, k=1, temperature=0.0)


def test_plan_shape(frames):
    """Distributions broadcast; selection is a k-row TakeOrdered.
    Featurization is an Arrow-batched pandas UDF (ArrowEvalPython) by
    design; row-at-a-time Python (BatchEvalPython) must never appear."""
    raw, tgt = frames
    plan = dsir_select(raw, tgt, k=4, n_buckets=B, seed=SEED)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_select_fraction_is_prefix_of_ranking(frames, spark):
    """Threshold selection keeps a PREFIX of the exact score ranking
    (approximate only in size), sized near the requested fraction."""
    from local_pubchem_db_spark.operators.resampling import (
        dsir_logweights,
        dsir_select_fraction,
    )

    raw = spark.range(0, 400).selectExpr(
        "id as doc_id",
        "concat('alpha beta gamma token', cast(id % 37 as string), "
        "' delta epsilon word', cast(id % 11 as string)) as text",
    )
    tgt = spark.createDataFrame(
        [(9001, "alpha beta gamma token3 delta epsilon word4")],
        "doc_id long, text string",
    )
    got = dsir_select_fraction(raw, tgt, 0.25, n_buckets=B, seed=SEED)
    kept = {r["doc_id"] for r in got.collect()}
    assert 0.15 * 400 <= len(kept) <= 0.35 * 400
    # full exact ranking from the weights + the same gumbel oracle
    w = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweights(raw, tgt, n_buckets=B, seed=SEED).collect()
    }
    ranking = sorted(w, key=lambda i: (-(w[i] + _oracle_gumbel(i)), i))
    assert kept == set(ranking[: len(kept)])


def test_select_fraction_validates(frames):
    from local_pubchem_db_spark.operators.resampling import (
        dsir_select_fraction,
    )

    raw, tgt = frames
    with pytest.raises(ValueError):
        dsir_select_fraction(raw, tgt, 0.0)
    with pytest.raises(ValueError):
        dsir_select_fraction(raw, tgt, 1.5)


def test_empty_target_fails_fast(frames, spark):
    raw, _ = frames
    empty_tgt = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="target corpus has no tokens"):
        dsir_logweights(raw, empty_tgt, n_buckets=B, seed=SEED)


def test_select_fraction_tokenless_raw_returns_empty(frames, spark):
    from local_pubchem_db_spark.operators.resampling import (
        dsir_select_fraction,
    )

    _, tgt = frames
    empty_raw = spark.createDataFrame(
        [(1, ""), (2, "!!!")], "doc_id long, text string"
    )
    got = dsir_select_fraction(empty_raw, tgt, 0.5, n_buckets=B, seed=SEED)
    assert got.count() == 0
    assert "dsir_score" in got.columns


def test_logweights_construction_is_lazy_on_raw_side(spark):
    """Building the DSIR plan must launch NO job over the raw corpus
    (ADVICE r6: the eager localCheckpoint featurized everything at
    plan-construction inside clean_corpus). Raw text here comes from a
    UDF that explodes on evaluation: construction and the eager
    target-only fail-fast must survive; the first raw-side ACTION must
    be what detonates it."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from local_pubchem_db_spark.operators.resampling import dsir_logweights

    @pandas_udf("string")
    def boom(ids: pd.Series) -> pd.Series:
        raise RuntimeError("raw corpus was evaluated")

    raw = spark.range(10).select(
        F.col("id").alias("doc_id"), boom(F.col("id")).alias("text")
    )
    target = spark.createDataFrame(
        [(1, "clean prose about chemistry")], "doc_id long, text string"
    )
    w = dsir_logweights(raw, target)  # must not raise
    with pytest.raises(Exception, match="raw corpus was evaluated"):
        w.count()
