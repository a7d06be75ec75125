"""unigram_logprob_scores vs an exact pure-Python re-implementation."""

import math
import re

import pytest

from local_pubchem_db_spark.operators.quality import (
    unigram_logprob_scores,
    unigram_model,
)

DOCS = [
    (1, "The cat sat. The cat sat again!"),
    (2, "the cat sat on the mat"),
    (3, "Xylophone quixotic zephyr"),   # rare tokens -> low score
    (4, "   "),                          # no tokens -> absent from output
    (5, "the the the"),                  # most common token -> high score
]


def _norm_tokens(t):
    t = re.sub(r"[.,!?;:]", "", t.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return [x for x in t.split(" ") if x] if t else []


def _oracle(docs):
    counts = {}
    for _, t in docs:
        for tok in _norm_tokens(t):
            counts[tok] = counts.get(tok, 0) + 1
    n, v = sum(counts.values()), len(counts)
    out = {}
    for i, t in docs:
        toks = _norm_tokens(t)
        if not toks:
            continue
        lps = [math.log((counts.get(x, 0) + 1) / (n + v)) for x in toks]
        out[i] = (len(toks), sum(lps) / len(lps))
    return out


def test_self_scoring_matches_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"])
        for r in unigram_logprob_scores(df).collect()
    }
    want = _oracle(DOCS)
    assert set(got) == set(want) == {1, 2, 3, 5}
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)
    # ranking signal: common-token doc above rare-token doc
    assert got[5][1] > got[3][1]


def test_scoring_against_foreign_model_floors_unseen_tokens(spark):
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = unigram_model(train)
    target = spark.createDataFrame(
        [(10, "the unseenword")], "doc_id long, text string"
    )
    got = unigram_logprob_scores(target, model=model).collect()[0]
    counts = {}
    for _, t in DOCS:
        for tok in _norm_tokens(t):
            counts[tok] = counts.get(tok, 0) + 1
    n, v = sum(counts.values()), len(counts)
    want = (math.log((counts["the"] + 1) / (n + v)) + math.log(1 / (n + v))) / 2
    assert got["n_tokens"] == 2
    assert got["logprob"] == pytest.approx(want, rel=1e-12)


def test_quality_plan_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    qe = unigram_logprob_scores(df)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    # token-count and doc-score aggregates both combine map-side before
    # their shuffle — the (id, token) pairs relation is never rebuilt
    assert "partial_count" in plan
    assert "partial_avg" in plan
    # the scalar totals fan-in is the ONLY nested-loop join (1-row side,
    # broadcast by construction); the vocab join must be hash-based.
    # formatted mode prints every operator twice (tree + details)
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def _bigram_oracle(docs, lam=0.75):
    c1, c2 = {}, {}
    for _, t in docs:
        w = _norm_tokens(t)
        for i, x in enumerate(w):
            c1[x] = c1.get(x, 0) + 1
            if i:
                c2[(w[i - 1], x)] = c2.get((w[i - 1], x), 0) + 1
    n, v = sum(c1.values()), len(c1)
    out = {}
    for i, t in docs:
        w = _norm_tokens(t)
        if not w:
            continue
        terms = []
        for j, x in enumerate(w):
            pu = (c1[x] + 1) / (n + v)
            if j == 0:
                terms.append(math.log(pu))
            else:
                pc = (c2.get((w[j - 1], x), 0) + 1) / (c1[w[j - 1]] + v)
                terms.append(math.log(lam * pc + (1 - lam) * pu))
        out[i] = (len(w), sum(terms) / len(terms))
    return out


def test_bigram_scoring_matches_oracle(spark):
    from local_pubchem_db_spark.operators.quality import bigram_logprob_scores

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"])
        for r in bigram_logprob_scores(df).collect()
    }
    want = _bigram_oracle(DOCS)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9), i


def test_bigram_model_penalizes_word_salad(spark):
    """Tokens common, transitions rare: the bigram model must rank the
    scrambled doc below the fluent one, where a unigram model ties them
    (same bag of words)."""
    from local_pubchem_db_spark.operators.quality import bigram_logprob_scores

    fluent = "the cat sat on the mat and the dog sat on the log"
    salad = "the on cat the sat mat and dog the on sat the log"
    corpus = [(i, fluent) for i in range(1, 9)] + [(100, fluent), (200, salad)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: r["logprob"]
        for r in bigram_logprob_scores(df).collect()
    }
    assert got[200] < got[100]
    uni = {
        r["doc_id"]: r["logprob"]
        for r in unigram_logprob_scores(df).collect()
    }
    assert uni[200] == pytest.approx(uni[100], rel=1e-12)


def test_bigram_validates_lam(spark):
    from local_pubchem_db_spark.operators.quality import bigram_logprob_scores

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bigram_logprob_scores(df, lam=1.0)
