"""Oracles for subword_token_count (hand-counted goldens) and
winnow_fingerprints_udf (naive pure-Python winnowing re-implementation +
the substring-match guarantee)."""

import numpy as np
from pyspark.sql import functions as F

from local_pubchem_db_spark.functions.text import (
    subword_token_count,
    winnow_fingerprints_udf,
)


def test_subword_token_count_goldens(spark):
    cases = [
        ("hello world", 2),          # [hello][ world]
        ("I'll go, now!", 6),        # [I]['ll][ go][,][ now][!]
        ("abc123 def", 3),           # [abc][123][ def]
        ("it's done", 3),            # [it]['s][ done]
        ("", 0),
        ("héllo wörld", 2),          # unicode letters in \p{L}
        ("  spaced  out  ", 2),      # whitespace runs are separators
        ("a+b=c", 5),                # [a][+][b][=][c]
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)], "i long, t string")
    got = {r["i"]: r["n"] for r in df.select("i", subword_token_count(F.col("t")).alias("n")).collect()}
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, (t, got[i], want)


def _winnow_naive(t, k, w):
    """Straight-from-the-paper reference implementation (plain Python ints,
    mod 2^64 to match the uint64 wraparound), returned as signed int64."""
    mask = (1 << 64) - 1
    if not t:
        return set()
    s = t.encode("utf-8")
    if len(s) < k:
        return set()
    hashes = []
    for i in range(len(s) - k + 1):
        h = 0
        for b in s[i : i + k]:
            h = (h * 257 + b) & mask
        hashes.append(h)
    if len(hashes) < w:
        picks = [min(hashes)]
    else:
        picks = []
        for i in range(len(hashes) - w + 1):
            win = hashes[i : i + w]
            m = min(win)
            j = max(idx for idx, v in enumerate(win) if v == m)  # rightmost
            picks.append(win[j])
    return {p - (1 << 64) if p >= (1 << 63) else p for p in picks}


def test_winnow_matches_naive_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",
        "",
        "aaaaaaaaaaaaaaaaaaaa",  # degenerate: all k-grams equal
        "a bigger document with punctuation, numbers 123 and variety!",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    fp = winnow_fingerprints_udf(k=5, window=3)
    got = {r["i"]: set(r["fp"]) for r in df.select("i", fp(F.col("t")).alias("fp")).collect()}
    for i, t in enumerate(texts):
        want = _winnow_naive(t, 5, 3)
        assert got[i] == want, (t, sorted(got[i])[:3], sorted(want)[:3])


def test_winnow_shared_fingerprint_on_long_overlap(spark):
    # guarantee: a common substring of length >= k + window - 1 yields at
    # least one shared fingerprint
    k, w = 9, 4
    common = "this exact sentence appears verbatim in both documents"
    a = "prefix text before it. " + common
    b = common + " and then entirely different trailing content here"
    df = spark.createDataFrame([(1, a), (2, b)], "i long, t string")
    fp = winnow_fingerprints_udf(k=k, window=w)
    rows = {r["i"]: set(r["fp"]) for r in df.select("i", fp(F.col("t")).alias("fp")).collect()}
    assert rows[1] & rows[2], "long shared substring must share a fingerprint"

    c = "completely unrelated material with zero overlapping spans at all"
    df2 = spark.createDataFrame([(3, c)], "i long, t string")
    fp3 = {r["fp"] for r in df2.select(F.explode(fp(F.col("t"))).alias("fp")).collect()}
    assert not (rows[1] & fp3)
