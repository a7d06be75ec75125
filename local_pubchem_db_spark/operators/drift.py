"""Corpus drift detection: compare the token distributions of two
document snapshots (yesterday's crawl vs today's, train vs incoming
batch) and surface the tokens whose probability mass moved most.

Training-data pipelines gate ingestion on distribution shift; the
reference has no analogue (its closest surface is the per-file manifest
deltas, pubchem2sqlite/utils.py:292-334 — arrival accounting, not
content). This family gives both an exact, hash-matchable drift ranking
and the standard smoothed divergences.

Scale shape: each snapshot reduces to a token histogram with one
map-side-combinable ``groupBy(token)`` shuffle; the two histograms
(vocabulary-sized, small relative to the corpora) meet in a full outer
join on token. Totals are single-row aggregates. Nothing is a Python
UDF; at 100 TB the cost is two corpus scans + two token shuffles, and
the join side is |vocab|, which AQE will broadcast.

Determinism: the ranking statistic is cross-multiplied exact-integer
arithmetic — ``|c_a·N_b − c_b·N_a|`` is ``N_a·N_b·|p_a − p_b|`` with no
division — so the registry query hash-matches DuckDB bit-for-bit.
KL/JS divergences are float reductions and are pinned by a pure-Python
oracle in ``tests/test_drift.py`` instead.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from local_pubchem_db_spark.functions.text import normalize_text, tokens
from local_pubchem_db_spark.operators.util import fan_out, shared


def token_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(token, cnt) histogram of the normalized whitespace tokens of
    ``text_col`` — one explode + one combinable shuffle."""
    toks = tokens(normalize_text(F.col(text_col)))
    return (
        fan_out(docs).select(
            F.explode(F.filter(toks, lambda x: x != F.lit(""))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def token_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` tokens by exact drift statistic
    ``|c_a·N_b − c_b·N_a|`` (∝ |p_a − p_b|, integer-exact; c = token
    count, N = snapshot token total). A token absent from one snapshot
    counts 0 there — the full outer join keeps it, which is exactly the
    vocabulary-churn signal a drift monitor wants. Ties break on token
    ASC. Columns: ``token``, ``cnt_a``, ``cnt_b``, ``drift``."""
    # shared(): the vocabulary-sized histograms are referenced by BOTH
    # the total-count scalar jobs and the final join — without the cache
    # each reference re-scans and re-explodes its full corpus (measured
    # 4 corpus passes instead of 2 at sf30, 55 s for the aux row).
    ha = shared(
        token_histogram(docs_a, text_col).withColumnRenamed("cnt", "cnt_a")
    )
    hb = shared(
        token_histogram(docs_b, text_col).withColumnRenamed("cnt", "cnt_b")
    )
    na = ha.agg(F.sum("cnt_a")).first()[0] or 0
    nb = hb.agg(F.sum("cnt_b")).first()[0] or 0
    joined = (
        ha.join(hb, "token", "full_outer")
        .na.fill({"cnt_a": 0, "cnt_b": 0})
        .withColumn(
            "drift",
            F.abs(
                F.col("cnt_a") * F.lit(int(nb))
                - F.col("cnt_b") * F.lit(int(na))
            ).cast("long"),
        )
    )
    return joined.orderBy(F.desc("drift"), F.asc("token")).limit(top_n)


def token_drift_split(
    docs: DataFrame,
    side: Column,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """``token_drift`` for the common case where both snapshots are
    SLICES OF ONE relation (today's partition vs yesterday's, an A/B
    split): ``side`` is a boolean column — true rows form snapshot A,
    false rows snapshot B. ONE corpus scan, one combinable shuffle to
    the vocabulary-sized paired histogram, no join at all (each token's
    row carries both counts) — vs two scans + a join for the two-frame
    form. Output is identical to
    ``token_drift(docs.filter(side), docs.filter(~side))`` (pinned by
    test and by the registry oracle)."""
    toks = tokens(normalize_text(F.col(text_col)))
    hist = shared(
        fan_out(docs).select(
            side.cast("boolean").alias("__a"),
            F.explode(F.filter(toks, lambda x: x != F.lit(""))).alias(
                "token"
            ),
        )
        .groupBy("token")
        .agg(
            F.sum(F.col("__a").cast("long")).cast("long").alias("cnt_a"),
            F.sum((~F.col("__a")).cast("long")).cast("long").alias("cnt_b"),
        )
    )
    tot = hist.agg(
        F.sum("cnt_a").alias("na"), F.sum("cnt_b").alias("nb")
    ).first()
    na, nb = int(tot["na"] or 0), int(tot["nb"] or 0)
    out = hist.withColumn(
        "drift",
        F.abs(
            F.col("cnt_a") * F.lit(nb) - F.col("cnt_b") * F.lit(na)
        ).cast("long"),
    )
    # the two-frame form omits tokens absent from BOTH sides by
    # construction; here every token has a count, so no filter is needed
    return out.orderBy(F.desc("drift"), F.asc("token")).limit(top_n)


def js_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    smoothing: float = 0.5,
) -> float:
    """Jensen–Shannon divergence (natural log) between the two smoothed
    token distributions — the symmetric, bounded ([0, ln 2]) drift
    scalar for monitoring dashboards. Additive (Laplace) ``smoothing``
    is applied over the UNION vocabulary so unseen tokens have finite
    mass. Distributed: histograms + one join reduce to a single
    driver-side scalar; the float reduction happens on |vocab| rows
    via a deterministic sorted sum on the driver (vocabularies are
    bounded — token histograms, not raw corpora)."""
    ha = token_histogram(docs_a, text_col).withColumnRenamed("cnt", "cnt_a")
    hb = token_histogram(docs_b, text_col).withColumnRenamed("cnt", "cnt_b")
    rows = (
        ha.join(hb, "token", "full_outer")
        .na.fill({"cnt_a": 0, "cnt_b": 0})
        .select("token", "cnt_a", "cnt_b")
        .collect()
    )
    if not rows:
        return 0.0
    v = len(rows)
    na = sum(r["cnt_a"] for r in rows) + smoothing * v
    nb = sum(r["cnt_b"] for r in rows) + smoothing * v
    total = 0.0
    for r in sorted(rows, key=lambda r: r["token"]):
        pa = (r["cnt_a"] + smoothing) / na
        pb = (r["cnt_b"] + smoothing) / nb
        m = 0.5 * (pa + pb)
        total += 0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m)
    return total
