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

Determinism: the ranking statistic is cross-multiplied exact arithmetic
— ``|c_a·N_b − c_b·N_a|`` is ``N_a·N_b·|p_a − p_b|`` with no division —
computed in ``decimal(38,0)`` so it stays EXACT past int64 (at the
100 TB scale this module targets, token totals reach ~1e13 and c·N
overflows a long; with c ≤ N ≤ 9.2e18 the product is < 8.5e37, inside
decimal(38,0)). The registry query casts the tiny sf0.01 values back to
long for the BIGINT oracle hash. KL/JS divergences are float reductions
and are pinned by a pure-Python oracle in ``tests/test_drift.py``
instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from local_pubchem_db_spark.functions.text import normalize_text, tokens
from local_pubchem_db_spark.operators.util import (
    LIGHT_TEXT_GATE,
    fan_out,
    shared,
)


def token_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(token, cnt) histogram of the normalized whitespace tokens of
    ``text_col`` — one explode + one combinable shuffle."""
    toks = tokens(normalize_text(F.col(text_col)))
    # one tokenize+explode pass: LIGHT decompressed-bytes floor (the
    # gate estimate scales plan stats by the footers' compression ratio)
    return (
        fan_out(docs, **LIGHT_TEXT_GATE).select(
            F.explode(F.filter(toks, lambda x: x != F.lit(""))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _cross_drift(
    cnt_a: Column, cnt_b: Column, na: int | Column, nb: int | Column
) -> Column:
    """``|c_a·N_b − c_b·N_a|`` in decimal(38,0): exact at any corpus
    size (c·N exceeds int64 once token totals pass ~3e9; under Spark 4's
    default ANSI mode the long form would FAIL, with ANSI off it would
    silently wrap — ADVICE r9). Long counts fit decimal(19,0) exactly,
    the products stay < 8.5e37, and with c ≤ N the difference never
    exceeds the larger product, so nothing overflows the 38-digit cap.

    ``na``/``nb`` may be driver ints (the two-frame form measures them
    with scalar jobs) or long Columns (the one-scan split form attaches
    them via a broadcast 1-row cross join — r15): a long literal and a
    long column cast to decimal(19,0) produce the identical expression
    tree, so both forms emit the same values and the same schema."""
    d19 = "decimal(19,0)"
    ca = na if isinstance(na, Column) else F.lit(int(na))
    cb = nb if isinstance(nb, Column) else F.lit(int(nb))
    return F.abs(
        cnt_a.cast(d19) * cb.cast(d19) - cnt_b.cast(d19) * ca.cast(d19)
    ).cast("decimal(38,0)")


def token_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` tokens by exact drift statistic
    ``|c_a·N_b − c_b·N_a|`` (∝ |p_a − p_b|, exact decimal arithmetic;
    c = token count, N = snapshot token total). A token absent from one
    snapshot counts 0 there — the full outer join keeps it, which is
    exactly the vocabulary-churn signal a drift monitor wants. Ties
    break on token ASC. Columns: ``token``, ``cnt_a``, ``cnt_b``,
    ``drift`` (decimal(38,0) — exact past int64, see ``_cross_drift``)."""
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
            "drift", _cross_drift(F.col("cnt_a"), F.col("cnt_b"), na, nb)
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
    test and by the registry oracle) — including for rows where ``side``
    is NULL: the two-frame form drops them on both sides (NULL passes
    neither ``side`` nor ``~side``), so they are pre-filtered here too;
    keeping them would leave tokens that appear only in null-side rows
    with NULL counts and NULL drift (ADVICE r9)."""
    toks = tokens(normalize_text(F.col(text_col)))
    flag = side.cast("boolean")
    hist = (
        fan_out(
            docs.filter(flag.isNotNull()),
            **LIGHT_TEXT_GATE,
        ).select(
            flag.alias("__a"),
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
    # Snapshot totals ride a broadcast 1-row cross join instead of a
    # driver-blocking scalar job over a shared() cache (r15, guide
    # §2.4/§5): the totals subtree aggregates the SAME token-histogram
    # exchange the main branch reads, and AQE's exchange reuse
    # materializes that shuffle once — one corpus scan+explode, zero
    # construction-time jobs, and no vocabulary-sized cache entry
    # competing with execution memory. Plan-shape (ReusedExchange) and
    # value equality with the scalar form are pinned in test_drift.py.
    tot = hist.agg(
        F.coalesce(F.sum("cnt_a"), F.lit(0)).alias("__na"),
        F.coalesce(F.sum("cnt_b"), F.lit(0)).alias("__nb"),
    )
    out = hist.crossJoin(F.broadcast(tot)).withColumn(
        "drift",
        _cross_drift(
            F.col("cnt_a"), F.col("cnt_b"), F.col("__na"), F.col("__nb")
        ),
    ).drop("__na", "__nb")
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
    mass.

    Fully distributed (r10, closing the one data-sized ``collect()`` of
    the r9 additions): the joined histogram is persisted once, a first
    aggregation reduces it to three scalars (|vocab|, ΣA, ΣB), and the
    per-token JS terms are whole-stage-codegen double expressions summed
    by a second aggregation — nothing vocabulary-sized ever reaches the
    driver, so web-scale vocabularies (URLs, typos, |V| ~ 1e8+) cost two
    combinable shuffles and two scalar jobs. The float sum's partial
    order is partition-dependent; reassociation error on |V| doubles is
    ~1e-15 relative, inside the pure-Python pytest oracle's tolerance
    (JS is a monitoring scalar, not a hash-matched column)."""
    ha = token_histogram(docs_a, text_col).withColumnRenamed("cnt", "cnt_a")
    hb = token_histogram(docs_b, text_col).withColumnRenamed("cnt", "cnt_b")
    joined = (
        ha.join(hb, "token", "full_outer")
        .na.fill({"cnt_a": 0, "cnt_b": 0})
        .select("cnt_a", "cnt_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        tot = joined.agg(
            F.count(F.lit(1)).alias("v"),
            F.sum("cnt_a").alias("sa"),
            F.sum("cnt_b").alias("sb"),
        ).first()
        v = int(tot["v"])
        if v == 0:
            return 0.0
        na = float(tot["sa"] or 0) + smoothing * v
        nb = float(tot["sb"] or 0) + smoothing * v
        s = F.lit(float(smoothing))
        pa = (F.col("cnt_a").cast("double") + s) / F.lit(na)
        pb = (F.col("cnt_b").cast("double") + s) / F.lit(nb)
        m = F.lit(0.5) * (pa + pb)
        term = F.lit(0.5) * pa * F.log(pa / m) + F.lit(0.5) * pb * F.log(
            pb / m
        )
        out = joined.agg(F.sum(term)).first()[0]
        return float(out or 0.0)
    finally:
        joined.unpersist()
