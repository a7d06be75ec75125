"""Corpus-trained quality scoring: per-document mean unigram
log-probability under the corpus's OWN unigram language model — the
simplified form of the CCNet/Wikipedia-LM perplexity filter (Wenzek et
al. 2020 train a KenLM n-gram model; a unigram model keeps the operator
dependency-free and SQL-auditable while preserving the ranking signal:
documents full of rare garbage tokens score low, ordinary prose scores
high).

Generalizes the reference's static quality predicates (NOT_NULL /
dtype-parse gates, reference utils.py:140-155) to a data-driven signal.

Scale shape (two passes over tokens, everything JVM-side codegen):
1. vocabulary pass: explode(tokens) → groupBy(token) count — one
   map-side-combinable shuffle; the vocab relation is |V| rows, corpus-
   independent small (natural-language vocab grows ~ O(sqrt(corpus))).
2. scoring pass: explode(tokens) → equi-join the vocab (AQE broadcasts
   it when small; at worst one hash shuffle on token) → groupBy(doc)
   avg(log p) — second map-side-combinable shuffle.
The corpus text itself is never shuffled — only (id, token) pairs.

Add-one smoothing: p(t) = (c_t + 1) / (N + V). Unseen tokens cannot
occur when scoring the training corpus itself (every token is in the
vocab), but the smoothed form keeps the model reusable to score a
DIFFERENT corpus against this one's vocabulary via ``score_against``
semantics (tokens absent from the vocab get the 1/(N+V) floor).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from local_pubchem_db_spark.functions.text import normalize_text, tokens


def unigram_model(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Token → count over the normalized corpus; one shuffle.
    Empty-string tokens (blank docs) are excluded."""
    return (
        docs.select(
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
    )


def unigram_logprob_scores(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, logprob) — mean add-one-smoothed unigram log
    probability per document. ``model=None`` trains on ``docs`` itself
    (self-scoring, the CCNet shape); pass a ``unigram_model`` of a
    reference corpus to score docs against it instead. Docs with no
    tokens after normalization are absent from the output (no tokens →
    no mean)."""
    if model is None:
        model = unigram_model(docs, text_col)
    totals = model.agg(
        F.sum("token_count").alias("n_total"),
        F.count(F.lit(1)).alias("v_size"),
    )
    doc_tokens = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).filter(F.col("token") != "")
    # 1-row totals relation: a broadcast nested-loop join by construction,
    # constant-size — the only sane plan for a scalar fan-in
    scored = (
        doc_tokens.join(model, "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            (
                F.log(
                    (F.coalesce(F.col("token_count"), F.lit(0)) + F.lit(1))
                    / (F.col("n_total") + F.col("v_size"))
                )
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("lp").alias("logprob"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "logprob")
    )


def _token_pairs_udf():
    """Arrow-batched pandas UDF: text → array<struct<prev,cur>> with one
    entry per token (prev null on the first). Mirrors ``normalize_text``
    + ``tokens`` (lowercase, strip [.,!?;:], ASCII \\s split — same
    contract as the DSIR featurizer); a pandas UDF for the same measured
    reason: Spark's array higher-order functions evaluate interpreted
    per element."""
    from pyspark.sql.functions import pandas_udf

    from local_pubchem_db_spark.functions.text import py_token_fn

    toks = py_token_fn()

    @pandas_udf("array<struct<prev: string, cur: string>>")
    def _pairs(text: pd.Series) -> pd.Series:
        def pairs(t):
            w = toks(t)
            return [(w[i - 1] if i else None, w[i]) for i in range(len(w))]

        return text.map(pairs)

    return _pairs


def bigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """(id, n_tokens, logprob): mean per-token log probability under an
    interpolated bigram model of the corpus itself — the next step up
    from ``unigram_logprob_scores`` toward the CCNet KenLM filter:
    word-salad documents whose TOKENS are common but whose TRANSITIONS
    are not ("the of and the of") now score low, which a unigram model
    cannot see.

    Model (self-trained, add-one smoothed, auditable):
      p_uni(w)    = (c1(w) + 1) / (N + V)
      p_cond(w|a) = (c2(a, w) + 1) / (c1(a) + V)
      first token:   log p_uni(w)
      later tokens:  log(lam * p_cond(w|prev) + (1 - lam) * p_uni(w))

    Scale shape: one Arrow pass emits (prev, cur) per token occurrence;
    unigram/bigram counts are two map-side-combinable groupBys; scoring
    joins the V-row unigram relation (broadcast) and the bigram relation
    — the one join keyed by (prev, cur), sized by DISTINCT bigrams, a
    plain hash join that scales with corpus vocabulary rather than
    corpus bytes — then one grouped mean per doc. Token-less docs are
    absent from the output (same contract as the unigram scorer).
    """
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1)")
    pairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_token_pairs_udf()(F.col(text_col))).alias("p"),
    ).select("id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    # the pair stream feeds counts AND scoring; cut the lineage so the
    # corpus is tokenized once per side rather than once per reference
    uni = (
        pairs.groupBy(F.col("cur").alias("w"))
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint()
    )
    big = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
        # same lineage cut as uni: without it the scoring join's big side
        # re-runs the corpus-sized Arrow tokenization a second time in
        # the same job; checkpointed state is bounded by DISTINCT
        # bigrams, not corpus bytes
        .localCheckpoint()
    )
    totals = (
        uni.select(F.col("c1").alias("c"))
        .agg(F.sum("c").alias("total_n"), F.count(F.lit(1)).alias("vocab_v"))
    )
    scored = (
        pairs.join(F.broadcast(uni.withColumnRenamed("w", "cur")), "cur", "left")
        .join(
            F.broadcast(
                uni.select(
                    F.col("w").alias("prev"), F.col("c1").alias("c1_prev")
                )
            ),
            "prev",
            "left",
        )
        .join(big, ["prev", "cur"], "left")
        .crossJoin(F.broadcast(totals))
    )
    p_uni = (F.col("c1") + F.lit(1)) / (F.col("total_n") + F.col("vocab_v"))
    p_cond = (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)) / (
        F.col("c1_prev") + F.col("vocab_v")
    )
    term = F.when(F.col("prev").isNull(), F.log(p_uni)).otherwise(
        F.log(F.lit(lam) * p_cond + F.lit(1.0 - lam) * p_uni)
    )
    return (
        scored.select("id", term.alias("lp"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.avg("lp").alias("logprob"))
        .select(F.col("id").alias(id_col), "n_tokens", "logprob")
    )
