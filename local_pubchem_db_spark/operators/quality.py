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
