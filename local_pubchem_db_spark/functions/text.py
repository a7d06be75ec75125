"""Text-analysis column functions for the documents pipeline.

All pure JVM-side expressions (whole-stage codegen) — no Python UDFs in any
hot path. These generalize the reference's string surface (regex extract /
split / replace, utils.py:264-265 and CREATE_LIKE split transforms) to the
operators a large-scale training-data pipeline needs: token statistics,
quality scoring, language ID, fingerprinting, shingling.

Every function is deterministic and has an exact ANSI-SQL equivalent
(documented inline) so results hash-match a DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and frozen: the heuristic must be exactly
# reproducible in plain SQL for the correctness oracle.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "en"],
}

_PUNCT_CLASS = r"[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization. SQL: string_split_regex(trim(text), '\\s+')."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(text)).cast("long")


def punct_count(text: Column) -> Column:
    """Count of [.,!?;:] characters — explicit class so Spark and ANSI SQL
    regex dialects agree (POSIX classes differ between engines)."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, _PUNCT_CLASS, ""))
    ).cast("long")


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens(text)), sw)).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1]: mean-token-length band,
    punctuation ratio, and stopword presence. Single-division arithmetic on
    exact integer counts → bit-deterministic across engines."""
    n_tok = token_count(text)
    n_char = F.length(text).cast("long")
    mean_tok_len = n_char.cast("double") / n_tok.cast("double")
    punct_ratio = punct_count(text).cast("double") / n_char.cast("double")
    has_stop = (stopword_count(text) > 0).cast("double")
    score = (
        F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
        + has_stop * F.lit(0.3)
    )
    return F.when(n_tok > 0, score).otherwise(F.lit(0.0))


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over STOPWORDS; ties and zero votes →
    'und' (undetermined). Exactly expressible as CASE + array ops in SQL."""
    toks = F.array_distinct(tokens(text))
    votes = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        )
        for lang in STOPWORDS
    }
    best = F.greatest(*votes.values())
    langs = sorted(STOPWORDS)  # deterministic tie-break: first alphabetically
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when((best > 0) & (votes[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip [.,!?;:],
    collapse whitespace, trim."""
    t = F.lower(text)
    t = F.regexp_replace(t, _PUNCT_CLASS, "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 hex of the normalized text.
    SQL: md5(<same normalization>)."""
    return F.md5(normalize_text(text))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array column.

    ``toks`` must be a bound column (produced by a previous projection),
    not an inline ``split(...)`` expression: higher-order functions are
    interpreted (no codegen), so an inline split would re-run the regex for
    every ``element_at`` of every gram — ~6 regex splits per shingle, which
    turns a milliseconds scan into seconds per 1k documents.

    SQL equivalent (DuckDB): list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
    for i in range(1, len(w)-n+2)]).
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) straight from text.

    Convenience form for small inputs/tests. Hot paths should project
    :func:`tokens` into a column first and call
    :func:`shingles_from_tokens` on it (see that docstring for why).
    """
    return shingles_from_tokens(tokens(text), n)


def shingle_array_udf(n: int = 3):
    """Arrow-batched pandas UDF producing distinct word n-gram shingles.

    Semantically identical to :func:`word_shingles` (tokens = '\\s+' split
    of trimmed text; distinct keeps first occurrence) but ~100x faster:
    Spark's higher-order array expressions run interpreted (CodegenFallback),
    costing tens of ms per document, while this is plain Python string ops
    over Arrow batches. Used by the dedup hot paths; the Column version
    remains the semantic spec and the test/oracle reference.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    # re.ASCII: Java/RE2 '\s' is ASCII-only; Python's default is Unicode.
    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("array<string>")
    def _shingles(text: pd.Series) -> pd.Series:
        def grams(t):
            if t is None:
                return []
            w = [tok for tok in ws.split(t.strip()) if tok]
            if len(w) < n:
                return []
            return list(dict.fromkeys(
                " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
            ))

        return text.map(grams)

    return _shingles


def pair_jaccard_udf(n: int = 3):
    """Arrow-batched pandas UDF: (text1, text2) → exact shingle-set
    Jaccard as a double (r14, verdict Next #3). Built for the verify
    stage of MinHash-LSH, which scores only the CANDIDATE pairs — a
    relation orders of magnitude smaller than the corpus — so shingling
    both texts per pair in Python is cheaper than materializing (and
    persisting) a corpus-sized shingle-array relation just to join it
    twice. Shingle semantics are ``shingle_array_udf``'s exactly (same
    ASCII ``\\s+`` tokenizer, first-occurrence dedup); the ratio is
    |I|/|U| of exact small integers — bit-equal to the
    ``array_intersect``-based column expression. Pairs where either
    side has no shingles yield null (they can never collide in a
    bucket, but the contract matches the old inner-join-on-shingled
    behavior of excluding them)."""
    import re

    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+", re.ASCII)

    def grams(t):
        if t is None:
            return None
        w = [tok for tok in ws.split(t.strip()) if tok]
        if len(w) < n:
            return None
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    @pandas_udf("double")
    def _jac(t1: pd.Series, t2: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(t1, t2):
            sa, sb = grams(a), grams(b)
            if not sa or not sb:
                out.append(None)
                continue
            inter = len(sa & sb)
            out.append(inter / (len(sa) + len(sb) - inter))
        return pd.Series(out, dtype="float64")

    return _jac


# Patterns chosen to parse identically in Java regex (Spark) and RE2-ish
# dialects (DuckDB): no lookaround, no POSIX classes.
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def scrub_pii(text: Column) -> Column:
    """Mask emails then phone-shaped numbers — the minimum-viable PII pass
    of a training-data pipeline. SQL: regexp_replace(regexp_replace(text,
    email, '<EMAIL>', 'g'), phone, '<PHONE>', 'g')."""
    t = F.regexp_replace(text, _EMAIL_PAT, "<EMAIL>")
    return F.regexp_replace(t, _PHONE_PAT, "<PHONE>")


def repetition_signals_udf():
    """Arrow-batched pandas UDF: text → struct of Gopher-style repetition
    counts (n_tokens, n_3grams, n_dup_3grams, max_tok_count).

    Emits exact integer counts; ratios (duplicate-3gram fraction, top-token
    fraction) are single IEEE divisions done JVM-side by the caller, so the
    whole signal is bit-deterministic across engines. Python path for the
    same reason as shingling: gram construction via JVM higher-order
    functions is interpreted and ~100x slower.
    """
    import re
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("n_tokens long, n_3grams long, n_dup_3grams long, max_tok_count long")
    def _signals(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            w = [tok for tok in ws.split(t.strip()) if tok] if t else []
            n = len(w)
            grams = [" ".join(w[i : i + 3]) for i in range(n - 2)] if n >= 3 else []
            n3 = len(grams)
            rows.append(
                {
                    "n_tokens": n,
                    "n_3grams": n3,
                    "n_dup_3grams": n3 - len(set(grams)),
                    "max_tok_count": max(Counter(w).values()) if n else 0,
                }
            )
        return pd.DataFrame(rows)

    return _signals


# GPT-2-family pretokenizer shape: contractions, letter runs, digit runs,
# punctuation runs, each with an optional leading space. Whitespace runs
# are separators, not tokens. Java \p{L}/\p{N} = full Unicode classes.
_BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def subword_token_count(text: Column) -> Column:
    """BPE-style pretoken count (bigint): how many pieces the GPT-2-family
    pretokenizer regex splits the text into. A codegen'd JVM regex pass —
    the cheap scan-stage proxy for tokenizer budgeting when running the
    real (Python) tokenizer over 100 TB would dominate the job. The BPE
    merge table is NOT applied: counts correlate with, and upper-bound,
    real tokenizer output (every merge only fuses pretoken pieces)."""
    return F.regexp_count(text, F.lit(_BPE_SPLIT_RE)).cast("long")


def winnow_fingerprints_udf(k: int = 9, window: int = 4):
    """Arrow-batched pandas UDF: text → array<bigint> winnowing
    fingerprints (Schleimer/Wilkerson/Aiken, the MOSS algorithm).

    Rolling polynomial hash (base 257, uint64 wraparound) over character
    ``k``-grams of the normalized text, then the minimum hash of each
    ``window`` of consecutive k-gram hashes (rightmost-min tie-break),
    deduplicated. Guarantees: any substring match of length >=
    k + window - 1 between two documents shares at least one fingerprint
    — the local-overlap detector exact shingle sets cannot give at
    bounded output size. Output is ~|text| / window hashes.

    Vectorized numpy per batch (sliding_window_view + one matmul per
    doc); the whole pass is one Arrow crossing, no shuffle — fingerprints
    then feed an explode + groupBy join exactly like the LSH band tables.
    """
    from pyspark.sql.functions import pandas_udf

    base = np.uint64(257)
    powers = base ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    def fingerprints(t):
        if not t:
            return []
        s = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(s) < k:
            return []
        grams = np.lib.stride_tricks.sliding_window_view(s, k)
        H = (grams * powers).sum(axis=1, dtype=np.uint64)
        if len(H) < window:
            picks = np.array([H.min()], dtype=np.uint64)
        else:
            W = np.lib.stride_tricks.sliding_window_view(H, window)
            # rightmost minimum per window: reverse, argmin, map back
            rev = W[:, ::-1]
            idx = (window - 1) - rev.argmin(axis=1)
            picks = W[np.arange(len(W)), idx]
        # fingerprint SET (sorted, distinct); int64 view because Spark has
        # no unsigned type — the bit pattern is the identifier
        return np.unique(picks).view(np.int64).tolist()

    @pandas_udf("array<long>")
    def _winnow(text: pd.Series) -> pd.Series:
        return text.map(fingerprints)

    return _winnow


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text (array<string>)."""
    t = normalize_text(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(0)))
    return F.when(
        F.length(t) >= n,
        F.array_distinct(F.transform(idx, lambda i: F.substring(t, i.cast("int"), n))),
    ).otherwise(F.array().cast("array<string>"))


def py_token_fn():
    """Self-contained Python twin of ``normalize_text`` + ``tokens`` for
    Arrow-UDF builders (DSIR featurization, bigram LM pairs): returns a
    closure over locally-compiled regexes so pandas UDFs capturing it
    pickle BY VALUE — no module import needed on workers (the same
    reason ``shingle_array_udf`` keeps its logic local). ``re.ASCII``
    because Java's \\s is ASCII-only. One definition, every Python-side
    tokenizer stays byte-equivalent with the JVM normalization."""
    import re

    ws = re.compile(r"\s+", re.ASCII)
    punct = re.compile(r"[.,!?;:]")

    def toks(t):
        if t is None:
            return []
        return [x for x in ws.split(punct.sub("", t.lower()).strip()) if x]

    return toks
