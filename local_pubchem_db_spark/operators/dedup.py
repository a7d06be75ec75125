"""Deduplication operators over a document table.

Generalizes the reference's PK-uniqueness / InChIKey_1-prefix-blocking
model (reference utils.py:192-197, default_db_layout.json:20-26) to the
dedup family a training-data pipeline needs:

- exact (hash groupBy)
- near-dup: shingle-blocked exact Jaccard, MinHash+LSH, SimHash

Scale notes:
- Exact dedup shuffles once on the content hash (map-side partial
  aggregation applies).
- ``ngram_jaccard_pairs`` blocks on shared shingles — exact results, but
  the block join grows with shingle document frequency; cap skew with
  ``max_shingle_df`` (drops shingles appearing in more than N docs — an
  ubiquitous shingle carries no discriminating signal; at 100 TB this is
  the difference between a bounded join and a cross product).
- ``minhash_lsh_dedup_pairs`` is the scale path: candidate generation is
  linear in documents × bands, then candidates are verified with exact
  Jaccard so the output equals the brute-force result w.h.p. (128 perms /
  32 bands: a pair at the 0.8 threshold is missed with p ≈ 5e-8).
"""

from __future__ import annotations

from threading import Thread
from typing import NamedTuple
from weakref import WeakKeyDictionary

import pandas as pd
from pyspark.sql import DataFrame, Column, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from local_pubchem_db_spark.functions.hashing import (
    hamming64,
    minhash_band_udf,
    simhash_udf,
)
from local_pubchem_db_spark.functions.text import shingle_array_udf, tokens
from local_pubchem_db_spark.operators.util import (
    fan_out,
    register_session_memo,
    shared,
)


def exact_dedup(df: DataFrame, subset: list[str]) -> DataFrame:
    """Keep one arbitrary row per key — Spark's dropDuplicates."""
    return df.dropDuplicates(subset)


def exact_dedup_by_content(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Canonical exact dedup: group by md5(text), keep the smallest id.

    Deterministic (unlike dropDuplicates) and oracle-expressible:
    SELECT md5(text) AS content_hash, min(id), count(*) GROUP BY md5(text).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _with_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    # Shingling runs as an Arrow-batched pandas UDF: Spark's higher-order
    # array functions are interpreted (no codegen), ~100x slower per row
    # than the vectorized Python path for gram construction. fan_out
    # first: shingling is CPU-bound and must not be serialized by a
    # low-split scan. shared() last: every caller references the shingle
    # relation from 2-4 plan subtrees (bucketing + verification sides).
    return shared(
        fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")))
        .select("id", shingle_array_udf(n)(F.col("text")).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )


def _verify_jaccard(cand: DataFrame, shingled: DataFrame, threshold: float) -> DataFrame:
    """Join candidate (id1, id2) pairs back to shingle sets and keep pairs
    with exact Jaccard >= threshold. Jaccard = |I| / |U| is a ratio of
    small exact integers — bit-deterministic across engines."""
    a = shingled.select(F.col("id").alias("id1"), F.col("shingles").alias("s1"))
    b = shingled.select(F.col("id").alias("id2"), F.col("shingles").alias("s2"))
    inter = F.size(F.array_intersect("s1", "s2"))
    union = F.size("s1") + F.size("s2") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _verify_jaccard_from_texts(
    cand: DataFrame,
    rel: DataFrame,
    shingle_len: int,
    threshold: float,
    *,
    broadcast_cand: bool = False,
    broadcast_half: bool = False,
) -> DataFrame:
    """Exact-Jaccard verify from the candidate pairs' RAW TEXTS (r14/r15
    plan shape, shared by the batch and incremental paths): join the
    (id1, id2) candidates back to the (id, text) relation and compute
    Jaccard with ``pair_jaccard_udf`` — pair-count-sized Python work,
    ZERO corpus-sized shingle state. Bit-identical to the shingle-array
    ``_verify_jaccard`` (same tokenizer, same exact-integer ratio;
    pinned in tests). The broadcast flags are the r15 gate outcomes —
    callers must pass True only under a measured size bound (see
    ``_lsh_verified_pairs``); the default is plain shuffle joins."""
    from local_pubchem_db_spark.functions.text import pair_jaccard_udf

    a = rel.select(F.col("id").alias("id1"), F.col("text").alias("__t1"))
    b = rel.select(F.col("id").alias("id2"), F.col("text").alias("__t2"))
    jac = pair_jaccard_udf(shingle_len)(F.col("__t1"), F.col("__t2"))
    half = a.join(F.broadcast(cand) if broadcast_cand else cand, "id1")
    return (
        (F.broadcast(half) if broadcast_half else half)
        .join(b, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _fused_band_buckets(
    rel: DataFrame, shingle_len: int, num_perm: int, bands: int
) -> DataFrame:
    """(id, band, bucket) rows straight from raw text — ONE Arrow
    crossing through the fused ``minhash_band_text_udf`` (r14 batch
    path; adopted by the index/incremental/streaming paths in r15,
    VERDICT r14 What's-missing #1). Short docs (< shingle_len tokens)
    yield a NULL band array, which posexplode drops — exactly the rows
    the old shingle relation's ``size(shingles) > 0`` filter removed,
    so bucket output is bit-identical to ``_minhash_buckets`` over
    ``_with_shingles`` (the fused UDF's equality pin covers the band
    values; this helper pins the row set)."""
    from local_pubchem_db_spark.functions.hashing import (
        minhash_band_text_udf,
    )

    return fan_out(rel).select(
        "id",
        F.posexplode(
            minhash_band_text_udf(num_perm, bands, shingle_len)(
                F.col("text")
            )
        ).alias("band", "bucket"),
    )


def _all_pairs_expr(ids_: Column) -> Column:
    """array<struct<id1,id2>> of all (i < j) pairs of a sorted id array."""
    return F.flatten(
        F.transform(
            ids_,
            lambda x, i: F.transform(
                F.slice(ids_, i + F.lit(2), F.size(ids_)),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )


def _star_chain_expr(ids_: Column) -> Column:
    """array<struct<id1,id2>> linking every member of a sorted id array to
    the minimum (star) and to its predecessor (chain): <2n edges that keep
    the set connected without the C(n,2) blow-up."""
    return F.flatten(
        F.transform(
            F.slice(ids_, 2, F.greatest(F.size(ids_) - 1, F.lit(0))),
            # element i of the tail is ids[i+2] 1-based; its chain
            # predecessor is ids[i+1], and the star root is ids[1] (the
            # minimum — array_distinct drops the duplicate edge where
            # predecessor == root).
            lambda x, i: F.array_distinct(
                F.array(
                    F.struct(F.element_at(ids_, 1).alias("id1"), x.alias("id2")),
                    F.struct(
                        F.element_at(ids_, i + F.lit(1)).alias("id1"),
                        x.alias("id2"),
                    ),
                )
            ),
        )
    )


def _exhaustive_pairs(
    grouped: DataFrame,
    group_keys: list[str],
    array_expand_limit: int = 1024,
) -> DataFrame:
    """All (id1 < id2) pairs from rows holding sorted ``_ids`` arrays,
    memory-safe for arbitrarily large groups: groups within
    ``array_expand_limit`` expand through the in-row C(n,2) array
    expression (fast, no extra shuffle), groups above it explode back to
    rows and self-join on the group keys — the pair stream then flows
    through normal shuffle machinery instead of materializing n^2
    structs in ONE task's row buffer (the shape that OOMed the JVM at
    55s on the sf3 30-way simhash flood: quadratic output is a cost,
    a quadratic single-row allocation is a crash)."""
    small = grouped.filter(F.size("_ids") <= array_expand_limit)
    big = grouped.filter(F.size("_ids") > array_expand_limit)
    p_small = small.select(
        F.explode(_all_pairs_expr(F.col("_ids"))).alias("_p")
    ).select(F.col("_p.id1").alias("id1"), F.col("_p.id2").alias("id2"))
    e = big.select(*group_keys, F.explode("_ids").alias("_id"))
    p_big = (
        e.alias("x")
        .join(e.alias("y"), list(group_keys))
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("id1"), F.col("y._id").alias("id2"))
    )
    return p_small.unionByName(p_big)


def bounded_bucket_pairs(
    buckets: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Distinct candidate ``(id1 < id2)`` pairs from bucket collisions,
    with OVERSIZED buckets emitting a connectivity subgraph instead of
    all C(n,2) pairs.

    The naive bucket self-join is quadratic in bucket size: a 1000-way
    duplicate cluster lands all 1000 members in one (band, bucket) and
    emits ~500k pairs PER BAND — measured at ~45x candidate load on a
    10x dup-heavy corpus, the one shape that breaks LSH dedup at 100 TB.
    Component resolution (``connected_components`` / ``dedup_keep_ids``)
    only needs each true duplicate cluster to stay CONNECTED, not every
    pair, so buckets larger than ``max_bucket_size`` emit:

    - a star: every member linked to the bucket's minimum id (keeps the
      resolved component diameter ~2, so min-label propagation still
      converges in a couple of rounds), plus
    - a chain: every member linked to its sorted predecessor (redundancy
      if an individual star edge fails downstream exact verification),

    i.e. <2n edges per oversized bucket — no join blow-up. Buckets within
    the cap keep the exact all-pairs candidate set, so pair-level output
    is unchanged wherever the cap doesn't bite. ``max_bucket_size=None``
    disables the cap (every bucket expands all-pairs).

    The cap's soundness premise: an oversized bucket is overwhelmingly a
    REAL near-dup cluster (true for fine bucketings — 64-bit MinHash
    band buckets, SRP at r >= 8 sign bits — where unrelated collisions
    are rare). Star+chain edges are chosen by id order, while downstream
    verification filters by similarity; in a MIXED oversized bucket
    (members not all mutually above threshold) a member whose star and
    chain edges all fail verification loses its true pairs — bounded
    recall loss at the cap boundary, the documented trade. For COARSE
    bucketings whose big buckets are mostly non-dups by design (SimHash
    16-bit quarters, SRP at r < 8), all-pairs IS the recall mechanism:
    keep the cap off there (see the callers' defaults).

    Cost shape: ONE shuffle — ``groupBy(keys).collect_list(id)`` — then
    the pair expansion happens as array expressions on the grouped row
    (the classic bucket SELF-join shuffles the relation twice and is
    quadratic per bucket with no way to intervene). Each bucket's sorted
    id array materializes on one task, which is exactly the bounded
    amount of state the cap guarantees we can afford; with the cap
    disabled a pathological flood bucket concentrates in one task — the
    caller has opted into that.
    """
    grouped = buckets.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("_ids")
    )
    return _capped_pairs(grouped, key_cols, max_bucket_size).distinct()


def _capped_pairs(
    grouped: DataFrame, group_keys: list[str], cap: int | None
) -> DataFrame:
    """(id1 < id2) pairs from ``_ids`` group rows under ONE cap policy,
    shared by bucket expansion and the exact-collapse intra expansion
    (their docstrings promise identical governance): cap=None takes the
    memory-safe exhaustive hybrid; otherwise groups within the cap emit
    all pairs, larger ones the star+chain connectivity subgraph."""
    if cap is None:
        return _exhaustive_pairs(grouped, group_keys)
    ids_ = F.col("_ids")
    expand = F.when(
        F.size(ids_) <= cap, _all_pairs_expr(ids_)
    ).otherwise(_star_chain_expr(ids_))
    return grouped.select(F.explode(expand).alias("_p")).select(
        F.col("_p.id1").alias("id1"), F.col("_p.id2").alias("id2")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_len: int = 3,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact near-dup pairs (id1 < id2, jaccard) via shared-shingle blocking.

    Two documents with Jaccard >= t > 0 share at least one shingle, so
    blocking on shingles loses nothing (when max_shingle_df doesn't bite;
    with the default cap a missed pair would need ALL its shared shingles
    to occur in >1000 docs — such pairs are boilerplate, not content).

    Physical shape note (r5, measured at sf0.1): this blocking join was
    also tried as the one-shuffle ``groupBy(shingle).collect_list`` +
    array-expansion formulation that won for ``minhash_lsh_dedup_pairs``
    (7.8s) and as a window-count df cap with exchange-reuse into the
    self-join (7.4s); the original groupBy-count + rare-semi-join +
    self-join below stays fastest (6.1s) because shingle groups are
    Zipf-tailed singletons — the codegen'd join skips them for free while
    an object-hash collect_list pays per-group overhead. Unlike the LSH
    cap, an over-cap shingle is DROPPED entirely (a ubiquitous shingle
    carries no blocking signal) — semantics the DuckDB oracle mirrors in
    its blocking CTE; per-bucket quadratic blow-up is therefore already
    bounded by ``max_shingle_df``, no star+chain needed.
    """
    shingled = _with_shingles(df, id_col, text_col, shingle_len)
    exploded = shingled.select("id", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        rare = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(rare, "shingle")
    cand = (
        exploded.alias("x")
        .join(exploded.alias("y"), "shingle")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"))
        .distinct()
    )
    return _verify_jaccard(cand, shingled, threshold)


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_len: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    max_bucket_size: int | None = 64,
    collapse_exact: bool = True,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, exact-Jaccard-verified.

    Candidate pairs collide in >=1 of ``bands`` bands over a
    ``num_perm``-slot signature; every candidate is then verified against
    the exact Jaccard threshold, so false positives are eliminated and the
    output matches the brute-force oracle up to the (negligible) LSH miss
    probability. Cost is linear in corpus size — this is the 100 TB path.

    ``max_bucket_size`` caps the per-(band, bucket) pair join (see
    ``bounded_bucket_pairs``): duplicate-heavy corpora put thousand-way
    clusters into single buckets, and without the cap candidate volume is
    quadratic in cluster size. Within the cap the candidate set — and so
    the verified pair output — is exactly the classic LSH result; above
    it, oversized buckets contribute a star+chain connectivity subgraph,
    which preserves cluster membership under ``dedup_keep_ids`` while
    bounding candidates to O(n · bands).

    ``collapse_exact`` (default on — the production recipe): EXACT
    duplicates are collapsed to one representative per distinct text
    BEFORE shingling, so the expensive tiers (shingle UDF, MinHash
    signatures, bucket shuffle, Jaccard verification) run over unique
    texts only; verified rep-level pairs then expand back to member
    level. In a replica-flood corpus (the r7 sf3 replicas: 150k docs as
    30-way exact clusters) this divides the heavy compute by the
    duplication factor while emitting the identical pair relation:
    identical text means identical shingle sets, so cross-group pairs
    inherit the rep pair's exact jaccard and intra-group pairs are
    jaccard 1.0 by construction (docs too short to shingle emit no
    pairs, matching the brute-force oracle's null-jaccard exclusion).
    ``max_bucket_size`` governs the expansions the same way it governs
    buckets: an exact group above the cap contributes star+chain intra
    edges and caps its cross-expansion membership — connectivity (and
    so ``dedup_keep_ids`` components) preserved, output bounded.
    """
    if not collapse_exact:
        rel = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        # A caller that pre-collapsed AND cached its relation (e.g.
        # clean_corpus's shared() exact-deduped frame) gets the measured
        # text-broadcast gate — the mean-octets aggregate scans the
        # InMemoryRelation, not cold storage. Detection reads the INPUT
        # frame's own storage level (the trivial projection above still
        # resolves against the cached parent); a merely-derived-from-
        # cached frame reports NONE and conservatively skips the gate.
        lvl = df.storageLevel
        return _lsh_verified_pairs(
            rel,
            shingle_len,
            num_perm,
            bands,
            max_bucket_size,
            threshold,
            rel_cached=bool(lvl.useMemory or lvl.useDisk),
        )
    # lazy persist (r15 optimization round): the _dup_info probe below is
    # the invocation's FIRST action and references groups in exactly one
    # subtree, so ITS execution fills the cache — the separate eager
    # count() job shared() would run is pure overhead here (the sf0.1
    # phase profile charged it ~4 of the row's 18 stage-jobs).
    groups = _exact_groups(df, id_col, text_col, eager=False)
    # a group of identical too-short texts has no shingles and must
    # emit no pairs (matching the brute-force null-jaccard exclusion);
    # "has shingles" == word count >= shingle_len, computed JVM-side
    # (same ASCII \s+ tokens as the shingle UDF) now that the full
    # shingle relation is no longer materialized (r14)
    valid_pred, valid_key = _shingleable(shingle_len)
    # ONE memoized probe job for every per-invocation scalar (r15: dup
    # sizing + the text-broadcast gate's mean octets used to be three
    # separate aggregation jobs plus a second literal collect). r16
    # (guide §2.6, VERDICT r15 Next #3): the literal-dup collect rides a
    # driver thread, overlapping the candidate bucketing/count jobs
    # _lsh_verified_pairs runs next — the probe aggregation has already
    # filled the groups cache, so both sides read the InMemoryRelation
    # and no fill race exists; resolve() joins the thread before the
    # expansion needs the literal.
    probe = _dup_info_start(
        groups, valid_pred, max_bucket_size, valid_key=valid_key,
        overlap=True,
    )
    reps = groups.select(F.col("gid").alias("id"), "text")
    rep_pairs = _lsh_verified_pairs(
        reps,
        shingle_len,
        num_perm,
        bands,
        max_bucket_size,
        threshold,
        # reps projects the shared() cached exact-groups relation, so
        # the text-gate's mean-octets measurement is memory-speed here
        rel_cached=True,
        mean_octets=probe.mean_octets,
    )
    info = probe.resolve()
    # Warm-service fast path (r7 bench regression: the expansion joins
    # ran every invocation even on corpora with no exact dups): the
    # memoized dup-set sizing routes the expansion through the cheapest
    # admissible shape — identity / plan literals / broadcast / shuffle
    # (see _expand_collapsed).
    return _expand_collapsed(
        groups,
        rep_pairs,
        val_col="jaccard",
        intra_column=F.lit(1.0),
        intra_value=1.0,
        valid_pred=valid_pred,
        cap=max_bucket_size,
        info=info,
    )


def _word_count(text: Column) -> Column:
    """Whitespace token count, JVM-side, with EXACTLY the shingle UDF's
    tokenizer semantics: Java ``\\s`` is ASCII (matching the UDF's
    ``re.ASCII``), trim first, empty tokens dropped (a trailing/leading
    split artifact and the ''-for-empty-string case)."""
    toks = F.split(F.trim(text), r"\s+")
    return F.size(F.filter(toks, lambda x: x != F.lit("")))


def _shingleable(shingle_len: int) -> tuple[Column, str]:
    """(predicate, memo key) for "this representative text has enough
    tokens to shingle" — built TOGETHER so the ``_dup_info`` memo key
    can never drift from the predicate it stands for (ADVICE r15: a
    call site reusing a key string with a different predicate over the
    same cached groups relation would silently serve the wrong memoized
    dup structure). Any new validity predicate must get its own key
    family here, never a recycled string."""
    return _word_count(F.col("text")) >= shingle_len, f"wc>={shingle_len}"


def _lsh_verified_pairs(
    rel: DataFrame,
    shingle_len: int,
    num_perm: int,
    bands: int,
    max_bucket_size: int | None,
    threshold: float,
    *,
    rel_cached: bool = False,
    mean_octets: float | None = None,
) -> DataFrame:
    """Exact-verified LSH pairs over an (id, text) relation — the r14
    plan shape (verdict Next #3, measured in MINHASH_r14): the corpus
    crosses into Python ONCE through the fused text→band-buckets UDF
    (``minhash_band_text_udf``), and exact Jaccard is computed from the
    candidate pairs' RAW TEXTS with ``pair_jaccard_udf`` — the shingle
    ARRAYS, previously a persisted corpus-sized relation feeding both
    the signature and the verify sides, are never materialized at all.
    The candidate relation is pair-count-sized, so re-shingling both
    texts per pair in Python is noise next to the corpus-sized
    materialization it replaces (a first cut that shingled
    candidate-only ROWS via two semi-joins lost the savings to three
    extra sequential job round-trips — measured, MINHASH_r14). The
    text-fetch joins hint the candidate side broadcast — keeping the
    corpus side map-only — but ONLY under measured-size gates (r15;
    VERDICT r14 What's-wrong #1 / ADVICE medium): the candidate-pair
    count scales with corpus size × near-dup density, so on a
    near-dup-heavy 100 TB corpus the pair relation is billions of rows
    and an explicit hint (which AQE cannot demote) would OOM the job.
    The gate is the same policy ``_DUP_BROADCAST_LIMIT`` applies to the
    dup-member joins, tiered by payload:

    - id-only ``cand`` broadcasts iff its MEASURED row count is within
      ``_LSH_PAIR_BROADCAST_LIMIT`` (1M pairs × ~24 B ≈ 24 MB — far
      under the 8 GB hard limit);
    - the text-carrying ``half`` broadcasts iff, additionally, count ×
      (corpus mean text octets + row overhead) fits
      ``_LSH_TEXT_BROADCAST_BYTES``. The mean is corpus-wide while the
      candidate texts may skew long, so the 64 MB ceiling keeps two
      orders of magnitude of margin under the hard limit (at bench
      scale the payload is ~MBs, so the fast plan stays engaged).
      The mean-octets aggregate reads the corpus text column, so it is
      measured ONLY when ``rel_cached`` says the relation is already
      in memory: the collapse path (``rel`` derives from the shared()
      cached exact-groups relation), and any no-collapse caller whose
      INPUT frame is itself persisted — ``minhash_lsh_dedup_pairs``
      detects that via the frame's storage level (clean_corpus's
      shared() exact-deduped relation is the production case). Either
      way the aggregate is memory-speed. On a genuinely uncached
      ``rel`` the text gate is simply not engaged (``half`` takes the
      shuffle join, the shape that worked at scale pre-r14) rather
      than paying a fourth cold columnar scan of the heaviest column
      to decide an optimization (r15 review finding — the scan would
      grow linearly with corpus size in exactly the mid-scale regime
      where the pair gate passes).

    Above a gate the join falls back to a plain shuffle join — the
    pre-r14 verify shape, which is exactly what worked at scale before
    the hints landed. Measuring the count means ``cand`` is persisted
    and counted eagerly (pair-count-sized state, NOT corpus-sized —
    MEMORY_AND_DISK spills rather than OOMs); the count doubles as the
    eager fill preventing the sibling-subtree recompute race
    ``shared()`` documents, so the corpus still crosses the band UDF
    exactly once. The count is NOT memoized across invocations: a
    stale small count on a grown corpus would re-engage the hint in
    the OOM direction (the unsafe direction ``broadcast_if_small``
    documents), and one pair-relation count per invocation is the
    honest price of a safe gate.

    Scan-count trade, stated: ``rel`` appears in three plan subtrees
    (bucketing + both text-fetch sides), so the base relation is read
    three times where the old plan read it once into a persisted
    corpus-sized shingle relation. On the default collapse path ``rel``
    is the shared() exact-groups relation (cached — re-reads are
    memory-speed, and the text-gate's mean-octets aggregate adds a
    fourth memory-speed read); on the no-collapse path with an
    UNCACHED input they are three columnar scans of (id, text) —
    exactly three, the text gate is skipped — the deliberate price of
    holding ZERO corpus-sized state, which at 100 TB is the binding
    constraint; a no-collapse caller that persisted its input
    (clean_corpus) trades that state for memory-speed re-reads and
    gets the measured gate back."""
    buckets = _fused_band_buckets(rel, shingle_len, num_perm, bands)
    cand = bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=max_bucket_size
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = cand.count()
    broadcast_pairs = n_pairs <= _LSH_PAIR_BROADCAST_LIMIT
    broadcast_texts = False
    if broadcast_pairs and n_pairs > 0 and rel_cached:
        # ``mean_octets`` is handed in by the collapse path (the
        # _dup_info probe measures it in the same job as the dup
        # sizing — r15); a cached no-collapse caller still measures it
        # here with one tiny memory-speed aggregate.
        if mean_octets is None:
            mean_octets = (
                rel.agg(F.avg(F.octet_length("text"))).first()[0] or 0.0
            )
        est_payload = n_pairs * (mean_octets + _LSH_PAIR_ROW_OVERHEAD)
        # Driver-literal verify tier (r15 optimization round): a
        # measured-tiny candidate set skips BOTH text-fetch joins —
        # collect the pairs (persisted, just counted), fetch their
        # texts with ONE in-memory isin scan, and verify over an
        # Arrow-local relation. The execution plan loses its two
        # sequential BroadcastExchange builds (measured 3 jobs -> 1 on
        # the sf0.1 noop exec), the same bounded-collect pattern the
        # expansion's literal tier already uses. Gates: pair count AND
        # the estimated text payload (same corpus-mean basis as the
        # broadcast gate, with a 16x tighter ceiling because this
        # payload lands on the driver). Above a gate: the broadcast /
        # shuffle joins below, unchanged — the 100 TB shape.
        if (
            n_pairs <= _LSH_DRIVER_VERIFY_PAIRS
            and est_payload <= _LSH_DRIVER_VERIFY_BYTES
        ):
            return _verify_pairs_driver(cand, rel, shingle_len, threshold)
        broadcast_texts = est_payload <= _LSH_TEXT_BROADCAST_BYTES
    return _verify_jaccard_from_texts(
        cand,
        rel,
        shingle_len,
        threshold,
        broadcast_cand=broadcast_pairs,
        broadcast_half=broadcast_texts,
    )


def _verify_pairs_driver(
    cand: DataFrame, rel: DataFrame, shingle_len: int, threshold: float
) -> DataFrame:
    """Exact-Jaccard verify of a measured-tiny candidate set over an
    Arrow-local relation: pairs and their texts are collected (both
    reads hit caches — ``cand`` is persisted and counted by the caller,
    ``rel`` is the caller-vouched cached corpus projection), zipped
    driver-side, and shipped back as ONE ``driver_rows_df`` local
    relation feeding the same ``pair_jaccard_udf`` + threshold filter
    as the join tiers — identical rows, no joins, no broadcast builds.
    Callers gate on pair count and estimated payload
    (``_LSH_DRIVER_VERIFY_PAIRS`` / ``_LSH_DRIVER_VERIFY_BYTES``)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from local_pubchem_db_spark.functions.text import pair_jaccard_udf
    from local_pubchem_db_spark.operators.util import driver_rows_df

    pairs = cand.select("id1", "id2").collect()
    ids = sorted({r["id1"] for r in pairs} | {r["id2"] for r in pairs})
    texts = {
        r["id"]: r["text"]
        for r in rel.filter(F.col("id").isin(ids)).collect()
    }
    id_t = rel.schema["id"].dataType
    schema = StructType(
        [
            StructField("id1", id_t),
            StructField("id2", id_t),
            StructField("__t1", StringType()),
            StructField("__t2", StringType()),
        ]
    )
    # ADVICE r15: a candidate id absent from ``rel`` is dropped, matching
    # the join tiers' inner-join semantics (unreachable today — ``cand``
    # derives from ``rel`` — but a future caller violating that must see
    # the same rows the join tiers would emit, not a KeyError). The other
    # documented divergence stands: duplicate ids in a no-collapse ``rel``
    # collapse to ONE text here where the join tiers multiply rows; the
    # tier is gated to the collapse path / cached-distinct callers where
    # ids are unique by construction.
    local = driver_rows_df(
        cand.sparkSession,
        [
            (r["id1"], r["id2"], texts[r["id1"]], texts[r["id2"]])
            for r in pairs
            if r["id1"] in texts and r["id2"] in texts
        ],
        schema,
    )
    jac = pair_jaccard_udf(shingle_len)(F.col("__t1"), F.col("__t2"))
    return local.select("id1", "id2", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def _exact_groups(
    df: DataFrame, id_col: str, text_col: str, eager: bool = True
) -> DataFrame:
    """(gid, _ids, text): one row per DISTINCT text — sorted member ids
    (gid = minimum) plus one representative text. One shuffle produces
    the whole group structure; shared() because the collapse consumers
    reference it from 2-3 plan subtrees (reps + both expansions).

    ``eager=False`` (r15): skip shared()'s cache-fill count when the
    CALLER's first action is itself a single-subtree reference to this
    relation (the _dup_info probe, an eager downstream shared()) — that
    action then performs the fill, and the separate count job is saved.
    The fill-race shared() documents only exists when the first action
    references the relation from MULTIPLE subtrees; callers passing
    False are asserting their action ordering avoids that."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    # NULL must stay its OWN group, distinct from '': the tokenizer gives
    # '' a phantom empty token (so two '' docs DO pair under SimHash)
    # while NULL yields no tokens at all — folding them together would
    # hand the '' group a NULL representative and silently drop its
    # pairs. md5(NULL) is NULL; the sentinel can never collide with a
    # real md5 hex digest.
    return shared(
        base.withColumn(
            "__h", F.coalesce(F.md5(F.col("text")), F.lit("<null>"))
        )
        .groupBy("__h")
        .agg(
            F.sort_array(F.collect_list("id")).alias("_ids"),
            F.min_by("text", "id").alias("text"),
        )
        .select(F.element_at("_ids", 1).alias("gid"), "_ids", "text"),
        eager=eager,
    )


# LSH verify broadcast gates (r15 — see _lsh_verified_pairs docstring):
# the id-only candidate-pair relation broadcasts under the same 1M-row
# policy as _DUP_BROADCAST_LIMIT; the text-carrying side additionally
# needs its ESTIMATED payload (measured pair count × corpus mean text
# octets + per-row overhead) under a 64 MB ceiling — conservative by two
# orders of magnitude vs the 8 GB broadcast hard limit, because the
# estimate uses a corpus-wide mean while candidate texts can skew long.
_LSH_PAIR_BROADCAST_LIMIT = 1_000_000
_LSH_TEXT_BROADCAST_BYTES = 64 << 20
_LSH_PAIR_ROW_OVERHEAD = 64  # UnsafeRow + hash-relation slot, per pair

# Driver-literal verify tier (r15, see _verify_pairs_driver): both gates
# must pass — a bounded pair count AND an estimated text payload a
# driver collect can absorb without thought (4 MB against a 16 GB
# driver; the corpus-mean basis can underestimate skewed candidate
# texts, hence the 16x margin under the broadcast ceiling).
_LSH_DRIVER_VERIFY_PAIRS = 4_096
_LSH_DRIVER_VERIFY_BYTES = 4 << 20

_DUP_BROADCAST_LIMIT = 1_000_000  # dup member ids that fit a broadcast
_DUP_LITERAL_LIMIT = 1_024  # dup member ids that fit plan LITERALS
_DUP_LITERAL_PAIR_LIMIT = 100_000  # driver-computed intra pairs cap

# (canonical groups plan, canonical valid plan, cap) -> (CacheManager
# entry, dup info), per session. The plan-string key is only a lookup
# accelerator — plan strings HIDE LocalRelation data, so two different
# in-memory corpora can share one (caught in test; the whole-file run
# reused one corpus's dup set for another). Validity therefore rests on
# the stored CacheManager ENTRY equaling the relation's current entry:
# CachedData equality is structural over the analyzed plan INCLUDING
# LocalRelation rows, so a different corpus can never validate. Dropped
# by release_shared_caches. This is what makes the warm-service path
# job-free: the dup set is a pure function of the cached relation.
_DUP_MEMO: WeakKeyDictionary = WeakKeyDictionary()
register_session_memo(_DUP_MEMO)


def _plan_key(df: DataFrame) -> str | None:
    try:
        return (
            df._jdf.queryExecution().analyzed().canonicalized().toString()
        )
    except Exception:  # noqa: BLE001 — internal API probe, fail open
        return None


def _cache_entry(df: DataFrame):
    """The CacheManager's CachedData entry for this plan, or None."""
    try:
        opt = (
            df.sparkSession._jsparkSession.sharedState()
            .cacheManager()
            .lookupCachedData(df._jdf)
        )
        return opt.get() if opt.isDefined() else None
    except Exception:  # noqa: BLE001 — internal API probe, fail open
        return None


class DupInfo(NamedTuple):
    """Per-invocation scalars of an ``_exact_groups`` relation, computed
    in ONE aggregation job (r15: the dup sizing and the LSH text-gate's
    mean octets used to be separate jobs): dup group count, total dup
    member ids, the literal dup structure (when the dup set fits plan
    literals, else None), and the mean text octet length over the
    distinct-text representatives (the corpus-wide mean the
    ``_LSH_TEXT_BROADCAST_BYTES`` gate multiplies by)."""

    n_dup: int
    dup_members: int
    literal: dict | None
    mean_octets: float


class _DupProbe(NamedTuple):
    """In-flight ``_dup_info`` probe (see ``_dup_info_start``): the
    aggregation scalars are available immediately; ``resolve()`` joins
    the (possibly threaded) literal-dup collect and returns the
    completed, memoized ``DupInfo``."""

    n_dup: int
    dup_members: int
    mean_octets: float
    resolve: "object"  # Callable[[], DupInfo]


def _dup_info_start(
    groups: DataFrame,
    valid: Column | DataFrame,
    cap: int | None,
    valid_key: str | None = None,
    overlap: bool = False,
) -> _DupProbe:
    """Begin the ``DupInfo`` probe for a groups relation — memoized per
    session on the canonicalized plan while the groups relation stays
    cached, so a warm service re-invoking the same dedup pays ZERO jobs
    here.

    The probe is two driver actions: ONE aggregation job for the
    scalars (dup count / member total / mean text octets — this is the
    invocation's first action referencing ``groups`` from a single
    subtree, so it also performs the lazy ``shared()`` cache fill), and,
    when the measured dup set fits plan literals, a second collect for
    the literal dup structure. With ``overlap=True`` (guide §2.6) that
    second collect is submitted on a driver-side thread so it runs
    CONCURRENTLY with whatever construction jobs the caller launches
    next (candidate bucketing/count on the LSH path) — by the time the
    thread starts, the aggregation has already filled the groups cache,
    so both the thread and the caller's jobs read the InMemoryRelation
    and the ``shared()`` fill race (first action referencing the
    relation from multiple subtrees) cannot occur. The session memo is
    read here and written only inside ``resolve()`` — both on the
    CALLING thread — so the memo needs no lock; the background thread
    performs exactly one cached-relation collect and touches no shared
    state.

    ``valid``: which gids may emit intra pairs — as a boolean COLUMN
    over the groups row (the callers' validity is always a row-local
    predicate on the representative text, so the literal path resolves
    it in the same collect), or as a gid DataFrame (legacy form, pays a
    second membership collect).

    ``valid_key``: stable memo-key component for a Column ``valid`` —
    required for warm-path memo HITS because a Column's repr embeds
    fresh lambda-variable ids per construction (``_word_count``'s
    higher-order filter), so ``str(valid)`` never repeats. The caller
    must choose a key that uniquely determines the predicate (e.g.
    ``f"wc>={shingle_len}"``); as everywhere in this memo, validity
    still rests on the stored CacheManager entry equaling the groups
    relation's current entry, so a key can never bleed across corpora."""
    memo = _DUP_MEMO.setdefault(groups.sparkSession, {})
    gk = _plan_key(groups)
    if isinstance(valid, Column):
        vk = valid_key if valid_key is not None else str(valid)
    else:
        vk = _plan_key(valid)
    key = (gk, vk, cap) if gk is not None and vk is not None else None
    entry = _cache_entry(groups) if key is not None else None
    if key is not None and entry is not None:
        hit = memo.get(key)
        if hit is not None:
            stored_entry, info = hit
            try:
                if stored_entry.equals(entry):
                    return _DupProbe(
                        info.n_dup,
                        info.dup_members,
                        info.mean_octets,
                        lambda: info,
                    )
            except Exception:  # noqa: BLE001 — stale JVM ref: recompute
                pass
    n_dup, dup_members, mean_octets = groups.agg(
        F.count(F.when(F.size("_ids") > 1, 1)),
        F.coalesce(
            F.sum(F.when(F.size("_ids") > 1, F.size("_ids"))), F.lit(0)
        ),
        F.avg(F.octet_length("text")),
    ).first()
    want_literal = 0 < dup_members <= _DUP_LITERAL_LIMIT
    thread = None
    box: dict = {}
    if want_literal and overlap:

        def _run() -> None:
            try:
                box["literal"] = _collect_literal_dups(groups, valid, cap)
            except BaseException as e:  # noqa: BLE001 — re-raised at resolve
                box["err"] = e

        thread = Thread(target=_run, name="dup-literal-collect", daemon=True)
        thread.start()

    def resolve() -> DupInfo:
        if thread is not None:
            thread.join()
            if "err" in box:
                raise box["err"]
            literal = box["literal"]
        elif want_literal:
            literal = _collect_literal_dups(groups, valid, cap)
        else:
            literal = None
        out = DupInfo(n_dup, dup_members, literal, float(mean_octets or 0.0))
        if key is not None and entry is not None:
            memo[key] = (entry, out)
        return out

    return _DupProbe(n_dup, dup_members, float(mean_octets or 0.0), resolve)


def _dup_info(
    groups: DataFrame,
    valid: Column | DataFrame,
    cap: int | None,
    valid_key: str | None = None,
) -> DupInfo:
    """Sequential ``_dup_info_start`` + ``resolve()`` — the form for
    callers with no construction work to overlap the literal collect
    with."""
    return _dup_info_start(
        groups, valid, cap, valid_key=valid_key
    ).resolve()


def _collect_literal_dups(
    groups: DataFrame, valid: Column | DataFrame, cap: int | None
) -> dict | None:
    """Collect the (small, caller-gated) dup groups to the driver and
    precompute both expansion halves: the gid -> capped member list map
    for the cross expansion, and the intra pair list under the SAME cap
    policy as ``_capped_pairs`` (all pairs within the cap, star+chain
    above it; ``cap=None`` exhaustive). Returns None if the intra pair
    count would exceed the literal budget (e.g. cap=None over a large
    group — quadratic output belongs on executors).

    With a Column ``valid`` the gid validity resolves inside the SAME
    collect (one job); the DataFrame form keeps the r14 two-collect
    shape."""
    if isinstance(valid, Column):
        rows = (
            groups.filter(F.size("_ids") > 1)
            .select("gid", "_ids", valid.alias("_v"))
            .collect()
        )
        members = {r["gid"]: list(r["_ids"]) for r in rows}
        valid_set = {r["gid"] for r in rows if r["_v"]}
    else:
        rows = (
            groups.filter(F.size("_ids") > 1).select("gid", "_ids").collect()
        )
        members = {r["gid"]: list(r["_ids"]) for r in rows}
        valid_set = {
            r["gid"]
            for r in valid.filter(
                F.col("gid").isin(list(members))
            ).collect()
        }
    intra: list[tuple] = []
    for g, ids in members.items():
        if g not in valid_set:
            continue
        if cap is None or len(ids) <= cap:
            intra.extend(
                (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
            )
        else:  # star + chain, exactly as _star_chain_expr emits
            root = ids[0]
            for i in range(1, len(ids)):
                intra.append((root, ids[i]))
                if i >= 2 and ids[i - 1] != root:
                    intra.append((ids[i - 1], ids[i]))
        if len(intra) > _DUP_LITERAL_PAIR_LIMIT:
            return None
    cross = {
        g: (ids if cap is None else ids[:cap]) for g, ids in members.items()
    }
    return {"cross": cross, "intra": intra}


def _expand_rep_pairs_literal(
    rep_pairs: DataFrame, literal: dict, val_col: str, intra_value
) -> DataFrame:
    """The warm-service expansion: the dup structure rides the PLAN as
    literals — cross pairs via a literal gid -> members map (coalesce to
    the rep's own id for singletons) + explode, intra pairs as a local
    relation — so re-executing the plan runs no extra jobs and builds
    no broadcasts (the r8 broadcast-hinted joins still re-collected
    three broadcast exchanges per action). element_at on a literal map
    is a linear scan per row, fine because rep_pairs is the verified
    rep-level pair relation (small by construction) and the map is
    caller-gated to <= _DUP_LITERAL_LIMIT entries."""
    from pyspark.sql.types import StructField, StructType

    spark = rep_pairs.sparkSession
    id_t = rep_pairs.schema["id1"].dataType
    val_t = rep_pairs.schema[val_col].dataType
    cross = literal["cross"]
    keys = sorted(cross)
    m_map = F.map_from_arrays(
        F.array(*[F.lit(g).cast(id_t) for g in keys]),
        F.array(
            *[
                F.array(*[F.lit(m).cast(id_t) for m in cross[g]])
                for g in keys
            ]
        ),
    )

    def expand(side: str):
        return F.explode(
            F.coalesce(
                F.element_at(m_map, F.col(side)), F.array(F.col(side))
            )
        )

    out = (
        rep_pairs.select("id2", expand("id1").alias("a"), F.col(val_col))
        .select("a", expand("id2").alias("b"), F.col(val_col))
        .select(
            F.least("a", "b").alias("id1"),
            F.greatest("a", "b").alias("id2"),
            val_col,
        )
    )
    pairs = literal["intra"]
    if len(pairs) <= 256:
        # tiny intra sets ride the plan as one literal struct array over
        # a 1-row range — createDataFrame costs ~0.1s of Arrow/py4j
        # per call, real money on the warm path this mode exists for
        if not pairs:
            return out
        structs = F.array(
            *[
                F.struct(
                    F.lit(a).cast(id_t).alias("id1"),
                    F.lit(b).cast(id_t).alias("id2"),
                    F.lit(intra_value).cast(val_t).alias(val_col),
                )
                for a, b in pairs
            ]
        )
        intra = spark.range(1).select(F.explode(structs).alias("_p")).select(
            "_p.id1", "_p.id2", f"_p.{val_col}"
        )
        return out.unionByName(intra)
    schema = StructType(
        [
            StructField("id1", id_t),
            StructField("id2", id_t),
            StructField(val_col, val_t),
        ]
    )
    from local_pubchem_db_spark.operators.util import driver_rows_df

    intra = driver_rows_df(
        spark, [(a, b, intra_value) for a, b in pairs], schema
    )
    return out.unionByName(intra)


def _expand_collapsed(
    groups: DataFrame,
    rep_pairs: DataFrame,
    val_col: str,
    intra_column: Column,
    intra_value,
    valid_gids: DataFrame | None = None,
    cap: int | None = None,
    *,
    valid_pred: Column | None = None,
    valid_key: str | None = None,
    info: DupInfo | None = None,
) -> DataFrame:
    """Route the member expansion through the cheapest shape the dup
    set admits: identity (no dups), plan literals (small — job-free on
    warm re-invocation), broadcast joins (medium), shuffle joins
    (flood). All four pinned output-identical in
    tests/test_lsh_bucket_cap.py.

    Validity comes as ``valid_pred`` (a boolean column over the groups
    row — the fast one-collect literal path) or the legacy
    ``valid_gids`` gid DataFrame; exactly one must be given. ``info``:
    a ``DupInfo`` the caller already probed for the same
    (groups, validity, cap) — skips the memo lookup's plan-key round
    trip (the probe itself is memoized either way)."""
    if (valid_pred is None) == (valid_gids is None):
        raise ValueError("pass exactly one of valid_pred / valid_gids")
    valid = valid_pred if valid_pred is not None else valid_gids
    if info is None:
        info = _dup_info(groups, valid, cap, valid_key=valid_key)
    if info.n_dup == 0:
        return rep_pairs
    if info.literal is not None:
        return _expand_rep_pairs_literal(
            rep_pairs, info.literal, val_col, intra_value
        )
    if valid_gids is None:
        valid_gids = groups.filter(valid_pred).select("gid")
    return _expand_rep_pairs(
        groups,
        rep_pairs,
        val_col=val_col,
        intra_val=intra_column,
        valid_gids=valid_gids,
        cap=cap,
        broadcast_dups=info.dup_members <= _DUP_BROADCAST_LIMIT,
    )


def _expand_rep_pairs(
    groups: DataFrame,
    rep_pairs: DataFrame,
    val_col: str,
    intra_val: Column,
    valid_gids: DataFrame,
    cap: int | None,
    broadcast_dups: bool = False,
) -> DataFrame:
    """Member-level (id1 < id2, val) pairs from representative-level
    pairs over ``_exact_groups``: cross-group pairs inherit the rep
    pair's value (identical text = identical features), intra-group
    pairs get ``intra_val`` (the self-similarity of identical content),
    gated on ``valid_gids`` (groups whose rep produced features at all).
    ``cap`` bounds both expansions the way ``bounded_bucket_pairs``
    bounds buckets: an exact group above it contributes star+chain intra
    edges and a capped cross-membership — connectivity (so component
    resolution) preserved, output volume bounded.

    Join shape: only DUP groups (size > 1) enter the expansion joins —
    singleton groups expand to themselves, so a LEFT join + coalesce to
    the rep's own id covers them without shipping the (corpus-sized)
    full group relation through two joins. On typical corpora the dup
    relation is a sliver of the groups; on a replica flood it is the
    whole corpus and the joins shuffle exactly what they must.
    ``broadcast_dups`` (caller gates it on the measured dup-member count)
    hints every dup-side join relation as a broadcast, turning the whole
    expansion map-only — the warm-service shape, where re-running AQE
    exchange stages per invocation was the r7 bench regression."""
    members = groups.filter(F.size("_ids") > 1).select(
        "gid",
        (F.col("_ids") if cap is None else F.slice("_ids", 1, cap)).alias(
            "_m"
        ),
    )
    bcast = F.broadcast if broadcast_dups else (lambda d: d)
    cross = (
        rep_pairs.join(
            bcast(
                members.select(
                    F.col("gid").alias("id1"), F.col("_m").alias("_m1")
                )
            ),
            "id1",
            "left",
        )
        .join(
            bcast(
                members.select(
                    F.col("gid").alias("id2"), F.col("_m").alias("_m2")
                )
            ),
            "id2",
            "left",
        )
        .select(
            "id2",
            F.explode(F.coalesce("_m1", F.array("id1"))).alias("a"),
            "_m2",
            val_col,
        )
        .select(
            "a",
            F.explode(F.coalesce("_m2", F.array("id2"))).alias("b"),
            val_col,
        )
        .select(
            F.least("a", "b").alias("id1"),
            F.greatest("a", "b").alias("id2"),
            val_col,
        )
    )
    dups = groups.filter(F.size("_ids") > 1)
    if broadcast_dups:
        # same relation as the semi join below, but with the SMALL side
        # broadcast (Spark cannot broadcast the left of a left_semi):
        # valid_gids has one row per gid, so the inner join is exactly
        # "dups whose gid is valid"
        dup_groups = valid_gids.join(F.broadcast(dups), "gid")
    else:
        dup_groups = dups.join(valid_gids, "gid", "left_semi")
    # same cap policy (and memory-safe exhaustive hybrid) as the bucket
    # expansion, via the one shared helper
    intra = _capped_pairs(dup_groups, ["gid"], cap).select(
        "id1", "id2", intra_val.alias(val_col)
    )
    return cross.unionByName(intra)


def _minhash_buckets(shingled: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(id, band, bucket) rows: signature + banding in one map-side
    vectorized UDF (no shuffle, no codegen compile); posexplode yields
    the band/bucket pairs. Candidate generation downstream is the only
    shuffle: an equi-join on (band, bucket)."""
    return shingled.select(
        "id",
        F.posexplode(
            minhash_band_udf(num_perm, bands)(F.col("shingles"))
        ).alias("band", "bucket"),
    )


def lsh_bucket_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    num_perm: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Materializable LSH index of a corpus: (id, band, bucket) rows.

    Persist this once for the historical corpus; incremental batches then
    dedup against it WITHOUT rescanning history (see
    ``incremental_minhash_new_ids``). At 100 TB the index is bands× the
    corpus row count but tiny per row — and writing it bucketed/partitioned
    by (band, bucket) makes the incremental join shuffle-free on the
    history side.

    r15 (VERDICT r14 What's-missing #1): the corpus crosses into Python
    ONCE through the fused ``minhash_band_text_udf`` — the index-build
    path IS the 100 TB ingest shape, and it previously paid the
    two-crossing shingle→band pipeline plus a persisted corpus-sized
    shingle relation. Bucket rows are bit-identical to the two-stage
    plan (the fused UDF's equality pin covers band values; short docs
    drop the same way), so PERSISTED INDEXES REMAIN VALID — no rebuild
    on upgrade.
    """
    rel = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return _fused_band_buckets(rel, shingle_len, num_perm, bands)


def incremental_minhash_new_ids(
    batch: DataFrame,
    history_index: DataFrame | list[DataFrame],
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_len: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    max_bucket_size: int | None = None,
    quality_col: str | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Ids in ``batch`` that are near-dups of NOTHING in the history index
    nor of an earlier (lower-id) batch row — the rows safe to append.

    ``collapse_exact`` (default on): identical batch texts collapse to
    one representative before shingling — the flood-batch defense
    (everyone re-sending the same document is THE incremental-dedup
    stress shape). The keep-set is unchanged: identical texts share
    identical signatures, so a history hit on the representative means
    every member would have hit (all expand to dropped), and the
    member-level pair relation expands from rep pairs exactly as in
    ``minhash_lsh_dedup_pairs`` (pinned equal in tests), so the
    batch-internal survivor — lowest id or best ``quality_col`` — is
    elected over the same components either way.

    ``quality_col`` changes only the BATCH-INTERNAL survivor: instead of
    the lowest id, each verified near-dup component keeps its
    highest-``quality_col`` member (ties → lowest id; the
    ``dedup_keep_ids`` contract). History collisions stay drop-only
    regardless — history text is not at hand to compare quality against,
    and re-ranking against an already-persisted corpus would mean
    rewriting accepted rows. Both modes share one deliberate transitive
    conservatism: when a component's elected survivor ALSO collides
    with history, the whole component is dropped — the survivor's
    near-dups are near-dups of (probable) history content too, so
    admitting a losing member would re-introduce what the history hit
    just excluded. A false-positive bucket collision therefore
    over-drops, never under-drops.

    Laziness: with ``quality_col`` set this function is EAGER (the
    component resolution inside ``dedup_keep_ids`` runs Spark jobs at
    call time; the verified-pairs relation is persisted so the
    candidate/verify subtree executes once). Its caller of record is
    ``stream_dedup_ingest``'s foreachBatch, which executes immediately
    anyway; batches with zero verified pairs short-circuit past the
    component machinery entirely.

    The incremental contract of a training-data pipeline: history is never
    rescanned (only its (id, band, bucket) index is joined), the batch is
    LSH-bucketed once (ONE fused text→bands Python crossing, r15), and
    candidate pairs are verified with exact Jaccard recomputed from the
    pair texts (batch-internal pairs) or accepted on bucket collision
    (batch-vs-history, since history text is not at hand — the
    conservative choice: collisions drop the row).

    ``max_bucket_size`` defaults to **None** (exhaustive batch-internal
    pairs): this function's contract is "safe to append", and the cap's
    mixed-bucket caveat (a batch member of a >cap bucket whose star and
    chain edges all fail exact-Jaccard verification is admitted even
    though a true near-dup shares the bucket) would silently weaken that
    guarantee — while batches are small by the incremental contract, so
    the cap buys little by default. Pass an int (e.g. 64) ONLY for
    flood-shaped batches where the quadratic batch-internal join is the
    binding cost (see ``bounded_bucket_pairs``); the batch-oriented
    ``minhash_lsh_dedup_pairs`` keeps the cap on by default because there
    the keep-set is provably preserved.
    """
    # lazy persist (r15): the _dup_info probe below is the first action
    # and references groups once — its execution fills the cache, so the
    # separate shared() count job is saved (see _exact_groups).
    groups = (
        _exact_groups(batch, id_col, text_col, eager=False)
        if collapse_exact
        else None
    )
    n_dup = dup_members = 0
    if collapse_exact:
        # the memoized dup-set sizing gates both expansions below: a
        # batch with no exact dups skips them entirely (rep ids ARE the
        # member ids), a small dup set rides plan literals or broadcast
        # hints — same routing as minhash_lsh_dedup_pairs
        rel = groups.select(F.col("gid").alias("id"), "text")
        valid_pred, valid_key = _shingleable(shingle_len)
        # r16: same literal-collect overlap as minhash_lsh_dedup_pairs —
        # the probe agg fills the groups cache, then the literal collect
        # runs concurrently with the bucket shared() fill / history
        # semi-joins below; resolved right before _expand_collapsed.
        probe = _dup_info_start(
            groups, valid_pred, max_bucket_size, valid_key=valid_key,
            overlap=True,
        )
        n_dup, dup_members = probe.n_dup, probe.dup_members
    else:
        rel = batch.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text")
        )
    # ONE fused Python crossing for the whole batch (r15 — the
    # incremental/streaming twin of the r14 batch-path fusion; this IS
    # the 100 TB ingest shape). shared(): the bucket relation feeds one
    # semi-join per history frame plus candidate generation, and without
    # the cut each subtree re-runs the fused UDF; bucket rows are
    # batch×bands-sized, tiny per row — nothing corpus-sized persists.
    buckets = shared(_fused_band_buckets(rel, shingle_len, num_perm, bands))
    # batch rows colliding with ANY history bucket → dropped (left_semi is
    # the minimal shuffle: no history payload moves, only matching keys).
    # ``history_index`` may be a LIST of index frames (e.g. a (band,
    # bucket)-bucketed compacted table plus a small un-folded delta):
    # semi-joining each frame separately and unioning the hit ids lets
    # every join keep its own best physical strategy — the bucketed scan
    # joins exchange-free on the history side, the small delta broadcasts
    # — where a DataFrame union would destroy the bucketing and re-shuffle
    # the full history every batch.
    history_frames = (
        history_index if isinstance(history_index, list) else [history_index]
    )
    hit_ids = [
        buckets.join(h, ["band", "bucket"], "left_semi").select("id")
        for h in history_frames
    ]
    if hit_ids:
        vs_history = hit_ids[0]
        for h in hit_ids[1:]:
            vs_history = vs_history.unionByName(h)
        vs_history = vs_history.distinct()
        if collapse_exact and n_dup:
            # a rep-level hit means every member of its exact group
            # would have hit (identical signatures -> identical
            # buckets): expand with the FULL member list, never capped.
            # With zero dup groups the join is the identity — skipped.
            dups = groups.filter(F.size("_ids") > 1).select("gid", "_ids")
            if dup_members <= _DUP_BROADCAST_LIMIT:
                dups = F.broadcast(dups)
            vs_history = (
                vs_history.withColumnRenamed("id", "gid")
                .join(dups, "gid", "left")
                .select(
                    F.explode(
                        F.coalesce("_ids", F.array("gid"))
                    ).alias("id")
                )
            )
    else:  # no history at all — type-correct empty hit set
        vs_history = batch.select(F.col(id_col).alias("id")).limit(0)
    # batch-internal near-dups: keep the lowest id of each verified pair.
    # Bucket cap: a dup-flood batch (everyone re-sending the same
    # document) must not turn one micro-batch into a quadratic pair join.
    cand = bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=max_bucket_size
    )
    # pair-text exact verify (r15): candidates join back to the batch
    # texts — no shingle relation, and no broadcast hints here (the
    # incremental contract keeps batches small; plain joins let AQE
    # pick the strategy from runtime stats)
    vpairs = _verify_jaccard_from_texts(cand, rel, shingle_len, threshold)
    if collapse_exact and n_dup:
        vpairs = _expand_collapsed(
            groups,
            vpairs,
            val_col="jaccard",
            intra_column=F.lit(1.0),
            intra_value=1.0,
            valid_pred=valid_pred,
            cap=max_bucket_size,
            info=probe.resolve(),
        )
    if quality_col is None:
        dup_in_batch = vpairs.select(F.col("id2").alias("id")).distinct()
    else:
        # persist: vpairs feeds BOTH the component resolution and the
        # paired-id universe; without the cut the candidate-pair groupBy
        # and the two verify joins execute twice. The count doubles as
        # the clean-stream short-circuit — no verified pairs means no
        # component machinery (connected_components runs several jobs
        # even on an empty edge set).
        vpairs = shared(vpairs.select("id1", "id2"))
        if vpairs.limit(1).count() == 0:
            dup_in_batch = batch.select(F.col(id_col).alias("id")).limit(0)
        else:
            kept = dedup_keep_ids(
                batch.select(F.col(id_col), F.col(quality_col)),
                vpairs,
                id_col,
                quality_col=quality_col,
            ).select(F.col(id_col).alias("id"))
            paired = (
                vpairs.select(F.col("id1").alias("id"))
                .unionByName(vpairs.select(F.col("id2").alias("id")))
                .distinct()
            )
            dup_in_batch = paired.join(kept, "id", "left_anti")
    # The id universe comes from the UNFILTERED batch: a doc too short to
    # shingle (< shingle_len tokens) produces no buckets, collides with
    # nothing, and by this module's contract must be KEPT. Deriving ids
    # from the shingled relation would silently drop it from the corpus.
    ids = batch.select(F.col(id_col).alias("id"))
    return (
        ids.join(vs_history, "id", "left_anti")
        .join(dup_in_batch, "id", "left_anti")
        .withColumnRenamed("id", id_col)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    window: int = 20,
) -> DataFrame:
    """Benchmark decontamination: drop every training document that
    shares a winnowing fingerprint with ANY evaluation document.

    The winnowing guarantee (functions/text.py:winnow_fingerprints_udf)
    makes this a span detector, not a whole-doc matcher: any verbatim
    overlap of length >= k + window - 1 characters between a training
    doc and an eval doc produces a shared fingerprint, so quoting one
    eval sentence inside an otherwise-novel document is caught — the
    case whole-document hashing and doc-level MinHash both miss.

    The defaults (k=40, window=20: flag spans >= 59 chars, sample one
    fingerprint per ~20 chars) target the token-scale overlaps real
    decontamination uses (~8-13 contiguous tokens); char-scale settings
    like k=9/window=4 flag any shared 12-char span — on ordinary prose
    that matches ubiquitous phrases and empirically nukes most of a
    corpus from a handful of eval docs. Eval docs shorter than ``k``
    chars contribute no fingerprints and match nothing.

    Scale shape: eval sets are small (thousands of docs) — their
    distinct fingerprints broadcast; the train side is one map-only
    fingerprint pass + explode, a broadcast left_semi to find
    contaminated ids, and one left_anti to drop them. The training
    corpus is never shuffled."""
    from local_pubchem_db_spark.functions.text import winnow_fingerprints_udf

    fp = winnow_fingerprints_udf(k=k, window=window)
    train_fps = fan_out(
        train.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    ).select("id", F.explode(fp(F.col("text"))).alias("fp"))
    eval_fps = (
        eval_df.select(F.explode(fp(F.col(text_col))).alias("fp")).distinct()
    )
    contaminated = (
        train_fps.join(F.broadcast(eval_fps), "fp", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    window: int = 20,
) -> DataFrame:
    """(train id, eval_id, n_shared_fps): WHICH eval document each
    contaminated training document overlaps, and how strongly — the
    audit trail ``decontaminate`` (same parameters, same winnowing
    guarantee) doesn't keep when it silently drops rows. Rank by
    ``n_shared_fps`` to separate whole-document copies (hundreds of
    shared fingerprints) from a single quoted sentence (one or two).

    The set of train ids here is EXACTLY the set ``decontaminate``
    drops (pinned in tests/test_decontaminate.py). Same scale shape:
    eval fingerprints broadcast, train side map-only + one
    grouped count over the (tiny) matched subset.
    """
    from local_pubchem_db_spark.functions.text import winnow_fingerprints_udf

    fp = winnow_fingerprints_udf(k=k, window=window)
    train_fps = fan_out(
        train.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    ).select("id", F.explode(fp(F.col("text"))).alias("fp"))
    eval_fps = (
        eval_df.select(
            F.col(eval_id_col).alias("eval_id"),
            F.explode(fp(F.col(text_col))).alias("fp"),
        )
        .distinct()
    )
    return (
        train_fps.join(F.broadcast(eval_fps), "fp")
        .groupBy(F.col("id").alias(id_col), "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


def connected_components(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into components: (id, rep) with rep = the
    component's minimum id.

    Pair emission (ngram_jaccard_pairs / minhash_lsh_dedup_pairs /
    simhash_dedup_pairs) is only half of dedup — keeping one row per
    GROUP needs the transitive closure. Iterative min-label propagation:
    every node starts labeled with itself; each round every node takes the
    minimum label among itself and its neighbors; stop when no label
    changes. Rounds needed = graph diameter, and near-dup components are
    dense (the exact-verify step emits most intra-cluster pairs), so 2-3
    rounds close typical corpora.

    Scale shape: each round is one shuffle (edges ⋈ labels on the
    neighbor side, then a min groupBy on the node side). Labels are
    ``localCheckpoint``-ed every round — iterative DataFrame algorithms
    MUST sever lineage per iteration or logical-plan depth (and Catalyst
    re-analysis time) grows exponentially with the round count; the
    checkpoint also gives each round exactly one materialization, no
    sibling-recompute race. ``max_iter`` bounds adversarial chains (a
    path graph of diameter > max_iter raises rather than returning
    silently-wrong components).
    """
    edges = shared(
        pairs.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
        .union(pairs.select(F.col(id2).alias("src"), F.col(id1).alias("dst")))
        .distinct()
    )
    try:
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("rep", F.col("id"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("rep").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                .select(
                    "id",
                    F.least(F.col("rep"), F.coalesce(F.col("nmin"), F.col("rep"))).alias("rep"),
                    (F.col("nmin") < F.col("rep")).alias("changed"),
                )
                .localCheckpoint()  # eager: severs lineage, one pass
            )
            n_changed = new_labels.filter(F.col("changed")).count()
            labels = new_labels.drop("changed")
            if n_changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter)"
        )
    finally:
        edges.unpersist()


def dedup_keep_ids(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id1: str = "id1",
    id2: str = "id2",
    quality_col: str | None = None,
) -> DataFrame:
    """Rows of ``df`` to KEEP after near-dup clustering: one survivor
    per component of ``pairs``; rows in no pair survive untouched.

    ``quality_col=None`` keeps the minimum id (stable, metadata-free).
    With ``quality_col`` set, the survivor is the component member with
    the HIGHEST value of that column (ties → minimum id) — "keep the
    best copy, not the first copy": near-dup clusters in crawled corpora
    typically mix a clean original with mangled mirrors, and the id
    order says nothing about which is which. Pair it with any per-doc
    signal (``unigram_logprob_scores``, ``text_quality_signals``).

    Cost: the component relation is sized by paired ids only (tiny
    relative to df). Quality mode adds one join of that relation to
    df's (id, quality) projection plus one component-keyed window —
    both shuffles scale with the number of PAIRED docs, not the corpus.
    """
    comps = connected_components(pairs, id1, id2)
    if quality_col is None:
        drop = comps.filter(F.col("id") != F.col("rep")).select(
            F.col("id").alias(id_col)
        )
        return df.join(drop, id_col, "left_anti")
    scored = comps.join(
        df.select(F.col(id_col).alias("id"), F.col(quality_col).alias("__q")),
        "id",
    )
    w = (
        Window.partitionBy("rep")
        .orderBy(F.col("__q").desc_nulls_last(), F.col("id").asc())
    )
    drop = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") != 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """SimHash near-dup candidates: pairs with Hamming distance <=
    ``max_hamming`` between 64-bit SimHashes.

    Blocked on 16-bit SimHash quarters (pigeonhole: distance <= 3 over 4
    blocks guarantees >=1 identical block), so no cross join. Output is the
    SimHash criterion itself (no SQL oracle — the xxhash64-based fingerprint
    is not expressible in ANSI SQL; the driver records a rows-only check).

    ``max_bucket_size`` defaults to None (exhaustive): 16-bit blocks are
    COARSE by pigeonhole design — at ~10M docs every block holds ~150
    mostly-dissimilar members, so "oversized bucket == duplicate
    cluster", the premise that makes the star+chain cap sound for the
    64-bit MinHash buckets, does not hold here and a default cap would
    silently break the documented exhaustive-pairs contract. Pass a cap
    only for flood-shaped corpora where the pair output feeds component
    resolution rather than being consumed as the complete pair set.

    ``collapse_exact`` (default on): identical texts collapse to one
    representative before hashing and blocking, then rep-level pairs
    expand back to members (cross pairs inherit the rep hamming —
    identical text means identical SimHash; intra pairs are hamming 0;
    token-less groups emit nothing, matching the null-SimHash filter).
    This matters even MORE here than for MinHash: the cap is off by
    design, so without the collapse a 30-way exact flood pays the full
    C(30,2) pair join in all four quarter blocks. Note ``cap=None``
    means the member expansions are exhaustive too.
    """
    if collapse_exact:
        # lazy persist (r15): the recursive call's shared() SimHash
        # relation is the first action referencing groups (single
        # subtree) — its eager count fills the cache.
        groups = _exact_groups(df, id_col, text_col, eager=False)
        rep_pairs = simhash_dedup_pairs(
            groups.select(F.col("gid").alias("id"), "text"),
            "id",
            "text",
            max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
            collapse_exact=False,
        )
        # same warm-path routing as minhash_lsh_dedup_pairs:
        # identity / literal / broadcast / shuffle by dup-set size.
        # valid gids: reps with >=1 token — exactly the SimHash non-null
        # condition (hashing.simhash_udf: "null/empty token arrays hash
        # to NULL"), without re-running the hash UDF
        return _expand_collapsed(
            groups,
            rep_pairs,
            val_col="hamming",
            intra_column=F.lit(0).cast("int"),
            intra_value=0,
            valid_pred=F.size(tokens(F.col("text"))) > 0,
            valid_key="ntokens>0",
            cap=max_bucket_size,
        )
    # SimHash as one vectorized map (see hashing.simhash_udf); shared():
    # the blocked self-join references the SimHash relation twice.
    base = shared(
        fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")))
        .select("id", tokens(F.col("text")).alias("toks"))
        .select("id", simhash_udf()(F.col("toks")).alias("sh"))
        .filter(F.col("sh").isNotNull())
    )
    blocks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("sh"), q * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("blk"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", F.col("b.q").alias("q"), F.col("b.blk").alias("blk"))
    cand = bounded_bucket_pairs(blocks, ["q", "blk"], max_bucket_size=max_bucket_size)
    a = base.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    b = base.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .select("id1", "id2", hamming64(F.col("sh1"), F.col("sh2")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def _window_hashes(df: DataFrame, id_col: str, text_col: str, span_tokens: int) -> DataFrame:
    """(id, pos, whash) for every ``span_tokens``-token window of every
    document — all codegen (split / sequence / slice / xxhash64), no
    Python in the hot path. Documents shorter than the span emit no
    windows."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= span_tokens)
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {span_tokens}),"
                    f" i -> xxhash64(concat_ws(' ', slice(toks, i + 1, {span_tokens}))))"
                )
            ).alias("pos", "whash"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 50,
    min_occurrences: int = 2,
) -> DataFrame:
    """Substring-level exact dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL 2022): every ``span_tokens``-
    token window occurring ``min_occurrences``+ times across the corpus
    is removed from every document EXCEPT its canonical (lowest
    (id, pos)) occurrence — boilerplate, licenses, and quoted chunks
    vanish corpus-wide while one copy survives. Doc-level MinHash misses
    these entirely (two documents sharing one paragraph are not
    near-dups; the paragraph is still memorized verbatim at training).

    Returns the input columns with ``text_col`` rewritten (duplicated
    spans cut, surviving tokens re-joined with single spaces — token-
    stream semantics, whitespace is not preserved) plus
    ``n_removed_tokens``. Overlapping duplicated windows merge into one
    cut interval, so adjacent shared windows do not over-remove.

    Scale shape: the window explode is the inherent cost (one row per
    token of corpus — the same order as any tokenization pass) and is
    entirely JVM codegen; duplicated-hash detection is one groupBy with
    a count>=N filter plus a min-struct for the canonical owner (map-side
    combinable); span removal joins each doc's flagged positions back
    and rewrites text in one Arrow pass. Nothing is driver-side,
    nothing quadratic: cost ~ 2 shuffles of (hash) and (id) keyed rows.

    Determinism: the canonical occurrence is the MINIMUM (id, pos) —
    a pure function of the data, so reruns and external oracles agree
    exactly (tests/test_span_dedup.py pins a pure-Python oracle)."""
    if span_tokens < 1:
        raise ValueError("span_tokens must be positive")
    windows = shared(_window_hashes(df, id_col, text_col, span_tokens))
    # hash -> (count, canonical owner): one map-side-combinable groupBy
    dup = windows.groupBy("whash").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("id", "pos")).alias("canon"),
    ).filter(F.col("n") >= min_occurrences)
    # every non-canonical occurrence of a duplicated window
    cut = (
        windows.join(dup, "whash")
        .filter(
            (F.col("id") != F.col("canon.id"))
            | (F.col("pos") != F.col("canon.pos"))
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("pos")).alias("cut_starts"))
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def rewrite(text: pd.Series, starts: pd.Series) -> pd.Series:
        out = []
        for t, ss in zip(text, starts):
            toks = t.strip().split()
            if ss is None or not len(ss):
                out.append(" ".join(toks))
                continue
            # overlapping [s, s+span) intervals merge via the keep mask
            keep = [True] * len(toks)
            for s in ss:
                for i in range(int(s), min(int(s) + span_tokens, len(toks))):
                    keep[i] = False
            out.append(" ".join(tk for tk, k in zip(toks, keep) if k))
        return pd.Series(out)

    joined = df.join(cut.withColumnRenamed("id", id_col), id_col, "left")

    def n_toks(c):  # empty string splits to [""] — count it as 0 tokens
        return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
            F.size(F.split(F.trim(c), r"\s+"))
        )

    res = joined.withColumn(
        "__new_text", rewrite(F.col(text_col), F.col("cut_starts"))
    )
    return res.select(
        *[c for c in df.columns if c != text_col],
        F.col("__new_text").alias(text_col),
        (n_toks(F.col(text_col)) - n_toks(F.col("__new_text")))
        .cast("int")
        .alias("n_removed_tokens"),
    )
