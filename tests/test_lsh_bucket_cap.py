"""LSH bucket-cap tests: oversized (band, bucket) groups must emit a
bounded connectivity subgraph, not C(n,2) pairs.

The failure shape: a duplicate-heavy corpus puts a 1000-way cluster into
ONE bucket per band, and the uncapped self-join emits ~500k candidate
pairs per band (measured ~45x candidate load on a 10x dup-heavy corpus).
Dedup only needs each true cluster to stay connected through component
resolution — these tests pin both the bound and the connectivity.
"""

from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from local_pubchem_db_spark.operators.dedup import (
    bounded_bucket_pairs,
    dedup_keep_ids,
    minhash_lsh_dedup_pairs,
)


def _components(pairs):
    """Driver-side union-find over a (small) collected pair list."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["id1"]), find(r["id2"])
        if a != b:
            parent[a] = b
    return {x: find(x) for x in parent}


def test_bounded_bucket_pairs_caps_oversized_bucket(spark):
    # One 1000-member bucket (oversized) + one 5-member bucket (small).
    rows = [(i, 0, 7) for i in range(1000)] + [(1000 + i, 1, 9) for i in range(5)]
    buckets = spark.createDataFrame(rows, "id long, band int, bucket long")
    pairs = bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=64
    ).collect()

    # Star (n-1) + chain (n-2) for the big bucket, all C(5,2) for the
    # small one — nowhere near the uncapped C(1000,2) = 499500.
    big = [r for r in pairs if r["id1"] < 1000]
    small = [r for r in pairs if r["id1"] >= 1000]
    assert len(big) == 999 + 998
    assert len(small) == 10
    assert all(r["id1"] < r["id2"] for r in pairs)

    # Connectivity: every big-bucket id resolves into ONE component.
    comp = _components(big)
    assert len({comp[i] for i in range(1000)}) == 1


def test_bounded_bucket_pairs_exact_within_cap(spark):
    # Within the cap the output is exactly the all-pairs candidate set.
    rows = [(i, b, 3) for b in range(2) for i in range(10)]
    buckets = spark.createDataFrame(rows, "id long, band int, bucket long")
    capped = bounded_bucket_pairs(buckets, ["band", "bucket"], max_bucket_size=64)
    uncapped = bounded_bucket_pairs(buckets, ["band", "bucket"], max_bucket_size=None)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))
    assert capped.count() == 45  # C(10,2), both bands' pairs dedup to one set


def test_minhash_thousand_way_cluster_keeps_one(spark):
    # 1000 identical documents + 3 distinct ones: the capped LSH path must
    # still resolve the flood to a single representative, and candidate
    # volume must stay linear in the cluster size.
    dup_text = (
        "spark structured streaming maintains state across micro batches "
        "with watermarks bounding how late data may arrive for each window"
    )
    distinct = [
        "completely different first document about parquet row groups",
        "another unrelated text concerning broadcast hash joins in planners",
        "a third standalone note on adaptive query execution partitions",
    ]
    rows = [(i, dup_text) for i in range(1000)] + [
        (1000 + i, t) for i, t in enumerate(distinct)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_lsh_dedup_pairs(df, "doc_id", "text", threshold=0.8)
    n_pairs = pairs.count()
    # All emitted pairs are exact duplicates (jaccard 1.0) of the flood;
    # the cap bounds them to O(n) instead of C(1000,2) = 499500.
    assert n_pairs < 5000
    kept = dedup_keep_ids(df, pairs, "doc_id")
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids == {0, 1000, 1001, 1002}
    spark.catalog.clearCache()


def test_srp_flood_bounded_and_coarse_regime_uncapped(spark):
    import numpy as np

    from local_pubchem_db_spark.operators.similarity import srp_lsh_neardup_pairs

    # A 300-vector flood of one embedding (+noise-free) lands in one
    # bucket per band at the default r=8: the auto cap bounds candidates.
    rng = np.random.default_rng(3)
    v = rng.standard_normal(16)
    rows = [(i, (v).tolist()) for i in range(300)] + [
        (300 + i, rng.standard_normal(16).tolist()) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = srp_lsh_neardup_pairs(emb, threshold=0.95)
    got = [(r["id1"], r["id2"]) for r in pairs.collect()]
    assert 0 < len(got) < 2000  # uncapped would emit C(300,2) = 44850
    comp = _components([{"id1": a, "id2": b} for a, b in got])
    assert len({comp[i] for i in range(300)}) == 1
    spark.catalog.clearCache()


def test_bounded_bucket_pairs_plan_shape(spark):
    # Candidate generation must be join-free: one hash-partition exchange
    # for the groupBy(collect_list) and one for the final distinct — the
    # self-join formulation shuffled the bucket relation twice AND planned
    # a quadratic per-bucket join we could not intervene in.
    buckets = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("band"),
        (F.col("id") % 11).alias("bucket"),
    )
    df = bounded_bucket_pairs(buckets, ["band", "bucket"])
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = qe.explainString(mode)
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_collapse_exact_pairs_identical_to_direct(spark, sf_dir):
    """Exact-duplicate pre-collapse must emit the IDENTICAL pair
    relation (ids and jaccard values) as the direct path on a corpus
    with planted exact replicas — the heavy tiers just run on uniques."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(60)
    )
    # 3-way exact replicas with distinct ids, like the scale replicas
    corpus = docs
    for rep in (1, 2):
        corpus = corpus.unionByName(
            docs.select(
                (F.col("doc_id") + 100000 * rep).alias("doc_id"), "text"
            )
        )

    def rows(collapse):
        return sorted(
            (r["id1"], r["id2"], round(r["jaccard"], 12))
            for r in minhash_lsh_dedup_pairs(
                corpus, "doc_id", "text", threshold=0.8,
                collapse_exact=collapse,
            ).collect()
        )

    direct = rows(False)
    collapsed = rows(True)
    assert collapsed == direct
    assert len(direct) >= 3 * len(
        docs.collect()
    ), "replicas must produce intra-cluster pairs"


def test_collapse_exact_short_text_groups_emit_no_pairs(spark):
    """Identical too-short-to-shingle texts: brute force excludes them
    (null jaccard), so the collapsed intra expansion must too."""
    from local_pubchem_db_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
    )

    long_text = " ".join(f"tok{i} alpha beta" for i in range(40))
    corpus = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"), (3, "tiny"), (10, long_text),
         (11, long_text)],
        "doc_id long, text string",
    )
    got = sorted(
        (r["id1"], r["id2"], r["jaccard"])
        for r in minhash_lsh_dedup_pairs(
            corpus, "doc_id", "text", threshold=0.8
        ).collect()
    )
    assert got == [(10, 11, 1.0)]


def test_simhash_collapse_exact_identical_to_direct(spark, sf_dir):
    """SimHash pre-collapse must emit the identical (id1, id2, hamming)
    relation on a replica corpus — and matters MORE here because the
    coarse quarter blocks keep the cap off by design."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.dedup import simhash_dedup_pairs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(40)
    )
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )

    def rows(collapse):
        return sorted(
            (r["id1"], r["id2"], r["hamming"])
            for r in simhash_dedup_pairs(
                corpus, "doc_id", "text", max_hamming=3,
                collapse_exact=collapse,
            ).collect()
        )

    direct = rows(False)
    collapsed = rows(True)
    assert collapsed == direct
    # the replicas guarantee hamming-0 intra pairs exist
    assert any(h == 0 for _, _, h in direct)


def test_exhaustive_pairs_hybrid_matches_array_path(spark):
    """cap=None exhaustive expansion must produce the identical pair set
    whether a group goes through the in-row array expression or the
    streamed self-join (groups above array_expand_limit) — the hybrid
    that turns the flood OOM into ordinary shuffle traffic."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.dedup import (
        _exhaustive_pairs,
        bounded_bucket_pairs,
    )

    # bucket A: 10 members (array path), bucket B: 50 members — above a
    # test limit of 16, so it must take the join path
    rows = [(0, i) for i in range(10)] + [(1, 100 + i) for i in range(50)]
    buckets = spark.createDataFrame(rows, "blk int, id long")
    grouped = buckets.groupBy("blk").agg(
        F.sort_array(F.collect_list("id")).alias("_ids")
    )
    hybrid = sorted(
        (r["id1"], r["id2"])
        for r in _exhaustive_pairs(
            grouped, ["blk"], array_expand_limit=16
        ).collect()
    )
    expected = sorted(
        [(i, j) for i in range(10) for j in range(i + 1, 10)]
        + [
            (100 + i, 100 + j)
            for i in range(50)
            for j in range(i + 1, 50)
        ]
    )
    assert hybrid == expected
    # and the public cap=None surface agrees with the capped=off contract
    got = sorted(
        (r["id1"], r["id2"])
        for r in bounded_bucket_pairs(
            buckets, ["blk"], max_bucket_size=None
        ).collect()
    )
    assert got == expected


def test_collapse_equivalence_on_adversarial_corpus(spark):
    """Direct vs collapsed must agree on the nasty shapes: NULL texts,
    empty strings, whitespace-only, mixed dup multiplicities, and
    near-dup (not exact) clusters — for BOTH pair operators."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
        simhash_dedup_pairs,
    )

    long_a = " ".join(f"alpha{i} beta gamma delta" for i in range(40))
    long_b = long_a + " extra token tail"  # near-dup of long_a
    rows = (
        [(i, None) for i in (1, 2, 3)]
        + [(i, "") for i in (10, 11)]
        + [(i, "   \t ") for i in (20, 21)]
        + [(100 + i, long_a) for i in range(4)]
        + [(200 + i, long_b) for i in range(2)]
        + [(i, "tiny") for i in (300, 301, 302)]
        + [(400, " ".join(f"unique{i} zeta eta" for i in range(40)))]
    )
    corpus = spark.createDataFrame(rows, "doc_id long, text string")

    mh = lambda c: sorted(
        (r["id1"], r["id2"], round(r["jaccard"], 12))
        for r in minhash_lsh_dedup_pairs(
            corpus, "doc_id", "text", threshold=0.8, collapse_exact=c
        ).collect()
    )
    sh = lambda c: sorted(
        (r["id1"], r["id2"], r["hamming"])
        for r in simhash_dedup_pairs(
            corpus, "doc_id", "text", max_hamming=3, collapse_exact=c
        ).collect()
    )
    mh_direct, mh_collapsed = mh(False), mh(True)
    assert mh_collapsed == mh_direct
    # the exact long_a cluster and the near-dup cross pairs must appear
    assert (100, 101, 1.0) in mh_direct
    assert any(i1 // 100 == 1 and i2 // 100 == 2 for i1, i2, _ in mh_direct)
    sh_direct, sh_collapsed = sh(False), sh(True)
    assert sh_collapsed == sh_direct
    assert (100, 101, 0) in sh_direct
    # MinHash: null/empty/whitespace/tiny docs shingle to nothing and
    # never pair
    bad_mh = {1, 2, 3, 10, 11, 20, 21, 300, 301, 302}
    assert all(
        i1 not in bad_mh and i2 not in bad_mh for i1, i2, _ in mh_direct
    )
    # SimHash: only NULL docs hash to NULL; ''/whitespace get a phantom
    # empty token (tokenizer semantics, preserved exactly) and tiny docs
    # hash their one token — so those DO pair, identically in both paths
    nulls = {1, 2, 3}
    assert all(
        i1 not in nulls and i2 not in nulls for i1, i2, _ in sh_direct
    )
    assert (10, 11, 0) in sh_direct and (300, 301, 0) in sh_direct


def test_collapse_fast_paths_match_shuffle_path(spark, monkeypatch):
    """The r8 expansion routing must be plan-shape-only: a corpus with
    NO exact dups short-circuits the expansion; with dups, the literal,
    broadcast, and shuffle shapes (forced by shutting each gate) all
    equal the direct path."""
    from local_pubchem_db_spark.operators import dedup as D
    from local_pubchem_db_spark.operators.util import (
        release_shared_caches,
    )

    long_a = " ".join(f"alpha{i} beta gamma delta" for i in range(40))
    nodup = spark.createDataFrame(
        [(i, long_a + f" tail{i}") for i in range(8)],
        "doc_id long, text string",
    )
    mh = lambda df, c: sorted(
        (r["id1"], r["id2"], round(r["jaccard"], 12))
        for r in D.minhash_lsh_dedup_pairs(
            df, "doc_id", "text", threshold=0.8, collapse_exact=c
        ).collect()
    )
    assert mh(nodup, True) == mh(nodup, False)
    assert len(mh(nodup, False)) > 0  # near-dups exist, exact dups don't

    withdup = nodup.unionByName(
        spark.createDataFrame(
            [(100 + i, long_a + " tail0") for i in range(3)],
            "doc_id long, text string",
        )
    )
    want = mh(withdup, False)
    assert mh(withdup, True) == want  # literal expansion path (default)
    release_shared_caches(spark)  # memo must not leak across gates
    monkeypatch.setattr(D, "_DUP_LITERAL_LIMIT", 0)
    assert mh(withdup, True) == want  # broadcast expansion path
    release_shared_caches(spark)
    monkeypatch.setattr(D, "_DUP_BROADCAST_LIMIT", 0)
    assert mh(withdup, True) == want  # forced shuffle expansion path
    release_shared_caches(spark)


def test_dup_memo_distinguishes_same_schema_corpora(spark):
    """Two in-memory corpora with IDENTICAL schemas canonicalize to the
    same plan string (LocalRelation's string hides its rows), so the
    dup-info memo must validate against the CacheManager ENTRY — which
    is data-aware — not the plan string alone (regression: the second
    corpus reused the first's dup structure and emitted its pairs)."""
    from local_pubchem_db_spark.operators import dedup as D
    from local_pubchem_db_spark.operators.util import (
        release_shared_caches,
    )

    release_shared_caches(spark)
    long_a = " ".join(f"alpha{i} beta gamma" for i in range(40))
    long_b = " ".join(f"omega{i} delta eps" for i in range(40))
    c1 = spark.createDataFrame(
        [(1, long_a), (2, long_a), (3, long_b)],
        "doc_id long, text string",
    )
    c2 = spark.createDataFrame(
        [(7, long_b), (8, long_b), (9, long_b)],  # different dup set
        "doc_id long, text string",
    )
    mh = lambda df: sorted(
        (r["id1"], r["id2"])
        for r in D.minhash_lsh_dedup_pairs(
            df, "doc_id", "text", threshold=0.8
        ).collect()
    )
    assert mh(c1) == [(1, 2)]
    assert mh(c2) == [(7, 8), (7, 9), (8, 9)]  # NOT c1's structure
    release_shared_caches(spark)


def test_fused_text_band_udf_bit_identical_to_two_stage(spark):
    """r14 (verdict Next #3): minhash_band_text_udf (text -> buckets in
    ONE Arrow pass, the new hot-path signature) must be bit-identical
    to minhash_band_udf(shingle_array_udf(text)) — same tokenizer, same
    dedup, same band core — on normal text, whitespace edge cases,
    too-short text (null buckets), empty and null strings, and across
    permutation geometries."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.functions.hashing import (
        minhash_band_text_udf,
        minhash_band_udf,
    )
    from local_pubchem_db_spark.functions.text import shingle_array_udf

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "  leading  and\ttrailing   whitespace  mix\n here "),
            (2, "two words"),          # < shingle_len: no shingles
            (3, ""),                    # empty
            (4, None),                  # null
            (5, "exact exact exact exact exact"),  # repeated tokens
            (6, "a b c d e f g h i j k l m n o p"),
        ],
        "doc_id long, text string",
    )
    for num_perm, bands, n in ((128, 32, 3), (64, 16, 3), (32, 8, 2)):
        fused = docs.select(
            "doc_id",
            minhash_band_text_udf(num_perm, bands, n)(F.col("text")).alias(
                "b"
            ),
        ).collect()
        two_stage = docs.select(
            "doc_id",
            minhash_band_udf(num_perm, bands)(
                shingle_array_udf(n)(F.col("text"))
            ).alias("b"),
        ).collect()
        got = {r["doc_id"]: r["b"] for r in fused}
        want = {r["doc_id"]: r["b"] for r in two_stage}
        # the two-stage path maps "no shingles" to an EMPTY array (the
        # shingle UDF returns []), the fused path to the same
        for k in got:
            gb, wb = got[k], want[k]
            assert (gb is None) == (wb is None), (k, gb, wb)
            if gb is not None:
                assert list(gb) == list(wb), k


def test_minhash_pairs_equal_pre_r14_two_stage_plan(spark, sf_dir):
    """The r14 plan restructure (fused signature UDF + candidate-only
    shingling) must emit the IDENTICAL verified pair relation as the
    pre-r14 two-stage plan, reconstructed here from the same
    primitives."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["id1"], r["id2"], r["jaccard"])
        for r in D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    )
    # pre-r14 shape: full-corpus shingle relation feeding both sides
    groups = D._exact_groups(docs, "doc_id", "text")
    reps = groups.select(F.col("gid").alias("id"), "text")
    shingled = D._with_shingles(reps, "id", "text", 3)
    buckets = D._minhash_buckets(shingled, 128, 32)
    cand = D.bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=64
    )
    rep_pairs = D._verify_jaccard(cand, shingled, 0.8)
    want_reps = sorted(
        (r["id1"], r["id2"], r["jaccard"]) for r in rep_pairs.collect()
    )
    # same corpus has no exact dups in the fixture? compare at rep level
    # via the public API with collapse OFF as well
    got_nc = sorted(
        (r["id1"], r["id2"], r["jaccard"])
        for r in D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8, collapse_exact=False
        ).collect()
    )
    want_nc_shingled = D._with_shingles(docs, "doc_id", "text", 3)
    want_nc = sorted(
        (r["id1"], r["id2"], r["jaccard"])
        for r in D._verify_jaccard(
            D.bounded_bucket_pairs(
                D._minhash_buckets(want_nc_shingled, 128, 32),
                ["band", "bucket"],
                max_bucket_size=64,
            ),
            want_nc_shingled,
            0.8,
        ).collect()
    )
    assert got_nc == want_nc
    assert got, "fixture lost its near-dups"
    # with collapse on: reconstruct the FULL pre-r14 pipeline (two-stage
    # rep pairs + the same expansion with the old shingle-derived
    # valid_gids) and require exact equality
    want = sorted(
        (r["id1"], r["id2"], r["jaccard"])
        for r in D._expand_collapsed(
            groups,
            rep_pairs,
            val_col="jaccard",
            intra_column=F.lit(1.0),
            intra_value=1.0,
            valid_gids=shingled.select(F.col("id").alias("gid")),
            cap=64,
        ).collect()
    )
    assert got == want
    assert want_reps  # two-stage found pairs too


def _initial_plan(df):
    """Pre-execution physical plan string. Under AQE this is the
    AdaptiveSparkPlan's INITIAL plan, which reflects explicit broadcast
    hints (a hinted join plans BroadcastHashJoin statically; an unhinted
    one plans a shuffle join that AQE may only later convert) — exactly
    the property the gate controls."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_verify_broadcast_gate_plan_shape(spark, monkeypatch):
    """r15 (VERDICT r14 What's-wrong #1): the two text-fetch joins in
    _lsh_verified_pairs must broadcast-hint ONLY below the measured-size
    gates, and the text gate must be measured only for a caller-vouched
    cached relation (the mean-octets aggregate reads the corpus text
    column — an uncached rel takes the shuffle verify instead of paying
    a fourth cold scan; r15 review finding). autoBroadcastJoinThreshold
    is disabled for the assertion so the ONLY possible source of a
    static BroadcastHashJoin is the explicit hint — isolating the gate
    from Spark's own stats-based broadcast selection on a tiny test
    corpus."""
    from local_pubchem_db_spark.operators import dedup as D
    from local_pubchem_db_spark.operators.util import release_shared_caches

    long_a = " ".join(f"alpha{i} beta gamma delta" for i in range(40))
    docs = spark.createDataFrame(
        [(i, long_a + f" tail{i}") for i in range(8)],
        "doc_id long, text string",
    )
    rel = docs.select(F.col("doc_id").alias("id"), "text")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def plan(limits=None, *, cached):
            release_shared_caches(spark)
            for name, val in (limits or {}).items():
                monkeypatch.setattr(D, name, val)
            if cached:
                df = D._lsh_verified_pairs(
                    rel, 3, 128, 32, 64, 0.8, rel_cached=True
                )
            else:
                df = D.minhash_lsh_dedup_pairs(
                    docs, "doc_id", "text", threshold=0.8,
                    collapse_exact=False,
                )
            return _initial_plan(df)

        # Below the driver-tier gates (r15): NO joins at all — the
        # verify runs over an Arrow-local relation of collected pairs.
        p = plan(cached=True)
        assert "Join" not in p and "BroadcastExchange" not in p
        assert "LocalTableScan" in p

        # Driver tier disabled: cached rel, below both broadcast gates
        # — both text-fetch joins broadcast-hinted.
        monkeypatch.setattr(D, "_LSH_DRIVER_VERIFY_PAIRS", 0)
        assert plan(cached=True).count("BroadcastHashJoin") == 2

        # Cached rel, text payload above its ceiling: the id-only cand
        # still broadcasts, the text-carrying half does NOT.
        p = plan({"_LSH_TEXT_BROADCAST_BYTES": 0}, cached=True)
        assert p.count("BroadcastHashJoin") == 1
        monkeypatch.setattr(D, "_LSH_TEXT_BROADCAST_BYTES", 64 << 20)

        # Uncached rel (the no-collapse path): the text gate is never
        # measured — cand broadcasts under the pair gate, half does not.
        assert plan(cached=False).count("BroadcastHashJoin") == 1

        # Pair count above the limit: NO broadcast hint anywhere — the
        # pre-r14 shuffle-join verify shape — on either path.
        p = plan({"_LSH_PAIR_BROADCAST_LIMIT": 0}, cached=False)
        assert "BroadcastHashJoin" not in p
        p = plan(cached=True)
        assert "BroadcastHashJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        release_shared_caches(spark)


def test_lsh_verify_gate_results_identical_across_shapes(spark, monkeypatch):
    """All four gate outcomes (driver-literal tier / both broadcasts /
    cand-only / none) must emit the identical verified pair relation —
    the gate is plan-shape only, never semantics."""
    from local_pubchem_db_spark.operators import dedup as D
    from local_pubchem_db_spark.operators.util import release_shared_caches

    long_a = " ".join(f"alpha{i} beta gamma delta" for i in range(40))
    docs = spark.createDataFrame(
        [(i, long_a + f" tail{i}") for i in range(8)]
        + [(100 + i, long_a + " tail0") for i in range(3)],
        "doc_id long, text string",
    )

    def rows():
        release_shared_caches(spark)
        return sorted(
            (r["id1"], r["id2"], round(r["jaccard"], 12))
            for r in D.minhash_lsh_dedup_pairs(
                docs, "doc_id", "text", threshold=0.8, collapse_exact=True
            ).collect()
        )

    want = rows()  # collapse path, tiny pairs: the driver-literal tier
    assert want, "fixture lost its near-dups"
    monkeypatch.setattr(D, "_LSH_DRIVER_VERIFY_PAIRS", 0)
    assert rows() == want  # both text-fetch joins broadcast-hinted
    monkeypatch.setattr(D, "_LSH_TEXT_BROADCAST_BYTES", 0)
    assert rows() == want  # cand-only broadcast
    monkeypatch.setattr(D, "_LSH_PAIR_BROADCAST_LIMIT", 0)
    assert rows() == want  # plain shuffle joins
    release_shared_caches(spark)



@given(
    buckets=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=40),
            min_size=1,
            max_size=12,
            unique=True,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=12, deadline=None)
def test_bounded_bucket_pairs_properties(spark, buckets):
    """Property pin (hypothesis, r15) for the cap's whole contract over
    arbitrary bucket shapes — the goldens cover chosen shapes, this
    explores the space:

    - soundness: every emitted pair co-occurs in >= 1 bucket;
    - completeness under the cap: a bucket within ``max_bucket_size``
      contributes ALL its C(s,2) pairs;
    - connectivity above it: an oversized bucket's members stay in ONE
      component of the emitted graph (the star+chain guarantee that
      ``dedup_keep_ids`` component resolution relies on);
    - the bound: total pairs <= sum over buckets of min(C(s,2), 2s).
    """
    from itertools import combinations

    cap = 4
    rows = [
        (bi, 0, int(i)) for bi, ids in enumerate(buckets) for i in ids
    ]
    df = spark.createDataFrame(rows, "band int, bucket int, id long")
    got = {
        (r["id1"], r["id2"])
        for r in bounded_bucket_pairs(
            df, ["band", "bucket"], max_bucket_size=cap
        ).collect()
    }

    assert all(a < b for a, b in got)

    cooccur = {
        tuple(sorted(p))
        for ids in buckets
        for p in combinations(ids, 2)
    }
    assert got <= cooccur

    comp = _components([{"id1": a, "id2": b} for a, b in got])
    for ids in buckets:
        s = sorted(set(ids))
        if len(s) <= cap:
            for p in combinations(s, 2):
                assert p in got, (p, s)
        elif len(s) > 1:
            roots = {comp.get(i, i) for i in s}
            assert len(roots) == 1, (s, roots)

    bound = sum(
        min(len(ids) * (len(ids) - 1) // 2, 2 * len(ids))
        for ids in buckets
    )
    assert len(got) <= bound


def test_dup_info_one_probe_job_and_warm_memo(spark):
    """r15 job-fold: _dup_info computes dup sizing + the text-gate's
    mean octets in ONE aggregation (plus one conditional literal
    collect), its mean matches a separate aggregate, the Column-form
    validity resolves in the same collect as the legacy DataFrame form,
    and a warm re-invocation with a stable valid_key runs ZERO jobs."""
    from local_pubchem_db_spark.operators import dedup as D
    from local_pubchem_db_spark.operators.util import release_shared_caches

    release_shared_caches(spark)
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb cc dd"), (3, "x"), (4, "x"),
         (5, "solo doc here now")],
        "doc_id long, text string",
    )
    groups = D._exact_groups(docs, "doc_id", "text")
    pred = D._word_count(F.col("text")) >= 3
    info = D._dup_info(groups, pred, 64, valid_key="wc>=3")
    assert (info.n_dup, info.dup_members) == (2, 4)
    want_mean = groups.agg(F.avg(F.octet_length("text"))).first()[0]
    assert abs(info.mean_octets - float(want_mean)) < 1e-9
    # Column-form validity == legacy DataFrame-form validity: the "x"
    # group (too short) must emit no intra pairs on either path
    legacy = D._dup_info(
        groups,
        groups.filter(pred).select("gid"),
        64,
    )
    assert legacy.literal == info.literal
    assert info.literal is not None
    assert all(
        a != 3 and b != 3 for a, b in info.literal["intra"]
    ), "too-short dup group must be invalid for intra pairs"
    # warm memo: the identical (groups, valid_key, cap) re-probe runs
    # zero jobs even though the predicate Column is a NEW object with
    # fresh lambda-variable ids
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None) or [])
    again = D._dup_info(
        groups,
        D._word_count(F.col("text")) >= 3,
        64,
        valid_key="wc>=3",
    )
    after = len(st.getJobIdsForGroup(None) or [])
    assert again == info
    assert after == before, "warm _dup_info re-probe must run no jobs"
    release_shared_caches(spark)


def test_dup_probe_overlap_threaded_literal_collect(spark, monkeypatch):
    """r16 (guide §2.6, VERDICT r15 Next #3): the literal-dup collect of
    the LSH probe rides a driver-side thread overlapping the candidate
    count. Pins, in order of importance:

    - EQUALITY: the overlapped pair relation is identical to the
      sequential form's (the thread only moves WHEN the collect runs);
    - FILL RACE: by the time the background collect starts, the probe
      aggregation has fully materialized the groups cache, so the
      thread and the candidate jobs both read the InMemoryRelation and
      the multi-subtree first-reference race ``shared()`` documents
      cannot occur;
    - MEMO SAFETY: the session memo holds no entry for the in-flight
      probe while the background collect runs — it is written only by
      the calling thread inside ``resolve()``.
    """
    import threading

    from local_pubchem_db_spark.operators import dedup as D
    from local_pubchem_db_spark.operators.util import release_shared_caches

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 7} common tail")
         for i in range(40)]
        + [(100 + i, "alpha beta gamma delta epsilon zeta 0 common tail")
           for i in range(6)],
        "doc_id long, text string",
    )

    release_shared_caches(spark)
    seen: dict = {}
    orig_collect = D._collect_literal_dups

    def spy_collect(groups, valid, cap):
        seen["thread"] = threading.current_thread()
        seen["memo_len"] = len(D._DUP_MEMO.get(spark, {}) or {})
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        seen["fully_cached"] = any(
            i.numCachedPartitions() == i.numPartitions()
            and i.numPartitions() > 0
            for i in infos
        )
        return orig_collect(groups, valid, cap)

    monkeypatch.setattr(D, "_collect_literal_dups", spy_collect)
    overlapped = sorted(
        (r["id1"], r["id2"], round(r["jaccard"], 9))
        for r in D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text"
        ).collect()
    )
    assert seen, "literal collect never ran — fixture lost its dup set"
    assert seen["thread"] is not threading.main_thread(), (
        "literal collect must run on the overlap thread"
    )
    assert seen["fully_cached"], (
        "groups cache must be fully materialized before the background "
        "collect starts (the fill-race pin)"
    )
    assert seen["memo_len"] == 0, (
        "session memo must not be written while the probe is in flight"
    )
    assert D._DUP_MEMO.get(spark), "resolve() must memoize the DupInfo"

    # sequential control: same corpus, overlap forced off
    monkeypatch.setattr(D, "_collect_literal_dups", orig_collect)
    orig_start = D._dup_info_start

    def no_overlap(groups, valid, cap, valid_key=None, overlap=False):
        return orig_start(groups, valid, cap, valid_key=valid_key)

    monkeypatch.setattr(D, "_dup_info_start", no_overlap)
    release_shared_caches(spark)
    sequential = sorted(
        (r["id1"], r["id2"], round(r["jaccard"], 9))
        for r in D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text"
        ).collect()
    )
    assert overlapped == sequential
    release_shared_caches(spark)
