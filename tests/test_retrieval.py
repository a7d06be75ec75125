"""Retrieval family: inverted index, coordination ranking, and BM25 —
pinned against pure-pandas oracles (BM25 with float tolerance, since its
scores are log/division expressions) and plan-audited for the broadcast
query-side joins."""

import math
import re

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    coordination_topk,
)

DOCS = [
    (0, "the quick brown fox JUMPS over the lazy dog."),
    (1, "spark streams batch data; spark shuffles spark partitions"),
    (2, "a vector index for dense vector search, vector by vector!"),
    (3, "   "),
    (4, None),
    (5, "dog dog dog fox"),
    (6, "quick search over spark data"),
]


def _norm_tokens(text):
    if text is None:
        return []
    t = re.sub(r"[.,!?;:]", "", text.lower())
    return [w for w in re.split(r"\s+", t.strip()) if w]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_match_pure_python(spark, corpus):
    postings, doc_stats = build_postings(corpus)
    got = {
        (r["term"], r["doc_id"]): r["tf"] for r in postings.collect()
    }
    want = {}
    lens = {}
    for doc_id, text in DOCS:
        toks = _norm_tokens(text)
        if toks:
            lens[doc_id] = len(toks)
        for w in toks:
            want[(w, doc_id)] = want.get((w, doc_id), 0) + 1
    assert got == want
    assert {
        (r["doc_id"], r["dl"]) for r in doc_stats.collect()
    } == set(lens.items())


def test_coordination_ranking_is_exact(spark, corpus):
    postings, _ = build_postings(corpus)
    got = [
        (r["doc_id"], r["n_terms"], r["total_tf"], r["rank"])
        for r in coordination_topk(
            postings, ["spark", "vector", "dog"], k=3
        ).collect()
    ]
    # doc 2: vector x4 -> (1, 4); doc 1: spark x3 -> (1, 3);
    # doc 5: dog x3 -> (1, 3) but doc_id tiebreak puts 1 first
    assert got == [(2, 1, 4, 1), (1, 1, 3, 2), (5, 1, 3, 3)]


def _bm25_oracle(query_terms, k1=1.2, b=0.75):
    docs = {d: _norm_tokens(t) for d, t in DOCS if _norm_tokens(t)}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for t in docs.values() if q in t)
        for q in set(query_terms)
    }
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for q in set(query_terms):
            tf = toks.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        if s > 0:
            scores[d] = s
    return scores


def test_bm25_matches_pure_python_oracle(spark, corpus):
    postings, doc_stats = build_postings(corpus)
    q = ["spark", "dog", "quick"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(postings, doc_stats, q, k=10).collect()
    }
    want = _bm25_oracle(q)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d
    # ordering by score desc
    ordered = [
        r["doc_id"]
        for r in bm25_topk(postings, doc_stats, q, k=10).collect()
    ]
    assert ordered == sorted(want, key=lambda d: (-want[d], d))


def test_bm25_empty_and_unknown_terms(spark, corpus):
    postings, doc_stats = build_postings(corpus)
    assert (
        bm25_topk(postings, doc_stats, ["zzz_nowhere"], k=5).count() == 0
    )
    with pytest.raises(ValueError, match="at least one"):
        bm25_topk(postings, doc_stats, ["  "], k=5)


def test_bm25_empty_corpus_schema_matches_id_type(spark):
    """The empty-corpus early return must carry the INPUT's id type —
    a hardcoded long diverged from string doc ids and broke downstream
    unions on the empty path (ADVICE r9)."""
    from local_pubchem_db_spark.operators.retrieval import bm25_topk_direct

    empty_str = spark.createDataFrame([], "url string, text string")
    out = bm25_topk_direct(empty_str, ["spark"], id_col="url", text_col="text")
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "double",
    ]
    assert out.columns == ["url", "score"]
    # non-empty string-id path unions cleanly with the empty path
    nonempty = spark.createDataFrame(
        [("a://1", "spark joins data")], "url string, text string"
    )
    both = bm25_topk_direct(nonempty, ["spark"], id_col="url").unionByName(out)
    assert both.count() == 1
    # postings route: empty postings/doc_stats with string ids
    postings, doc_stats = build_postings(
        empty_str, id_col="url", text_col="text"
    )
    out2 = bm25_topk(postings, doc_stats, ["spark"], id_col="url")
    assert out2.schema["url"].dataType.simpleString() == "string"
    assert out2.count() == 0


def test_query_plan_broadcasts_query_side(spark, corpus):
    """The |q|-row df/idf stats must broadcast, the term match must be a
    filter (not a join), and nothing crosses into Python — a shuffle
    join keyed on 3 terms would be the 100 TB mistake."""
    postings, doc_stats = build_postings(corpus)
    plan = (
        bm25_topk(postings, doc_stats, ["spark", "dog"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # the idf stats join
    assert "BatchEvalPython" not in plan  # all codegen, no Python


def test_term_match_pushes_down_to_parquet_scan(spark, corpus, tmp_path):
    """r10: the term match is a literal IN predicate, not a broadcast
    join — against a parquet-backed index it must reach the scan
    (PushedFilters), so non-matching row groups are skipped instead of
    the whole postings relation feeding a join probe."""
    from local_pubchem_db_spark.operators.retrieval import coordination_topk

    postings, _ = build_postings(corpus)
    p = str(tmp_path / "postings.parquet")
    postings.write.parquet(p)
    on_disk = spark.read.parquet(p)
    out = coordination_topk(on_disk, ["spark", "dog"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan
    # and the filtered route returns what the in-memory route returns
    want = [
        (r["doc_id"], r["n_terms"], r["total_tf"], r["rank"])
        for r in coordination_topk(postings, ["spark", "dog"], k=5).collect()
    ]
    got = [
        (r["doc_id"], r["n_terms"], r["total_tf"], r["rank"])
        for r in out.collect()
    ]
    assert got == want


def _reset_index_tables(spark, name):
    """Clear an index's catalog entries and warehouse locations —
    delegates to the operator's own drop_index so the table-suffix list
    lives in ONE place (next to save_postings)."""
    from local_pubchem_db_spark.operators.retrieval import drop_index

    drop_index(spark, name)


def test_bucketed_postings_round_trip_and_pruning(spark, corpus, tmp_path):
    """save_postings/load_postings: the bucketBy(term) deployment shape.
    The reloaded index must score identically, and a term probe must
    read a strict subset of buckets (SelectedBucketsCount in the scan)."""
    from local_pubchem_db_spark.operators.retrieval import (
        load_postings,
        save_postings,
    )

    postings, doc_stats = build_postings(corpus)
    _reset_index_tables(spark, "t_ret_idx")
    save_postings(postings, doc_stats, "t_ret_idx", buckets=8)
    try:
        bp, bd = load_postings(spark, "t_ret_idx")
        a = bm25_topk(postings, doc_stats, ["spark", "dog"], k=5).collect()
        b = bm25_topk(bp, bd, ["spark", "dog"], k=5).collect()
        assert [(r[0], round(r[1], 9)) for r in a] == [
            (r[0], round(r[1], 9)) for r in b
        ]
        plan = (
            bm25_topk(bp, bd, ["spark", "dog"], k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        m = [ln for ln in plan.splitlines() if "SelectedBucketsCount" in ln]
        assert m, plan
        # 2 terms -> at most 2 of the 8 buckets scanned
        import re

        sel = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", m[0])
        assert sel and int(sel.group(1)) <= 2 and int(sel.group(2)) == 8
    finally:
        _reset_index_tables(spark, "t_ret_idx")


def test_persisted_index_stats_and_jobfree_query_construction(spark, corpus):
    """save_postings persists (N, avgdl) with the index (r11, verdict
    Next #4); load_index hands them back, and a bm25_topk built WITH
    them issues ZERO jobs before its scoring job — previously every
    warm query paid a doc_stats aggregation job for two scalars. Scores
    must be identical to the derive-per-query path."""
    from local_pubchem_db_spark.operators.retrieval import (
        load_index,
        save_postings,
    )

    postings, doc_stats = build_postings(corpus)
    _reset_index_tables(spark, "t_ret_stats_idx")
    save_postings(postings, doc_stats, "t_ret_stats_idx", buckets=4)
    try:
        bp, bd, (n_docs, avgdl), tdf = load_index(spark, "t_ret_stats_idx")
        assert tdf is not None
        # the persisted scalars equal the direct aggregation
        row = doc_stats.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")
        ).first()
        assert n_docs == int(row["n"])
        assert avgdl == pytest.approx(float(row["a"]), rel=1e-12)

        # query CONSTRUCTION with the scalars runs no job at all
        sc = spark.sparkContext
        sc.setJobGroup("bm25_construct", "job-free construction pin")
        try:
            q = bm25_topk(
                bp, bd, ["spark", "dog"], k=5, n_docs=n_docs,
                avgdl=avgdl, term_df=tdf,
            )
        finally:
            sc.setJobGroup("", "")
        tracker = sc.statusTracker()
        assert tracker.getJobIdsForGroup("bm25_construct") == []

        # and the scores equal the derive-per-query path exactly
        a = bm25_topk(postings, doc_stats, ["spark", "dog"], k=5).collect()
        b = q.collect()
        assert [(r[0], round(r[1], 9)) for r in a] == [
            (r[0], round(r[1], 9)) for r in b
        ]
    finally:
        _reset_index_tables(spark, "t_ret_stats_idx")


def test_direct_routes_equal_postings_routes(spark, corpus):
    """The index-free direct paths (map-only array expressions) must
    return exactly what the postings paths return — coordination
    bit-for-bit, BM25 to float round-off (the two routes sum the same
    per-term contributions in different orders)."""
    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk_direct,
        coordination_topk_direct,
    )

    postings, doc_stats = build_postings(corpus)
    q = ["spark", "vector", "dog", "quick"]
    via_index = [tuple(r) for r in coordination_topk(postings, q, k=5).collect()]
    direct = [tuple(r) for r in coordination_topk_direct(corpus, q, k=5).collect()]
    assert direct == via_index

    bi = {r["doc_id"]: r["score"] for r in
          bm25_topk(postings, doc_stats, q, k=10).collect()}
    bd = {r["doc_id"]: r["score"] for r in
          bm25_topk_direct(corpus, q, k=10).collect()}
    assert set(bi) == set(bd)
    for d in bi:
        assert bd[d] == pytest.approx(bi[d], rel=1e-12), d


def test_direct_route_plan_is_shuffle_free(spark, corpus):
    """coordination_topk_direct must plan as scan -> project -> filter
    -> TakeOrdered: no Exchange of corpus data (the whole point of the
    direct route; the only movement is the k-row top-k merge)."""
    from local_pubchem_db_spark.operators.retrieval import (
        coordination_topk_direct,
    )

    plan = (
        coordination_topk_direct(corpus, ["spark", "dog"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # the per-doc scoring stage must not shuffle: no ShuffleExchange
    # below TakeOrdered other than the rank window's trivial k-row one
    stage = plan.split("TakeOrderedAndProject")[-1]
    assert "Exchange hashpartitioning" not in stage
    assert "EvalPython" not in plan


def test_bucketed_docstats_join_never_shuffles_corpus_side(spark, corpus):
    """save_postings buckets doc_stats by the doc id (r11): BM25's
    scored join must read the corpus-sized doc-length relation through
    its bucketed scan — zero exchanges on that side even when broadcast
    is disabled (the non-broadcastable 100 TB regime); only the matched
    postings shuffle, and the per-doc aggregation reuses the join
    partitioning."""
    from local_pubchem_db_spark.operators.retrieval import (
        load_index,
        save_postings,
    )

    postings, doc_stats = build_postings(corpus)
    _reset_index_tables(spark, "t_ret_bj_idx")
    save_postings(postings, doc_stats, "t_ret_bj_idx", buckets=4)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bp, bd, (n, avgdl), tdf = load_index(spark, "t_ret_bj_idx")
        q = bm25_topk(
            bp, bd, ["spark", "dog"], k=5, n_docs=n, avgdl=avgdl,
            term_df=tdf,
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        # doc_stats scan rides its bucket layout
        ds_scan = [
            ln for ln in plan.splitlines() if "docstats" in ln and "Scan" in ln
        ]
        assert ds_scan and "Bucketed: true" in ds_scan[0], plan
        # with the persisted term_df, the matched postings are scanned
        # ONCE (scoring) — the old plan read them a second time to
        # aggregate per-term df
        postings_scans = [
            ln
            for ln in plan.splitlines()
            if "t_ret_bj_idx_postings" in ln and "Scan" in ln
        ]
        assert len(postings_scans) == 1, plan
        # exactly ONE doc-id exchange in the whole plan: the matched
        # postings aligning to the buckets; the agg reuses it and the
        # corpus side has none
        assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan
        # and the results are still correct vs the in-memory route
        a = bm25_topk(postings, doc_stats, ["spark", "dog"], k=5).collect()
        b = q.collect()
        assert [(r[0], round(r[1], 9)) for r in a] == [
            (r[0], round(r[1], 9)) for r in b
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        _reset_index_tables(spark, "t_ret_bj_idx")


def test_rrf_fuse_arithmetic_and_outer_semantics(spark):
    """RRF (r11): score = sum of 1/(k + rank) over the rankings a doc
    appears in; docs present in only ONE ranking still fuse (full-outer
    semantics, missing contribution = 0); ties break on doc id."""
    from local_pubchem_db_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b], k=60, top_n=10).collect()
    }
    import pytest as _pt

    # doc 2: in both (rank 2 and rank 1) — the winner
    assert got[2][0] == _pt.approx(1 / 62 + 1 / 61, abs=0)
    assert got[2][1] == 1
    # single-ranking docs fuse with the missing side at 0
    assert got[1][0] == _pt.approx(1 / 61, abs=0)
    assert got[4][0] == _pt.approx(1 / 62, abs=0)
    assert got[3][0] == _pt.approx(1 / 63, abs=0)
    # 1/61 > 1/62 > 1/63: ranks follow
    assert [got[d][1] for d in (2, 1, 4, 3)] == [1, 2, 3, 4]

    with _pt.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_rrf_fuse_is_input_order_invariant_and_matches_reference(spark):
    """Property pin over random rankings (fixed cases, Spark-backed —
    per-example Spark jobs make hypothesis impractical here): RRF must
    be invariant to the ORDER rankings are passed in, to doc ids, and
    must equal the obvious pure-Python reference on every case."""
    import random

    from local_pubchem_db_spark.operators.retrieval import rrf_fuse

    rng = random.Random(421)
    for case in range(6):
        n_rank = rng.randint(1, 3)
        rankings, py_rankings = [], []
        for _ in range(n_rank):
            ids = rng.sample(range(100), rng.randint(1, 12))
            rows = [(d, r + 1) for r, d in enumerate(ids)]
            py_rankings.append(dict((d, r + 1) for r, d in enumerate(ids)))
            rankings.append(
                spark.createDataFrame(rows, "doc_id long, rank long")
            )
        k = rng.choice([10, 60])
        top_n = rng.choice([5, 50])
        # pure-Python reference
        all_ids = set().union(*[set(p) for p in py_rankings])
        ref_scores = {
            d: sum(1.0 / (k + p[d]) for p in py_rankings if d in p)
            for d in all_ids
        }
        ref = sorted(all_ids, key=lambda d: (-ref_scores[d], d))[:top_n]

        got = rrf_fuse(rankings, k=k, top_n=top_n).collect()
        assert [r["doc_id"] for r in got] == ref, case
        for r in got:
            assert r["rrf_score"] == pytest.approx(
                ref_scores[r["doc_id"]], rel=1e-15
            )
        # input-order invariance: reversed ranking list, same result set
        # and ranks (score SUMS may differ in the last ulp when 3+
        # rankings reorder the additions; the induced order must not)
        rev = rrf_fuse(list(reversed(rankings)), k=k, top_n=top_n).collect()
        assert [r["doc_id"] for r in rev] == [r["doc_id"] for r in got]
        assert [r["rank"] for r in rev] == [r["rank"] for r in got]


# ---------------------------------------------------------------------------
# r12: incremental append, catalog-safe drop_index, route selection,
# window-warning suppression
# ---------------------------------------------------------------------------

DELTA_DOCS = [
    (100, "fresh spark vectors stream into the index"),
    (101, "dog fox dog"),
    (102, "entirely novel wording here"),
]


def test_append_updates_derived_tables_from_delta_only(spark, corpus):
    """save_postings(mode="append") must (a) produce derived tables
    bit-equal to a from-scratch build over the union corpus, and (b)
    aggregate ONLY the appended base files — the O(delta) update
    (r12, verdict Next #2). The delta pin spies on DataFrameReader
    .parquet: every path it reads during the append must be a file
    created BY the append, never a pre-existing base file."""
    from unittest import mock

    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        load_index,
        save_postings,
    )

    name, ref = "t_ret_app_idx", "t_ret_app_ref"
    _reset_index_tables(spark, name)
    _reset_index_tables(spark, ref)
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA_DOCS, "doc_id long, text string")
    try:
        p0, d0 = build_postings(base)
        save_postings(p0, d0, name, buckets=4)
        before = set(
            spark.table(f"{name}_postings").inputFiles()
        ) | set(spark.table(f"{name}_docstats").inputFiles())

        p1, d1 = build_postings(delta)
        reader_cls = type(spark.read)
        orig = reader_cls.parquet
        seen: list[str] = []

        def spy(self, *paths, **kw):
            seen.extend(paths)
            return orig(self, *paths, **kw)

        with mock.patch.object(reader_cls, "parquet", spy):
            save_postings(p1, d1, name, buckets=4, mode="append")
        # O(delta): nothing the merge read predates the append
        assert seen, "append took the whole-table derived path"
        assert not (set(seen) & before), sorted(set(seen) & before)

        # bit-equality with a from-scratch build over base+delta
        pu, du = build_postings(base.unionByName(delta))
        save_postings(pu, du, ref, buckets=4)
        got_tdf = sorted(
            (r["term"], r["df"])
            for r in spark.table(f"{name}_termdf").collect()
        )
        want_tdf = sorted(
            (r["term"], r["df"])
            for r in spark.table(f"{ref}_termdf").collect()
        )
        assert got_tdf == want_tdf
        got_stats = spark.table(f"{name}_stats").first()
        want_stats = spark.table(f"{ref}_stats").first()
        assert got_stats["n"] == want_stats["n"]
        assert got_stats["sum_dl"] == want_stats["sum_dl"]
        assert got_stats["avgdl"] == want_stats["avgdl"]  # bit-equal:
        # both sides derive avgdl as double(exact sum_dl)/n

        # and the appended index serves queries over the union corpus
        bp, bd, (n_docs, avgdl), tdf = load_index(spark, name)
        a = bm25_topk(
            bp, bd, ["spark", "dog"], k=5,
            n_docs=n_docs, avgdl=avgdl, term_df=tdf,
        ).collect()
        rp, rd, (rn, ravg), rtdf = load_index(spark, ref)
        b = bm25_topk(
            rp, rd, ["spark", "dog"], k=5,
            n_docs=rn, avgdl=ravg, term_df=rtdf,
        ).collect()
        assert [(r[0], round(r[1], 12)) for r in a] == [
            (r[0], round(r[1], 12)) for r in b
        ]
    finally:
        _reset_index_tables(spark, name)
        _reset_index_tables(spark, ref)


def test_append_without_derived_tables_falls_back_to_full_build(
    spark, corpus
):
    """Appending onto an index whose derived tables are missing (a
    pre-r11 index) must rebuild them from the whole base tables — and
    still end correct."""
    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        save_postings,
    )

    name = "t_ret_app_old_idx"
    _reset_index_tables(spark, name)
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA_DOCS, "doc_id long, text string")
    try:
        p0, d0 = build_postings(base)
        save_postings(p0, d0, name, buckets=4)
        spark.sql(f"DROP TABLE IF EXISTS {name}_termdf")
        spark.sql(f"DROP TABLE IF EXISTS {name}_stats")
        p1, d1 = build_postings(delta)
        save_postings(p1, d1, name, buckets=4, mode="append")
        want_n = base.unionByName(delta).filter(
            F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0
        ).count()
        assert spark.table(f"{name}_stats").first()["n"] == want_n
        got = {
            r["term"]: r["df"]
            for r in spark.table(f"{name}_termdf").collect()
        }
        assert got["dog"] == 3  # docs 0, 5 from base + 101 from delta
    finally:
        _reset_index_tables(spark, name)


def test_drop_index_preserves_external_table_data(spark, tmp_path):
    """ADVICE r11 (medium): drop_index must never delete the data of an
    EXTERNAL table that happens to carry an index identifier — DROP
    TABLE intentionally preserves external locations, and the old
    name-guess rmtree violated that."""
    import os

    import pandas as pd

    from local_pubchem_db_spark.operators.retrieval import drop_index

    loc = tmp_path / "ext_postings_data"
    loc.mkdir()
    pd.DataFrame({"term": ["a"], "doc_id": [1], "tf": [1]}).to_parquet(
        loc / "part-0.parquet"
    )
    name = "t_ret_ext"
    spark.sql(f"DROP TABLE IF EXISTS {name}_postings")
    spark.sql(
        f"CREATE TABLE {name}_postings (term string, doc_id long, tf long) "
        f"USING parquet LOCATION '{loc}'"
    )
    drop_index(spark, name)
    assert not spark.catalog.tableExists(f"{name}_postings")
    assert os.path.exists(loc / "part-0.parquet")  # data preserved


def test_drop_index_removes_orphan_location_only_when_uncataloged(
    spark, tmp_path
):
    """The true orphan case drop_index exists for: a dead prior process
    left a warehouse directory with no catalog entry. drop_index must
    remove it (via the JVM Hadoop FileSystem — object-store-safe,
    r12 verdict Next #3) so the next save doesn't fail with
    LOCATION_ALREADY_EXISTS."""
    import os

    from local_pubchem_db_spark.operators.retrieval import drop_index

    wh = spark.conf.get("spark.sql.warehouse.dir")
    base = wh[5:] if wh.startswith("file:") else wh
    orphan = os.path.join(base, "t_ret_orph_postings")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "stale.parquet"), "wb") as f:
        f.write(b"junk")
    assert not spark.catalog.tableExists("t_ret_orph_postings")
    drop_index(spark, "t_ret_orph")
    assert not os.path.exists(orphan)


def test_hadoop_delete_handles_file_scheme(spark, tmp_path):
    """_hadoop_delete routes through the JVM FileSystem: a file:-scheme
    URI (the managed-warehouse shape on POSIX) is removed recursively;
    a missing path reports False, not an error."""
    from local_pubchem_db_spark.operators.retrieval import _hadoop_delete

    d = tmp_path / "jvmdel" / "nested"
    d.mkdir(parents=True)
    (d / "x.txt").write_text("x")
    assert _hadoop_delete(spark, f"file:{tmp_path / 'jvmdel'}")
    assert not (tmp_path / "jvmdel").exists()
    assert not _hadoop_delete(spark, f"file:{tmp_path / 'jvmdel'}")


def test_bm25_route_selection(spark, corpus):
    """The router (r12, verdict Next #1): a SELECTIVE probe stays on
    the bucket-pruned index path (plan scans the postings table, not
    the corpus); a probe whose matched volume exceeds the corpus
    routes to the direct scan (plan scans the corpus, not the postings
    table) and reuses the PERSISTED stats — one corpus scan, no stats
    pass. Scores agree with both reference routes."""
    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk_auto,
        bm25_topk_direct,
        build_postings,
        choose_bm25_route,
        load_index,
        save_postings,
    )

    name = "t_ret_route_idx"
    _reset_index_tables(spark, name)
    postings, doc_stats = build_postings(corpus)
    try:
        save_postings(postings, doc_stats, name, buckets=4)
        idx = load_index(spark, name)
        _, _, (n_docs, _avg), tdf = idx

        # the break-even is parallelism-aware (see choose_bm25_route):
        # at small cluster parallelism the bucketed route wins at every
        # reachable Σdf; at cluster scale the direct scan's per-task
        # cost shrinks and common terms flip
        route, dfs = choose_bm25_route(tdf, n_docs, ["spark"], 1.0)
        assert route == "bucketed" and dfs == {"spark": 2}
        ubi_terms = ["spark", "dog", "quick", "over", "vector"]
        route, dfs = choose_bm25_route(
            tdf, n_docs, ubi_terms, parallelism=32
        )
        assert route == "bucketed"  # Σdf ≤ |q|·N < break-even at P=32
        route, dfs = choose_bm25_route(
            tdf, n_docs, ubi_terms, parallelism=1_000_000
        )
        assert route == "direct" and sum(dfs.values()) > 0

        sel = bm25_topk_auto(
            spark, name, ["spark"], docs=corpus, k=5, index=idx
        )
        sel_plan = sel._jdf.queryExecution().executedPlan().toString()
        assert f"{name}_postings".lower() in sel_plan.lower()
        assert "SelectedBucketsCount" in sel_plan

        ubi = bm25_topk_auto(
            spark, name, ubi_terms,
            docs=corpus, k=5, index=idx, parallelism=1_000_000,
        )
        ubi_plan = ubi._jdf.queryExecution().executedPlan().toString()
        assert f"{name}_postings".lower() not in ubi_plan.lower()

        # score parity: routed-direct equals bm25_topk_direct (which
        # derives its own stats) to float round-off
        want = bm25_topk_direct(
            corpus, ["spark", "dog", "quick", "over", "vector"], k=5
        ).collect()
        got = ubi.collect()
        assert [r[0] for r in got] == [r[0] for r in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-12)
    finally:
        _reset_index_tables(spark, name)


def test_topk_rank_window_is_partitioned(spark, corpus):
    """The k-row rank windows must keep a (constant) partition spec
    THROUGH OPTIMIZATION: an empty spec makes WindowExec warn "No
    Partition Defined" on every query — log noise at service scale
    (r12, verdict What's wrong #3). A bare literal passes analysis but
    is stripped by EliminateWindowPartitions, so this pins the
    OPTIMIZED plan: the windowspecdefinition must lead with the
    projected partition attribute (`_w0`), not an order expression."""
    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        coordination_topk,
        coordination_topk_direct,
        rrf_fuse,
    )

    postings, _ = build_postings(corpus)
    frames = [
        coordination_topk(postings, ["spark", "dog"], k=3),
        coordination_topk_direct(corpus, ["spark", "dog"], k=3),
    ]
    frames.append(
        rrf_fuse([frames[0].select("doc_id", "rank")], top_n=3)
    )
    for df in frames:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        specs = [
            ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
        ]
        assert specs, plan
        for ln in specs:
            assert "windowspecdefinition(_w0" in ln, ln


def test_consecutive_appends_stay_exact(spark):
    """Two successive O(delta) appends must keep the derived tables
    equal to a from-scratch build over the full corpus — the merge must
    compose (each append's prior state is the PREVIOUS append's
    output), not just work once."""
    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        save_postings,
    )

    name, ref = "t_ret_app2_idx", "t_ret_app2_ref"
    _reset_index_tables(spark, name)
    _reset_index_tables(spark, ref)
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    d1 = spark.createDataFrame(DELTA_DOCS, "doc_id long, text string")
    d2 = spark.createDataFrame(
        [(200, "spark spark dog"), (201, "late arrival text")],
        "doc_id long, text string",
    )
    try:
        p, d = build_postings(base)
        save_postings(p, d, name, buckets=4)
        for delta in (d1, d2):
            dp, dd = build_postings(delta)
            save_postings(dp, dd, name, buckets=4, mode="append")
        pu, du = build_postings(base.unionByName(d1).unionByName(d2))
        save_postings(pu, du, ref, buckets=4)
        got = sorted(
            (r["term"], r["df"])
            for r in spark.table(f"{name}_termdf").collect()
        )
        want = sorted(
            (r["term"], r["df"])
            for r in spark.table(f"{ref}_termdf").collect()
        )
        assert got == want
        gs, ws = (
            spark.table(f"{name}_stats").first(),
            spark.table(f"{ref}_stats").first(),
        )
        assert (gs["n"], gs["sum_dl"], gs["avgdl"]) == (
            ws["n"],
            ws["sum_dl"],
            ws["avgdl"],
        )
    finally:
        _reset_index_tables(spark, name)
        _reset_index_tables(spark, ref)

def test_corpus_pointer_makes_router_self_contained(spark, corpus, tmp_path):
    """r13 (verdict Next #2): save_postings(corpus_table=...) persists
    the corpus pointer in <name>_stats; a bare bm25_topk_auto(spark,
    name, terms) call then resolves the corpus ITSELF and can take the
    direct route — previously a forgotten docs= silently pinned every
    query to the bucketed path. Pinned: the auto-resolved direct route
    equals the explicitly-plumbed one to float round-off."""
    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk_auto,
        build_postings,
        index_meta,
        save_postings,
    )

    name = "t_ret_ptr_idx"
    _reset_index_tables(spark, name)
    loc = str(tmp_path / "corpus_parquet")
    corpus.write.parquet(loc)
    docs = spark.read.parquet(loc)
    try:
        p, d = build_postings(docs)
        save_postings(p, d, name, buckets=4, corpus_table=loc)
        meta = index_meta(spark, name)
        assert meta["corpus_table"] == loc
        assert meta["corpus_id_col"] == "doc_id"
        assert meta["corpus_text_col"] == "text"
        assert meta["corpus_files"] == len(docs.inputFiles())
        assert meta["postings_files"] == len(
            spark.table(f"{name}_postings").inputFiles()
        )
        assert meta["buckets"] == 4
        # force the direct route (threshold 0) WITHOUT docs: the
        # pointer must supply the corpus
        q = ["spark", "dog"]
        bare = {
            (r[0], round(r[1], 12))
            for r in bm25_topk_auto(
                spark, name, q, k=5, direct_over=1e-12
            ).collect()
        }
        plumbed = {
            (r[0], round(r[1], 12))
            for r in bm25_topk_auto(
                spark, name, q, k=5, direct_over=1e-12, docs=docs
            ).collect()
        }
        assert bare == plumbed and bare
    finally:
        _reset_index_tables(spark, name)


def test_corpus_version_mismatch_warns_not_fails(spark, corpus, tmp_path):
    """The version guard (r13): when the pointed-at corpus grew after
    the index was built (file count changed), the self-contained call
    WARNS that statistics describe the indexed version — and still
    answers (never fails, never misprices silently)."""
    import warnings

    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk_auto,
        build_postings,
        save_postings,
    )

    name = "t_ret_ver_idx"
    _reset_index_tables(spark, name)
    loc = str(tmp_path / "corpus_v")
    corpus.write.parquet(loc)
    docs = spark.read.parquet(loc)
    try:
        p, d = build_postings(docs)
        save_postings(p, d, name, buckets=4, corpus_table=loc)
        # the corpus grows in place, index not re-synced
        spark.createDataFrame(
            [(100, "brand new dog document")], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(loc)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = bm25_topk_auto(spark, name, ["dog"], k=5).collect()
        assert any(
            "describe the indexed version" in str(w.message) for w in caught
        )
        assert out  # bucketed-path answer from the indexed version
    finally:
        _reset_index_tables(spark, name)


def test_persisted_cost_ratio_overrides_module_constant(spark, corpus):
    """r13 (verdict Next #4): a measured per-index cost_ratio persisted
    in <name>_stats must drive the break-even instead of the module
    constant. Pinned both at the choose_bm25_route level and through
    bm25_topk_auto's plumbing: with a tiny persisted ratio the same
    query flips to the direct route that the constant would keep
    bucketed."""
    from local_pubchem_db_spark.operators import retrieval as R

    name = "t_ret_ratio_idx"
    _reset_index_tables(spark, name)
    try:
        p, d = R.build_postings(corpus)
        R.save_postings(p, d, name, buckets=4)
        _, _, (n_docs, _avg), tdf = R.load_index(spark, name)
        q = ["spark", "dog"]
        # constant (47): bucketed on this corpus at local parallelism
        route_const, _ = R.choose_bm25_route(tdf, n_docs, q, parallelism=32)
        assert route_const == "bucketed"
        # tiny measured ratio: the SAME query flips direct
        route_meas, _ = R.choose_bm25_route(
            tdf, n_docs, q, parallelism=32, cost_ratio=1e-9
        )
        assert route_meas == "direct"
        # persisted plumbing: write cost_ratio into stats, route through
        # the auto path with a spy on choose_bm25_route
        meta = R.index_meta(spark, name)
        R._write_stats_row(spark, name, {**meta, "cost_ratio": 1e-9})
        seen = {}
        orig = R.choose_bm25_route

        def spy(tdf_, n, terms, **kw):
            seen.update(kw)
            return orig(tdf_, n, terms, **kw)

        try:
            R.choose_bm25_route = spy
            out = R.bm25_topk_auto(spark, name, q, docs=corpus, k=5)
            out.collect()
        finally:
            R.choose_bm25_route = orig
        assert seen.get("cost_ratio") == pytest.approx(1e-9)
    finally:
        _reset_index_tables(spark, name)


def test_calibrate_cost_ratio_measures_and_persists(spark, corpus, tmp_path):
    """calibrate_cost_ratio: measures a positive finite ratio on the
    index's own corpus, persists it in <name>_stats preserving every
    other field (n, sum_dl, corpus pointer), and the auto path reads
    it back."""
    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        calibrate_cost_ratio,
        index_meta,
        save_postings,
    )

    name = "t_ret_cal_idx"
    _reset_index_tables(spark, name)
    loc = str(tmp_path / "corpus_cal")
    corpus.write.parquet(loc)
    docs = spark.read.parquet(loc)
    try:
        p, d = build_postings(docs)
        save_postings(p, d, name, buckets=4, corpus_table=loc)
        before = index_meta(spark, name)
        ratio = calibrate_cost_ratio(spark, name, reps=1)
        assert ratio > 0 and ratio == ratio  # positive, not NaN
        after = index_meta(spark, name)
        assert after["cost_ratio"] == pytest.approx(ratio)
        for k in ("n", "sum_dl", "avgdl", "corpus_table", "buckets"):
            assert after[k] == before[k], k
    finally:
        _reset_index_tables(spark, name)


def test_stranded_termdf_swap_recovered_on_load(spark, corpus):
    """r13 (verdict Next #5): a crash between DROP TABLE termdf and the
    staged RENAME leaves the merged termdf under the staging name;
    load_index must complete the rename (the staged table is the FULL
    merged relation — the rename is pure metadata) and hand back a live
    term_df instead of silently degrading the warm path."""
    import warnings

    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        load_index,
        save_postings,
    )

    name = "t_ret_swap_idx"
    _reset_index_tables(spark, name)
    try:
        p, d = build_postings(corpus)
        save_postings(p, d, name, buckets=4)
        want = sorted(
            (r["term"], r["df"])
            for r in spark.table(f"{name}_termdf").collect()
        )
        # simulate the mid-swap crash window
        spark.sql(
            f"ALTER TABLE {name}_termdf RENAME TO {name}_termdf__staged"
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            _, _, _, tdf = load_index(spark, name)
        assert any("staged swap" in str(w.message) for w in caught)
        assert tdf is not None
        assert sorted((r["term"], r["df"]) for r in tdf.collect()) == want
        assert spark.catalog.tableExists(f"{name}_termdf")
        assert not spark.catalog.tableExists(f"{name}_termdf__staged")
    finally:
        _reset_index_tables(spark, name)


def test_consistency_marker_detects_and_repairs_crashed_append(
    spark, corpus
):
    """ADVICE r12: an append that crashes AFTER the base-table appends
    commit but BEFORE the derived merge leaves _termdf/_stats
    describing the pre-append corpus — BM25 would silently score with
    stale n/df/avgdl. load_index must detect the marker mismatch and
    rebuild the derived tables to the exact from-scratch values;
    repair=False must refuse to hand out the stale tables."""
    import warnings
    from unittest import mock

    from local_pubchem_db_spark.operators import retrieval as R

    name, ref = "t_ret_mark_idx", "t_ret_mark_ref"
    _reset_index_tables(spark, name)
    _reset_index_tables(spark, ref)
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA_DOCS, "doc_id long, text string")
    try:
        p0, d0 = R.build_postings(base)
        R.save_postings(p0, d0, name, buckets=4)
        p1, d1 = R.build_postings(delta)
        # crash simulation: base appends land, derived merge never runs
        with mock.patch.object(R, "_merge_derived_tables"):
            R.save_postings(p1, d1, name, buckets=4, mode="append")
        stale = spark.table(f"{name}_stats").first()
        assert stale["postings_files"] != len(
            spark.table(f"{name}_postings").inputFiles()
        )

        # repair=False: stale derived tables must NOT be used
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            _, _, (n_deg, _a), tdf_deg = R.load_index(
                spark, name, repair=False
            )
        assert any("STALE" in str(w.message) for w in caught)
        assert tdf_deg is None
        pu, du = R.build_postings(base.unionByName(delta))
        R.save_postings(pu, du, ref, buckets=4)
        want_stats = spark.table(f"{ref}_stats").first()
        assert n_deg == want_stats["n"]  # derived live from doc_stats

        # default repair: derived tables rebuilt bit-equal
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            _, _, (n_docs, avgdl), tdf = R.load_index(spark, name)
        assert any("rebuilding" in str(w.message) for w in caught)
        assert (n_docs, avgdl) == (want_stats["n"], want_stats["avgdl"])
        got = sorted((r["term"], r["df"]) for r in tdf.collect())
        want = sorted(
            (r["term"], r["df"])
            for r in spark.table(f"{ref}_termdf").collect()
        )
        assert got == want
        # marker re-synced: the next load is clean (no warnings)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            R.load_index(spark, name)
        assert not [w for w in caught if "rebuild" in str(w.message)]
    finally:
        _reset_index_tables(spark, name)
        _reset_index_tables(spark, ref)


def test_append_survives_stranded_staging_directory(spark, corpus):
    """ADVICE r12: a crash mid staged-table WRITE strands the staging
    warehouse directory with no catalog entry — DROP TABLE IF EXISTS
    then no-ops and every later append used to die with
    LOCATION_ALREADY_EXISTS (recoverable only by drop_index). The merge
    must clear the orphan location and complete."""
    import os

    from local_pubchem_db_spark.operators import retrieval as R

    name = "t_ret_orph_idx"
    _reset_index_tables(spark, name)
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(DELTA_DOCS, "doc_id long, text string")
    try:
        p0, d0 = R.build_postings(base)
        R.save_postings(p0, d0, name, buckets=4)
        # strand the staging DIRECTORY (no catalog entry)
        loc = R._managed_location(spark, f"{name}_termdf__staged")
        local = loc[5:] if loc.startswith("file:") else loc
        os.makedirs(local, exist_ok=True)
        with open(os.path.join(local, "stranded.bin"), "wb") as f:
            f.write(b"\x00")
        p1, d1 = R.build_postings(delta)
        R.save_postings(p1, d1, name, buckets=4, mode="append")
        got = {
            r["term"]: r["df"]
            for r in spark.table(f"{name}_termdf").collect()
        }
        assert got["dog"] == 3  # docs 0, 5 from base + delta's dog doc
    finally:
        _reset_index_tables(spark, name)

def test_service_index_tuple_makes_auto_construction_job_free(spark, corpus):
    """r13: bm25_topk_auto with the load_service_index 5-tuple reads
    nothing per call — the meta (corpus pointer, cost ratio) rides the
    tuple, so a warm service's query construction issues ZERO jobs
    (the r11 job-free contract, extended to the routed entry point)."""
    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk_auto,
        build_postings,
        load_service_index,
        save_postings,
    )

    name = "t_ret_svc_idx"
    _reset_index_tables(spark, name)
    postings, doc_stats = build_postings(corpus)
    try:
        save_postings(postings, doc_stats, name, buckets=4)
        idx = load_service_index(spark, name)
        assert len(idx) == 5 and isinstance(idx[4], dict)
        sc = spark.sparkContext
        sc.setJobGroup("auto_construct", "job-free construction pin")
        try:
            q = bm25_topk_auto(spark, name, ["spark", "dog"], k=5, index=idx)
        finally:
            sc.setJobGroup("", "")
        assert sc.statusTracker().getJobIdsForGroup("auto_construct") == []
        got = {(r[0], round(r[1], 9)) for r in q.collect()}
        want = {
            (r[0], round(r[1], 9))
            for r in bm25_topk(postings, doc_stats, ["spark", "dog"], k=5).collect()
        }
        assert got == want
    finally:
        _reset_index_tables(spark, name)

def test_version_guard_runs_at_service_load_not_per_query(spark, corpus, tmp_path):
    """r13: the corpus version guard costs a driver-side file listing —
    once per load_service_index, never per query on the 5-tuple path
    (a cached-index service pinned its version; re-load to re-check).
    The bare-name path keeps the per-call guard."""
    import warnings

    from local_pubchem_db_spark.operators import retrieval as R

    name = "t_ret_guard_idx"
    _reset_index_tables(spark, name)
    loc = str(tmp_path / "corpus_g")
    corpus.write.parquet(loc)
    docs = spark.read.parquet(loc)
    try:
        p, d = R.build_postings(docs)
        R.save_postings(p, d, name, buckets=4, corpus_table=loc)
        # corpus grows after the index build
        spark.createDataFrame(
            [(500, "one more dog")], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(loc)
        # load-time guard fires
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            idx = R.load_service_index(spark, name)
        assert any("indexed version" in str(w.message) for w in caught)
        # per-query on the 5-tuple: no listing, no warning
        calls = []
        orig = R._corpus_file_count

        def spy(sp, tbl):
            calls.append(tbl)
            return orig(sp, tbl)

        try:
            R._corpus_file_count = spy
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                R.bm25_topk_auto(
                    spark, name, ["dog"], k=3, index=idx
                ).collect()
        finally:
            R._corpus_file_count = orig
        assert calls == []
        assert not [
            w for w in caught if "indexed version" in str(w.message)
        ]
    finally:
        _reset_index_tables(spark, name)

def test_batch_coordination_equals_per_query(spark, corpus, tmp_path):
    """r13: coordination_topk_batch scores a WHOLE query batch in one
    union-pruned probe; each query's rows must equal its single-query
    coordination_topk exactly (integer keys). Queries whose terms match
    nothing produce no rows; the union IN predicate still reaches a
    parquet scan as a pushed filter."""
    import re

    from local_pubchem_db_spark.operators.retrieval import (
        coordination_topk,
        coordination_topk_batch,
    )

    postings, _ = build_postings(corpus)
    batch = {
        "q_lex": ["spark", "dog"],
        "q_vec": ["vector", "search"],
        "q_all": ["hash", "spark", "stream", "vector"],
        "q_none": ["zzz_nowhere"],
    }
    got = {}
    for r in coordination_topk_batch(postings, batch, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_terms"], r["total_tf"], r["rank"])
        )
    for qid, terms in batch.items():
        want = [
            (r["doc_id"], r["n_terms"], r["total_tf"], r["rank"])
            for r in coordination_topk(postings, terms, k=5).collect()
        ]
        assert sorted(got.get(qid, [])) == sorted(want), qid
    assert "q_none" not in got

    # the union-of-terms probe reaches a parquet-backed index's scan
    p = str(tmp_path / "batch_postings.parquet")
    postings.write.parquet(p)
    plan = (
        coordination_topk_batch(spark.read.parquet(p), batch, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(term" in plan, plan
    # ONE postings scan for the whole batch — the amortization pin
    assert len(re.findall(r"FileScan parquet", plan)) == 1, plan


def test_batch_bm25_equals_per_query(spark, corpus):
    """bm25_topk_batch == per-query bm25_topk to float round-off, with
    the persisted-index scalars and term_df plumbed (the service
    shape): one probe, one docstats join, one scoring aggregation for
    the whole batch."""
    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk_batch,
        build_postings,
        load_index,
        save_postings,
    )

    name = "t_ret_batch_idx"
    _reset_index_tables(spark, name)
    postings, doc_stats = build_postings(corpus)
    batch = {
        7: ["spark", "dog"],
        8: ["vector"],
        9: ["quick", "search", "data"],
    }
    try:
        save_postings(postings, doc_stats, name, buckets=4)
        bp, bd, (n_docs, avgdl), tdf = load_index(spark, name)
        got = {}
        rows = bm25_topk_batch(
            bp, bd, batch, k=5, n_docs=n_docs, avgdl=avgdl, term_df=tdf
        ).collect()
        for r in rows:
            got.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
        for qid, terms in batch.items():
            want = {
                r["doc_id"]: r["score"]
                for r in bm25_topk(
                    bp, bd, terms, k=5,
                    n_docs=n_docs, avgdl=avgdl, term_df=tdf,
                ).collect()
            }
            have = got.get(str(qid), {})
            assert have.keys() == want.keys(), qid
            for d in want:
                assert have[d] == pytest.approx(want[d], rel=1e-9), (qid, d)
    finally:
        _reset_index_tables(spark, name)

def test_mmr_rerank_diversity_and_lambda_extremes(spark):
    """MMR (r13): two near-duplicate top scorers + one diverse
    mid-scorer. lambda=1 reproduces relevance order (both dups first);
    lambda=0.5 interleaves the diverse doc ahead of the second dup.
    Matches a pure-numpy greedy reference on randomized inputs, and
    the candidate-vector fetch broadcasts the candidate side (the
    corpus-sized embeddings relation never shuffles)."""
    import numpy as np

    from local_pubchem_db_spark.operators.retrieval import mmr_rerank

    dup = [1.0, 0.0, 0.0, 0.0]
    dup2 = [0.999, 0.04, 0.0, 0.0]
    diverse = [0.0, 1.0, 0.0, 0.0]
    far = [0.0, 0.0, 1.0, 0.0]
    emb = spark.createDataFrame(
        [(1, dup), (2, dup2), (3, diverse), (4, far), (99, far)],
        "doc_id long, embedding array<double>",
    )
    ranked = spark.createDataFrame(
        [(1, 10.0), (2, 9.5), (3, 6.0), (4, 1.0)],
        "doc_id long, score double",
    )
    pure = [
        r["doc_id"]
        for r in mmr_rerank(ranked, emb, lambda_=1.0, k=4).orderBy("rank").collect()
    ]
    assert pure == [1, 2, 3, 4]
    div = [
        r["doc_id"]
        for r in mmr_rerank(ranked, emb, lambda_=0.5, k=4).orderBy("rank").collect()
    ]
    assert div[0] == 1 and div.index(3) < div.index(2), div

    # randomized equality with a numpy reference implementation
    rng = np.random.default_rng(11)
    n, dim = 12, 8
    V = rng.standard_normal((n, dim))
    scores = rng.uniform(1, 5, n)
    emb2 = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "doc_id long, embedding array<double>",
    )
    rk2 = spark.createDataFrame(
        [(i, float(scores[i])) for i in range(n)], "doc_id long, score double"
    )
    lam, k = 0.6, 6
    got = [
        r["doc_id"]
        for r in mmr_rerank(rk2, emb2, lambda_=lam, k=k).orderBy("rank").collect()
    ]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    rel = (scores - scores.min()) / (scores.max() - scores.min())
    sims = Vn @ Vn.T
    sel, rem = [], list(range(n))
    while rem and len(sel) < k:
        objs = [
            (lam * rel[i] - (1 - lam) * max((sims[i, j] for j in sel), default=0.0), i)
            for i in rem
        ]
        best = max(objs, key=lambda t: t[0])[1]
        sel.append(best)
        rem.remove(best)
    assert got == sel, (got, sel)


def test_mmr_rerank_edges(spark):
    """Candidates missing from the embeddings relation are dropped;
    empty candidate set returns an empty typed frame; bad lambda
    raises."""
    import pytest as _pt

    from local_pubchem_db_spark.operators.retrieval import mmr_rerank

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    ranked = spark.createDataFrame(
        [(1, 2.0), (7, 9.0)], "doc_id long, score double"
    )
    got = mmr_rerank(ranked, emb, k=5).collect()
    assert [r["doc_id"] for r in got] == [1]  # 7 has no vector
    empty = mmr_rerank(ranked.filter("doc_id = 0"), emb, k=5)
    assert empty.count() == 0
    assert dict(empty.dtypes)["doc_id"] == "bigint"
    with _pt.raises(ValueError):
        mmr_rerank(ranked, emb, lambda_=1.5)

def test_mmr_rerank_refuses_unbounded_candidates(spark):
    """The driver-side contract is ENFORCED: an over-cap candidate set
    refuses with guidance instead of silently collecting a corpus."""
    import pytest as _pt

    from local_pubchem_db_spark.operators.retrieval import mmr_rerank

    n = 30
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(n)],
        "doc_id long, embedding array<double>",
    )
    ranked = spark.createDataFrame(
        [(i, float(i)) for i in range(n)], "doc_id long, score double"
    )
    with _pt.raises(ValueError, match="max_candidates"):
        mmr_rerank(ranked, emb, k=3, max_candidates=10)
    # at or under the cap it works
    assert mmr_rerank(ranked, emb, k=3, max_candidates=n).count() == 3


def test_cost_ratio_host_fingerprint_staleness(spark, corpus, tmp_path):
    """r13 (round gap #2): the persisted cost_ratio is a host-bound
    measurement, so calibrate_cost_ratio pins the host fingerprint next
    to it and the consumers (load_service_index once per load,
    bm25_topk_auto's bare path once per call site) warn when the live
    host differs — while STILL using the ratio, since a different
    host's per-index measurement carries the corpus regime (doc length,
    tokenizer cost) that the third-party module constant lacks."""
    import warnings

    from local_pubchem_db_spark.operators import retrieval as R

    name = "t_ret_ratio_host_idx"
    _reset_index_tables(spark, name)
    loc = str(tmp_path / "corpus_host")
    corpus.write.parquet(loc)
    docs = spark.read.parquet(loc)
    try:
        p, d = R.build_postings(docs)
        R.save_postings(p, d, name, buckets=4, corpus_table=loc)
        R.calibrate_cost_ratio(spark, name, reps=1)
        meta = R.index_meta(spark, name)
        assert meta["cost_ratio_host"] == R._host_fingerprint()
        # same host: no staleness warning
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            R.load_service_index(spark, name)
        assert not [w for w in caught if "mispriced" in str(w.message)]
        # tamper the persisted host: both consumers warn, ratio still used
        R._write_stats_row(
            spark,
            name,
            {**meta, "cost_ratio_host": "elsewhere:armv9:512"},
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            R.load_service_index(spark, name)
        assert [w for w in caught if "mispriced" in str(w.message)]
        seen = {}
        orig = R.choose_bm25_route

        def spy(tdf_, n, terms, **kw):
            seen.update(kw)
            return orig(tdf_, n, terms, **kw)

        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            try:
                R.choose_bm25_route = spy
                R.bm25_topk_auto(spark, name, ["spark", "dog"], k=5).collect()
            finally:
                R.choose_bm25_route = orig
        assert [w for w in caught if "mispriced" in str(w.message)]
        assert seen.get("cost_ratio") == meta["cost_ratio"]  # still used
    finally:
        _reset_index_tables(spark, name)


def test_load_service_index_opt_in_recalibration(spark, corpus, tmp_path):
    """r14 (verdict Next #6): load_service_index(recalibrate=...) makes
    the stale-ratio warning actionable in-band. 'never' (default) only
    warns — the no-surprise contract; 'stale' + host mismatch runs the
    consent-gated calibrate_cost_ratio pass ONCE and re-pins
    cost_ratio/cost_ratio_host; 'stale' on a matching host does
    nothing; 'always' re-measures unconditionally; no corpus pointer
    degrades to the warning instead of failing the load."""
    import warnings

    from local_pubchem_db_spark.operators import retrieval as R

    name = "t_ret_recal_idx"
    _reset_index_tables(spark, name)
    loc = str(tmp_path / "corpus_recal")
    corpus.write.parquet(loc)
    docs = spark.read.parquet(loc)
    try:
        p, d = R.build_postings(docs)
        R.save_postings(p, d, name, buckets=4, corpus_table=loc)
        R.calibrate_cost_ratio(spark, name, reps=1)
        meta0 = R.index_meta(spark, name)
        stale = {**meta0, "cost_ratio_host": "elsewhere:armv9:512",
                 "cost_ratio": 999.0}
        R._write_stats_row(spark, name, stale)

        # default 'never': warns, persisted row untouched
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            *_idx, meta = R.load_service_index(spark, name)
        assert [w for w in caught if "mispriced" in str(w.message)]
        assert meta["cost_ratio"] == 999.0
        assert meta["cost_ratio_host"] == "elsewhere:armv9:512"

        # 'stale' + mismatch: one consented pass, row re-pinned, and
        # the returned meta carries the fresh values
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            *_idx, meta = R.load_service_index(
                spark, name, recalibrate="stale"
            )
        assert [w for w in caught if "consent-gated" in str(w.message)]
        assert meta["cost_ratio"] != 999.0 and meta["cost_ratio"] > 0
        assert meta["cost_ratio_host"] == R._host_fingerprint()
        persisted = R.index_meta(spark, name)
        assert persisted["cost_ratio"] == meta["cost_ratio"]

        # 'stale' again on the NOW-matching host: no pass, no warning
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            *_idx, meta2 = R.load_service_index(
                spark, name, recalibrate="stale"
            )
        assert not [w for w in caught if "consent-gated" in str(w.message)]
        assert meta2["cost_ratio"] == meta["cost_ratio"]

        # 'always': re-measures even on a matching host
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            *_idx, meta3 = R.load_service_index(
                spark, name, recalibrate="always"
            )
        assert [w for w in caught if "consent-gated" in str(w.message)]
        assert meta3["cost_ratio_host"] == R._host_fingerprint()

        # no corpus pointer: 'always' degrades to a skip warning, the
        # load still succeeds
        nop = {k: v for k, v in R.index_meta(spark, name).items()
               if k not in ("corpus_table", "corpus_id_col",
                            "corpus_text_col", "corpus_files")}
        R._write_stats_row(spark, name, nop)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            *_idx, meta4 = R.load_service_index(
                spark, name, recalibrate="always"
            )
        assert [w for w in caught
                if "recalibration skipped" in str(w.message)]

        import pytest as _pt

        with _pt.raises(ValueError, match="recalibrate"):
            R.load_service_index(spark, name, recalibrate="sometimes")
    finally:
        _reset_index_tables(spark, name)


def test_mmr_rerank_distributed_equals_driver_loop(spark):
    """r13 (round gap #4): the distributed MMR — k rounds of
    TakeOrdered top-1 over an incrementally maintained diversity
    column — selects the SAME documents in the SAME order with the
    same scores as the collected driver loop, at both lambda extremes
    and between, on a randomized candidate set large enough to have
    real structure. The candidate relation never leaves the cluster
    (no N x dim collect, no N^2 similarity matrix)."""
    import numpy as np

    from local_pubchem_db_spark.operators.retrieval import (
        mmr_rerank,
        mmr_rerank_distributed,
    )

    rng = np.random.default_rng(23)
    n, dim = 120, 16
    V = rng.standard_normal((n, dim))
    scores = rng.uniform(1, 9, n)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "doc_id long, embedding array<double>",
    )
    rk = spark.createDataFrame(
        [(i, float(scores[i])) for i in range(n)],
        "doc_id long, score double",
    )
    for lam in (1.0, 0.6, 0.0):
        want = (
            mmr_rerank(rk, emb, lambda_=lam, k=8, max_candidates=500)
            .orderBy("rank")
            .collect()
        )
        got = (
            mmr_rerank_distributed(rk, emb, lambda_=lam, k=8)
            .orderBy("rank")
            .collect()
        )
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], lam
        assert [r["rank"] for r in got] == [r["rank"] for r in want]
        np.testing.assert_allclose(
            [r["mmr_score"] for r in got],
            [r["mmr_score"] for r in want],
            atol=1e-12,
        )
    # k past the candidate count: returns everything, once
    small = rk.filter("doc_id < 3")
    out = mmr_rerank_distributed(small, emb, lambda_=0.5, k=50).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]
    # empty input -> empty typed frame; bad lambda raises
    assert (
        mmr_rerank_distributed(rk.filter("doc_id < 0"), emb, k=3).count()
        == 0
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="lambda_"):
        mmr_rerank_distributed(rk, emb, lambda_=-0.1)


def test_hybrid_topk_batch_equals_single_query_path(spark):
    """r14 (verdict Next #7): hybrid_topk_batch — B queries through
    BM25 + IVF-PQ + RRF with one postings probe, one PQ probe batch,
    one fused plan — must equal the single-query composition
    (with_rank(bm25_topk) + one-probe ivf_pq_search + rrf_fuse) per
    query: same doc sets, same ranks, same fused scores. Also pins
    rrf_fuse_batch == rrf_fuse per query on hand-made rankings,
    including the string-cast of heterogeneous query-id types."""
    import numpy as np

    from local_pubchem_db_spark.operators import retrieval as R
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import (
        ivf_pq_search,
        pq_encode,
        pq_fit,
    )

    # corpus: DOCS text + synthetic row-aligned embeddings
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rng = np.random.default_rng(67)
    n = len(DOCS)
    V = rng.standard_normal((n, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    p, d = R.build_postings(docs)
    row = d.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")).first()
    n_docs, avgdl = int(row["n"]), float(row["a"])
    centroids = kmeans_fit(emb, k=3, max_iter=8)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    cb = pq_fit(assigned, m=2, k=4, centroids=centroids)
    encoded = pq_encode(assigned, cb, centroids=centroids)

    queries = {
        "0": ["spark", "shuffle"],
        "1": ["dog", "lazy"],
        "2": ["vector", "stream", "hash"],
    }
    probes = emb.filter(F.col("vec_id").isin([0, 1, 2]))

    got = R.hybrid_topk_batch(
        p, d, queries, encoded, probes, centroids, cb,
        k_lex=5, k_vec=5, top_n=4, n_docs=n_docs, avgdl=avgdl,
        nprobe=3, residual=True,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(queries)
    for qid, terms in queries.items():
        lex = R.with_rank(
            R.bm25_topk(p, d, terms, k=5, n_docs=n_docs, avgdl=avgdl),
            F.desc("score"), F.asc("doc_id"),
        ).select("doc_id", "rank")
        vec = ivf_pq_search(
            encoded, emb.filter(F.col("vec_id") == int(qid)),
            centroids, cb, k=5, nprobe=3, residual=True,
        ).select(F.col("neighbor_id").alias("doc_id"), "rank")
        want = R.rrf_fuse([lex, vec], top_n=4).orderBy("rank").collect()
        have = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in have] == [r["doc_id"] for r in want], qid
        np.testing.assert_allclose(
            [r["rrf_score"] for r in have],
            [r["rrf_score"] for r in want],
            rtol=0, atol=1e-15,
        )

    # rrf_fuse_batch == rrf_fuse per query on hand-made rankings with a
    # LONG query id on one side (string-cast contract)
    lex_b = spark.createDataFrame(
        [("7", 10, 1), ("7", 11, 2), ("8", 12, 1)],
        "query_id string, doc_id long, rank long",
    )
    vec_b = spark.createDataFrame(
        [(7, 11, 1), (7, 13, 2), (8, 12, 1)],
        "query_id long, doc_id long, rank long",
    )
    fused = R.rrf_fuse_batch([lex_b, vec_b], top_n=3).collect()
    for qid in ("7", "8"):
        want = R.rrf_fuse(
            [
                lex_b.filter(F.col("query_id") == qid).drop("query_id"),
                vec_b.filter(F.col("query_id").cast("string") == qid)
                .drop("query_id"),
            ],
            top_n=3,
        ).orderBy("rank").collect()
        have = sorted(
            (r for r in fused if r["query_id"] == qid),
            key=lambda r: r["rank"],
        )
        assert [(r["doc_id"], r["rank"]) for r in have] == [
            (r["doc_id"], r["rank"]) for r in want
        ]
        np.testing.assert_allclose(
            [r["rrf_score"] for r in have],
            [r["rrf_score"] for r in want],
            rtol=0, atol=1e-15,
        )


def test_mmr_variants_agree_on_null_candidates(spark):
    """ADVICE r13 (low): null-id / null-score candidates are dropped in
    the shared _mmr_candidates helper, so BOTH variants see the same
    candidate set — previously the driver loop raised on float(None)
    while the distributed loop silently sorted the null-score row last
    and silently dropped null-id rows from the exclusion filter. Both
    variants must equal each other AND the clean-input result."""
    import numpy as np

    from local_pubchem_db_spark.operators.retrieval import (
        mmr_rerank,
        mmr_rerank_distributed,
    )

    rng = np.random.default_rng(31)
    n, dim = 40, 8
    V = rng.standard_normal((n, dim))
    scores = rng.uniform(1, 9, n)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "doc_id long, embedding array<double>",
    )
    clean = spark.createDataFrame(
        [(i, float(scores[i])) for i in range(n)],
        "doc_id long, score double",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, 99.0), (7_777, None), (None, None)],
            "doc_id long, score double",
        )
    )
    want = mmr_rerank(
        clean, emb, lambda_=0.6, k=6, max_candidates=500
    ).orderBy("rank").collect()
    for fn, kw in (
        (mmr_rerank, {"max_candidates": 500}),
        (mmr_rerank_distributed, {}),
    ):
        got = fn(dirty, emb, lambda_=0.6, k=6, **kw).orderBy(
            "rank"
        ).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
        np.testing.assert_allclose(
            [r["mmr_score"] for r in got],
            [r["mmr_score"] for r in want],
            atol=1e-12,
        )


def test_recalibration_degrades_to_warning_on_moved_corpus(spark, corpus, tmp_path):
    """ADVICE r14: a corpus whose path was deleted/moved after the save
    raises AnalysisException (not ValueError) inside the calibration
    pass — recalibrate='always'/'stale' must still degrade to the skip
    warning instead of failing a load that succeeds with 'never'."""
    import shutil
    import warnings

    from local_pubchem_db_spark.operators import retrieval as R

    name = "t_ret_recal_moved"
    _reset_index_tables(spark, name)
    loc = str(tmp_path / "corpus_moved")
    corpus.write.parquet(loc)
    docs = spark.read.parquet(loc)
    try:
        p, d = R.build_postings(docs)
        R.save_postings(p, d, name, buckets=4, corpus_table=loc)
        shutil.rmtree(loc)  # operator moved/cleaned the corpus dir
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            *idx, meta = R.load_service_index(
                spark, name, recalibrate="always"
            )
        assert [w for w in caught
                if "recalibration skipped" in str(w.message)]
        # the load itself succeeded: full 4-tuple index + the meta row
        assert len(idx) == 4 and meta.get("corpus_table") == loc
    finally:
        _reset_index_tables(spark, name)


def test_write_stats_row_skips_orphan_delete_when_staged_known(spark, corpus):
    """ADVICE r14: _write_stats_row must capture tableExists(staged)
    BEFORE the DROP — a catalog-known staged table is fully cleaned by
    its own DROP, so the orphan-directory Hadoop delete runs only for
    a crash-stranded directory with no catalog entry."""
    from local_pubchem_db_spark.operators import retrieval as R

    name = "t_ret_stats_known"
    _reset_index_tables(spark, name)
    try:
        p, d = R.build_postings(corpus)
        R.save_postings(p, d, name, buckets=4)
        meta = R.index_meta(spark, name)

        calls = []
        orig = R._hadoop_delete

        def counting(spark_, uri):
            calls.append(str(uri))
            return orig(spark_, uri)

        R._hadoop_delete = counting
        try:
            # leave a catalog-known staged table behind, then rewrite:
            # the DROP cleans it; no orphan delete may fire
            staged = f"{name}_stats__staged"
            spark.createDataFrame([(1,)], "x int").write.mode(
                "overwrite"
            ).saveAsTable(staged)
            R._write_stats_row(spark, name, meta)
            assert not [c for c in calls if "stats__staged" in c], calls

            # no staged table at all: the orphan delete DOES run
            calls.clear()
            R._write_stats_row(spark, name, meta)
            assert [c for c in calls if "stats__staged" in c]
        finally:
            R._hadoop_delete = orig
    finally:
        _reset_index_tables(spark, name)


def test_rrf_fuse_plans_no_join_no_sort(spark):
    """r15: the fusion is a union + grouped aggregation — the physical
    plan must contain NO join and NO sort-merge machinery (the previous
    full-outer join chain planned a SortMergeJoin: two exchanges plus
    two sorts over k-row relations, and at 3+ modalities a join per
    input). Three rankings also exercises the singleton-addend
    bit-exactness path beyond the two-input oracle twin."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.retrieval import (
        rrf_fuse,
        rrf_fuse_batch,
    )

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    c = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rank long")
    fused = rrf_fuse([a, b, c], k=60, top_n=10)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "SortMergeJoin" not in plan
    # reference scores: fixed-order coalesce sum over the three terms
    def term(rank):
        return 1.0 / (60.0 + float(rank))

    want = {
        1: term(1) + 0.0 + term(1),
        2: term(2) + term(1) + 0.0,
        3: 0.0 + term(2) + term(2),
    }
    got = {r["doc_id"]: r["rrf_score"] for r in fused.collect()}
    assert got == want  # bit-exact, not approx

    qa = a.withColumn("query_id", F.lit("q"))
    qb = b.withColumn("query_id", F.lit("q"))
    fused_b = rrf_fuse_batch([qa, qb], k=60, top_n=10)
    plan_b = fused_b._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan_b
    got_b = {r["doc_id"]: r["rrf_score"] for r in fused_b.collect()}
    assert got_b == {
        1: term(1) + 0.0,
        2: term(2) + term(1),
        3: 0.0 + term(2),
    }
