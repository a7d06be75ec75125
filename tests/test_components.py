"""connected_components / dedup_keep_ids vs an independent union-find."""

import random

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.dedup import (
    connected_components,
    dedup_keep_ids,
    minhash_lsh_dedup_pairs,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical rep = min id per component
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for rep, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 15), (2, 50, 60), (3, 12, 40)])
def test_components_match_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    pairs = [
        tuple(sorted(rng.sample(range(n_nodes), 2))) for _ in range(n_edges)
    ]
    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    got = {r["id"]: r["rep"] for r in connected_components(df).collect()}
    assert got == _union_find(pairs)


def test_components_path_graph_converges(spark):
    # a path 0-1-2-...-9: worst-case diameter for the propagation
    pairs = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    got = {r["id"]: r["rep"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(10)}


def test_components_raise_past_max_iter(spark):
    pairs = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_dedup_keep_ids_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
    kept = dedup_keep_ids(docs, pairs, "doc_id")
    pair_rows = [(r["id1"], r["id2"]) for r in pairs.collect()]
    reps = _union_find(pair_rows)
    want_dropped = {x for x, m in reps.items() if x != m}
    got_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert got_ids == all_ids - want_dropped
    assert want_dropped, "fixture lost its near-dups"


def test_dedup_keep_ids_quality_mode(spark):
    """quality_col keeps the best-scoring member per component (ties →
    min id); unpaired rows and null-quality members behave sanely."""
    docs = spark.createDataFrame(
        [
            (1, 0.2),  # comp A
            (2, 0.9),  # comp A — best, survives
            (3, 0.9),  # comp A — tie with 2, higher id, dropped
            (10, None),  # comp B — null quality loses to any value
            (11, -5.0),  # comp B — survives
            (20, 0.0),  # unpaired — survives untouched
        ],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    kept = dedup_keep_ids(docs, pairs, "doc_id", quality_col="q")
    assert {r["doc_id"] for r in kept.collect()} == {2, 11, 20}
    # default mode on the same inputs keeps min ids instead
    kept_min = dedup_keep_ids(docs, pairs, "doc_id")
    assert {r["doc_id"] for r in kept_min.collect()} == {1, 10, 20}


def test_dedup_keep_ids_quality_all_null_falls_back_to_min_id(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, q double"
    )
    pairs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    kept = dedup_keep_ids(docs, pairs, "doc_id", quality_col="q")
    assert {r["doc_id"] for r in kept.collect()} == {1}
