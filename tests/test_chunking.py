"""Chunking operator: window/stride semantics and edge cases."""

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.chunking import chunk_documents


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, **kw).orderBy("doc_id", "chunk_id").collect()
    return [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out]


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, [(1, "a b c")], chunk_size=4, stride=3)
    assert got == [(1, 0, 3, "a b c")]


def test_overlap_windows(spark):
    # 7 tokens, size 4, stride 2 -> starts 0,2,4,6
    text = "t0 t1 t2 t3 t4 t5 t6"
    got = _chunks(spark, [(1, text)], chunk_size=4, stride=2)
    assert got == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t2 t3 t4 t5"),
        (1, 2, 3, "t4 t5 t6"),
        (1, 3, 1, "t6"),
    ]


def test_exact_boundary_no_empty_tail(spark):
    # 4 tokens, size 2, stride 2 -> exactly two full chunks, no empty third
    got = _chunks(spark, [(1, "a b c d")], chunk_size=2, stride=2)
    assert got == [(1, 0, 2, "a b"), (1, 1, 2, "c d")]


def test_empty_doc_dropped(spark):
    got = _chunks(spark, [(1, ""), (2, "x")], chunk_size=2, stride=2)
    assert got == [(2, 0, 1, "x")]


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_pack_sequences_single_partition_matches_greedy(spark):
    from local_pubchem_db_spark.operators.chunking import pack_sequences

    lens = [10, 20, 5, 90, 7, 60, 41, 1, 1, 100, 30]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
    ).coalesce(1)
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, max_tokens=100).collect()
    }
    # independent greedy first-fit in id order
    want, pack, acc = {}, 0, 0
    for i, n in enumerate(lens):
        if acc and acc + n > 100:
            pack, acc = pack + 1, 0
        acc += n
        want[i] = pack
    # pack ids may carry a partition prefix; compare the grouping they induce
    def groups(m):
        g = {}
        for k, v in sorted(m.items()):
            g.setdefault(v, []).append(k)
        return sorted(g.values())
    assert groups(got) == groups(want)


def test_pack_sequences_respects_budget_and_covers_all(spark, sf_dir):
    from local_pubchem_db_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_documents(docs, chunk_size=32, stride=24).select(
        F.monotonically_increasing_id().alias("doc_id"), "n_tokens"
    )
    n_rows = chunks.count()
    packed = pack_sequences(chunks, max_tokens=64)
    assert packed.count() == n_rows  # every chunk assigned exactly once
    sums = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("k")
    )
    over = sums.filter((F.col("tot") > 64) & (F.col("k") > 1)).count()
    assert over == 0  # budget violated only by single oversized rows
    # packing efficiency: multi-row packs should be mostly full
    stats = sums.agg(F.avg("tot").alias("avg")).collect()[0]
    assert stats["avg"] > 32


def test_pack_sequences_null_tokens_fail_fast(spark):
    from local_pubchem_db_spark.operators.chunking import pack_sequences

    docs = spark.createDataFrame(
        [(1, 10), (2, None), (3, 4)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="null n_tokens"):
        pack_sequences(docs, 16).collect()
