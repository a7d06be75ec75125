"""Chunking operator: window/stride semantics and edge cases."""

import pytest

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
