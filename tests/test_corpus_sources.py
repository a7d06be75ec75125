"""Raw-corpus readers: JSONL (+gz), CSV, one-doc-per-file directories —
each normalized to (doc_id, text, source) and composable with the dedup
operators."""

import gzip
import json
import os

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.dedup import exact_dedup_by_content
from local_pubchem_db_spark.sources.corpus import (
    read_csv_corpus,
    read_jsonl_corpus,
    read_text_dir_corpus,
)

DOCS = [
    {"id": "1", "text": "alpha beta gamma", "junk": {"nested": True}},
    {"id": "2", "text": "delta epsilon zeta"},
    {"id": "3", "text": "alpha beta gamma"},  # exact dup of 1
]


def test_jsonl_roundtrip_and_gz(spark, tmp_path):
    plain = tmp_path / "corpus.jsonl"
    plain.write_text("\n".join(json.dumps(d) for d in DOCS))
    gz = tmp_path / "corpus2.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        for d in DOCS:
            f.write(json.dumps(d) + "\n")

    for p in (str(plain), str(gz)):
        df = read_jsonl_corpus(spark, p, id_field="id")
        rows = {r["doc_id"]: r["text"] for r in df.collect()}
        assert rows == {
            1: "alpha beta gamma",
            2: "delta epsilon zeta",
            3: "alpha beta gamma",
        }
        assert df.columns == ["doc_id", "text", "source"]


def test_jsonl_derived_ids_are_stable_and_content_keyed(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in DOCS))
    a = read_jsonl_corpus(spark, str(p)).collect()
    b = read_jsonl_corpus(spark, str(p)).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    ids_by_text = {}
    for r in a:
        ids_by_text.setdefault(r["text"], set()).add(r["doc_id"])
    # identical text -> identical derived id (the dedup-pipeline semantic)
    assert all(len(s) == 1 for s in ids_by_text.values())
    assert len(ids_by_text) == 2


def test_csv_corpus(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("id,text\n7,hello world\n8,goodbye moon\n")
    rows = {
        r["doc_id"]: r["text"]
        for r in read_csv_corpus(spark, str(p), id_field="id").collect()
    }
    assert rows == {7: "hello world", 8: "goodbye moon"}


def test_text_dir_corpus_feeds_dedup(spark, tmp_path):
    d = tmp_path / "articles"
    d.mkdir()
    (d / "a.txt").write_text("the first article body")
    (d / "b.txt").write_text("the second article body")
    (d / "c.txt").write_text("the first article body")  # dup of a
    df = read_text_dir_corpus(spark, str(d))
    assert df.count() == 3
    assert df.select("doc_id").distinct().count() == 3  # path-keyed ids
    groups = exact_dedup_by_content(df, "doc_id", "text")
    counts = sorted(r["dup_count"] for r in groups.collect())
    assert counts == [1, 2]

    # ids stable across a re-read
    again = {r["doc_id"] for r in read_text_dir_corpus(spark, str(d)).collect()}
    assert again == {r["doc_id"] for r in df.collect()}


def test_jsonl_string_ids_hash_instead_of_nulling(spark, tmp_path):
    # Non-numeric ids (UUIDs, slugs) must become distinct deterministic
    # hashes — the old cast-to-long produced NULL for every such row,
    # merging the whole corpus under one id.
    docs = [
        {"id": "doc-alpha", "text": "first body of text"},
        {"id": "doc-beta", "text": "second body of text"},
        {"id": "42", "text": "numeric-string id keeps its value"},
    ]
    p = tmp_path / "s.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    rows = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(
        spark, str(p), id_field="id"
    ).collect()}
    assert len(set(rows.values())) == 3
    assert all(v is not None for v in rows.values())
    assert rows["numeric-string id keeps its value"] == 42
    # deterministic across re-reads
    again = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(
        spark, str(p), id_field="id"
    ).collect()}
    assert again == rows


def test_jsonl_string_ids_flow_through_split(spark, tmp_path):
    from local_pubchem_db_spark.operators.sampling import hash_split

    docs = [{"id": f"slug-{i}", "text": f"document body number {i} with words"}
            for i in range(30)]
    p = tmp_path / "h.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    corpus = read_jsonl_corpus(spark, str(p), id_field="id")
    split = hash_split(corpus, "doc_id", {"train": 0.8, "val": 0.2})
    got = split.collect()
    assert len(got) == 30
    assert {r["split"] for r in got} <= {"train", "val"}


def test_jsonl_null_id_raises(spark, tmp_path):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    p = tmp_path / "n.jsonl"
    p.write_text(json.dumps({"id": None, "text": "orphan row"}))
    with pytest.raises(SparkRuntimeException, match="null id"):
        read_jsonl_corpus(spark, str(p), id_field="id").collect()


def test_jsonl_non_roundtripping_numeric_strings_stay_distinct(spark, tmp_path):
    # '007' parses to 7 but does not round-trip — keeping the numeric
    # value would silently merge it with a genuine id 7. Both must
    # survive as distinct documents.
    docs = [
        {"id": "7", "text": "the canonical seven"},
        {"id": "007", "text": "the zero padded impostor"},
        {"id": "+7", "text": "the signed variant"},
        {"id": " 7", "text": "the padded variant"},
    ]
    p = tmp_path / "pad.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    rows = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(
        spark, str(p), id_field="id"
    ).collect()}
    assert len(rows) == 4
    assert len(set(rows.values())) == 4, rows
    assert rows["the canonical seven"] == 7  # round-trips -> keeps value


def test_read_orc_corpus_roundtrip_and_pruning(spark, tmp_path):
    from local_pubchem_db_spark.sources.corpus import read_orc_corpus

    src = spark.createDataFrame(
        [(1, "alpha doc", "x"), (2, "beta doc", "y"), (3, "gamma doc", "z")],
        "my_id long, body string, extra string",
    )
    p = str(tmp_path / "corpus_orc")
    src.write.orc(p)
    docs = read_orc_corpus(spark, p, text_field="body", id_field="my_id")
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows == {1: "alpha doc", 2: "beta doc", 3: "gamma doc"}
    assert set(docs.columns) == {"doc_id", "text", "source"}
    # the unrequested column never reaches the plan
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "extra" not in plan
