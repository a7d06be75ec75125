"""int8 embedding quantization: accuracy + rank-preservation properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.functions.vectors import dequantize, quantize_udf


@pytest.fixture(scope="module")
def quantized(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id", "embedding", quantize_udf()(F.col("embedding")).alias("q")
    ).select("vec_id", "embedding", "q.qvec", "q.scale")


def test_quantize_roundtrip_error_bounded(quantized):
    rows = quantized.select(
        "embedding", dequantize(F.col("qvec"), F.col("scale")).alias("deq")
    ).collect()
    assert rows
    for r in rows:
        x = np.asarray(list(r["embedding"]), dtype=np.float64)
        d = np.asarray(list(r["deq"]), dtype=np.float64)
        # symmetric int8: per-component error <= scale/2 = max|x|/254
        assert np.max(np.abs(x - d)) <= np.max(np.abs(x)) / 254.0 + 1e-12


def test_quantized_cosine_close_to_exact(quantized):
    rows = quantized.collect()
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    D = np.array(
        [np.asarray(list(r["qvec"]), dtype=np.float64) * r["scale"] for r in rows]
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Dn = D / np.linalg.norm(D, axis=1, keepdims=True)
    # pairwise cosine agreement on a sample of pairs
    sims_x = Xn[:50] @ Xn[50:100].T
    sims_d = Dn[:50] @ Dn[50:100].T
    assert np.max(np.abs(sims_x - sims_d)) < 0.02


def test_quantized_topk_recall(quantized):
    rows = quantized.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    D = np.array(
        [np.asarray(list(r["qvec"]), dtype=np.float64) * r["scale"] for r in rows]
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Dn = D / np.linalg.norm(D, axis=1, keepdims=True)
    hits = total = 0
    for qi in range(10):
        exact = set(ids[np.argsort(-(Xn @ Xn[qi]))[1:11]])
        quant = set(ids[np.argsort(-(Dn @ Dn[qi]))[1:11]])
        hits += len(exact & quant)
        total += 10
    assert hits / total >= 0.9, f"quantized recall@10 collapsed: {hits}/{total}"


def test_quantize_edge_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1e-30, -1e-30]), (3, None)],
        "id long, v array<double>",
    )
    rows = {
        r["id"]: r
        for r in df.select("id", quantize_udf()(F.col("v")).alias("q"))
        .select("id", "q.qvec", "q.scale")
        .collect()
    }
    assert list(rows[1]["qvec"]) == [0, 0] and rows[1]["scale"] == 1.0
    assert rows[3]["qvec"] is None
