"""SRP-LSH (random hyperplane) embedding near-dup: oracle = brute-force
float64 cosine over all pairs. Precision must be exactly 1.0 (candidates
are exact-verified with the same arithmetic); recall is bounded by the
banding math and pinned loosely here (deterministic under the fixed
seed)."""

import numpy as np
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.similarity import srp_lsh_neardup_pairs


def _true_pairs(rows, threshold):
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    Vn = V / n
    S = Vn @ Vn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = S[iu, ju] >= threshold
    out = set()
    for i, j in zip(ids[iu[keep]], ids[ju[keep]]):
        out.add((min(int(i), int(j)), max(int(i), int(j))))
    return out


def test_srp_lsh_exact_precision_and_high_recall(spark, sf_dir):
    # The testdata blobs top out at cosine ~0.48, so the test runs the
    # low-threshold regime: 2 sign bits per band x 32 bands gives
    # P[miss a 0.4-pair] = (1 - 0.631^2)^32 ~ 1e-7 (0.631 = 1 - theta/pi
    # at theta = arccos 0.4). The 0.8-regime defaults are exercised by the
    # banding math itself — same code path, different constants.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        (r["id1"], r["id2"])
        for r in srp_lsh_neardup_pairs(
            emb, threshold=0.4, n_bits=64, bands=32
        ).collect()
    }
    want = _true_pairs(emb.select("vec_id", "embedding").collect(), 0.4)
    assert len(want) == 66  # pinned from the testdata
    # precision 1.0: every emitted pair is exact-verified
    assert got <= want, f"false positives: {sorted(got - want)[:5]}"
    # recall ~1 in this regime; deterministic under the fixed seed
    assert len(got) >= 0.95 * len(want), f"{len(got)}/{len(want)}"


def test_srp_lsh_rejects_bad_banding(spark):
    import pytest

    df = spark.range(1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="bands must divide n_bits"):
        srp_lsh_neardup_pairs(df, n_bits=100, bands=16)
