"""Distributed PCA vs an exact numpy oracle, plus partitioning
invariance and composition with the similarity operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.clustering import pca_fit, pca_transform


def _np_pca(X, k):
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / len(X)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:k]
    return mean, eigvec[:, order].T, eigval[order]


def test_pca_matches_numpy_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    X = np.array(
        [r["embedding"] for r in emb.select("embedding").orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    k = 3
    mean, comps, var = pca_fit(emb, "embedding", k=k)
    want_mean, want_comps, want_var = _np_pca(X, k)

    assert np.allclose(mean, want_mean, atol=1e-9)
    assert np.allclose(var, want_var, atol=1e-9)
    # eigenvectors are sign-ambiguous: compare up to per-row sign
    for i in range(k):
        a, b = comps[i], want_comps[i]
        assert np.allclose(a, b, atol=1e-8) or np.allclose(a, -b, atol=1e-8), i
    # components orthonormal
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)


def test_pca_partitioning_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m1, c1, v1 = pca_fit(emb, "embedding", k=2)
    m2, c2, v2 = pca_fit(emb.repartition(17), "embedding", k=2)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(v1, v2, atol=1e-9)
    assert np.allclose(c1, c2, atol=1e-8)  # sign pinned by the flip rule


def test_pca_transform_projects_and_composes(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mean, comps, var = pca_fit(emb, "embedding", k=2)
    out = pca_transform(emb, mean, comps, "embedding", "pca")
    rows = out.select("vec_id", "embedding", "pca").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    P = np.array([r["pca"] for r in rows], dtype=np.float64)
    assert P.shape == (len(X), 2)
    assert np.allclose(P, (X - mean) @ comps.T, atol=1e-9)
    # projected variance per axis equals the eigenvalues
    assert np.allclose(P.var(axis=0), var, atol=1e-8)
    # variance ordering: axis 0 explains the most
    assert var[0] >= var[1] >= 0


def test_pca_errors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        pca_fit(df, "embedding", k=5)
    with pytest.raises(ValueError, match="empty"):
        pca_fit(df.filter(F.col("vec_id") > 10), "embedding", k=1)


def test_pca_whitening_unit_variance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mean, comps, var = pca_fit(emb, "embedding", k=2)
    white = pca_transform(emb, mean, comps, "embedding", "w", explained_var=var)
    W = np.array([r["w"] for r in white.select("w").collect()], dtype=np.float64)
    assert np.allclose(W.var(axis=0), 1.0, atol=1e-6)
    assert np.allclose(W.mean(axis=0), 0.0, atol=1e-9)
