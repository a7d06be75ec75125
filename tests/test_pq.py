"""Product quantization: deterministic fit, reconstruction-error
ordering, and ADC recall against the exact kNN oracle — on both the
near-uniform testdata (PQ's hardest case: no cluster structure, tiny
neighbor margins) and a clustered corpus (the realistic embedding
shape PQ is built for)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_knn,
    pq_reconstruct,
)
from local_pubchem_db_spark.operators.similarity import brute_force_knn


def test_pq_fit_deterministic_and_validates(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = pq_fit(emb, m=8, k=16)
    b = pq_fit(emb.repartition(13), m=8, k=16)
    assert a.shape == (8, 16, 8)  # dim 64 / m 8
    assert np.array_equal(a, b)  # hash-ordered sample → identical fit

    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, m=7, k=16)
    with pytest.raises(ValueError, match="empty"):
        pq_fit(emb.filter(F.col("vec_id") < 0), m=8, k=16)
    with pytest.raises(ValueError, match="k >= 2"):
        pq_fit(emb, m=8, k=1)


def test_pq_reconstruction_error_shrinks_with_m(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.limit(300).collect()
    V = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    mse = {}
    for m in (2, 8, 16):
        cb = pq_fit(emb, m=m, k=16)
        enc = pq_encode(emb.limit(300), cb).collect()
        codes = np.array([list(r["pq_code"]) for r in enc])
        assert codes.min() >= 0 and codes.max() < 16
        R = pq_reconstruct(codes, cb)
        mse[m] = float(((R - Vn) ** 2).mean())
    assert mse[2] > mse[8] > mse[16]  # finer partition → lower error
    assert mse[16] < 0.01


def test_pq_knn_recall_uniform_corpus(spark, sf_dir):
    """Near-uniform random vectors (testdata): the hardest regime. At
    m=32/k=64 (dsub=2 — near-lossless subspaces) ADC must recover most
    of the exact top-5. Observed 0.82; pinned at 0.70 (the fit is
    deterministic, so drift means a code change, not sampling noise)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 30)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_knn(emb, queries, k=5).collect()
    }
    cb = pq_fit(emb, m=32, k=64)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_knn(pq_encode(emb, cb), queries, cb, k=5).collect()
    }
    assert len(exact) == 150
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.70, recall


def test_pq_knn_recall_clustered_corpus(spark):
    """The realistic shape: 40 well-separated clusters of 25 near-dup
    members. Even at the aggressive m=8/k=16 compression (4 bits/dim ->
    8 ints per 32-dim vector) ADC retrieval must stay within-cluster."""
    rng = np.random.default_rng(3)
    dim, n_clusters, per = 32, 40, 25
    rows = []
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for i in range(per):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((c * 1000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_fit(emb, m=8, k=16)
    enc = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") % 1000 == 0)  # one per cluster
    got = pq_knn(enc, queries, cb, k=5).collect()
    assert len(got) == n_clusters * 5
    within = sum(
        1 for r in got if r["neighbor_id"] // 1000 == r["query_id"] // 1000
    )
    assert within / len(got) >= 0.95, within / len(got)


def test_pq_encode_partitioning_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_fit(emb, m=8, k=16)
    a = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, cb).select("vec_id", "pq_code").collect()
    }
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb.repartition(13), cb)
        .select("vec_id", "pq_code")
        .collect()
    }
    assert a == b


def test_residual_encoding_tightens_quantization(spark):
    """Residual-mode PQ (Jégou et al. IVF-PQ): at EQUAL m, codebooks
    trained on x - centroid(cell) must reconstruct better than raw-vector
    codebooks on a clustered corpus, and residual-mode ivf_pq_search must
    retrieve within-cluster at >= 0.98 without regressing the raw path."""
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import ivf_pq_search

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 32, 12, 40
    rows = []
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for i in range(per):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((c * 1000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = kmeans_fit(emb, k=n_clusters, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )

    # reconstruction error at equal m: residual strictly tighter
    cb_raw = pq_fit(emb, m=8, k=16)
    cb_res = pq_fit(assigned, m=8, k=16, centroids=centroids)
    sample = assigned.orderBy("vec_id").limit(300).collect()
    V = np.array([list(r["embedding"]) for r in sample], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cells = np.array([r["cluster"] for r in sample], dtype=np.int64)
    enc_raw = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(assigned, cb_raw).collect()
    }
    enc_res = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(assigned, cb_res, centroids=centroids).collect()
    }
    ids = [r["vec_id"] for r in sample]
    R_raw = pq_reconstruct(np.array([enc_raw[i] for i in ids]), cb_raw)
    R_res = pq_reconstruct(
        np.array([enc_res[i] for i in ids]), cb_res, centroids, cells
    )
    mse_raw = float(((R_raw - Vn) ** 2).mean())
    mse_res = float(((R_res - Vn) ** 2).mean())
    assert mse_res < mse_raw, (mse_res, mse_raw)

    # retrieval: residual search >= 0.98 within-cluster, >= raw path
    enc_res_df = pq_encode(assigned, cb_res, centroids=centroids)
    queries = emb.filter(F.col("vec_id") % 1000 == 0)

    def within_rate(res_df):
        got = res_df.collect()
        assert len(got) == n_clusters * 5
        return (
            sum(
                1
                for r in got
                if r["neighbor_id"] // 1000 == r["query_id"] // 1000
            )
            / len(got)
        )

    rate_res = within_rate(
        ivf_pq_search(
            enc_res_df, queries, centroids, cb_res, k=5, nprobe=2,
            residual=True,
        )
    )
    rate_raw = within_rate(
        ivf_pq_search(
            pq_encode(assigned, cb_raw), queries, centroids, cb_raw,
            k=5, nprobe=2,
        )
    )
    assert rate_res >= 0.98, (rate_res, rate_raw)
    assert rate_res >= rate_raw, (rate_res, rate_raw)


def test_ivf_pq_rerank_recovers_exact_ordering(spark):
    """rerank=R: ADC proposes R candidates, exact cosine on raw vectors
    re-orders them. With R covering the probed cells the result must
    EQUAL exact IVF search (same centroids/nprobe) even under aggressive
    compression where plain ADC misranks; rerank must never do worse
    than no rerank."""
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        ivf_search,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import ivf_pq_search

    rng = np.random.default_rng(17)
    dim, n_clusters, per = 32, 8, 30
    rows = []
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for i in range(per):
            v = base + 0.08 * rng.standard_normal(dim)
            rows.append((c * 1000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = kmeans_fit(emb, k=n_clusters, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    # brutal compression: m=4 over dim 32 (8 dims/subspace, 8 centroids)
    cb = pq_fit(assigned, m=4, k=8, centroids=centroids)
    enc = pq_encode(assigned, cb, centroids=centroids)
    queries = emb.filter(F.col("vec_id") % 1000 == 0)

    exact_ivf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_search(emb, queries, centroids, k=5, nprobe=2).collect()
    }
    reranked = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_pq_search(
            enc, queries, centroids, cb, k=5, nprobe=2, residual=True,
            rerank=2 * per,  # covers both probed cells entirely
        ).collect()
    }
    assert reranked == exact_ivf

    # partial rerank still >= plain ADC on exact-top-5 agreement
    plain = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_pq_search(
            enc, queries, centroids, cb, k=5, nprobe=2, residual=True
        ).collect()
    }
    partial = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_pq_search(
            enc, queries, centroids, cb, k=5, nprobe=2, residual=True,
            rerank=15,
        ).collect()
    }
    exact_pairs = {(q, n) for q, n, _ in exact_ivf}
    assert len(partial & exact_pairs) >= len(plain & exact_pairs)

    with pytest.raises(ValueError, match="rerank"):
        ivf_pq_search(
            enc, queries, centroids, cb, k=5, nprobe=2, rerank=3
        )


def test_ivf_pq_search_recall_and_partition_pruning(spark, tmp_path):
    """The composed IVF-PQ path on a clustered corpus: a kmeans coarse
    quantizer + cluster-partitioned PQ codes on disk. Pins (a) retrieval
    stays within-cluster at high rate, (b) the probed-cells filter
    reaches the scan as a PARTITION filter — unprobed cells cost zero
    I/O, the reason this layout works at 100 TB."""
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import ivf_pq_search

    rng = np.random.default_rng(5)
    dim, n_clusters, per = 32, 12, 40
    rows = []
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for i in range(per):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((c * 1000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    centroids = kmeans_fit(emb, k=n_clusters, max_iter=10)
    cb = pq_fit(emb, m=8, k=16)
    enc = (
        pq_encode(emb, cb)
        .join(assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
              "vec_id")
    )
    out = str(tmp_path / "ivfpq")
    enc.write.partitionBy("cluster").parquet(out)
    stored = spark.read.parquet(out)

    queries = emb.filter(F.col("vec_id") % 1000 == 0)
    res = ivf_pq_search(stored, queries, centroids, cb, k=5, nprobe=2)

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters", 1)[1][:300], plan

    got = res.collect()
    assert len(got) == n_clusters * 5
    within = sum(
        1 for r in got if r["neighbor_id"] // 1000 == r["query_id"] // 1000
    )
    assert within / len(got) >= 0.9, within / len(got)


def test_opq_rotation_tightens_quantization_on_correlated_data(spark):
    """OPQ (Ge et al. 2013): on correlated embeddings (decaying spectrum
    mixed through a random rotation) the learned orthogonal R must cut
    reconstruction error vs plain PQ at equal (m, k), and OPQ-ADC
    retrieval must not lose recall."""
    from local_pubchem_db_spark.operators.pq import opq_fit
    from local_pubchem_db_spark.operators.similarity import brute_force_knn

    rng = np.random.default_rng(23)
    dim, n = 32, 1200
    # decaying spectrum -> a few dominant directions; random orthogonal
    # mixing spreads them across ALL coordinates, so contiguous PQ
    # subspaces see unbalanced, correlated energy
    spectrum = np.exp(-np.arange(dim) / 4.0)
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    V = (rng.standard_normal((n, dim)) * spectrum) @ Q.T
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )

    cb_pq = pq_fit(emb, m=8, k=16)
    R, cb_opq = opq_fit(emb, m=8, k=16)
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-8)  # orthogonal

    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    enc_pq = {
        r["vec_id"]: list(r["pq_code"]) for r in pq_encode(emb, cb_pq).collect()
    }
    enc_opq = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, cb_opq, rotation=R).collect()
    }
    ids = list(range(n))
    R_pq = pq_reconstruct(np.array([enc_pq[i] for i in ids]), cb_pq)
    R_opq = pq_reconstruct(
        np.array([enc_opq[i] for i in ids]), cb_opq, rotation=R
    )
    mse_pq = float(((R_pq - Vn) ** 2).mean())
    mse_opq = float(((R_opq - Vn) ** 2).mean())
    assert mse_opq < mse_pq, (mse_opq, mse_pq)

    # retrieval: OPQ-ADC recall vs exact top-5 must be >= plain PQ's
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_knn(emb, queries, k=5).collect()
    }
    got_pq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_knn(pq_encode(emb, cb_pq), queries, cb_pq, k=5).collect()
    }
    got_opq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_knn(
            pq_encode(emb, cb_opq, rotation=R), queries, cb_opq, k=5,
            rotation=R,
        ).collect()
    }
    # recall parity within tie noise: top-5 margins on this corpus are
    # tiny, so individual flips happen — the strict quality pin is the
    # MSE assertion above; retrieval must stay within 2/100 of plain PQ
    assert len(got_opq & exact) >= len(got_pq & exact) - 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="opq_iters"):
        opq_fit(emb, m=8, k=16, opq_iters=0)
    with _pytest.raises(ValueError, match="m must be positive"):
        opq_fit(emb, m=0, k=16)
    with _pytest.raises(ValueError, match="opq_fit: empty"):
        opq_fit(emb.filter(F.col("vec_id") < 0), m=8, k=16)


def test_binary_codes_opt_in_and_equivalent(spark, sf_dir, tmp_path):
    """binary_codes=True stores exactly m raw bytes per vector; both
    search operators read either representation with IDENTICAL results.
    array<int> stays the default because parquet's dictionary +
    bit-packing beats raw bytes on disk (measured: 4.4 vs 9.5 B/row at
    m=8/k=16 — the 4-byte BYTE_ARRAY length prefix alone exceeds the
    bit-packed ints) — the size direction is pinned below so the
    default can't silently rot."""
    from pyspark.sql.types import ArrayType, BinaryType

    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import ivf_pq_search

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_fit(emb, m=8, k=16)
    enc_bin = pq_encode(emb, cb, binary_codes=True)
    enc_arr = pq_encode(emb, cb)
    assert isinstance(enc_bin.schema["pq_code"].dataType, BinaryType)
    assert isinstance(enc_arr.schema["pq_code"].dataType, ArrayType)
    rows_bin = {
        r["vec_id"]: list(r["pq_code"]) for r in enc_bin.collect()
    }
    rows_arr = {
        r["vec_id"]: list(r["pq_code"]) for r in enc_arr.collect()
    }
    assert rows_bin == rows_arr  # same code values, byte vs int
    assert all(len(v) == 8 for v in rows_bin.values())

    queries = emb.filter(F.col("vec_id") < 10)
    knn_bin = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_knn(enc_bin, queries, cb, k=5).collect()
    )
    knn_arr = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_knn(enc_arr, queries, cb, k=5).collect()
    )
    assert knn_bin == knn_arr

    centroids = kmeans_fit(emb, k=8, max_iter=5)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    ivf_bin = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_pq_search(
            pq_encode(assigned, cb, binary_codes=True),
            queries, centroids, cb, k=5, nprobe=3,
        ).collect()
    )
    ivf_arr = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_pq_search(
            pq_encode(assigned, cb), queries, centroids, cb, k=5, nprobe=3
        ).collect()
    )
    assert ivf_bin == ivf_arr

    # on-disk: bit-packed array<int> beats raw binary — the measured
    # fact the default rests on
    import os

    for name, df in (("b", enc_bin), ("a", enc_arr)):
        df.select("pq_code").write.mode("overwrite").parquet(
            str(tmp_path / name)
        )
    size = lambda p: sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    assert size(str(tmp_path / "a")) < size(str(tmp_path / "b"))

    with pytest.raises(ValueError, match="k <= 256"):
        pq_encode(emb, np.zeros((4, 300, 16)), binary_codes=True)

def _clustered_corpus(spark, seed=5, dim=32, n_clusters=12, per=40):
    rng = np.random.default_rng(seed)
    rows, protos = [], []
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        protos.append(base)
        for i in range(per):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((c * 1000 + i, [float(x) for x in v]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        protos,
    )


def _fit_ivf_pq(spark, emb, n_clusters=12):
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )

    centroids = kmeans_fit(emb, k=n_clusters, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    cb = pq_fit(assigned, m=8, k=16, centroids=centroids)
    enc = pq_encode(assigned, cb, centroids=centroids)
    return centroids, cb, enc


def test_save_load_ivf_pq_round_trip_and_pruning(spark):
    """r13 (verdict Next #6): the persisted IVF-PQ index round-trips —
    search over the loaded index equals the in-memory operator row for
    row, the persisted residual flag drives the probe mode without the
    caller restating it, and the probed-cells filter still reaches the
    partitioned codes table as a PARTITION filter."""
    from local_pubchem_db_spark.operators.pq import (
        drop_ivf_pq,
        ivf_pq_search,
        ivf_pq_search_persisted,
        load_ivf_pq,
        save_ivf_pq,
    )

    name = "t_ivfpq_rt"
    drop_ivf_pq(spark, name)
    emb, _ = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    queries = emb.filter(F.col("vec_id") % 1000 == 0)
    try:
        save_ivf_pq(enc, centroids, cb, name, residual=True)
        codes, c2, cb2, rot, meta = load_ivf_pq(spark, name)
        assert rot is None and meta["residual"] is True
        assert meta["n_vecs"] == emb.count()
        assert meta["base_mse"] > 0
        np.testing.assert_allclose(c2, centroids)
        np.testing.assert_allclose(cb2, cb)
        want = sorted(
            tuple(r) for r in ivf_pq_search(
                enc, queries, centroids, cb,
                k=5, nprobe=2, residual=True, rerank=20,
            ).collect()
        )
        got_df = ivf_pq_search_persisted(
            spark, name, queries, k=5, nprobe=2, rerank=20
        )
        got = sorted(tuple(r) for r in got_df.collect())
        assert got == want
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "cluster" in plan.split("PartitionFilters", 1)[1][:300]
    finally:
        drop_ivf_pq(spark, name)


def test_ivf_pq_append_finds_new_vectors_no_spurious_drift(spark):
    """O(delta) append: new same-distribution vectors are encoded
    against the FROZEN codebooks, land in their cells, and are
    immediately retrievable (an exact-copy probe re-ranks them to rank
    1); the staleness report sees no drift; meta's corpus size tracks."""
    from local_pubchem_db_spark.operators.pq import (
        drop_ivf_pq,
        ivf_pq_append,
        ivf_pq_search_persisted,
        load_ivf_pq,
        save_ivf_pq,
    )

    name = "t_ivfpq_app"
    drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    rng = np.random.default_rng(17)
    new_rows = [
        (
            50_000 + c,
            [
                float(x)
                for x in protos[c] + 0.05 * rng.standard_normal(len(protos[c]))
            ],
        )
        for c in range(len(protos))
    ]
    new_vecs = spark.createDataFrame(
        new_rows, "vec_id long, embedding array<double>"
    )
    try:
        save_ivf_pq(enc, centroids, cb, name, residual=True)
        n0 = load_ivf_pq(spark, name)[4]["n_vecs"]
        report = ivf_pq_append(spark, name, new_vecs)
        assert report["n_appended"] == len(new_rows)
        assert report["drift_ratio"] == pytest.approx(1.0, abs=0.5)
        assert report["retrain_recommended"] is False
        meta = load_ivf_pq(spark, name)[4]
        assert meta["n_vecs"] == n0 + len(new_rows)
        # an exact-copy probe (fresh id) must re-rank the appended
        # vector to the top of its cell. rerank covers the WHOLE
        # probed candidate set (~2 cells x 41 rows): inside one tight
        # cluster the quantization error exceeds the intra-cluster
        # margins, so ADC alone cannot separate the exact copy from
        # its cell-mates — exactly the candidate-miss risk the rerank
        # parameter exists to buy down (operator docstring).
        probe = spark.createDataFrame(
            [(999_999, new_rows[3][1])], "vec_id long, embedding array<double>"
        )
        got = ivf_pq_search_persisted(
            spark, name, probe, k=3, nprobe=2, rerank=100
        ).collect()
        top = [r["neighbor_id"] for r in got if r["rank"] == 1]
        assert top == [50_003]
    finally:
        drop_ivf_pq(spark, name)


def test_ivf_pq_append_flags_distribution_drift(spark):
    """The staleness signal: a delta from a DIFFERENT distribution
    (uniform random vs the tight training clusters) quantizes far worse
    under the frozen codebooks — drift_ratio blows past the threshold
    and the report recommends a re-train. This is the failure mode of
    incremental ANN maintenance (recall decays with no error anywhere);
    the report makes it measurable."""
    from local_pubchem_db_spark.operators.pq import (
        drop_ivf_pq,
        ivf_pq_append,
        save_ivf_pq,
    )

    name = "t_ivfpq_drift"
    drop_ivf_pq(spark, name)
    emb, _ = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    rng = np.random.default_rng(23)
    drifted = spark.createDataFrame(
        [
            (60_000 + i, [float(x) for x in rng.standard_normal(32)])
            for i in range(100)
        ],
        "vec_id long, embedding array<double>",
    )
    try:
        save_ivf_pq(enc, centroids, cb, name, residual=True)
        report = ivf_pq_append(spark, name, drifted)
        assert report["drift_ratio"] > 1.5, report
        assert report["retrain_recommended"] is True
    finally:
        drop_ivf_pq(spark, name)


def test_ivf_pq_crashed_append_recounted_on_load(spark, monkeypatch):
    """Consistency marker (mirrors the retrieval index): an append that
    crashes before its meta update leaves n_vecs stale; load_ivf_pq
    detects the codes-files mismatch, warns, and recounts from the
    codes table — n_vecs is the only derived field, so the recount IS
    the repair."""
    import warnings

    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_crash"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    new_vecs = spark.createDataFrame(
        [(70_000, [float(x) for x in protos[0]])],
        "vec_id long, embedding array<double>",
    )
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        real = PQ._write_ivf_pq_meta
        # crash window: the codes append lands, the meta update doesn't
        monkeypatch.setattr(PQ, "_write_ivf_pq_meta", lambda *a, **k: None)
        PQ.ivf_pq_append(spark, name, new_vecs)
        monkeypatch.setattr(PQ, "_write_ivf_pq_meta", real)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            meta = PQ.load_ivf_pq(spark, name)[4]
        assert any("recounting" in str(w.message) for w in caught)
        assert meta["n_vecs"] == emb.count() + 1
        # the re-synced meta makes the next load clean
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            PQ.load_ivf_pq(spark, name)
        assert not [w for w in caught if "recounting" in str(w.message)]
    finally:
        PQ.drop_ivf_pq(spark, name)

def test_ivf_pq_cells_ledger_exact_and_skew_flags(spark):
    """r13: the per-cell ledger equals a from-scratch count after save
    AND after appends (O(delta) merge == rebuild), and a hot-cell
    append trips the rebalance signal — the probe-latency twin of
    codebook staleness (a query probing the hot cell scans it
    serially, so worst-case latency grows with skew while recall and
    quantization error look fine)."""
    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_cells"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    rng = np.random.default_rng(41)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)

        def truth():
            return {
                int(r["cluster"]): r["cnt"]
                for r in spark.table(f"{name}_cells")
                .sparkSession.table(f"{name}_codes")
                .groupBy("cluster")
                .count()
                .withColumnRenamed("count", "cnt")
                .collect()
            }

        def ledger():
            return {
                int(r["cell"]): int(r["n"])
                for r in spark.table(f"{name}_cells").collect()
            }

        assert ledger() == truth()
        st = PQ.ivf_pq_cell_stats(spark, name)
        assert st["skew"] < PQ.REBALANCE_SKEW_RATIO and not st["hot_cells"]

        # balanced same-distribution append: ledger merges O(delta),
        # still equals from-scratch, no flag
        bal = spark.createDataFrame(
            [
                (80_000 + c, [float(x) for x in protos[c] + 0.05 * rng.standard_normal(32)])
                for c in range(len(protos))
            ],
            "vec_id long, embedding array<double>",
        )
        rep = PQ.ivf_pq_append(spark, name, bal)
        assert ledger() == truth()
        assert rep["rebalance_recommended"] is False

        # hot-cell flood: 600 vectors around ONE prototype (cell mean
        # ~41 -> that cell blows past 4x the mean)
        hot = spark.createDataFrame(
            [
                (90_000 + i, [float(x) for x in protos[2] + 0.02 * rng.standard_normal(32)])
                for i in range(600)
            ],
            "vec_id long, embedding array<double>",
        )
        rep2 = PQ.ivf_pq_append(spark, name, hot)
        assert ledger() == truth()
        assert rep2["rebalance_recommended"] is True
        assert rep2["cell_skew"] > PQ.REBALANCE_SKEW_RATIO
        assert len(rep2["hot_cells"]) >= 1
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_ivf_pq_append_rebuilds_missing_cells_ledger(spark):
    """An index saved before the ledger existed (simulated by dropping
    <name>_cells) gets it rebuilt on the next append, with a warning —
    and the rebuilt ledger includes the delta."""
    import warnings

    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_oldcells"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        spark.sql(f"DROP TABLE {name}_cells")
        new = spark.createDataFrame(
            [(95_000, [float(x) for x in protos[1]])],
            "vec_id long, embedding array<double>",
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            PQ.ivf_pq_append(spark, name, new)
        assert any("cells ledger" in str(w.message) for w in caught)
        total = sum(
            int(r["n"]) for r in spark.table(f"{name}_cells").collect()
        )
        assert total == emb.count() + 1
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_ivf_pq_split_cell_rebalances_hot_cell(spark):
    """r13 (round gap #3 sliver): ivf_pq_split_cell ACTS on the
    ledger's rebalance signal in O(hot cell) — sub-centroids trained on
    the cell only, parent centroid row replaced in place (cluster id ==
    centroid row index stays the module invariant), only the split
    partitions rewritten, ledger/meta O(parts). ivf_pq_rebalance drives
    the loop from the signal itself. Pinned: ledger == from-scratch
    truth after every step, totals preserved, residual codes re-encoded
    against the moved centroid (numpy-exact), exact-copy probe found at
    rank 1 (rerank sized to the candidate set — the documented
    tight-cluster ADC caveat), partition pruning intact, and the
    rebalance loop strictly shrinks the max cell."""
    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_split"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    rng = np.random.default_rng(17)
    d1 = rng.standard_normal(32); d1 /= np.linalg.norm(d1)
    d2 = rng.standard_normal(32); d2 /= np.linalg.norm(d2)

    def truth():
        return {
            int(r["cluster"]): r["count"]
            for r in spark.table(f"{name}_codes")
            .groupBy("cluster").count().collect()
        }

    def ledger():
        return {
            int(r["cell"]): int(r["n"])
            for r in spark.table(f"{name}_cells").collect()
        }

    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        # bimodal flood into one cell: two offset directions so the
        # split has real structure to find
        hot = spark.createDataFrame(
            [
                (
                    90_000 + i,
                    [
                        float(x)
                        for x in protos[2]
                        + 0.08 * (d1 if i % 2 else d2)
                        + 0.01 * rng.standard_normal(32)
                    ],
                )
                for i in range(600)
            ],
            "vec_id long, embedding array<double>",
        )
        rep0 = PQ.ivf_pq_append(spark, name, hot)
        assert rep0["rebalance_recommended"] is True
        pre = ledger()
        hot_cell = max(pre, key=pre.get)
        total = sum(pre.values())

        rep = PQ.ivf_pq_split_cell(spark, name, parts=2)
        assert rep["cell"] == hot_cell
        assert rep["n_cells"] == len(centroids) + 1
        assert sum(rep["counts"].values()) == pre[hot_cell]
        post = ledger()
        assert post == truth() and sum(post.values()) == total
        codes, c2, cb2, _rot, meta = PQ.load_ivf_pq(spark, name)
        assert len(c2) == meta["n_cells"] == len(centroids) + 1
        assert meta.get("split_cell") is None
        assert meta["n_vecs"] == total
        # untouched centroid rows identical; parent row replaced
        keep = [i for i in range(len(centroids)) if i != hot_cell]
        np.testing.assert_allclose(c2[keep], np.asarray(centroids)[keep])

        # residual codes re-encoded against the MOVED centroid:
        # numpy-exact recompute for a handful of rows of each sub-cell
        from local_pubchem_db_spark.operators.pq import (
            _norm_rows,
            _np_encode,
        )

        Cn = _norm_rows(np.asarray(c2, dtype=np.float64))
        sample = (
            codes.filter(F.col("cluster").isin(rep["sub_ids"]))
            .orderBy("vec_id").limit(8).collect()
        )
        for r in sample:
            v = _norm_rows(
                np.array([r["embedding"]], dtype=np.float64)
            )
            want = _np_encode(v - Cn[[int(r["cluster"])]], cb2)[0]
            assert list(r["pq_code"]) == [int(x) for x in want]

        # exact-copy probe of a flood vector, fresh query id; rerank
        # covers the probed candidate set so ADC tie-compression inside
        # the tight cluster cannot evict the true copy
        probe_vec = hot.filter(F.col("vec_id") == 90_001).first()[
            "embedding"
        ]
        q = spark.createDataFrame(
            [(999_999, probe_vec)], "vec_id long, embedding array<double>"
        )
        res = PQ.ivf_pq_search_persisted(
            spark, name, q, k=3, nprobe=3, rerank=700
        )
        got = res.collect()
        assert got[0]["neighbor_id"] == 90_001 and got[0]["rank"] == 1
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan

        # the rebalance loop: splits the hottest cell while the signal
        # fires, never a corpus pass; max cell strictly shrinks
        pre_max = max(ledger().values())
        reports = PQ.ivf_pq_rebalance(spark, name, parts=2, max_splits=6)
        assert reports  # the 640-row sub-cell was still hot
        post2 = ledger()
        assert post2 == truth() and sum(post2.values()) == total
        assert max(post2.values()) < pre_max
        # appends keep working against the grown centroid matrix
        extra = spark.createDataFrame(
            [(95_000, [float(x) for x in protos[0]])],
            "vec_id long, embedding array<double>",
        )
        rep3 = PQ.ivf_pq_append(spark, name, extra)
        assert rep3["n_appended"] == 1
        assert ledger() == truth()
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_ivf_pq_split_crash_recovery(spark, monkeypatch):
    """The split's crash contract: the marker stages FIRST and clears
    LAST, so load_ivf_pq can (a) FINISH a split that crashed after the
    model write — idempotent re-assignment from the persisted
    sub-centroids — and (b) REVERT a marker with no staged model. Both
    paths pinned, plus the invariant that nothing is lost or doubled."""
    import warnings

    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_splitcrash"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        total = int(PQ.load_ivf_pq(spark, name)[4]["n_vecs"])

        # (b) marker with no staged model: revert, index unchanged
        meta = PQ.load_ivf_pq(spark, name)[4]
        PQ._write_ivf_pq_meta(
            spark, name,
            {**{f: meta.get(f) for f in PQ._IVF_PQ_META_FIELDS},
             "split_cell": 3},
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            _c, c2, _cb, _r, meta2 = PQ.load_ivf_pq(spark, name)
        assert any("clearing the marker" in str(w.message) for w in caught)
        assert meta2.get("split_cell") is None
        assert len(c2) == len(centroids)

        # (a) crash after the model write, before the partition
        # rewrite: marker set, sub-centroids persisted, codes untouched
        boom = RuntimeError("injected crash")

        def crash(*a, **kw):
            raise boom

        monkeypatch.setattr(PQ, "_apply_cell_split", crash)
        with pytest.raises(RuntimeError, match="injected crash"):
            PQ.ivf_pq_split_cell(spark, name, cell=2, parts=2)
        monkeypatch.undo()
        # recovery on next load: warns, finishes, everything consistent
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            codes, c3, _cb3, _r3, meta3 = PQ.load_ivf_pq(spark, name)
        assert any(
            "finishing it from the persisted" in str(w.message)
            for w in caught
        )
        assert meta3.get("split_cell") is None
        assert meta3["n_cells"] == len(c3) == len(centroids) + 1
        truth = {
            int(r["cluster"]): r["count"]
            for r in spark.table(f"{name}_codes")
            .groupBy("cluster").count().collect()
        }
        ledger = {
            int(r["cell"]): int(r["n"])
            for r in spark.table(f"{name}_cells").collect()
        }
        assert ledger == truth and sum(ledger.values()) == total
        # a second load is quiet — recovery is not re-triggered
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            PQ.load_ivf_pq(spark, name)
        assert not [
            w for w in caught if "finishing" in str(w.message)
        ]
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_hash_sample_prefilter_exact_and_fallback(spark):
    """r13: the training/drift sample's TakeOrdered ships per-partition
    top-n to the driver (P x n rows — overflowed the 1 GiB driver cap
    at 2M x 64-dim / 32 partitions, found by the split measurement), so
    past a 4x gate a uniform-hash prefix threshold cuts candidates to
    ~8x the target first. Exactness never rides the 8x margin: >= n
    kept keys below the threshold PROVES the filtered top-n equals the
    global top-n, and an under-delivering filter falls back to the
    exact unfiltered plan — pinned with adversarial constant-prefix
    keys that defeat the threshold entirely."""
    from local_pubchem_db_spark.operators.pq import _hash_sample_rows

    df = spark.range(300_000).select(F.col("id").alias("vec_id"))
    key = F.md5(F.concat(F.lit("7:"), F.col("vec_id").cast("string")))
    sel = [F.col("vec_id").alias("v"), key.alias("__k")]
    got = _hash_sample_rows(df, sel, 1000)
    want = df.select(*sel).orderBy("__k").limit(1000).collect()
    assert [r["__k"] for r in got] == [r["__k"] for r in want]
    # adversarial keys above every threshold: filter keeps nothing,
    # fallback returns the exact answer anyway
    sel2 = [
        F.col("vec_id").alias("v"),
        F.format_string("ffffffff%08d", F.col("vec_id")).alias("__k"),
    ]
    got2 = _hash_sample_rows(df, sel2, 1000)
    assert [r["v"] for r in got2] == list(range(1000))
    # under the 4x gate: single-pass path, same answer
    small = spark.range(2_000).select(F.col("id").alias("vec_id"))
    got3 = _hash_sample_rows(
        small,
        [F.col("vec_id").alias("v"),
         F.md5(F.col("vec_id").cast("string")).alias("__k")],
        1000,
    )
    assert len(got3) == 1000
    # null keys (null ids) are excluded on BOTH paths — the naive plan
    # would otherwise sort them FIRST while the prefilter drops them,
    # a silent sample-recipe divergence across the gate (r13 review)
    withnull = spark.createDataFrame(
        [(None,)] + [(i,) for i in range(300_000)], "vec_id long"
    )
    keyed = [
        F.col("vec_id").alias("v"),
        F.md5(F.col("vec_id").cast("string")).alias("__k"),
    ]
    big = _hash_sample_rows(withnull, keyed, 1000)
    assert all(r["v"] is not None for r in big)
    small_n = _hash_sample_rows(withnull.limit(3_000), keyed, 1000)
    assert all(r["v"] is not None for r in small_n)


def test_apply_cell_split_drops_stale_parent_when_parent_attracts_zero(spark):
    """ADVICE r13 (high): _apply_cell_split's stale-partition gate must
    be computed from the STAGED rows BEFORE the dynamic overwrite. When
    sub-centroid 0 — the parent cell id — attracts zero re-assigned
    rows, the overwrite never touches the parent's partition, so a
    post-overwrite count sees the untouched STALE rows, the ==0 gate
    never fires, and the index keeps every original cell row twice
    (stale parent partition + new sub-cell partitions) with an inflated
    ledger. This drives exactly that geometry through the shared split
    body (the same function the crash-recovery replay calls with a
    persisted model, where sub-centroid 0 can land anywhere): parent
    sub-centroid far from all data, both real modes captured by the two
    appended sub-centroids."""
    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_staleparent"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark, n_clusters=4)
    centroids, cb, enc = _fit_ivf_pq(spark, emb, n_clusters=4)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        _codes, c0, _cb0, _rot0, meta = PQ.load_ivf_pq(spark, name)
        total = int(meta["n_vecs"])
        pre = {
            int(r["cell"]): int(r["n"])
            for r in spark.table(f"{name}_cells").collect()
        }
        cell = max(pre, key=pre.get)
        dim = len(c0[0])
        # contrived sub-centroids: parent (sub-centroid 0) parked far
        # from every unit-norm vector; the two appended sub-centroids
        # bracket the cell's actual data, so assign_clusters sends ZERO
        # rows back to the parent id
        far = np.full(dim, 50.0)
        near = np.asarray(c0[cell], dtype=np.float64)
        new_centroids = np.vstack(
            [np.asarray(c0, dtype=np.float64), near * 0.99, near * 1.01]
        )
        new_centroids[cell] = far
        n_old = len(c0)
        sub_ids = [cell, n_old, n_old + 1]
        # persist marker + model exactly as ivf_pq_split_cell does, then
        # run the shared split body
        PQ._write_ivf_pq_meta(
            spark, name,
            {**{f: meta.get(f) for f in PQ._IVF_PQ_META_FIELDS},
             "split_cell": cell},
        )
        PQ._write_model_table(spark, name, new_centroids, cb, None)
        PQ._apply_cell_split(
            spark, name, {**meta, "split_cell": cell}, new_centroids,
            cb, None, sub_ids,
        )
        truth = {
            int(r["cluster"]): int(r["count"])
            for r in spark.table(f"{name}_codes")
            .groupBy("cluster").count().collect()
        }
        # THE regression assertions: nothing doubled, the stale parent
        # partition is gone (both its rows and its ledger entry), and
        # the two new sub-cells hold exactly the old cell's rows
        assert sum(truth.values()) == total
        assert cell not in truth
        assert truth[n_old] + truth[n_old + 1] == pre[cell]
        ledger = {
            int(r["cell"]): int(r["n"])
            for r in spark.table(f"{name}_cells").collect()
        }
        assert ledger == truth
        # and the index still loads cleanly with the marker cleared
        _c, c2, _cb2, _r2, meta2 = PQ.load_ivf_pq(spark, name)
        assert meta2.get("split_cell") is None
        assert meta2["n_cells"] == len(c2) == n_old + 2
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_ivf_pq_rebalance_stops_on_unsplittable_blob(spark):
    """r13 (split measurement finding): a hot cell that is ONE tight
    near-duplicate blob cannot be balanced by clustering — k-means
    correctly keeps the blob together, the split reports
    separated=False, and the rebalance loop EXCLUDES the cell and its
    dominant descendant instead of spinning against max_splits. The
    remedy for that shape is dedup, which the report's docstring points
    at."""
    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_blob"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    rng = np.random.default_rng(29)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        # unimodal ultra-tight flood: 600 vectors within 0.005 of one
        # prototype — a duplicate-blob in embedding space
        blob = spark.createDataFrame(
            [
                (
                    90_000 + i,
                    [
                        float(x)
                        for x in protos[4]
                        + 0.005 * rng.standard_normal(32)
                    ],
                )
                for i in range(600)
            ],
            "vec_id long, embedding array<double>",
        )
        rep0 = PQ.ivf_pq_append(spark, name, blob)
        assert rep0["rebalance_recommended"] is True
        reports = PQ.ivf_pq_rebalance(spark, name, parts=3, max_splits=6)
        # the loop must NOT burn all its splits on the blob
        assert 1 <= len(reports) < 6
        assert any(r["separated"] is False for r in reports)
        # the verdict is PERSISTED: stats expose it, a SECOND rebalance
        # call performs zero splits (r13 review: a per-invocation
        # memory re-paid the futile O(blob) split every call), and an
        # append carries the flag through its ledger merge
        stats = PQ.ivf_pq_cell_stats(spark, name)
        assert stats["unsplittable"]
        assert PQ.ivf_pq_rebalance(spark, name, parts=3, max_splits=6) == []
        PQ.ivf_pq_append(
            spark,
            name,
            spark.createDataFrame(
                [(95_000, [float(x) for x in protos[0]])],
                "vec_id long, embedding array<double>",
            ),
        )
        assert PQ.ivf_pq_cell_stats(spark, name)["unsplittable"] == (
            stats["unsplittable"]
        )
        # ledger still exact, nothing lost
        truth = {
            int(r["cluster"]): r["count"]
            for r in spark.table(f"{name}_codes")
            .groupBy("cluster").count().collect()
        }
        ledger = {
            int(r["cell"]): int(r["n"])
            for r in spark.table(f"{name}_cells").collect()
        }
        assert ledger == truth
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_no_split_report_hands_blob_to_dedup(spark):
    """r14 (verdict Next #5): when the two-strike no-split verdict
    fires, the report must hand the caller its blob — the flagged cell
    id plus a bounded sample of the cell's ids — so the named remedy
    (dedup) is one call, not a second investigation. End-to-end: a
    duplicate flood gets flagged, the report's ids feed
    ivf_within_partition_pairs + dedup_keep_ids directly, the index is
    rebuilt from the survivors, and the re-checked cell is COLD."""
    from local_pubchem_db_spark.operators import pq as PQ
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
    )
    from local_pubchem_db_spark.operators.dedup import dedup_keep_ids
    from local_pubchem_db_spark.operators.similarity import (
        ivf_within_partition_pairs,
    )

    name = "t_ivfpq_blobhand"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    rng = np.random.default_rng(53)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        blob = spark.createDataFrame(
            [
                (
                    90_000 + i,
                    [
                        float(x)
                        for x in protos[4]
                        + 0.004 * rng.standard_normal(32)
                    ],
                )
                for i in range(600)
            ],
            "vec_id long, embedding array<double>",
        )
        PQ.ivf_pq_append(spark, name, blob)
        reports = PQ.ivf_pq_rebalance(
            spark, name, parts=3, max_splits=6, blob_sample=1000
        )
        flagged = [r for r in reports if r["no_split_flagged"] is not None]
        assert flagged, "dup blob never reached the verdict"
        rep = flagged[-1]
        ids = rep["blob_sample_ids"]
        assert ids and len(ids) >= 500  # the blob itself, not a sliver
        # the remedy, driven entirely by the report: near-dup pairs
        # within the sampled blob, survivors kept, index rebuilt
        corpus = emb.unionByName(blob)
        ids_df = spark.createDataFrame(
            [(int(i),) for i in ids], "vec_id long"
        )
        sampled = corpus.join(ids_df, "vec_id").withColumn(
            "grp", F.lit(0)
        )
        pairs = ivf_within_partition_pairs(
            sampled,
            id_col="vec_id",
            vec_col="embedding",
            partition_col="grp",
            threshold=0.999,
        )
        survivors = dedup_keep_ids(corpus, pairs, "vec_id")
        n_surv = survivors.count()
        assert n_surv < corpus.count() - 500  # the blob collapsed
        assigned = survivors.join(
            assign_clusters(survivors, centroids).withColumnRenamed(
                "id", "vec_id"
            ),
            "vec_id",
        )
        from local_pubchem_db_spark.operators.pq import pq_encode

        enc2 = pq_encode(assigned, cb, centroids=centroids)
        PQ.drop_ivf_pq(spark, name)
        PQ.save_ivf_pq(enc2, centroids, cb, name, residual=True)
        stats = PQ.ivf_pq_cell_stats(spark, name)
        # the re-checked cell is cold: no hot cells, no verdicts
        assert stats["hot_cells"] == []
        assert stats["unsplittable"] == []
        assert stats["skew"] < 4.0
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_no_split_verdict_flags_dominant_not_parent(spark, monkeypatch):
    """ADVICE r13 (low): when a non-separated split reaches
    SPLIT_STRIKES_LIMIT, ONLY the dominant descendant — the lineage
    carrier — may be flagged no_split. The parent cell id may by then
    be a small peeled sub-cell that was never shown unsplittable;
    flagging it too (the old `flagged.update({cell, dominant})`) makes
    every future auto-rebalance wrongly skip a perfectly splittable
    cell. Sub-centroids are injected so the dominant blob provably
    lands on the APPENDED id both times, never the parent."""
    from local_pubchem_db_spark.operators import clustering as CL
    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_flagdom"
    PQ.drop_ivf_pq(spark, name)
    emb, protos = _clustered_corpus(spark, n_clusters=4)
    centroids, cb, enc = _fit_ivf_pq(spark, emb, n_clusters=4)
    rng = np.random.default_rng(41)
    d = rng.standard_normal(32)
    d /= np.linalg.norm(d)
    e = rng.standard_normal(32)
    e /= np.linalg.norm(e)
    bc = np.asarray(protos[2], dtype=np.float64) + 0.10 * d
    real_kmeans = CL.kmeans_fit
    planned: list[np.ndarray] = []

    def fake_kmeans(df, **kw):
        if planned:
            return planned.pop(0)
        return real_kmeans(df, **kw)

    monkeypatch.setattr(CL, "kmeans_fit", fake_kmeans)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        # flood one cell: 590 rows in a tight blob at bc plus 10 rows
        # peeled off at bc + 0.05e (the small genuinely-distinct part)
        flood = spark.createDataFrame(
            [
                (
                    90_000 + i,
                    [
                        float(x)
                        for x in bc
                        + (0.05 * e if i < 10 else 0)
                        + 0.004 * rng.standard_normal(32)
                    ],
                )
                for i in range(600)
            ],
            "vec_id long, embedding array<double>",
        )
        PQ.ivf_pq_append(spark, name, flood)
        ledger0, _f0, _s0 = PQ._read_cells_table(spark, name)
        hot = max(ledger0, key=ledger0.get)
        n_old = len(centroids)

        def flags_strikes():
            _l, f, s = PQ._read_cells_table(spark, name)
            return f, s

        # split 1: parent keeps the ORIGINAL cell rows (sub-centroid 0
        # = the original prototype), the blob+peel go to the appended
        # id — dominant is n_old with ~600/640 > 90%: strike 1
        planned.append(
            np.vstack([np.asarray(protos[2], dtype=np.float64), bc])
        )
        rep1 = PQ.ivf_pq_split_cell(spark, name, cell=hot, parts=2)
        assert rep1["separated"] is False
        flags, strikes = flags_strikes()
        assert flags == set()
        assert strikes.get(n_old) == 1

        # split 2 on the lineage carrier: parent id n_old keeps the
        # 10-row peel, the blob moves to the NEW id n_old+1 — dominant
        # is n_old+1 (~590/600): strike 2 -> flag fires
        planned.append(np.vstack([bc + 0.05 * e, bc]))
        rep2 = PQ.ivf_pq_split_cell(spark, name, cell=n_old, parts=2)
        assert rep2["separated"] is False
        counts2 = rep2["counts"]
        assert max(counts2, key=counts2.get) == n_old + 1
        flags, strikes = flags_strikes()
        # THE regression assertion: only the dominant descendant is
        # flagged — the parent id (now the small peel) is not
        assert flags == {n_old + 1}
        assert n_old not in flags and hot not in flags
        assert strikes.get(n_old + 1) == 2
        # the peel stays auto-splittable: stats exclude it from the
        # unsplittable list
        stats = PQ.ivf_pq_cell_stats(spark, name)
        assert stats["unsplittable"] == [n_old + 1]
        # ledger still exact
        truth = {
            int(r["cluster"]): int(r["count"])
            for r in spark.table(f"{name}_codes")
            .groupBy("cluster").count().collect()
        }
        ledger, _f, _s = PQ._read_cells_table(spark, name)
        assert ledger == truth
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_ivf_pq_model_swap_crash_windows(spark, monkeypatch):
    """r13 review findings: the model table is the ONLY copy of the
    centroids/codebooks, so it must never be overwritten in place —
    a crash inside saveAsTable(overwrite) would lose the index — and
    recovery must never open a window where NO copy exists (two
    racing loaders interleaving DROP+RENAME could delete both). The
    swap stages + renames; (a) a crash between the staged write and
    the DROP (staged + live coexist) REVERTS — the live model is kept,
    the staged copy dropped, the split marker logic reverts the
    in-flight split (safety over recomputation); (b) a crash between
    DROP and RENAME (model missing) completes the rename to the NEW
    model."""
    import warnings

    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_modelswap"
    PQ.drop_ivf_pq(spark, name)
    emb, _protos = _clustered_corpus(spark)
    centroids, cb, enc = _fit_ivf_pq(spark, emb)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        # (a): stage a NEW model (one centroid perturbed) without
        # completing the swap — both tables exist
        c2 = np.asarray(centroids, dtype=np.float64).copy()
        c2[0] = c2[0] + 0.25
        rows = PQ._model_rows("centroid", c2) + PQ._model_rows(
            "codebook", np.ascontiguousarray(cb, dtype=np.float64)
        )
        (
            spark.createDataFrame(
                rows, "kind string, i long, j long, vec array<double>"
            )
            .coalesce(1).write.mode("overwrite").format("parquet")
            .saveAsTable(f"{name}_model__staged")
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            _c, got, _cb, _r, _m = PQ.load_ivf_pq(spark, name)
        assert any("staged model copy" in str(w.message) for w in caught)
        # revert: the LIVE model wins — recovery never touches the only
        # live copy, so no interleaving can delete it
        np.testing.assert_allclose(got, np.asarray(centroids))
        assert not spark.catalog.tableExists(f"{name}_model__staged")
        # (b): DROP the model, leave only a staged copy
        c3 = c2.copy()
        c3[1] = c3[1] - 0.25
        rows = PQ._model_rows("centroid", c3) + PQ._model_rows(
            "codebook", np.ascontiguousarray(cb, dtype=np.float64)
        )
        (
            spark.createDataFrame(
                rows, "kind string, i long, j long, vec array<double>"
            )
            .coalesce(1).write.mode("overwrite").format("parquet")
            .saveAsTable(f"{name}_model__staged")
        )
        spark.sql(f"DROP TABLE {name}_model")
        _c, got3, _cb3, _r3, _m3 = PQ.load_ivf_pq(spark, name)
        np.testing.assert_allclose(got3, c3)
    finally:
        PQ.drop_ivf_pq(spark, name)


def test_recover_staged_model_detects_save_crash_code_mismatch(spark):
    """ADVICE r13 (low): save_ivf_pq rewrites the CODES before swapping
    the model, so a crash between the staged model write and the live
    DROP leaves NEW codes + OLD live model + staged NEW model — and the
    old recovery silently dropped the staged copy, leaving a
    cleanly-loading index whose codes are encoded against a model it no
    longer has. Recovery must detect the codes/meta mismatch (the
    codes_files consistency marker predates the crash) and REFUSE with
    re-run guidance instead of reverting; and when the file counts give
    no proof, the revert warning must name the save path, not a
    nonexistent split marker."""
    import warnings

    from local_pubchem_db_spark.operators import pq as PQ

    name = "t_ivfpq_savecrash"
    PQ.drop_ivf_pq(spark, name)
    emb, _protos = _clustered_corpus(spark, n_clusters=4)
    centroids, cb, enc = _fit_ivf_pq(spark, emb, n_clusters=4)
    try:
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        # simulate the save-crash window: NEW codes already written
        # (different file layout -> codes_files marker mismatch), new
        # model staged, live model + meta still old
        (
            spark.table(f"{name}_codes")
            .repartition(3)
            .write.mode("overwrite")
            .partitionBy("cluster")
            .format("parquet")
            .saveAsTable(f"{name}_codes__tmp")
        )
        spark.sql(f"DROP TABLE {name}_codes")
        spark.sql(f"ALTER TABLE {name}_codes__tmp RENAME TO {name}_codes")
        c2 = np.asarray(centroids, dtype=np.float64).copy()
        c2[0] = c2[0] + 0.25
        rows = PQ._model_rows("centroid", c2) + PQ._model_rows(
            "codebook", np.ascontiguousarray(cb, dtype=np.float64)
        )
        (
            spark.createDataFrame(
                rows, "kind string, i long, j long, vec array<double>"
            )
            .coalesce(1).write.mode("overwrite").format("parquet")
            .saveAsTable(f"{name}_model__staged")
        )
        with pytest.raises(ValueError, match="Re-run save_ivf_pq"):
            PQ.load_ivf_pq(spark, name)
        # the staged copy is preserved for the re-run decision
        assert spark.catalog.tableExists(f"{name}_model__staged")
        # re-running the save (the prescribed remedy) restores a
        # loadable, consistent index
        PQ.save_ivf_pq(enc, centroids, cb, name, residual=True)
        _c, got, _cb, _r, meta = PQ.load_ivf_pq(spark, name)
        np.testing.assert_allclose(got, np.asarray(centroids))
        assert meta["n_vecs"] == enc.count()

        # no-proof window (file counts agree): revert proceeds but the
        # warning names the save path
        rows2 = PQ._model_rows("centroid", c2) + PQ._model_rows(
            "codebook", np.ascontiguousarray(cb, dtype=np.float64)
        )
        (
            spark.createDataFrame(
                rows2, "kind string, i long, j long, vec array<double>"
            )
            .coalesce(1).write.mode("overwrite").format("parquet")
            .saveAsTable(f"{name}_model__staged")
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            _c2, got2, _cb2, _r2, _m2 = PQ.load_ivf_pq(spark, name)
        msgs = [str(w.message) for w in caught]
        assert any("interrupted save_ivf_pq" in m for m in msgs)
        assert not any("in-flight split" in m for m in msgs)
        np.testing.assert_allclose(got2, np.asarray(centroids))
    finally:
        PQ.drop_ivf_pq(spark, name)
