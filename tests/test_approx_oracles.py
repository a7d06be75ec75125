"""Property oracles for the rows-only driver entries.

approx_sketches, ann_ivf_probe, and the k-means that powers it have no
SQL oracle (engine-specific sketches / iterative fits), so these tests
pin them against independent exact recomputations: sketch error bounds,
nearest-centroid invariants, and IVF recall against brute-force cosine.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.clustering import (
    assign_clusters,
    ivf_search,
    kmeans_fit,
)


def _embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_approx_count_distinct_within_documented_error(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    # default rsd is 5%; allow 3 sigma
    assert abs(row["approx"] - row["exact"]) <= 0.15 * row["exact"]


def test_percentile_approx_brackets_exact_quantiles(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = li.agg(
        F.percentile_approx("l_quantity", [0.5, 0.9]).alias("p")
    ).collect()[0]["p"]
    vals = np.sort(
        np.array([r[0] for r in li.select("l_quantity").collect()], dtype=float)
    )
    for got, q in zip(approx, [0.5, 0.9]):
        # an approximate quantile must land within a small rank window
        lo = vals[max(0, int(0.98 * q * len(vals)) - 2)]
        hi = vals[min(len(vals) - 1, int(min(1.0, 1.02 * q) * len(vals)) + 2)]
        assert lo <= got <= hi


def test_assign_clusters_is_nearest_centroid(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    got = {r["id"]: r["cluster"] for r in assign_clusters(emb, centroids).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    Cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    for r in rows:
        v = np.asarray(list(r["embedding"]), dtype=np.float64)
        v = v / np.linalg.norm(v)
        assert got[r["vec_id"]] == int(np.argmax(Cn @ v))


def test_ivf_probe_recall_vs_brute_force(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    probes = emb.orderBy("vec_id").limit(3)
    got = ivf_search(emb, probes, centroids, k=5, nprobe=3).collect()

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    probe_ids = sorted(ids)[:3]

    hits = total = 0
    for pid in probe_ids:
        q = Vn[ids == pid][0]
        sims = Vn @ q
        order = np.lexsort((ids, -sims))
        true_top = [int(ids[i]) for i in order if ids[i] != pid][:5]
        found = {r["neighbor_id"] for r in got if r["query_id"] == pid}
        assert len(found) == 5
        hits += len(found & set(true_top))
        total += 5
    # nprobe=3 of 8 cells: on the testdata blobs recall stays high;
    # anything below 0.6 means probing or assignment broke
    assert hits / total >= 0.6, f"recall collapsed: {hits}/{total}"
