"""K-means + IVF search: separation, determinism, and recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.clustering import (
    assign_clusters,
    ivf_search,
    kmeans_fit,
)
from local_pubchem_db_spark.operators.similarity import brute_force_knn


@pytest.fixture(scope="module")
def blobs(spark):
    # two well-separated directions in R^8, 30 vectors each, ids interleaved
    rng = np.random.default_rng(7)
    a = np.tile([10.0, 0, 0, 0, 0, 0, 0, 0], (30, 1)) + rng.normal(0, 0.1, (30, 8))
    b = np.tile([0, 10.0, 0, 0, 0, 0, 0, 0], (30, 1)) + rng.normal(0, 0.1, (30, 8))
    rows = []
    for i in range(30):
        rows.append((2 * i, [float(x) for x in a[i]]))
        rows.append((2 * i + 1, [float(x) for x in b[i]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_blobs(spark, blobs):
    centroids = kmeans_fit(blobs, k=2, max_iter=10)
    assigned = assign_clusters(blobs, centroids)
    got = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sorted(got.values()) == [30, 30]
    # even ids (blob a) all land together
    clusters = {r["id"]: r["cluster"] for r in assigned.collect()}
    even = {clusters[i] for i in range(0, 60, 2)}
    odd = {clusters[i] for i in range(1, 60, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd


def test_kmeans_deterministic(spark, blobs):
    c1 = kmeans_fit(blobs, k=2, max_iter=10)
    c2 = kmeans_fit(blobs, k=2, max_iter=10)
    assert np.array_equal(c1, c2)


def test_kmeans_too_few_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2)


def test_ivf_matches_brute_force_within_blob(spark, blobs):
    # nprobe = k(cells): probing every cell makes IVF exact -> must equal
    # the brute-force baseline ranking
    centroids = kmeans_fit(blobs, k=2, max_iter=10)
    probes = blobs.orderBy("vec_id").limit(2)
    ivf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_search(blobs, probes, centroids, k=5, nprobe=2).collect()
    }
    bf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_knn(blobs, probes, k=5).collect()
    }
    assert ivf == bf


def test_ivf_single_probe_stays_in_cell(spark, blobs):
    centroids = kmeans_fit(blobs, k=2, max_iter=10)
    probes = blobs.filter(F.col("vec_id") == 0)  # blob a
    got = ivf_search(blobs, probes, centroids, k=5, nprobe=1).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] % 2 == 0 for r in got)  # all from blob a


def _dedup_oracle(ids, V, threshold):
    """All-pairs cosine + union-find: the keep-set semantic_dedup must
    reproduce when clustering loses no pair (well-separated fixture)."""
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n = len(ids)
    for a in range(n):
        for b in range(a + 1, n):
            if S[a, b] >= threshold:
                ra, rb = find(ids[a]), find(ids[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    reps = {}
    for i in ids:
        reps.setdefault(find(i), []).append(i)
    return {min(members) for members in reps.values()}


@pytest.fixture(scope="module")
def dup_groups(spark):
    """Four tight directions in R^8; ids 0-3 are one seed per direction
    (so the deterministic lowest-id k-means init starts one centroid in
    each), 4-6 duplicate directions 0/0/1, 7-8 sit between directions
    (cosine ~0.707 from both parents — below the 0.9 threshold)."""
    rng = np.random.default_rng(11)
    d = np.zeros((4, 8))
    for i in range(4):
        d[i, i] = 10.0
    rows_np = [
        d[0], d[1], d[2], d[3],          # ids 0..3
        d[0], d[0], d[1],                # ids 4,5,6: near-dups
        (d[0] + d[1]) / np.sqrt(2),      # id 7: between 0 and 1
        (d[2] + d[3]) / np.sqrt(2),      # id 8: between 2 and 3
    ]
    V = np.array(rows_np) + rng.normal(0, 1e-3, (9, 8))
    rows = [(i, [float(x) for x in V[i]]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, V


def test_semantic_dedup_matches_allpairs_oracle(spark, dup_groups):
    from local_pubchem_db_spark.operators.clustering import semantic_dedup

    df, V = dup_groups
    kept = semantic_dedup(df, k=4, threshold=0.9)
    got = {r["vec_id"] for r in kept.collect()}
    want = _dedup_oracle(list(range(9)), V, 0.9)
    # components: {0,4,5}, {1,6}; singletons 2,3,7,8 -> keep 0,1,2,3,7,8
    assert want == {0, 1, 2, 3, 7, 8}
    assert got == want
    assert kept.columns == df.columns  # schema passthrough


def test_semantic_dedup_no_pairs_keeps_all(spark, dup_groups):
    from local_pubchem_db_spark.operators.clustering import semantic_dedup

    df, _ = dup_groups
    # threshold above any achievable cosine between distinct noisy vectors
    kept = semantic_dedup(df, k=4, threshold=1.0 - 1e-12)
    assert kept.count() == 9


def test_kmeans_farthest_init_separates_modes(spark):
    """r13 (split measurement finding): lowest-id seeding puts every
    seed inside whichever mode owns the smallest ids, so Lloyd peels
    splinters off a flooded cell instead of separating its modes.
    Farthest-point seeding is deterministic (greedy max-min cosine
    distance, ties by lowest id) and lands one seed per mode by
    construction: on a 3-mode corpus whose smallest ids ALL sit in
    mode 0, farthest init recovers the 3 modes BY SEEDING — no
    reliance on Lloyd escaping a degenerate start (which it sometimes
    does on toy data and did not on the measured flooded cell)."""
    import numpy as np

    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )

    rng = np.random.default_rng(3)
    dim = 16
    modes = rng.standard_normal((3, dim))
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    rows = []
    # ids 0..199: mode 0 only; modes 1 and 2 start at id 1000
    for i in range(200):
        rows.append((i, (modes[0] + 0.02 * rng.standard_normal(dim)).tolist()))
    for i in range(200):
        rows.append(
            (1000 + i, (modes[1 + i % 2] + 0.02 * rng.standard_normal(dim)).tolist())
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def mode_coverage(cents):
        # how many true modes have a centroid within cos > 0.95
        Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        return sum((Cn @ m >= 0.95).any() for m in modes)

    far = kmeans_fit(emb, k=3, max_iter=10, init="farthest")
    assert mode_coverage(far) == 3
    # the seeds THEMSELVES cover the modes (max_iter=0-equivalent
    # check: one seed per mode before Lloyd runs at all)
    from local_pubchem_db_spark.operators.clustering import (
        _farthest_point_init,
        fan_out,
    )

    base = fan_out(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    )
    seeds = _farthest_point_init(base, 3)
    assert mode_coverage(seeds) == 3
    # deterministic: same seeds, same result
    far2 = kmeans_fit(emb.repartition(13), k=3, max_iter=10, init="farthest")
    np.testing.assert_allclose(far, far2)
    # assignment works off the farthest-init centroids
    n_assigned = assign_clusters(emb, far).count()
    assert n_assigned == 400
    with pytest.raises(ValueError, match="init"):
        kmeans_fit(emb, k=3, init="bogus")
