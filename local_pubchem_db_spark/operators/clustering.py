"""K-means (Lloyd) over an embedding column, and IVF ANN search on top.

The iterative-algorithm template for this engine: per-iteration state (the
k×dim centroid matrix) is tiny and lives on the driver; the data-parallel
steps are map-only Arrow-batched passes over the corpus.

Per Lloyd iteration:
1. broadcast centroids,
2. one ``mapInPandas`` pass emits per-batch partial sums — (cluster,
   count, sum-vector) — so the shuffle/collect moves O(partitions × k ×
   dim) floats, never the corpus (classic map-side combine),
3. the driver reduces partials (sorted for run-to-run determinism) and
   recomputes centroids.

At 100 TB this is the same shape MLlib uses: iterations scan the corpus,
nothing else grows with data size. Init is deterministic (the k
lowest-id vectors), so runs are reproducible without a seed contract.

IVF search: assign every corpus vector to its nearest centroid once
(map-only), then answer queries by scoring only the ``nprobe`` nearest
cells — the inverted-file ANN layout, trading recall for a
corpus/k·nprobe-fold cut in scored vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.similarity import _norm_rows
from local_pubchem_db_spark.operators.util import fan_out


def _partial_sums(centroids: np.ndarray):
    """mapInPandas fn: per batch, one matmul assignment + per-cluster
    count/sum partials (k rows out per batch, corpus never shuffled)."""
    Cn = _norm_rows(centroids)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            assign = (_norm_rows(V) @ Cn.T).argmax(axis=1)
            out = []
            for c in np.unique(assign):
                sel = V[assign == c]
                out.append(
                    {
                        "cluster": int(c),
                        "n": len(sel),
                        "vsum": sel.sum(axis=0).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return fn


def _farthest_point_init(base: DataFrame, k: int) -> np.ndarray:
    """Deterministic farthest-point seeding (the greedy 2-approximation
    behind k-means++'s intuition, derandomized): seed 0 is the
    lowest-id vector; each next seed is the vector MAXIMIZING its
    minimum cosine distance to the chosen set, ties broken by lowest
    id. One distributed pass per seed — per partition, a matmul picks
    the local best candidate, the driver reduces the partition bests.

    Why it exists (r13, measured by tools/measure_r13_split.py): the
    default lowest-id init puts ALL seeds inside whichever mode owns
    the smallest ids — for a flooded IVF cell that is the original
    base blob, so Lloyd peels splinters instead of separating the
    flood's modes and the rebalance loop spins against its max_splits
    bound. Farthest-point seeds land one-per-mode by construction."""
    rows = base.orderBy("id").limit(1).collect()
    if not rows:
        raise ValueError("need >= 1 vector for farthest-point init")
    chosen = [np.asarray(list(rows[0]["v"]), dtype=np.float64)]
    chosen_ids = {int(rows[0]["id"])}
    for _ in range(k - 1):
        Cn = _norm_rows(np.stack(chosen))
        bc = base.sparkSession.sparkContext.broadcast((Cn, chosen_ids))

        def local_best(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C, taken = bc.value
            best = None  # (dist desc, id asc, vec)
            for pdf in batches:
                # exclude already-chosen ids so exhaustion (fewer rows
                # than k) is detectable instead of silently duplicating
                # seeds — exact-duplicate VECTORS remain choosable
                pdf = pdf[~pdf["id"].isin(taken)]
                if not len(pdf):
                    continue
                V = np.array(pdf["v"].tolist(), dtype=np.float64)
                ids = pdf["id"].to_numpy()
                d = 1.0 - (_norm_rows(V) @ C.T).max(axis=1)
                # per-batch best with deterministic tie-break on id
                order = np.lexsort((ids, -d))
                i = order[0]
                cand = (float(d[i]), ids[i], V[i])
                if (
                    best is None
                    or cand[0] > best[0]
                    or (cand[0] == best[0] and cand[1] < best[1])
                ):
                    best = cand
            if best is not None:
                yield pd.DataFrame(
                    {
                        "dist": [best[0]],
                        "id": [int(best[1])],
                        "vec": [best[2].tolist()],
                    }
                )

        cands = base.mapInPandas(
            local_best, "dist double, id long, vec array<double>"
        ).collect()
        if not cands:
            break
        top = sorted(cands, key=lambda r: (-r["dist"], r["id"]))[0]
        chosen.append(np.asarray(list(top["vec"]), dtype=np.float64))
        chosen_ids.add(int(top["id"]))
    if len(chosen) < k:
        raise ValueError(f"need >= {k} vectors, got {len(chosen)}")
    return np.stack(chosen)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 10,
    init: str = "lowest",
) -> np.ndarray:
    """Lloyd's k-means on cosine similarity; returns the (k, dim) centroid
    matrix. Deterministic either way: ``init="lowest"`` (default,
    unchanged) seeds with the k lowest-id vectors; ``init="farthest"``
    seeds by greedy farthest-point (k-1 extra distributed passes) — the
    right choice when the smallest ids all sit inside ONE mode, e.g.
    splitting a flooded IVF cell (see _farthest_point_init). Partial-sum
    reduction happens in sorted order on the driver."""
    if init not in ("lowest", "farthest"):
        raise ValueError(f"init must be 'lowest' or 'farthest', got {init!r}")
    base = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    ).persist()
    try:
        if init == "farthest":
            centroids = _farthest_point_init(base, k)
        else:
            init_rows = base.orderBy("id").limit(k).collect()
            if len(init_rows) < k:
                raise ValueError(
                    f"need >= {k} vectors, got {len(init_rows)}"
                )
            centroids = np.array(
                [list(r["v"]) for r in init_rows], dtype=np.float64
            )
    except Exception:
        # don't leak the persisted relation on a failed init (e.g. a
        # cell smaller than `parts`): repeated failed splits in a
        # long-lived service would otherwise pin dead cache entries
        base.unpersist()
        raise
    dim = centroids.shape[1]
    schema = "cluster int, n long, vsum array<double>"
    for _ in range(max_iter):
        partials = base.mapInPandas(_partial_sums(centroids), schema).collect()
        partials.sort(key=lambda r: (r["cluster"], r["n"]))
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in partials:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["vsum"], dtype=np.float64)
        nonempty = counts > 0
        new_centroids = centroids.copy()
        new_centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        if np.allclose(new_centroids, centroids, atol=1e-12):
            centroids = new_centroids
            break
        centroids = new_centroids
    base.unpersist()
    return centroids


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-only nearest-centroid assignment: (id, cluster)."""
    Cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
    bc = df.sparkSession.sparkContext.broadcast(Cn)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = _norm_rows(np.array(pdf["v"].tolist(), dtype=np.float64))
            yield pd.DataFrame(
                {"id": pdf["id"], "cluster": (V @ C.T).argmax(axis=1)}
            )

    return (
        fan_out(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
        .mapInPandas(fn, "id long, cluster int")
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    threshold: float = 0.9,
    max_iter: int = 10,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embeddings, find cosine-near pairs
    WITHIN each cluster only, resolve pairs into connected components,
    keep the minimum id per component.

    Composition of this package's tested pieces — ``kmeans_fit`` (driver
    holds only the k×dim centroids) → ``assign_clusters`` (map-only) →
    ``ivf_within_partition_pairs`` (one shuffle on the cluster key,
    per-cluster gram matrix) → ``dedup_keep_ids`` (transitive closure +
    anti-join).

    The clustering is the scale trick AND the semantic: cross-cluster
    pairs are never scored, so the quadratic term is bounded by the
    largest cluster, not the corpus — grow ``k`` with the corpus to keep
    E[cluster size] fixed (the paper uses k≈100k on LAION-scale data).
    A near-dup pair split across two clusters is missed by design;
    that recall loss is the documented SemDeDup trade.

    Returns ``df`` rows that survive (schema passthrough).
    """
    from local_pubchem_db_spark.operators.dedup import dedup_keep_ids
    from local_pubchem_db_spark.operators.similarity import (
        ivf_within_partition_pairs,
    )

    centroids = kmeans_fit(df, vec_col, id_col, k=k, max_iter=max_iter)
    assigned = assign_clusters(df, centroids, vec_col, id_col).select(
        F.col("id").alias(id_col), F.col("cluster")
    )
    with_cluster = df.select(id_col, vec_col).join(assigned, id_col)
    pairs = ivf_within_partition_pairs(
        with_cluster,
        id_col=id_col,
        vec_col=vec_col,
        partition_col="cluster",
        threshold=threshold,
    )
    return dedup_keep_ids(df, pairs, id_col)


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """ANN top-k via IVF: score each query only against corpus cells among
    its ``nprobe`` nearest centroids. Returns (query_id, neighbor_id, rank);
    ties break on neighbor id. ``queries`` is broadcast (small probe set);
    the corpus-side work is one assignment pass + a semi-join-shaped filter
    against the probed cells, so scored vectors shrink ~k/nprobe-fold."""
    Cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qn = _norm_rows(np.array([list(r[1]) for r in q_rows], dtype=np.float64))
    # query -> probed cells (driver-side: nprobe × |queries| tiny)
    probe = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")[:, :nprobe]
    cell_to_q: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe):
        for c in cells:
            cell_to_q.setdefault(int(c), []).append(qi)
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, Qn, Cn, cell_to_q))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, Qn, Cn, cell_to_q = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            Vn = _norm_rows(np.array(pdf["v"].tolist(), dtype=np.float64))
            cells = (Vn @ Cn.T).argmax(axis=1)
            S = Vn @ Qn.T  # (batch, queries)
            rows: dict[str, list] = {"query_id": [], "neighbor_id": [], "score": []}
            for c in np.unique(cells):
                qs = cell_to_q.get(int(c))
                if not qs:
                    continue
                sel = cells == c
                for qi in qs:
                    keep = ids[sel] != q_ids[qi]
                    rows["query_id"].extend([q_ids[qi]] * int(keep.sum()))
                    rows["neighbor_id"].extend(ids[sel][keep])
                    rows["score"].extend(S[sel, qi][keep])
            pdf_out = pd.DataFrame(rows)
            if len(pdf_out):
                # local top-k per query bounds the shuffle to parts×k rows
                pdf_out = (
                    pdf_out.sort_values(["query_id", "score", "neighbor_id"],
                                        ascending=[True, False, True])
                    .groupby("query_id", sort=False)
                    .head(k)
                )
            yield pdf_out

    cand = fan_out(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    ).mapInPandas(local_topk, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA fit: returns ``(mean, components, explained_var)``
    with ``components`` of shape (k, dim), rows = principal axes in
    decreasing-eigenvalue order.

    Scale shape (the whitening / dim-reduction step before ANN over a
    100 TB embedding corpus): ONE map-only Arrow pass accumulates the
    moments — (n, sum-vector, flattened Gram matrix) — ACROSS batches
    inside each partition and emits exactly one partial per non-empty
    partition, so what leaves the executors is O(partitions × dim²)
    floats — bounded by the task count, not the data volume (a per-batch
    emit would stream millions of ~dim² rows to the driver at 100 TB).
    The driver reduces partials (sorted by partition id for run-to-run
    determinism) and eigendecomposes the dim×dim covariance. ``dim`` is
    the embedding width — small by contract.

    Sign convention: each component's largest-|loading| coordinate is
    made positive, so results are reproducible across partitionings
    (eigenvectors are otherwise sign-ambiguous).
    """
    if k <= 0:
        raise ValueError("k must be positive")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n_acc, s_acc, g_acc = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            n_acc += len(V)
            if s_acc is None:
                s_acc, g_acc = V.sum(axis=0), V.T @ V
            else:
                s_acc += V.sum(axis=0)
                g_acc += V.T @ V
        if n_acc:
            yield pd.DataFrame(
                {
                    "part": [pid],
                    "n": [n_acc],
                    "s": [s_acc],
                    "g": [g_acc.ravel()],
                }
            )

    rows = sorted(
        fan_out(df.select(F.col(vec_col).alias("v")))
        .mapInPandas(partials, "part int, n long, s array<double>, g array<double>")
        .collect(),
        key=lambda r: r["part"],
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    dim = len(s)
    if k > dim:
        raise ValueError(f"k={k} exceeds embedding dim={dim}")
    mean = s / n
    cov = g.reshape(dim, dim) / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:k]
    comps = eigvec[:, order].T
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return mean, comps, np.maximum(eigval[order], 0.0)


def pca_transform(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
    explained_var: np.ndarray | None = None,
    eps: float = 1e-12,
) -> DataFrame:
    """Project ``vec_col`` onto fitted components: one vectorized
    Arrow-batched matmul per batch, map-only (composes with the IVF /
    kNN operators on the reduced vectors).

    Pass ``explained_var`` (from ``pca_fit``) to WHITEN: each projected
    axis is scaled by 1/sqrt(var + eps), giving unit variance per
    component — the standard preprocessing before cosine/L2 ANN when
    axes carry very different energies."""
    from pyspark.sql.functions import pandas_udf

    mu = np.asarray(mean, dtype=np.float64)
    C = np.asarray(components, dtype=np.float64)
    if explained_var is not None:
        C = C / np.sqrt(np.asarray(explained_var, dtype=np.float64) + eps)[:, None]

    @pandas_udf("array<double>")
    def project(v: pd.Series) -> pd.Series:
        V = np.array(v.tolist(), dtype=np.float64)
        P = (V - mu) @ C.T
        return pd.Series(list(P))

    return df.withColumn(out_col, project(F.col(vec_col)))
