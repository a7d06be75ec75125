"""Similarity search over an embedding column (array<float>).

Three tiers, per the scale plan:

- ``brute_force_knn``: exact top-k for a (small) query set. The query
  vectors are collected and broadcast as one numpy matrix; each corpus
  partition computes a batch×query matmul and keeps only its LOCAL top-k
  per query, so the final shuffle ranks ``partitions × k`` candidate rows
  per query instead of the full corpus — the classic two-phase top-k.
  Linear in corpus size, constant driver memory; the correctness baseline.
- ``ivf_within_partition_pairs``: IVF-style search — vectors carry a
  coarse partition id (cluster/label); candidates only form within a
  partition, turning all-pairs into a sum of per-bucket squares. Each
  bucket is scored as one numpy gram matrix via applyInPandas.
- ``cosine_all_pairs``: exact global near-dup pairs above a threshold via
  block-pair decomposition: vectors replicate into B block-pairs, every
  pair of blocks is scored as one gram matrix — the bounded-memory shape
  for exact all-pairs at scale (choose B so a block pair fits an
  executor).

- ``srp_lsh_neardup_pairs``: the LSH-bucketed tier — signed random
  projections (random hyperplanes) hash each vector into per-band sign
  buckets; only bucket collisions become candidates, then candidates are
  verified with exact cosine. The embedding-space twin of MinHash+LSH:
  map-only signatures, ONE candidate equi-join shuffle, exact verify —
  nothing all-pairs, nothing driver-side.

Scores are computed in float64 numpy; only ids/ranks are emitted (raw
float scores never enter the correctness gate).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.util import fan_out, shared


def _norm_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0.0] = 1.0  # all-zero vectors score 0 against everything
    return M / n


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, rank). Self-matches are excluded; ties
    break on neighbor id ascending, so results are fully deterministic.

    ``queries`` must be small (it is collected and broadcast — the ANN
    contract: few probes against a huge corpus).
    """
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qn = _norm_rows(np.array([list(r[1]) for r in q_rows], dtype=np.float64))
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, Qn))

    cols = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, Qn = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            Cn = _norm_rows(np.array(pdf["cv"].tolist(), dtype=np.float64))
            S = Cn @ Qn.T  # (batch, n_queries)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                mask = nid != q_ids[qi]
                idx = np.nonzero(mask)[0]
                if not idx.size:
                    continue
                s = S[idx, qi]
                # sort by (-score, neighbor_id): lexsort keys last-first
                order = np.lexsort((nid[idx], -s))[:k]
                take = idx[order]
                out_q.extend([q_ids[qi]] * len(take))
                out_n.extend(nid[take].tolist())
                out_s.extend(S[take, qi].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
            )

    scored = cols.mapInPandas(
        local_topk, "query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _pairs_from_gram(
    ids_a: np.ndarray,
    A: np.ndarray,
    ids_b: np.ndarray | None,
    B: np.ndarray | None,
    threshold: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Thresholded (id1 < id2) pairs from one gram matrix. ``B=None``
    means a self-block (upper triangle only)."""
    if B is None:
        S = A @ A.T
        iu, ju = np.triu_indices(len(ids_a), k=1)
        keep = S[iu, ju] >= threshold
        id1, id2 = ids_a[iu[keep]], ids_a[ju[keep]]
        # triu orders by row position, not id value — normalize to id1 < id2
        swap = id1 > id2
        id1[swap], id2[swap] = id2[swap], id1[swap]
    else:
        S = A @ B.T
        ii, jj = np.nonzero(S >= threshold)
        id1, id2 = ids_a[ii], ids_b[jj]
        swap = id1 > id2
        id1[swap], id2[swap] = id2[swap], id1[swap]
        keep_order = id1 < id2  # drop self-pairs if ids overlap
        id1, id2 = id1[keep_order], id2[keep_order]
    return id1, id2


def ivf_within_partition_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """IVF-bucketed near-neighbor pairs: (id1 < id2) within the same coarse
    partition with cosine >= threshold.

    Returns (id1, id2, part). One shuffle on the partition key co-locates
    each bucket; the bucket is then scored as a single numpy gram matrix
    (per-bucket work quadratic only in bucket size).
    """
    base = fan_out(
        df.select(
            F.col(partition_col).alias("part"),
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
        )
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        Vn = _norm_rows(np.array(pdf["v"].tolist(), dtype=np.float64))
        id1, id2 = _pairs_from_gram(ids, Vn, None, None, threshold)
        return pd.DataFrame(
            {"id1": id1, "id2": id2, "part": pdf["part"].iloc[0]}
        )

    return base.groupBy("part").applyInPandas(
        bucket_pairs, "id1 long, id2 long, part int"
    )


def _srp_signatures_fn(n_bits: int, bands: int, seed: int):
    """mapInPandas fn emitting (id, band, bucket) SRP sign rows. The
    hyperplanes regenerate identically on every worker from (seed, dim) —
    no driver action, no broadcast payload."""
    r = n_bits // bands

    def signatures(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H = None
        weights = 1 << np.arange(r, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            if H is None:
                H = np.random.default_rng(seed).standard_normal(
                    (n_bits, V.shape[1])
                )
            bits = (V @ H.T) > 0  # (n, n_bits) sign pattern
            nid = pdf["id"].to_numpy(dtype=np.int64)
            ids_out, band_out, bucket_out = [], [], []
            for b in range(bands):
                bucket = bits[:, b * r : (b + 1) * r] @ weights
                ids_out.append(nid)
                band_out.append(np.full(len(nid), b, dtype=np.int32))
                bucket_out.append(bucket)
            yield pd.DataFrame(
                {
                    "id": np.concatenate(ids_out),
                    "band": np.concatenate(band_out),
                    "bucket": np.concatenate(bucket_out),
                }
            )

    return signatures


def srp_sign_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 128,
    bands: int = 16,
    seed: int = 7,
) -> DataFrame:
    """The persistable (id, band, bucket) SRP index of a corpus — the
    embedding twin of ``dedup.lsh_bucket_index``. Map-only; write it
    bucketed/partitioned by (band, bucket) and the incremental join
    below is shuffle-free on the history side."""
    if n_bits % bands:
        raise ValueError("bands must divide n_bits")
    base = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    return base.mapInPandas(
        _srp_signatures_fn(n_bits, bands, seed), "id long, band int, bucket long"
    )


def incremental_srp_new_ids(
    batch: DataFrame,
    history_index: DataFrame | list[DataFrame],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    n_bits: int = 128,
    bands: int = 16,
    seed: int = 7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Ids in ``batch`` whose embeddings are near-dups of NOTHING in the
    history SRP index nor of an earlier (lower-id) batch row — the
    embedding twin of ``dedup.incremental_minhash_new_ids``, same
    conservative incremental contract: history is never re-embedded or
    re-scored (only its (id, band, bucket) rows are joined; a bucket
    collision with history drops the row outright), while batch-internal
    candidates ARE exact-cosine verified (both vectors at hand). The
    ``seed``/``n_bits``/``bands`` MUST match the index's — the sign
    buckets are only comparable under identical hyperplanes.

    ``history_index`` accepts a list of frames (bucketed compacted table
    + small delta) exactly like the MinHash form. ``max_bucket_size``
    defaults to None for the same safe-to-append reason documented
    there."""
    from local_pubchem_db_spark.operators.dedup import bounded_bucket_pairs

    buckets = shared(srp_sign_index(batch, id_col, vec_col, n_bits, bands, seed))
    history_frames = (
        history_index if isinstance(history_index, list) else [history_index]
    )
    hit_ids = [
        buckets.join(h, ["band", "bucket"], "left_semi").select("id")
        for h in history_frames
    ]
    if hit_ids:
        vs_history = hit_ids[0]
        for h in hit_ids[1:]:
            vs_history = vs_history.unionByName(h)
        vs_history = vs_history.distinct()
    else:
        vs_history = batch.select(F.col(id_col).alias("id")).limit(0)

    cand = bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=max_bucket_size
    )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_udf(v1: pd.Series, v2: pd.Series) -> pd.Series:
        A = _norm_rows(np.array(v1.tolist(), dtype=np.float64))
        B = _norm_rows(np.array(v2.tolist(), dtype=np.float64))
        return pd.Series(np.einsum("ij,ij->i", A, B))

    base = batch.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = base.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    b = base.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    dup_in_batch = (
        cand.join(a, "id1")
        .join(b, "id2")
        .filter(cos_udf("v1", "v2") >= F.lit(threshold))
        .select(F.col("id2").alias("id"))
        .distinct()
    )
    ids = batch.select(F.col(id_col).alias("id"))
    return (
        ids.join(vs_history, "id", "left_anti")
        .join(dup_in_batch, "id", "left_anti")
        .withColumnRenamed("id", id_col)
    )


def srp_lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    n_bits: int = 128,
    bands: int = 16,
    seed: int = 7,
    max_bucket_size: int | None | str = "auto",
) -> DataFrame:
    """Embedding near-dup pairs (id1 < id2, exact cosine >= threshold)
    via signed-random-projection LSH — the LSH-bucketed ANN scale path.

    Shape (mirrors ``dedup.minhash_lsh_dedup_pairs``):
    1. map-only signature: the sign pattern of V @ H^T (H = ``n_bits``
       seeded random hyperplanes, regenerated identically on every worker
       from ``seed`` + the batch's dimensionality — no driver action, no
       broadcast payload), packed into ``bands`` integer buckets of
       r = n_bits/bands sign bits each;
    2. candidates: ONE equi-join shuffle on (band, bucket) — two vectors
       meet iff some band's r sign bits agree exactly;
    3. exact verify: candidate pairs re-join their vectors and keep exact
       float64 cosine >= threshold, so precision is 1.0 by construction
       and the LSH only costs recall.

    Collision math: P[one band agrees] = (1 - theta/pi)^r with
    theta = arccos(cos_sim). At the 0.8 default (r=8, 16 bands) a true
    pair is missed with p = (1 - 0.16)^16 ~ 6%; raise ``bands`` (or lower
    r) for higher recall at more candidate volume. Unrelated pairs
    (cos ~ 0) collide per band with p = 2^-r, so candidate volume stays
    ~ bands * n^2 / 2^r per skew-free bucket space — bounded, never
    all-pairs.

    ``max_bucket_size`` (default "auto" = 64 at r >= 8, else None)
    additionally bounds buckets that exceed the cap — embedding floods.
    Inside such a bucket candidates degrade from all-pairs to a
    star+chain subgraph, so recall there is no longer governed by the
    banding math alone (see ``dedup.bounded_bucket_pairs`` for the
    mixed-bucket caveat); precision stays exactly 1.0 — every emitted
    pair is still exact-cosine-verified. Pass None to restore the pure
    LSH contract regardless of bucket sizes."""
    if n_bits % bands:
        raise ValueError("bands must divide n_bits")
    r = n_bits // bands

    base = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )

    from local_pubchem_db_spark.operators.dedup import bounded_bucket_pairs

    # Bucket cap (see dedup.bounded_bucket_pairs): an embedding cluster of
    # thousands of near-identical vectors shares sign patterns across all
    # bands; without the cap the candidate join is quadratic in cluster
    # size — the same skew shape as MinHash dup clusters. The cap's
    # premise — "an oversized bucket IS a near-dup cluster" — only holds
    # when unrelated vectors rarely share a band (P = 2^-r), so "auto"
    # engages it at r >= 8 (collision p <= 1/256) and leaves coarse
    # bucketings (small r), where big buckets are by design mostly
    # non-dups and all-pairs IS the recall mechanism, uncapped.
    if max_bucket_size == "auto":
        max_bucket_size = 64 if r >= 8 else None

    buckets = shared(
        base.mapInPandas(
            _srp_signatures_fn(n_bits, bands, seed),
            "id long, band int, bucket long",
        )
    )
    cand = bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=max_bucket_size
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_udf(v1: pd.Series, v2: pd.Series) -> pd.Series:
        A = _norm_rows(np.array(v1.tolist(), dtype=np.float64))
        B = _norm_rows(np.array(v2.tolist(), dtype=np.float64))
        return pd.Series(np.einsum("ij,ij->i", A, B))

    a = base.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    b = base.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .filter(cos_udf("v1", "v2") >= F.lit(threshold))
        .select("id1", "id2")
    )


def cosine_all_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    blocks: int = 8,
) -> DataFrame:
    """Exact global cosine near-dup pairs (id1 < id2, cosine >= threshold).

    Block-pair decomposition: vector with block b = id mod B is shipped to
    every block-pair (min(b,j), max(b,j)) — B copies per vector — and each
    of the B(B+1)/2 groups scores one gram matrix. Replication costs B×
    the input in shuffle volume but bounds per-task memory to two blocks;
    at scale pick B ≈ corpus_bytes / executor_budget.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.col(id_col), F.lit(blocks)).cast("int").alias("b"),
    )
    peers = F.array(*[F.lit(j) for j in range(blocks)])
    membership = fan_out(
        base.select(
            "id",
            "v",
            "b",
            F.explode(peers).alias("j"),
        ).select(
            "id",
            "v",
            "b",
            F.least("b", "j").alias("g1"),
            F.greatest("b", "j").alias("g2"),
        )
        # each j in 0..B-1 yields a distinct unordered block-pair for this
        # vector, so membership is already duplicate-free — no dedup shuffle
    )

    def block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g1, g2 = key
        ids = pdf["id"].to_numpy(dtype=np.int64)
        Vn = _norm_rows(np.array(pdf["v"].tolist(), dtype=np.float64))
        side = pdf["b"].to_numpy()
        if g1 == g2:
            id1, id2 = _pairs_from_gram(ids, Vn, None, None, threshold)
        else:
            ma, mb = side == g1, side == g2
            id1, id2 = _pairs_from_gram(
                ids[ma], Vn[ma], ids[mb], Vn[mb], threshold
            )
        return pd.DataFrame({"id1": id1, "id2": id2})

    return membership.groupBy("g1", "g2").applyInPandas(
        block_pairs, "id1 long, id2 long"
    )
