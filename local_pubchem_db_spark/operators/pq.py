"""Product quantization (PQ) for embedding compression + ANN search —
the memory tier of the canonical IVF-PQ recipe for billion-scale
similarity search (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Why this exists alongside the similarity operators: at 100 TB an
embedding corpus does not fit in float — a dim-768 float32 vector is
3 KB, while its PQ code at m=96 subspaces is 96 BYTES (32x). PQ stores
each vector as ``m`` small codebook indices; search never decompresses —
asymmetric distance computation (ADC) scores a RAW query against
COMPRESSED codes via per-subspace lookup tables, so the per-vector cost
is ``m`` table lookups instead of a ``dim``-wide dot product.

Division of labor (mirrors the other fit/apply operators here):

- ``pq_fit``: codebooks are trained on a DETERMINISTIC hash-ordered
  sample collected to the driver — sample-based training is the
  standard PQ contract (FAISS trains on ~100k vectors regardless of
  corpus size); the driver does m independent small k-means fits. The
  sample is a pure function of (seed, ids), so refits are reproducible
  across runs, partitionings, and cluster sizes.
- ``pq_encode``: the distributed part — one map-only Arrow pass over
  the full corpus, argmin against the broadcast codebooks per subspace.
  No shuffle; fuses into the scan.
- ``pq_knn``: ADC top-k for a small probe set — per-query LUTs
  (m x k inner products) broadcast with the codebooks; each corpus
  partition scores its codes via LUT gathers and keeps its local top-k,
  then one partitions-x-k window picks the global top-k (the same
  two-phase shape as ``similarity.brute_force_knn``).

Cosine contract: vectors are L2-normalized before BOTH fit and encode,
and ADC maximizes the inner product — on normalized inputs that is
cosine ranking. Scores are approximations (quantization error), so only
(query_id, neighbor_id, rank) is emitted, never raw floats — and the
accuracy contract is recall against the exact operator, pinned in
tests/test_pq.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.util import fan_out


def _norm_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return M / n


def _kmeans_1sub(
    X: np.ndarray, k: int, iters: int, rng, init: np.ndarray | None = None
) -> np.ndarray:
    """Plain seeded Lloyd on one subspace sample (driver-side, small).

    Assignment uses argmin(||c||^2 - 2 x.c) — one (n,k) matmul — rather
    than the (n,k,dsub) broadcast form, which churns ~GBs of temporaries
    at a 64k-row sample and dominated fit wall-time. ``init`` warm-starts
    from given centroids (the OPQ alternation contract: re-seeding each
    round would discard the previous joint optimum)."""
    k = min(k, len(X))
    if init is not None and len(init) == k:
        centroids = np.array(init, dtype=np.float64, copy=True)
    else:
        centroids = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = (centroids**2).sum(axis=1)[None, :] - 2.0 * (X @ centroids.T)
        assign = d.argmin(axis=1)
        # vectorized per-cluster mean: bincount on the assignment
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.zeros_like(centroids)
        np.add.at(sums, assign, X)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def pq_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_rows: int = 65536,
    iters: int = 10,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    cluster_col: str = "cluster",
) -> np.ndarray:
    """Train PQ codebooks; returns array of shape (m, k, dim/m).

    The training sample is the ``sample_rows`` lowest md5(seed:id) rows —
    a uniform, deterministic, engine-independent choice (the same
    hash-order trick as operators/sampling.py), so the fitted codebooks
    are identical across reruns and partitionings. ``dim`` must divide
    by ``m`` (PQ splits the vector into m contiguous subspaces).

    RESIDUAL mode (the Jégou et al. IVF-PQ composition): pass the coarse
    quantizer's ``centroids`` and have ``cluster_col`` on ``df`` (from
    ``clustering.assign_clusters``). The codebooks are then trained on
    ``x_n - centroid_n(cell(x))`` instead of raw vectors — residuals
    concentrate near the origin, so at equal m the codebook spends its
    k centroids on a much smaller volume, tightening quantization error
    exactly where IVF already localized the query. Codes fit in residual
    mode must be encoded (``pq_encode``) and searched (``ivf_pq_search``)
    in residual mode with the SAME centroids.
    """
    if m <= 0 or k <= 1:
        raise ValueError("m must be positive and k >= 2")
    try:
        X = _fit_sample(
            df, id_col, vec_col, sample_rows, seed, centroids, cluster_col
        )
    except ValueError as e:
        raise ValueError(f"pq_fit: {e}") from None
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            _kmeans_1sub(X[:, j * dsub : (j + 1) * dsub], k, iters, rng)
            for j in range(m)
        ]
    )


def opq_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_rows: int = 65536,
    iters: int = 10,
    opq_iters: int = 8,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    cluster_col: str = "cluster",
) -> tuple[np.ndarray, np.ndarray]:
    """Optimized Product Quantization (Ge et al., CVPR 2013,
    non-parametric alternation): learn an ORTHOGONAL rotation R that
    balances variance across the m subspaces, then PQ the rotated
    vectors — at equal (m, k) this strictly tightens quantization on
    correlated embeddings, where plain PQ wastes codebook capacity on
    subspaces that carry little variance. Returns ``(R, codebooks)``;
    feed both to ``pq_encode(..., rotation=R)`` /
    ``pq_knn``/``ivf_pq_search(..., rotation=R)``.

    Alternation (driver-side on the same deterministic hash-ordered
    sample as ``pq_fit`` — the FAISS OPQ contract):
    1. fit subspace codebooks on ``X @ R``;
    2. given the reconstructions Y of the rotated sample, solve the
       orthogonal Procrustes problem ``min_R ||X R - Y||`` via SVD of
       ``X.T @ Y`` (R = U V^T);
    repeat. Rotation is orthogonal, so inner products are preserved:
    ADC over rotated codes ranks identically to cosine in the original
    space, and the IVF residual offset ``<q, centroid>`` (computed
    unrotated) composes unchanged — the rotation applies to residuals.
    """
    if opq_iters < 1:
        raise ValueError("opq_iters must be >= 1")
    if m <= 0 or k <= 1:
        raise ValueError("m must be positive and k >= 2")
    try:
        X = _fit_sample(
            df, id_col, vec_col, sample_rows, seed, centroids, cluster_col
        )
    except ValueError as e:
        raise ValueError(f"opq_fit: {e}") from None
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    R = np.eye(dim)
    C = None
    for _ in range(opq_iters):
        Z = X @ R
        C = np.stack(
            [
                _kmeans_1sub(
                    Z[:, j * dsub : (j + 1) * dsub],
                    k,
                    iters,
                    rng,
                    init=None if C is None else C[j],
                )
                for j in range(m)
            ]
        )
        Y = pq_reconstruct(_np_encode(Z, C), C)
        U, _s, Vt = np.linalg.svd(X.T @ Y)
        R = U @ Vt
    return R, C


def _fit_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    sample_rows: int,
    seed: int,
    centroids: np.ndarray | None,
    cluster_col: str,
) -> np.ndarray:
    """The deterministic hash-ordered training sample shared by pq_fit
    and opq_fit (normalized; residualized when centroids are given)."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    sel = [F.col(vec_col).alias("v"), key.alias("__k")]
    if centroids is not None:
        sel.append(F.col(cluster_col).alias("__cell"))
    rows = df.select(*sel).orderBy("__k").limit(sample_rows).collect()
    if not rows:
        raise ValueError("empty input")
    X = _norm_rows(np.array([list(r["v"]) for r in rows], dtype=np.float64))
    if centroids is not None:
        Cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
        cells = np.array([r["__cell"] for r in rows], dtype=np.int64)
        X = X - Cn[cells]
    return X


def _np_encode(V: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Driver-side encode of an (n, dim) matrix against (m, k, dsub)
    codebooks — the same argmin math as the distributed Arrow pass."""
    m, _k, dsub = codebooks.shape
    codes = np.empty((len(V), m), dtype=np.int64)
    for j in range(m):
        sub = V[:, j * dsub : (j + 1) * dsub]
        d = (codebooks[j] ** 2).sum(axis=1)[None, :] - 2.0 * (
            sub @ codebooks[j].T
        )
        codes[:, j] = d.argmin(axis=1)
    return codes


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    centroids: np.ndarray | None = None,
    cluster_col: str = "cluster",
    rotation: np.ndarray | None = None,
    binary_codes: bool = False,
) -> DataFrame:
    """Quantize ``vec_col`` to ``out_col``: ``array<int>`` of m codebook
    indices (default), or with ``binary_codes=True`` (k <= 256) a
    ``binary`` column of exactly m raw bytes. Map-only Arrow pass;
    input column retained so callers can drop it explicitly once codes
    are persisted (at scale, dropping the raw vectors IS the point).

    Why array<int> is the default — MEASURED, because the intuition
    ("an int element costs ~5 bytes, raw bytes must be smaller") is
    wrong on parquet: dictionary + bit-packing store an element in
    ~log2(k) bits, while BYTE_ARRAY carries a 4-byte length prefix per
    value that random code blobs don't compress away. On a 64k-row
    encoded table (snappy): m=8/k=16 array 4.4 B/row vs binary 9.5;
    m=16/k=256 array 17.1 vs binary 19.0; ADC search over 256k cached
    rows timed identical (LUT gathers dominate, not decode). Binary
    remains the right choice for storage WITHOUT columnar encodings —
    Arrow IPC streams, row stores, in-memory indexes — where m raw
    bytes is the floor; both search operators read either
    representation (they inspect the stored column's type), pinned
    equivalent in tests/test_pq.py.

    With ``centroids`` (residual mode, matching a residual ``pq_fit``),
    each vector's normalized cell centroid is subtracted before
    quantization — still map-only, the centroid matrix rides the same
    broadcast. With ``rotation`` (OPQ mode, from ``opq_fit``), the
    (residualized) vector is rotated before quantization."""
    C = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = C.shape
    if binary_codes and k > 256:
        raise ValueError(
            f"binary codes need k <= 256 (one byte per subquantizer), "
            f"got k={k}; pass binary_codes=False"
        )
    ret_type = "binary" if binary_codes else "array<int>"
    Cn = (
        _norm_rows(np.asarray(centroids, dtype=np.float64))
        if centroids is not None
        else None
    )
    R = (
        np.ascontiguousarray(rotation, dtype=np.float64)
        if rotation is not None
        else None
    )
    bc = df.sparkSession.sparkContext.broadcast((C, Cn, R))

    from pyspark.sql.functions import pandas_udf

    def _quantize(V: np.ndarray) -> pd.Series:
        Cb, _, Rot = bc.value
        if Rot is not None:
            V = V @ Rot
        # ONE encode implementation (_np_encode) serves the distributed
        # pass and the driver-side OPQ training loop — they must agree
        # bit-for-bit or the learned R stops matching the stored codes
        codes = _np_encode(V, Cb)
        if binary_codes:
            return pd.Series(
                [row.tobytes() for row in codes.astype(np.uint8)]
            )
        return pd.Series(list(codes.astype(np.int32)))

    if Cn is None:

        @pandas_udf(ret_type)
        def encode(v: pd.Series) -> pd.Series:
            return _quantize(
                _norm_rows(np.array(v.tolist(), dtype=np.float64))
            )

        return df.withColumn(out_col, encode(F.col(vec_col)))

    @pandas_udf(ret_type)
    def encode_res(v: pd.Series, cell: pd.Series) -> pd.Series:
        _, Cent, _ = bc.value
        V = _norm_rows(np.array(v.tolist(), dtype=np.float64))
        return _quantize(V - Cent[cell.to_numpy(dtype=np.int64)])

    return df.withColumn(
        out_col, encode_res(F.col(vec_col), F.col(cluster_col))
    )


def _codes_decoder(encoded: DataFrame, code_col: str, m: int):
    """Executor-side decoder for whichever code representation the
    relation stores: binary (m raw bytes/row — ``np.frombuffer`` over
    the whole Arrow batch, no per-row Python) or array<int> (legacy).
    Resolved from the SCHEMA at plan time so search never guesses."""
    from pyspark.sql.types import BinaryType

    is_binary = isinstance(
        encoded.schema[code_col].dataType, BinaryType
    )
    if is_binary:

        def decode(col: pd.Series) -> np.ndarray:
            return (
                np.frombuffer(b"".join(col), dtype=np.uint8)
                .reshape(len(col), m)
                .astype(np.int64)
            )

        return decode
    return lambda col: np.array(col.tolist(), dtype=np.int64)


def pq_reconstruct(
    codes: np.ndarray,
    codebooks: np.ndarray,
    centroids: np.ndarray | None = None,
    cells: np.ndarray | None = None,
    rotation: np.ndarray | None = None,
) -> np.ndarray:
    """Decode codes back to (approximate) vectors — test/audit helper.
    For residual-mode codes pass ``centroids`` + per-row ``cells``: the
    reconstruction is centroid(cell) + decoded residual. For OPQ codes
    pass ``rotation``: the decode un-rotates (R^T) before the centroid
    is added — codes live in rotated space, centroids in the original."""
    C = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = C.shape
    codes = np.asarray(codes, dtype=np.int64)
    out = np.concatenate([C[j][codes[:, j]] for j in range(m)], axis=1)
    if rotation is not None:
        out = out @ np.asarray(rotation, dtype=np.float64).T
    if centroids is not None:
        Cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
        out = out + Cn[np.asarray(cells, dtype=np.int64)]
    return out


def pq_knn(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    k: int = 10,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """ADC top-k: exact (normalized) query vectors against PQ codes.

    Returns (query_id, neighbor_id, rank); self-matches excluded, ties
    break on neighbor id — deterministic given the codebooks. The probe
    set is collected/broadcast (the ANN contract: few probes against a
    huge corpus); per corpus partition the cost is a LUT gather-sum over
    the codes — no decompression, no dim-wide dot products. For OPQ
    codes pass ``rotation``: the LUT is built from the ROTATED queries
    (orthogonality: <q, R^T c> = <R q, c>), same per-code cost.
    """
    C = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = C.shape
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qn = _norm_rows(np.array([list(r[1]) for r in q_rows], dtype=np.float64))
    Ql = Qn if rotation is None else Qn @ np.asarray(rotation, dtype=np.float64)
    # LUT[q, j, c] = <query_q subspace_j, codebook_j centroid_c>: ADC
    # scores are then sum_j LUT[q, j, code_j] — inner product == cosine
    # ranking on normalized inputs.
    lut = np.einsum(
        "qjd,jcd->qjc", Ql.reshape(len(q_ids), m, dsub), C
    )
    bq = encoded.sparkSession.sparkContext.broadcast((q_ids, lut))
    decode = _codes_decoder(encoded, code_col, m)

    cols = fan_out(
        encoded.select(
            F.col(id_col).alias("neighbor_id"), F.col(code_col).alias("code")
        )
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, lut = bq.value
        j_idx = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            codes = decode(pdf["code"])
            # (n_queries, batch): gather per subspace, sum over subspaces
            S = lut[:, j_idx[None, :], codes].sum(axis=2)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                mask = nid != q_ids[qi]
                idx = np.nonzero(mask)[0]
                if not idx.size:
                    continue
                s = S[qi, idx]
                order = np.lexsort((nid[idx], -s))[:k]
                take = idx[order]
                out_q.extend([q_ids[qi]] * len(take))
                out_n.extend(nid[take].tolist())
                out_s.extend(S[qi, take].tolist())
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


def ivf_pq_search(
    encoded: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
    residual: bool = False,
    rerank: int | None = None,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """The full IVF-PQ composition: coarse-quantizer cell pruning
    (``clustering.kmeans_fit`` + ``assign_clusters`` supply ``centroids``
    and the ``cluster_col``) over ADC scoring of PQ codes.

    ``residual=True`` matches codes produced by residual-mode
    ``pq_fit``/``pq_encode``: the reconstruction is ``centroid(cell) +
    residual_hat``, so the ADC score decomposes as ``<q, centroid_c>``
    (a per-(query, cell) scalar from the probe matrix already computed
    for cell selection — zero extra passes) plus the same m LUT lookups
    over the residual codebooks. At equal m this is strictly tighter
    quantization than raw-vector PQ because residuals concentrate near
    the origin (Jégou et al. 2011, §IV).

    ``rerank=R`` (R >= k) adds the classic third stage: ADC retrieves
    the top R candidates per query, then EXACT cosine on the raw
    ``vec_col`` re-orders just those R and the true top-k wins —
    quantization error stops costing rank accuracy and only costs
    candidate-miss risk (tune R up to buy recall). Scale shape: the
    candidate id set is n_queries x R rows — broadcast it against the
    corpus (one broadcast semi-join, map-only scan; the corpus never
    shuffles), score exactly in one Arrow pass, window over the tiny
    candidate relation. Requires ``vec_col`` still present on
    ``encoded`` (keep it alongside the codes when re-ranking is wanted;
    at 100 TB the re-rank join touches only probed-cell partitions).

    The scale shape this buys at 100 TB: ``encoded`` persisted
    PARTITIONED BY cluster makes the probed-cells filter a PARTITION
    filter — unprobed cells are never read from storage (pruned at the
    I/O layer, asserted in tests), and the rows that are read cost m
    LUT lookups each instead of a dim-wide dot product. Scored volume
    shrinks ~nprobe/k_coarse-fold; bytes shrink a further
    dim*4/m-fold from the codes. Returns (query_id, neighbor_id, rank);
    recall is governed by nprobe (cell misses) times the PQ
    quantization error — both pinned against the exact operator in
    tests/test_pq.py.
    """
    C = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = C.shape
    Cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Qn = _norm_rows(np.array([list(r[1]) for r in q_rows], dtype=np.float64))
    qc = Qn @ Cn.T  # (n_queries, n_cells) query-centroid inner products
    probe = np.argsort(-qc, axis=1, kind="stable")[:, :nprobe]
    cell_to_q: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe):
        for c in cells:
            cell_to_q.setdefault(int(c), []).append(qi)
    # OPQ: LUTs come from the ROTATED queries (codes live in rotated
    # space; orthogonality keeps the ranking and the residual offset
    # <q, centroid> — computed UNROTATED above — both exact)
    Ql = Qn if rotation is None else Qn @ np.asarray(rotation, dtype=np.float64)
    lut = np.einsum("qjd,jcd->qjc", Ql.reshape(len(q_ids), m, dsub), C)
    # residual ADC: score = <q, centroid_cell> + sum_j LUT[q, j, code_j]
    offsets = qc if residual else None
    bq = encoded.sparkSession.sparkContext.broadcast(
        (q_ids, lut, cell_to_q, offsets)
    )

    if rerank is not None and rerank < k:
        raise ValueError(f"rerank must be >= k, got rerank={rerank}, k={k}")
    # per-partition forward width: the ADC stage must propose enough
    # candidates for the exact stage to re-order — capping local top-k
    # at k would let ADC misranks silently evict true neighbors before
    # rerank ever sees them
    n_local = k if rerank is None else rerank
    # The pruning filter: a plain isin over the cluster column, so when
    # the encoded corpus is stored partitioned by cluster this reaches
    # the scan as a partition filter and unprobed cells cost zero I/O.
    cand = encoded.filter(
        F.col(cluster_col).isin(sorted(cell_to_q))
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(code_col).alias("code"),
        F.col(cluster_col).alias("cell"),
    )

    decode = _codes_decoder(encoded, code_col, m)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, lut, cell_to_q, offsets = bq.value
        j_idx = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            codes = decode(pdf["code"])
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            rows: dict[str, list] = {
                "query_id": [], "neighbor_id": [], "score": []
            }
            for c in np.unique(cells):
                qs = cell_to_q.get(int(c))
                if not qs:
                    continue
                sel = np.nonzero(cells == c)[0]
                # ADC for just this cell's rows x its probing queries:
                # gather per subspace then sum -> (len(qs), len(sel))
                S = lut[qs][:, j_idx[None, :], codes[sel]].sum(axis=2)
                if offsets is not None:
                    S = S + offsets[qs, int(c)][:, None]
                for row_i, qi in enumerate(qs):
                    keep = nid[sel] != q_ids[qi]
                    rows["query_id"].extend([q_ids[qi]] * int(keep.sum()))
                    rows["neighbor_id"].extend(nid[sel][keep])
                    rows["score"].extend(S[row_i][keep])
            out = pd.DataFrame(rows)
            if len(out):
                out = (
                    out.sort_values(
                        ["query_id", "score", "neighbor_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(n_local)
                )
            yield out

    scored = cand.mapInPandas(
        local_topk, "query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
        )
    candidates = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # exact stage: raw vectors ONLY for the n_queries x R candidate ids;
    # the candidate relation broadcasts, and the corpus side reuses the
    # probed-cells filter — every candidate came from a probed cell, so
    # the join scans the same partition-pruned slice the ADC stage read,
    # never the full table
    bqv = encoded.sparkSession.sparkContext.broadcast((q_ids, Qn))
    with_vec = F.broadcast(candidates).join(
        encoded.filter(F.col(cluster_col).isin(sorted(cell_to_q))).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
        ),
        "neighbor_id",
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def exact_score(qid: pd.Series, v: pd.Series) -> pd.Series:
        ids, Q = bqv.value
        pos = {int(i): j for j, i in enumerate(ids)}
        V = _norm_rows(np.array(v.tolist(), dtype=np.float64))
        qrows = Q[[pos[int(i)] for i in qid]]
        return pd.Series((qrows * V).sum(axis=1))

    rescored = with_vec.select(
        "query_id",
        "neighbor_id",
        exact_score(F.col("query_id"), F.col("__v")).alias("score"),
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
