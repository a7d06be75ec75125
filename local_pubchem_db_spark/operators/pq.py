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

from local_pubchem_db_spark.operators.util import driver_rows_df, fan_out


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


def _hash_sample_rows(df: DataFrame, sel: list, sample_rows: int) -> list:
    """Collect the ``sample_rows`` smallest-``__k`` rows of
    ``df.select(*sel)`` (one expr aliased ``__k``, an md5 hex string)
    WITHOUT shipping partitions x sample_rows rows to the driver.

    The naive ``orderBy(__k).limit(n).collect()`` plans as a
    TakeOrdered whose per-partition top-n ALL travel to the driver —
    up to P x n rows, which already overflowed the default 1 GiB
    driver result cap on a 2M-row x 64-dim corpus at 32 partitions
    (r13, found by tools/measure_r13_split.py), and grows with the
    cluster at 100 TB. Since md5 keys are uniform, a prefix-threshold
    prefilter keeps an expected 8x the target before the TakeOrdered,
    bounding the driver transfer at ~8 x n rows REGARDLESS of
    partition count, for the price of one count pass (gated: relations
    within 4x of the sample size keep the old single-pass plan —
    there, P x n can't exceed ~4n anyway). Correctness never rides the
    8x margin: if the filter under-delivers (astronomically unlikely;
    possible only on adversarial key distributions md5 rules out), the
    unfiltered exact plan runs as the fallback."""
    # null keys (a null id makes md5(concat(...)) null) would sort
    # FIRST under the naive plan but be dropped by the prefilter's
    # comparison — exclude them explicitly so the gated and ungated
    # paths sample the same rows; a vector with no id has no
    # deterministic place in a hash-ordered sample anyway
    base = df.select(*sel).filter(F.col("__k").isNotNull())
    n_total = base.count()
    if n_total > 4 * sample_rows:
        frac = min(1.0, 8.0 * sample_rows / n_total)
        thr = int(frac * 16**8) + 1
        cand = base.filter(
            F.conv(F.substring("__k", 1, 8), 16, 10).cast("long")
            < F.lit(thr)
        )
        rows = cand.orderBy("__k").limit(sample_rows).collect()
        if len(rows) >= min(sample_rows, n_total):
            return rows
    return base.orderBy("__k").limit(sample_rows).collect()


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
    rows = _hash_sample_rows(df, sel, sample_rows)
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
    with_vec = F.broadcast(candidates).join(
        encoded.filter(F.col(cluster_col).isin(sorted(cell_to_q))).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
        ),
        "neighbor_id",
    )

    # Exact-rerank kernel choice, MEASURED (r16, guide §1.1): two JVM
    # rewrites of this scoring were built and interleaved-A/B'd against
    # the Arrow kernel at sf0.1 (8 reps each, identical outputs):
    # pandas kernel min 0.71 s / mean 0.96; higher-order expressions
    # with the query matrix as a broadcast driver-literal relation
    # min 1.10 / mean 1.33 (the extra broadcast exchange outweighs the
    # removed crossing); a per-row map-literal lookup min 1.57 / mean
    # 1.81 (interpreted map construction per row). The crossing is NOT
    # the cost — the candidate relation is n_queries x R rows — so the
    # vectorized Arrow kernel stays (bench_artifacts/IVF_RERANK_AB_r16).
    bqv = encoded.sparkSession.sparkContext.broadcast((q_ids, Qn))

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


# ---------------------------------------------------------------------------
# Persisted IVF-PQ index: save / load / O(delta) append + staleness signal
# ---------------------------------------------------------------------------
# The retrieval index got O(delta) maintenance in r12; this is the ANN
# twin (r13, verdict Next #6): the encoded corpus persists as a
# cluster-partitioned table (probed-cell filters prune at the I/O
# layer), the small model (coarse centroids, PQ codebooks, optional OPQ
# rotation) persists alongside, and new vectors are encoded against the
# PERSISTED codebooks — no re-train, one map-only Arrow pass over the
# delta plus a partitioned append. Because the codebooks are frozen, a
# drifting corpus distribution degrades quantization SILENTLY — so every
# append measures the delta's quantization error against the
# training-time baseline and reports when a re-train is due.

IVF_PQ_TABLE_SUFFIXES = (
    "codes", "model", "meta", "cells", "codes__split_staged",
    "model__staged", "meta__staged",
)

# delta-vs-baseline quantization-error ratio past which an append
# recommends re-training: 1.5x mean squared reconstruction error means
# the frozen codebooks waste a third of their precision on the new
# data's geometry (ADC ranking quality decays with exactly this error —
# Jégou et al. 2011, §III).
RETRAIN_DRIFT_RATIO = 1.5

# largest-cell/mean-cell row ratio past which an append recommends
# re-clustering the coarse quantizer: the probe cost of a query that
# hits the hot cell scales with THAT cell's size, not the corpus mean
# (nprobe cells scan serially within a probe task), so a 4x-skewed cell
# quietly makes the worst-case query 4x the planned cost even while
# mean recall and quantization error look fine.
REBALANCE_SKEW_RATIO = 4.0

# a split "separated" its cell when the largest sub-cell kept at most
# this fraction of the rows. NOT separating is necessary but NOT
# sufficient evidence of an unsplittable blob: a split that peels a
# small real cluster (say the 6% original-corpus rows off a flooded
# cell, or a second proto-cluster the coarse quantizer had merged in)
# fails this bar while its dominant remainder may still have structure
# a further split finds. Geometric tests were tried and rejected — the
# natural reference (distance to the nearest other sub-centroid) is
# dominated by whatever far-away cluster the split peeled, making any
# remainder look "tight". The verdict is therefore BEHAVIORAL and
# self-measuring: a strike is recorded when a split fails this bar,
# strikes inherit down the dominant-descendant lineage, and
# SPLIT_STRIKES_LIMIT consecutive futile splits on one lineage flag it
# no_split (persisted). Total futile work is bounded at the limit,
# ever — not per rebalance call.
SPLIT_SEPARATION_MAX = 0.9
SPLIT_STRIKES_LIMIT = 2

_IVF_PQ_META_SCHEMA = (
    "m long, k long, dim long, n_cells long, n_vecs long, "
    "residual boolean, id_col string, code_col string, "
    "cluster_col string, vec_col string, base_mse double, "
    "codes_files long, split_cell long, save_pending boolean"
)
_IVF_PQ_META_FIELDS = [f.split()[0] for f in _IVF_PQ_META_SCHEMA.split(", ")]


def quantization_error(
    df: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray | None = None,
    rotation: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    sample_rows: int = 65536,
    seed: int = 7,
) -> float:
    """Mean squared PQ reconstruction error over a deterministic
    hash-ordered sample of ``df`` — the codebook-staleness signal. The
    sample is the same md5(seed:id) order ``pq_fit`` trains on, so the
    number is reproducible across runs and partitionings. Vectors are
    normalized (the module's cosine contract); in residual mode
    (``centroids`` given) the error is measured on the residuals, and
    under OPQ (``rotation``) in the rotated space — both equal the
    original-space error (the rotation is orthogonal; the centroid
    offset cancels). Needs ``cluster_col`` on ``df`` when residual."""
    C = np.ascontiguousarray(codebooks, dtype=np.float64)
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    sel = [F.col(vec_col).alias("v"), key.alias("__k")]
    if centroids is not None:
        sel.append(F.col(cluster_col).alias("__cell"))
    rows = _hash_sample_rows(df, sel, sample_rows)
    if not rows:
        raise ValueError("quantization_error: empty input")
    X = _norm_rows(np.array([list(r["v"]) for r in rows], dtype=np.float64))
    if centroids is not None:
        Cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
        cells = np.array([r["__cell"] for r in rows], dtype=np.int64)
        X = X - Cn[cells]
    if rotation is not None:
        X = X @ np.asarray(rotation, dtype=np.float64)
    Y = pq_reconstruct(_np_encode(X, C), C)
    return float(((X - Y) ** 2).sum(axis=1).mean())


def _model_rows(kind: str, M: np.ndarray):
    """(kind, i, j, vec) rows for one 2- or 3-d model array."""
    A = np.asarray(M, dtype=np.float64)
    if A.ndim == 2:
        return [(kind, int(i), 0, A[i].tolist()) for i in range(len(A))]
    return [
        (kind, int(i), int(j), A[i, j].tolist())
        for i in range(A.shape[0])
        for j in range(A.shape[1])
    ]


def _model_array(rows, kind: str) -> np.ndarray | None:
    sel = [(r["i"], r["j"], r["vec"]) for r in rows if r["kind"] == kind]
    if not sel:
        return None
    ni = max(i for i, _j, _v in sel) + 1
    nj = max(j for _i, j, _v in sel) + 1
    dim = len(sel[0][2])
    out = np.zeros((ni, nj, dim))
    for i, j, v in sel:
        out[i, j] = v
    return out[:, 0, :] if nj == 1 else out


def _write_ivf_pq_meta(spark, name: str, values: dict) -> None:
    """Replace ``<name>_meta`` through a STAGED table + metadata-only
    rename, never an in-place overwrite (r14 crash-sweep review, same
    class as the r13 model-table finding): the meta row is the ONLY
    copy of the index's self-description — id/vec/cluster/code column
    names and the residual flag are not derivable from the data tables
    — and ``saveAsTable(mode="overwrite")`` drops the table before the
    new data commits, so a crash inside that window would strand a
    permanently unreadable index. ``_recover_staged_meta`` (called
    first at every load) resolves the two swap windows."""
    row = tuple(values.get(f) for f in _IVF_PQ_META_FIELDS)
    staged = f"{name}_meta__staged"
    _clear_staging(spark, staged)
    (
        driver_rows_df(spark, [row], _IVF_PQ_META_SCHEMA)
        .coalesce(1)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(staged)
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}_meta")
    spark.sql(f"ALTER TABLE {staged} RENAME TO {name}_meta")


def _recover_staged_meta(spark, name: str) -> None:
    """Resolve a meta swap a crash interrupted. The meta write is each
    operation's COMMIT point, so the two windows resolve differently:

    - staged ALONGSIDE a live row (crash between the staged write and
      the DROP): REVERT by dropping the staged copy — the operation
      then reads as uncommitted and its OWN consistency machinery
      repairs it (a pending save refuses with re-run guidance, a
      crashed append's codes_files mismatch recounts, a marked split
      finishes idempotently). Never touching the live row means no
      recoverer interleaving can delete the only copy.
    - staged with the live row MISSING (crash between DROP and
      RENAME): COMPLETE the rename — the staged row is the full new
      meta and the rename is metadata. Losing a recovery race is
      tolerated exactly like the model swap's."""
    staged = f"{name}_meta__staged"
    if not spark.catalog.tableExists(staged):
        return
    import warnings as _warnings

    if spark.catalog.tableExists(f"{name}_meta"):
        _warnings.warn(
            f"ivf_pq index {name!r}: dropping a staged meta copy from "
            "an interrupted swap (live meta kept — the interrupted "
            "operation reads as uncommitted and repairs itself)",
            stacklevel=2,
        )
        spark.sql(f"DROP TABLE IF EXISTS {staged}")
        return
    _warnings.warn(
        f"ivf_pq index {name!r}: completing an interrupted meta swap "
        "from the staged table",
        stacklevel=2,
    )
    try:
        spark.sql(f"ALTER TABLE {staged} RENAME TO {name}_meta")
    except Exception:  # noqa: BLE001 — lost a recovery race
        if not spark.catalog.tableExists(f"{name}_meta"):
            raise


def save_ivf_pq(
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    name: str,
    rotation: np.ndarray | None = None,
    residual: bool = False,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    sample_rows: int = 65536,
) -> None:
    """Persist an IVF-PQ index as catalog tables — the deployment shape
    for a long-lived ANN service:

    - ``<name>_codes``: the encoded corpus PARTITIONED BY the cluster
      column, so a query's probed-cells filter is a PARTITION filter —
      unprobed cells are never read from storage (the scale property
      the in-memory operator documents; here it survives restarts).
      Keep ``vec_col`` on ``encoded`` when exact re-ranking is wanted.
    - ``<name>_model``: coarse centroids, PQ codebooks, and the OPQ
      rotation (when given) as (kind, i, j, vec) rows — a few thousand
      small vectors, read once per service start.
    - ``<name>_meta``: one row of shapes, column names, ``residual``
      (codes produced by residual-mode pq_fit/pq_encode must be probed
      in residual mode — persisting the flag removes the footgun), the
      corpus size, a codes-files consistency marker (mirrors the
      retrieval index's: an append that crashes before the meta update
      is detected at load), and ``base_mse`` — the training-time
      quantization error ``ivf_pq_append`` measures drift against
      (null when ``vec_col`` is absent from ``encoded``).
    r16: the ``base_mse`` probe overlaps the staged write sequence on a
    driver thread (it reads only the INPUT relation — guide §2.6), so a
    probe failure (realistically only an EMPTY corpus, which ``pq_fit``
    would have refused long before any save) now surfaces after the
    codes overwrite: the index then refuses at load with the standard
    re-run remedy — the same recoverable state as a crash inside the
    save window, not a new failure mode.

    - ``<name>_cells``: per-cell row counts (n_cells rows) — the
      CELL-BALANCE ledger. Appends update it with O(delta) arithmetic
      (delta assignment counts merged in), and the append report
      derives the skew signal from it: a probe's cost scales with the
      LARGEST probed cell, not the mean, so a frozen coarse quantizer
      developing a hot cell is the probe-latency twin of codebook
      staleness (r13, gap #3 of the round notes)."""
    spark = encoded.sparkSession
    C = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = C.shape
    # base_mse is needed only by the FINAL meta write, and its probe
    # reads the INPUT relation (never the tables this save mutates) —
    # so it runs on a driver thread CONCURRENTLY with the marker/codes/
    # model/cells sequence below (r16, guide §2.6: overlap independent
    # jobs; the same pattern as the dedup probe's literal collect).
    # The mutation ORDER of the save — the crash-safety contract the
    # kill-point sweeps pin — is untouched: the thread performs no
    # catalog mutation, only read jobs.
    mse_thread = None
    mse_box: dict = {}
    if vec_col in encoded.columns:
        from threading import Thread

        def _mse() -> None:
            try:
                mse_box["v"] = quantization_error(
                    encoded,
                    C,
                    centroids=np.asarray(centroids) if residual else None,
                    rotation=rotation,
                    id_col=id_col,
                    vec_col=vec_col,
                    cluster_col=cluster_col,
                    sample_rows=sample_rows,
                )
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                mse_box["e"] = e

        mse_thread = Thread(target=_mse, name="ivfpq-base-mse", daemon=True)
        mse_thread.start()
    # SAVE-INTENT MARKER, written FIRST and cleared by the final meta
    # write (r14 crash sweep): a full save rewrites the CODES before it
    # swaps the model, so a crash anywhere between the codes overwrite
    # and the final meta write can leave new codes with the old model —
    # a mismatch the codes_files recount repair would otherwise
    # misclassify as a crashed append and "repair" into silent
    # corruption. With the marker, load_ivf_pq REFUSES the half-saved
    # index with re-run guidance (the old state is unrecoverable once
    # the codes overwrite starts; honesty is the only safe contract).
    prior_meta: dict = {}
    try:
        prior_meta = {
            k: v
            for k, v in spark.table(f"{name}_meta").first()
            .asDict()
            .items()
            if v is not None
        }
    except Exception:  # noqa: BLE001 — fresh name: minimal marker row
        pass
    _write_ivf_pq_meta(
        spark,
        name,
        {
            **{f: prior_meta.get(f) for f in _IVF_PQ_META_FIELDS},
            "save_pending": True,
        },
    )
    (
        encoded.write.mode("overwrite")
        .partitionBy(cluster_col)
        .format("parquet")
        .saveAsTable(f"{name}_codes")
    )
    _write_model_table(spark, name, centroids, C, rotation)
    n_vecs = _rebuild_cells_table(spark, name, cluster_col)
    base_mse = None
    if mse_thread is not None:
        mse_thread.join()
        if "e" in mse_box:
            raise mse_box["e"]
        base_mse = mse_box["v"]
    _write_ivf_pq_meta(
        spark,
        name,
        {
            "m": int(m),
            "k": int(k),
            "dim": int(m * dsub),
            "n_cells": int(len(centroids)),
            "n_vecs": int(n_vecs),
            "residual": bool(residual),
            "id_col": id_col,
            "code_col": code_col,
            "cluster_col": cluster_col,
            "vec_col": vec_col if vec_col in encoded.columns else None,
            "base_mse": base_mse,
            "codes_files": len(spark.table(f"{name}_codes").inputFiles()),
        },
    )


def _rebuild_cells_table(spark, name: str, cluster_col: str) -> int:
    """Recompute ``<name>_cells`` from the codes table (one combinable
    aggregation — used at save time and as the crashed-append repair)
    and return the total row count it implies. A rebuild derives ONLY
    counts — persisted no-split flags are lost (the diagnostic is
    re-learned by the next failed split, one O(cell) pass)."""
    counts = (
        spark.table(f"{name}_codes")
        .groupBy(F.col(cluster_col).cast("int").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return _write_cells_table(
        spark, name, {int(r["cell"]): int(r["n"]) for r in counts}
    )


def _read_cells_table(spark, name: str) -> tuple[dict, set, dict]:
    """(counts, no_split cell ids, strike counts) from the persisted
    ledger — the flag/strike columns are absent on pre-flag ledgers
    and read as False / 0."""
    counts, flagged, strikes = {}, set(), {}
    for r in spark.table(f"{name}_cells").collect():
        d = r.asDict()
        c = int(d["cell"])
        counts[c] = int(d["n"])
        if d.get("no_split"):
            flagged.add(c)
        if d.get("strikes"):
            strikes[c] = int(d["strikes"])
    return counts, flagged, strikes


def _write_cells_table(
    spark,
    name: str,
    by_cell: dict,
    no_split: set | frozenset = frozenset(),
    strikes: dict | None = None,
) -> int:
    strikes = strikes or {}
    (
        driver_rows_df(
            spark,
            [
                (c, n, c in no_split, int(strikes.get(c, 0)))
                for c, n in sorted(by_cell.items())
            ],
            "cell int, n long, no_split boolean, strikes long",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{name}_cells")
    )
    return sum(by_cell.values())


def ivf_pq_cell_stats(spark, name: str) -> dict:
    """The cell-balance signal from the persisted ledger:
    ``{"n_cells_used", "max_cell", "mean_cell", "skew", "hot_cells",
    "unsplittable"}`` with ``skew = max/mean`` over NON-EMPTY cells,
    ``hot_cells`` the cell ids past ``REBALANCE_SKEW_RATIO`` x mean
    (hotness is a LATENCY fact, so flagged cells stay listed), and
    ``unsplittable`` the persisted no-split verdicts (cells a split
    could not separate — duplicate blobs; the remedy is dedup). Empty
    dict when the index predates the cells ledger (re-save or run one
    append to materialize it)."""
    try:
        counts, flagged, _strikes = _read_cells_table(spark, name)
    except Exception:  # noqa: BLE001 — pre-r13 index
        return {}
    return _cell_stats_from(counts, flagged)


def _cell_stats_from(counts: dict, flagged: set) -> dict:
    """``ivf_pq_cell_stats`` over an already-read ledger — callers that
    just read the cells table (the split path) derive the stats without
    a second collect of the same relation (r16, guide §1.2: don't pay a
    job for numbers already on the driver)."""
    counts = {c: n for c, n in counts.items() if n > 0}
    if not counts:
        return {}
    mean = sum(counts.values()) / len(counts)
    mx = max(counts.values())
    return {
        "n_cells_used": len(counts),
        "max_cell": mx,
        "mean_cell": mean,
        "skew": mx / mean if mean else None,
        "hot_cells": sorted(
            c
            for c, n in counts.items()
            if n > REBALANCE_SKEW_RATIO * mean
        ),
        "unsplittable": sorted(flagged),
    }


def drop_ivf_pq(spark, name: str) -> None:
    """Remove every table ``save_ivf_pq(name=...)`` creates — same
    catalog-safe semantics as the retrieval index's ``drop_index``
    (DROP for catalog-known tables; true-orphan locations cleared
    through the JVM Hadoop FileSystem)."""
    from local_pubchem_db_spark.operators.retrieval import (
        _hadoop_delete,
        _managed_location,
    )

    for sfx in IVF_PQ_TABLE_SUFFIXES:
        ident = f"{name}_{sfx}"
        in_catalog = spark.catalog.tableExists(ident)
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
        if in_catalog:
            continue
        try:
            _hadoop_delete(spark, _managed_location(spark, ident))
        except Exception:  # noqa: BLE001 — best-effort orphan cleanup
            pass


def load_ivf_pq(
    spark, name: str
) -> tuple[DataFrame, np.ndarray, np.ndarray, np.ndarray | None, dict]:
    """``(codes, centroids, codebooks, rotation, meta)`` as persisted by
    ``save_ivf_pq`` — the model arrays collect once per service start
    (a few thousand rows). The codes-files consistency marker is
    verified against the live listing: on mismatch (an append crashed
    before its meta update) the corpus count is RECOUNTED from the
    codes table and the meta row re-synced, with a warning — n_vecs is
    the only derived field, so the recount IS the full repair (the
    model arrays are append-invariant by construction)."""
    import warnings as _warnings

    _recover_staged_meta(spark, name)  # first: everything below reads meta
    _recover_staged_model(spark, name)
    codes = spark.table(f"{name}_codes")
    model = spark.table(f"{name}_model").collect()
    centroids = _model_array(model, "centroid")
    codebooks = _model_array(model, "codebook")
    rotation = _model_array(model, "rotation")
    meta = {
        k: v
        for k, v in spark.table(f"{name}_meta").first().asDict().items()
        if v is not None
    }
    # save-intent marker (r14 crash sweep): a save_ivf_pq that started
    # rewriting this index and never reached its final meta write may
    # have left codes and model from DIFFERENT saves; no repair can
    # reconstruct the overwritten state, so refuse with the remedy.
    if meta.get("save_pending"):
        raise ValueError(
            f"ivf_pq index {name!r}: an interrupted save_ivf_pq left "
            "this index half-written (save_pending marker set) — the "
            "codes and model may come from different saves. Re-run "
            "save_ivf_pq to restore consistency."
        )
    # in-flight split marker (r13): ivf_pq_split_cell stages
    # ``split_cell`` in the meta row BEFORE touching the model, and
    # clears it LAST — so a crash anywhere inside a split is visible
    # here and the split is finished (idempotent: re-assigning the
    # split partitions' rows against the frozen persisted sub-centroids
    # reproduces the same layout) or, if the crash landed before the
    # model write, reverted by clearing the marker.
    if meta.get("split_cell") is not None:
        cell = int(meta["split_cell"])
        n_meta = int(meta["n_cells"])
        if centroids is not None and len(centroids) > n_meta:
            _warnings.warn(
                f"ivf_pq index {name!r}: split of cell {cell} was "
                "interrupted — finishing it from the persisted "
                "sub-centroids",
                stacklevel=2,
            )
            sub_ids = [cell] + list(range(n_meta, len(centroids)))
            meta = _apply_cell_split(
                spark, name, meta, centroids, codebooks, rotation,
                sub_ids,
            )
        else:
            _warnings.warn(
                f"ivf_pq index {name!r}: split marker for cell {cell} "
                "but no staged sub-centroids (crash before the model "
                "write) — clearing the marker, index unchanged",
                stacklevel=2,
            )
            meta["split_cell"] = None
            _write_ivf_pq_meta(
                spark, name, {f: meta.get(f) for f in _IVF_PQ_META_FIELDS}
            )
        meta = {k: v for k, v in meta.items() if v is not None}
        codes = spark.table(f"{name}_codes")
    marker = meta.get("codes_files")
    if marker is not None and len(codes.inputFiles()) != int(marker):
        _warnings.warn(
            f"ivf_pq index {name!r}: codes table has "
            f"{len(codes.inputFiles())} files but meta describes "
            f"{marker} (a crashed append?) — recounting n_vecs",
            stacklevel=2,
        )
        # the recount pass doubles as the cells-ledger rebuild (same
        # aggregation), so the skew signal is repaired along with n_vecs
        meta["n_vecs"] = _rebuild_cells_table(
            spark, name, meta["cluster_col"]
        )
        meta["codes_files"] = len(codes.inputFiles())
        _write_ivf_pq_meta(
            spark, name, {f: meta.get(f) for f in _IVF_PQ_META_FIELDS}
        )
    return codes, centroids, codebooks, rotation, meta


def ivf_pq_append(
    spark,
    name: str,
    new_vecs: DataFrame,
    drift_threshold: float = RETRAIN_DRIFT_RATIO,
    sample_rows: int = 65536,
) -> dict:
    """O(delta) append to a persisted IVF-PQ index: assign the new
    vectors to the FROZEN coarse centroids, encode them against the
    FROZEN codebooks (one map-only Arrow pass — no re-train, no touch
    of the existing corpus), append to the partitioned codes table, and
    refresh the meta row LAST (so a crash leaves a detectable marker
    mismatch, not silent corruption — same contract as the retrieval
    index's append).

    Contract mirror of ``save_postings(mode="append")``: the batch must
    carry NEW ids (a re-appended id duplicates its rows in the codes
    relation itself — dedup before ingest), and ``new_vecs`` must carry
    the non-derived columns of the original corpus (at least the id and
    vector columns; the cluster and code columns are derived here).

    Returns the STALENESS REPORT the frozen-codebook design needs:
    ``{"n_appended", "base_mse", "delta_mse", "drift_ratio",
    "retrain_recommended", "cell_skew", "hot_cells",
    "rebalance_recommended"}`` — ``delta_mse`` is the appended batch's
    quantization error under the persisted codebooks, measured on the
    same deterministic sample recipe as the baseline; a ratio past
    ``drift_threshold`` means the corpus distribution has moved off the
    training sample and a ``pq_fit`` re-train is due (the classic
    failure mode of incremental ANN maintenance: recall decays with no
    error anywhere). Drift fields are None when the index was saved
    without raw vectors (no baseline to compare against).

    The CELL-BALANCE half (r13): the per-cell ledger is merged with the
    delta's assignment counts — O(cells + delta) arithmetic, never a
    corpus pass — and ``cell_skew = max/mean`` over non-empty cells
    with ``hot_cells`` past ``REBALANCE_SKEW_RATIO``x mean. A frozen
    coarse quantizer developing a hot cell is the probe-LATENCY twin of
    codebook staleness: a query probing that cell scans its whole cell
    serially, so worst-case latency grows with the skew while recall
    and quantization error look fine. An index saved before the ledger
    existed gets it rebuilt here (one aggregation, warned)."""
    from pyspark.sql.types import BinaryType

    from local_pubchem_db_spark.operators.clustering import assign_clusters

    codes, centroids, codebooks, rotation, meta = load_ivf_pq(spark, name)
    id_col, vec_col = meta["id_col"], meta.get("vec_col", "embedding")
    cluster_col, code_col = meta["cluster_col"], meta["code_col"]
    residual = bool(meta.get("residual"))
    assigned = new_vecs.join(
        assign_clusters(
            new_vecs, centroids, vec_col=vec_col, id_col=id_col
        ).withColumnRenamed("id", id_col).withColumnRenamed(
            "cluster", cluster_col
        ),
        id_col,
    )
    delta_mse = None
    if meta.get("base_mse") is not None:
        delta_mse = quantization_error(
            assigned,
            codebooks,
            centroids=centroids if residual else None,
            rotation=rotation,
            id_col=id_col,
            vec_col=vec_col,
            cluster_col=cluster_col,
            sample_rows=sample_rows,
        )
    encoded = pq_encode(
        assigned,
        codebooks,
        vec_col=vec_col,
        out_col=code_col,
        centroids=centroids if residual else None,
        cluster_col=cluster_col,
        rotation=rotation,
        binary_codes=isinstance(
            codes.schema[code_col].dataType, BinaryType
        ),
    )
    delta = encoded.select(*codes.columns)
    # ONE aggregation over the delta serves both the append count and
    # the cells-ledger merge (O(delta); the previous count() is folded
    # into it)
    delta_counts = {
        int(r["cell"]): int(r["n"])
        for r in delta.groupBy(
            F.col(cluster_col).cast("int").alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_appended = sum(delta_counts.values())
    (
        delta.write.mode("append")
        .partitionBy(cluster_col)
        .format("parquet")
        .saveAsTable(f"{name}_codes")
    )
    try:
        merged, flagged, strikes = _read_cells_table(spark, name)
    except Exception:  # noqa: BLE001 — pre-ledger index: rebuild once
        import warnings as _warnings

        _warnings.warn(
            f"ivf_pq index {name!r} predates the cells ledger — "
            "rebuilding it from the codes table (one aggregation)",
            stacklevel=2,
        )
        # the codes table already contains the delta here, so the
        # rebuild is the post-append truth; skip the merge below
        _rebuild_cells_table(spark, name, cluster_col)
        merged = None
    if merged is not None:
        for c, n in delta_counts.items():
            merged[c] = merged.get(c, 0) + n
        _write_cells_table(
            spark, name, merged, no_split=flagged, strikes=strikes
        )
    meta["n_vecs"] = int(meta.get("n_vecs", 0)) + int(n_appended)
    meta["codes_files"] = len(spark.table(f"{name}_codes").inputFiles())
    _write_ivf_pq_meta(
        spark, name, {f: meta.get(f) for f in _IVF_PQ_META_FIELDS}
    )
    base_mse = meta.get("base_mse")
    ratio = (
        (delta_mse / base_mse)
        if (delta_mse is not None and base_mse)
        else None
    )
    cells = ivf_pq_cell_stats(spark, name)
    return {
        "n_appended": int(n_appended),
        "base_mse": base_mse,
        "delta_mse": delta_mse,
        "drift_ratio": ratio,
        "retrain_recommended": bool(ratio and ratio > drift_threshold),
        "cell_skew": cells.get("skew"),
        "hot_cells": cells.get("hot_cells", []),
        "rebalance_recommended": bool(cells.get("hot_cells")),
    }


def _write_model_table(
    spark,
    name: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    rotation: np.ndarray | None,
) -> None:
    """Replace ``<name>_model`` through a STAGED table + metadata-only
    rename, never an in-place overwrite: the model is the ONLY copy of
    the centroids/codebooks (codes are quantized — nothing derives the
    model back), and ``saveAsTable(mode="overwrite")`` drops the table
    before the new data commits, so a crash in that window would lose
    the index outright (r13 review finding). A crash around the swap
    instead leaves either the old model (staged write incomplete) or a
    completed staged copy that ``_recover_staged_model`` — called at
    every load — finishes renaming. Mirrors the retrieval index's
    termdf swap, including clearing a crash-stranded staging location
    with no catalog entry."""
    rows = _model_rows("centroid", centroids) + _model_rows(
        "codebook", np.ascontiguousarray(codebooks, dtype=np.float64)
    )
    if rotation is not None:
        rows += _model_rows("rotation", rotation)
    staged = f"{name}_model__staged"
    _clear_staging(spark, staged)
    (
        driver_rows_df(
            spark, rows, "kind string, i long, j long, vec array<double>"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(staged)
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}_model")
    spark.sql(f"ALTER TABLE {staged} RENAME TO {name}_model")


def _clear_staging(spark, ident: str) -> None:
    """DROP a staging table and, when it was NOT catalog-known (a
    crash stranded the warehouse DIRECTORY with no catalog entry —
    LOCATION_ALREADY_EXISTS on the next write otherwise), clear the
    conventional location through the JVM Hadoop FileSystem. Existence
    is captured BEFORE the DROP (after it the check is vacuously
    true — r13 review finding)."""
    from local_pubchem_db_spark.operators.retrieval import (
        _hadoop_delete,
        _managed_location,
    )

    known = spark.catalog.tableExists(ident)
    spark.sql(f"DROP TABLE IF EXISTS {ident}")
    if not known:
        try:
            _hadoop_delete(spark, _managed_location(spark, ident))
        except Exception:  # noqa: BLE001 — best-effort orphan cleanup
            pass


def _recover_staged_model(spark, name: str) -> None:
    """Resolve a model swap a crash interrupted, WITHOUT ever creating
    a window where no copy of the model exists (r13 review finding:
    the first cut ran DROP live + RENAME staged on every coexist,
    which two racing loaders could interleave into deleting both).

    - staged present, live model MISSING (crash between the swap's
      DROP and RENAME): complete the rename — the staged table is the
      full new model and the rename is metadata. Losing a race to
      another loader is tolerated: if the rename fails but the live
      model exists afterwards, someone else finished it.
    - staged present ALONGSIDE a live model (crash between the staged
      write and the DROP): REVERT by dropping the staged copy. The
      live model + the split marker are a consistent pre-swap state
      the marker logic already reverts, and never touching the live
      table means no interleaving can delete the only copy. The cost
      is re-running the interrupted split's k-means — crash recovery
      buys safety with recomputation, never the reverse. (A full
      save_ivf_pq interrupted in this window keeps its OLD model —
      same as the pre-split-era behavior; re-run the save.)"""
    staged = f"{name}_model__staged"
    if not spark.catalog.tableExists(staged):
        return
    import warnings as _warnings

    if spark.catalog.tableExists(f"{name}_model"):
        # Which operation staged this copy decides whether reverting is
        # safe (ADVICE r13): a SPLIT writes its marker before the model,
        # so marker present -> live model + marker are a consistent
        # pre-swap state and dropping the staged copy is a clean revert.
        # No marker -> an interrupted save_ivf_pq, which rewrites the
        # CODES before swapping the model — the live codes may already
        # be encoded against the staged (newer) model, and silently
        # dropping it would leave a cleanly-loading index with
        # mismatched codes/codebooks.
        marker = codes_files_meta = pending = None
        try:
            row = spark.table(f"{name}_meta").first().asDict()
            marker = row.get("split_cell")
            codes_files_meta = row.get("codes_files")
            pending = row.get("save_pending")
        except Exception:  # noqa: BLE001 — pre-meta or missing table
            pass
        if pending:
            # the save-intent marker proves this staged copy belongs to
            # an interrupted save_ivf_pq — keep BOTH copies and refuse,
            # same contract as load's own save_pending check
            raise ValueError(
                f"ivf_pq index {name!r}: an interrupted save_ivf_pq "
                "left this index half-written (save_pending marker set "
                "with a staged model coexisting) — re-run save_ivf_pq "
                "to restore consistency."
            )
        if marker is not None:
            _warnings.warn(
                f"ivf_pq index {name!r}: dropping a staged model copy "
                "from an interrupted swap (live model kept — the marker "
                "logic reverts the in-flight split)",
                stacklevel=2,
            )
            spark.sql(f"DROP TABLE IF EXISTS {staged}")
            return
        if codes_files_meta is not None:
            try:
                live_files = len(
                    spark.table(f"{name}_codes").inputFiles()
                )
            except Exception:  # noqa: BLE001 — codes table unreadable
                live_files = None
            if live_files is not None and live_files != int(
                codes_files_meta
            ):
                raise ValueError(
                    f"ivf_pq index {name!r}: a staged model coexists "
                    "with the live model, no split is in flight, and "
                    "the codes table does not match the meta "
                    "consistency marker — an interrupted save_ivf_pq "
                    "already rewrote the codes against the staged "
                    "(newer) model. Re-run save_ivf_pq to restore "
                    "consistency; dropping the staged copy would leave "
                    "the codes silently mismatched with the model."
                )
        _warnings.warn(
            f"ivf_pq index {name!r}: dropping a staged model copy from "
            "an interrupted save_ivf_pq (live model kept). The codes "
            "table may hold rows encoded against the NEWER staged "
            "model — re-run the save if the interrupted operation was "
            "save_ivf_pq",
            stacklevel=2,
        )
        spark.sql(f"DROP TABLE IF EXISTS {staged}")
        return
    _warnings.warn(
        f"ivf_pq index {name!r}: completing an interrupted model swap "
        "from the staged table",
        stacklevel=2,
    )
    try:
        spark.sql(f"ALTER TABLE {staged} RENAME TO {name}_model")
    except Exception:  # noqa: BLE001 — lost a recovery race
        if not spark.catalog.tableExists(f"{name}_model"):
            raise


def _apply_cell_split(
    spark,
    name: str,
    meta: dict,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    rotation: np.ndarray | None,
    sub_ids: list[int],
) -> dict:
    """The idempotent body of a cell split, shared by
    ``ivf_pq_split_cell`` and ``load_ivf_pq``'s crash recovery: given
    the FULL centroid matrix already persisted in the model table
    (parent row replaced by sub-centroid 0, the other sub-centroids
    appended at the tail), re-assign the rows of partitions ``sub_ids``
    among ``centroids[sub_ids]``, re-encode in residual mode (codes are
    residuals vs the coarse centroid, which just moved), rewrite ONLY
    those partitions (dynamic partition overwrite — unsplit cells are
    never read or written), merge the cells ledger, and clear the
    in-flight marker in the meta row LAST. Deterministic given the
    persisted model, so re-running after a crash reproduces the same
    layout. Returns the refreshed meta dict."""
    from pyspark.sql.types import BinaryType

    from local_pubchem_db_spark.operators.clustering import assign_clusters

    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cluster_col, code_col = meta["cluster_col"], meta["code_col"]
    tbl = f"{name}_codes"
    codes = spark.table(tbl)
    rows = codes.filter(
        F.col(cluster_col).isin([int(i) for i in sub_ids])
    )
    sub_assign = (
        assign_clusters(
            rows,
            centroids[np.asarray(sub_ids)],
            vec_col=vec_col,
            id_col=id_col,
        )
        .withColumnRenamed("cluster", "__sub")
        .withColumnRenamed("id", id_col)
    )
    idmap = F.array(*[F.lit(int(i)) for i in sub_ids])
    assigned = (
        rows.drop(cluster_col)
        .join(sub_assign, id_col)
        .withColumn(
            cluster_col,
            F.element_at(idmap, F.col("__sub") + 1).cast("int"),
        )
        .drop("__sub")
    )
    if bool(meta.get("residual")):
        assigned = pq_encode(
            assigned.drop(code_col),
            codebooks,
            vec_col=vec_col,
            out_col=code_col,
            centroids=centroids,
            cluster_col=cluster_col,
            rotation=rotation,
            binary_codes=isinstance(
                codes.schema[code_col].dataType, BinaryType
            ),
        )
    # Stage the re-assigned rows in a table of their own first: the
    # INSERT OVERWRITE below cannot read from the table it overwrites
    # (Spark's self-overwrite analysis rule), and the staging write is
    # O(cell) anyway. Mirrors the retrieval index's staged-swap
    # handling, including clearing a crash-stranded staging location
    # with no catalog entry (ADVICE r12).
    staged = f"{name}_codes__split_staged"
    _clear_staging(spark, staged)
    (
        assigned.select(*codes.columns)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(staged)
    )
    # Expected per-sub-cell counts come from the STAGED table, BEFORE the
    # overwrite (ADVICE r13 high): counting the live table afterwards is
    # self-masking for the exact case the stale-partition gate targets —
    # when sub-centroid 0 (the parent cell id) attracts zero re-assigned
    # rows, the dynamic overwrite never touches the parent's partition,
    # so its untouched stale rows make the post-overwrite count nonzero,
    # the ==0 gate never fires, and the index silently keeps every
    # original cell row twice. The staged table holds exactly the rows
    # being written, so its counts are ground truth for both the gate
    # and the ledger merge; n_cells-bounded collect.
    counts = {
        int(r["cell"]): int(r["n"])
        for r in spark.table(staged)
        .groupBy(F.col(cluster_col).cast("int").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    conf = spark.conf
    prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # positional insertInto: the catalog schema lists the partition
        # column last, so select in table order
        spark.table(staged).select(*codes.columns).write.insertInto(
            tbl, overwrite=True
        )
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.sql(f"DROP TABLE IF EXISTS {staged}")
    # dynamic overwrite only touches partitions PRESENT in the output:
    # a sub-cell that attracted zero rows (possible for the parent id
    # when every row sits nearer another sub-centroid) keeps its stale
    # files — clear such partitions explicitly, gated on the EXPECTED
    # count so a stale parent partition cannot vouch for itself
    for sid in sub_ids:
        if counts.get(int(sid), 0) == 0 and _partition_has_files(
            spark, tbl, cluster_col, int(sid)
        ):
            _drop_codes_partition(spark, tbl, cluster_col, int(sid))
    try:
        merged, flagged, strikes = _read_cells_table(spark, name)
        for sid in sub_ids:
            merged.pop(int(sid), None)
            # a fresh split resets the verdict (not the strike count —
            # the lineage rule in ivf_pq_split_cell updates strikes
            # from the OUTCOME of this split, after the merge)
            flagged.discard(int(sid))
        merged.update(counts)
        _write_cells_table(
            spark, name, merged, no_split=flagged, strikes=strikes
        )
    except Exception:  # noqa: BLE001 — pre-ledger index: full rebuild
        _rebuild_cells_table(spark, name, cluster_col)
    meta = dict(meta)
    meta["n_cells"] = int(len(centroids))
    meta["codes_files"] = len(spark.table(tbl).inputFiles())
    meta["split_cell"] = None
    _write_ivf_pq_meta(
        spark, name, {f: meta.get(f) for f in _IVF_PQ_META_FIELDS}
    )
    return meta


def _partition_has_files(spark, tbl: str, cluster_col: str, cell: int) -> bool:
    try:
        return bool(
            spark.table(tbl)
            .filter(F.col(cluster_col) == cell)
            .inputFiles()
        )
    except Exception:  # noqa: BLE001 — listing probe
        return True


def _drop_codes_partition(spark, tbl: str, cluster_col: str, cell: int) -> None:
    """Remove one stale partition's data: partition DDL where the
    catalog supports it, else a direct Hadoop delete of the partition
    DIRECTORY (resolved from the partition's own input files, never a
    guessed path, and only when the directory name proves it is that
    partition) + refresh — the same JVM delete path drop_index uses."""
    try:
        spark.sql(
            f"ALTER TABLE {tbl} DROP IF EXISTS PARTITION "
            f"({cluster_col}={cell})"
        )
        spark.catalog.refreshTable(tbl)
        if not _partition_has_files(spark, tbl, cluster_col, cell):
            return
    except Exception:  # noqa: BLE001 — catalog without partition DDL
        pass
    from local_pubchem_db_spark.operators.retrieval import _hadoop_delete

    files = (
        spark.table(tbl).filter(F.col(cluster_col) == cell).inputFiles()
    )
    dirs = {f.rsplit("/", 1)[0] for f in files}
    for d in dirs:
        if d.rstrip("/").endswith(f"{cluster_col}={cell}"):
            _hadoop_delete(spark, d)
    spark.catalog.refreshTable(tbl)


def ivf_pq_split_cell(
    spark,
    name: str,
    cell: int | None = None,
    parts: int = 2,
    max_iter: int = 10,
    blob_sample: int = 256,
) -> dict:
    """Split ONE cell of a persisted IVF-PQ index into ``parts``
    sub-cells — the O(hot-cell) act the cell-balance ledger's
    ``rebalance_recommended`` signal calls for (r13; previously the
    only remedy was a full re-train/re-save, O(corpus)). A hot cell
    under a frozen coarse quantizer is a probe-LATENCY defect: a query
    probing it scans the whole cell serially, so worst-case latency
    grows with the skew while recall and quantization error look fine.

    Everything touched is proportional to the CELL, never the corpus:

    - sub-centroids: distributed k-means over the cell's rows only
      (``kmeans_fit`` — the probed-cell partition filter prunes the
      scan to the cell);
    - the parent centroid row is REPLACED by sub-centroid 0 and the
      rest append at the matrix tail (cluster id == centroid row index
      is the module invariant, so existing ids stay valid and search /
      append code paths need no change — they just see more cells);
    - the cell's rows re-assign among the sub-centroids and re-encode
      when the index is residual-mode (residuals are taken against the
      coarse centroid, which just moved); unsplit cells are never read
      or written (dynamic partition overwrite);
    - the cells ledger and meta update in O(parts).

    CRASH CONTRACT (mirrors the retrieval index's staged swap): the
    split stages ``split_cell`` in the meta row FIRST, then writes the
    model, then the partitions, then clears the marker LAST —
    ``load_ivf_pq`` finishes an interrupted split from the persisted
    sub-centroids (idempotent re-assignment) or reverts a marker with
    no staged model. Assignment semantics caveat, stated honestly: the
    cell's vectors re-assign among the CELL'S sub-centroids only (their
    true global argmin could be another cell's centroid — same
    inherited-boundary property every IVF split has); probing is
    unchanged and global, and sub-centroids lie inside the parent's
    region, so queries that probed the parent rank them high. Recall
    on split cells is test-pinned via exact-copy probes.

    ``cell=None`` splits the LARGEST cell. Requires the index to carry
    raw vectors (``vec_col`` persisted at save — the same precondition
    as re-ranking). Returns ``{"cell", "sub_ids", "counts",
    "n_cells", "cell_skew", "hot_cells", "separated"}`` —
    ``separated=False`` means the cell is one tight blob clustering
    cannot balance (persisted as the ledger's ``no_split`` verdict;
    the remedy is dedup). When the verdict fires, the report carries
    the remedy's INPUT (r14, verdict Next #5): ``no_split_flagged`` —
    the flagged dominant descendant — and ``blob_sample_ids``, up to
    ``blob_sample`` ids from that cell (one partition-pruned limit
    scan), so the named remedy is one call away:
    ``dedup_keep_ids(corpus.join(ids_df, id_col), pairs, id_col)`` or
    ``semantic_dedup`` over ``corpus.join(ids_df, id_col)``."""
    codes, centroids, codebooks, rotation, meta = load_ivf_pq(spark, name)
    if parts < 2:
        raise ValueError(f"parts must be >= 2, got {parts}")
    vec_col = meta.get("vec_col")
    if not vec_col or vec_col not in codes.columns:
        raise ValueError(
            f"ivf_pq_split_cell needs raw vectors in {name}_codes "
            "(save_ivf_pq with vec_col present) — splitting re-assigns "
            "and re-encodes the cell's vectors"
        )
    cluster_col, id_col = meta["cluster_col"], meta["id_col"]
    if cell is None:
        try:
            ledger, flagged, _st = _read_cells_table(spark, name)
        except Exception:  # noqa: BLE001 — pre-ledger index: build it
            _rebuild_cells_table(spark, name, cluster_col)
            ledger, flagged, _st = _read_cells_table(spark, name)
        if not ledger:
            raise ValueError(f"ivf_pq index {name!r}: empty cells ledger")
        # prefer the largest cell WITHOUT a persisted no-split verdict;
        # if every cell is flagged, fall back to the global largest
        # (the caller asked for a split — the fresh attempt resets the
        # verdict, and data may have changed since it was recorded)
        unflagged = {c: n for c, n in ledger.items() if c not in flagged}
        cell = max(unflagged or ledger, key=(unflagged or ledger).get)
    cell = int(cell)
    if not 0 <= cell < len(centroids):
        raise ValueError(
            f"cell {cell} out of range (index has {len(centroids)} cells)"
        )
    from local_pubchem_db_spark.operators.clustering import kmeans_fit

    cell_rows = codes.filter(F.col(cluster_col) == cell)
    # farthest-point seeding, not lowest-id (r13, measured): a flooded
    # cell's smallest ids all sit in the ORIGINAL blob, so lowest-id
    # seeds make Lloyd peel splinters instead of separating the
    # flood's modes — the rebalance loop then spins against its bound
    sub = kmeans_fit(
        cell_rows, vec_col=vec_col, id_col=id_col, k=parts,
        max_iter=max_iter, init="farthest",
    )
    n_old = len(centroids)
    new_centroids = np.vstack([np.asarray(centroids, dtype=np.float64),
                               sub[1:]])
    new_centroids[cell] = sub[0]
    sub_ids = [cell] + list(range(n_old, n_old + parts - 1))
    # stage the in-flight marker FIRST (n_cells stays old: recovery
    # derives the tail ids from n_cells vs the model's row count)
    _write_ivf_pq_meta(
        spark,
        name,
        {**{f: meta.get(f) for f in _IVF_PQ_META_FIELDS},
         "split_cell": cell},
    )
    _write_model_table(spark, name, new_centroids, codebooks, rotation)
    meta = _apply_cell_split(
        spark, name, {**meta, "split_cell": cell}, new_centroids,
        codebooks, rotation, sub_ids,
    )
    # ONE read of the (tiny) cells ledger serves the stats, the
    # per-sub-cell counts, AND the strike/flag bookkeeping below — this
    # block previously collected the same relation three times (r16,
    # guide §1.2)
    merged, flagged, strikes = _read_cells_table(spark, name)
    stats = _cell_stats_from(dict(merged), set(flagged))
    counts = {s: merged.get(int(s), 0) for s in sub_ids}
    total = sum(counts.values())
    # separation diagnostic (r13, found by measure_r13_split): a hot
    # cell that is ONE tight blob — near-duplicate floods are exactly
    # this shape — cannot be balanced by ANY clustering; k-means
    # correctly keeps the blob together and the split only peels
    # whatever genuinely-distinct rows share the cell. The verdict is
    # BEHAVIORAL (see SPLIT_STRIKES_LIMIT — geometric references were
    # tried and rejected): a non-separated split records a STRIKE on
    # the dominant descendant, inherited from the cell's own strike
    # count; at the limit the lineage is flagged no_split in the
    # ledger, so every future rebalance — this loop or a later call
    # in a long-lived service — skips it instead of re-paying an
    # O(blob) split per call (r13 review). A separated split resets
    # the lineage. The latency remedy for a flagged cell is DEDUP
    # (operators/dedup.py, cosine_neardup / semantic_dedup), not more
    # centroids; an explicit ``cell=`` split of a flagged cell is
    # honored (the caller overrides; data may have changed) and its
    # outcome re-judges the verdict.
    separated = bool(
        total and max(counts.values()) <= SPLIT_SEPARATION_MAX * total
    )
    no_split_flagged = None
    blob_sample_ids = None
    if total:
        dominant = int(max(counts, key=counts.get))
        if separated:
            for sid in sub_ids:
                strikes.pop(int(sid), None)
                flagged.discard(int(sid))
        else:
            # the lineage's strike moves WITH the blob: the dominant
            # descendant inherits the split cell's count plus one
            inherited = strikes.pop(int(cell), 0) + 1
            strikes[dominant] = inherited
            if inherited >= SPLIT_STRIKES_LIMIT:
                # flag ONLY the dominant descendant — it carries the
                # lineage. The parent id may now be a small peeled
                # sub-cell that was never shown unsplittable; flagging
                # it too would make future rebalances wrongly skip it
                # (ADVICE r13). When the parent IS dominant it is
                # flagged as the dominant, not as the parent.
                flagged.add(dominant)
                no_split_flagged = dominant
                # hand the caller the blob (r14, verdict Next #5): the
                # verdict names dedup as the remedy, so the report
                # carries a bounded id sample of the flagged cell —
                # one partition-pruned limit scan of rows this split
                # just rewrote — making the remedy one call:
                # dedup_keep_ids(corpus.join(sample, id), pairs, id)
                # (or semantic_dedup over corpus.join(sample)).
                blob_sample_ids = [
                    r[0]
                    for r in spark.table(f"{name}_codes")
                    .filter(F.col(cluster_col) == dominant)
                    .select(id_col)
                    .limit(int(blob_sample))
                    .collect()
                ]
        _write_cells_table(
            spark, name, merged, no_split=flagged, strikes=strikes
        )
    return {
        "cell": cell,
        "sub_ids": sub_ids,
        "counts": counts,
        "n_cells": int(meta["n_cells"]),
        "cell_skew": stats.get("skew"),
        "hot_cells": stats.get("hot_cells", []),
        "separated": separated,
        "no_split_flagged": no_split_flagged,
        "blob_sample_ids": blob_sample_ids,
    }


def ivf_pq_rebalance(
    spark,
    name: str,
    parts: int = 2,
    max_splits: int = 8,
    blob_sample: int = 256,
) -> list[dict]:
    """Drive ``ivf_pq_split_cell`` from the ledger's own signal: split
    the hottest cell while ``hot_cells`` is non-empty (hot = past
    ``REBALANCE_SKEW_RATIO`` x mean), up to ``max_splits`` (splits can
    shift the mean, so a bound keeps the loop honest rather than
    chasing a moving threshold). Futility is judged by the persisted
    two-strike lineage rule (see ``SPLIT_STRIKES_LIMIT``): a split
    that does not separate (one sub-cell kept >90% of the rows)
    strikes its dominant descendant, a second consecutive futile
    split flags the lineage ``no_split`` IN THE LEDGER, and every
    future rebalance — this loop or a later call in a long-lived
    service — skips it instead of re-paying an O(blob) split per call
    (r13 review finding). The remedy for a flagged near-duplicate
    blob is dedup, not more centroids (r13, measured). Total work is
    the sum of the split cells' sizes — never a corpus pass. Returns
    the per-split reports."""
    reports: list[dict] = []
    for _ in range(max_splits):
        stats = ivf_pq_cell_stats(spark, name)
        skip = set(stats.get("unsplittable") or [])
        candidates = [
            c for c in (stats.get("hot_cells") or []) if c not in skip
        ]
        if not candidates:
            break
        ledger, _flags, _st = _read_cells_table(spark, name)
        hottest = max(candidates, key=lambda c: ledger.get(c, 0))
        reports.append(
            ivf_pq_split_cell(
                spark,
                name,
                cell=hottest,
                parts=parts,
                blob_sample=blob_sample,
            )
        )
    return reports


def ivf_pq_search_persisted(
    spark,
    name: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    rerank: int | None = None,
    index: tuple | None = None,
) -> DataFrame:
    """``ivf_pq_search`` over a persisted index: probes the
    cluster-PARTITIONED codes table (unprobed cells pruned at the I/O
    layer) with the persisted residual/rotation settings — the
    restart-safe service entry point. ``index``: a ``load_ivf_pq``
    tuple a long-lived service passes to skip the per-call model read."""
    codes, centroids, codebooks, rotation, meta = (
        index if index is not None else load_ivf_pq(spark, name)
    )
    return ivf_pq_search(
        codes,
        queries,
        centroids,
        codebooks,
        id_col=meta["id_col"],
        code_col=meta["code_col"],
        cluster_col=meta["cluster_col"],
        vec_col=meta.get("vec_col", "embedding"),
        k=k,
        nprobe=nprobe,
        residual=bool(meta.get("residual")),
        rerank=rerank,
        rotation=rotation,
    )
