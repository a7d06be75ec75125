"""Distributed Bloom filter for membership pruning at scales where the
exact key set no longer broadcasts.

``operators/dedup.py:decontaminate`` broadcasts the eval corpus's
DISTINCT winnowing fingerprints — the right plan while eval suites are
thousands of documents. When the "reference set" grows to hundreds of
millions of keys (decontaminating against an entire held-out corpus, or
pruning a 100 TB table against another table's key set), an exact
broadcast is GBs; a Bloom filter at ~10 bits/key is 10-50x smaller and
its false positives only OVER-drop — the safe direction for
decontamination and for join pre-filters (Spark's own runtime bloom
join, SPARK-32268, makes the same trade; the Catalyst aggregate it uses
is not exposed to the function registry, hence this operator).

Division of labor (keep the hash JVM-side, Python only touches bits):
- bit positions are ``pmod(xxhash64(key, seed_i), n_bits)`` — computed
  by codegen'd expressions in BOTH build and probe, so the two sides
  can never disagree on the hash;
- the build sets bits in a per-task numpy bitmap inside
  ``mapInPandas`` on the key relation's NATURAL partitions (map-only:
  the position stream never shuffles), emitting chunk-bounded partial
  rows that an executor-side tree fold ORs down to one row per chunk
  (commutative — partitioning-invariant bytes);
- the probe tests k positions per key against the broadcast bitmap in
  an Arrow-batched pandas UDF (a vectorized gather, no Python loop).

Sizing: false-positive rate ~= (1 - e^{-k*n/m})^k for n keys, m bits,
k probes; k=5, m=10n gives ~0.9%. Driver traffic is ``n_bits/8``
bytes total however many partitions the build ran on; see
``bloom_build`` for the per-task memory ceiling and the
``partition_by_chunk`` huge-bitmap mode.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from local_pubchem_db_spark.operators.util import fan_out


def _positions(key: Column, n_bits: int, k: int) -> Column:
    """array<long> of the key's k bit positions; pure codegen."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(f"bloom:{i}")), F.lit(n_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 24,
    k: int = 5,
    build_partitions: int | None = None,
    fold_fanin: int = 8,
    chunk_bytes: int = 1 << 23,
    partition_by_chunk: bool = False,
) -> bytes:
    """Bitmap (``n_bits/8`` bytes) with every key's k positions set.

    Default shape is MAP-ONLY up to the one-row partials: positions are
    computed and OR-ed into a per-task bitmap on the key relation's
    NATURAL partitions — the position stream (n_keys x k longs, the
    dominant data volume) never shuffles (the r7 shape repartitioned it
    first: one full Exchange bought nothing the fold doesn't already
    absorb). Partials are emitted as ``chunk_bytes``-sized chunk rows,
    then an executor-side tree fold (fan-in ``fold_fanin`` per level,
    each level a real repartition barrier so set_bits stays parallel)
    ORs them down to one row per chunk before the collect — driver
    traffic is ``n_bits/8`` bytes total regardless of how many scan
    partitions the corpus has. Bytes are identical for any input
    partitioning or row order (bit-OR is commutative).

    Memory ceiling: each build task allocates the FULL ``n_bits/8``
    bitmap, so concurrent-tasks x bitmap bytes must fit the executor —
    fine through ~2^28 bits (32 MiB x 32 tasks = 1 GiB), not at 2^32
    (512 MiB/task). Past that, ``partition_by_chunk=True`` trades ONE
    shuffle of the position stream (hash by chunk index) for per-task
    allocations of only the chunks it owns (~``chunk_bytes``), and
    needs no fold at all: every chunk's positions land in one task, so
    the partials ARE the final per-chunk rows. Shuffled rows never
    exceed ``chunk_bytes`` in either mode (the ADVICE-r7 concern: a
    2^32-bit fold moved 512 MiB rows through Arrow).

    ``build_partitions`` (optional) repartitions the position stream to
    exactly that many tasks first — the legacy shape, still useful to
    raise parallelism when the key relation is a single partition.
    """
    if n_bits % 8 != 0 or n_bits <= 0:
        raise ValueError("n_bits must be a positive multiple of 8")
    if k < 1:
        raise ValueError("k must be >= 1")
    if fold_fanin < 2:
        raise ValueError("fold_fanin must be >= 2")
    if chunk_bytes < 1:
        raise ValueError("chunk_bytes must be >= 1")
    if partition_by_chunk and build_partitions is not None:
        raise ValueError(
            "build_partitions and partition_by_chunk are mutually "
            "exclusive: the chunk mode partitions the position stream "
            "by chunk index, so a row-count repartition cannot apply"
        )
    n_bytes = n_bits // 8
    chunk_bytes = min(chunk_bytes, n_bytes)
    n_chunks = -(-n_bytes // chunk_bytes)
    pos = keys.select(
        F.explode(_positions(F.col(key_col), n_bits, k)).alias("pos")
    )
    if partition_by_chunk and n_chunks > 1:
        chunk_col = F.floor(
            F.shiftright(F.col("pos"), 3) / F.lit(chunk_bytes)
        ).cast("int")
        pos = pos.withColumn("chunk", chunk_col).repartition(
            n_chunks, "chunk"
        )

        def set_chunk_bits(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            accs: dict[int, np.ndarray] = {}
            for b in batches:
                p = b["pos"].to_numpy(dtype=np.int64)
                for c in np.unique(b["chunk"].to_numpy(dtype=np.int64)):
                    size = min(chunk_bytes, n_bytes - c * chunk_bytes)
                    acc = accs.setdefault(
                        int(c), np.zeros(size, dtype=np.uint8)
                    )
                    sel = p[(b["chunk"] == c).to_numpy()]
                    off = sel - c * chunk_bytes * 8
                    np.bitwise_or.at(
                        acc, off >> 3, (1 << (off & 7)).astype(np.uint8)
                    )
            for c, acc in accs.items():
                yield pd.DataFrame({"chunk": [c], "partial": [acc.tobytes()]})

        # all positions of a chunk share one task: partials are final
        folded = pos.mapInPandas(set_chunk_bits, "chunk int, partial binary")
    else:
        if build_partitions is not None:
            pos = pos.repartition(build_partitions)

        def set_bits(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            bitmap = np.zeros(n_bytes, dtype=np.uint8)
            for b in batches:
                p = b["pos"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(
                    bitmap, p >> 3, (1 << (p & 7)).astype(np.uint8)
                )
            # an empty partition sets no bits, so the any() guard below
            # already makes it contribute nothing
            for c in range(n_chunks):
                chunk = bitmap[c * chunk_bytes : (c + 1) * chunk_bytes]
                if chunk.any():
                    yield pd.DataFrame(
                        {"chunk": [c], "partial": [chunk.tobytes()]}
                    )

        partials = pos.mapInPandas(set_bits, "chunk int, partial binary")
        width = max(1, pos.rdd.getNumPartitions())
        folded = _tree_or_fold(partials, width, fold_fanin, n_chunks)
    out = np.zeros(n_bytes, dtype=np.uint8)
    for r in folded.collect():  # <= n_chunks rows, n_bytes total
        c = r["chunk"]
        part = np.frombuffer(r["partial"], dtype=np.uint8)
        out[c * chunk_bytes : c * chunk_bytes + len(part)] |= part
    return out.tobytes()


def _tree_or_fold(
    partials: DataFrame, width: int, fanin: int, n_chunks: int = 1
) -> DataFrame:
    """OR chunk-keyed bitmap partials — at most ``width`` rows per
    chunk — down to ONE row per chunk, executor-side. Intermediate
    levels are round-robin repartitions to the next width (per-chunk
    row count is bounded by the partition count, so each level divides
    it by ~``fanin``); the last level hashes by chunk so every chunk's
    surviving rows merge in a single task. Per-task memory is the
    chunks it sees times the chunk size."""

    def or_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[int, np.ndarray] = {}
        for b in batches:
            for c, buf in zip(b["chunk"], b["partial"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                if int(c) in accs:
                    accs[int(c)] |= arr
                else:
                    accs[int(c)] = arr.copy()
        for c, acc in accs.items():
            yield pd.DataFrame({"chunk": [c], "partial": [acc.tobytes()]})

    schema = "chunk int, partial binary"
    while width > fanin:
        width = -(-width // fanin)
        partials = partials.repartition(width).mapInPandas(or_fold, schema)
    return partials.repartition(n_chunks, "chunk").mapInPandas(
        or_fold, schema
    )


def bloom_broadcast(df: DataFrame, bitmap: bytes):
    """Broadcast handle for a bitmap, for reuse across many
    ``bloom_contains`` probes. Long-lived sessions should create ONE
    handle per filter and ``bc.unpersist()`` when done — passing raw
    bytes to every probe re-broadcasts the bitmap each call and the
    blocks accumulate on driver and executors for the session's life."""
    return df.sparkSession.sparkContext.broadcast(bitmap)


def bloom_contains(
    df: DataFrame, key_col: str, bitmap, k: int = 5
) -> Column:
    """Boolean column: all k of the key's bits are set (possible member;
    false negatives impossible). Positions come from the same JVM
    expression as the build; the pandas UDF is a vectorized bitmap
    gather over a task-broadcast of the bitmap.

    ``bitmap`` may be raw bytes (a one-shot broadcast is created — it
    lives until the session ends) or a ``Broadcast`` handle from
    ``bloom_broadcast`` (the reuse path: one broadcast however many
    probes, caller unpersists after the last action)."""
    from pyspark.broadcast import Broadcast

    if isinstance(bitmap, Broadcast):
        bc = bitmap
        n_bits = len(bc.value) * 8
    else:
        n_bits = len(bitmap) * 8
        bc = df.sparkSession.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def _test(positions: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        if len(positions) == 0:
            return pd.Series(np.empty(0, dtype=bool))
        # every row has exactly k positions -> one (n, k) gather for the
        # whole Arrow batch, no per-row Python loop
        p = np.vstack(positions.to_numpy())
        hit = (bm[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    return _test(_positions(F.col(key_col), n_bits, k))


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    window: int = 20,
    n_bits: int = 1 << 24,
    n_hashes: int = 5,
) -> DataFrame:
    """``decontaminate`` with the eval fingerprint set compressed to a
    Bloom bitmap instead of an exact broadcast — the scale path when the
    reference corpus's distinct fingerprints outgrow a broadcast.

    Same span-detection guarantee (winnowing: any verbatim overlap >=
    k + window - 1 chars shares a fingerprint); false positives can
    only drop ADDITIONAL training docs, at the sized FPR — never leak a
    contaminated one. Train side stays map-only + one anti-join; the
    eval side ships ``n_bits/8`` bytes however many fingerprints it
    holds."""
    from local_pubchem_db_spark.functions.text import winnow_fingerprints_udf

    fp = winnow_fingerprints_udf(k=k, window=window)
    bitmap = bloom_build(
        eval_df.select(F.explode(fp(F.col(text_col))).alias("fp")),
        "fp",
        n_bits=n_bits,
        k=n_hashes,
    )
    train_fps = fan_out(
        train.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    ).select("id", F.explode(fp(F.col("text"))).alias("fp"))
    bc = bloom_broadcast(train_fps, bitmap)  # one broadcast, reusable
    contaminated = (
        train_fps.filter(bloom_contains(train_fps, "fp", bc, k=n_hashes))
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")
