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
- the build sets bits in a per-partition numpy bitmap inside
  ``mapInPandas`` and emits ONE bitmap row per partition; the driver
  ORs the partials (commutative — partitioning-invariant bytes);
- the probe tests k positions per key against the broadcast bitmap in
  an Arrow-batched pandas UDF (a vectorized gather, no Python loop).

Sizing: false-positive rate ~= (1 - e^{-k*n/m})^k for n keys, m bits,
k probes; k=5, m=10n gives ~0.9%. Build driver traffic is one
``n_bits/8``-byte partial per build partition — the build coalesces to
``build_partitions`` (default 32) to bound it.
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
    build_partitions: int = 32,
    fold_fanin: int = 8,
) -> bytes:
    """Bitmap (``n_bits/8`` bytes) with every key's k positions set.

    One narrow projection to positions, one shuffle down to
    ``build_partitions`` tasks, one bitmap partial per task — then an
    executor-side tree fold (fan-in ``fold_fanin`` per level) ORs the
    partials down to ONE bitmap before the collect, so driver traffic is
    a single ``n_bits/8``-byte row regardless of ``build_partitions``
    (the r6 shape collected every partial: at the 2^32-bit sizing the
    docstring motivates that was 16 GiB to the driver). Each fold level
    is a repartition (a real shuffle barrier, so the parallel set_bits
    stage is NOT serialized the way ``coalesce(1)`` would) followed by
    a mapInPandas OR. Bytes are identical for any input partitioning or
    row order (bit-OR is commutative)."""
    if n_bits % 8 != 0 or n_bits <= 0:
        raise ValueError("n_bits must be a positive multiple of 8")
    if k < 1:
        raise ValueError("k must be >= 1")
    if fold_fanin < 2:
        raise ValueError("fold_fanin must be >= 2")
    pos = (
        keys.select(
            F.explode(_positions(F.col(key_col), n_bits, k)).alias("pos")
        )
        .repartition(build_partitions)
    )

    def set_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
        for b in batches:
            p = b["pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bitmap, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"partial": [bitmap.tobytes()]})

    partials = pos.mapInPandas(set_bits, "partial binary")
    folded = _tree_or_fold(
        partials, n_bits // 8, build_partitions, fold_fanin
    )
    rows = folded.collect()
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for r in rows:  # exactly one row after the fold; loop kept for safety
        out |= np.frombuffer(r["partial"], dtype=np.uint8)
    return out.tobytes()


def _tree_or_fold(
    partials: DataFrame, n_bytes: int, width: int, fanin: int
) -> DataFrame:
    """OR ``width`` one-row bitmap partials down to a single row with
    log_fanin(width) repartition+mapInPandas levels. All traffic stays
    executor-side; the final relation holds one bitmap row."""

    def or_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for b in batches:
            for buf in b["partial"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                acc = arr.copy() if acc is None else acc | arr
        if acc is None:  # round-robin can leave a partition empty
            acc = np.zeros(n_bytes, dtype=np.uint8)
        yield pd.DataFrame({"partial": [acc.tobytes()]})

    while width > 1:
        width = -(-width // fanin)
        partials = partials.repartition(width).mapInPandas(
            or_fold, "partial binary"
        )
    return partials


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
