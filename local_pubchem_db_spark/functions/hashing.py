"""Deterministic hashing primitives: MinHash signatures, LSH band buckets,
SimHash.

All JVM-side expressions built on ``xxhash64`` — stable across sessions,
partitions, and cluster sizes (no PYTHONHASHSEED dependence), which makes
LSH results reproducible run-to-run: a hard requirement for the
correctness gate and for incremental dedup at scale.

MinHash uses the standard double-hashing construction: two base 64-bit
hashes per shingle are folded to 31-bit values and combined as
``(a_i * h1 + b_i * h2 + i) mod p`` per permutation i (p Mersenne prime
2^61-1 keeps products inside the 63-bit positive range — ANSI mode errors
on overflow, so staying in range is load-bearing).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_P = (1 << 61) - 1  # Mersenne prime
_MASK31 = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) per permutation from a small LCG (avoids any
    dependence on Python's random module state)."""
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state >> 16) & _MASK31 or 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (state >> 16) & _MASK31
        params.append((a, b))
    return params


def minhash_band_udf(num_perm: int = 128, bands: int = 32, seed: int = 42):
    """Arrow-batched pandas UDF: distinct-shingle array → array of ``bands``
    LSH bucket hashes (one 64-bit bucket id per band).

    The whole MinHash + banding pipeline runs as ONE map-side vectorized
    computation per document — no explode, no shuffle, no codegen:

    - base hashes: md5(shingle) split into two 31-bit values (md5 is
      engine- and session-stable, unlike Python's ``hash``),
    - ``num_perm`` permutations as one numpy broadcast
      ``(a*h1 + b*h2 + i) mod p`` and a column-min,
    - per band, bucket id = blake2b-64 of the band's signature slice.

    Rationale vs the JVM alternative (explode + groupBy with num_perm
    min-aggregates): that plan pays a shuffle plus ~4 s of one-time Janino
    compile for the 128-buffer HashAggregate, and the interpreted banding
    expressions on top; this UDF is a pure map whose per-row cost is a few
    numpy ops. At cluster scale the map-only shape also preserves input
    partitioning — candidate generation is the only shuffle left.
    """
    import hashlib

    import numpy as np

    from pyspark.sql.functions import pandas_udf

    rows = num_perm // bands
    params = _perm_params(num_perm, seed)
    A = np.array([a for a, _ in params], dtype=np.uint64)
    B = np.array([b for _, b in params], dtype=np.uint64)
    IDX = np.arange(num_perm, dtype=np.uint64)
    P = np.uint64(_P)

    @pandas_udf("array<long>")
    def _buckets(shingles: pd.Series) -> pd.Series:
        def doc_buckets(arr):
            if arr is None or len(arr) == 0:
                return None
            h = np.empty((len(arr), 2), dtype=np.uint64)
            for j, s in enumerate(arr):
                d = hashlib.md5(s.encode("utf-8")).digest()
                h[j, 0] = int.from_bytes(d[:8], "little") & _MASK31
                h[j, 1] = int.from_bytes(d[8:16], "little") & _MASK31
            sig = (h[:, 0:1] * A + h[:, 1:2] * B + IDX) % P
            sig = sig.min(axis=0)
            sig_bytes = sig.astype("<u8").tobytes()
            out = np.empty(bands, dtype=np.int64)
            for b in range(bands):
                seg = sig_bytes[b * rows * 8 : (b + 1) * rows * 8]
                bh = hashlib.blake2b(seg, digest_size=8).digest()
                out[b] = int.from_bytes(bh, "little", signed=True)
            return out
        return shingles.map(doc_buckets)

    return _buckets


def base_hashes(shingle: Column) -> tuple[Column, Column]:
    """The two 31-bit base hashes of one shingle value (double-hashing
    construction). Computed ONCE per (doc, shingle) row — every permutation
    is then a cheap affine combination of these two columns."""
    h1 = F.pmod(F.xxhash64(shingle), F.lit(_MASK31))
    h2 = F.pmod(F.xxhash64(shingle, F.lit(1)), F.lit(_MASK31))
    return h1, h2


def minhash_agg_columns(
    h1: Column, h2: Column, num_perm: int = 128, seed: int = 42
) -> list[Column]:
    """MinHash as aggregate expressions over an EXPLODED (doc, shingle)
    relation: ``groupBy(doc).agg(*minhash_agg_columns(h1, h2))`` yields
    columns mh0..mh{n-1}.

    This is the distributed MinHash shape: one shuffle on the doc id with
    map-side partial mins, whole-stage codegen over 2·num_perm fused
    multiply-add-mod expressions — versus the naive per-row array<struct>
    expression tree, which recomputes the shingle hashes num_perm times and
    ships a multi-MiB codegen blob to every task.
    """
    return [
        F.min(
            F.pmod(F.lit(a) * h1 + F.lit(b) * h2 + F.lit(i), F.lit(_P))
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(_perm_params(num_perm, seed))
    ]


def band_bucket_structs(
    sig_cols: list[Column], bands: int, rows: int
) -> Column:
    """LSH banding over materialized signature columns mh0..mh{n-1}:
    array of (band_id, bucket_hash) structs, ready to explode. Two
    documents collide in a band iff their ``rows`` signature slots in that
    band are identical (the band id is folded into the hash so buckets
    from different bands never alias)."""
    out = []
    for band in range(bands):
        seg = sig_cols[band * rows : (band + 1) * rows]
        bucket = F.xxhash64(*seg, F.lit(band))
        out.append(F.struct(F.lit(band).alias("band"), bucket.alias("bucket")))
    return F.array(*out)


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array: per-bit majority vote of token
    hashes. Convenience wrapper; prefer hashing tokens in a separate
    projection and calling :func:`simhash_from_hashes` so the token-hash
    array is materialized once, not inlined into all 64 bit-votes."""
    return simhash_from_hashes(F.transform(tokens_col, lambda s: F.xxhash64(s)))


def simhash_from_hashes(hashed: Column) -> Column:
    """SimHash from a pre-hashed array<long> of token hashes. Bit k of the
    result is 1 iff more token hashes have bit k set than unset. Pure JVM
    expressions: one aggregate per bit."""

    def bit_vote(k: int) -> Column:
        # count of tokens with bit k set, minus count with bit unset
        def step(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hashed, F.lit(0), step)

    bits = []
    for k in range(64):
        vote = bit_vote(k)
        # shiftleft on the JVM: 1<<63 wraps to long-min, which a Python
        # F.lit(1 << 63) literal could not represent.
        bits.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), k)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
