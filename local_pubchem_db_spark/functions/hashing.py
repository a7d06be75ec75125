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
