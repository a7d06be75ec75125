"""Deterministic hashing primitives: MinHash+LSH band buckets, SimHash.

Both fingerprints run as Arrow-batched pandas UDFs over numpy — pure
map-side work, no shuffle, no codegen compile (the JVM higher-order
alternatives are interpreted and ~100x slower; see operators/dedup.py).
All hashes are md5/blake2-based: stable across sessions, partitions, and
cluster sizes (no PYTHONHASHSEED dependence), so LSH candidate sets are
reproducible run-to-run — a hard requirement for the correctness gate and
for incremental dedup at scale.

MinHash uses the standard double-hashing construction: two 31-bit base
hashes per shingle combined as ``(a_i * h1 + b_i * h2 + i) mod p`` per
permutation i (p = Mersenne prime 2^61-1 keeps products inside uint64).
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


def simhash_udf():
    """Arrow-batched pandas UDF: token array → 64-bit SimHash (long).

    Bit k of the result is 1 iff more token hashes have bit k set than
    unset. Vectorized per document: md5 each distinct-with-multiplicity
    token once, unpack to a (n_tokens, 64) bit matrix, column-sum votes.
    Null/empty token arrays hash to NULL.
    """
    import hashlib

    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(tokens: pd.Series) -> pd.Series:
        def doc_hash(arr):
            if arr is None or len(arr) == 0:
                return None
            h = np.empty(len(arr), dtype=np.uint64)
            for j, s in enumerate(arr):
                h[j] = int.from_bytes(
                    hashlib.md5(s.encode("utf-8")).digest()[:8], "little"
                )
            bits = np.unpackbits(h.view(np.uint8).reshape(len(arr), 8), axis=1)
            votes = bits.sum(axis=0) * 2 > len(arr)  # majority per bit
            word = np.packbits(votes).tobytes()
            return int.from_bytes(word, "little", signed=True)

        return tokens.map(doc_hash)

    return _simhash


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
