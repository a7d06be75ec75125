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
      engine- and session-stable, unlike Python's ``hash``), memoized per
      worker — corpus shingles follow a Zipf law, so most md5 calls are
      cache hits after warm-up,
    - ``num_perm`` permutations for the WHOLE batch as one numpy broadcast
      ``(a*h1 + b*h2 + i) mod p`` over the flattened shingle list, then a
      per-document column-min via ``np.minimum.reduceat`` — no per-doc
      Python loop,
    - per band, bucket id = a second linear mix of the band's signature
      slice: the per-term products (61-bit sig × 31-bit coefficient) wrap
      mod 2^64 by design before the final mod p — deterministic
      everywhere numpy uint64 is, and collisions are harmless because
      every candidate pair is exact-Jaccard-verified downstream.

    ``bands`` must divide ``num_perm`` (the signature reshapes to
    (docs, bands, num_perm/bands)); violating it raises here, at
    construction, not as an opaque executor-side reshape error.

    Rationale vs the JVM alternative (explode + groupBy with num_perm
    min-aggregates): that plan pays a shuffle plus ~4 s of one-time Janino
    compile for the 128-buffer HashAggregate, and the interpreted banding
    expressions on top; this UDF is a pure map whose per-row cost is a few
    numpy ops. At cluster scale the map-only shape also preserves input
    partitioning — candidate generation is the only shuffle left.
    """
    from pyspark.sql.functions import pandas_udf

    core = _band_core(num_perm, bands, seed)

    @pandas_udf("array<long>")
    def _buckets(shingles: pd.Series) -> pd.Series:
        return core(shingles)

    return _buckets


def minhash_band_text_udf(
    num_perm: int = 128,
    bands: int = 32,
    shingle_len: int = 3,
    seed: int = 42,
):
    """``minhash_band_udf`` FUSED with the shingle construction: raw text
    → array of band bucket ids in ONE Arrow pass (r14, verdict Next #3).

    The two-UDF pipeline (``shingle_array_udf`` then ``minhash_band_udf``)
    ships every document's full shingle array JVM→Python→JVM→Python —
    at sf0.1 the shingle materialization was the single largest stage of
    the dedup_minhash_lsh row (MINHASH_r14 artifact). The signature side
    never needs the shingle ARRAYS outside Python, so fusing removes the
    round trip entirely; exact-Jaccard verification shingles only the
    (tiny) candidate-pair rows. Output is BIT-IDENTICAL to
    ``minhash_band_udf(shingle_array_udf(text))`` — same tokenizer
    (ASCII ``\\s+`` on trimmed text), same first-occurrence dedup, same
    band core (test-pinned)."""
    import re

    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+", re.ASCII)
    core = _band_core(num_perm, bands, seed)

    @pandas_udf("array<long>")
    def _buckets(text: pd.Series) -> pd.Series:
        def grams(t):
            if t is None:
                return []
            w = [tok for tok in ws.split(t.strip()) if tok]
            if len(w) < shingle_len:
                return []
            return list(
                dict.fromkeys(
                    " ".join(w[i : i + shingle_len])
                    for i in range(len(w) - shingle_len + 1)
                )
            )

        return core(text.map(grams))

    return _buckets


def _band_core(num_perm: int, bands: int, seed: int):
    """The shared MinHash-signature + band-mix computation over a
    pd.Series of shingle lists (see ``minhash_band_udf`` for the
    construction) — one implementation, two UDF entry points, so the
    fused text path cannot drift from the array path."""
    import numpy as np

    if num_perm <= 0 or bands <= 0 or num_perm % bands:
        raise ValueError(
            f"bands must divide num_perm: num_perm={num_perm}, bands={bands}"
        )
    rows = num_perm // bands
    params = _perm_params(num_perm, seed)
    A = np.array([a for a, _ in params], dtype=np.uint64)
    B = np.array([b for _, b in params], dtype=np.uint64)
    IDX = np.arange(num_perm, dtype=np.uint64)
    P = np.uint64(_P)
    # band-mix coefficients: independent LCG stream, odd, 31-bit
    C = np.array(
        [a | 1 for a, _ in _perm_params(rows, seed ^ 0x5BD1E995)],
        dtype=np.uint64,
    )

    def _core(shingles: pd.Series) -> pd.Series:
        lens = shingles.map(lambda a: 0 if a is None else len(a)).to_numpy()
        flat: list[str] = []
        for arr in shingles:
            if arr is not None and len(arr):
                flat.extend(arr)
        if not flat:
            return pd.Series([None] * len(shingles))
        h1, h2 = _hash_strings_31(flat)
        # (total_shingles, num_perm) permutation table for the whole batch;
        # Arrow batches are ~10k rows, so this stays comfortably in memory.
        sig_all = (h1[:, None] * A + h2[:, None] * B + IDX) % P
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[lens > 0]
        sig = np.minimum.reduceat(sig_all, starts, axis=0)
        # band mix: (n_docs, bands, rows) · C mod p, cast to signed 64
        mixed = (
            (sig.reshape(len(sig), bands, rows) * C).sum(axis=2, dtype=np.uint64)
            % P
        ).astype(np.int64)
        out: list = []
        j = 0
        for n in lens:
            if n == 0:
                out.append(None)
            else:
                out.append(mixed[j])
                j += 1
        return pd.Series(out)

    return _core


_MD5_CACHE: dict[str, tuple[int, int]] = {}
_MD5_CACHE_MAX = 1 << 20  # ~100 MB/worker ceiling; cleared, not LRU'd


def _hash_strings_31(flat: list) -> tuple:
    """md5 each string to two 31-bit ints, memoized per worker process.

    Shingle/token frequency is Zipfian: the distinct:total ratio in a batch
    is tiny, so memoization turns the md5 loop from O(occurrences) into
    O(new distinct strings). The cache is cleared (not evicted) past a size
    ceiling — at 100 TB scale vocabulary is unbounded and an LRU would
    thrash; periodic reset keeps the hot head resident.
    """
    import hashlib

    import numpy as np

    if len(_MD5_CACHE) > _MD5_CACHE_MAX:
        _MD5_CACHE.clear()
    h1 = np.empty(len(flat), dtype=np.uint64)
    h2 = np.empty(len(flat), dtype=np.uint64)
    for j, s in enumerate(flat):
        v = _MD5_CACHE.get(s)
        if v is None:
            d = hashlib.md5(s.encode("utf-8")).digest()
            v = (
                int.from_bytes(d[:8], "little") & _MASK31,
                int.from_bytes(d[8:16], "little") & _MASK31,
            )
            _MD5_CACHE[s] = v
        h1[j], h2[j] = v
    return h1, h2


def simhash_udf():
    """Arrow-batched pandas UDF: token array → 64-bit SimHash (long).

    Bit k of the result is 1 iff more token hashes have bit k set than
    unset. Vectorized over the WHOLE Arrow batch: md5 per token memoized
    per worker (Zipfian reuse), one unpackbits + segmented sum
    (``np.add.reduceat``) for all documents at once. Null/empty token
    arrays hash to NULL.
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(tokens: pd.Series) -> pd.Series:
        lens = tokens.map(lambda a: 0 if a is None else len(a)).to_numpy()
        flat: list[str] = []
        for arr in tokens:
            if arr is not None and len(arr):
                flat.extend(arr)
        if not flat:
            return pd.Series([None] * len(tokens))
        h1, h2 = _hash_strings_31(flat)
        # rebuild a 62-bit hash from the two 31-bit halves; bit 62/63 are
        # constant-zero across all tokens so they never flip a majority
        # vote asymmetrically (every SimHash gets the same two zero bits).
        h = (h1 << np.uint64(31)) | h2
        bits = np.unpackbits(
            h.astype("<u8").view(np.uint8).reshape(len(h), 8), axis=1
        ).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[lens > 0]
        votes = np.add.reduceat(bits, starts, axis=0)
        nz = lens[lens > 0]
        maj = (votes * 2 > nz[:, None]).astype(np.uint8)
        words = np.packbits(maj, axis=1).view("<i8").ravel()
        out: list = []
        j = 0
        for n in lens:
            if n == 0:
                out.append(None)
            else:
                out.append(int(words[j]))
                j += 1
        return pd.Series(out)

    return _simhash


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
