"""Independent SimHash oracle.

The driver can only rows-only-check dedup_simhash (xxhash-free but still
not ANSI-SQL-expressible), so this test recomputes the whole pipeline —
tokenize, per-token md5, per-bit majority vote, all-pairs Hamming — in
plain Python (no numpy vectorization, no shared helpers) and asserts the
operator's candidate pair set equals the brute-force result on real
testdata documents.
"""

import hashlib
import re

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.dedup import simhash_dedup_pairs

_MASK31 = (1 << 31) - 1


def _py_simhash(text: str) -> int | None:
    # mirror functions.text.tokens: split(trim(text), '\\s+')
    toks = re.split(r"\s+", text.strip())
    if not toks:
        return None
    hashes = []
    for t in toks:
        d = hashlib.md5(t.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "little") & _MASK31
        h2 = int.from_bytes(d[8:16], "little") & _MASK31
        hashes.append((h1 << 31) | h2)
    out = 0
    n = len(hashes)
    for bit in range(64):
        votes = sum((h >> bit) & 1 for h in hashes)
        if votes * 2 > n:  # strict majority, ties -> 0 (matches the UDF)
            out |= 1 << bit
    return out


def test_simhash_pairs_match_pure_python_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }

    rows = docs.select("doc_id", "text").collect()
    sh = {r["doc_id"]: _py_simhash(r["text"]) for r in rows}
    ids = sorted(i for i, h in sh.items() if h is not None)
    want = set()
    for a_i, a in enumerate(ids):
        for b in ids[a_i + 1 :]:
            d = bin(sh[a] ^ sh[b]).count("1")
            if d <= 3:
                want.add((a, b, d))

    assert got == want
    assert want, "oracle found no pairs — fixture lost its near-dups"


def test_simhash_values_match_pure_python(spark):
    from local_pubchem_db_spark.functions.hashing import simhash_udf
    from local_pubchem_db_spark.functions.text import tokens

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different content here",
        "  spaced   out\ttokens \n everywhere  ",
        "single",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["sh"]
        for r in df.select(
            "i", simhash_udf()(tokens(F.col("t"))).alias("sh")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_simhash(t), f"text {i!r} diverged"
