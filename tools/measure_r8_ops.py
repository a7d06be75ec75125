"""Pinned measurement recipe for the round-8 README rows: warm-service
LSH expansion gating, map-only bloom build shapes, and PQ code-storage
sizes — the numbers in README's measured-operations table and
ROUND8_NOTES came from exactly this script on the builder host.

Usage:
  python tools/measure_r8_ops.py [sf_dir]     # default /root/testdata/sf0.1

Prints one RESULT line per workload. Every workload is min-of-N over
warm repetitions so a single GC pause or host hiccup cannot set the
record; raw samples print alongside.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.bloom import bloom_build
from local_pubchem_db_spark.operators.dedup import minhash_lsh_dedup_pairs
from local_pubchem_db_spark.operators.pq import pq_encode, pq_fit
from local_pubchem_db_spark.operators.util import release_shared_caches
from local_pubchem_db_spark.session import get_spark


def timed(fn, reps=3):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    return min(samples), samples


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="measure-r8")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    # ---- warm-service LSH: collapse (gated expansion) vs no-collapse
    def lsh(collapse):
        minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8, collapse_exact=collapse
        ).write.format("noop").mode("overwrite").save()

    for collapse in (True, False):
        release_shared_caches(spark)
        lsh(collapse)  # cold fill
        best, samples = timed(lambda: lsh(collapse), reps=3)
        print(
            f"RESULT lsh_warm collapse={collapse}: {best}s (runs {samples})"
        )
        release_shared_caches(spark)

    # ---- bloom build: map-only natural partitions vs legacy repartition
    keys = spark.range(0, 2_000_000, 1, 32).select(F.col("id").alias("key"))
    n_bits = 1 << 24
    for label, kw in (
        ("map_only", {}),
        ("legacy_repartition", {"build_partitions": 32}),
        ("partition_by_chunk", {"chunk_bytes": 1 << 20,
                                "partition_by_chunk": True}),
    ):
        best, samples = timed(
            lambda: bloom_build(keys, "key", n_bits=n_bits, k=5, **kw),
            reps=3,
        )
        print(f"RESULT bloom_build_{label} 2M keys 2^24 bits: {best}s "
              f"(runs {samples})")

    # ---- PQ code storage: array<int> vs binary bytes/row on parquet
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    big = emb
    for i in range(1, 32):
        big = big.unionByName(
            emb.select(
                (F.col("vec_id") + 100_000 * i).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    big = big.cache()
    n = big.count()

    def disk_size(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )

    for m, k in ((8, 16), (16, 256)):
        cb = pq_fit(emb, m=m, k=k)
        sizes = {}
        for mode, kw in (("array", {}), ("binary", {"binary_codes": True})):
            d = tempfile.mkdtemp()
            pq_encode(big, cb, **kw).select("pq_code").write.mode(
                "overwrite"
            ).parquet(d)
            sizes[mode] = disk_size(d) / n
        print(
            f"RESULT pq_code_bytes_per_row m={m} k={k}: "
            f"array {sizes['array']:.2f} binary {sizes['binary']:.2f} "
            f"(raw code = {m} bytes, {n} rows)"
        )


if __name__ == "__main__":
    main()
