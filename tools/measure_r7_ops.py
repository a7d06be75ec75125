"""Pinned measurement recipe for the round-7 README scale rows
(fused skew_report, residual/rerank IVF-PQ) — run against a replica dir
produced by ``tools/make_scale_replicas.py``.

Usage:
  python tools/make_scale_replicas.py /root/testdata/sf0.1 /tmp/sf1 10
  python tools/measure_r7_ops.py [/tmp/sf1]

Prints one RESULT line per workload; the numbers recorded in README's
scale table came from exactly this script on the driver host. The
per-column comparison reconstructs the r6 shape (one misra_gries_topk
scan per column + a counting pass) so the fused-vs-loop ratio stays
measurable after the loop is gone from skew_report itself.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from local_pubchem_db_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)
from local_pubchem_db_spark.operators.pq import (
    ivf_pq_search,
    pq_encode,
    pq_fit,
)
from local_pubchem_db_spark.operators.similarity import brute_force_knn
from local_pubchem_db_spark.operators.topk import (
    misra_gries_topk,
    skew_report,
)
from local_pubchem_db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="measure_r7")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the scan cache + Python workers so neither side pays one-time
    # costs (the r6 lesson: cold-worker bias flips small comparisons)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    # --- fused skew_report vs the r6 per-column loop (min of 2 each) ---
    cols = ["l_returnflag", "l_linestatus", "l_suppkey"]

    def fused() -> float:
        t0 = time.perf_counter()
        skew_report(li, cols, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def per_column() -> float:
        t0 = time.perf_counter()
        li.agg(
            F.count(F.lit(1)),
            *[F.count(F.when(F.col(c).isNull(), 1)) for c in cols],
        ).collect()
        for c in cols:
            misra_gries_topk(li, c, k=10).write.format("noop").mode(
                "overwrite"
            ).save()
        return time.perf_counter() - t0

    p1, f1, p2, f2 = per_column(), fused(), per_column(), fused()
    print(
        f"RESULT skew_report {len(cols)} cols @ {li.count()} rows: "
        f"fused {min(f1, f2):.2f}s vs per-column {min(p1, p2):.2f}s"
    )

    # --- exact-duplicate pre-collapse for the pair dedup operators ---
    from local_pubchem_db_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
        simhash_dedup_pairs,
    )
    from local_pubchem_db_spark.operators.util import release_shared_caches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for collapse in (False, True):
        t0 = time.perf_counter()
        minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8, collapse_exact=collapse
        ).write.format("noop").mode("overwrite").save()
        print(
            f"RESULT minhash_lsh_dedup_pairs collapse={collapse}: "
            f"{time.perf_counter() - t0:.2f}s"
        )
        release_shared_caches(spark)
    t0 = time.perf_counter()
    simhash_dedup_pairs(
        docs, "doc_id", "text", max_hamming=3, collapse_exact=True
    ).write.format("noop").mode("overwrite").save()
    print(
        f"RESULT simhash_dedup_pairs collapse=True: "
        f"{time.perf_counter() - t0:.2f}s "
        "(collapse=False is NOT measured here: on the 30-way replica "
        "flood the uncapped quarter-block all-pairs arrays OOM the JVM "
        "— reproduced at 55s on local[32]/128G — which is exactly what "
        "the collapse prevents)"
    )
    release_shared_caches(spark)

    # --- streaming dedup ingest over the flood corpus, one batch ---
    from local_pubchem_db_spark.streaming import (
        read_corpus,
        stream_dedup_ingest,
    )

    work = tempfile.mkdtemp()
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    n_docs = docs.count()
    docs.select("doc_id", "text").repartition(32).write.parquet(
        os.path.join(work, "staged")
    )
    i = 0
    for fn in os.listdir(os.path.join(work, "staged")):
        if fn.endswith(".parquet"):
            os.rename(
                os.path.join(work, "staged", fn),
                os.path.join(in_dir, f"shard-{i}.parquet"),
            )
            i += 1
    out = os.path.join(work, "out")
    t0 = time.perf_counter()
    stream_dedup_ingest(spark, in_dir, out).awaitTermination()
    dt = time.perf_counter() - t0
    kept = read_corpus(spark, out).count()
    print(
        f"RESULT stream_dedup_ingest {n_docs} docs 1 batch: {dt:.1f}s = "
        f"{n_docs / dt:.0f} docs/s, kept {kept}"
    )

    # --- residual IVF-PQ + exact rerank vs brute force ---
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(30)
    queries.persist().count()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_knn(emb, queries, k=5).collect()
    }
    t0 = time.perf_counter()
    brute_force_knn(emb, queries, k=5).write.format("noop").mode(
        "overwrite"
    ).save()
    brute_s = time.perf_counter() - t0

    cent = kmeans_fit(emb, k=16, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, cent).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    cb = pq_fit(assigned, m=8, k=16, centroids=cent)
    with tempfile.TemporaryDirectory() as out:
        p = os.path.join(out, "codes")
        pq_encode(assigned, cb, centroids=cent).write.partitionBy(
            "cluster"
        ).parquet(p)
        stored = spark.read.parquet(p)
        for rerank in (None, 50):
            t0 = time.perf_counter()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_pq_search(
                    stored, queries, cent, cb, k=5, nprobe=4,
                    residual=True, rerank=rerank,
                ).collect()
            }
            dt = time.perf_counter() - t0
            rec = len(got & exact) / len(exact)
            print(
                f"RESULT ivf_pq m=8 residual rerank={rerank}: "
                f"recall@5={rec:.3f} search={dt:.2f}s "
                f"(brute force {brute_s:.2f}s)"
            )


if __name__ == "__main__":
    main()
