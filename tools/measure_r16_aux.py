"""Job/phase map for the aux service rows (r16, VERDICT r15 Next #4/#5).

Reproduces the bench's untimed prep for the ivf_pq_search,
ivf_pq_persisted, hybrid_warm, hybrid_batch and retrieval_warm rows,
then measures each timed region split into CONSTRUCT (the operator
call — collects, probes, plan building) and EXEC (the noop sink),
with Spark job counts per phase (statusTracker ids). The sf0.1 walls
are fixed-overhead-bound (VERDICT r15 scaling block: all 8v32 ratios
~1), so the target is the number of sequential driver round trips.

Usage: python tools/measure_r16_aux.py [sf_dir] [reps] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401 — resolves the warmup UDF's type hints

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from local_pubchem_db_spark.session import get_spark  # noqa: E402


def n_jobs(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
    return max(ids) + 1 if ids else 0


def timed(spark, name, reps, construct, out):
    best = None
    for _ in range(reps):
        j0, t0 = n_jobs(spark), time.perf_counter()
        df = construct()
        jc, tc = n_jobs(spark) - j0, time.perf_counter() - t0
        j1, t1 = n_jobs(spark), time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        je, te = n_jobs(spark) - j1, time.perf_counter() - t1
        rec = {
            "row": name,
            "wall": round(tc + te, 3),
            "construct_s": round(tc, 3),
            "exec_s": round(te, 3),
            "construct_jobs": jc,
            "exec_jobs": je,
        }
        if best is None or rec["wall"] < best["wall"]:
            best = rec
    out.append(best)
    print(json.dumps(best), flush=True)


def _ivf_fixture(spark, sf_dir):
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import pq_encode, pq_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    codebooks = pq_fit(assigned, m=8, k=16, centroids=centroids)
    encoded = pq_encode(assigned, codebooks, centroids=centroids)
    return emb, centroids, codebooks, encoded


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or [
        "ivf_pq_search",
        "ivf_pq_persisted",
        "hybrid_warm",
        "hybrid_batch",
        "retrieval_warm",
    ]
    spark = get_spark(app_name="r16_aux")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    out: list = []

    if "ivf_pq_search" in names:
        from local_pubchem_db_spark.operators.pq import ivf_pq_search

        emb, centroids, codebooks, encoded = _ivf_fixture(spark, sf_dir)
        enc = encoded.persist()
        enc.count()
        probes = emb.filter(F.col("vec_id") < 16)
        timed(
            spark,
            "ivf_pq_search",
            reps,
            lambda: ivf_pq_search(
                enc, probes, centroids, codebooks,
                k=10, nprobe=4, residual=True, rerank=50,
            ),
            out,
        )
        enc.unpersist()

    if "ivf_pq_persisted" in names:
        from local_pubchem_db_spark.operators.pq import (
            drop_ivf_pq,
            ivf_pq_search_persisted,
            load_ivf_pq,
            save_ivf_pq,
        )

        emb, centroids, codebooks, encoded = _ivf_fixture(spark, sf_dir)
        name = "r16_aux_ivfpq"
        drop_ivf_pq(spark, name)
        try:
            save_ivf_pq(encoded, centroids, codebooks, name, residual=True)
            idx = load_ivf_pq(spark, name)
            probes = emb.orderBy("vec_id").limit(16)
            timed(
                spark,
                "ivf_pq_persisted",
                reps,
                lambda: ivf_pq_search_persisted(
                    spark, name, probes, k=10, nprobe=4, rerank=50, index=idx
                ),
                out,
            )
        finally:
            drop_ivf_pq(spark, name)

    if {"hybrid_warm", "hybrid_batch", "retrieval_warm"} & set(names):
        from local_pubchem_db_spark.operators.retrieval import (
            bm25_topk,
            build_postings,
            drop_index,
            hybrid_topk_batch,
            load_index,
            rrf_fuse,
            save_postings,
            with_rank,
        )
        from local_pubchem_db_spark.operators.pq import ivf_pq_search

        corpus = f"{sf_dir}/documents.parquet"
        docs = spark.read.parquet(corpus)
        postings, doc_stats = build_postings(docs)
        iname = "r16_aux_bm25"
        drop_index(spark, iname)
        save_postings(postings, doc_stats, iname, buckets=8, corpus_table=corpus)
        p, ds, (n_docs, avgdl), tdf = load_index(spark, iname)
        emb, centroids, codebooks, encoded = _ivf_fixture(spark, sf_dir)
        enc = encoded.persist()
        enc.count()
        probe = emb.filter(F.col("vec_id") == 0)

        if "hybrid_warm" in names:

            def hybrid():
                lex = with_rank(
                    bm25_topk(
                        p, ds, ["hash", "spark", "stream", "vector"], k=20,
                        n_docs=n_docs, avgdl=avgdl, term_df=tdf,
                    ),
                    F.desc("score"),
                    F.asc("doc_id"),
                ).select("doc_id", "rank")
                vec = ivf_pq_search(
                    enc, probe, centroids, codebooks,
                    k=20, nprobe=4, residual=True, rerank=50,
                ).select(F.col("neighbor_id").alias("doc_id"), "rank")
                return rrf_fuse([lex, vec], top_n=10)

            timed(spark, "hybrid_warm", reps, hybrid, out)

        if "hybrid_batch" in names:
            batch_queries = {
                str(i): terms
                for i, terms in enumerate(
                    [
                        ["hash", "spark"],
                        ["stream", "vector"],
                        ["shuffle", "join"],
                        ["data", "batch"],
                        ["hash", "stream", "vector"],
                        ["spark", "vector"],
                        ["join", "stream"],
                        ["hash", "join", "spark"],
                    ]
                )
            }
            probes_b = emb.filter(F.col("vec_id") < 8)
            timed(
                spark,
                "hybrid_batch",
                reps,
                lambda: hybrid_topk_batch(
                    p, ds, batch_queries, enc, probes_b, centroids,
                    codebooks, k_lex=20, k_vec=20, top_n=10,
                    n_docs=n_docs, avgdl=avgdl, term_df=tdf,
                    nprobe=4, residual=True, rerank=50,
                ),
                out,
            )

        if "retrieval_warm" in names:
            pw = build_postings(docs)[0].persist()
            dw = build_postings(docs)[1].persist()
            pw.count()
            dw.count()
            timed(
                spark,
                "retrieval_warm",
                reps,
                lambda: bm25_topk(
                    pw, dw, ["hash", "spark", "stream", "vector"], k=10
                ),
                out,
            )
            pw.unpersist()
            dw.unpersist()
        enc.unpersist()
        drop_index(spark, iname)


if __name__ == "__main__":
    main()
