"""Measure the BM25 route decision (r12, verdict Next #1): bucketed
index vs direct scan, for a SELECTIVE probe and a UBIQUITOUS probe, at
a given sf dir.

For each probe the script times (min-of-REPS):
  - ``bucketed``: bm25_topk over the persisted index (termdf path)
  - ``direct``:   bm25_topk_direct (own stats pass, 2 corpus scans)
  - ``auto``:     bm25_topk_auto (router; direct route reuses persisted
                  stats — 1 corpus scan)
and records the router's decision plus Σdf / N, so the artifact shows
(a) the ubiquitous probe routed direct and landed at-or-under the
bare-direct time, and (b) the selective probe stayed on the
bucket-pruned index path.

Usage: python tools/measure_r12_router.py [sf_dir] [reps]
Emits one JSON line; append it to bench_artifacts by hand if wanted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_pubchem_db_spark.session import get_spark

# the synthetic corpus has a 31-term vocabulary where "dup" is the one
# selective term (df ~5% of docs); everything else sits at ~77%
SELECTIVE = ["dup"]
UBIQUITOUS = ["hash", "spark", "stream", "vector"]  # the bench probe


def _time(fn, reps):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    from local_pubchem_db_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_auto,
        bm25_topk_direct,
        build_postings,
        choose_bm25_route,
        drop_index,
        load_index,
        save_postings,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="measure_r12_router", master=f"local[{cpus}]"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    name = "r12_router_idx"
    postings, doc_stats = build_postings(docs)
    drop_index(spark, name)
    save_postings(postings, doc_stats, name, buckets=8)
    out = {"sf_dir": sf_dir, "reps": reps, "probes": {}}
    try:
        idx = load_index(spark, name)
        p, ds, (n_docs, avgdl), tdf = idx
        out["n_docs"] = n_docs
        for label, terms in (
            ("selective", SELECTIVE),
            ("ubiquitous", UBIQUITOUS),
        ):
            route, dfs = choose_bm25_route(tdf, n_docs, terms)
            route_p1000, _ = choose_bm25_route(
                tdf, n_docs, terms, parallelism=1000
            )
            rec = {
                "terms": terms,
                "route": route,
                "route_p1000": route_p1000,
                "sum_df": sum(dfs.values()),
                "sum_df_over_n": round(sum(dfs.values()) / n_docs, 4),
                "bucketed": _time(
                    lambda: bm25_topk(
                        p, ds, terms, k=10,
                        n_docs=n_docs, avgdl=avgdl, term_df=tdf,
                    ),
                    reps,
                ),
                "direct": _time(
                    lambda: bm25_topk_direct(docs, terms, k=10), reps
                ),
                "auto": _time(
                    lambda: bm25_topk_auto(
                        spark, name, terms, docs=docs, k=10, index=idx
                    ),
                    reps,
                ),
            }
            out["probes"][label] = rec
    finally:
        drop_index(spark, name)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
