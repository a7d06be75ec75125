"""r13 router artifact (verdict Next #4): reproduce the BM25 routing
table from the PER-INDEX measured cost ratio instead of the baked
DIRECT_COST_RATIO constant.

The index is saved WITH its corpus pointer (save_postings
corpus_table=...) and calibrated (calibrate_cost_ratio) — then every
probe routes through a BARE ``bm25_topk_auto(spark, name, terms)``
call: no docs plumbed, no index tuple, proving the r13 self-contained
contract end-to-end. For each probe the artifact records:

  - the persisted measured ratio and the module constant,
  - the route decision under BOTH (at local parallelism and P=1000),
  - min-of-REPS timings for bucketed / direct / auto,

so the routing table is reproducible from the index's own metadata.

Usage: python tools/measure_r13_router.py [sf_dir] [reps]
Emits one JSON line; redirect to bench_artifacts/ROUTER_r13_sf{sf}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_pubchem_db_spark.session import get_spark

SELECTIVE = ["dup"]
UBIQUITOUS = ["hash", "spark", "stream", "vector"]


def _time(fn, reps):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    from local_pubchem_db_spark.operators.retrieval import (
        DIRECT_COST_RATIO,
        bm25_topk,
        bm25_topk_auto,
        bm25_topk_direct,
        build_postings,
        calibrate_cost_ratio,
        choose_bm25_route,
        drop_index,
        index_meta,
        load_index,
        save_postings,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="measure_r13_router", master=f"local[{cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(corpus)
    name = "r13_router_idx"
    postings, doc_stats = build_postings(docs)
    drop_index(spark, name)
    save_postings(postings, doc_stats, name, buckets=8, corpus_table=corpus)
    out = {"sf_dir": sf_dir, "reps": reps, "probes": {}}
    try:
        ratio = calibrate_cost_ratio(spark, name, docs=docs, reps=reps)
        out["cost_ratio_measured"] = round(ratio, 3)
        out["cost_ratio_constant"] = DIRECT_COST_RATIO
        meta = index_meta(spark, name)
        out["corpus_pointer"] = meta.get("corpus_table")
        idx = load_index(spark, name)
        p, ds, (n_docs, avgdl), tdf = idx
        out["n_docs"] = n_docs
        for label, terms in (
            ("selective", SELECTIVE),
            ("ubiquitous", UBIQUITOUS),
        ):
            dec = {}
            for rl, cr in (("constant", None), ("measured", ratio)):
                r_local, dfs = choose_bm25_route(
                    tdf, n_docs, terms, cost_ratio=cr
                )
                r_1000, _ = choose_bm25_route(
                    tdf, n_docs, terms, parallelism=1000, cost_ratio=cr
                )
                dec[rl] = {"local": r_local, "p1000": r_1000}
            out["probes"][label] = {
                "terms": terms,
                "decisions": dec,
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
                # BARE auto: corpus resolved from the persisted pointer,
                # break-even priced with the persisted measured ratio
                "auto_bare": _time(
                    lambda: bm25_topk_auto(spark, name, terms, k=10),
                    reps,
                ),
            }
    finally:
        drop_index(spark, name)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
