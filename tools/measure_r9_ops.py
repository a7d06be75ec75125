"""Pinned measurement recipe for the round-9 README rows: retrieval
(index build one-time cost vs per-query search), drift, and robust
outliers (exact value-buffering median vs the bounded-memory sketch
path) — at any sf dir, including the /tmp/scale_* flood replicas where
documents are K-way exact-dup clusters.

Usage:
  python tools/measure_r9_ops.py [sf_dir]    # default /root/testdata/sf0.1

Prints one RESULT line per workload; min-of-N with raw samples shown.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.drift import token_drift
from local_pubchem_db_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    coordination_topk,
)
from local_pubchem_db_spark.operators.timeseries import robust_outliers
from local_pubchem_db_spark.session import get_spark


def timed(fn, reps=3):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    return min(samples), samples


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="measure-r9")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs @ {sf_dir}")

    # ---- retrieval: one-time index build cost, then per-query search
    # over the PERSISTED index (the search-service shape)
    best, samples = timed(lambda: noop(build_postings(docs)[0]), reps=3)
    print(f"RESULT postings_build {n_docs} docs: {best}s (runs {samples})")

    postings, doc_stats = build_postings(docs)
    postings = postings.persist()
    doc_stats = doc_stats.persist()
    postings.count(), doc_stats.count()  # fill
    q = ["hash", "spark", "stream", "vector"]
    best, samples = timed(
        lambda: noop(coordination_topk(postings, q, k=10)), reps=5
    )
    print(f"RESULT coordination_search warm-index: {best}s (runs {samples})")
    best, samples = timed(
        lambda: noop(bm25_topk(postings, doc_stats, q, k=10)), reps=5
    )
    print(f"RESULT bm25_search warm-index: {best}s (runs {samples})")
    postings.unpersist(), doc_stats.unpersist()

    # ---- drift: two snapshot histograms + vocab-sized outer join
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    best, samples = timed(lambda: noop(token_drift(a, b, top_n=20)), reps=3)
    print(f"RESULT token_drift {n_docs} docs: {best}s (runs {samples})")

    # ---- robust outliers over events: exact median (value-buffering)
    # vs percentile_approx sketch (the bounded-memory 100 TB path)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_ev = ev.count()
    for approx in (False, True):
        best, samples = timed(
            lambda: noop(
                robust_outliers(
                    ev.select("event_id", "event_type", "value"),
                    ["event_type"], "value", approx=approx,
                )
            ),
            reps=3,
        )
        mode = "approx_sketch" if approx else "exact_median"
        print(
            f"RESULT ts_outliers {mode} {n_ev} events: {best}s "
            f"(runs {samples})"
        )
    # agreement between the modes (rank error ~1/accuracy should move
    # nothing at a 3.5-MAD cut on real data)
    cols = ["event_id", "event_type", "value"]
    exact_ids = {
        r["event_id"]
        for r in robust_outliers(ev.select(cols), ["event_type"], "value")
        .select("event_id").collect()
    }
    approx_ids = {
        r["event_id"]
        for r in robust_outliers(
            ev.select(cols), ["event_type"], "value", approx=True
        ).select("event_id").collect()
    }
    sym = len(exact_ids ^ approx_ids)
    print(
        f"RESULT ts_outliers agreement: exact={len(exact_ids)} "
        f"approx={len(approx_ids)} symdiff={sym}"
    )


if __name__ == "__main__":
    main()
