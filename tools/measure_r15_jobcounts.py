"""Per-bench-row job/stage counts + wall at one sf — the overhead map.

For each headline/aux row: construct the query (counting any jobs the
construction itself runs — probe aggregates, eager fills), then execute
via the noop sink, reporting construction jobs, execution jobs, and
min-of-reps wall. Sequential jobs are the unit of fixed overhead the
driver's low-core bench pays per row, so rows whose wall tracks job
count rather than data volume are the optimization targets (guide §1).

Usage: python tools/measure_r15_jobcounts.py [sf_dir] [reps] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401 — resolves the warmup UDF's type hints

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_pubchem_db_spark.operators.util import (  # noqa: E402
    release_shared_caches,
)
from local_pubchem_db_spark.queries import QUERIES  # noqa: E402
from local_pubchem_db_spark.session import get_spark  # noqa: E402

ROWS = [
    "pricing_summary", "top_unshipped_orders", "revenue_by_nation",
    "brand_volume", "top_orders_per_customer", "event_windows",
    "session_window", "events_hourly", "dedup_exact", "dedup_minhash_lsh",
    "knn_cosine", "token_topk", "doc_chunks", "sample_splits",
    "text_signals", "retrieval_topk", "ts_outliers", "token_drift",
    "pct_selection",
]


def n_jobs(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
    return max(ids) + 1 if ids else 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or ROWS
    spark = get_spark(app_name="jobcounts")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = QUERIES[name]
        best = None
        for _ in range(reps):
            release_shared_caches(spark)
            j0, t0 = n_jobs(spark), time.perf_counter()
            df = fn(spark, sf_dir)
            jc, tc = n_jobs(spark) - j0, time.perf_counter() - t0
            j1, t1 = n_jobs(spark), time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            je, te = n_jobs(spark) - j1, time.perf_counter() - t1
            rec = {
                "query": name,
                "wall": round(tc + te, 3),
                "construct_s": round(tc, 3),
                "exec_s": round(te, 3),
                "construct_jobs": jc,
                "exec_jobs": je,
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
