"""8-vs-32-core scaling walls at sf1 for the 5 heaviest bench rows
(VERDICT r15 Next #6: at sf0.1 every core ratio sits ~1 because the
rows are overhead-bound; at sf1 the data-parallel stages dominate, so
the ratio becomes measurable). One process per core count — the master
is fixed at session creation.

Usage: SPARK_GRAFT_CPUS=<n> python tools/measure_r16_sf1_scaling.py <sf_dir> [reps]
Prints one JSON line: {"cpus": n, "sf_dir": ..., "rows": {name: min_sec}}
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401 — resolves the warmup UDF's type hints

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from local_pubchem_db_spark.operators.util import (  # noqa: E402
    release_shared_caches,
)
from local_pubchem_db_spark.queries import QUERIES  # noqa: E402
from local_pubchem_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark(app_name=f"r16_sf1_scaling_c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    rows: dict[str, float] = {}

    def timed(name, construct):
        samples = []
        for _ in range(reps):
            release_shared_caches(spark)
            t0 = time.perf_counter()
            df = construct()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        rows[name] = min(samples)
        print(json.dumps({"row": name, "cpus": cpus, "samples": samples}),
              file=sys.stderr, flush=True)

    for q in ("revenue_by_nation", "pct_selection", "ts_outliers",
              "dedup_minhash_lsh"):
        timed(q, lambda q=q: QUERIES[q](spark, sf_dir))

    # hybrid_batch: same composition as the bench row, prep untimed
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from local_pubchem_db_spark.operators.pq import pq_encode, pq_fit
    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        drop_index,
        hybrid_topk_batch,
        load_index,
        save_postings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    codebooks = pq_fit(assigned, m=8, k=16, centroids=centroids)
    enc = pq_encode(assigned, codebooks, centroids=centroids).persist()
    enc.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings, doc_stats = build_postings(docs)
    iname = f"r16_scaling_bm25_c{cpus}"
    drop_index(spark, iname)
    save_postings(postings, doc_stats, iname, buckets=8)
    p, ds, (n_docs, avgdl), tdf = load_index(spark, iname)
    probes_b = emb.filter(F.col("vec_id") < 8)
    batch_queries = {
        str(i): t for i, t in enumerate(
            [["hash", "spark"], ["stream", "vector"], ["shuffle", "join"],
             ["data", "batch"], ["hash", "stream", "vector"],
             ["spark", "vector"], ["join", "stream"],
             ["hash", "join", "spark"]]
        )
    }
    timed("hybrid_batch", lambda: hybrid_topk_batch(
        p, ds, batch_queries, enc, probes_b, centroids, codebooks,
        k_lex=20, k_vec=20, top_n=10,
        n_docs=n_docs, avgdl=avgdl, term_df=tdf,
        nprobe=4, residual=True, rerank=50,
    ))
    enc.unpersist()
    drop_index(spark, iname)

    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
