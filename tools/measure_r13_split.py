"""Measure the IVF-PQ hot-cell split against the remedy it replaces
(full re-train + re-save) at scale — the r13 second-pass artifact.

Usage:
  python tools/measure_r13_split.py [base_sf_dir] [copies] [out_json]

Corpus: the base embeddings table replicated ``copies`` times with
stride-offset ids (the make_scale_replicas key recipe) plus a SMALL
deterministic jitter (0.02 * N(0,1) seeded by vec_id) — verbatim
replication is right for the dedup flood tests but collapses k-means
into coincident points; the jitter keeps the replica a cluster-structure
corpus while staying derived from the testdata payloads. The replica is
repartitioned BEFORE the multiply (the r10 row-group lesson).

Protocol:
  1. build + save a k-cell IVF-PQ index over the replica (untimed
     context, wall recorded for reference);
  2. flood ONE cell via ivf_pq_append with vectors near its centroid
     until the ledger flags it hot (timed: the O(delta) append);
  3. t_split  = ivf_pq_split_cell(parts=4) — touches the hot cell only;
  4. t_rebuild = the full remedy: kmeans_fit over the WHOLE corpus +
     assign + pq_encode + save_ivf_pq (what "re-cluster the coarse
     quantizer" costs without the split);
  5. record both walls, the cell fraction, and the post-split ledger
     skew; sanity-pin that an exact-copy probe of a flooded vector
     re-ranks to rank 1 through the split index.

Expectation at scale: t_split ~ (hot cell / corpus) * t_rebuild — the
split is O(cell) in scan, k-means, re-encode, and rewrite, while the
rebuild pays every stage over every row. The measured ratio IS the
artifact; at 100 TB the cell fraction is the nprobe-era ~1/n_cells, so
the gap widens with the index size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from local_pubchem_db_spark.session import get_spark


def replicate_embeddings(spark, base_dir: str, copies: int):
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    stride = emb.agg(F.max("vec_id")).first()[0] + 1
    base = emb.repartition(32).persist()
    base.count()
    reps = spark.range(copies).withColumnRenamed("id", "rep")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def jitter(vec: pd.Series, vid: pd.Series) -> pd.Series:
        out = []
        for v, i in zip(vec.tolist(), vid.tolist()):
            rng = np.random.default_rng(int(i) % (2**32))
            out.append(
                (np.asarray(v, dtype=np.float64)
                 + 0.02 * rng.standard_normal(len(v))).tolist()
            )
        return pd.Series(out)

    rep = (
        base.join(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * stride).alias("vec_id"),
            "embedding",
        )
        .withColumn("embedding", jitter("embedding", "vec_id"))
    )
    return rep


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_artifacts",
            f"SPLIT_r13_x{copies}.json",
        )
    )
    spark = get_spark(app_name="measure-r13-split")
    spark.sparkContext.setLogLevel("ERROR")

    from local_pubchem_db_spark.operators import pq as PQ
    from local_pubchem_db_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )

    name = "split_meas_idx"
    scratch = "/tmp/split_meas_emb"
    rep = replicate_embeddings(spark, base_dir, copies)
    rep.write.mode("overwrite").parquet(scratch)
    emb = spark.read.parquet(scratch)
    n_vecs = emb.count()
    dim = len(emb.first()["embedding"])
    k_cells = 64
    report: dict = {
        "base": base_dir, "copies": copies, "n_vecs": n_vecs,
        "dim": dim, "n_cells": k_cells,
    }

    def build_full(src, idx_name: str) -> float:
        t0 = time.perf_counter()
        cents = kmeans_fit(src, k=k_cells, max_iter=10)
        assigned = src.join(
            assign_clusters(src, cents).withColumnRenamed("id", "vec_id"),
            "vec_id",
        )
        cb = PQ.pq_fit(assigned, m=8, k=16, centroids=cents)
        enc = PQ.pq_encode(assigned, cb, centroids=cents)
        PQ.drop_ivf_pq(spark, idx_name)
        PQ.save_ivf_pq(enc, cents, cb, idx_name, residual=True)
        return round(time.perf_counter() - t0, 2)

    report["t_build_initial"] = build_full(emb, name)
    stats0 = PQ.ivf_pq_cell_stats(spark, name)
    report["initial_skew"] = round(stats0["skew"], 2)

    # flood the largest cell: vectors near ITS centroid (jittered), new ids
    _c, cents, _cb, _rot, meta = PQ.load_ivf_pq(spark, name)
    ledger = {
        int(r["cell"]): int(r["n"])
        for r in spark.table(f"{name}_cells").collect()
    }
    hot = max(ledger, key=ledger.get)
    target = np.asarray(cents[hot], dtype=np.float64)
    n_flood = max(int(n_vecs * 0.08), 4 * int(sum(ledger.values()) / len(ledger)))
    rng = np.random.default_rng(7)
    # 4-modal flood with offsets comparable to the CELL RADIUS, so the
    # split has real structure to separate; a tighter blob (see the
    # preserved *_dupblob artifact) is ONE cluster that clustering
    # correctly refuses to balance — that regime now reports
    # separated=False and routes to dedup
    dirs = rng.standard_normal((4, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    flood_local = [
        (
            10_000_000_000 + i,
            (
                target
                + 0.35 * dirs[i % 4]
                + 0.05 * rng.standard_normal(dim)
            ).tolist(),
        )
        for i in range(n_flood)
    ]
    flood = spark.createDataFrame(
        flood_local, "vec_id long, embedding array<double>"
    ).repartition(32)
    t0 = time.perf_counter()
    app = PQ.ivf_pq_append(spark, name, flood)
    report["t_append"] = round(time.perf_counter() - t0, 2)
    report["n_flood"] = n_flood
    report["post_flood_skew"] = round(app["cell_skew"], 2)
    report["hot_cells"] = app["hot_cells"]

    ledger = {
        int(r["cell"]): int(r["n"])
        for r in spark.table(f"{name}_cells").collect()
    }
    hot = max(ledger, key=ledger.get)
    report["hot_cell_rows"] = ledger[hot]
    report["cell_fraction"] = round(ledger[hot] / sum(ledger.values()), 4)

    t0 = time.perf_counter()
    split = PQ.ivf_pq_split_cell(spark, name, cell=hot, parts=4)
    report["t_split"] = round(time.perf_counter() - t0, 2)
    report["split_counts"] = {str(k): v for k, v in split["counts"].items()}
    report["post_split_skew"] = round(split["cell_skew"], 2)
    report["separated"] = split["separated"]

    # the full signal -> act loop: keep splitting while the ledger
    # flags hot cells (a single split of a multi-modal flood often
    # peels only the splinters — Lloyd from near-identical lowest-id
    # inits is conservative — so the LOOP is the deployment shape)
    t0 = time.perf_counter()
    more = PQ.ivf_pq_rebalance(spark, name, parts=4, max_splits=6)
    report["t_rebalance_rest"] = round(time.perf_counter() - t0, 2)
    report["n_extra_splits"] = len(more)
    report["extra_separated"] = [r["separated"] for r in more]
    stats1 = PQ.ivf_pq_cell_stats(spark, name)
    report["final_skew"] = round(stats1["skew"], 2)
    report["final_hot_cells"] = stats1["hot_cells"]
    report["final_max_cell"] = stats1["max_cell"]

    # recall sanity: exact copy of a flooded vector through the split index
    probe = spark.createDataFrame(
        [(99_999_999_999, flood_local[1][1])],
        "vec_id long, embedding array<double>",
    )
    got = PQ.ivf_pq_search_persisted(
        spark, name, probe, k=3, nprobe=4,
        rerank=int(report["final_max_cell"]) + 50,
    ).collect()
    report["exact_copy_rank1"] = bool(
        got and got[0]["neighbor_id"] == 10_000_000_001
    )

    # the remedy the split replaces: full re-train + re-save over the
    # post-flood corpus (read back from the index's own codes table so
    # both sides see identical data)
    full_src = spark.table(f"{name}_codes").select("vec_id", "embedding")
    full_src.write.mode("overwrite").parquet(scratch + "_post")
    full2 = spark.read.parquet(scratch + "_post")
    report["t_rebuild"] = build_full(full2, name + "_rb")
    PQ.drop_ivf_pq(spark, name + "_rb")
    PQ.drop_ivf_pq(spark, name)
    report["split_vs_rebuild"] = round(
        report["t_rebuild"] / report["t_split"], 2
    )
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
