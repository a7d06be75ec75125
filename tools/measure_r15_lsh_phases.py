"""Phase/job profile of the dedup_minhash_lsh registry row at one sf.

Times each driver-visible phase of ``minhash_lsh_dedup_pairs`` on a cold
cache (release between reps) and on the warm path (caches kept), and
counts the Spark JOBS each phase launches (statusTracker job ids) — the
r14/r15 artifacts showed the sf0.1 wall is overhead-dominated, so the
optimization target is the NUMBER of sequential driver→cluster round
trips, not per-task compute. Output: one JSON line per config.

Usage: python tools/measure_r15_lsh_phases.py [sf_dir] [reps]
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
from local_pubchem_db_spark.session import get_spark  # noqa: E402


def n_jobs(spark) -> int:
    st = spark.sparkContext.statusTracker()
    ids = st.getJobIdsForGroup(None) or []
    return max(ids) + 1 if ids else 0


def profile_once(spark, sf_dir: str, label: str) -> dict:
    """Mirror minhash_lsh_dedup_pairs' internal sequence with per-phase
    timers + job counts. Kept in lock-step with the operator by eye; the
    equality of the assembled result with the public entry point is NOT
    asserted here (this is a stopwatch, not a test)."""
    from local_pubchem_db_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"label": label}

    def phase(name, fn):
        j0, t0 = n_jobs(spark), time.perf_counter()
        r = fn()
        out[f"{name}_s"] = round(time.perf_counter() - t0, 3)
        out[f"{name}_jobs"] = n_jobs(spark) - j0
        return r

    groups = phase(
        "exact_groups",
        lambda: D._exact_groups(docs, "doc_id", "text", eager=False),
    )
    valid_pred = D._word_count(F.col("text")) >= 3
    dup_info = phase(
        "dup_info",
        lambda: D._dup_info(groups, valid_pred, 64, valid_key="wc>=3"),
    )
    out["n_dup"], out["dup_members"] = dup_info.n_dup, dup_info.dup_members
    out["literal"] = dup_info.literal is not None
    out["mean_octets"] = round(dup_info.mean_octets, 1)
    reps_rel = groups.select(F.col("gid").alias("id"), "text")
    buckets = phase(
        "bucket_plan", lambda: D._fused_band_buckets(reps_rel, 3, 128, 32)
    )
    cand = phase(
        "cand_persist",
        lambda: D.bounded_bucket_pairs(
            buckets, ["band", "bucket"], max_bucket_size=64
        ).persist(),
    )
    n_pairs = phase("cand_count", cand.count)
    out["n_pairs"] = n_pairs
    verified = D._verify_jaccard_from_texts(
        cand, reps_rel, 3, 0.8,
        broadcast_cand=n_pairs <= D._LSH_PAIR_BROADCAST_LIMIT,
        broadcast_half=(
            n_pairs * (dup_info.mean_octets + D._LSH_PAIR_ROW_OVERHEAD)
            <= D._LSH_TEXT_BROADCAST_BYTES
        ),
    )
    final = phase(
        "expand_plan",
        lambda: D._expand_collapsed(
            groups, verified, val_col="jaccard",
            intra_column=F.lit(1.0), intra_value=1.0,
            valid_pred=valid_pred, cap=64, info=dup_info,
        ),
    )
    phase(
        "exec_noop",
        lambda: final.write.format("noop").mode("overwrite").save(),
    )
    out["total_s"] = round(
        sum(v for k, v in out.items() if k.endswith("_s")), 3
    )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="lsh_phases")
    spark.sparkContext.setLogLevel("ERROR")
    # session + python-worker warmup, matching bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    results = []
    for i in range(reps):
        release_shared_caches(spark)
        results.append(profile_once(spark, sf_dir, f"cold_{i}"))
    # warm path: caches kept between invocations (the bench _warm row)
    profile_once(spark, sf_dir, "warm_fill")
    for i in range(reps):
        results.append(profile_once(spark, sf_dir, f"warm_{i}"))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
