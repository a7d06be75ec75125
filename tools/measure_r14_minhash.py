"""Stage-level profile of dedup_minhash_lsh (r14, verdict Next #3).

The row is 2.7-5.2 s at sf0.1 — ~27-30% of every headline run and the
largest single lever left. Before touching anything, measure where the
time goes and what each candidate lever would actually buy:

1. STAGE BREAKDOWN at the production parameters (128 perms, 32 bands,
   tau=0.8, exact pre-collapse ON): read+collapse, shingle UDF, minhash
   signature+banding UDF, bucket pair join, exact-Jaccard verify,
   member expansion. Each stage timed by materializing its output with
   the noop sink; cumulative, so stage N's number includes its inputs —
   the DELTA column is the stage's own cost.
2. PERMUTATION SWEEP at fixed rows-per-band r=4 (the banding geometry
   that sets the tau=0.8 operating point): num_perm 128/64/32 with
   bands 32/16/8. r fixed means the per-band collision curve j^4 is
   unchanged; fewer bands only raises the miss probability
   (1 - j^4)^bands. The sweep records wall time AND the exact verified
   pair set vs the 128-perm reference, plus the minimum pair jaccard —
   the number that bounds the real miss risk (pairs at j=1.0 are
   never missed; the published 5e-8 figure is for a pair AT the 0.8
   threshold).
3. The same sweep end-to-end through the registry row (what the bench
   times), min-of-REPS.
4. INTERLEAVED A/B of the r13 plan (full-corpus shingle relation
   persisted, two Python crossings) vs the r14 plan (fused text→bucket
   UDF, exact Jaccard recomputed from the candidate pairs' raw texts).
   Interleaved because this host runs in multi-second bursts (the r13
   sf30 band): back-to-back same-plan walls vary 2.9-6.9 s, so only
   alternating samples separate plan from host.

Findings that shaped the r14 plan (kept here because the artifact is
the record): (a) permutations are NOT the lever — 128/64/32 perms at
fixed r=4 are within noise of each other warm AND cold, because the
md5+numpy signature is a minority of the row; (b) the corpus-sized
shingle relation WAS the lever — fused buckets cost 0.69 s vs 1.47 s
through the two-stage path; (c) the first cut (shingle only candidate
ROWS via semi-joins) re-lost the win to three extra sequential job
round-trips — verify from candidate-pair TEXTS instead.

Usage: python tools/measure_r14_minhash.py [sf_dir] [reps]
Writes bench_artifacts/MINHASH_r14_<sf>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from local_pubchem_db_spark.operators import dedup as D  # noqa: E402
from local_pubchem_db_spark.session import get_spark  # noqa: E402


def _t(df, spark=None) -> float:
    """Cold-timed materialization, matching the bench headline protocol:
    shared() scratch is released FIRST so every sample pays the full
    shingle/signature cost (the bench releases between reps)."""
    from local_pubchem_db_spark.operators.util import (
        release_shared_caches,
    )

    if spark is not None:
        release_shared_caches(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="measure_r14_minhash")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"sf_dir": sf_dir, "reps": reps}

    # global warmup: the first full-pipeline run on a fresh session pays
    # 10-20 s of JVM JIT + python-worker spin-up; without it every
    # "first" section absorbs the warmup and the numbers order-confound
    # (caught in this tool's own first cut)
    from local_pubchem_db_spark.operators.util import (
        release_shared_caches,
    )

    for _ in range(2):
        D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).write.format("noop").mode("overwrite").save()
        release_shared_caches(spark)

    # ---- 1. stage breakdown (cumulative; delta = own cost) ----------
    stages: dict[str, float] = {}
    groups = D._exact_groups(docs, "doc_id", "text")
    stages["collapse"] = _t(groups, spark)
    reps_df = groups.select(F.col("gid").alias("id"), "text")
    shingled = D._with_shingles(reps_df, "id", "text", 3)
    stages["shingle"] = _t(shingled.select("id", F.size("shingles")), spark)
    buckets = D._minhash_buckets(shingled, 128, 32)
    stages["signature_banding"] = _t(buckets, spark)
    cand = D.bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=64
    )
    stages["bucket_pairs"] = _t(cand, spark)
    verified = D._verify_jaccard(cand, shingled, 0.8)
    stages["verify"] = _t(verified, spark)
    full = D.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", threshold=0.8
    )
    stages["full_pipeline"] = _t(full, spark)
    out["stages_cumulative"] = stages

    # ---- 2. permutation sweep at fixed r=4, INTERLEAVED -------------
    geoms = ((128, 32), (64, 16), (32, 8))
    walls_by: dict = {g: [] for g in geoms}
    for _ in range(reps):
        for num_perm, bands in geoms:
            walls_by[(num_perm, bands)].append(
                _t(
                    D.minhash_lsh_dedup_pairs(
                        docs,
                        "doc_id",
                        "text",
                        threshold=0.8,
                        num_perm=num_perm,
                        bands=bands,
                    ),
                    spark,
                )
            )
    ref_pairs = None
    sweep = []
    for num_perm, bands in geoms:
        res = D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8,
            num_perm=num_perm, bands=bands,
        )
        rows = {
            (r["id1"], r["id2"]): r["jaccard"] for r in res.collect()
        }
        if ref_pairs is None:
            ref_pairs = rows
        missed = set(ref_pairs) - set(rows)
        extra = set(rows) - set(ref_pairs)
        sweep.append(
            {
                "num_perm": num_perm,
                "bands": bands,
                "wall_min": min(walls_by[(num_perm, bands)]),
                "walls": walls_by[(num_perm, bands)],
                "n_pairs": len(rows),
                "missed_vs_128": sorted(missed)[:10],
                "n_missed": len(missed),
                "n_extra": len(extra),
                "min_pair_jaccard": min(rows.values()) if rows else None,
            }
        )
    out["perm_sweep_r4"] = sweep

    # worst-case analytic miss bound at the observed minimum jaccard
    import math

    mj = min(
        (s["min_pair_jaccard"] for s in sweep if s["min_pair_jaccard"]),
        default=None,
    )
    if mj is not None:
        out["analytic_miss_at_min_jaccard"] = {
            f"{p}x{b}": (1.0 - mj**4) ** b
            for p, b in ((128, 32), (64, 16), (32, 8))
        }
        out["min_jaccard_observed"] = mj

    # ---- 4. interleaved A/B: r13 plan vs r14 plan -------------------
    import statistics

    from local_pubchem_db_spark.operators.util import (
        release_shared_caches,
    )

    def _old_plan():
        groups = D._exact_groups(docs, "doc_id", "text")
        reps_rel = groups.select(F.col("gid").alias("id"), "text")
        shingled2 = D._with_shingles(reps_rel, "id", "text", 3)
        buckets2 = D._minhash_buckets(shingled2, 128, 32)
        cand2 = D.bounded_bucket_pairs(
            buckets2, ["band", "bucket"], max_bucket_size=64
        )
        rep_pairs = D._verify_jaccard(cand2, shingled2, 0.8)
        return D._expand_collapsed(
            groups,
            rep_pairs,
            val_col="jaccard",
            intra_column=F.lit(1.0),
            intra_value=1.0,
            valid_gids=shingled2.select(F.col("id").alias("gid")),
            cap=64,
        )

    def _new_plan():
        return D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.8
        )

    for mk in (_old_plan, _new_plan):
        for _ in range(2):  # JVM + python-worker warmup, both plans
            mk().write.format("noop").mode("overwrite").save()
            release_shared_caches(spark)
    ab: dict = {"old_r13": [], "new_r14": []}
    for _ in range(max(reps, 6)):
        for key, mk in (("old_r13", _old_plan), ("new_r14", _new_plan)):
            release_shared_caches(spark)
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            ab[key].append(round(time.perf_counter() - t0, 3))
            release_shared_caches(spark)
    out["ab_interleaved"] = {
        **ab,
        "old_min": min(ab["old_r13"]),
        "new_min": min(ab["new_r14"]),
        "old_med": round(statistics.median(ab["old_r13"]), 3),
        "new_med": round(statistics.median(ab["new_r14"]), 3),
    }
    print(json.dumps(out, indent=2))
    os.makedirs("bench_artifacts", exist_ok=True)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    with open(f"bench_artifacts/MINHASH_r14_{tag}.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
