"""Prove the r15 LSH broadcast gate costs nothing at bench scale.

r15 closed VERDICT r14's one `weak` mark: `_lsh_verified_pairs` used to
broadcast-hint the candidate-pair relation (and its text-carrying join
side) UNCONDITIONALLY — a scale hazard, since pair count grows with
corpus size × near-dup density and AQE cannot demote an explicit hint.
The gate measures the pair count (one count job over the persisted,
pair-sized cand relation — which doubles as the eager cache fill) plus
a corpus mean-text-octets agg, then hints only under
`_LSH_PAIR_BROADCAST_LIMIT` / `_LSH_TEXT_BROADCAST_BYTES`.

This tool answers the one perf question the gate raises: do the two
gate-measurement jobs slow the bench-scale row? Interleaved A/B
(gated current code vs the r14 unconditional-hint plan, alternating
cold rounds under the bench release protocol — this host runs in
multi-second bursts, so only alternating samples separate plan from
host), on BOTH the sf0.1 corpus and a 10-way replica flood (the
dup-heavy regime where cand is largest relative to corpus).

Usage: python tools/measure_r15_lsh_gate.py [sf_dir] [rounds]
Writes bench_artifacts/LSH_GATE_r15_<sf>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from local_pubchem_db_spark.operators import dedup as D  # noqa: E402
from local_pubchem_db_spark.operators.util import (  # noqa: E402
    fan_out,
    release_shared_caches,
)
from local_pubchem_db_spark.session import get_spark  # noqa: E402


def _ungated_pairs(rel, shingle_len, num_perm, bands, max_bucket_size, threshold):
    """The r14 plan verbatim (unconditional hints, no count job) — the
    baseline the gate must not regress from at bench scale."""
    from local_pubchem_db_spark.functions.hashing import minhash_band_text_udf
    from local_pubchem_db_spark.functions.text import pair_jaccard_udf

    buckets = fan_out(rel).select(
        "id",
        F.posexplode(
            minhash_band_text_udf(num_perm, bands, shingle_len)(F.col("text"))
        ).alias("band", "bucket"),
    )
    cand = D.bounded_bucket_pairs(
        buckets, ["band", "bucket"], max_bucket_size=max_bucket_size
    )
    a = rel.select(F.col("id").alias("id1"), F.col("text").alias("__t1"))
    b = rel.select(F.col("id").alias("id2"), F.col("text").alias("__t2"))
    jac = pair_jaccard_udf(shingle_len)(F.col("__t1"), F.col("__t2"))
    half = a.join(F.broadcast(cand), "id1")
    return (
        F.broadcast(half)
        .join(b, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _run(spark, docs, impl) -> float:
    release_shared_caches(spark)
    t0 = time.perf_counter()
    orig = D._lsh_verified_pairs
    if impl == "ungated":
        D._lsh_verified_pairs = _ungated_pairs
    try:
        df = D.minhash_lsh_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
        df.write.format("noop").mode("overwrite").save()
    finally:
        D._lsh_verified_pairs = orig
    return round(time.perf_counter() - t0, 3)


def _ab(spark, docs, rounds):
    gated, ungated = [], []
    for _ in range(rounds):
        ungated.append(_run(spark, docs, "ungated"))
        gated.append(_run(spark, docs, "gated"))
    return {
        "ungated_r14_plan": ungated,
        "gated_r15_plan": gated,
        "min": {"ungated": min(ungated), "gated": min(gated)},
        "median": {
            "ungated": statistics.median(ungated),
            "gated": statistics.median(gated),
        },
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(app_name="measure_r15_lsh_gate")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # pairs equality first: the gate is plan-shape only
    base = sorted(
        (r["id1"], r["id2"], round(r["jaccard"], 12))
        for r in D.minhash_lsh_dedup_pairs(docs, "doc_id", "text").collect()
    )
    release_shared_caches(spark)
    orig = D._lsh_verified_pairs
    D._lsh_verified_pairs = _ungated_pairs
    try:
        old = sorted(
            (r["id1"], r["id2"], round(r["jaccard"], 12))
            for r in D.minhash_lsh_dedup_pairs(docs, "doc_id", "text").collect()
        )
    finally:
        D._lsh_verified_pairs = orig
    assert base == old, "gated plan changed the verified pair relation"

    out = {
        "what": (
            "r15 broadcast-gate A/B: gated plan (measured pair count + "
            "mean-octets gate jobs) vs r14 unconditional-hint plan, "
            "alternating cold rounds, bench release protocol; pair "
            "relation equality asserted first"
        ),
        "pairs_equal": True,
        "n_pairs_sf": len(base),
        f"sf{os.path.basename(sf_dir.rstrip('/')).lstrip('sf')}_{rounds}rounds": _ab(
            spark, docs, rounds
        ),
    }

    # 10-way replica flood: worst pair-density regime at this scale
    stride = docs.agg(F.max("doc_id")).first()[0] + 1
    flood = docs
    for rep in range(1, 10):
        flood = flood.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(rep * stride))
        )
    flood = flood.persist(StorageLevel.MEMORY_AND_DISK)
    flood.count()
    out[f"flood10x_{rounds}rounds"] = _ab(spark, flood, rounds)

    os.makedirs("bench_artifacts", exist_ok=True)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"bench_artifacts/LSH_GATE_r15_{sf_tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
