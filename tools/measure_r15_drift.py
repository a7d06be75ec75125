"""Interleaved A/B for the r15 token_drift_split totals refactor.

OLD: shared()-cached paired histogram + driver .first() for the
snapshot totals (two construction jobs + a vocab-sized cache entry).
NEW (committed): totals ride a broadcast 1-row cross join over the same
grouped-histogram exchange; AQE exchange reuse -> one corpus scan, zero
construction jobs.

Usage: python tools/measure_r15_drift.py [sf_dir] [reps]
Writes bench_artifacts/DRIFT_r15_<sf>.json. Equality asserted first.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.drift import (
    _cross_drift,
    token_drift_split,
)
from local_pubchem_db_spark.operators.util import (
    LIGHT_TEXT_GATE,
    fan_out,
    release_shared_caches,
    shared,
)
from local_pubchem_db_spark.functions.text import normalize_text, tokens
from local_pubchem_db_spark.session import get_spark


def old_split(docs, side, text_col="text", top_n=20):
    """The pre-r15 body: shared() cache + scalar totals job."""
    toks = tokens(normalize_text(F.col(text_col)))
    flag = side.cast("boolean")
    hist = shared(
        fan_out(docs.filter(flag.isNotNull()), **LIGHT_TEXT_GATE)
        .select(
            flag.alias("__a"),
            F.explode(F.filter(toks, lambda x: x != F.lit(""))).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.sum(F.col("__a").cast("long")).cast("long").alias("cnt_a"),
            F.sum((~F.col("__a")).cast("long")).cast("long").alias("cnt_b"),
        )
    )
    tot = hist.agg(F.sum("cnt_a").alias("na"), F.sum("cnt_b").alias("nb")).first()
    na, nb = int(tot["na"] or 0), int(tot["nb"] or 0)
    out = hist.withColumn(
        "drift", _cross_drift(F.col("cnt_a"), F.col("cnt_b"), na, nb)
    )
    return out.orderBy(F.desc("drift"), F.asc("token")).limit(top_n)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="drift-ab")
    sc = spark.sparkContext
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    side = F.col("doc_id") % 2 == 0

    # equality first (construction + full result)
    a = [tuple(r) for r in token_drift_split(docs, side, top_n=20).collect()]
    b = [tuple(r) for r in old_split(docs, side, top_n=20).collect()]
    release_shared_caches(spark)
    assert a == b, "A/B results diverge"

    def run(fn, label):
        sc.setJobDescription(label)
        t0 = time.time()
        fn(docs, side, top_n=20).write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        release_shared_caches(spark)
        sc.setJobDescription(None)
        return w

    new_t, old_t = [], []
    for i in range(reps):  # interleaved, new first then old
        new_t.append(run(token_drift_split, f"drift new rep{i}"))
        old_t.append(run(old_split, f"drift old rep{i}"))
    rec = {
        "sf_dir": sf_dir,
        "reps": reps,
        "new_sec": [round(x, 3) for x in new_t],
        "old_sec": [round(x, 3) for x in old_t],
        "new_min": round(min(new_t), 3),
        "old_min": round(min(old_t), 3),
        "new_median": round(sorted(new_t)[reps // 2], 3),
        "old_median": round(sorted(old_t)[reps // 2], 3),
        "equal_rows": True,
    }
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts",
        f"DRIFT_r15_{tag}.json",
    )
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
