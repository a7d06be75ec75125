"""Reproduce the grouped-percentile tier measurements (README rows).

Usage: python tools/measure_percentiles.py [sf_dir] [--record]

Four regimes over the events table, each timed warm (min of 2):

1. natural keys (~5 event types), raw values — the buffer aggregate's
   home turf: values repeat heavily, so its value->count hash buffer
   stays tiny and the #keys funnel never fills.
2. ONE group, raw (repeating) values — still buffer-friendly for the
   same reason.
3. ONE group, CONTINUOUS values (value + event_id/1e12 — every row
   distinct): the regime selection exists for. The buffer path funnels
   every distinct value into one task's hash map + sort; selection
   range-partitions the order and keeps every core busy.
4. ONE group, MASSIVE TIES (value mod 3 — three distinct values): the
   selection tier's documented degenerate shape. The range partitioner
   cannot split identical (key, value) tuples across slices, so one
   slice's rank window holds ~a third of the data (correct, but a
   straggler); buffer's value->count map collapses the ties to 3
   entries and wins.
5. FEW-BUT-PARALLEL keys (~5 natural types), CONTINUOUS values (r11):
   every row distinct, so buffer's value->count map collapses NOTHING —
   its 5-lane funnel processes all 10M distinct values while selection
   spreads the same rows across every core (measured at sf10: buffer
   8.5-8.9s vs selection 2.2s). The final r11 rule is a COST MODEL:
   buffer_cost ~ distinct/(min(nk, par)) vs selection_cost ~ 3*rows/par
   — it picks selection here and buffer on regime 1 (same 5 keys, but
   48k distinct under 10M rows: repeats collapse, so buffer wins 19x).
   The model's probe is one full scan; a 64M per-group distinct cap
   forces selection when buffer's task map cannot fit regardless of
   the wall-clock comparison.

Each regime also times ``method="auto"``: the probe + whichever tier
the decision rule picks — auto should track the winning tier's time
plus the one-scan probe cost in every regime.

The point the numbers make: picking a percentile tier is about VALUE
CARDINALITY PER GROUP and KEY COUNT, not data volume.

``--record`` appends the timings to
bench_artifacts/PCT_TIERS_sf{sf}.json for the round record.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.percentiles import grouped_median
from local_pubchem_db_spark.queries import events_table
from local_pubchem_db_spark.session import get_spark


def timed(df, label):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label}: {best:.3f}s", flush=True)
    return best


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--record"]
    record = "--record" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark(app_name="measure_percentiles")
    spark.sparkContext.setLogLevel("ERROR")

    ev = events_table(spark, sf_dir).select("event_type", "value")
    n = ev.count()
    print(f"events rows: {n}")
    out: dict[str, dict[str, float]] = {}

    def regime(label, df, keys, val, methods=("buffer", "selection", "auto")):
        print(label)
        out[label] = {}
        for m in methods:
            out[label][m] = round(
                timed(grouped_median(df, keys, val, method=m), m), 3
            )

    regime(
        "regime1_natural_keys_repeating", ev, ["event_type"], "value"
    )

    one = ev.select(F.lit("all").alias("g"), "value")
    regime("regime2_one_group_repeating", one, ["g"], "value")

    cont = events_table(spark, sf_dir).select(
        F.lit("all").alias("g"),
        (
            F.col("value").cast("double")
            + F.col("event_id").cast("double") / 1e12
        ).alias("v"),
    )
    regime("regime3_one_group_all_distinct", cont, ["g"], "v")

    ties = events_table(spark, sf_dir).select(
        F.lit("all").alias("g"),
        (F.col("event_id") % 3).cast("double").alias("v"),
    )
    regime("regime4_one_group_massive_ties", ties, ["g"], "v")

    # r11 regime: FEW-BUT-PARALLEL keys (the ~5 natural event types)
    # each carrying an ALL-DISTINCT group — rows == distinct, so
    # buffer collapses nothing and selection's rows-across-the-cluster
    # shape wins (the cost model picks selection; a key-count-only
    # rule picks wrong in one direction here and a funnel-only rule
    # in the other — both were tried and measured this round).
    few_cont = events_table(spark, sf_dir).select(
        F.col("event_type").alias("g"),
        (
            F.col("value").cast("double")
            + F.col("event_id").cast("double") / 1e12
        ).alias("v"),
    )
    regime("regime5_few_parallel_keys_all_distinct", few_cont, ["g"], "v")

    if record:
        import json

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        path = os.path.join(root, "bench_artifacts", f"PCT_TIERS_sf{sf}.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"sf_dir": sf_dir, "rows": n, "timings": out}, f, indent=1)
        print(f"recorded {path}")


if __name__ == "__main__":
    main()
