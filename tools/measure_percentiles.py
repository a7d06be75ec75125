"""Reproduce the grouped-percentile tier measurements (README rows).

Usage: python tools/measure_percentiles.py [sf_dir]

Three regimes over the events table, each timed warm (min of 2):

1. natural keys (~5 event types), raw values — the buffer aggregate's
   home turf: values repeat heavily, so its value->count hash buffer
   stays tiny and the #keys funnel never fills.
2. ONE group, raw (repeating) values — still buffer-friendly for the
   same reason.
3. ONE group, CONTINUOUS values (value + event_id/1e12 — every row
   distinct): the regime selection exists for. The buffer path funnels
   every distinct value into one task's hash map + sort; selection
   range-partitions the order and keeps every core busy.

The point the numbers make: picking a percentile tier is about VALUE
CARDINALITY PER GROUP and KEY COUNT, not data volume.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="measure_percentiles")
    spark.sparkContext.setLogLevel("ERROR")

    ev = events_table(spark, sf_dir).select("event_type", "value")
    n = ev.count()
    print(f"events rows: {n}")

    print("regime 1: natural keys, repeating values")
    for m in ("buffer", "selection"):
        timed(grouped_median(ev, ["event_type"], "value", method=m), m)

    one = ev.select(F.lit("all").alias("g"), "value")
    print("regime 2: one group, repeating values")
    for m in ("buffer", "selection"):
        timed(grouped_median(one, ["g"], "value", method=m), m)

    cont = events_table(spark, sf_dir).select(
        F.lit("all").alias("g"),
        (
            F.col("value").cast("double")
            + F.col("event_id").cast("double") / 1e12
        ).alias("v"),
    )
    print("regime 3: one group, continuous (all-distinct) values")
    for m in ("selection", "buffer"):
        timed(grouped_median(cont, ["g"], "v", method=m), m)


if __name__ == "__main__":
    main()
