"""r13 hist-boundary artifact (verdict Next #1): time the Hampel filter
(the graded ``ts_outliers`` shape — TWO exact medians over the events
stream) under each exact tier and under ``method="auto"``, and record
which tier auto's probe picked.

What the artifact shows across sfs:

  - sf0.1 (~100k rows, below the 2M-row floor): auto picks buffer and
    the row returns to ~buffer cost — the ~1.4x the r12 hardcoded hist
    tier paid on tiny inputs is gone;
  - sf10+ (past the floor, compression >> 4x): auto picks hist and
    keeps the measured 1.5-3x wins.

Usage: python tools/measure_r13_hist.py [sf_dir] [reps] [--record]
``--record`` writes bench_artifacts/PCT_TIERS_hist_sf{sf}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_pubchem_db_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--record"]
    record = "--record" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="measure_r13_hist", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    from local_pubchem_db_spark.operators.percentiles import (
        choose_percentile_method,
    )
    from local_pubchem_db_spark.operators.timeseries import robust_outliers
    from local_pubchem_db_spark.operators.util import release_shared_caches
    from local_pubchem_db_spark.queries import events_table

    ev = events_table(spark, sf_dir).select("event_id", "event_type", "value")
    n = ev.count()
    picked = choose_percentile_method(
        ev.filter(ev["value"].isNotNull()),
        ["event_type"],
        "value",
        reuse_stats=2,
    )
    out = {
        "sf_dir": sf_dir,
        "rows": n,
        "reps": reps,
        "auto_picked": picked,
        "timings": {},
    }
    for method in ("buffer", "hist", "auto"):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            robust_outliers(
                ev, ["event_type"], "value", k=3.5, method=method
            ).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            release_shared_caches(spark)
        out["timings"][method] = samples
        print(f"  {method}: {samples}", file=sys.stderr, flush=True)
    if record:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        path = os.path.join(
            root, "bench_artifacts", f"PCT_TIERS_hist_sf{sf}.json"
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"recorded {path}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
