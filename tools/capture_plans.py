"""Capture .explain("formatted") for every registry query into plans/<tag>/.

Usage: python tools/capture_plans.py <sf_dir> <out_dir> [suffix] [names...]

Writes one <name>_<suffix>.txt per query (suffix defaults to "before").
Plan-only — nothing is executed — so this is cheap and load-insensitive.
A query whose builder raises gets an <name>_<suffix>.ERROR.txt with the
traceback instead, so a broken builder is visible rather than silent.

Also prints a one-line summary per query: #Exchange, join strategies,
Python-boundary nodes — the plan-shape triage table the optimization
round's checklist starts from (guide §1.2: fix the distributed algorithm
first, and find it by reading plans).
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_pubchem_db_spark.queries import QUERIES  # noqa: E402
from local_pubchem_db_spark.operators.util import release_shared_caches  # noqa: E402
from local_pubchem_db_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = sorted(
        set(
            re.findall(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
                r"|BroadcastNestedLoopJoin|CartesianProduct)\b",
                plan,
            )
        )
    )
    py = sorted(
        set(
            re.findall(
                r"\b(ArrowEvalPython|BatchEvalPython|MapInArrow|MapInPandas"
                r"|FlatMapGroupsInPandas|AggregateInPandas|WindowInPandas)\b",
                plan,
            )
        )
    )
    return f"exchanges={n_ex} joins={','.join(joins) or '-'} py={','.join(py) or '-'}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r15"
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"{name}: {summarize(plan)}", flush=True)
        except Exception:  # noqa: BLE001 — record and continue
            with open(
                os.path.join(out_dir, f"{name}_{suffix}.ERROR.txt"), "w"
            ) as f:
                f.write(traceback.format_exc())
            print(f"{name}: ERROR (see {name}_{suffix}.ERROR.txt)", flush=True)
        release_shared_caches(spark)


if __name__ == "__main__":
    main()
