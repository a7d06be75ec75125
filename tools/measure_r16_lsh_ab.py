"""Interleaved A/B of the dedup_minhash_lsh registry shape: PRE (the
r15 close, before the threaded literal-collect overlap, e445f6f^) vs
HEAD (overlap + this round's tree). Alternating cold reps, caches
released between reps, pair-set equality asserted once. Same protocol
as bench_artifacts/LSH_AB_r15_final.json.

Usage: python tools/measure_r16_lsh_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

import pandas as pd  # noqa: F401 — resolves the warmup UDF's type hints

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_module_at(rev: str, relpath: str, modname: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{rev}:{relpath}"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = f"/tmp/{modname}.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql.functions import pandas_udf

    from local_pubchem_db_spark.operators import dedup as dedup_new
    from local_pubchem_db_spark.operators.util import release_shared_caches
    from local_pubchem_db_spark.session import get_spark

    pre_rev = subprocess.run(
        ["git", "-C", REPO, "log", "--oneline", "--fixed-strings",
         "--grep=Overlap the LSH literal-dup collect", "-n", "1"],
        capture_output=True, text=True, check=True,
    ).stdout.split()[0] + "^"
    dedup_old = load_module_at(
        pre_rev, "local_pubchem_db_spark/operators/dedup.py", "r16_dedup_old"
    )

    spark = get_spark(app_name="r16_lsh_ab")
    spark.sparkContext.setLogLevel("ERROR")

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(mod) -> float:
        release_shared_caches(spark)
        t0 = time.perf_counter()
        df = mod.minhash_lsh_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # pair-set equality, once
    release_shared_caches(spark)
    a = sorted(map(tuple, dedup_old.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", threshold=0.8).collect()))
    release_shared_caches(spark)
    b = sorted(map(tuple, dedup_new.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", threshold=0.8).collect()))
    assert a == b, f"pair sets differ: {len(a)} vs {len(b)}"

    walls = {"pre": [], "head": []}
    for _ in range(reps):
        walls["pre"].append(run(dedup_old))
        walls["head"].append(run(dedup_new))
    rec = {
        "sf_dir": sf_dir,
        "pre_rev": pre_rev,
        "pairs_equal": True,
        "n_pairs": len(a),
        "pre": walls["pre"],
        "head": walls["head"],
        "pre_min": min(walls["pre"]),
        "head_min": min(walls["head"]),
    }
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
