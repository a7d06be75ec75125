"""Buckets-stage timing for the r15 index-path fusion.

r14 fused the batch dedup path's text→bands pipeline into one Arrow
crossing and measured the buckets stage at 0.69 s vs 1.47 s two-stage
(MINHASH_r14_sf0.1). r15 adopts the same fusion on the index-build /
incremental / streaming paths (`lsh_bucket_index`,
`incremental_minhash_new_ids`, and through them
`stream_dedup_ingest`). This artifact records the index-build stage
both ways on the same corpus — the verdict's "done" check that the
adopted path reproduces the fused number.

Interleaved cold rounds (bench release protocol) because this host runs
in multi-second bursts; row-set equality asserted first (bucket rows
must be bit-identical so persisted indexes stay valid).

Usage: python tools/measure_r15_index_fuse.py [sf_dir] [rounds]
Writes bench_artifacts/INDEX_FUSE_r15_<sf>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_pubchem_db_spark.operators import dedup as D  # noqa: E402
from local_pubchem_db_spark.operators.util import (  # noqa: E402
    release_shared_caches,
)
from local_pubchem_db_spark.session import get_spark  # noqa: E402


def _two_stage_index(df, id_col, text_col, shingle_len=3, num_perm=128, bands=32):
    """The pre-r15 lsh_bucket_index verbatim: shingle UDF (persisted
    relation) then band UDF — two Python crossings."""
    shingled = D._with_shingles(df, id_col, text_col, shingle_len)
    return D._minhash_buckets(shingled, num_perm, bands)


def _t(spark, df) -> float:
    release_shared_caches(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(app_name="measure_r15_index_fuse")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    fused = D.lsh_bucket_index(docs, "doc_id", "text")
    old = _two_stage_index(docs, "doc_id", "text")
    assert (
        fused.exceptAll(old).isEmpty() and old.exceptAll(fused).isEmpty()
    ), "fused index rows differ from the two-stage plan"
    release_shared_caches(spark)

    t_old, t_new = [], []
    for _ in range(rounds):
        t_old.append(_t(spark, _two_stage_index(docs, "doc_id", "text")))
        t_new.append(_t(spark, D.lsh_bucket_index(docs, "doc_id", "text")))

    out = {
        "what": (
            "lsh_bucket_index build: two-stage shingle+band (pre-r15) vs "
            "fused one-crossing text->bands (r15), alternating cold "
            "rounds; bucket row-set equality asserted first"
        ),
        "rows_equal": True,
        "two_stage": t_old,
        "fused": t_new,
        "min": {"two_stage": min(t_old), "fused": min(t_new)},
        "median": {
            "two_stage": statistics.median(t_old),
            "fused": statistics.median(t_new),
        },
    }
    os.makedirs("bench_artifacts", exist_ok=True)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"bench_artifacts/INDEX_FUSE_r15_{sf_tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
