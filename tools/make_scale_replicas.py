"""Build an sf(N*K)-equivalent dataset by replicating a base sf dir K
times with consistent key offsets — the harness behind the README scale
table (previous rounds built these replicas ad hoc; this pins the
recipe).

Usage:
  python tools/make_scale_replicas.py [base_sf_dir] [out_dir] [copies]

Key semantics: every fact/dim key is offset by ``rep * (max_key + 1)``
using ONE stride per key family, so foreign keys stay consistent across
replicas (orders.o_custkey moves in lockstep with customer.c_custkey,
lineitem.l_orderkey with orders.o_orderkey, ...). region/nation are
true dimensions (TPC-H does not scale them) and are copied once.
Text/embedding payloads are replicated VERBATIM on purpose: the scaled
documents/embeddings tables contain K-way exact near-dup clusters, so
the dedup/similarity operators run the flood-shaped regime their bucket
caps exist for — a scale test that skipped the caps would be the easy
one.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from local_pubchem_db_spark.session import get_spark

# key column -> stride family (families share one stride so FKs line up)
TABLE_KEYS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# where each stride family reads its max key from
FAMILY_SOURCE = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="make-scale-replicas")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    strides = {}
    for fam, (tbl, col) in FAMILY_SOURCE.items():
        mx = (
            spark.read.parquet(f"{base}/{tbl}.parquet")
            .agg(F.max(col).alias("m"))
            .first()["m"]
        )
        strides[fam] = int(mx) + 1

    reps = spark.range(copies).withColumnRenamed("id", "__rep")
    for tbl, keys in TABLE_KEYS.items():
        df = spark.read.parquet(f"{base}/{tbl}.parquet")
        if not keys:  # unscaled dimension
            df.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
            continue
        # Deterministic output layout (r10): the bare crossJoin inherits
        # whichever side AQE broadcasts — with a 1-file base that can be
        # ONE output partition, i.e. one parquet ROW GROUP holding the
        # whole table, and parquet readers cannot split a row group, so
        # every scan of the replica ran single-task (sf10 events: 10M
        # rows, 1 row group — event_windows 10.9s vs 6.1s; the r9 sf100
        # events shipped 100M rows in 8 row groups = 8-way scans on 32
        # cores). Size the write like a real table: ~96 MB of
        # base-compressed bytes per output file, floor one per core —
        # by repartitioning the small BASE before the multiply and
        # broadcasting the replica index, so the only shuffle moves
        # base_bytes, never base_bytes*copies (the naive post-multiply
        # repartition spilled ~17 GB of shuffle at sf100 and filled the
        # disk).
        src = f"{base}/{tbl}.parquet"
        base_bytes = (
            os.path.getsize(src)
            if os.path.isfile(src)
            else sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(src)
                for f in fs
                if f.endswith(".parquet")
            )
        ) or (96 << 20)
        n_out = max(
            spark.sparkContext.defaultParallelism,
            int(base_bytes * copies // (96 << 20)) + 1,
        )
        scaled = df.repartition(n_out).crossJoin(F.broadcast(reps))
        for col, fam in keys.items():
            scaled = scaled.withColumn(
                col, F.col(col) + F.col("__rep") * F.lit(strides[fam])
            )
        (
            scaled.drop("__rep")
            .write.mode("overwrite")
            .parquet(f"{out}/{tbl}.parquet")
        )
        print(f"{tbl}: x{copies} -> {n_out} files")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
