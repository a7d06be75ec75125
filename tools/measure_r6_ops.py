"""Pinned measurement recipe for the round-6 operators' README scale
rows (DSIR, bloom decontamination, z-order write) — run against a
replica dir produced by ``tools/make_scale_replicas.py``.

Usage:
  python tools/make_scale_replicas.py /root/testdata/sf0.1 /tmp/sf1_replicas 10
  python tools/measure_r6_ops.py [/tmp/sf1_replicas]

Prints one line per workload; the numbers recorded in README's scale
table came from exactly this script on the driver host.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow.parquet as papq
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from local_pubchem_db_spark.operators.bloom import decontaminate_bloom
from local_pubchem_db_spark.operators.dedup import decontaminate
from local_pubchem_db_spark.operators.physical import write_zordered
from local_pubchem_db_spark.operators.resampling import dsir_select
from local_pubchem_db_spark.session import get_spark


def _box_overlap(path: str, box) -> str:
    tot = ov = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = papq.ParquetFile(f)
        names = {c: i for i, c in enumerate(pf.schema_arrow.names)}
        for rg in range(pf.metadata.num_row_groups):
            m = pf.metadata.row_group(rg)
            tot += 1
            ov += all(
                not (
                    m.column(names[c]).statistics.max < lo
                    or m.column(names[c]).statistics.min >= hi
                )
                for c, lo, hi in box
            )
    return f"{ov}/{tot}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replicas"
    spark = get_spark(app_name="measure_r6_ops")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="r6meas_")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # warm the PYTHON workers (a real pandas UDF — a codegen expression
    # would not fork them and the first timed workload would absorb it)
    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    # noop-sink write (bench.py's pattern): count() would let Catalyst
    # prune the UDF projection away and never fork a worker
    spark.range(0, 64, 1, 64).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    target = docs.filter(F.col("doc_id") % 100 == 0).select("doc_id", "text")
    t0 = time.time()
    cnt = dsir_select(
        docs.select("doc_id", "text"), target, k=5000, n_buckets=8192, seed="s"
    ).count()
    print(
        f"dsir_select: {n} raw docs, {target.count()}-doc target, k=5000 -> "
        f"{cnt} rows in {time.time() - t0:.2f}s"
    )

    eval_df = docs.filter(F.col("doc_id") % 100 == 1)
    train = docs.filter(F.col("doc_id") % 100 != 1)
    t0 = time.time()
    ne = decontaminate(train, eval_df, "doc_id", "text").count()
    te = time.time() - t0
    t0 = time.time()
    nb = decontaminate_bloom(train, eval_df, "doc_id", "text").count()
    tb = time.time() - t0
    print(
        f"decontaminate {n}: exact {ne} kept in {te:.2f}s; "
        f"bloom {nb} kept in {tb:.2f}s"
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    nl = li.count()
    zp, bp = f"{out}/zorder_li", f"{out}/plain_li"
    t0 = time.time()
    write_zordered(li, zp, ["l_partkey", "l_suppkey"], n_files=64, bits=8)
    tz = time.time() - t0
    t0 = time.time()
    li.repartition(64).write.mode("overwrite").parquet(bp)
    tp = time.time() - t0
    q = li.approxQuantile(["l_partkey", "l_suppkey"], [0.5, 0.55], 0.001)
    box = [
        ("l_partkey", q[0][0], q[0][1]),
        ("l_suppkey", q[1][0], q[1][1]),
    ]
    print(
        f"write_zordered: {nl} rows in {tz:.1f}s (plain write {tp:.1f}s); "
        f"5%x5% box overlap zorder={_box_overlap(zp, box)} "
        f"plain={_box_overlap(bp, box)}"
    )


if __name__ == "__main__":
    main()
