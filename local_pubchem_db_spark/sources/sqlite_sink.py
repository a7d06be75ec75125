"""SQLite export sink: materialize a DataFrame as the reference's output
format so its downstream SQL (EP3, reference unittests_utils.py:253-334)
runs verbatim against our build.

SQLite is a single-file, single-writer library database — there is no
distributed write path to it, by design (reference utils.py:298 opens one
in-process connection). The scale posture is therefore explicit:

- the DISTRIBUTED part of the pipeline (parse, transform, filter,
  dedup, ...) runs on Spark and lands in parquet — that is the 100 TB
  store;
- this sink is the final EXPORT hop for reference-compatible consumers:
  results stream to the driver partition-by-partition
  (``toLocalIterator`` — never a full collect) and are bulk-inserted in
  one transaction per partition. Export size is bounded by what SQLite
  itself can hold, not by Spark.

Type mapping mirrors the reference DDL (utils.py:181-201): LongType →
INTEGER, DoubleType → REAL, everything else → TEXT via str().
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _sqlite_type(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "real"
    return "varchar"


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    mode: str = "overwrite",
    primary_key: str | None = None,
    not_null: list[str] | None = None,
    indexes: list[str] | None = None,
    batch_size: int = 10_000,
) -> int:
    """Export ``df`` into ``db_path``/``table``; returns rows written.

    ``mode``: 'overwrite' drops and recreates the table; 'append' inserts
    into an existing one. ``primary_key``/``not_null`` reproduce the
    reference's layout-driven DDL constraints; ``indexes`` get the
    reference's deferred ``idx_<col>`` secondary indexes, built AFTER the
    bulk load (utils.py:334-341 — bulk-load-then-index).
    """
    not_null = not_null or []
    cols = []
    for f in df.schema.fields:
        clause = f"{f.name} {_sqlite_type(f.dataType)}"
        if f.name == primary_key:
            clause += " not null primary key"
        elif f.name in not_null:
            clause += " not null"
        cols.append(clause)
    placeholders = ",".join("?" * len(df.columns))
    insert = f"INSERT INTO {table} ({','.join(df.columns)}) VALUES ({placeholders})"

    con = sqlite3.connect(db_path)
    try:
        with con:
            if mode == "overwrite":
                con.execute(f"DROP TABLE IF EXISTS {table}")
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)})"
            )
        n = 0
        batch: list[tuple] = []
        # partition-at-a-time streaming: driver memory is bounded by one
        # partition, and each executemany runs inside one transaction.
        with con:
            for row in df.toLocalIterator(prefetchPartitions=True):
                batch.append(tuple(row))
                if len(batch) >= batch_size:
                    con.executemany(insert, batch)
                    n += len(batch)
                    batch = []
            if batch:
                con.executemany(insert, batch)
                n += len(batch)
        with con:
            for col in indexes or []:
                con.execute(f"DROP INDEX IF EXISTS idx_{col}")
                con.execute(f"CREATE INDEX idx_{col} ON {table}({col})")
        return n
    finally:
        con.close()
