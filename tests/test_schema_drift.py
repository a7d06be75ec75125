"""Testdata schema-drift guard.

Round 4 was lost to a single upstream change: the driver regenerated
events.parquet with ts as TIMESTAMP(MICROS) where the engine assumed
TIMESTAMP(NANOS)-as-long, and six queries, twelve tests, and the entire
bench artifact died with the same AnalysisException. This module turns
that failure mode into ONE readable test: every registered query must
*analyze* against the schemas actually on disk. Accessing ``df.schema``
forces analysis (resolution + type checking) without executing the plan,
so the sweep is cheap even though it covers the full registry.
"""

import pyspark.sql.functions as F
import pytest

from local_pubchem_db_spark.queries import QUERIES, TABLES, events_table


def test_events_ts_normalizes_to_timestamp(spark, sf_dir):
    """events_table must yield ts:timestamp + ts_ns:bigint regardless of
    how the parquet stores ts (nanos-as-long or native micros)."""
    ev = events_table(spark, sf_dir)
    dt = dict(ev.dtypes)
    assert dt["ts"] == "timestamp", dt
    assert dt["ts_ns"] == "bigint", dt
    # The two representations must agree exactly (integer nanos).
    row = (
        ev.select(
            F.max(F.abs(F.unix_micros("ts") * F.lit(1000) - F.col("ts_ns"))).alias("d")
        ).first()
    )
    assert row["d"] == 0


def test_all_tables_readable(spark, sf_dir):
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        assert len(df.schema.fields) > 0, name


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes_against_live_schemas(spark, sf_dir, name):
    """Construct each registered query against the real testdata and force
    analysis. A driver-side testdata regeneration that breaks any query
    now fails here with one message naming the query, instead of
    cascading through the correctness harness, the test suite, and the
    bench artifact at once."""
    df = QUERIES[name](spark, sf_dir)
    assert df.schema is not None
