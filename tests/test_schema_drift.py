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


def test_events_table_normalizes_both_parquet_vintages(spark, tmp_path):
    """Write the SAME events as TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    parquet and assert events_table yields identical (ts, ts_ns) for
    both — the bidirectional pin for the dtype branch that round 4's
    frozen nanos assumption lacked."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_009_999_000_001]
    base = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["click", "view", "purchase"]),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(['{"k":1}', '{"k":2}', '{"k":3}']),
    }
    for vintage, ts_arr, version in [
        ("micros", pa.array(micros, pa.timestamp("us")), "2.4"),
        ("nanos", pa.array([m * 1000 for m in micros], pa.timestamp("ns")), "2.6"),
    ]:
        d = tmp_path / vintage
        d.mkdir()
        tbl = pa.table({"event_id": base["event_id"], "ts": ts_arr,
                        "user_id": base["user_id"], "event_type": base["event_type"],
                        "value": base["value"], "props": base["props"]})
        pq.write_table(tbl, str(d / "events.parquet"), version=version,
                       coerce_timestamps=None)

    from local_pubchem_db_spark.queries import events_table

    got = {}
    for vintage in ("micros", "nanos"):
        df = events_table(spark, str(tmp_path / vintage))
        dt = dict(df.dtypes)
        assert dt["ts"] == "timestamp", (vintage, dt)
        assert dt["ts_ns"] == "bigint", (vintage, dt)
        got[vintage] = sorted(
            (r["event_id"], r["ts"], r["ts_ns"])
            for r in df.select("event_id", "ts", "ts_ns").collect()
        )
    assert got["micros"] == got["nanos"]
    assert [t[2] for t in got["micros"]] == [m * 1000 for m in micros]


def test_events_table_leaves_foreign_conf_alone(spark, sf_dir, tmp_path):
    """events_table must not mutate a session's nanosAsLong conf: an
    explicit value (even 'false') is never overridden, and on MICROS
    data an unset conf STAYS unset — the footer sniff decides, not a
    blanket spark.conf.set (the foreign-session-mutation principle from
    round 2, re-flagged by the round-5 verdict)."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    saved = spark.conf.get(key, None)
    try:
        # Explicit false on MICROS testdata: readable, conf untouched.
        spark.conf.set(key, "false")
        df = events_table(spark, sf_dir)
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert spark.conf.get(key) == "false", "explicit conf was flipped"

        # Unset + MICROS data: the sniff finds no NANOS column, so the
        # session must remain unset (no legacy knob left behind).
        spark.conf.unset(key)
        df = events_table(spark, sf_dir)
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert spark.conf.get(key, None) is None, "conf set on MICROS data"
    finally:
        spark.conf.unset(key)
        if saved is not None:
            spark.conf.set(key, saved)


def test_events_table_sets_conf_only_for_nanos_vintage(spark, tmp_path):
    """On a genuine TIMESTAMP(NANOS) footer with the conf unset, the
    sniff enables nanosAsLong (the read is impossible without it) —
    the one case events_table is allowed to touch the session."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    key = "spark.sql.legacy.parquet.nanosAsLong"
    d = tmp_path / "nanos_only"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
    saved = spark.conf.get(key, None)
    try:
        spark.conf.unset(key)
        df = events_table(spark, str(d))
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert spark.conf.get(key, None) == "true"
    finally:
        spark.conf.unset(key)
        if saved is not None:
            spark.conf.set(key, saved)
