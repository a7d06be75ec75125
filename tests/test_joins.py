"""Join operator semantics: as-of, range, banded range."""

from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.joins import (
    as_of_join,
    banded_range_join,
    range_join,
)


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 25), (3, 100, 5), (4, 200, 50)],
        "lid long, key long, ts long",
    )
    right = spark.createDataFrame(
        [(100, 10, "a"), (100, 20, "b"), (300, 1, "z")],
        "key long, rts long, tag string",
    )
    out = {
        r["lid"]: (r["tag"], r["rts"])
        for r in as_of_join(
            left, right, ["key"], "ts", "rts", ["tag", "rts"]
        ).collect()
    }
    assert out[1] == ("a", 10)   # ts=10 matches same-instant right row
    assert out[2] == ("b", 20)   # ts=25 takes the latest prior (20, not 10)
    assert out[3] == (None, None)  # ts=5: no right row yet
    assert out[4] == (None, None)  # key 200: no right rows at all
    assert len(out) == 4


def test_range_join_vs_banded(spark, sf_dir):
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice"
    )
    probes = parts.filter(F.col("p_partkey") <= 10).select(
        F.col("p_partkey").alias("probe_id"),
        F.col("p_retailprice").alias("probe_price"),
    )
    a = set(
        (r["probe_id"], r["p_partkey"])
        for r in range_join(parts, probes, "p_retailprice", "probe_price", 2.0).collect()
    )
    b = set(
        (r["probe_id"], r["p_partkey"])
        for r in banded_range_join(
            parts, probes, "p_retailprice", "probe_price", 2.0
        ).collect()
    )
    assert a == b and len(a) > 0
