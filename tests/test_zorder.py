"""Z-order layout: correctness (same row set) and measured multi-column
data skipping via parquet footer min/max stats — the property the
operator exists to buy."""

import glob
import os

import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.physical import (
    interleave_bits,
    write_zordered,
)


def _overlap_fraction(path, col_lo_hi):
    """Fraction of row groups whose [min,max] stats overlap every
    (col, lo, hi) box side — i.e. the row groups a stats-pruning reader
    must actually scan for the conjunctive predicate."""
    total = overlapping = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = papq.ParquetFile(f)
        names = {c: i for i, c in enumerate(pf.schema_arrow.names)}
        for rg in range(pf.metadata.num_row_groups):
            meta = pf.metadata.row_group(rg)
            total += 1
            hit = True
            for col, lo, hi in col_lo_hi:
                st = meta.column(names[col]).statistics
                if st.max < lo or st.min >= hi:
                    hit = False
                    break
            overlapping += hit
    assert total > 0
    return overlapping / total


def test_interleave_bits_unit(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1)], "a int, b int"
    ).select(interleave_bits([F.col("a"), F.col("b")], bits=2).alias("z"))
    got = sorted(r["z"] for r in rows.collect())
    # z(a,b): a bits at even positions, b at odd: (3,3)->15, (2,1)->6
    assert got == sorted([0, 1, 2, 15, 6])


def test_zorder_preserves_rows_and_prunes(spark, tmp_path):
    df = spark.range(40000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit("x")), F.lit(200)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("y")), F.lit(200)).alias("y"),
    )
    zpath, bpath = str(tmp_path / "z"), str(tmp_path / "base")
    info = write_zordered(df, zpath, ["x", "y"], n_files=16, bits=6)
    assert info["n_files"] == 16
    # baseline: same data, same file count, hash-scattered layout
    df.repartition(16).write.mode("overwrite").parquet(bpath)

    back = spark.read.parquet(zpath)
    assert back.columns == ["id", "x", "y"]  # __z dropped
    assert (
        sorted(r["id"] for r in back.collect())
        == sorted(r["id"] for r in df.collect())
    )

    # 5% x 5% box on both dims: z-order must let stats prune most row
    # groups; the scattered baseline overlaps essentially all of them
    box = [("x", 60, 70), ("y", 60, 70)]
    frac_z = _overlap_fraction(zpath, box)
    frac_b = _overlap_fraction(bpath, box)
    assert frac_b > 0.9
    assert frac_z <= 0.35
    assert frac_z < frac_b / 2

    # and the surviving row groups still contain every matching row
    got = (
        spark.read.parquet(zpath)
        .filter((F.col("x") >= 60) & (F.col("x") < 70) & (F.col("y") >= 60) & (F.col("y") < 70))
        .count()
    )
    want = df.filter(
        (F.col("x") >= 60) & (F.col("x") < 70) & (F.col("y") >= 60) & (F.col("y") < 70)
    ).count()
    assert got == want > 0


def test_zorder_skewed_input_stays_balanced(spark, tmp_path):
    """Equi-depth ranks keep file sizes balanced under heavy key skew
    (half the rows at a single point)."""
    df = spark.range(20000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(
            F.pmod(F.xxhash64("id", F.lit("xs")), F.lit(1000))
        ).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("ys")), F.lit(1000)).alias("y"),
    )
    path = str(tmp_path / "skew")
    write_zordered(df, path, ["x", "y"], n_files=8, bits=6)
    sizes = [
        papq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(path, "*.parquet"))
    ]
    assert sum(sizes) == 20000
    assert max(sizes) <= 6 * (20000 / 8)  # no single-file pileup


def test_zorder_validates_args(spark):
    df = spark.range(10).select("id", (F.col("id") * 2).alias("x"))
    with pytest.raises(ValueError):
        write_zordered(df, "/tmp/nope", ["x"])
    with pytest.raises(ValueError):
        write_zordered(df, "/tmp/nope", ["id", "x"], bits=0)


def test_zorder_plan_is_codegen(spark):
    """The z expression is pure long arithmetic — no Python eval in the
    projection."""
    df = spark.range(100).select(
        "id",
        F.pmod(F.xxhash64("id"), F.lit(64)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("s")), F.lit(64)).alias("y"),
    )
    z = df.select(interleave_bits([F.col("x"), F.col("y")], 6).alias("z"))
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_zorder_timestamp_dimension(spark, tmp_path):
    """time x key — the canonical z-order pair: timestamp dims rank by
    epoch seconds, both dims prune."""
    df = spark.range(30000).select(
        F.col("id"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.pmod(F.xxhash64("id", F.lit("t")), F.lit(86400 * 30))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit("u")), F.lit(500)).alias("user_id"),
    )
    path = str(tmp_path / "zts")
    write_zordered(df, path, ["ts", "user_id"], n_files=16, bits=6)
    back = spark.read.parquet(path)
    assert back.count() == 30000
    assert dict(back.dtypes)["ts"] == "timestamp"
    # ~1/30 time slice x 10% of users
    lo = 1700000000 + 86400 * 10
    hi = lo + 86400
    pred = (
        (F.col("ts") >= F.timestamp_seconds(F.lit(lo)))
        & (F.col("ts") < F.timestamp_seconds(F.lit(hi)))
        & (F.col("user_id") < 50)
    )
    assert back.filter(pred).count() == df.filter(pred).count() > 0
    # footer stats on the ts column must be selective: most row groups
    # excluded by the one-day slice alone
    import glob as _glob

    tot = ov = 0
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        pf = papq.ParquetFile(f)
        names = {c: i for i, c in enumerate(pf.schema_arrow.names)}
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(names["ts"]).statistics
            tot += 1
            ov += not (
                st.max.timestamp() < lo or st.min.timestamp() >= hi
            )
    assert tot >= 16
    assert ov / tot <= 0.5


def test_equidepth_bucket_rank_matches_linear_count(spark):
    """The heap-order binary search must equal #{boundary <= v} for any
    sorted cut-point array — including the duplicate-heavy arrays
    approxQuantile returns on skewed data."""
    import random

    from local_pubchem_db_spark.operators.physical import _equidepth_bucket

    rng = random.Random(7)
    for bits in (1, 2, 4, 6):
        m = 2**bits - 1
        # duplicate-heavy boundaries: draw from a tiny value domain
        bounds = sorted(rng.choice([0.0, 1.0, 2.0, 5.0, 5.0, 9.0]) for _ in range(m))
        probes = [rng.uniform(-1, 11) for _ in range(40)] + [0.0, 5.0, 9.0, -1.0, 11.0]
        df = spark.createDataFrame([(v,) for v in probes], "v double")
        got = [
            r["b"]
            for r in df.select(
                _equidepth_bucket(F.col("v"), bounds, bits).alias("b")
            ).collect()
        ]
        want = [sum(1 for x in bounds if v >= x) for v in probes]
        assert got == want, (bits, bounds)


def test_zorder_bit_budget_validated(spark):
    df = spark.range(10).select(
        "id",
        (F.col("id") * 2).alias("a"),
        (F.col("id") * 3).alias("b"),
        (F.col("id") * 5).alias("c"),
        (F.col("id") * 7).alias("d"),
    )
    with pytest.raises(ValueError, match="z-bits; must be <= 63"):
        write_zordered(df, "/tmp/nope", ["a", "b", "c", "d"], bits=16)


def test_zorder_int96_guard_survives_trailing_date_column(spark, tmp_path):
    """A date column AFTER a timestamp column must not disarm the INT96
    fail-fast (regression: has_ts was overwritten per column)."""
    df = spark.range(100).select(
        "id",
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
    )
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try:
        with pytest.raises(ValueError, match="INT96"):
            write_zordered(df, str(tmp_path / "z96"), ["ts", "d"], n_files=2, bits=4)
    finally:
        spark.conf.set(key, prev)
    # with the session default (TIMESTAMP_MICROS) the same call succeeds
    write_zordered(df, str(tmp_path / "zok"), ["ts", "d"], n_files=2, bits=4)
    assert spark.read.parquet(str(tmp_path / "zok")).count() == 100


def test_zorder_layout_is_deterministic(spark, tmp_path):
    """Two writes of the same input must produce byte-stable layout
    decisions: identical per-file row counts and identical footer-stats
    overlap for a fixed box (the r7 flake was repartitionByRange's
    unseeded boundary sampling wiggling file spans between runs)."""
    df = spark.range(20000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit("dx")), F.lit(300)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("dy")), F.lit(300)).alias("y"),
    )

    def layout(path):
        write_zordered(df, path, ["x", "y"], n_files=8, bits=5)
        sizes = sorted(
            papq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )
        frac = _overlap_fraction(path, [("x", 100, 120), ("y", 100, 120)])
        return sizes, frac

    a = layout(str(tmp_path / "za"))
    b = layout(str(tmp_path / "zb"))
    assert a == b


def test_hash_slot_values_bijection(spark):
    """Every shuffle slot gets exactly one routing value."""
    from local_pubchem_db_spark.operators.physical import _hash_slot_values

    for n in (2, 7, 16, 33):
        vals = _hash_slot_values(spark, n)
        assert len(vals) == n == len(set(vals))
        got = [
            r["s"]
            for r in spark.createDataFrame(
                [(int(v),) for v in vals], "v long"
            ).select(F.pmod(F.hash("v"), F.lit(n)).alias("s")).collect()
        ]
        assert got == list(range(n))
