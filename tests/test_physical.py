"""Physical-design tests: bucketed joins avoid the shuffle, salted
aggregation matches direct aggregation."""

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.physical import (
    bucketed_join,
    salted_group_count,
    save_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # spark.sql.warehouse.dir is static; park the tables at a tmp path
    # via the external-table `path` option instead.
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    save_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b", ["orderkey"], 8, sort_cols=["orderkey"],
        path=str(wh / "orders_b"),
    )
    save_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "lineitem_b", ["orderkey"], 8, sort_cols=["orderkey"],
        path=str(wh / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # At test scale Catalyst would broadcast the small side; disable that to
    # surface the plan the bucketing is for (big-big join at 100 TB).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it actually joins correctly
    li = spark.table(right)
    assert joined.count() == li.join(
        spark.table(left), "orderkey", "left_semi"
    ).count()


def test_bucketed_join_correct_rows(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, ["orderkey"]).count()
    want = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want


def test_salted_group_count_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["n"]
        for r in salted_group_count(li, "l_returnflag", salt=16).collect()
    }
    want = {
        r["l_returnflag"]: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    assert got == want


def test_profile_table_stats(spark, sf_dir):
    from local_pubchem_db_spark.operators.physical import profile_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = {r["column"]: r for r in profile_table(docs).collect()}
    assert set(prof) == set(docs.columns)
    n = docs.count()
    for c, r in prof.items():
        assert r["n_rows"] == n
        exact_nulls = docs.filter(F.col(c).isNull()).count()
        assert r["n_nulls"] == exact_nulls
        exact_distinct = docs.select(c).distinct().count()
        # HLL at 5% rsd: allow 3 sigma
        assert abs(r["approx_distinct"] - exact_distinct) <= max(
            3, 0.15 * exact_distinct
        )
    # min/max round-trip for the numeric id column
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert int(prof["doc_id"]["min_str"]) == min(ids)
    assert int(prof["doc_id"]["max_str"]) == max(ids)


def test_profile_table_single_job(spark, sf_dir):
    from local_pubchem_db_spark.operators.physical import profile_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = profile_table(docs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re
    # all stats fold into ONE aggregation over ONE scan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_write_compacted_sizes_files(spark, tmp_path):
    import glob
    import os

    from local_pubchem_db_spark.operators.physical import write_compacted

    # ~100-byte rows x 20k rows ~ 2 MB of payload; 0.25 MB target -> >= 4 files
    df = spark.range(20_000).selectExpr(
        "id", "repeat(uuid(), 3) AS payload"
    )
    out = str(tmp_path / "compacted")
    info = write_compacted(df, out, target_file_mb=0.25)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert info["rows"] == 20_000
    assert len(files) == info["files"] >= 4
    sizes = [os.path.getsize(f) for f in files]
    # every file within ~2x of target (compression variance allowance)
    assert max(sizes) <= 2 * 0.25 * 1024 * 1024
    # and balanced: smallest within 3x of largest
    assert min(sizes) * 3 >= max(sizes)
    # round-trips losslessly
    assert spark.read.parquet(out).count() == 20_000


def test_write_compacted_empty_input(spark, tmp_path):
    from local_pubchem_db_spark.operators.physical import write_compacted

    df = spark.range(0).selectExpr("id", "cast(id AS string) AS s")
    out = str(tmp_path / "empty")
    info = write_compacted(df, out)
    assert info == {"rows": 0, "files": 0, "rows_per_file": 0}
    assert spark.read.parquet(out).count() == 0


def test_table_health_reports_layout_and_stats(spark, tmp_path):
    from local_pubchem_db_spark.operators.physical import (
        span_amplification,
        table_health,
        write_zordered,
    )

    df = spark.range(20000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit("a")), F.lit(100)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("b")), F.lit(100)).alias("y"),
    )
    zp, pp = str(tmp_path / "z"), str(tmp_path / "p")
    write_zordered(df, zp, ["x", "y"], n_files=8, bits=5)
    df.repartition(8).write.parquet(pp)

    hz = table_health(spark, zp, ["x", "y"])
    hp = table_health(spark, pp, ["x", "y"])
    hz_pd, hp_pd = hz.toPandas(), hp.toPandas()
    assert hz_pd["rows"].sum() == hp_pd["rows"].sum() == 20000
    assert hz_pd["x_has_stats"].all() and hp_pd["x_has_stats"].all()
    assert set(hz_pd.columns) == {
        "file", "bytes", "rows", "n_row_groups",
        "x_has_stats", "x_min", "x_max", "y_has_stats", "y_min", "y_max",
    }
    # clustering verdict: hash-scattered files each span ~the full
    # range (amplification ~= n_files); z-order SHARES clustering
    # across dims — per-dim amplification ~= sqrt(n_files) (8 files =
    # 3 z-prefix bits = x splits in 2, y in 4), so expect ~4-5 on x
    # and strictly better than scattered on BOTH dims at once
    amp_z_x, amp_z_y = span_amplification(hz, "x"), span_amplification(hz, "y")
    amp_p_x, amp_p_y = span_amplification(hp, "x"), span_amplification(hp, "y")
    assert amp_p_x > 6.0 and amp_p_y > 6.0  # each file nearly full-range
    assert amp_z_x < 0.75 * amp_p_x and amp_z_y < 0.75 * amp_p_y
    assert amp_z_x * amp_z_y < 0.33 * amp_p_x * amp_p_y


def test_table_health_errors_on_empty_dir(spark, tmp_path):
    import pytest as _pytest

    from local_pubchem_db_spark.operators.physical import table_health

    d = tmp_path / "empty"
    d.mkdir()
    with _pytest.raises(ValueError, match="no parquet files"):
        table_health(spark, str(d))


def test_table_health_timestamp_stats_report_epoch_spans(spark, tmp_path):
    from local_pubchem_db_spark.operators.physical import table_health

    df = spark.range(1000).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts")
    )
    p = str(tmp_path / "ts_table")
    df.coalesce(2).write.parquet(p)
    h = table_health(spark, p, ["ts"]).toPandas()
    assert h["ts_has_stats"].all()
    assert (h["ts_min"] >= 1700000000.0).all()
    assert (h["ts_max"] <= 1700000000.0 + 1000 * 60).all()


def test_table_health_recurses_partitioned_layouts(spark, tmp_path):
    from local_pubchem_db_spark.operators.physical import table_health

    df = spark.range(100).select(
        "id", (F.col("id") % 3).alias("k")
    )
    p = str(tmp_path / "parted")
    df.write.partitionBy("k").parquet(p)
    h = table_health(spark, p, ["id"]).toPandas()
    assert h["rows"].sum() == 100
    assert len(h) >= 3


def test_table_health_partition_column_and_empty_file(spark, tmp_path):
    from local_pubchem_db_spark.operators.physical import table_health

    df = spark.range(100).select("id", (F.col("id") % 3).alias("k"))
    p = str(tmp_path / "parted2")
    df.write.partitionBy("k").parquet(p)
    # a partition column has no per-file stats — report, don't crash
    h = table_health(spark, p, ["k", "id"]).toPandas()
    assert (~h["k_has_stats"]).all()
    assert h["k_min"].isna().all()
    assert h["id_has_stats"].all()

    # an empty write produces a schema-only file (0 row groups)
    e = str(tmp_path / "empty_table")
    spark.range(0).select("id").write.parquet(e)
    he = table_health(spark, e, ["id"]).toPandas()
    assert he["rows"].sum() == 0
    assert he["id_min"].isna().all()


def test_table_health_hadoop_scheme_rewrite_and_loud_failure(spark):
    """Hadoop-only URI schemes (r10): s3a/s3n rewrite to pyarrow's s3
    scheme; schemes pyarrow has no filesystem for fail AT PLAN TIME with
    actionable guidance naming open_file — not task-by-task on
    executors with pyarrow's opaque resolver error."""
    import pytest

    from local_pubchem_db_spark.operators.physical import (
        _pyarrow_uri,
        table_health,
    )

    assert _pyarrow_uri("s3a://bkt/t/p.parquet") == "s3://bkt/t/p.parquet"
    assert _pyarrow_uri("S3N://bkt/p.parquet") == "s3://bkt/p.parquet"
    assert _pyarrow_uri("/plain/local.parquet") == "/plain/local.parquet"
    assert _pyarrow_uri("hdfs://nn/p.parquet") == "hdfs://nn/p.parquet"
    with pytest.raises(ValueError, match="open_file"):
        table_health(
            spark,
            "weirdfs://cluster/table",
            files=[("weirdfs://cluster/table/a.parquet", 123)],
        )


def test_table_health_open_file_bypasses_scheme_check(spark, tmp_path):
    """With open_file supplied, any scheme is the caller's business —
    the footer reads go through their handle, so an otherwise
    unresolvable URI must still work end-to-end."""
    import pandas as pd

    from local_pubchem_db_spark.operators.physical import table_health

    real = str(tmp_path / "d.parquet")
    pd.DataFrame({"id": [1, 2, 3]}).to_parquet(real)
    size = __import__("os").path.getsize(real)

    def opener(path, _real=real):
        assert path.startswith("weirdfs://")
        return open(_real, "rb")

    h = table_health(
        spark,
        "weirdfs://cluster/table",
        stats_cols=["id"],
        files=[("weirdfs://cluster/table/d.parquet", size)],
        open_file=opener,
    ).toPandas()
    assert len(h) == 1
    assert int(h["rows"][0]) == 3
    assert bool(h["id_has_stats"][0])


def test_table_health_spark_listing_matches_driver(spark, tmp_path, monkeypatch):
    """listing='spark' lists the table THROUGH Spark (binaryFile
    metadata scan) and must match the driver os.walk result; 'auto'
    must fall back to the Spark listing when the driver has no POSIX
    view of the path (simulated by an os.walk that sees nothing)."""
    from local_pubchem_db_spark.operators.physical import table_health

    df = spark.range(200).select("id", (F.col("id") % 4).alias("k"))
    p = str(tmp_path / "store")
    df.write.partitionBy("k").parquet(p)

    def key(h):
        return sorted(
            (r["file"], r["rows"], r["id_min"], r["id_max"])
            for _, r in h.iterrows()
        )

    via_driver = table_health(spark, p, ["id"], listing="driver").toPandas()
    via_spark = table_health(spark, p, ["id"], listing="spark").toPandas()
    assert key(via_driver) == key(via_spark)
    assert via_spark["rows"].sum() == 200

    # auto: driver walk sees nothing -> Spark listing takes over
    import os as _os

    monkeypatch.setattr(_os, "walk", lambda *_a, **_k: iter(()))
    via_auto = table_health(spark, p, ["id"], listing="auto").toPandas()
    assert key(via_auto) == key(via_spark)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="listing"):
        table_health(spark, p, ["id"], listing="nope")


def test_table_health_stats_by_leaf_path_not_position(spark, tmp_path):
    """A struct column AHEAD of the stats column flattens to multiple
    parquet leaves; positional arrow-name mapping would read another
    column's stats (ADVICE r6). Mapping by leaf path must report the
    true span, and the struct column itself reports no stats."""
    from local_pubchem_db_spark.operators.physical import table_health

    df = spark.range(50).select(
        F.struct(
            (F.col("id") * 1000).alias("a"), (F.col("id") * -1).alias("b")
        ).alias("s"),
        (F.col("id") + 7).alias("x"),
    )
    p = str(tmp_path / "structed")
    df.coalesce(1).write.parquet(p)
    h = table_health(spark, p, ["x", "s"]).toPandas()
    assert h["x_has_stats"].all()
    assert float(h["x_min"].min()) == 7.0
    assert float(h["x_max"].max()) == 56.0
    assert (~h["s_has_stats"]).all()
    assert h["s_min"].isna().all()


def test_table_health_accepts_sized_files_without_stat(spark, tmp_path):
    """(path, size) file entries must be used verbatim — no driver or
    executor stat call — so object-store listings can feed the audit."""
    from local_pubchem_db_spark.operators.physical import table_health

    p = str(tmp_path / "tiny")
    spark.range(10).select("id").coalesce(1).write.parquet(p)
    import os as _os

    fs = [
        (_os.path.join(p, fn), _os.path.getsize(_os.path.join(p, fn)))
        for fn in _os.listdir(p)
        if fn.endswith(".parquet")
    ]
    h = table_health(spark, p, ["id"], files=fs).toPandas()
    assert h["rows"].sum() == 10
    assert int(h["bytes"].sum()) == sum(s for _, s in fs)
    # planted wrong size proves the listing value is used verbatim
    h2 = table_health(
        spark, p, ["id"], files=[(f, 12345) for f, _ in fs]
    ).toPandas()
    assert (h2["bytes"] == 12345).all()


def test_table_health_custom_open_file_for_foreign_schemes(spark, tmp_path):
    """Schemes pyarrow cannot resolve (s3a://, hdfs://) route footer
    reads through a caller-supplied opener, invoked on executors with
    the listed path; sizes come from the listing or the handle, never a
    POSIX stat. Proven with a fake scheme only the opener understands."""
    import os as _os

    from local_pubchem_db_spark.operators.physical import table_health

    p = str(tmp_path / "t")
    spark.range(100).select("id").coalesce(2).write.parquet(p)
    real = sorted(
        _os.path.join(p, fn)
        for fn in _os.listdir(p)
        if fn.endswith(".parquet")
    )

    def opener(path):  # executors call this with the fake-scheme path
        assert path.startswith("fake://"), path
        return open(path[len("fake://"):], "rb")

    fake = [f"fake://{f}" for f in real]
    h = table_health(spark, p, ["id"], files=fake, open_file=opener)
    rows = h.toPandas().sort_values("file").reset_index(drop=True)
    assert rows["rows"].sum() == 100
    # sizes came from the handles (no listing sizes were given)
    assert list(rows["bytes"]) == [
        _os.path.getsize(f) for f in sorted(real, key=_os.path.basename)
    ]
    assert rows["id_has_stats"].all()
    # baseline equality: same stats as the default pyarrow path
    base = (
        table_health(spark, p, ["id"])
        .toPandas()
        .sort_values("file")
        .reset_index(drop=True)
    )
    for col in ("rows", "n_row_groups", "id_min", "id_max", "bytes"):
        assert list(rows[col]) == list(base[col]), col


def test_table_health_closes_every_opener_handle(spark, tmp_path):
    """Footer reads consume only in-memory metadata, so each opener
    handle must be closed before the next file — not leaked to task end
    (ADVICE r8: thousands of listed files would exhaust executor fds).
    Close events are proven via marker files because the opener runs in
    Python worker processes, not the driver."""
    import os as _os

    from local_pubchem_db_spark.operators.physical import table_health

    p = str(tmp_path / "t")
    spark.range(60).select("id").repartition(4).write.parquet(p)
    real = sorted(
        _os.path.join(p, fn)
        for fn in _os.listdir(p)
        if fn.endswith(".parquet")
    )
    closed = str(tmp_path / "closed")
    _os.makedirs(closed)

    class Tracked:
        def __init__(self, path):
            self._f = open(path, "rb")
            self._marker = _os.path.join(closed, _os.path.basename(path))

        def close(self):
            open(self._marker, "w").close()
            self._f.close()

        def __getattr__(self, name):
            return getattr(self._f, name)

    def opener(path):
        assert path.startswith("fake://"), path
        return Tracked(path[len("fake://"):])

    h = table_health(
        spark, p, ["id"], files=[f"fake://{f}" for f in real],
        open_file=opener,
    ).toPandas()
    assert h["rows"].sum() == 60
    assert sorted(_os.listdir(closed)) == sorted(
        _os.path.basename(f) for f in real
    )


def test_make_jvm_open_file_reads_parquet_footers(spark, tmp_path):
    """The JVM-FileSystem opener (r11, verdict Next #6): a seekable
    binary handle over Hadoop's own filesystem layer — pyarrow must be
    able to parse a parquet footer through it."""
    import pandas as pd
    import pyarrow.parquet as papq

    from local_pubchem_db_spark.operators.physical import make_jvm_open_file

    real = str(tmp_path / "j.parquet")
    pd.DataFrame({"id": [1, 2, 3, 4]}).to_parquet(real)
    opener = make_jvm_open_file(spark)
    assert getattr(opener, "_driver_only", False)
    fh = opener(f"file:{real}")
    try:
        assert fh.seekable() and fh.readable()
        md = papq.ParquetFile(fh).metadata
        assert md.num_rows == 4
    finally:
        fh.close()


def test_table_health_jvm_fallback_for_unresolvable_scheme(
    spark, tmp_path, monkeypatch
):
    """When pyarrow cannot resolve the scheme but the JVM can (the
    hdfs://-without-libhdfs deployment), table_health must fall back to
    the JVM opener with DRIVER-side parsing — same rows, a warning, no
    executor task failures. The classifier is faked (file:// stands in
    for the JVM-only scheme — the opener and parse path are real)."""
    import warnings

    import pandas as pd

    from local_pubchem_db_spark.operators import physical

    real = str(tmp_path / "h.parquet")
    pd.DataFrame({"id": [10, 20, 30]}).to_parquet(real)
    size = __import__("os").path.getsize(real)
    monkeypatch.setattr(
        physical,
        "_classify_footer_scheme",
        lambda path: ("categorical", "Unrecognized filesystem type (faked)"),
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        h = physical.table_health(
            spark,
            "ignored",
            stats_cols=["id"],
            files=[(f"file:{real}", size)],
        ).toPandas()
    assert any("JVM Hadoop FileSystem" in str(w.message) for w in caught)
    assert len(h) == 1
    assert int(h["rows"][0]) == 3
    assert bool(h["id_has_stats"][0])
    assert float(h["id_min"][0]) == 10.0 and float(h["id_max"][0]) == 30.0
    assert int(h["bytes"][0]) == size


def test_table_health_environmental_failure_warns_and_proceeds(
    spark, tmp_path, monkeypatch
):
    """A driver-side resolution failure that may be executor-local
    (missing credentials/network — the s3:// case) must WARN and
    proceed to the distributed path, not raise (ADVICE r10). JVM route
    is disabled to simulate a scheme the JVM lacks too."""
    import warnings

    import pandas as pd

    from local_pubchem_db_spark.operators import physical

    real = str(tmp_path / "e.parquet")
    pd.DataFrame({"id": [5, 6]}).to_parquet(real)
    size = __import__("os").path.getsize(real)
    monkeypatch.setattr(
        physical,
        "_classify_footer_scheme",
        lambda path: ("environmental", "region/credentials (faked)"),
    )

    class _NoJvm:
        _driver_only = True

        def __init__(self, spark):
            pass

        def __call__(self, path):
            raise OSError("no route (faked)")

    monkeypatch.setattr(physical, "_JvmOpenFile", _NoJvm)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        h = physical.table_health(
            spark,
            "ignored",
            files=[(f"file:{real}", size)],
        ).toPandas()
    assert any("proceeding anyway" in str(w.message) for w in caught)
    assert len(h) == 1 and int(h["rows"][0]) == 2


def test_classify_footer_scheme_triage():
    """Classifier contract against pyarrow's real resolution: local
    paths -> None; a scheme pyarrow has no filesystem for (ArrowInvalid)
    -> categorical; a scheme whose resolution fails for host-specific
    reasons (hdfs without libhdfs -> OSError) -> environmental. The
    hdfs case degrades to None on hosts that DO have libhdfs."""
    from local_pubchem_db_spark.operators.physical import (
        _classify_footer_scheme,
    )

    assert _classify_footer_scheme("/plain/p.parquet") is None
    assert _classify_footer_scheme("file:/p.parquet") is None

    got = _classify_footer_scheme("wasbs://c@a/p.parquet")
    assert got is not None and got[0] == "categorical"

    got = _classify_footer_scheme("hdfs://nn:9000/p.parquet")
    assert got is None or got[0] == "environmental"


def test_table_health_environmental_cloud_scheme_prefers_executors(
    spark, tmp_path, monkeypatch
):
    """Environmental failure on a NON-Hadoop-native scheme (the s3
    credentials/region case): the JVM fallback must NOT engage even if
    it could read — serial driver-side parsing of a large cloud listing
    is a perf cliff, and executors may hold what the driver lacks. The
    call warns and stays on the distributed path (r11 review)."""
    import warnings

    import pandas as pd

    from local_pubchem_db_spark.operators import physical

    real = str(tmp_path / "s.parquet")
    pd.DataFrame({"id": [1]}).to_parquet(real)
    monkeypatch.setattr(
        physical,
        "_classify_footer_scheme",
        lambda path: ("environmental", "region/credentials (faked)"),
    )
    calls = []

    class _Recorder:
        _driver_only = True

        def __init__(self, spark):
            pass

        def __call__(self, path):
            calls.append(path)
            return open(real, "rb")

    monkeypatch.setattr(physical, "_JvmOpenFile", _Recorder)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        df = physical.table_health(
            spark,
            "ignored",
            files=[("s3://bkt/t/s.parquet", 123)],
        )
    assert any("proceeding anyway" in str(w.message) for w in caught)
    assert calls == []  # the JVM opener never probed
    # and the plan is the distributed mapInPandas path (executor-side
    # footer reads), not the driver-local pandas relation. The paths
    # relation itself is a LocalTableScan since r15 (driver_rows_df) —
    # what matters is that the FOOTER work sits under MapInPandas.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan


def test_table_health_caps_automatic_driver_parse_fallback(
    spark, tmp_path, monkeypatch
):
    """The AUTOMATIC driver-side JVM footer fallback is serial py4j —
    a silent multi-hour loop on a 100k-file listing (ADVICE r11). Past
    the cap it must refuse with guidance (never start the loop); at or
    under the cap it proceeds as before; an EXPLICITLY passed
    driver-only open_file is never capped."""
    import warnings

    import pandas as pd
    import pytest

    from local_pubchem_db_spark.operators import physical

    real = str(tmp_path / "c.parquet")
    pd.DataFrame({"id": [1, 2]}).to_parquet(real)
    size = __import__("os").path.getsize(real)
    monkeypatch.setattr(
        physical,
        "_classify_footer_scheme",
        lambda path: ("categorical", "Unrecognized filesystem type (faked)"),
    )
    monkeypatch.setattr(physical, "_DRIVER_PARSE_CAP", 3)
    files = [(f"file:{real}", size)] * 4  # past the cap
    with pytest.raises(ValueError, match="too many for"):
        physical.table_health(spark, "ignored", files=files)

    # at the cap: the fallback engages and the warning names the count
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        h = physical.table_health(
            spark, "ignored", files=files[:3]
        ).toPandas()
    assert len(h) == 3
    assert any("3 files" in str(w.message) for w in caught)

    # explicit driver-only opener: caller opted in, never capped
    class _Opener:
        _driver_only = True

        def __call__(self, path):
            return open(real, "rb")

    h = physical.table_health(
        spark, "ignored", files=files, open_file=_Opener()
    ).toPandas()
    assert len(h) == 4

def test_table_health_cap_surfaces_on_environmental_hdfs_failure(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: an over-cap listing on an ENVIRONMENTAL failure of a
    Hadoop-native scheme (libhdfs absent on the driver) must refuse with
    the cap's guidance — previously the cap's ValueError was raised
    inside the try and swallowed by the environmental except, which
    converted the refusal into a misleading 'proceeding anyway'
    credentials warning (and would then have run the distributed path
    against a scheme the executors would also serially mis-handle)."""
    import pandas as pd
    import pytest

    from local_pubchem_db_spark.operators import physical

    real = str(tmp_path / "c.parquet")
    pd.DataFrame({"id": [1, 2]}).to_parquet(real)
    size = __import__("os").path.getsize(real)
    monkeypatch.setattr(
        physical,
        "_classify_footer_scheme",
        lambda path: ("environmental", "libhdfs not found (faked)"),
    )
    monkeypatch.setattr(physical, "_DRIVER_PARSE_CAP", 3)
    files = [(f"hdfs://nn/t/{i}.parquet", size) for i in range(4)]
    with pytest.raises(ValueError, match="too many for"):
        physical.table_health(spark, "ignored", files=files)
