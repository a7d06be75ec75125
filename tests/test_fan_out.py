"""fan_out: the parallelism rebalancer and its size gate.

The gate went silently dead once already: PySpark 4.x's py4j bridge
returns ``stats().sizeInBytes()`` as a Python int, so the old
``.toString()`` probe raised AttributeError, the fail-open except kicked
in, and every gated call site paid the repartition shuffle regardless of
input size (measured: token_topk 0.17s -> 0.46s at sf0.1). These tests
pin BOTH gate outcomes on real parquet scans so a probe API break fails
loudly instead of degrading to always-shuffle.
"""

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.util import fan_out


def _scan(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def test_stats_probe_returns_real_size(spark, sf_dir):
    """The size estimate must resolve to a positive int on a plain
    parquet scan — if the probe API breaks again, this fails instead of
    silently disabling the gate."""
    df = _scan(spark, sf_dir, "documents")
    raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    size = raw if isinstance(raw, int) else int(raw.toString())
    assert isinstance(size, int) and size > 0


def test_gate_skips_small_input(spark, sf_dir):
    """A tiny scan (sf0.001 documents, ~tens of KB) gated at an
    impossibly-large per-task floor must keep its scan partitioning —
    no repartition node, partition count unchanged."""
    df = _scan(spark, sf_dir, "documents")
    before = df.rdd.getNumPartitions()
    assert before < spark.sparkContext.defaultParallelism  # else moot
    out = fan_out(df, min_bytes_per_task=1 << 30)
    assert out.rdd.getNumPartitions() == before
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_gate_fans_out_large_enough_input(spark, sf_dir):
    """The same scan gated at a 1-byte-per-task floor must rebalance to
    full parallelism."""
    df = _scan(spark, sf_dir, "documents")
    out = fan_out(df, min_bytes_per_task=1)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_ungated_call_fans_out(spark, sf_dir):
    """No gate -> unconditional rebalance (the LSH/shingle contract)."""
    df = _scan(spark, sf_dir, "documents")
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_already_parallel_input_is_untouched(spark):
    """An input at or above cluster parallelism is returned as-is even
    ungated (fan_out never coalesces)."""
    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, n + 4).select(F.col("id"))
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == n + 4


def test_gate_measures_decompressed_bytes_on_compressible_corpus(
    spark, tmp_path
):
    """THE r9 `weak` defect, pinned: a compressible text corpus sits
    under any COMPRESSED-bytes floor long after the decompressed CPU
    work dominates. The r10 gate scales plan stats by the parquet
    footers' uncompressed/compressed ratio, so a snappy-compressed
    corpus of distinct documents must clear a floor its raw file bytes
    alone would not."""
    import pandas as pd

    from local_pubchem_db_spark.operators.util import (
        estimated_decompressed_bytes,
    )

    p = str(tmp_path / "corpus.parquet")
    # distinct strings (no dictionary collapse) built from repeated
    # words: snappy compresses the pages, the byte-ratio is real
    pd.DataFrame(
        {
            "doc_id": range(5_000),
            "text": [
                f"spark shuffle join filter {i} " * 40 for i in range(5_000)
            ],
        }
    ).to_parquet(p)
    df = spark.read.parquet(p)
    compressed = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    compressed = (
        compressed if isinstance(compressed, int) else int(compressed.toString())
    )
    est = estimated_decompressed_bytes(df)
    assert est is not None and est > compressed * 2, (est, compressed)
    target = spark.sparkContext.defaultParallelism
    # a floor between compressed and decompressed: the r9 gate would
    # skip (compressed < floor), the r10 gate fans (decompressed >=)
    floor = (compressed + (est - compressed) // 2) // target
    assert compressed < floor * target <= est
    out = fan_out(df, min_bytes_per_task=floor)
    assert out.rdd.getNumPartitions() == target
    # and a floor even the decompressed estimate cannot clear skips
    out2 = fan_out(df, min_bytes_per_task=est * 2)
    assert (
        out2.rdd.getNumPartitions()
        == df._jdf.queryExecution().toRdd().getNumPartitions()
    )


def test_gate_row_signal_catches_dictionary_collapsed_flood(
    spark, tmp_path
):
    """Parquet dictionary encoding makes a flood of IDENTICAL documents
    report tiny encoded bytes — the byte estimate cannot see the per-row
    CPU cost. The row signal (exact footer num_rows) must fan such a
    corpus even when the byte floor is impossibly high, and a corpus
    with few rows AND few bytes must still skip."""
    import pandas as pd

    from local_pubchem_db_spark.operators.util import estimated_rows

    p = str(tmp_path / "dictflood.parquet")
    pd.DataFrame(
        {
            "doc_id": range(20_000),
            "text": ["spark shuffle join filter " * 100] * 20_000,
        }
    ).to_parquet(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    assert estimated_rows(df) == 20_000
    out = fan_out(
        df, min_bytes_per_task=1 << 40, min_rows_per_task=20_000 // target
    )
    assert out.rdd.getNumPartitions() == target
    # both signals under their floors -> skip
    out2 = fan_out(
        df, min_bytes_per_task=1 << 40, min_rows_per_task=100_000
    )
    assert (
        out2.rdd.getNumPartitions()
        == df._jdf.queryExecution().toRdd().getNumPartitions()
    )


def test_gate_fails_open_without_footers(spark):
    """An in-memory relation has no input files: the estimate falls back
    to plan stats (already row bytes) — and any estimate failure must
    fan out, never skip (the CPU-safe side)."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.operators.util import (
        estimated_decompressed_bytes,
    )

    df = spark.range(0, 1000, 1, 2).select(F.col("id"))
    est = estimated_decompressed_bytes(df)
    assert est is not None and est > 0
    assert (
        fan_out(df, min_bytes_per_task=1).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_gate_result_identical_rows(spark, sf_dir):
    """Gated-skip and fanned plans agree on content (ordering aside)."""
    df = _scan(spark, sf_dir, "documents").select("doc_id")
    a = sorted(r.doc_id for r in fan_out(df, min_bytes_per_task=1 << 30).collect())
    b = sorted(r.doc_id for r in fan_out(df, min_bytes_per_task=1).collect())
    assert a == b


def test_estimated_rows_size_weighted_on_skewed_layout(spark, tmp_path):
    """Skew-sized layouts (r11; ADVICE r10): a uniform first-4-files
    extrapolation under-estimates rows when tiny files are listed first
    — the CPU-UNSAFE direction. The size-weighted estimate samples the
    LARGEST files and scales by total bytes, so 6 tiny + 2 huge files
    must estimate near the true count and the row-gated fan_out must
    fan."""
    import os

    import pandas as pd

    from local_pubchem_db_spark.operators.util import estimated_rows

    d = tmp_path / "skewed"
    d.mkdir()
    # distinct strings: no dictionary collapse, sizes track rows
    for i in range(6):
        pd.DataFrame(
            {"doc_id": range(10), "text": [f"t{i}-{j}" for j in range(10)]}
        ).to_parquet(str(d / f"tiny{i}.parquet"))
    for i in range(2):
        pd.DataFrame(
            {
                "doc_id": range(50_000),
                "text": [f"h{i} word {j}" for j in range(50_000)],
            }
        ).to_parquet(str(d / f"huge{i}.parquet"))
    df = spark.read.parquet(str(d))
    true_rows = 100_060
    est = estimated_rows(df)
    assert est is not None
    # the old uniform first-4 extrapolation could report as low as
    # 10*4*(8/4) = 80; size-weighting must land near the truth
    assert 0.5 * true_rows <= est <= 2 * true_rows, est
    target = spark.sparkContext.defaultParallelism
    out = fan_out(
        df, min_bytes_per_task=1 << 40, min_rows_per_task=true_rows // (2 * target)
    )
    assert out.rdd.getNumPartitions() == target


def test_probe_memo_skips_repeat_footer_reads(spark, sf_dir):
    """High-QPS registries re-probe the identical plan (r11, verdict
    Next #7): the second probe of the same plan in the same session
    must issue ZERO footer reads; releasing the shared caches drops the
    memo and the reads return."""
    from local_pubchem_db_spark.operators.util import (
        _FOOTER_READS,
        broadcast_if_small,
        estimated_decompressed_bytes,
        estimated_rows,
        release_shared_caches,
    )

    release_shared_caches(spark)  # start from a clean memo
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = _FOOTER_READS["n"]
    est1 = estimated_decompressed_bytes(df)
    r1 = estimated_rows(df)
    assert _FOOTER_READS["n"] > before  # first probes actually read
    mid = _FOOTER_READS["n"]
    # same plan, fresh DataFrame object: memo must hit on semanticHash
    df2 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est2 = estimated_decompressed_bytes(df2)
    r2 = estimated_rows(df2)
    broadcast_if_small(df2)  # rides the same memoized estimate
    assert (est2, r2) == (est1, r1)
    assert _FOOTER_READS["n"] == mid  # zero new footer reads
    release_shared_caches(spark)
    estimated_decompressed_bytes(df2)
    assert _FOOTER_READS["n"] > mid  # release drops the memo


def test_probe_memo_never_pins_failed_estimates(spark):
    """A probe returning None ("could not estimate" — possibly a
    TRANSIENT footer failure) must NOT be memoized: the old behavior
    pinned the degraded answer for the whole session, so one flaky
    footer read disabled size estimation until release (ADVICE r11).
    A successful (non-None) result IS memoized."""
    from local_pubchem_db_spark.operators.util import _memo_probe

    df = spark.range(4)
    calls = {"n": 0}
    answers = [None, None, 7]

    def flaky(_d):
        calls["n"] += 1
        return answers[min(calls["n"], len(answers)) - 1]

    assert _memo_probe(df, "t_flaky_probe", flaky) is None
    assert _memo_probe(df, "t_flaky_probe", flaky) is None  # recomputed
    assert _memo_probe(df, "t_flaky_probe", flaky) == 7
    assert calls["n"] == 3
    assert _memo_probe(df, "t_flaky_probe", flaky) == 7  # memo hit now
    assert calls["n"] == 3


def test_estimated_rows_size_weighted_past_stat_cap(
    spark, tmp_path, monkeypatch
):
    """Listings past the stat cap must KEEP the size-weighted
    protection via an evenly-spread statted subset, not silently revert
    to the uniform first-4 sample (ADVICE r11). Pinned by shrinking the
    module caps: 10 files (8 tiny + 2 huge) with a cap of 4 force the
    subset branch; a spread covering the listing keeps the pin
    deterministic (inputFiles order is arbitrary, so a partial spread
    could miss the huge files by luck — at the real 512-path spread
    over 4096+ files that is the accepted sampling risk, documented in
    the operator). Size-weighting within the subset must land near the
    truth where a uniform 4-path sample dominated by tiny files
    reports ~10x low."""
    import pandas as pd

    from local_pubchem_db_spark.operators import util

    d = tmp_path / "capped"
    d.mkdir()
    for i in range(8):
        pd.DataFrame(
            {"doc_id": range(10), "text": [f"t{i}-{j}" for j in range(10)]}
        ).to_parquet(str(d / f"a_tiny{i}.parquet"))
    for i in range(2):
        pd.DataFrame(
            {
                "doc_id": range(40_000),
                "text": [f"h{i} word {j}" for j in range(40_000)],
            }
        ).to_parquet(str(d / f"z_huge{i}.parquet"))
    monkeypatch.setattr(util, "_STAT_CAP", 4)
    monkeypatch.setattr(util, "_STAT_SPREAD", 10)
    df = spark.read.parquet(str(d))
    true_rows = 80_080
    est = util.estimated_rows(df)
    assert est is not None
    assert 0.4 * true_rows <= est <= 2.5 * true_rows, est


def test_driver_rows_df_local_table_scan_and_fidelity(spark):
    """r15 (found profiling the crash sweeps): driver-literal rows must
    materialize as a JVM LocalTableScan — spark.createDataFrame(list)
    parallelizes through a defaultParallelism-sliced Python RDD, and a
    downstream coalesce(1) single task then replays ~32 SEQUENTIAL
    Python worker rounds (measured 3.5-4.5 s per one-row metadata
    saveAsTable vs 0.3 s through the helper). Exact value fidelity
    incl. the types the metadata writers use: None in long/boolean,
    Decimal (the stats row's exact sum_dl), array<double> (the model
    table's vectors)."""
    from decimal import Decimal

    from local_pubchem_db_spark.operators.util import driver_rows_df

    schema = (
        "a long, b boolean, c string, d double, "
        "e decimal(38,0), f array<double>"
    )
    rows = [
        (None, True, None, 1.5,
         Decimal("123456789012345678901234567890"), [1.0, 2.5]),
        (7, None, "x", None, None, None),
    ]
    df = driver_rows_df(spark, rows, schema)
    assert [tuple(r) for r in df.collect()] == rows
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    assert "ExistingRDD" not in plan, plan
    # coalesce(1) of the helper's output stays Python-free
    cplan = df.coalesce(1)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in cplan and "PythonRDD" not in cplan

    # empty rows keep the declared schema
    empty = driver_rows_df(spark, [], schema)
    assert empty.count() == 0 and empty.schema == df.schema

    # fallback: a StructType schema works the same way
    struct_df = driver_rows_df(spark, rows, df.schema)
    assert [tuple(r) for r in struct_df.collect()] == rows


def test_driver_rows_df_one_shot_iterable_survives_fallback(
    spark, monkeypatch
):
    """r15 review finding: the parameter accepts any iterable, so a
    one-shot generator consumed by the fast path must NOT hand the
    fallback an exhausted iterator — createDataFrame([]) would build an
    empty frame with the declared schema and a staged metadata write
    would commit an empty table with no error. The rows are
    materialized once, up front, and both paths read the list."""
    import pandas as pd

    from local_pubchem_db_spark.operators import util

    rows = [(1, "a"), (2, "b")]
    schema = "a long, b string"

    # fast path consumes a generator exactly once
    df = util.driver_rows_df(spark, (r for r in rows), schema)
    assert [tuple(r) for r in df.collect()] == rows

    # force the fast path to fail AFTER the rows were iterated: the
    # fallback must still see every row. The stand-in must remain a
    # TYPE — pyspark's own createDataFrame does isinstance(data,
    # pd.DataFrame) on the fallback path.
    class Boom(pd.DataFrame):
        def __init__(self, *a, **kw):
            raise RuntimeError("injected pandas refusal")

    monkeypatch.setattr(pd, "DataFrame", Boom)
    df = util.driver_rows_df(spark, (r for r in rows), schema)
    assert [tuple(r) for r in df.collect()] == rows
