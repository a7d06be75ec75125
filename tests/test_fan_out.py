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


def test_gate_result_identical_rows(spark, sf_dir):
    """Gated-skip and fanned plans agree on content (ordering aside)."""
    df = _scan(spark, sf_dir, "documents").select("doc_id")
    a = sorted(r.doc_id for r in fan_out(df, min_bytes_per_task=1 << 30).collect())
    b = sorted(r.doc_id for r in fan_out(df, min_bytes_per_task=1).collect())
    assert a == b
