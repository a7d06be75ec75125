"""Randomized equivalence: distributed_rank / distributed_ntile vs the
built-in single-partition window on adversarial value distributions.

Seeded numpy datasets rather than hypothesis: each example costs Spark
jobs, so the budget goes to a few hand-picked hostile shapes (heavy
ties, negatives, all-equal, Zipf skew, fewer rows than buckets) instead
of hundreds of random ones.
"""

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.topk import (
    distributed_ntile,
    distributed_rank,
)


def _check(spark, vals, n_tiles=7, num_buckets=16):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "k long, v double"
    )
    order = [F.col("v").asc(), F.col("k").asc()]
    want = {
        r["k"]: (r["r"], r["t"])
        for r in df.select(
            "k",
            F.row_number().over(Window.orderBy("v", "k")).alias("r"),
            F.ntile(n_tiles).over(Window.orderBy("v", "k")).alias("t"),
        ).collect()
    }
    got_r = {
        r["k"]: r["rank"]
        for r in distributed_rank(df, order, "v", num_buckets=num_buckets).collect()
    }
    got_t = {
        r["k"]: r["tile"]
        for r in distributed_ntile(
            df, n_tiles, order, "v", num_buckets=num_buckets
        ).collect()
    }
    assert got_r == {k: rt[0] for k, rt in want.items()}
    assert got_t == {k: rt[1] for k, rt in want.items()}


def test_distributed_rank_and_ntile_hostile_shapes(spark):
    rng = np.random.default_rng(42)
    cases = [
        rng.integers(0, 5, 400).astype(float),  # heavy ties across buckets
        rng.normal(0, 1000, 513),  # negatives, odd count
        np.zeros(97),  # all equal: every row in one bucket
        rng.zipf(1.5, 300).astype(float),  # skewed magnitudes
        rng.normal(0, 1, 7),  # fewer rows than buckets and tiles
    ]
    for vals in cases:
        _check(spark, vals)
