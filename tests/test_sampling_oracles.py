"""DuckDB cross-checks for the md5-threshold sampling operators.

``sample_per_key`` and ``mix_domains`` share ``hash_split``'s
engine-portable contract — membership is md5 string math over the id —
so an external engine must reproduce the EXACT row sets, not just the
counts. These tests run the same math in DuckDB SQL and compare with
the driver-faithful comparator (row count + dtype kinds + exact
values), mirroring the ``sample_splits`` correctness row.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.sampling import mix_domains, sample_per_key
from tools.oracle_check import compare

SAMPLE_PER_KEY_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(concat('sample:', CAST(doc_id AS VARCHAR))), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 5
"""

# Weights/cap chosen so every rate is exact in binary floating point
# (wsum=4 → norms .25/.25/.5; equal counts → rates .75/.75/1.5), making
# the Spark-literal and SQL-computed thresholds bit-identical.
MIX_DOMAINS_SQL = """
WITH w(domain, wt) AS (VALUES ('src0', 1.0), ('src1', 1.0), ('src2', 2.0)),
counts AS (
  SELECT d.source, COUNT(*)::DOUBLE AS n, ANY_VALUE(w.wt) AS wt
  FROM documents d JOIN w ON d.source = w.domain GROUP BY d.source
),
norm AS (SELECT source, n, wt / (SELECT SUM(wt) FROM w) AS wn FROM counts),
tot AS (SELECT 1.5 * MIN(n / wn) AS t FROM norm),
rates AS (SELECT source, (wn * (SELECT t FROM tot)) / n AS rate FROM norm),
expl AS (
  -- fixed 0..16 epoch series filtered to <= whole: duckdb's
  -- generate_series table function cannot take lateral column args
  SELECT d.doc_id, d.source, r.rate,
         CAST(floor(r.rate) AS INTEGER) AS whole, gs.epoch
  FROM documents d
  JOIN rates r ON d.source = r.source
  CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS epoch) gs
  WHERE gs.epoch <= CAST(floor(r.rate) AS INTEGER)
)
SELECT doc_id, source, epoch FROM expl
WHERE epoch < whole
   OR substr(md5(concat('0:', CAST(epoch AS VARCHAR), ':',
                        CAST(doc_id AS VARCHAR))), 1, 4)
      < printf('%04x',
               LEAST(CAST(floor((rate - whole) * 65536) AS INTEGER), 65535))
"""


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    yield con
    con.close()


def test_sample_per_key_matches_duckdb(spark, sf_dir, con):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    want = con.execute(SAMPLE_PER_KEY_SQL).df()
    got = sample_per_key(docs, "source", "doc_id", 5).toPandas()
    assert compare("sample_per_key", got, want) == []
    # The salted pre-prune is a pure physical optimization: disabling it
    # must give the identical row set.
    unsalted = sample_per_key(
        docs, "source", "doc_id", 5, salt_buckets=None
    ).toPandas()
    assert compare("sample_per_key_unsalted", unsalted, want) == []


def test_mix_domains_matches_duckdb(spark, sf_dir, con):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        mix_domains(
            docs,
            "source",
            "doc_id",
            {"src0": 1.0, "src1": 1.0, "src2": 2.0},
            epochs_cap=1.5,
        )
        .select("doc_id", "source", "epoch")
        .toPandas()
    )
    want = con.execute(MIX_DOMAINS_SQL).df()
    assert len(want) > 0
    assert compare("mix_domains", got, want) == []


def test_sample_per_key_salted_handles_hot_key(spark):
    """A pathologically hot key (the giant crawl domain): the salted
    two-phase form returns exactly the unsalted result, and its first
    window partitions on (key, salt) so no single task sorts the hot
    key's full row set."""
    df = spark.range(5000).select(
        F.when(F.col("id") < 4500, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7).cast("string")))
        .alias("domain"),
        F.col("id").alias("doc_id"),
    )
    salted = sample_per_key(df, "domain", "doc_id", 10, salt_buckets=16)
    unsalted = sample_per_key(df, "domain", "doc_id", 10, salt_buckets=None)
    a = sorted((r["domain"], r["doc_id"]) for r in salted.collect())
    b = sorted((r["domain"], r["doc_id"]) for r in unsalted.collect())
    assert a == b
    sizes = {r["domain"]: r["n"] for r in salted.groupBy("domain")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes["hot"] == 10

    plan = salted._jdf.queryExecution().executedPlan().toString()
    # two windows: the salted pre-prune then the per-key final top-k
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2, plan
    assert "pmod" in plan or "xxhash64" in plan, plan
