"""DuckDB cross-engine oracle for DSIR — the whole operator contract is
md5 string math, so a second engine must reproduce the per-document
log-weights and the exact selected id set, not just shapes. (The
pure-Python oracle in test_dsir.py pins the math; this pins the
ENGINE-PORTABILITY claim the module docstring makes.)"""

import duckdb
import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.resampling import (
    dsir_logweights,
    dsir_select,
)
B = 512
SEED = "dsx"

# Tokenization mirrors functions/text.py:normalize_text + tokens; the
# 'g' flags matter (Spark regexp_replace is global by default).
_FEATS = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(
           string_split(
             trim(regexp_replace(regexp_replace(lower(text),
                  '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM {{tbl}}
),
grams AS (
  SELECT doc_id,
         list_concat(
           toks,
           list_filter(
             list_transform(list_zip(toks, toks[2:]),
               z -> CASE WHEN z[2] IS NULL THEN NULL
                         ELSE z[1] || ' ' || z[2] END),
             g -> g IS NOT NULL)) AS gs
  FROM base
)
SELECT doc_id,
       ('0x' || substr(md5('{SEED}:' || g), 1, 8))::BIGINT % {B} AS bucket
FROM grams, unnest(gs) AS t(g)
"""

WEIGHTS_SQL = f"""
WITH feats AS ({_FEATS.format(tbl="documents")}),
tgt_feats AS ({_FEATS.format(tbl="(SELECT * FROM documents WHERE doc_id % 20 = 0)")}),
raw_dist AS (SELECT bucket, COUNT(*) AS n_raw FROM feats GROUP BY bucket),
tgt_dist AS (SELECT bucket, COUNT(*) AS n_tgt FROM tgt_feats GROUP BY bucket),
tot AS (SELECT (SELECT SUM(n_raw) FROM raw_dist)::DOUBLE AS traw,
               (SELECT SUM(n_tgt) FROM tgt_dist)::DOUBLE AS ttgt),
scored AS (
  SELECT f.doc_id,
         ln((COALESCE(t.n_tgt, 0) + 1) / ((SELECT ttgt FROM tot) + {B}))
       - ln((COALESCE(r.n_raw, 0) + 1) / ((SELECT traw FROM tot) + {B})) AS lw
  FROM feats f
  LEFT JOIN tgt_dist t USING (bucket)
  LEFT JOIN raw_dist r USING (bucket)
)
SELECT doc_id, COUNT(*) AS n_feats, SUM(lw) AS logweight
FROM scored GROUP BY doc_id
"""

SELECT_SQL = f"""
WITH weights AS ({WEIGHTS_SQL})
SELECT doc_id
FROM weights
ORDER BY logweight
        + -ln(-ln(((('0x' || substr(md5('gumbel:{SEED}:' ||
                 CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)::DOUBLE + 0.5)
              / 4294967296.0)) DESC,
        doc_id
LIMIT 50
"""


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return docs, docs.filter(F.col("doc_id") % 20 == 0)


def test_logweights_match_duckdb(spark, con, frames):
    """Weights agree to 1e-12 relative — summation ORDER differs across
    engines so bit-exact doubles are off the table (measured deltas
    ~1e-14); feature counts and the id set are exact. The downstream
    SELECTION is engine-exact anyway (next test): 1e-14 weight noise
    cannot flip an argmax-k whose score gaps are O(1)."""
    import numpy as np

    raw, tgt = frames
    got = (
        dsir_logweights(raw, tgt, n_buckets=B, seed=SEED)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = con.execute(WEIGHTS_SQL).df().sort_values("doc_id", ignore_index=True)
    assert len(want) > 100
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_feats"].tolist() == want["n_feats"].tolist()
    assert np.allclose(got["logweight"], want["logweight"], rtol=1e-12, atol=0)


def test_selection_matches_duckdb(spark, con, frames):
    raw, tgt = frames
    got = dsir_select(raw, tgt, k=50, n_buckets=B, seed=SEED)
    got_ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    want_ids = sorted(r[0] for r in con.execute(SELECT_SQL).fetchall())
    assert len(want_ids) == 50
    assert got_ids == want_ids
