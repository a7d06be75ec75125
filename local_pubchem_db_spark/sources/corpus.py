"""Raw-corpus sources: readers that normalize JSONL, CSV, and
directory-of-text-files input into the canonical documents shape
``(doc_id long, text string, source string)`` the dedup / quality /
chunking operators consume.

The reference ingests exactly one bespoke format (SDF,
reference utils.py:245-269); a training-data pipeline meets corpora in
whatever shape they were crawled. Spark-first mechanics:

- JSONL / CSV go through ``spark.read.json`` / ``spark.read.csv`` with an
  EXPLICIT schema — schema inference would scan the data twice, and at
  100 TB the second scan is the difference between one pass and two.
- Plain files split at 128 MB boundaries (``maxPartitionBytes``); .gz
  shards parallelize per-file (gzip is not splittable) — same calculus as
  the SDF reader, thousands of shards keep every executor busy.
- ``doc_id`` derivation when the corpus carries no id:
  ``xxhash64(text)`` — deterministic across runs and engines, and two
  byte-identical documents SHARING an id is the right semantic for a
  dedup pipeline (they are the same document; exact dedup would collapse
  them first anyway). Callers that need positional ids can zip one on
  afterwards.
- one-doc-per-file corpora read with ``wholetext`` and id from the file
  path — stable under re-listing, independent of partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def _normalize(
    df: DataFrame, text_col: str, id_col: str | None, source: str
) -> DataFrame:
    text = F.col(text_col).cast("string")
    if id_col is None:
        doc_id = F.xxhash64(text)
    else:
        # Numeric ids keep their value (stable across engines) — but only
        # when the string form ROUND-TRIPS ('007', '+7', ' 7' do not:
        # keeping 7 for them would silently merge distinct keys, the
        # exact bug class this branch exists to eliminate). Anything
        # non-round-tripping (UUIDs, URL slugs, zero-padded keys) hashes
        # deterministically with xxhash64 instead of cast→NULL merging
        # every such row under one null id. A null input id raises — an
        # id column the caller named must actually identify rows.
        raw = F.col(id_col).cast("string")
        as_long = raw.try_cast("long")
        exact = as_long.isNotNull() & (as_long.cast("string") == raw)
        doc_id = F.when(
            raw.isNotNull(),
            F.when(exact, as_long).otherwise(F.xxhash64(raw)),
        ).otherwise(
            F.raise_error(
                F.lit(f"corpus source: null id in column '{id_col}'")
            ).cast("long")
        )
    return df.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        F.lit(source).alias("source"),
    ).filter(F.col("text").isNotNull())


def read_jsonl_corpus(
    spark: SparkSession,
    path: str | list[str],
    text_field: str = "text",
    id_field: str | None = None,
    source: str = "jsonl",
) -> DataFrame:
    """JSON-lines corpus (optionally .gz) → documents shape.

    Only ``text_field`` (and ``id_field`` if given) are declared in the
    read schema, so the scan never materializes unrequested keys —
    column pruning for semi-structured input.
    """
    fields = [StructField(text_field, StringType())]
    if id_field:
        fields.append(StructField(id_field, StringType()))
    df = spark.read.schema(StructType(fields)).json(path)
    return _normalize(df, text_field, id_field, source)


def read_csv_corpus(
    spark: SparkSession,
    path: str | list[str],
    text_field: str = "text",
    id_field: str | None = None,
    header: bool = True,
    source: str = "csv",
) -> DataFrame:
    """CSV corpus (optionally .gz) → documents shape. The full header
    schema is read as strings (CSV positions require naming every
    column), then pruned to the requested fields by the projection."""
    df = spark.read.option("header", str(header).lower()).csv(path)
    return _normalize(df, text_field, id_field, source)


def read_text_dir_corpus(
    spark: SparkSession,
    path: str | list[str],
    source: str = "textdir",
) -> DataFrame:
    """One document per file (e.g. extracted articles): ``wholetext``
    read, ``doc_id = xxhash64(file path)`` — stable under re-listing and
    partition-layout changes. Parallelism is per-file; suits corpora of
    many small-to-medium files (a 10 GB single file would serialize —
    shard it upstream)."""
    df = spark.read.text(path, wholetext=True)
    return df.select(
        F.xxhash64(F.input_file_name()).alias("doc_id"),
        F.col("value").alias("text"),
        F.lit(source).alias("source"),
    ).filter(F.length("text") > 0)


def read_orc_corpus(
    spark: SparkSession,
    path: str | list[str],
    text_field: str = "text",
    id_field: str | None = None,
    source: str = "orc",
) -> DataFrame:
    """ORC corpus → documents shape. ORC is columnar with embedded
    stats (like parquet), so the ``select`` prunes to the requested
    fields at the stripe reader — no schema declaration needed and no
    full-row materialization. Same id contract as the other readers
    (``_normalize``: round-tripping numeric ids keep their value,
    everything else hashes, nulls raise)."""
    cols = [text_field] + ([id_field] if id_field else [])
    df = spark.read.orc(path).select(*cols)
    return _normalize(df, text_field, id_field, source)
