"""Continuous near-dup-free corpus ingest: the streaming face of the
incremental MinHash dedup operator.

A training-data pipeline rarely dedups once — documents keep arriving,
and each batch must be checked against EVERYTHING already accepted
without rescanning it. This composes the batch pieces
(operators/dedup.py: ``lsh_bucket_index`` / ``incremental_minhash_new_ids``)
under a checkpointed stream:

per micro-batch:
  1. join the batch's LSH buckets against the PERSISTED index parquet
     (history is never re-shingled — only its (id, band, bucket) rows are
     read),
  2. keep batch rows that collide with nothing in history nor with an
     earlier (lower-id) batch row,
  3. append the kept rows to the corpus AND their bucket rows to the
     index, both into ``ingest_batch=<id>`` partitions with dynamic
     partition overwrite — the same idempotent-replay contract as
     streaming/ingest.py, so a checkpoint-replayed batch rewrites its own
     partitions instead of duplicating.

State grows as O(accepted docs × bands) index rows — tiny per document,
partition-pruned on (band, bucket) at join time when the index is
bucketed — while the stream itself stays stateless (no Spark state
store; the index parquet IS the state, inspectable and rebuildable).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from local_pubchem_db_spark.operators.dedup import (
    incremental_minhash_new_ids,
    lsh_bucket_index,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

_INDEX_SCHEMA = "id long, band int, bucket long"


def stream_dedup_ingest(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    available_now: bool = True,
):
    """Start the checkpointed dedup-ingest stream over parquet document
    shards arriving in ``docs_dir``. Returns the StreamingQuery.

    Output layout under ``out_dir``: ``corpus/`` (accepted rows),
    ``lsh_index/`` ((id, band, bucket) rows of every accepted row),
    ``_checkpoint/``.
    """
    corpus_path = os.path.join(out_dir, "corpus")
    index_path = os.path.join(out_dir, "lsh_index")
    checkpoint = os.path.join(out_dir, "_checkpoint")
    os.makedirs(out_dir, exist_ok=True)

    stream = spark.readStream.schema(DOC_SCHEMA).parquet(docs_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(index_path):
            # Exclude THIS batch's own partition from history: on a
            # checkpoint replay the crashed attempt's index rows are
            # already on disk, and reading them back would make every
            # batch row collide with itself — the replay would then
            # overwrite the corpus partition with an empty keep-set
            # (silent data loss) instead of reproducing it.
            # Explicit schema: an all-short first batch legitimately
            # writes ZERO index rows, leaving a dir with no part-files —
            # schema inference would crash the next batch's read.
            history_index = (
                spark.read.schema(_INDEX_SCHEMA + ", ingest_batch long")
                .parquet(index_path)
                .filter(F.col("ingest_batch") != batch_id)
                .select("id", "band", "bucket")
            )
        else:
            history_index = spark.createDataFrame([], _INDEX_SCHEMA)
        new_ids = incremental_minhash_new_ids(
            batch_df, history_index, id_col, text_col, threshold=threshold
        )
        kept = batch_df.join(new_ids, id_col, "left_semi").localCheckpoint()
        (
            kept.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(corpus_path)
        )
        (
            lsh_bucket_index(kept, id_col, text_col)
            .withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(index_path)
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accepted (near-dup-free) corpus; drops sink bookkeeping."""
    df = spark.read.parquet(os.path.join(out_dir, "corpus"))
    return df.drop("ingest_batch") if "ingest_batch" in df.columns else df
