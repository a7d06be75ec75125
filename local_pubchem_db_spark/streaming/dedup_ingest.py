"""Continuous near-dup-free corpus ingest: the streaming face of the
incremental MinHash dedup operator.

A training-data pipeline rarely dedups once — documents keep arriving,
and each batch must be checked against EVERYTHING already accepted
without rescanning it. This composes the batch pieces
(operators/dedup.py: ``lsh_bucket_index`` / ``incremental_minhash_new_ids``)
under a checkpointed stream:

per micro-batch:
  1. join the batch's LSH buckets against the PERSISTED two-tier index,
     (history is never re-shingled — only its (id, band, bucket) rows are
     read),
  2. keep batch rows that collide with nothing in history nor with an
     earlier (lower-id) batch row,
  3. append the kept rows to the corpus AND their bucket rows to the
     index delta, both into ``ingest_batch=<id>`` partitions with dynamic
     partition overwrite — the same idempotent-replay contract as
     streaming/ingest.py, so a checkpoint-replayed batch rewrites its own
     partitions instead of duplicating.

The index is TWO-TIER (the LSM shape):

- ``lsh_index/`` — the delta: per-batch ``ingest_batch=N`` partitions,
  appended by the stream, replay-idempotent.
- ``lsh_index_compacted/v{V}/`` — a (band, bucket)-bucketed TABLE holding
  every batch folded so far (``ingest_batch`` retained as a plain
  column). The batch-vs-history semi-join against this tier is
  exchange-free on the history side: only the micro-batch's buckets
  shuffle, never the accumulated history — the growing-cost path a
  delta-only layout pays on every batch at 100 TB.

``compact_dedup_index`` folds the delta into the next compacted version
when the delta outgrows ``max(threshold_rows, compacted_rows)`` —
geometric triggering, so total fold work is O(N log N) over the corpus
lifetime. The fold is crash-safe without a WAL: the new version is
written beside the old one, a tiny meta json flips atomically
(``os.replace``), and only then are the folded delta partitions evicted.
A crash at ANY point leaves the previous meta pointing at a complete
version; rows transiently present in both tiers are invisible because
history reads filter the delta to ``ingest_batch > through_batch``.

State grows as O(accepted docs × bands) index rows — tiny per document —
while the stream itself stays stateless (no Spark state store; the index
parquet IS the state, inspectable and rebuildable).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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
_META_NAME = "_compacted_meta.json"
_N_BUCKETS = 8


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, _META_NAME)


def _read_meta(out_dir: str) -> dict | None:
    try:
        with open(_meta_path(out_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_meta(out_dir: str, meta: dict) -> None:
    # Atomic flip: the meta is the commit point of a fold. os.replace is
    # atomic on POSIX; on HDFS/S3 deployments the same role is played by
    # a rename of a _SUCCESS-style marker.
    tmp = _meta_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(out_dir))


def _table_name(out_dir: str, version: int) -> str:
    h = hashlib.md5(os.path.abspath(out_dir).encode()).hexdigest()[:10]
    return f"lsh_stream_idx_{h}_v{version}"


def _compacted_frame(
    spark: SparkSession, out_dir: str, meta: dict
) -> DataFrame:
    """The compacted tier as a bucketed-table scan, re-registering the
    table in the catalog when this driver didn't create it (fresh process
    resuming an existing out_dir)."""
    tbl = meta["table"]
    if not spark.catalog.tableExists(tbl):
        vdir = os.path.join(
            out_dir, "lsh_index_compacted", f"v{meta['version']}"
        )
        spark.sql(
            f"CREATE TABLE {tbl} (id BIGINT, band INT, bucket BIGINT, "
            f"ingest_batch BIGINT) USING parquet "
            f"CLUSTERED BY (band, bucket) SORTED BY (band, bucket) "
            f"INTO {_N_BUCKETS} BUCKETS LOCATION '{vdir}'"
        )
    return spark.table(tbl)


def _delta_frame(spark: SparkSession, index_path: str) -> DataFrame | None:
    if not os.path.exists(index_path):
        return None
    # Explicit schema: an all-short first batch legitimately writes ZERO
    # index rows, leaving a dir with no part-files — schema inference
    # would crash the read.
    return spark.read.schema(_INDEX_SCHEMA + ", ingest_batch long").parquet(
        index_path
    )


def history_index_frames(
    spark: SparkSession, out_dir: str, exclude_batch: int | None = None
) -> list[DataFrame]:
    """The live history index as a list of frames for
    ``incremental_minhash_new_ids``: the bucketed compacted tier (joined
    exchange-free on its side) plus the un-folded delta partitions.

    ``exclude_batch`` drops that batch's own rows from BOTH tiers — the
    checkpoint-replay guard: a crashed attempt's index rows are already
    on disk, and reading them back would make every batch row collide
    with itself (the replay would then overwrite the corpus partition
    with an empty keep-set — silent data loss).
    """
    meta = _read_meta(out_dir)
    through = meta["through_batch"] if meta else -1
    frames: list[DataFrame] = []
    if meta:
        comp = _compacted_frame(spark, out_dir, meta)
        if exclude_batch is not None:
            comp = comp.filter(F.col("ingest_batch") != exclude_batch)
        frames.append(comp.select("id", "band", "bucket"))
    index_path = os.path.join(out_dir, "lsh_index")
    delta = _delta_frame(spark, index_path)
    if delta is not None and _live_delta_batches(index_path, through):
        # Partitions <= through_batch are already in the compacted tier
        # (or are a crash-healed replay's re-write of one): excluding
        # them keeps transiently-double-stored rows invisible. When NO
        # live partition exists (steady state right after a fold) the
        # delta frame is omitted entirely, so the only history join is
        # the exchange-free bucketed probe.
        delta = delta.filter(F.col("ingest_batch") > through)
        if exclude_batch is not None:
            delta = delta.filter(F.col("ingest_batch") != exclude_batch)
        frames.append(delta.select("id", "band", "bucket"))
    return frames


def _live_delta_batches(index_path: str, through_batch: int) -> list[int]:
    """Delta partition ids not yet folded — a directory listing, no scan."""
    out = []
    for d in os.listdir(index_path) if os.path.isdir(index_path) else []:
        if d.startswith("ingest_batch="):
            try:
                b = int(d.split("=", 1)[1])
            except ValueError:
                continue
            if b > through_batch:
                out.append(b)
    return sorted(out)


def compact_dedup_index(
    spark: SparkSession,
    out_dir: str,
    threshold_rows: int = 1_000_000,
    force: bool = False,
) -> bool:
    """Fold un-folded delta partitions into the next compacted version.
    Returns True when a fold happened.

    Trigger (unless ``force``): delta rows >= max(threshold_rows,
    compacted rows) — geometric, so each accepted row is rewritten
    O(log N) times over the corpus lifetime, and between folds the
    per-batch join cost is bounded by the (small) delta plus an
    exchange-free probe of the compacted tier."""
    index_path = os.path.join(out_dir, "lsh_index")
    meta = _read_meta(out_dir)
    through = meta["through_batch"] if meta else -1
    compacted_rows = meta["rows"] if meta else 0
    delta = _delta_frame(spark, index_path)
    if delta is None:
        return False
    live = delta.filter(F.col("ingest_batch") > through)
    stats = live.agg(
        F.count(F.lit(1)).alias("n"), F.max("ingest_batch").alias("mx")
    ).first()
    n_live = stats["n"]
    if n_live == 0:
        return False
    if not force and n_live < max(threshold_rows, compacted_rows):
        return False

    version = (meta["version"] + 1) if meta else 1
    tbl = _table_name(out_dir, version)
    vdir = os.path.join(out_dir, "lsh_index_compacted", f"v{version}")
    folded = live
    if meta:
        folded = _compacted_frame(spark, out_dir, meta).unionByName(live)
    if spark.catalog.tableExists(tbl):  # crashed previous attempt
        spark.sql(f"DROP TABLE {tbl}")
    (
        folded.write.bucketBy(_N_BUCKETS, "band", "bucket")
        .sortBy("band", "bucket")
        .option("path", vdir)
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    _write_meta(
        out_dir,
        {
            "version": version,
            "table": tbl,
            "through_batch": int(stats["mx"]),
            "rows": int(compacted_rows + n_live),
        },
    )
    # Post-commit cleanup: the old version and the folded delta
    # partitions are now unreachable (meta flipped; history reads filter
    # delta to > through_batch). A crash here leaves garbage, not
    # corruption — the next fold or eviction pass removes it.
    if meta and spark.catalog.tableExists(meta["table"]):
        spark.sql(f"DROP TABLE {meta['table']}")
        old_dir = os.path.join(
            out_dir, "lsh_index_compacted", f"v{meta['version']}"
        )
        shutil.rmtree(old_dir, ignore_errors=True)
    _evict_folded_delta(index_path, int(stats["mx"]))
    return True


def _evict_folded_delta(index_path: str, through_batch: int) -> None:
    if not os.path.isdir(index_path):
        return
    for d in os.listdir(index_path):
        if not d.startswith("ingest_batch="):
            continue
        try:
            b = int(d.split("=", 1)[1])
        except ValueError:
            continue
        if b <= through_batch:
            shutil.rmtree(os.path.join(index_path, d), ignore_errors=True)


def stream_dedup_ingest(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    available_now: bool = True,
    compact_threshold_rows: int = 1_000_000,
    max_files_per_trigger: int | None = None,
    quality_col: str | None = None,
):
    """Start the checkpointed dedup-ingest stream over parquet document
    shards arriving in ``docs_dir``. Returns the StreamingQuery.

    Output layout under ``out_dir``: ``corpus/`` (accepted rows),
    ``lsh_index/`` (delta (id, band, bucket) rows), ``lsh_index_compacted/``
    + ``_compacted_meta.json`` (the bucketed folded tier), ``_checkpoint/``.

    ``max_files_per_trigger`` bounds each micro-batch to that many input
    files (availableNow still drains everything, in multiple batches) —
    the continuous-arrival shape where the two-tier index earns its keep:
    each batch semi-joins the bucketed compacted tier exchange-free plus
    only the small un-folded delta.

    Session contract: each micro-batch ends with
    ``release_shared_caches`` (the dedup operators' persisted scratch —
    including the batch text — would otherwise accumulate for the
    stream's lifetime), so run the ingest in its OWN SparkSession if
    other workloads in the session rely on long-lived ``.persist()``
    caches.

    ``quality_col`` (a double column expected on the incoming shards,
    read alongside id/text and persisted with the corpus): WITHIN a
    micro-batch, each near-dup component keeps its best-quality member
    instead of first-arrival — the ``dedup_keep_ids(quality_col=…)``
    semantics lifted into the stream. Collisions against persisted
    HISTORY remain drop-only: accepted rows are never rewritten, so a
    better copy arriving a batch late still loses (document the cadence:
    batch boundaries, not arrival jitter, decide who competes).
    """
    corpus_path = os.path.join(out_dir, "corpus")
    index_path = os.path.join(out_dir, "lsh_index")
    checkpoint = os.path.join(out_dir, "_checkpoint")
    os.makedirs(out_dir, exist_ok=True)

    schema = DOC_SCHEMA
    if quality_col is not None:
        schema = StructType(
            DOC_SCHEMA.fields + [StructField(quality_col, DoubleType())]
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        history = history_index_frames(spark, out_dir, exclude_batch=batch_id)
        new_ids = incremental_minhash_new_ids(
            batch_df, history, id_col, text_col, threshold=threshold,
            quality_col=quality_col,
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
        spark.catalog.refreshByPath(index_path)
        compact_dedup_index(
            spark, out_dir, threshold_rows=compact_threshold_rows
        )
        # The dedup operators persist() scratch relations (shingle sets,
        # exact-group structure — the latter includes the batch TEXT).
        # Their contract says long-lived callers release between
        # invocations; a continuous stream IS that caller, and without
        # this the storage tier grows by ~2 cached relations per
        # micro-batch for the stream's lifetime. Session-wide clear:
        # this job owns its SparkSession (the corpus rows were
        # localCheckpoint'ed above, so nothing this batch still needs
        # lives in the cache).
        from local_pubchem_db_spark.operators.util import (
            release_shared_caches,
        )

        release_shared_caches(spark)

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
