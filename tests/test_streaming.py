"""Streaming surface tests: checkpointed ingest exactly-once, stream/batch
equivalence for event-time operators, custom stateful operator."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.pipeline import PubChemDB
from local_pubchem_db_spark.streaming import (
    hourly_event_counts,
    read_event_stream,
    session_windows,
    stateful_user_counts,
    stream_build_db,
)
from local_pubchem_db_spark.streaming.events import EVENT_SCHEMA

SPECS = {
    "columns": {
        "cid": {
            "SD_TAG": ["PUBCHEM_COMPOUND_CID"],
            "DTYPE": "integer",
            "PRIMARY_KEY": True,
        },
        "InChIKey": {
            "SD_TAG": ["PUBCHEM_IUPAC_INCHIKEY"],
            "DTYPE": "varchar",
            "NOT_NULL": True,
        },
    }
}


@pytest.fixture()
def stream_base(tmp_path, sdf_dir):
    base = tmp_path / "base"
    (base / "sdf").mkdir(parents=True)
    for fn in os.listdir(sdf_dir):
        if fn.endswith(".gz"):
            shutil.copy(os.path.join(sdf_dir, fn), base / "sdf" / fn)
    return str(base)


def test_stream_build_exactly_once(spark, stream_base):
    q = stream_build_db(stream_base, use_gzip=True, db_specs=SPECS, spark=spark)
    q.awaitTermination()
    db = PubChemDB(spark, stream_base)
    assert db.compounds().count() == 8
    cids = sorted(r["cid"] for r in db.compounds().select("cid").collect())
    assert cids == [31038, 31039, 31040, 34516, 34517, 34518, 46773, 46774]
    manifest = {r["filename"]: r["n_compounds"] for r in db.sdf_file().collect()}
    assert len(manifest) == 3 and sum(manifest.values()) == 8

    # Restart with no new files: the checkpoint must prevent re-ingestion.
    q2 = stream_build_db(stream_base, use_gzip=True, db_specs=SPECS, spark=spark)
    q2.awaitTermination()
    assert db.compounds().count() == 8
    assert db.sdf_file().count() == 3


def test_stream_build_replayed_batch_is_idempotent(spark, stream_base):
    # foreachBatch is at-least-once: a crash after the sink writes but
    # before the checkpoint commit replays the batch on restart. Simulate
    # exactly that by deleting the commit marker — the replayed batch must
    # overwrite its own ingest_batch partition, not append duplicates.
    q = stream_build_db(stream_base, use_gzip=True, db_specs=SPECS, spark=spark)
    q.awaitTermination()
    db = PubChemDB(spark, stream_base)
    assert db.compounds().count() == 8

    commits = os.path.join(stream_base, "db", "_checkpoint_sdf_ingest", "commits")
    os.remove(os.path.join(commits, "0"))
    crc = os.path.join(commits, ".0.crc")  # ChecksumFs sidecar
    if os.path.exists(crc):
        os.remove(crc)
    q2 = stream_build_db(stream_base, use_gzip=True, db_specs=SPECS, spark=spark)
    q2.awaitTermination()
    assert db.compounds().count() == 8
    cids = sorted(r["cid"] for r in db.compounds().select("cid").collect())
    assert cids == [31038, 31039, 31040, 34516, 34517, 34518, 46773, 46774]
    assert db.sdf_file().count() == 3


def test_stream_build_incremental_new_file(spark, stream_base, sdf_dir):
    q = stream_build_db(stream_base, use_gzip=True, db_specs=SPECS, spark=spark)
    q.awaitTermination()
    db = PubChemDB(spark, stream_base)
    assert db.compounds().count() == 8

    # A new shard arrives (same bytes, new name -> new file to the source).
    src = os.path.join(sdf_dir, "cmps_06_07.sdf.gz")
    shutil.copy(src, os.path.join(stream_base, "sdf", "cmps_08_09.sdf.gz"))
    q2 = stream_build_db(stream_base, use_gzip=True, db_specs=SPECS, spark=spark)
    q2.awaitTermination()
    assert db.compounds().count() == 10  # only the new file's 2 records
    assert db.sdf_file().count() == 4


@pytest.fixture(scope="module")
def event_batches(spark, sf_dir, tmp_path_factory):
    """Events as micro-timestamped parquet shards in a stream directory."""
    from local_pubchem_db_spark.queries import events_table

    ev = events_table(spark, sf_dir).select([f.name for f in EVENT_SCHEMA.fields])
    d = tmp_path_factory.mktemp("event_stream")
    # Two shards so AvailableNow exercises multi-file listing.
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(d / "a"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(d / "b"))
    stream_dir = tmp_path_factory.mktemp("event_stream_flat")
    i = 0
    for sub in ("a", "b"):
        for fn in os.listdir(d / sub):
            if fn.endswith(".parquet"):
                shutil.copy(d / sub / fn, stream_dir / f"part-{i}.parquet")
                i += 1
    return ev, str(stream_dir)


def _run_stream(df, tmpdir, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName("sink_tbl")
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table("sink_tbl")


def test_watermark_drops_late_data(spark, tmp_path):
    # Two micro-batches with controlled timestamps pin the watermark
    # semantics: an event older than (max_ts - watermark) arriving in a
    # later batch must be DROPPED (its window never appears), while batch
    # execution of the same frames would count it.
    from datetime import datetime

    def shard(path, rows, mtime):
        df = spark.createDataFrame(
            [(i, ts, 1, "x", 1.0, "{}") for i, ts in rows], EVENT_SCHEMA
        )
        df.coalesce(1).write.parquet(str(path))
        for fn in os.listdir(path):
            os.utime(os.path.join(path, fn), (mtime, mtime))

    staging = tmp_path / "late_shards"
    staging.mkdir()
    shard(staging / "s1", [(1, datetime(2024, 1, 1, 10, 15)),
                           (2, datetime(2024, 1, 1, 12, 30))], 1_700_000_000)
    # arrives in run 2: ts 09:15 is behind the persisted 10:30 watermark
    # -> dropped; 14:45 is fresh
    shard(staging / "s2", [(3, datetime(2024, 1, 1, 9, 15)),
                           (4, datetime(2024, 1, 1, 14, 45))], 1_700_000_100)

    flat = tmp_path / "late_flat"
    flat.mkdir()

    def add(sub, idx):
        for fn in sorted(os.listdir(staging / sub)):
            if fn.endswith(".parquet"):
                shutil.copy(staging / sub / fn, flat / f"part-{idx}.parquet")

    out = tmp_path / "late_out"

    def run():
        # parquet sink: supports checkpoint recovery (memory sink doesn't)
        q = (
            hourly_event_counts(read_event_stream(spark, str(flat)))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: only shard 1 visible -> watermark 10:30 lands in the checkpoint
    add("s1", 0)
    run()
    # run 2: shard 2 appears; same checkpoint resumes the watermark
    add("s2", 1)
    run()
    got = spark.read.parquet(str(out)).collect()
    rows = sorted((r["hour_start"].hour, r["n"]) for r in got)
    # Final watermark = 14:45 - 2h = 12:45, so only windows ENDING by
    # 12:45 emit: exactly 10-11. Had the late 09:15 event been accepted,
    # its fully-closed 9-10 window would have emitted too — its absence
    # is the late-drop proof. 12-13 (ends 13:00) and 14-15 are withheld.
    assert rows == [(10, 1)]


def test_hourly_counts_stream_equals_batch(spark, event_batches, tmp_path):
    ev, stream_dir = event_batches
    stream = read_event_stream(spark, stream_dir)
    # complete mode: in append mode windows newer than the final watermark
    # are (correctly) withheld at end-of-stream, so stream-vs-batch
    # equality must be asserted on the complete result.
    got = _run_stream(
        hourly_event_counts(stream), str(tmp_path), mode="complete"
    ).collect()
    want = hourly_event_counts(ev).collect()
    key = lambda r: (r["hour_start"], r["event_type"])  # noqa: E731
    assert sorted(((key(r), r["n"], r["sum_value"]) for r in got)) == sorted(
        ((key(r), r["n"], r["sum_value"]) for r in want)
    )


def test_session_windows_stream_equals_batch(spark, event_batches, tmp_path):
    ev, stream_dir = event_batches
    stream = read_event_stream(spark, stream_dir)
    got = _run_stream(session_windows(stream), str(tmp_path)).collect()
    want = session_windows(ev).collect()
    key = lambda r: (r["user_id"], r["session_start"])  # noqa: E731
    got_set = {(key(r), r["session_end"], r["n_events"]) for r in got}
    want_set = {(key(r), r["session_end"], r["n_events"]) for r in want}
    # Append mode withholds sessions still open w.r.t. the final watermark,
    # so the stream result is a subset; every emitted session must be exact,
    # and every session closed before the final watermark must be emitted.
    assert got_set <= want_set
    final_wm = max(r["session_end"] for r in want) - __import__(
        "datetime"
    ).timedelta(hours=2)
    closed = {s for s in want_set if s[1] <= final_wm}
    assert closed <= got_set
    assert len(got_set) > 0


def test_stateful_user_counts(spark, event_batches, tmp_path):
    ev, stream_dir = event_batches
    # One file per trigger -> at least two micro-batches, so totals must
    # accumulate across batches through the state store.
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    out = _run_stream(stateful_user_counts(stream), str(tmp_path), mode="update")
    # Sum of per-batch increments == total events per user.
    got = (
        out.groupBy("user_id").agg(F.sum("batch_events").alias("n")).collect()
    )
    want = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sorted((r["user_id"], r["n"]) for r in got) == sorted(
        (r["user_id"], r["n"]) for r in want
    )
    # Final running total per user must equal the true count as well.
    finals = {
        r["user_id"]: r["events_total"]
        for r in out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.col("events_total").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    for r in want:
        assert finals[r["user_id"]] == r["n"]


def test_dedup_stream_drops_cross_batch_duplicates(spark, event_batches, tmp_path):
    from local_pubchem_db_spark.streaming import dedup_stream

    ev, stream_dir = event_batches
    # duplicate every shard under a new name: each event now arrives twice
    dup_dir = tmp_path / "dup_stream"
    dup_dir.mkdir()
    for i, fn in enumerate(sorted(os.listdir(stream_dir))):
        shutil.copy(os.path.join(stream_dir, fn), dup_dir / fn)
        shutil.copy(os.path.join(stream_dir, fn), dup_dir / f"copy-{i}.parquet")
    stream = read_event_stream(spark, str(dup_dir))
    got = _run_stream(dedup_stream(stream), str(tmp_path)).collect()
    assert len(got) == ev.count()  # every duplicate dropped
    assert len({r["event_id"] for r in got}) == len(got)
    # batch frame: same operator degrades to plain dropDuplicates
    assert dedup_stream(ev.union(ev)).count() == ev.count()


def test_stream_dedup_ingest_cross_batch(spark, sf_dir, tmp_path):
    # Continuous dedup: batch 2 re-sends a batch-1 document (near-dup of
    # itself) plus a fresh one — the replayed duplicate must be rejected
    # against the PERSISTED index without re-shingling history.
    from local_pubchem_db_spark.streaming import read_corpus, stream_dedup_ingest

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    assert len(docs) == 40
    in_dir = tmp_path / "docs_in"
    out_dir = tmp_path / "dedup_out"
    in_dir.mkdir()

    batch1 = [(r["doc_id"], r["text"]) for r in docs[:20]]
    spark.createDataFrame(batch1, "doc_id long, text string").coalesce(1).write.parquet(
        str(in_dir / "b1")
    )
    for fn in os.listdir(in_dir / "b1"):
        if fn.endswith(".parquet"):
            shutil.move(str(in_dir / "b1" / fn), str(in_dir / "shard-0.parquet"))
    shutil.rmtree(in_dir / "b1")
    q = stream_dedup_ingest(spark, str(in_dir), str(out_dir))
    q.awaitTermination()
    kept1 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept1  # batch-internal near-dups may drop some of the 20

    # batch 2: one exact re-send (new id, same text => near-dup of history)
    # and one genuinely new document
    dup_text = docs[0]["text"]
    fresh = docs[39]
    batch2 = [(90001, dup_text), (fresh["doc_id"], fresh["text"])]
    spark.createDataFrame(batch2, "doc_id long, text string").coalesce(1).write.parquet(
        str(in_dir / "b2")
    )
    for fn in os.listdir(in_dir / "b2"):
        if fn.endswith(".parquet"):
            shutil.move(str(in_dir / "b2" / fn), str(in_dir / "shard-1.parquet"))
    shutil.rmtree(in_dir / "b2")
    q2 = stream_dedup_ingest(spark, str(in_dir), str(out_dir))
    q2.awaitTermination()

    kept2 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert 90001 not in kept2, "cross-batch duplicate must be rejected"
    assert fresh["doc_id"] in kept2 or fresh["doc_id"] in kept1
    assert kept1 <= kept2  # replay never loses accepted history


def test_stream_dedup_ingest_all_short_first_batch(spark, tmp_path):
    # Batch 1 is ALL short docs (zero shingles): they collide with nothing
    # and must be kept, and the index dir they leave behind (no part-files)
    # must not crash batch 2's history read.
    from local_pubchem_db_spark.streaming import read_corpus, stream_dedup_ingest

    in_dir = tmp_path / "docs_in"
    out_dir = tmp_path / "dedup_out"
    in_dir.mkdir()

    def shard(rows, name):
        stage = tmp_path / "stage"
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(str(stage))
        for fn in os.listdir(stage):
            if fn.endswith(".parquet"):
                shutil.move(str(stage / fn), str(in_dir / name))
        shutil.rmtree(stage)

    shard([(1, "hi"), (2, "ok bye")], "shard-0.parquet")
    q = stream_dedup_ingest(spark, str(in_dir), str(out_dir))
    q.awaitTermination()
    kept = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept == {1, 2}

    long_text = (
        "a genuinely long document about adaptive query execution and the "
        "shuffle partition planning that follows it in every spark release"
    )
    shard([(3, "no"), (4, long_text)], "shard-1.parquet")
    q2 = stream_dedup_ingest(spark, str(in_dir), str(out_dir))
    q2.awaitTermination()
    kept2 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept2 == {1, 2, 3, 4}


def test_stream_dedup_ingest_replay_is_lossless(spark, sf_dir, tmp_path):
    # Checkpoint replay of a dedup-ingest batch: the crashed attempt's own
    # index partition is already on disk, and must NOT make the replayed
    # batch collide with itself (that would overwrite the corpus partition
    # with an empty keep-set - silent data loss).
    from local_pubchem_db_spark.streaming import read_corpus, stream_dedup_ingest

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(15)
        .collect()
    )
    in_dir = tmp_path / "docs_in"
    out_dir = tmp_path / "dedup_out"
    in_dir.mkdir()
    spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in docs], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(in_dir / "b"))
    for fn in os.listdir(in_dir / "b"):
        if fn.endswith(".parquet"):
            shutil.move(str(in_dir / "b" / fn), str(in_dir / "shard-0.parquet"))
    shutil.rmtree(in_dir / "b")

    q = stream_dedup_ingest(spark, str(in_dir), str(out_dir))
    q.awaitTermination()
    kept1 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept1

    # crash after the sink writes, before the checkpoint commit
    commits = os.path.join(str(out_dir), "_checkpoint", "commits")
    os.remove(os.path.join(commits, "0"))
    crc = os.path.join(commits, ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = stream_dedup_ingest(spark, str(in_dir), str(out_dir))
    q2.awaitTermination()

    kept2 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept2 == kept1, "replay must reproduce the keep-set exactly"


def _doc_shard(spark, in_dir, rows, name):
    import tempfile

    stage = tempfile.mkdtemp(dir=os.path.dirname(in_dir))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    for fn in os.listdir(stage):
        if fn.endswith(".parquet"):
            shutil.move(os.path.join(stage, fn), os.path.join(in_dir, name))
    shutil.rmtree(stage, ignore_errors=True)


def test_stream_dedup_compaction_buckets_history(spark, sf_dir, tmp_path):
    """After compaction the history side of the batch-vs-history semi-join
    is a (band,bucket)-bucketed table scan with NO Exchange — only the
    micro-batch's buckets shuffle, never the accumulated history (the
    round-5 verdict's one remaining growing-cost path)."""
    from local_pubchem_db_spark.operators.dedup import lsh_bucket_index
    from local_pubchem_db_spark.streaming import (
        history_index_frames,
        read_corpus,
        stream_dedup_ingest,
    )
    from local_pubchem_db_spark.streaming.dedup_ingest import _read_meta

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(25)
        .collect()
    )
    in_dir, out_dir = tmp_path / "docs_in", tmp_path / "dedup_out"
    in_dir.mkdir()
    _doc_shard(spark, str(in_dir), [(r["doc_id"], r["text"]) for r in docs[:20]],
               "shard-0.parquet")
    # threshold 1 row: the first batch immediately folds into v1
    q = stream_dedup_ingest(spark, str(in_dir), str(out_dir),
                            compact_threshold_rows=1)
    q.awaitTermination()
    kept1 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept1

    meta = _read_meta(str(out_dir))
    assert meta and meta["version"] >= 1 and meta["rows"] > 0
    # folded delta partitions are evicted
    delta_dirs = [
        d
        for d in os.listdir(out_dir / "lsh_index")
        if d.startswith("ingest_batch=")
    ]
    assert delta_dirs == [], delta_dirs

    # history is ONE frame (the compacted table) and its semi-join probe
    # plans exactly one Exchange — the batch side; the bucketed history
    # scan joins in place.
    frames = history_index_frames(spark, str(out_dir))
    assert len(frames) == 1
    probe = spark.createDataFrame(
        [(90001, docs[0]["text"])], "doc_id long, text string"
    )
    # Disable auto-broadcast for the assertion: at test scale the tiny
    # history would broadcast (also a fine, scale-appropriate plan); the
    # pin here is the LARGE-history shape — a sort-merge semi-join whose
    # history side reads the bucketed files in place.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        semi = lsh_bucket_index(probe, "doc_id", "text").join(
            frames[0], ["band", "bucket"], "left_semi"
        )
        plan = semi._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert plan.count("Exchange") == 1, plan  # the probe side only
    assert "Bucketed: true" in plan, plan

    # batch 2: a re-send must be rejected against the COMPACTED tier
    # (no fold this time: huge threshold), a fresh doc accepted.
    fresh = docs[24]
    _doc_shard(spark, str(in_dir),
               [(90001, docs[0]["text"]), (fresh["doc_id"], fresh["text"])],
               "shard-1.parquet")
    q2 = stream_dedup_ingest(spark, str(in_dir), str(out_dir),
                             compact_threshold_rows=10**9)
    q2.awaitTermination()
    kept2 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert 90001 not in kept2
    assert fresh["doc_id"] in kept2
    assert kept1 <= kept2


def test_stream_dedup_replay_after_compaction(spark, sf_dir, tmp_path):
    """Checkpoint replay of a batch whose index rows were already FOLDED
    into the compacted tier: the exclude-own-batch filter must reach the
    compacted table too, or the replay collides with itself and
    overwrites the corpus partition with an empty keep-set."""
    from local_pubchem_db_spark.streaming import read_corpus, stream_dedup_ingest

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(12)
        .collect()
    )
    in_dir, out_dir = tmp_path / "docs_in", tmp_path / "dedup_out"
    in_dir.mkdir()
    _doc_shard(spark, str(in_dir), [(r["doc_id"], r["text"]) for r in docs],
               "shard-0.parquet")
    q = stream_dedup_ingest(spark, str(in_dir), str(out_dir),
                            compact_threshold_rows=1)
    q.awaitTermination()
    kept1 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept1

    commits = os.path.join(str(out_dir), "_checkpoint", "commits")
    os.remove(os.path.join(commits, "0"))
    crc = os.path.join(commits, ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = stream_dedup_ingest(spark, str(in_dir), str(out_dir),
                             compact_threshold_rows=1)
    q2.awaitTermination()
    kept2 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept2 == kept1, "replay must reproduce the keep-set exactly"


def test_stream_dedup_multibatch_folds_geometrically(spark, sf_dir, tmp_path):
    """ONE stream run draining 4 shards as 4 micro-batches
    (maxFilesPerTrigger=1) with a tiny fold threshold: folds happen
    DURING the run, later batches dedup against the compacted tier, and
    the final keep-set equals the single-batch run's on the same data."""
    from local_pubchem_db_spark.streaming import read_corpus, stream_dedup_ingest
    from local_pubchem_db_spark.streaming.dedup_ingest import _read_meta

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    rows = [(r["doc_id"], r["text"]) for r in docs]
    # shard 2 re-sends shard 0's texts under new ids: cross-batch dups
    resent = [(90000 + i, t) for i, (_, t) in enumerate(rows[:10])]
    shards = [rows[:10], rows[10:20], resent, rows[20:40]]

    multi_in = tmp_path / "multi_in"
    multi_in.mkdir()
    for i, shard_rows in enumerate(shards):
        _doc_shard(spark, str(multi_in), shard_rows, f"shard-{i}.parquet")
    multi_out = tmp_path / "multi_out"
    q = stream_dedup_ingest(
        spark, str(multi_in), str(multi_out),
        compact_threshold_rows=1, max_files_per_trigger=1,
    )
    q.awaitTermination()
    meta = _read_meta(str(multi_out))
    assert meta and meta["version"] >= 2, meta  # folded more than once
    kept_multi = {
        r["doc_id"] for r in read_corpus(spark, str(multi_out)).collect()
    }
    assert not any(90000 <= d < 90010 for d in kept_multi), (
        "cross-batch re-sends must be rejected against the compacted tier")

    # oracle: the same corpus in ONE batch (no folding mid-run)
    single_in = tmp_path / "single_in"
    single_in.mkdir()
    _doc_shard(spark, str(single_in),
               [r for shard_rows in shards for r in shard_rows],
               "shard-all.parquet")
    single_out = tmp_path / "single_out"
    q2 = stream_dedup_ingest(spark, str(single_in), str(single_out),
                             compact_threshold_rows=10**9)
    q2.awaitTermination()
    kept_single = {
        r["doc_id"] for r in read_corpus(spark, str(single_out)).collect()
    }
    # Batch-internal ties pick the lowest id; the resent copies have the
    # HIGHEST ids, so both orderings keep the original docs: identical sets.
    assert kept_multi == kept_single


def test_stream_dedup_quality_survivor_within_batch(spark, tmp_path):
    """With quality_col set, a batch-internal near-dup component keeps
    its BEST-quality member (not first-arrival/lowest id); history
    collisions stay drop-only even for a better late copy."""
    from local_pubchem_db_spark.streaming import (
        read_corpus,
        stream_dedup_ingest,
    )

    text = " ".join(f"token{i} alpha beta gamma" for i in range(40))
    other = " ".join(f"distinct{i} delta epsilon zeta" for i in range(40))
    in_dir = tmp_path / "docs_in"
    out_dir = tmp_path / "q_out"
    in_dir.mkdir()

    # batch 1: ids 1 and 2 are exact near-dups; 2 has higher quality.
    # id 5 is unrelated.
    b1 = [(1, text, 0.1), (2, text, 0.9), (5, other, 0.5)]
    spark.createDataFrame(
        b1, "doc_id long, text string, q double"
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    for fn in os.listdir(in_dir / "b1"):
        if fn.endswith(".parquet"):
            shutil.move(
                str(in_dir / "b1" / fn), str(in_dir / "shard-0.parquet")
            )
    shutil.rmtree(in_dir / "b1")
    q = stream_dedup_ingest(
        spark, str(in_dir), str(out_dir), quality_col="q"
    )
    q.awaitTermination()
    kept = {
        r["doc_id"]: r["q"]
        for r in read_corpus(spark, str(out_dir)).collect()
    }
    assert set(kept) == {2, 5}, kept  # best copy won, not lowest id

    # batch 2: an even better copy of the same text arrives late —
    # history collisions are drop-only, so it must NOT displace id 2
    b2 = [(9, text, 1.0)]
    spark.createDataFrame(
        b2, "doc_id long, text string, q double"
    ).coalesce(1).write.parquet(str(in_dir / "b2"))
    for fn in os.listdir(in_dir / "b2"):
        if fn.endswith(".parquet"):
            shutil.move(
                str(in_dir / "b2" / fn), str(in_dir / "shard-1.parquet")
            )
    shutil.rmtree(in_dir / "b2")
    q2 = stream_dedup_ingest(
        spark, str(in_dir), str(out_dir), quality_col="q"
    )
    q2.awaitTermination()
    kept2 = {r["doc_id"] for r in read_corpus(spark, str(out_dir)).collect()}
    assert kept2 == {2, 5}, kept2
