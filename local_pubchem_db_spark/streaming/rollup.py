"""Continuous aggregate over the events stream — the hypertable-rollup
pattern (TimescaleDB's continuous aggregates / real-time aggregation),
built from Structured Streaming primitives:

- **materialize**: an append-mode streaming aggregation writes each
  finalized hourly bucket to a parquet rollup table exactly once (a
  window row is emitted only when the watermark passes its end, and the
  checkpoint makes replays idempotent). The rollup grows by finalized
  buckets only — it is append-only, never rewritten.
- **real-time view**: queries union the materialized buckets with an
  on-the-fly aggregation of ONLY the raw events newer than the last
  finalized bucket, so a dashboard sees complete history plus the live
  edge while scanning raw data proportional to the watermark horizon,
  not the stream's age.

Scale shape: the streaming agg keeps state only for open windows
(bounded by the watermark); the rollup table is one row per
(hour, event_type) — ~10^4 rows/year/key, trivially scannable forever;
the real-time union's raw-side scan is bounded by the un-finalized tail.
At 100 TB of accumulated events, queries against the rollup never touch
the raw table outside the tail (partition-prune the raw events table on
ingest date to make that literal).

Semantics contract: events later than the watermark are dropped by the
streaming agg (their bucket already finalized); the real-time view
inherits exactly that — it never resurrects beyond-watermark stragglers,
so materialized and live reads agree. SURVEY.md §2 C11 extension; the
reference's closest surface is the incremental manifest build
(utils.py:292-334), which this generalizes to time-bucketed state.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from local_pubchem_db_spark.streaming.events import (
    hourly_event_counts,
    read_event_stream,
)


def materialize_hourly_rollup(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain available event shards and append newly-finalized hourly
    buckets to ``rollup_dir``. Safe to run on any cadence (cron or a
    long-lived stream): the checkpoint resumes the watermark, replays
    are exactly-once, and each bucket is written at most once."""
    stream = read_event_stream(spark, events_dir, max_files_per_trigger)
    q = (
        hourly_event_counts(stream, watermark)
        .writeStream.format("parquet")
        .option("path", rollup_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _checkpoint_watermark(checkpoint_dir: str):
    """Event-time watermark (UTC datetime) of the newest COMMITTED
    batch, or None if unreadable. Spark writes ``offsets/N`` at batch
    START, before batch N's output exists — reading the newest offsets
    entry during (or after a crash inside) an in-flight batch would
    claim buckets the rollup parquet does not yet contain. Gating on
    ``commits/`` membership makes this the exact finalization frontier:
    every bucket ending at or before it has been emitted, including
    empty ones."""
    import json
    import os
    from datetime import datetime, timezone

    offsets = os.path.join(checkpoint_dir, "offsets")
    commits = os.path.join(checkpoint_dir, "commits")
    try:
        committed = [int(f) for f in os.listdir(commits) if f.isdigit()]
        if not committed:
            return None
        with open(os.path.join(offsets, str(max(committed)))) as fh:
            lines = fh.read().splitlines()
        # line 0: version tag; line 1: JSON metadata incl. watermark
        wm_ms = json.loads(lines[1]).get("batchWatermarkMs", 0)
        if not wm_ms:
            return None
        return datetime.fromtimestamp(
            wm_ms / 1000.0, tz=timezone.utc
        ).replace(tzinfo=None)
    except (OSError, ValueError, IndexError, json.JSONDecodeError):
        return None


def hourly_rollup_with_realtime(
    spark: SparkSession,
    rollup_dir: str,
    events: DataFrame,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Real-time continuous aggregate: materialized finalized buckets
    UNION an on-the-fly aggregation of raw events from the first
    un-finalized bucket onward. Equals the full batch
    ``hourly_event_counts`` over ``events`` whenever no event was
    dropped for lateness (pinned in tests/test_rollup.py).

    The cutoff between the two sides is the hour floor of the
    checkpoint's persisted event-time watermark when ``checkpoint_dir``
    is given — the exact finalization frontier, correct even when
    trailing hours are EMPTY. Without a checkpoint the cutoff falls
    back to the last materialized bucket's end, which is exact unless
    hours between it and the watermark held no on-time events; in that
    gap a beyond-watermark straggler the stream dropped could transiently
    surface on the raw side — pass ``checkpoint_dir`` where that
    distinction matters.

    The raw side's filter is a plain ``ts >= cutoff`` predicate — it
    pushes down to the parquet scan, so the expensive side of the union
    reads only the tail.
    """
    try:
        rollup = spark.read.parquet(rollup_dir)
        last = rollup.agg(F.max("hour_start").alias("m")).first()["m"]
    except AnalysisException:
        rollup, last = None, None
    cutoff = None
    if checkpoint_dir is not None:
        wm = _checkpoint_watermark(checkpoint_dir)
        if wm is not None:
            # buckets ending <= wm are finalized; the first un-finalized
            # bucket starts at the hour floor of wm
            cutoff = wm.replace(minute=0, second=0, microsecond=0)
    if cutoff is None and last is not None:
        # fallback: max finalized bucket START + 1h == that bucket's END
        cutoff = last + timedelta(hours=1)
    if rollup is None or cutoff is None:
        return hourly_event_counts(events)
    recent = hourly_event_counts(events.filter(F.col("ts") >= F.lit(cutoff)))
    return rollup.filter(F.col("hour_start") < F.lit(cutoff)).unionByName(
        recent
    )
