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
    write_frontier: bool = True,
) -> None:
    """Drain available event shards and append newly-finalized hourly
    buckets to ``rollup_dir``. Safe to run on any cadence (cron or a
    long-lived stream): the checkpoint resumes the watermark, replays
    are exactly-once, and each bucket is written at most once.

    ``write_frontier=False`` skips the exact-cutoff sidecar entirely —
    for deployments whose rollup dir is not driver-``os``-writable
    (e.g. ``s3a://`` URIs) and whose realtime readers consciously pass
    ``checkpoint_dir`` instead. With the default ``True``, a sidecar
    write FAILURE raises loudly (the rollup batch itself is already
    committed at that point) rather than silently demoting readers to
    the legacy last-bucket cutoff."""
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
    # Persist the finalization frontier beside the rollup so real-time
    # readers get the EXACT cutoff by default, without needing access to
    # the checkpoint dir (which in production often lives with the writer,
    # not the dashboards).
    if write_frontier:
        wm_ms = _checkpoint_watermark_ms(checkpoint_dir)
        if wm_ms is not None:
            _write_frontier(rollup_dir, wm_ms)


def _checkpoint_watermark_ms(checkpoint_dir: str) -> int | None:
    """Event-time watermark (epoch MILLIS) of the newest COMMITTED
    batch, or None if unreadable. Spark writes ``offsets/N`` at batch
    START, before batch N's output exists — reading the newest offsets
    entry during (or after a crash inside) an in-flight batch would
    claim buckets the rollup parquet does not yet contain. Gating on
    ``commits/`` membership makes this the exact finalization frontier:
    every bucket ending at or before it has been emitted, including
    empty ones.

    Millis, not a naive datetime: PySpark converts naive datetime
    literals via the driver's LOCAL timezone (time.mktime in
    TimestampType.toInternal), so a UTC-derived naive cutoff shifts by
    the host's UTC offset on any non-UTC driver. Keeping the frontier in
    epoch millis and comparing via ``F.timestamp_millis`` stays in
    instant space end-to-end — timezone never enters.
    """
    import json
    import os

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
        return int(wm_ms) or None
    except (OSError, ValueError, IndexError, json.JSONDecodeError):
        return None


_FRONTIER_FILE = "_frontier.json"  # legacy (r7) sidecar, still readable
# Marker protocol: the watermark rides in the FILENAME, so the write is
# atomic wherever file CREATION is atomic — POSIX and object stores
# alike — with no rename semantics required (the r7 tmp + os.replace
# silently degraded the "exact cutoff by default" claim off-POSIX).
# "_"-prefixed: invisible to Spark data scans. Zero-padded so the files
# also sort numerically for humans.
_MARKER_RE = None  # compiled lazily below


def _marker_wm(name: str) -> int | None:
    global _MARKER_RE
    if _MARKER_RE is None:
        import re

        _MARKER_RE = re.compile(r"_frontier-(\d{1,20})\.json")
    m = _MARKER_RE.fullmatch(name)
    return int(m.group(1)) if m else None


def _write_frontier(rollup_dir: str, wm_ms: int) -> None:
    """Record the committed watermark beside the rollup as a marker
    file ``_frontier-<wm_ms>.json``; readers take the max over markers,
    so a torn CONTENT write can never corrupt the value and concurrent
    retries only leave superseded markers (cleaned best-effort here).

    The marker for THIS run's watermark is authoritative: every other
    marker — lower (superseded) or HIGHER (stale, e.g. left behind by
    a previous stream lifetime after an operator reset the checkpoint
    and rebuilt the rollup) — is removed. A surviving stale high
    marker would make the realtime view's raw-side cutoff overshoot
    the true watermark, silently hiding live events from dashboards
    until the new watermark caught up; the lower-bound markers are
    merely redundant. Removal failure of a HIGHER marker is therefore
    LOUD, like a write failure.

    Raises RuntimeError on failure — LOUDLY, because a silently missing
    sidecar would demote every default-mode realtime reader to the
    legacy last-bucket cutoff, where beyond-watermark stragglers can
    transiently surface. The rollup data itself is already committed
    when this runs; on stores the driver cannot write through ``os``
    (e.g. ``s3a://`` URIs), pass ``checkpoint_dir`` to
    ``hourly_rollup_with_realtime`` and ignore the sidecar entirely."""
    import json
    import os

    path = os.path.join(rollup_dir, f"_frontier-{wm_ms:020d}.json")
    try:
        os.makedirs(rollup_dir, exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w") as fh:
                json.dump({"batchWatermarkMs": wm_ms}, fh)
    except OSError as e:
        raise RuntimeError(
            f"could not write the rollup frontier marker {path!r}: {e}. "
            "The rollup data IS committed; only the exact-cutoff sidecar "
            "failed. Real-time readers on this rollup must pass "
            "checkpoint_dir to hourly_rollup_with_realtime (or fix the "
            "rollup dir so the driver can create files in it)."
        ) from e
    for fn in os.listdir(rollup_dir):
        wm = _marker_wm(fn)
        if wm is None or wm == wm_ms:
            continue
        try:
            os.unlink(os.path.join(rollup_dir, fn))
        except OSError as e:
            if wm > wm_ms:
                raise RuntimeError(
                    f"could not remove the STALE frontier marker {fn!r} "
                    f"(watermark {wm} > current {wm_ms}): {e}. Readers "
                    "take the max over markers, so leaving it would make "
                    "the realtime view silently hide events newer than "
                    "the true watermark; remove it manually or pass "
                    "checkpoint_dir to hourly_rollup_with_realtime."
                ) from e
            # a lower (superseded) marker is harmless — best-effort


def _read_frontier(rollup_dir: str) -> int | None:
    """Max watermark over the marker files; falls back to the legacy
    r7 ``_frontier.json`` content for rollups written by older code."""
    import json
    import os

    try:
        names = os.listdir(rollup_dir)
    except OSError:
        return None
    marks = [wm for fn in names if (wm := _marker_wm(fn)) is not None]
    if marks:
        return max(marks) or None
    try:
        with open(os.path.join(rollup_dir, _FRONTIER_FILE)) as fh:
            return int(json.load(fh)["batchWatermarkMs"]) or None
    except (OSError, ValueError, KeyError, json.JSONDecodeError):
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
    finalization frontier — the checkpoint's committed event-time
    watermark, read from ``checkpoint_dir`` when given, else from the
    ``_frontier.json`` sidecar ``materialize_hourly_rollup`` writes
    beside the rollup. This is exact even when trailing hours are
    EMPTY. Only when neither source exists (a rollup produced by some
    other writer) does the cutoff fall back to the last materialized
    bucket's end; in that legacy mode a beyond-watermark straggler the
    stream dropped could transiently surface on the raw side.

    The frontier is epoch millis and the cutoff a foldable
    ``timestamp_millis`` literal: the comparison happens in instant
    space, immune to the driver timezone (a naive-datetime literal would
    shift by the host UTC offset — ADVICE r6), and the hour floor is
    millis arithmetic, matching ``F.window``'s unix-epoch alignment
    exactly (``date_trunc`` would truncate in the session zone, wrong on
    fractional-offset zones).

    The raw side's filter is a plain ``ts >= cutoff`` predicate —
    Catalyst folds the literal and pushes it to the parquet scan, so the
    expensive side of the union reads only the tail.
    """
    try:
        rollup = spark.read.parquet(rollup_dir)
        last = rollup.agg(F.max("hour_start").alias("m")).first()["m"]
    except AnalysisException:
        rollup, last = None, None
    wm_ms = (
        _checkpoint_watermark_ms(checkpoint_dir)
        if checkpoint_dir is not None
        else None
    )
    if wm_ms is None:
        wm_ms = _read_frontier(rollup_dir)
    cutoff_col = None
    if wm_ms is not None:
        # buckets ending <= wm are finalized; the first un-finalized
        # bucket starts at the epoch-aligned hour floor of wm
        cutoff_col = F.timestamp_millis(
            F.lit((wm_ms // 3_600_000) * 3_600_000)
        )
    elif last is not None:
        # legacy fallback: max finalized bucket START + 1h == its END.
        # `last` came out of collect() through the same local-time
        # conversion F.lit applies going back in, so the round-trip is
        # symmetric (unlike a UTC-derived naive datetime).
        cutoff_col = F.lit(last + timedelta(hours=1))
    if rollup is None or cutoff_col is None:
        return hourly_event_counts(events)
    recent = hourly_event_counts(events.filter(F.col("ts") >= cutoff_col))
    return rollup.filter(F.col("hour_start") < cutoff_col).unionByName(
        recent
    )
