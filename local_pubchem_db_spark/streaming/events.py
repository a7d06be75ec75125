"""Event-time streaming operators over the events stream.

The reference has no streaming surface; these extend its incremental-build
model (SURVEY.md §2 C11) to the event-time operators a training-data
pipeline needs, all on Structured Streaming built-ins:

- watermarked tumbling-window aggregation (late data bounded by the
  watermark; state is evicted, so the query runs forever at scale),
- session windows via the built-in ``session_window`` (gap-based
  sessionization without custom state),
- a custom stateful operator via ``applyInPandasWithState`` — the shape to
  copy for anything the built-ins can't express (running per-key counters
  here; the state schema is explicit, timeouts evict idle keys).

Every transformation is defined on a DataFrame, so each works identically
on a batch frame (tests + DuckDB oracles) and a streaming frame — the
Structured Streaming contract.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event rows (parquet shards arriving in a
    directory). ``maxFilesPerTrigger`` bounds per-batch work — the
    backpressure knob for a catch-up run over a deep directory."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour counts per event type with a late-data watermark.

    On a stream, state for windows older than the watermark is dropped —
    constant memory per key regardless of stream length. On a batch frame
    the watermark is a no-op and this equals the batch events_hourly query.
    """
    # Group by the window STRUCT (not window.start): append-mode streaming
    # requires the time-window column itself in the grouping for the
    # watermark to bound state.
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"), "event_type", "n", "sum_value"
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """Gap-based sessionization with the built-in session_window operator.

    A session extends while consecutive events per user are closer than
    ``gap``; the window closes ``gap`` after the last event. Built-in state
    management (merge + eviction past the watermark) replaces the lag +
    running-sum construction needed in pure batch SQL.
    """
    if watermark is not None and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key within
    the watermark horizon (``dropDuplicatesWithinWatermark``).

    The streaming face of the batch dedup family (operators/dedup.py):
    state holds one entry per key only until the watermark passes it, so
    memory is bounded by key arrival rate × watermark window — the only
    dedup contract that runs forever on an unbounded stream. On a batch
    frame it degrades to plain dropDuplicates semantics.
    """
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


_STATE_SCHEMA = StructType([StructField("n", LongType())])
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_total", LongType()),
        StructField("batch_events", LongType()),
    ]
)


def stateful_user_counts(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Custom stateful operator: running per-user event totals via
    applyInPandasWithState (the template for operators Spark lacks).

    Emits one row per user per micro-batch with the all-time total and the
    batch increment. State = a single counter per user. Pass
    ``idle_timeout_ms`` on a continuously-running query to evict idle
    users and bound state on high-cardinality key spaces; leave None for
    drain-and-stop (``availableNow``) runs — processing-time timeouts keep
    scheduling wake-up batches, so a timed query never terminates under
    the available-now trigger.
    """
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
        (prev,) = state.get if state.exists else (0,)
        total = prev + batch_n
        state.update((total,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "events_total": [total], "batch_events": [batch_n]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
