from local_pubchem_db_spark.streaming.ingest import stream_build_db
from local_pubchem_db_spark.streaming.dedup_ingest import (
    compact_dedup_index,
    history_index_frames,
    read_corpus,
    stream_dedup_ingest,
)
from local_pubchem_db_spark.streaming.events import (
    dedup_stream,
    hourly_event_counts,
    read_event_stream,
    session_windows,
    stateful_user_counts,
)

__all__ = [
    "compact_dedup_index",
    "dedup_stream",
    "history_index_frames",
    "hourly_event_counts",
    "read_corpus",
    "read_event_stream",
    "session_windows",
    "stateful_user_counts",
    "stream_build_db",
    "stream_dedup_ingest",
]
