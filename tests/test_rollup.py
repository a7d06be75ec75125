"""Continuous aggregate (materialized hourly rollup + real-time view):
exactly-once materialization, idempotent replay, and batch-equivalence
of the real-time union."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.streaming.events import (
    EVENT_SCHEMA,
    hourly_event_counts,
)
from local_pubchem_db_spark.streaming.rollup import (
    hourly_rollup_with_realtime,
    materialize_hourly_rollup,
)


@pytest.fixture(scope="module")
def stream_setup(spark, sf_dir, tmp_path_factory):
    from local_pubchem_db_spark.queries import events_table

    ev = events_table(spark, sf_dir).select(
        [f.name for f in EVENT_SCHEMA.fields]
    )
    # time-ordered shards (early half, late half): arrival order respects
    # event time, so nothing is beyond-watermark late and the continuous
    # aggregate must reproduce the batch result exactly
    split = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    mid_ts = ev.orderBy("ts").limit(int(split)).agg(F.max("ts")).first()[0]
    early, late = ev.filter(F.col("ts") <= mid_ts), ev.filter(F.col("ts") > mid_ts)
    staged = tmp_path_factory.mktemp("rollup_staged")
    early.coalesce(1).write.parquet(str(staged / "a"))
    late.coalesce(1).write.parquet(str(staged / "b"))
    return ev, early, staged


def _flat_copy(src_dirs, dst, start=0):
    i = start
    for d in src_dirs:
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                shutil.copy(os.path.join(d, fn), os.path.join(dst, f"part-{i}.parquet"))
                i += 1
    return i


def _rows(df):
    return sorted(
        (r["hour_start"], r["event_type"], r["n"], round(r["sum_value"], 4))
        for r in df.collect()
    )


def test_materialize_then_realtime_equals_batch(spark, stream_setup, tmp_path):
    ev, early, staged = stream_setup
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    n = _flat_copy([staged / "a"], stream_dir)
    materialize_hourly_rollup(spark, str(stream_dir), rollup_dir, ckpt)
    first_batch = spark.read.parquet(rollup_dir)
    n_first = first_batch.count()
    assert n_first > 0, "watermark finalized no windows on batch 1"

    # finalized buckets must exactly match the batch agg on those buckets
    batch_a = hourly_event_counts(early)
    finalized_hours = {r["hour_start"] for r in first_batch.collect()}
    assert _rows(first_batch) == _rows(
        batch_a.filter(F.col("hour_start").isin(list(finalized_hours)))
    )

    # drain the second shard into the same checkpoint: only NEW buckets
    # append; nothing already materialized is rewritten or duplicated
    _flat_copy([staged / "b"], stream_dir, start=n)
    materialize_hourly_rollup(spark, str(stream_dir), rollup_dir, ckpt)
    rollup = spark.read.parquet(rollup_dir)
    keys = [(r["hour_start"], r["event_type"]) for r in rollup.collect()]
    assert len(keys) == len(set(keys)), "duplicate bucket rows after drain 2"

    # replay with the same checkpoint and no new data: a no-op
    materialize_hourly_rollup(spark, str(stream_dir), rollup_dir, ckpt)
    assert spark.read.parquet(rollup_dir).count() == len(keys)

    # real-time view == full batch aggregation (no beyond-watermark
    # stragglers in this feed, so equality is exact)
    got = hourly_rollup_with_realtime(spark, rollup_dir, ev)
    assert _rows(got) == _rows(hourly_event_counts(ev))
    # and the union actually used the materialized side
    assert len(_rows(got)) > len(keys) - 1


def test_realtime_with_no_rollup_is_batch_agg(spark, stream_setup, tmp_path):
    ev, _, _ = stream_setup
    got = hourly_rollup_with_realtime(
        spark, str(tmp_path / "missing_rollup"), ev
    )
    assert _rows(got) == _rows(hourly_event_counts(ev))


def test_realtime_raw_side_filter_pushes_down(spark, stream_setup, tmp_path):
    """The live-edge side must scan only the tail: the ts >= cutoff
    predicate reaches the parquet scan as a pushed filter."""
    ev, _, staged = stream_setup
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    rollup_dir = str(tmp_path / "rollup")
    _flat_copy([staged / "a", staged / "b"], stream_dir)
    materialize_hourly_rollup(
        spark, str(stream_dir), rollup_dir, str(tmp_path / "ckpt")
    )
    raw_path = str(tmp_path / "raw_events")
    ev.write.parquet(raw_path)
    raw = spark.read.parquet(raw_path)
    plan = (
        hourly_rollup_with_realtime(spark, rollup_dir, raw)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # filter order within the list is not stable across plans; require
    # the >= cutoff predicate to appear inside the raw scan's
    # PushedFilters bracket
    scans = [
        seg
        for seg in plan.split("FileScan")
        if "struct<ts:timestamp" in seg and "PushedFilters:" in seg
    ]
    assert scans
    assert any(
        "GreaterThanOrEqual(ts," in seg.split("PushedFilters:")[1].split("]")[0]
        for seg in scans
    )


def test_checkpoint_watermark_cutoff_excludes_dropped_stragglers(
    spark, tmp_path
):
    """When trailing hours are EMPTY, the last-bucket fallback cutoff
    under-shoots the watermark and can resurrect a straggler the stream
    dropped; the checkpoint-watermark cutoff is the exact frontier and
    agrees with the stream."""
    from datetime import datetime

    from local_pubchem_db_spark.streaming.events import EVENT_SCHEMA

    def shard(path, rows, mtime):
        df = spark.createDataFrame(
            [(i, ts, 1, "x", 1.0, "{}") for i, ts in rows], EVENT_SCHEMA
        )
        df.coalesce(1).write.parquet(str(path))
        for fn in os.listdir(path):
            os.utime(os.path.join(path, fn), (mtime, mtime))

    staging = tmp_path / "shards"
    staging.mkdir()
    # hour-1 bucket gets data; hour 10 advances the watermark to 08:00
    # (2h watermark); hours 2..9 are EMPTY
    shard(
        staging / "s1",
        [(1, datetime(2024, 1, 1, 1, 15)), (2, datetime(2024, 1, 1, 10, 0))],
        1_700_000_000,
    )
    # straggler at 05:30 arrives later: its bucket (ends 06:00) is
    # behind the persisted 08:00 watermark -> stream DROPS it
    shard(staging / "s2", [(3, datetime(2024, 1, 1, 5, 30))], 1_700_000_100)

    flat = tmp_path / "flat"
    flat.mkdir()
    rollup_dir, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    _flat_copy([staging / "s1"], flat)
    materialize_hourly_rollup(spark, str(flat), rollup_dir, ckpt)
    _flat_copy([staging / "s2"], flat, start=1)
    materialize_hourly_rollup(spark, str(flat), rollup_dir, ckpt)

    # the stream dropped the straggler: only the 01:00 bucket exists
    assert [
        (r["hour_start"].hour, r["n"])
        for r in spark.read.parquet(rollup_dir).collect()
    ] == [(1, 1)]

    # materialize persisted the committed frontier beside the rollup
    from local_pubchem_db_spark.streaming.rollup import (
        _checkpoint_watermark_ms,
        _read_frontier,
    )

    assert _read_frontier(rollup_dir) == _checkpoint_watermark_ms(ckpt)
    assert _read_frontier(rollup_dir) is not None

    raw = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 1, 15), 1, "x", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 10, 0), 1, "x", 1.0, "{}"),
            (3, datetime(2024, 1, 1, 5, 30), 1, "x", 1.0, "{}"),
        ],
        EVENT_SCHEMA,
    )
    # exact mode: straggler stays dropped (view agrees with the stream);
    # the live edge (hour 10, past the 08:00 frontier) still shows
    exact = hourly_rollup_with_realtime(
        spark, rollup_dir, raw, checkpoint_dir=ckpt
    ).collect()
    assert sorted((r["hour_start"].hour, r["n"]) for r in exact) == [
        (1, 1),
        (10, 1),
    ]
    # DEFAULT mode (no checkpoint arg): materialize wrote the frontier
    # sidecar beside the rollup, so the exact cutoff is the default and
    # the dropped straggler stays dropped — the r6 gap, closed
    default = hourly_rollup_with_realtime(spark, rollup_dir, raw).collect()
    assert sorted((r["hour_start"].hour, r["n"]) for r in default) == [
        (1, 1),
        (10, 1),
    ]
    # legacy fallback (foreign rollup, no sidecar): cutoff = last bucket
    # end = 02:00, so the dropped straggler transiently surfaces — the
    # documented gap now requires opting INTO
    import glob as _glob

    for f in _glob.glob(os.path.join(rollup_dir, "_frontier*")):
        os.remove(f)
    fallback = hourly_rollup_with_realtime(spark, rollup_dir, raw).collect()
    assert sorted((r["hour_start"].hour, r["n"]) for r in fallback) == [
        (1, 1),
        (5, 1),
        (10, 1),
    ]


def test_watermark_ignores_uncommitted_offsets(spark, tmp_path):
    """offsets/N is written at batch START; an in-flight (uncommitted)
    batch must not advance the realtime cutoff past what the rollup
    parquet actually contains."""
    import json
    from datetime import datetime

    from local_pubchem_db_spark.streaming.events import EVENT_SCHEMA
    from local_pubchem_db_spark.streaming.rollup import (
        _checkpoint_watermark_ms as _checkpoint_watermark,
    )

    flat = tmp_path / "flat"
    flat.mkdir()
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 1, 15), 1, "x", 1.0, "{}"),
         (2, datetime(2024, 1, 1, 10, 0), 1, "x", 1.0, "{}")],
        EVENT_SCHEMA,
    ).coalesce(1).write.parquet(str(flat / "part"))
    # move files up one level for the file stream
    import glob as _g, shutil as _sh
    for i, f in enumerate(_g.glob(str(flat / "part" / "*.parquet"))):
        _sh.copy(f, flat / f"p{i}.parquet")
    rollup_dir, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    materialize_hourly_rollup(spark, str(flat), rollup_dir, ckpt)
    wm_before = _checkpoint_watermark(ckpt)
    assert wm_before is not None

    # simulate an in-flight batch: offsets entry with a FUTURE watermark
    # and no matching commits entry
    offsets = os.path.join(ckpt, "offsets")
    next_b = max(int(f) for f in os.listdir(offsets) if f.isdigit()) + 1
    with open(os.path.join(offsets, str(next_b)), "w") as fh:
        fh.write("v1\n")
        fh.write(json.dumps({"batchWatermarkMs": 2_000_000_000_000}) + "\n")
        fh.write("{}\n")
    assert _checkpoint_watermark(ckpt) == wm_before


def test_frontier_marker_protocol_needs_no_rename(tmp_path, monkeypatch):
    """The sidecar must work where os.replace semantics don't exist
    (object stores): the marker protocol creates files only — prove it
    by making rename explode — the value rides the NAME so torn content
    can't corrupt it, superseded markers are cleaned, and the legacy r7
    _frontier.json is still readable."""
    import os as _os

    from local_pubchem_db_spark.streaming.rollup import (
        _read_frontier,
        _write_frontier,
    )

    def boom(*a, **k):  # any rename-family call = protocol violation
        raise AssertionError("frontier protocol must not rename")

    monkeypatch.setattr(_os, "replace", boom)
    monkeypatch.setattr(_os, "rename", boom)

    d = str(tmp_path / "rollup")
    _write_frontier(d, 1_700_000_000_000)
    assert _read_frontier(d) == 1_700_000_000_000
    _write_frontier(d, 1_700_003_600_000)  # advance: old marker cleaned
    assert _read_frontier(d) == 1_700_003_600_000
    markers = [f for f in _os.listdir(d) if f.startswith("_frontier-")]
    assert len(markers) == 1
    # torn-content marker: value still resolves from the filename
    with open(_os.path.join(d, "_frontier-00001700007200000.json"), "w") as fh:
        fh.write('{"batchWater')  # torn mid-write
    assert _read_frontier(d) == 1_700_007_200_000

    # legacy r7 sidecar (no markers): content read as before
    legacy = str(tmp_path / "old")
    _os.makedirs(legacy)
    with open(_os.path.join(legacy, "_frontier.json"), "w") as fh:
        fh.write('{"batchWatermarkMs": 42000}')
    assert _read_frontier(legacy) == 42000


def test_frontier_write_failure_is_loud(tmp_path):
    """A rollup dir the driver cannot create files in must raise with
    guidance (pass checkpoint_dir), never silently demote default-mode
    readers to the legacy last-bucket cutoff."""
    import os as _os

    import pytest as _pytest

    from local_pubchem_db_spark.streaming.rollup import _write_frontier

    blocker = tmp_path / "blocker"
    blocker.write_text("not a directory")
    d = str(blocker / "rollup")  # creating files here must fail
    with _pytest.raises(RuntimeError, match="checkpoint_dir"):
        _write_frontier(d, 1_700_000_000_000)


def test_frontier_reset_supersedes_stale_high_marker(tmp_path):
    """A checkpoint reset + rebuild produces a LOWER watermark than a
    previous stream lifetime's marker. The current run's marker is
    authoritative: stale HIGHER markers are removed on write, so the
    realtime cutoff can never overshoot the true watermark and hide
    live events."""
    import os as _os

    from local_pubchem_db_spark.streaming.rollup import (
        _read_frontier,
        _write_frontier,
    )

    d = str(tmp_path / "rollup")
    _write_frontier(d, 5_000_000)  # old lifetime, far-ahead watermark
    _write_frontier(d, 2_000_000)  # rebuilt stream, earlier watermark
    assert _read_frontier(d) == 2_000_000
    markers = [f for f in _os.listdir(d) if f.startswith("_frontier-")]
    assert len(markers) == 1


def test_realtime_rollup_composes_with_gap_fill(spark, tmp_path):
    """The dashboard composition: the realtime continuous aggregate
    (which materializes only NON-EMPTY buckets) feeds gap_fill to
    produce the dense series an x-axis needs — empty hours appear as
    explicit zero rows."""
    from datetime import datetime

    from local_pubchem_db_spark.operators.timeseries import gap_fill
    from local_pubchem_db_spark.streaming.events import EVENT_SCHEMA

    flat = tmp_path / "flat"
    flat.mkdir()
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 1, 15), 1, "x", 1.0, "{}"),
         (2, datetime(2024, 1, 1, 1, 45), 1, "x", 2.0, "{}"),
         (3, datetime(2024, 1, 1, 10, 0), 1, "x", 1.0, "{}")],
        EVENT_SCHEMA,
    ).coalesce(1).write.parquet(str(flat / "p"))
    import glob as _g
    import shutil as _sh

    for i, f in enumerate(_g.glob(str(flat / "p" / "*.parquet"))):
        _sh.copy(f, flat / f"s{i}.parquet")
    rollup_dir, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    materialize_hourly_rollup(spark, str(flat), rollup_dir, ckpt)

    raw = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 1, 15), 1, "x", 1.0, "{}"),
         (2, datetime(2024, 1, 1, 1, 45), 1, "x", 2.0, "{}"),
         (3, datetime(2024, 1, 1, 10, 0), 1, "x", 1.0, "{}")],
        EVENT_SCHEMA,
    )
    view = hourly_rollup_with_realtime(spark, rollup_dir, raw)
    dense = gap_fill(
        view, "hour_start", ["event_type"], ["n"], "1 hour", fill="null"
    ).na.fill({"n": 0})
    rows = sorted(
        (r["bucket_start"].hour, int(r["n"]), r["is_gap"])
        for r in dense.collect()
    )
    # hours 1..10 dense: 1 and 10 observed, 2..9 explicit zeros
    assert rows == [(1, 2, False)] + [
        (h, 0, True) for h in range(2, 10)
    ] + [(10, 1, False)]


def test_write_frontier_opt_out_skips_sidecar(
    spark, stream_setup, tmp_path, monkeypatch
):
    """write_frontier=False (ADVICE r8): deployments whose rollup dir
    the driver cannot write through ``os`` — and whose readers pass
    checkpoint_dir — must not fail every cron run on the sidecar. The
    marker writer is patched to explode, proving it is never invoked;
    realtime reads still resolve the exact cutoff via checkpoint_dir."""
    import local_pubchem_db_spark.streaming.rollup as _r

    ev, early, staged = stream_setup
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    rollup_dir, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    _flat_copy([staged / "a"], stream_dir)

    def boom(*a, **k):
        raise AssertionError("sidecar write attempted with opt-out")

    monkeypatch.setattr(_r, "_write_frontier", boom)
    materialize_hourly_rollup(
        spark, str(stream_dir), rollup_dir, ckpt, write_frontier=False
    )
    assert not [
        fn for fn in os.listdir(rollup_dir) if fn.startswith("_frontier")
    ]
    # checkpoint-based cutoff still serves realtime readers
    got = hourly_rollup_with_realtime(
        spark, rollup_dir, early, checkpoint_dir=ckpt
    )
    assert _rows(got) == _rows(hourly_event_counts(early))
