"""Physical-design operators: bucketing and skew salting.

The reference's CREATE INDEX (utils.py:334-341) has no Spark equivalent;
the columnar analogs are (a) sorted parquet + min/max stats (see
pipeline.build_indexes), (b) bucketed tables for shuffle-free equi-joins,
(c) salting for skewed keys. (b) and (c) live here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+ sorted) catalog table.

    Two tables bucketed the same way on the join key equi-join WITHOUT a
    shuffle: each bucket pair is joined locally. This is the Spark analog
    of co-located storage — the right physical design for a fact table
    that is repeatedly joined on one key at 100 TB (pay one shuffle at
    write time, none at query time).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.
    With matching bucket specs Catalyst plans a SortMergeJoin with NO
    Exchange on either side (asserted in tests/test_physical.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def salted_group_count(
    df: DataFrame, key_col: str, salt: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed keys: count per (key, random salt)
    first (spreads one hot key over ``salt`` reducers), then re-aggregate
    per key. Same result as a direct groupBy().count(), but the first
    shuffle's largest partition shrinks by ~``salt``x.

    For algebraic aggregates Spark's map-side partial aggregation already
    does this when upstream data is spread across tasks; explicit salting
    is the tool for when the skew arrives ALREADY keyed (e.g. off a join
    on the hot key) — and the pattern generalizes to any two-phase
    decomposable aggregate (sum/min/max/count; avg via sum+count).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(key_col, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(key_col).agg(F.sum("__partial").alias("n"))


def profile_table(df, approx_rsd: float = 0.05):
    """Data-quality profile: one output row per column with row count,
    null count, approximate distinct count (HLL at ``approx_rsd``), and
    min/max computed in the column's native ordering, rendered as strings
    (casting the INPUT would silently turn numeric ranges lexicographic).

    The pre-training sanity gate over a new corpus drop: one aggregation
    pass regardless of column count (all stats fold into a single
    map-side-combinable agg — no per-column jobs, no collect of data
    rows), then a constant-size unpivot of the 1-row result.
    """
    from pyspark.sql import functions as F

    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            F.approx_count_distinct(c, approx_rsd).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("approx_distinct"),
            F.col(f"__min_{c}").alias("min_str"),
            F.col(f"__max_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def interleave_bits(bucket_cols: list, bits: int):
    """Morton (z-order) code from pre-bucketed int columns: bit i of
    column j lands at position ``i * n_cols + j``. Pure long arithmetic
    — whole-stage codegen, no UDF. Inputs must already be in
    [0, 2**bits); see ``write_zordered`` for the equi-depth bucketing
    that gets them there."""
    z = F.lit(0).cast("long")
    d = len(bucket_cols)
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def _heap_order(sorted_vals: list[float]) -> list[float]:
    """Breadth-first (1-based heap) layout of a sorted complete-tree
    cut-point array, so a binary search walks index arithmetic only."""
    m = len(sorted_vals)
    heap = [0.0] * (m + 1)

    def fill(node: int, lo: int, hi: int) -> None:
        if lo >= hi:
            return
        mid = (lo + hi) // 2
        heap[node] = float(sorted_vals[mid])
        fill(2 * node, lo, mid)
        fill(2 * node + 1, mid + 1, hi)

    fill(1, 0, m)
    return heap[1:]


def _equidepth_bucket(col, boundaries: list[float], bits: int):
    """#{boundary <= value}: binary search over the cut points laid out
    in heap order — ``bits`` rounds of element_at + compare, all
    whole-stage codegen. (The obvious F.aggregate over the literal
    array is a higher-order function, which Spark evaluates INTERPRETED
    per element: at bits=8 that is ~255 interpreted ops/row/column and
    measured ~25x slower end-to-end on a 6M-row write.) Nulls land in
    bucket 0 (they sort first, matching parquet stats semantics)."""
    arr = F.array(*[F.lit(x) for x in _heap_order(boundaries)])
    v = col.cast("double")
    idx = F.lit(1)
    for _ in range(bits):
        step = F.element_at(arr, idx)
        idx = idx * 2 + F.when(v >= step, 1).otherwise(0)
    return idx - F.lit(2**bits)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
) -> dict:
    """Write parquet clustered on the z-order (Morton) curve of
    ``zorder_cols`` — multi-dimensional data skipping for tables queried
    by MORE THAN ONE selective column.

    Sorting by (a, b) gives perfect min/max pruning on ``a`` and none on
    ``b``; interleaving the bits of equi-depth bucket ranks gives every
    curve segment (= file / row group) a small rectangle in ALL
    dimensions, so footer min/max stats prune scans on any conjunction
    of the z-ordered columns. This is the layout a 100 TB fact table
    wants when point/range predicates arrive on several keys and you
    can only afford one physical sort order (the columnar answer to the
    reference's multiple secondary indexes, utils.py:334-341).

    Mechanics (two stat passes + one hash shuffle, no UDFs):
    1. equi-depth cut points per column from ``approxQuantile`` at
       2**bits probabilities (driver-side: ``len(cols) * 2**bits``
       doubles — corpus-size independent);
    2. bucket rank per column via a codegen'd binary search over the
       cut points (heap-order literal array + ``bits`` element_at
       probes), bits interleaved into a long (``interleave_bits``) —
       map-only codegen;
    3. DETERMINISTIC file routing: ``n_files - 1`` equi-depth cut
       points of the z value itself (second ``approxQuantile`` pass),
       a codegen'd binary search turns z into a file ordinal, and a
       driver-computed hash-slot bijection maps each ordinal to a
       value whose murmur3 hash lands in exactly that shuffle
       partition — so ``repartition(n_files, route)`` places each z
       range in its own file. ``repartitionByRange`` would plan the
       same shape but draws its range boundaries from an UNSEEDED
       per-run sample (RangePartitioner.sketch), so file boundaries —
       and the footer min/max spans every pruning measurement rests
       on — wiggled between runs (r7 flake); the quantile sketch is a
       full-data pass at 0.001 accuracy, stable run to run.

    Skew: equi-depth ranks make the z distribution near-uniform even
    for skewed inputs, and the z-quantile routing splits whatever
    residual mass correlation concentrates. Numeric, timestamp, and
    date columns are supported (time dims rank by epoch seconds).
    Returns the sizing decision for observability.

    Measured (40k rows, 200x200 decorrelated grid, 16 files, bits=6):
    a 5% x 5% box on both dims overlaps 3/16 row groups z-ordered vs
    16/16 hash-scattered — 5.3x fewer row groups scanned; pinned in
    tests/test_zorder.py. At 6M lineitem rows (64 files, bits=8,
    2 z-cols): write 48.8s vs 9.6s for a plain repartition write — the
    one-time layout premium — and the same box overlaps 4/64 row groups
    vs 64/64 (16x scan cut on every future two-column query); a
    box-filter aggregate over the warm data runs 1.9x faster (0.27s vs
    0.52s — decode avoidance only; with cold I/O at cluster scale the
    16x byte cut is the operative number).
    """
    if not zorder_cols or len(zorder_cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (sort handles 1)")
    if not 1 <= bits <= 20:
        raise ValueError("bits must be in [1, 20]")
    if len(zorder_cols) * bits > 63:
        # bit i of column j lands at position i*d+j; past 63 the JVM
        # shift wraps mod 64 (and 63 itself is the sign bit), silently
        # corrupting the Morton order
        raise ValueError(
            f"{len(zorder_cols)} columns x {bits} bits = "
            f"{len(zorder_cols) * bits} z-bits; must be <= 63 "
            "(lower bits or drop a column)"
        )
    # timestamp/date dims (the canonical z-order use: time x key) rank
    # by their epoch seconds; everything else must cast to double
    dtypes = dict(df.dtypes)
    rank_exprs = []
    has_ts = False
    for c in zorder_cols:
        if c not in dtypes:
            raise ValueError(f"unknown z-order column {c!r}")
        if dtypes[c] in ("timestamp", "timestamp_ntz", "date"):
            # dates encode INT32 (stats fine); any timestamp col keeps
            # the INT96 guard armed regardless of later columns
            has_ts = has_ts or dtypes[c] != "date"
            rank_exprs.append(F.col(c).cast("timestamp").cast("double"))
        else:
            rank_exprs.append(F.col(c).cast("double"))
    if has_ts:
        out_type = df.sparkSession.conf.get(
            "spark.sql.parquet.outputTimestampType", "INT96"
        )
        if out_type == "INT96":
            # INT96 row groups carry no statistics at all — the layout
            # would cluster perfectly and prune nothing
            raise ValueError(
                "timestamp z-order column would be written as INT96, "
                "which has no parquet min/max stats; set "
                "spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS "
                "(the get_spark default) on the session"
            )
    probs = [i / 2**bits for i in range(1, 2**bits)]
    qcols = [f"__zq{i}" for i in range(len(zorder_cols))]
    quantiles = df.select(
        *[e.alias(q) for e, q in zip(rank_exprs, qcols)]
    ).approxQuantile(qcols, probs, 0.001)
    buckets = [
        _equidepth_bucket(e, qs, bits)
        for e, qs in zip(rank_exprs, quantiles)
    ]
    z = interleave_bits(buckets, bits)
    zdf = df.withColumn("__z", z)
    zcuts = (
        zdf.approxQuantile(
            "__z", [i / n_files for i in range(1, n_files)], 0.001
        )
        if n_files > 1
        else []
    )
    if zcuts:
        routed = zdf.withColumn(
            "__route", _deterministic_route(df.sparkSession, zcuts, n_files)
        ).repartition(n_files, "__route")
    else:  # single file, or empty input (approxQuantile returns [])
        routed = zdf.withColumn("__route", F.lit(0)).repartition(1)
    (
        routed.sortWithinPartitions("__z")
        .drop("__z", "__route")
        .write.mode(mode)
        .parquet(path)
    )
    return {"n_files": n_files, "bits": bits, "cols": list(zorder_cols)}


def _deterministic_route(spark, zcuts: list[float], n_files: int):
    """long column routing each z to its equi-depth file: ordinal =
    #{z-cut <= z} via the codegen'd heap binary search (cuts padded to
    the next complete tree by repeating the max cut — every z past it
    counts ALL pads, so ``least(ordinal, n_files - 1)`` folds the
    padded ordinals back onto the last file), then a hash-slot value
    per ordinal chosen so ``pmod(murmur3, n_files)`` — what
    ``repartition(n, col)`` computes — is the IDENTITY on ordinals:
    each file holds one contiguous z range, deterministically."""
    r = len(zcuts)  # n_files - 1 real cuts
    levels = max(1, r.bit_length())  # smallest L with 2^L - 1 >= r
    padded = sorted(zcuts) + [max(zcuts)] * (2**levels - 1 - r)
    ordinal = F.least(
        _equidepth_bucket(F.col("__z"), padded, levels), F.lit(r)
    )
    slot_vals = _hash_slot_values(spark, n_files)
    return F.element_at(
        F.array(*[F.lit(int(v)).cast("long") for v in slot_vals]),
        ordinal + F.lit(1),
    )


def _hash_slot_values(spark, n: int) -> list[int]:
    """One long per shuffle slot i with ``pmod(hash(v), n) == i`` —
    hash computed by Spark itself (murmur3, seed 42, LONG input: the
    exact function HashPartitioning applies), so the mapping can never
    drift from the engine. Tiny driver-side job: 64*n candidate ids
    virtually always cover all n slots in one batch (miss probability
    ~ n * e^-64 per batch)."""
    slots: dict[int, int] = {}
    start = 0
    while len(slots) < n:
        for row in (
            spark.range(start, start + 64 * n)
            .select("id", F.pmod(F.hash("id"), F.lit(n)).alias("s"))
            .collect()
        ):
            slots.setdefault(row["s"], row["id"])
        start += 64 * n
    return [slots[i] for i in range(n)]


# Hadoop-ecosystem URI schemes that name the SAME object store under a
# scheme pyarrow's filesystem layer does understand: rewrite instead of
# failing (s3a/s3n are Hadoop's S3 connectors; the objects are plain S3).
_SCHEME_REWRITES = {"s3a": "s3", "s3n": "s3"}


def _pyarrow_uri(path: str) -> str:
    """Rewrite Hadoop-only URI schemes to their pyarrow-resolvable twin
    (``s3a://`` / ``s3n://`` -> ``s3://``); everything else unchanged."""
    scheme, sep, rest = path.partition("://")
    if sep and scheme.lower() in _SCHEME_REWRITES:
        return f"{_SCHEME_REWRITES[scheme.lower()]}://{rest}"
    return path


# Largest listing the AUTOMATIC driver-side JVM footer fallback will
# accept: past this, serial py4j parsing is a silent multi-hour loop
# (ADVICE r11), so table_health refuses with guidance instead. An
# EXPLICITLY passed driver-only open_file is never capped — the caller
# chose the serial shape knowingly.
_DRIVER_PARSE_CAP = 4096


def _classify_footer_scheme(path: str) -> tuple[str, str] | None:
    """Plan-time probe of pyarrow's filesystem resolution for the
    footer reads (r10; softened + classified r11, ADVICE r10):
    ``None`` when pyarrow resolves the scheme (or the path is local);
    ``("categorical", err)`` when pyarrow HAS NO filesystem for the
    scheme (ArrowInvalid — wasbs://, abfss://, ...: every executor
    would fail identically); ``("environmental", err)`` when resolution
    failed for a reason that can be driver-local — missing credentials
    or network reach for s3://, libhdfs absent on the DRIVER but maybe
    present on executors. Callers escalate categorical failures (after
    trying the JVM fallback) and merely warn on environmental ones —
    the r10 hard error here failed table_health calls whose
    executor-side reads would have succeeded."""
    probe = _pyarrow_uri(path)
    scheme, sep, _ = probe.partition("://")
    if not sep or scheme.lower() == "file":
        return None  # plain/driver-local path: pyarrow opens it directly
    # the exception class must be bound BEFORE the probe try: if this
    # import itself failed inside it, evaluating `except _ArrowInvalid`
    # would raise NameError and mask the real error (r11 review finding)
    try:
        import pyarrow.fs as _pafs
        from pyarrow.lib import ArrowInvalid as _ArrowInvalid
        from pyarrow.lib import (
            ArrowNotImplementedError as _ArrowNotImpl,
        )
    except Exception as err:  # noqa: BLE001 — pyarrow broken on driver
        return ("environmental", f"pyarrow unavailable on driver: {err}")
    try:
        _pafs.FileSystem.from_uri(probe)
        return None
    except (_ArrowInvalid, _ArrowNotImpl) as err:
        # ArrowNotImplementedError ("compiled without S3 support") is a
        # BUILD property — identical on every executor running the same
        # wheel, so it is categorical, not environmental (r11 review)
        return ("categorical", str(err))
    except Exception as err:  # noqa: BLE001 — creds/network/libhdfs
        return ("environmental", str(err))


class _JvmSeekableReader:
    """Seekable binary file-like over a Hadoop ``FSDataInputStream`` —
    byte transfers ride commons-io's ``toByteArray`` so py4j hands back
    real ``bytes`` (element-wise java array access would be O(n) py4j
    round trips). Driver-only: holds py4j handles."""

    def __init__(self, jvm, stream, size: int):
        self._jvm = jvm
        self._stream = stream
        self._size = int(size)
        self._pos = 0
        self.closed = False

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            self._pos = self._size + offset
        self._pos = max(0, min(self._pos, self._size))
        return self._pos

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._size

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        self._stream.seek(self._pos)
        data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
            self._stream, n
        )
        self._pos += len(data)
        return bytes(data)

    def flush(self) -> None:
        pass

    def close(self) -> None:
        if not self.closed:
            self._stream.close()
            self.closed = True


class _JvmOpenFile:
    """``open_file`` built on the JVM's own Hadoop ``FileSystem`` — the
    default fallback for schemes Spark resolves natively but pyarrow
    cannot (``hdfs://`` without libhdfs; r11, verdict Next #6). NOT
    picklable (py4j handles), so it is tagged ``_driver_only`` and
    ``table_health`` parses footers ON THE DRIVER when it's in play —
    serial KB-scale footer fetches, the honest fallback shape (fine for
    thousands of files; for 100k-file tables install libhdfs on
    executors or pass a picklable fsspec opener instead)."""

    _driver_only = True

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def __call__(self, path: str):
        jvm = self._jvm
        juri = jvm.java.net.URI(path)
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(juri, self._conf)
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        size = fs.getFileStatus(jpath).getLen()
        return _JvmSeekableReader(jvm, fs.open(jpath), size)


def make_jvm_open_file(spark: SparkSession) -> _JvmOpenFile:
    """A driver-side ``open_file`` over the JVM Hadoop FileSystem — for
    any scheme the Spark session itself can read (``hdfs://``, mounted
    ``viewfs://``, ...). ``table_health`` also reaches for this
    automatically when pyarrow cannot resolve a scheme the JVM can."""
    return _JvmOpenFile(spark)


def _spark_list_parquet(
    spark: SparkSession, path: str
) -> list[tuple[str, int]]:
    """List a table's parquet files THROUGH Spark (binaryFile source,
    recursive, metadata columns only — content is pruned, nothing is
    read) — for layouts the driver has no POSIX view of (object
    stores). Returns (URI, length) pairs as Spark reports them; the
    length rides along so non-POSIX schemes never need a stat call."""
    rows = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "length")
        .collect()
    )
    return sorted((r["path"], r["length"]) for r in rows)


def table_health(
    spark: SparkSession,
    path: str,
    stats_cols: list[str] | None = None,
    files: list[str | tuple[str, int]] | None = None,
    listing: str = "auto",
    open_file=None,
) -> DataFrame:
    """One row per parquet file: physical-layout health of a table the
    engine wrote — the observability side of ``write_compacted`` /
    ``write_zordered`` / the shard sink's compaction threshold.

    Columns: ``file, bytes, rows, n_row_groups`` plus, for each
    requested stats column (numeric), ``<c>_has_stats`` (min/max
    present in every row group — False means no pruning ever, e.g.
    INT96 timestamps) and ``<c>_min`` / ``<c>_max`` (the file's span).
    Feed the result to ``span_amplification`` for the one-number
    clustering verdict per column. Read it to answer "are my files
    sized right, and will my predicates actually prune?" without
    scanning any data.

    Stats columns may be numeric, timestamp, or date (time stats report
    epoch seconds); other types report ``has_stats`` with null spans.

    Scale shape: the file LIST is metadata only (recursive, so
    ``partitionBy`` layouts work); footer reads are distributed — one
    Arrow task batch per group of paths, each reading only the parquet
    footer (KBs per file, never row data). 100k files => 100k footer
    reads spread over the cluster, output 100k small rows.

    Listing modes: ``auto`` (default) walks the driver filesystem for
    plain local paths — the zero-Spark-jobs fast path — and falls back
    to listing THROUGH Spark (``binaryFile`` metadata scan) for URIs or
    paths the driver cannot see; ``driver`` / ``spark`` force one side.
    An explicit ``files`` list always wins (the object-store escape
    hatch when the table layout is known upstream) — entries may be
    plain paths or ``(path, size)`` pairs; sizes from the Spark listing
    ride along so non-POSIX schemes never pay a driver stat. Footers
    are opened on executors with pyarrow, which resolves local paths
    and ``file:``/cloud URIs it has a filesystem for. Hadoop's S3
    connector schemes are rewritten automatically (``s3a://`` /
    ``s3n://`` -> ``s3://`` — same objects, pyarrow's scheme). For
    schemes pyarrow cannot resolve on the driver, the plan-time probe
    TRIAGES (r11; the r10 hard error also failed calls whose executor
    reads would have succeeded — ADVICE r10): if the JVM's own Hadoop
    FileSystem can open the files (``hdfs://`` without libhdfs — Spark
    reads it natively), footers are parsed ON THE DRIVER through
    ``make_jvm_open_file`` automatically, with a warning; if the
    failure looks environmental (missing driver credentials/network
    for ``s3://``) and the JVM has no route either, the call warns and
    proceeds — executors may hold what the driver lacks; only a scheme
    pyarrow categorically lacks AND the JVM cannot resolve fails at
    plan time with guidance. To route footer reads yourself (and keep
    them distributed), pass ``open_file``, a picklable callable
    ``(path) -> seekable binary file-like`` (e.g. an s3fs/boto3 opener
    closed over credentials), invoked ON EXECUTORS with each listed
    path — the footer read then goes through the caller's filesystem
    while the listing still comes from Spark. With ``open_file`` set,
    byte sizes come from the listing or the handle itself, never a
    POSIX stat.
    """
    import os as _os
    import warnings as _warnings

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if listing not in ("auto", "driver", "spark"):
        raise ValueError(f"listing must be auto|driver|spark, got {listing}")
    stats_cols = list(stats_cols or [])
    sized: list[tuple[str, int | None]] | None = None
    if files is not None:
        # caller-supplied list: plain paths or (path, size) pairs
        sized = [
            (f, None) if isinstance(f, str) else (f[0], int(f[1]))
            for f in files
        ]
    if sized is None and listing != "spark":
        sized = [
            (p, None)
            for p in sorted(
                _os.path.join(root, fn)
                for root, _dirs, fns in _os.walk(path)
                for fn in fns
                if fn.endswith(".parquet")
            )
        ] or None
        if sized is None and listing == "driver":
            raise ValueError(f"no parquet files under {path}")
    if sized is None and listing != "driver":
        sized = _spark_list_parquet(spark, path)
    if not sized:
        raise ValueError(f"no parquet files under {path}")
    if open_file is None:
        # plan-time scheme triage (r11): pyarrow-resolvable -> the
        # distributed executor path below; pyarrow-unresolvable but
        # JVM-resolvable (hdfs:// without libhdfs) -> the built-in JVM
        # opener, footers parsed driver-side; categorically-unknown
        # scheme everywhere -> one actionable error; environmental
        # driver failure (no creds/network HERE) with no JVM route ->
        # warn and proceed, executors may well succeed (ADVICE r10).
        issue = _classify_footer_scheme(sized[0][0])
        if issue is not None:
            kind, perr = issue
            # which environmental failures get the JVM fallback: only
            # schemes Spark reads NATIVELY (Hadoop core) — hdfs without
            # libhdfs is the fallback's reason to exist. Cloud-store
            # schemes (s3://, gs://, ...) whose driver probe failed on
            # credentials/network must instead warn-and-proceed to the
            # distributed executor path: executors may hold what the
            # driver lacks, and routing a 100k-file listing through
            # serial driver-side py4j reads would be a perf cliff
            # (r11 review finding). Categorical failures (pyarrow has
            # no filesystem for the scheme anywhere) always try the JVM.
            scheme = sized[0][0].partition("://")[0].lower()
            jvm_eligible = kind == "categorical" or scheme in (
                "hdfs", "viewfs", "webhdfs", "har", "file",
            )
            # the automatic JVM fallback parses footers SERIALLY on the
            # driver (py4j) — fine for thousands of files, a multi-hour
            # silent loop for 100k (ADVICE r11). Past the cap, refuse
            # with guidance instead of committing; an EXPLICITLY passed
            # driver-only open_file stays honored (the caller opted
            # into the serial shape knowingly). The check sits BEFORE
            # the try: raised inside it, the except below swallowed it
            # for environmental hdfs-like failures and converted the
            # refusal into a misleading credentials warning (ADVICE
            # r12) — the guidance must surface on every eligible route.
            if jvm_eligible and len(sized) > _DRIVER_PARSE_CAP:
                raise ValueError(
                    f"listing has {len(sized)} files — too many for "
                    "the serial driver-side JVM fallback "
                    f"(cap {_DRIVER_PARSE_CAP}; original driver "
                    f"failure: {perr}). Options: (a) pass "
                    "open_file=<picklable (path) -> seekable binary "
                    "handle> built on a reachable client — it runs "
                    "distributed on executors; (b) install pyarrow's "
                    "filesystem for this scheme on the driver; (c) "
                    "split the listing and call table_health per "
                    "shard."
                )
            try:
                if not jvm_eligible:
                    raise OSError(
                        "environmental failure on a non-Hadoop-native "
                        "scheme: executors get first try"
                    )
                jvm_opener = _JvmOpenFile(spark)
                jvm_opener(sized[0][0]).close()  # resolve+open probe
                open_file = jvm_opener
                _warnings.warn(
                    "table_health: pyarrow cannot resolve this URI "
                    f"scheme on the driver ({perr}); falling back to the "
                    "JVM Hadoop FileSystem with DRIVER-side footer "
                    f"parsing of {len(sized)} files, serially. For "
                    "large listings, install pyarrow's filesystem for "
                    "this scheme on executors or pass a picklable "
                    "open_file.",
                    stacklevel=2,
                )
            except Exception as jerr:  # noqa: BLE001 — no JVM route
                if kind == "categorical":
                    scheme = sized[0][0].partition("://")[0]
                    raise ValueError(
                        f"table_health cannot open footers under "
                        f"{scheme}:// — pyarrow has no filesystem for "
                        f"this scheme ({perr}) and the JVM Hadoop "
                        f"fallback failed too ({jerr}). Options: (a) "
                        "pass open_file=<picklable (path) -> seekable "
                        "binary handle> built on a reachable client "
                        "(s3fs/fsspec/boto3) — it runs on executors "
                        "with each listed URI; (b) for S3-compatible "
                        "stores, s3a://(s3n://) is rewritten to s3:// "
                        "automatically — ensure pyarrow's S3 support + "
                        "credentials are present on executors."
                    ) from None
                _warnings.warn(
                    "table_health: driver-side filesystem resolution "
                    f"failed ({perr}) — proceeding anyway; executors "
                    "may hold the credentials/network this probe "
                    "lacks. If tasks fail with the same error, pass "
                    "open_file= or fix executor-side pyarrow setup.",
                    stacklevel=2,
                )
    fields = [
        StructField("file", StringType()),
        StructField("bytes", LongType()),
        StructField("rows", LongType()),
        StructField("n_row_groups", LongType()),
    ]
    for c in stats_cols:
        fields.append(StructField(f"{c}_has_stats", BooleanType()))
        fields.append(StructField(f"{c}_min", DoubleType()))
        fields.append(StructField(f"{c}_max", DoubleType()))
    schema = StructType(fields)

    col_names = [f.name for f in fields]

    def read_footers(batches):
        import pandas as _pd

        for b in batches:
            out = [
                _footer_row(f, size, stats_cols, open_file)
                for f, size in zip(b["file"], b["size"])
            ]
            yield _pd.DataFrame(out, columns=col_names)

    if getattr(open_file, "_driver_only", False):
        # driver-parse path: the opener holds py4j handles and cannot
        # ship to Python workers — serial KB-scale footer fetches on
        # the driver, then one small local relation (see _JvmOpenFile)
        import pandas as _pd

        rows = [_footer_row(f, size, stats_cols, open_file) for f, size in sized]
        return spark.createDataFrame(
            _pd.DataFrame(rows, columns=col_names), schema
        )

    from local_pubchem_db_spark.operators.util import driver_rows_df

    paths_df = driver_rows_df(
        spark, sized, "file string, size long"
    ).repartition(min(len(sized), 64))
    return paths_df.mapInPandas(read_footers, schema)


def _footer_row(f: str, size, stats_cols: list[str], open_file) -> dict:
    """One ``table_health`` output row from one parquet footer —
    shared by the distributed (mapInPandas) and driver-parse paths."""
    import datetime as _dt
    import os as _os
    from urllib.parse import unquote, urlparse

    import pandas as _pd
    import pyarrow.parquet as _papq

    def as_double(v):
        # timestamp/date stats -> epoch seconds; strings/bytes have
        # no meaningful numeric span
        if isinstance(v, _dt.datetime):
            return v.replace(tzinfo=v.tzinfo or _dt.timezone.utc).timestamp()
        if isinstance(v, _dt.date):
            return float(
                _dt.datetime(
                    v.year, v.month, v.day, tzinfo=_dt.timezone.utc
                ).timestamp()
            )
        if isinstance(v, (int, float)):
            return float(v)
        return None

    # Spark listings hand back file: URIs; pyarrow + getsize
    # want plain paths for the local scheme. Non-local URIs
    # pass through to pyarrow's own filesystem resolution,
    # and their size comes from the listing — never a POSIX
    # stat call.
    local = (
        unquote(urlparse(f).path) if f.startswith("file:") else _pyarrow_uri(f)
    )
    # Only the footer METADATA is consumed, and FileMetaData
    # is fully materialized in memory — so every handle is
    # closed before the row is built. Leaving them to task
    # end leaks one fd/connection per listed file (ADVICE
    # r8), which on partitions scanning thousands of files
    # can exhaust executor fds.
    fh = None
    if open_file is not None:
        fh = open_file(f)
        if size is None or _pd.isna(size):
            fh.seek(0, 2)
            size = fh.tell()
            fh.seek(0)
        pf = _papq.ParquetFile(fh)
    else:
        pf = _papq.ParquetFile(local)
    try:
        md = pf.metadata
    finally:
        pf.close()
        if fh is not None and hasattr(fh, "close"):
            try:
                fh.close()
            except Exception:
                pass
    # Map stats columns by parquet LEAF path, not arrow
    # top-level position: row-group column indices run over
    # flattened leaves, so with a struct/map column ahead of
    # a stats column the positional map silently reads the
    # wrong physical column (ADVICE r6). Top-level primitive
    # columns have path == name; struct leaves are dotted
    # paths and correctly report no single-column stats.
    pq_schema = md.schema
    leaves = {pq_schema.column(j).path: j for j in range(len(pq_schema))}
    row = {
        "file": _os.path.basename(local),
        "bytes": (
            int(size)
            if size is not None and not _pd.isna(size)
            else _os.path.getsize(local)
        ),
        "rows": md.num_rows,
        "n_row_groups": md.num_row_groups,
    }
    for c in stats_cols:
        spans = []
        # partition columns live in directory names, not the
        # data files: no per-file stats to report
        ok = c in leaves
        for rg in range(md.num_row_groups) if ok else ():
            st = md.row_group(rg).column(leaves[c]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            spans.append((as_double(st.min), as_double(st.max)))
        # bool(spans): a schema-only file (0 row groups, an
        # empty write) has nothing to aggregate
        ok_num = (
            ok
            and bool(spans)
            and all(lo is not None and hi is not None for lo, hi in spans)
        )
        row[f"{c}_has_stats"] = ok
        row[f"{c}_min"] = min(s[0] for s in spans) if ok_num else None
        row[f"{c}_max"] = max(s[1] for s in spans) if ok_num else None
    return row


def span_amplification(health: DataFrame, col: str) -> float:
    """Clustering verdict from a ``table_health`` frame:
    ``sum(per-file span) / global span`` for ``col``. 1.0 = files
    partition the value range cleanly (every range predicate prunes to
    ~its selectivity); ~n_files = every file spans the whole range
    (stats prune nothing). One aggregate over the tiny health relation;
    NaN if the column has no stats anywhere or zero global range."""
    row = health.agg(
        F.sum(F.col(f"{col}_max") - F.col(f"{col}_min")).alias("s"),
        (F.max(f"{col}_max") - F.min(f"{col}_min")).alias("g"),
    ).first()
    if row["s"] is None or not row["g"]:
        return float("nan")
    return float(row["s"] / row["g"])


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_mb: float = 256.0,
    sample_rows: int = 2048,
    mode: str = "overwrite",
) -> dict:
    """Write parquet with files sized near ``target_file_mb`` — the
    small-files guard for pipeline sinks.

    A 100 TB table written with the shuffle's partitioning inherits the
    shuffle's row distribution: thousands of KB-scale files (metadata
    pressure, open-cost-bound readers) or a few multi-GB ones (no read
    parallelism). This sizes output deterministically instead:

    1. measure compressed bytes/row by encoding a ``sample_rows`` head
       sample to an in-memory parquet buffer (same codec family as the
       write — a real measurement, not a plan-stats guess; head bias is
       acceptable for sizing, it only moves file counts a few percent),
    2. rows-per-file = target_bytes / bytes-per-row, file count =
       ceil(rowcount / rows-per-file),
    3. one round-robin repartition to the file count plus
       ``maxRecordsPerFile`` as the hard cap (repartition balances,
       the option bounds stragglers).

    Costs one extra count() scan and one shuffle — the price of sized
    output. Returns the sizing decision for observability.
    """
    import io
    import math

    import pyarrow as pa
    import pyarrow.parquet as papq

    n_rows = df.count()
    if n_rows == 0:
        df.write.mode(mode).parquet(path)
        return {"rows": 0, "files": 0, "rows_per_file": 0}
    head = df.limit(min(sample_rows, n_rows)).toPandas()
    buf = io.BytesIO()
    papq.write_table(pa.Table.from_pandas(head), buf, compression="snappy")
    bytes_per_row = max(buf.getbuffer().nbytes / len(head), 1e-6)
    rows_per_file = max(int(target_file_mb * 1024 * 1024 / bytes_per_row), 1)
    n_files = math.ceil(n_rows / rows_per_file)
    (
        df.repartition(n_files)
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
    return {"rows": n_rows, "files": n_files, "rows_per_file": rows_per_file}
