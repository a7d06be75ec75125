"""Systematic kill-point fault injection for the staged-swap family
(r14, verdict Next #2).

Every crash-safety defect found in r12/r13 — the in-place model
overwrite, the racing-loaders double-delete, the stale-parent
partition, the save-path codes/model mismatch — was a "kill between
steps X and Y" case nobody had enumerated. This harness enumerates
them: it runs each staged operation (full index save, O(delta) append,
cell split, retrieval append with its termdf merge) aborting
immediately BEFORE every catalog mutation it performs (DDL through
``spark.sql``, ``saveAsTable``, ``insertInto``, orphan-directory
Hadoop deletes), then asserts the load-side invariants after every
kill:

- a live copy of the single-source-of-truth model always exists
  (live table or staged copy — never zero);
- recovery is reachable: either ``load_*`` succeeds directly, or it
  raises the DOCUMENTED refusal whose stated remedy (re-run the save)
  then succeeds;
- recovery is idempotent: a second load agrees with the first and
  performs no further repair that changes the answer;
- the recovered index is self-consistent: ledger == codes truth,
  meta counts == table counts, derived retrieval tables == a
  recomputation over the base tables, no marker left behind;
- totals are atomic at the operation level: the corpus row count is
  the pre-op or the post-op value, never a partial mix (the one
  documented exception: the retrieval append's two base tables
  commit in separate jobs, so a crash between them tears the base
  pair — the derived tables must still be exactly f(base)).

The sweep stops at the first kill index the operation completes
under, so adding a mutation to any staged operation automatically
extends the sweep — no hand-enumerated kill list to rot.

Two honest granularity limits: (a) kills land BETWEEN mutations, not
inside one — a crash inside a single saveAsTable's commit protocol is
not simulated (that is what pushed the meta/stats tables onto staged
swaps: their in-place overwrite had a fatal internal window no
between-step kill could reach); (b) a kill raised inside a best-effort
``except Exception: pass`` cleanup (the orphan hadoop deletes) is
swallowed by design — the op then continues, which models "the
optional cleanup failed" rather than a death at that point, and the
sweep simply proceeds to the next kill index.
"""

from __future__ import annotations

import os
import shutil
import warnings

import numpy as np
import pytest
import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.readwriter import DataFrameWriter

from local_pubchem_db_spark.operators import pq as PQ
from local_pubchem_db_spark.operators import retrieval as R
from local_pubchem_db_spark.operators.clustering import assign_clusters
from local_pubchem_db_spark.operators.pq import pq_encode, pq_fit


# Default-ON marker (r15, VERDICT r14 What's-missing #3): the driver/CI
# full run keeps the sweeps; a builder iterating on one operator runs
# `pytest -m "not crash_sweep"` to stay in the fast loop. Never skip
# them before a commit that touches a staged writer.
pytestmark = pytest.mark.crash_sweep


class InjectedCrash(RuntimeError):
    """The simulated process death — never caught by library code."""


_MUTATING_SQL = ("drop", "alter", "create", "insert", "truncate")


class _KillSwitch:
    def __init__(self, kill_at: int):
        self.kill_at = kill_at
        self.count = 0
        self.fired = False
        self.log: list[str] = []

    def step(self, desc: str) -> None:
        self.count += 1
        self.log.append(desc)
        if self.count == self.kill_at:
            self.fired = True
            raise InjectedCrash(
                f"killed before mutation #{self.count}: {desc}"
            )


def run_with_kill(op, kill_at: int, extra_hooks=()) -> tuple[bool, list[str]]:
    """Run ``op()`` crashing immediately before its ``kill_at``-th
    catalog mutation. Returns (whether the kill fired, mutation log).
    Mutations counted: mutating ``spark.sql`` statements, ``saveAsTable``,
    ``insertInto``, and ``_hadoop_delete`` (orphan cleanup).

    ``extra_hooks`` (r15 — the sweep extended to the path-based staged
    writers, VERDICT r14 What's-missing #2): ``(owner, attr, desc)``
    triples naming additional mutation points to count — e.g.
    ``(DataFrameWriter, "parquet", ...)`` for the shard sink's direct
    parquet writes, or a module function like ``_write_meta``. ``desc``
    may be a string or a callable over the hook's arguments; returning
    None from a callable SKIPS the step (lets a global hook like
    ``os.unlink`` filter to the fixture's own paths)."""
    ks = _KillSwitch(kill_at)
    orig_sql = SparkSession.sql
    orig_save = DataFrameWriter.saveAsTable
    orig_insert = DataFrameWriter.insertInto
    orig_hdel = R._hadoop_delete

    def sql(self, q, *a, **kw):
        if str(q).lstrip().lower().startswith(_MUTATING_SQL):
            ks.step(f"sql: {str(q).strip()[:72]}")
        return orig_sql(self, q, *a, **kw)

    def save(self, name=None, *a, **kw):
        ks.step(f"saveAsTable: {name}")
        return orig_save(self, name, *a, **kw)

    def ins(self, name, *a, **kw):
        ks.step(f"insertInto: {name}")
        return orig_insert(self, name, *a, **kw)

    def hdel(spark_, uri):
        ks.step(f"hadoop_delete: .../{str(uri).rsplit('/', 1)[-1]}")
        return orig_hdel(spark_, uri)

    # Every installation happens INSIDE the try and is recorded in
    # ``patched`` as it lands, so a failure while setting up a later hook
    # (e.g. a misnamed attr raising AttributeError from getattr) cannot
    # leak earlier patches with an armed kill switch into the rest of
    # the pytest session (r15 review finding).
    patched: list[tuple[object, str, object]] = []
    try:
        for owner, attr, fn in (
            (SparkSession, "sql", sql),
            (DataFrameWriter, "saveAsTable", save),
            (DataFrameWriter, "insertInto", ins),
            (R, "_hadoop_delete", hdel),
        ):
            orig_fn = getattr(owner, attr)
            setattr(owner, attr, fn)
            patched.append((owner, attr, orig_fn))
        for owner, attr, desc in extra_hooks:
            orig_fn = getattr(owner, attr)

            def _wrap(orig_fn=orig_fn, desc=desc):
                def wrapper(*a, **kw):
                    label = desc(*a, **kw) if callable(desc) else desc
                    if label is not None:
                        ks.step(label)
                    return orig_fn(*a, **kw)

                return wrapper

            setattr(owner, attr, _wrap())
            patched.append((owner, attr, orig_fn))
        try:
            op()
        except InjectedCrash:
            pass
    finally:
        for owner, attr, orig_fn in reversed(patched):
            setattr(owner, attr, orig_fn)
    return ks.fired, ks.log


def _table_spec(spark, t: str):
    """(cols, partition cols, detailed-info dict) from DESCRIBE EXTENDED."""
    cols, part_cols, info = [], [], {}
    section = "cols"
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect():
        name = (r["col_name"] or "").strip()
        if name.startswith("# Partition"):
            section = "part"
            continue
        if name.startswith("# Detailed"):
            section = "info"
            continue
        if not name or name.startswith("#"):
            continue
        if section == "cols":
            cols.append((name, r["data_type"]))
        elif section == "part":
            part_cols.append(name)
        else:
            info[name] = r["data_type"]
    return cols, part_cols, info


def _loc_path(info: dict) -> str:
    loc = info["Location"]
    return loc[len("file:"):] if loc.startswith("file:") else loc


def _bracket_list(s: str) -> list[str]:
    return [c.strip(" `") for c in (s or "").strip("[]").split(",") if c.strip()]


def _create_ddl(t: str, cols, part_cols, info) -> str:
    ddl = (
        f"CREATE TABLE {t} ("
        + ", ".join(f"`{n}` {d}" for n, d in cols)
        + ") USING parquet"
    )
    if part_cols:
        ddl += " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in part_cols) + ")"
    nb = info.get("Num Buckets")
    if nb and int(nb) > 0:
        ddl += " CLUSTERED BY (" + ", ".join(
            f"`{c}`" for c in _bracket_list(info.get("Bucket Columns", "[]"))
        ) + ")"
        sc = _bracket_list(info.get("Sort Columns", "[]"))
        if sc:
            ddl += " SORTED BY (" + ", ".join(f"`{c}`" for c in sc) + ")"
        ddl += f" INTO {int(nb)} BUCKETS"
    return ddl


class restorable_build:
    """Amortize an expensive pristine-state builder across a sweep's kill
    points (the r16 suite-capacity fix, VERDICT r15 Next #1): the FIRST
    call runs the real ``builder()`` and snapshots the named catalog
    tables (schema + partition/bucket/sort spec via DESCRIBE EXTENDED,
    plus a byte copy of the table location) and directories; every later
    call restores that snapshot — DROP + re-CREATE with the identical
    spec (the table stays MANAGED, so DROP/overwrite/partition-DDL
    semantics inside the swept op are unchanged) + file copy into the
    fresh managed location (+ ``recoverPartitions`` for partitioned
    tables). Pristine state is byte-identical to what the builder
    produced, at file-copy cost (~0.3 s) instead of a full staged-save
    rebuild (~8 s), which is what made the sweeps O(kill_points x
    rebuild) in wall.

    ``pre`` runs before EVERY build/restore (drop staged leftovers the
    previous iteration's kill stranded). The first restore is verified
    row-identical to the as-built state — a fidelity bug in the restore
    fails the test loudly instead of silently weakening the sweep."""

    def __init__(self, spark, snapdir, builder, tables=(), dirs=(), pre=None):
        self.spark = spark
        self.snapdir = str(snapdir)
        self.builder = builder
        self.tables = list(tables)
        self.dirs = [str(d) for d in dirs]
        self.pre = pre
        self.specs: dict | None = None
        self.baseline: dict | None = None
        self.verified = False

    def _snap_table_dir(self, t: str) -> str:
        return os.path.join(self.snapdir, "tables", t)

    def _snapshot(self) -> None:
        os.makedirs(os.path.join(self.snapdir, "tables"), exist_ok=True)
        self.specs = {}
        self.baseline = {}
        for t in self.tables:
            cols, part_cols, info = _table_spec(self.spark, t)
            shutil.copytree(_loc_path(info), self._snap_table_dir(t))
            self.specs[t] = (cols, part_cols, info)
            self.baseline[t] = sorted(
                map(tuple, self.spark.table(t).collect())
            )
        for i, d in enumerate(self.dirs):
            shutil.copytree(d, os.path.join(self.snapdir, f"dir{i}"))

    def _restore(self) -> None:
        for t in self.tables:
            cols, part_cols, info = self.specs[t]
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            self.spark.sql(_create_ddl(t, cols, part_cols, info))
            _c, _p, info2 = _table_spec(self.spark, t)
            lp = _loc_path(info2)
            shutil.rmtree(lp, ignore_errors=True)
            shutil.copytree(self._snap_table_dir(t), lp)
            if part_cols:
                self.spark.catalog.recoverPartitions(t)
            self.spark.catalog.refreshTable(t)
        for i, d in enumerate(self.dirs):
            shutil.rmtree(d, ignore_errors=True)
            shutil.copytree(os.path.join(self.snapdir, f"dir{i}"), d)
            self.spark.catalog.refreshByPath(d)
        if not self.verified:
            for t in self.tables:
                got = sorted(map(tuple, self.spark.table(t).collect()))
                assert got == self.baseline[t], (
                    f"restore infidelity on {t}: the snapshot restore "
                    "does not reproduce the as-built state"
                )
            self.verified = True

    def __call__(self) -> None:
        if self.pre is not None:
            self.pre()
        if self.specs is None:
            self.builder()
            self._snapshot()
        else:
            self._restore()


def sweep_kill_points(build, op, check, max_kills: int = 64, extra_hooks=()) -> int:
    """For kill_at = 1, 2, ...: rebuild pristine state, run ``op`` with
    the kill injected, run ``check`` (which must prove the recovery
    invariants). Stops at the first kill_at the op completes under
    (``check`` runs on the completed state too). Returns the number of
    kill points actually swept."""
    for kill_at in range(1, max_kills + 1):
        build()
        fired, log = run_with_kill(op, kill_at, extra_hooks=extra_hooks)
        try:
            check(crashed=fired)
        except AssertionError as e:  # pragma: no cover — diagnostics
            raise AssertionError(
                f"invariant broken at kill point {kill_at} "
                f"({log[-1] if fired else 'completed'}): {e}"
            ) from e
        if not fired:
            swept = kill_at - 1
            assert swept >= 2, f"suspiciously few mutations: {log}"
            return swept
    pytest.fail(f"operation exceeded {max_kills} mutations")


# --------------------------------------------------------------------
# IVF-PQ family
# --------------------------------------------------------------------

_DIM = 8


def _pq_fixture(spark, seed: int = 3):
    """(enc_rows, enc_schema, centroids, codebooks, protos): a tiny
    3-cell corpus — cell of proto 0 is BIMODAL (so a split separates) —
    materialized driver-side once so every sweep iteration rebuilds the
    identical index cheaply."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((3, _DIM))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    d = rng.standard_normal(_DIM)
    d /= np.linalg.norm(d)
    rows = []
    vid = 0
    for c in range(3):
        per = 20 if c == 0 else 10
        for i in range(per):
            off = (0.2 * d if i % 2 else -0.2 * d) if c == 0 else 0.0
            v = protos[c] + off + 0.02 * rng.standard_normal(_DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = protos.copy()
    assigned = emb.join(
        assign_clusters(emb, centroids).withColumnRenamed("id", "vec_id"),
        "vec_id",
    )
    cb = pq_fit(assigned, m=2, k=4, centroids=centroids)
    enc = pq_encode(assigned, cb, centroids=centroids)
    return enc.collect(), enc.schema, centroids, cb


def _load_quiet(spark, name):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return PQ.load_ivf_pq(spark, name)


def _check_pq_index(spark, name, allowed_totals, rerun=None):
    """The PQ-side load invariants after a kill (or a clean run)."""
    # never zero copies of the model OR of the meta row (both are the
    # only copy of what they hold — centroids/codebooks and the index's
    # self-description respectively)
    assert spark.catalog.tableExists(
        f"{name}_model"
    ) or spark.catalog.tableExists(f"{name}_model__staged"), (
        "no model copy exists"
    )
    assert spark.catalog.tableExists(
        f"{name}_meta"
    ) or spark.catalog.tableExists(f"{name}_meta__staged"), (
        "no meta copy exists"
    )
    try:
        _c, C, _cb, _rot, meta = _load_quiet(spark, name)
    except ValueError as e:
        # only the documented refusal, and only when a remedy is given
        assert "save_ivf_pq" in str(e), f"undocumented refusal: {e}"
        assert rerun is not None, f"refusal with no remedy swept: {e}"
        rerun()
        _c, C, _cb, _rot, meta = _load_quiet(spark, name)
    # idempotent: a second load agrees (and performs no new repair
    # that changes the answer)
    _c2, C2, _cb2, _rot2, meta2 = _load_quiet(spark, name)
    assert meta2["n_vecs"] == meta["n_vecs"]
    assert meta2["n_cells"] == meta["n_cells"] == len(C) == len(C2)
    assert meta.get("split_cell") is None
    assert not meta.get("save_pending")
    total = spark.table(f"{name}_codes").count()
    assert total == meta["n_vecs"], "meta n_vecs != codes count"
    assert total in allowed_totals, (total, allowed_totals)
    truth = {
        int(r["cluster"]): int(r["count"])
        for r in spark.table(f"{name}_codes")
        .groupBy("cluster")
        .count()
        .collect()
    }
    ledger = {
        int(r["cell"]): int(r["n"])
        for r in spark.table(f"{name}_cells").collect()
        if int(r["n"]) > 0
    }
    assert ledger == truth, "cells ledger != codes truth"


_IVF_STATE_TABLES = ("codes", "model", "meta", "cells")


def _ivf_restorable(spark, snapdir, name, builder):
    """The ivf sweeps' shared restorable pristine state: the four live
    index tables snapshot/restored, staged leftovers dropped first."""
    return restorable_build(
        spark,
        snapdir,
        builder,
        tables=[f"{name}_{s}" for s in _IVF_STATE_TABLES],
        pre=lambda: PQ.drop_ivf_pq(spark, name),
    )


def test_sweep_save_ivf_pq_over_existing(spark, tmp_path):
    """Every kill point inside a full save over an existing index: the
    index is either the old state, the new state, or REFUSES with the
    documented re-run remedy (a half-save is unrecoverable by
    construction — the codes overwrite destroys the old state); after
    the remedy it IS the new state. Never a silently mixed index."""
    rows, schema, centroids, cb = _pq_fixture(spark)
    name = "t_sweep_save"
    total = len(rows)

    def enc_df():
        return spark.createDataFrame(rows, schema)

    build = _ivf_restorable(
        spark,
        tmp_path / "snap",
        name,
        lambda: PQ.save_ivf_pq(enc_df(), centroids, cb, name, residual=True),
    )

    def op():
        PQ.save_ivf_pq(enc_df(), centroids, cb, name, residual=True)

    def check(crashed):
        _check_pq_index(spark, name, {total}, rerun=op)

    swept = sweep_kill_points(build, op, check)
    assert swept >= 5  # codes, staged model, drop, rename, cells, meta
    PQ.drop_ivf_pq(spark, name)


def test_sweep_ivf_pq_append(spark, tmp_path):
    """Every kill point inside an O(delta) append: totals are pre- or
    post-append (the insertInto commit is the atom), the consistency
    marker repair recounts, the ledger never drifts from the codes."""
    rows, schema, centroids, cb = _pq_fixture(spark)
    name = "t_sweep_append"
    base_total = len(rows)
    rng = np.random.default_rng(11)
    delta = [
        (
            1_000 + i,
            [
                float(x)
                for x in centroids[1] + 0.02 * rng.standard_normal(_DIM)
            ],
        )
        for i in range(8)
    ]

    build = _ivf_restorable(
        spark,
        tmp_path / "snap",
        name,
        lambda: PQ.save_ivf_pq(
            spark.createDataFrame(rows, schema),
            centroids,
            cb,
            name,
            residual=True,
        ),
    )

    def op():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            PQ.ivf_pq_append(
                spark,
                name,
                spark.createDataFrame(
                    delta, "vec_id long, embedding array<double>"
                ),
            )

    def check(crashed):
        _check_pq_index(
            spark, name, {base_total, base_total + len(delta)}
        )

    sweep_kill_points(build, op, check)
    PQ.drop_ivf_pq(spark, name)


def test_sweep_ivf_pq_split_cell(spark, tmp_path):
    """Every kill point inside a cell split: the corpus total is ALWAYS
    preserved (a split moves rows, never adds or removes), recovery
    either finishes the split from the persisted sub-centroids or
    reverts the marker, and a probe of the split cell still finds its
    own vector."""
    rows, schema, centroids, cb = _pq_fixture(spark)
    name = "t_sweep_split"
    total = len(rows)
    probe_vec = rows[0]["embedding"]

    build = _ivf_restorable(
        spark,
        tmp_path / "snap",
        name,
        lambda: PQ.save_ivf_pq(
            spark.createDataFrame(rows, schema),
            centroids,
            cb,
            name,
            residual=True,
        ),
    )

    def op():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            PQ.ivf_pq_split_cell(spark, name, cell=0, parts=2)

    def check(crashed):
        _check_pq_index(spark, name, {total})
        q = spark.createDataFrame(
            [(9_999, probe_vec)], "vec_id long, embedding array<double>"
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = PQ.ivf_pq_search_persisted(
                spark, name, q, k=1, nprobe=4, rerank=total
            ).collect()
        assert got and got[0]["neighbor_id"] == rows[0]["vec_id"]

    swept = sweep_kill_points(build, op, check)
    assert swept >= 8  # marker, model swap (4), staging, insert, ledger
    PQ.drop_ivf_pq(spark, name)


# --------------------------------------------------------------------
# Retrieval (BM25) index family
# --------------------------------------------------------------------

_BASE_DOCS = [
    (i, f"spark shuffles data across executors batch {i} alpha")
    for i in range(8)
] + [(8, "the quick dog"), (9, "a lazy dog sleeps"), (10, "gamma rays")]
_DELTA_DOCS = [
    (100 + i, f"delta document about joins and dogs number {i}")
    for i in range(5)
]


def _retrieval_truth(spark, name):
    """Recompute the derived relations from the live base tables."""
    postings = spark.table(f"{name}_postings")
    doc_stats = spark.table(f"{name}_docstats")
    tdf = sorted(
        (r["term"], int(r["df"]))
        for r in postings.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    )
    n = doc_stats.count()
    sum_dl = doc_stats.agg(
        F.sum(F.col("dl").cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    return tdf, n, sum_dl


def test_sweep_retrieval_append_termdf_merge(spark, tmp_path):
    """Every kill point inside save_postings(mode='append'), including
    the staged termdf swap: load_index always comes back consistent —
    the derived tables exactly equal a recomputation over the live base
    tables (marker-mismatch repair), the termdf swap never leaves the
    warm path silently degraded, and doc counts are pre- or post-append
    per base table (the two base appends are separate commits — the
    documented tear; derived consistency is the invariant)."""
    from local_pubchem_db_spark.operators.retrieval import (
        build_postings,
        drop_index,
        load_index,
        save_postings,
    )

    name = "t_sweep_ret"
    base = spark.createDataFrame(_BASE_DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(_DELTA_DOCS, "doc_id long, text string")
    nb, nd = len(_BASE_DOCS), len(_DELTA_DOCS)

    def _build_real():
        p0, d0 = build_postings(base)
        save_postings(p0, d0, name, buckets=2)

    build = restorable_build(
        spark,
        tmp_path / "snap",
        _build_real,
        tables=[
            f"{name}_{s}"
            for s in ("postings", "docstats", "termdf", "stats")
        ],
        pre=lambda: drop_index(spark, name),
    )

    def op():
        p1, d1 = build_postings(delta)
        save_postings(p1, d1, name, buckets=2, mode="append")

    def check(crashed):
        # the stats row is staged-swapped (r14): a copy must always
        # exist — it holds the corpus pointer / cost ratio / exact
        # sum_dl the base tables cannot rebuild
        assert spark.catalog.tableExists(
            f"{name}_stats"
        ) or spark.catalog.tableExists(f"{name}_stats__staged"), (
            "no stats copy exists"
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            postings, doc_stats, (n, avgdl), tdf = load_index(spark, name)
        want_tdf, want_n, want_sum = _retrieval_truth(spark, name)
        assert n == want_n
        assert n in {nb, nb + nd}
        pdocs = postings.select("doc_id").distinct().count()
        assert pdocs in {nb, nb + nd}
        if want_n:
            assert avgdl == pytest.approx(float(want_sum) / want_n)
        # the warm path must be intact post-recovery, and exact
        assert tdf is not None, "termdf silently degraded"
        got_tdf = sorted(
            (r["term"], int(r["df"])) for r in tdf.collect()
        )
        assert got_tdf == want_tdf
        # idempotent: a second load changes nothing
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            _p2, _d2, (n2, avgdl2), tdf2 = load_index(spark, name)
        assert (n2, avgdl2) == (n, avgdl) and tdf2 is not None

    swept = sweep_kill_points(build, op, check)
    assert swept >= 6  # 2 base appends, staged drop+write, drop, rename
    from local_pubchem_db_spark.operators.retrieval import drop_index as di

    di(spark, name)


def test_run_with_kill_restores_patches_on_hook_setup_failure():
    """r15 review finding: a failure while INSTALLING a hook (misnamed
    attr -> AttributeError from getattr) must not leak earlier patches
    with an armed kill switch into the rest of the pytest session —
    every subsequent mutating spark.sql/saveAsTable would die with
    InjectedCrash far from the real cause. Installation is recorded
    as it lands and unwound in the finally."""
    orig_sql = SparkSession.sql
    orig_save = DataFrameWriter.saveAsTable
    orig_insert = DataFrameWriter.insertInto
    orig_hdel = R._hadoop_delete

    class Owner:
        pass

    with pytest.raises(AttributeError):
        run_with_kill(
            lambda: None,
            kill_at=999,
            extra_hooks=((Owner, "no_such_attr", "typo"),),
        )

    assert SparkSession.sql is orig_sql
    assert DataFrameWriter.saveAsTable is orig_save
    assert DataFrameWriter.insertInto is orig_insert
    assert R._hadoop_delete is orig_hdel
