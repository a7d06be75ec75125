import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_pubchem_db_spark.session import get_spark  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        # tiny-fixture tests: createDataFrame over driver lists slices
        # into defaultParallelism (= total cores, 32 here) Python RDD
        # partitions, so every scan of a 10-row fixture schedules 32
        # Python-worker tasks; 8 keeps the suite's per-job cost down
        # without touching the production/bench session defaults
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield spark


@pytest.fixture(scope="module", autouse=True)
def _session_hygiene():
    """Per-module cleanup of the SHARED session (r16 suite-capacity fix):
    tests that exercise ``shared()``-cached operators, ``persist`` or
    streaming leave cached blocks / state behind, and the accumulated
    memory pressure measurably degrades every later test (the same test
    ran 13–22 s standalone vs 43 s late in the full suite). Stopping
    stray streams, dropping every leaked cache entry and nudging the
    driver GC at module boundaries keeps test N's wall independent of
    tests 1..N-1. Runs AFTER each module, so no test's own caching
    behavior is affected."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return
    try:
        for q in s.streams.active:
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — already terminating
                pass
        from local_pubchem_db_spark.operators.util import (
            release_shared_caches,
        )

        release_shared_caches(s)
        s.catalog.clearCache()
        s.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — hygiene is best-effort
        pass


@pytest.fixture(scope="session")
def sdf_dir():
    return os.path.join(FIXTURE_DIR, "sdf")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
