"""End-to-end build_db parity tests.

Goldens from the reference (unittests_utils.py:207-334): 8 compounds,
point lookups, NOT_NULL tightening → 5 rows with specific CIDs skipped,
transform applied end-to-end, incremental manifest behavior.
"""

import os
import shutil

import pytest

from local_pubchem_db_spark.pipeline import PubChemDB, build_db

GOLD_INCHI_31040 = (
    "InChI=1S/C5H6O5.2Na/c6-3(5(9)10)1-2-4(7)8;;/h1-2H2,(H,7,8)(H,9,10);;/q;2*+1/p-2"
)


def make_base(tmp_path, sdf_dir):
    base = tmp_path / "base"
    (base / "sdf").mkdir(parents=True)
    for f in os.listdir(sdf_dir):
        shutil.copy(os.path.join(sdf_dir, f), base / "sdf" / f)
    return str(base)


def specs(xlogp3_not_null=False, xlogp3_create_like=None):
    s = {
        "columns": {
            "cid": {
                "SD_TAG": ["PUBCHEM_COMPOUND_CID"],
                "DTYPE": "integer",
                "NOT_NULL": True,
                "PRIMARY_KEY": True,
            },
            "inchikey": {
                "SD_TAG": ["PUBCHEM_IUPAC_INCHIKEY"],
                "DTYPE": "varchar",
                "NOT_NULL": True,
            },
            "InChI": {
                "SD_TAG": ["PUBCHEM_IUPAC_INCHI"],
                "DTYPE": "varchar",
                "NOT_NULL": True,
            },
            "xlogp3": {
                "SD_TAG": ["PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"],
                "DTYPE": "real",
                "NOT_NULL": xlogp3_not_null,
            },
        }
    }
    if xlogp3_create_like:
        s["columns"]["xlogp3"]["CREATE_LIKE"] = xlogp3_create_like
    return s


def test_db_import(spark, sdf_dir, tmp_path):
    # unittests_utils.py:223-260
    base = make_base(tmp_path, sdf_dir)
    assert build_db(base, use_gzip=True, reset=True, db_specs=specs(), spark=spark) == 0

    db = PubChemDB(spark, base)
    assert db.compounds().count() == 8
    assert (
        db.sql("SELECT inchikey FROM compounds WHERE cid == 34516").collect()[0][0]
        == "SISXGVIKZQKGLA-UHFFFAOYSA-N"
    )
    assert (
        db.sql("SELECT xlogp3 FROM compounds WHERE cid == 31038").collect()[0][0]
        == 6.6
    )
    assert (
        db.sql("SELECT InChI FROM compounds WHERE cid == 31040").collect()[0][0]
        == GOLD_INCHI_31040
    )


def test_db_import_not_null_tightening(spark, sdf_dir, tmp_path):
    # unittests_utils.py:264-277 — 8 → 5 rows; 34516/31040/46774 skipped
    base = make_base(tmp_path, sdf_dir)
    assert (
        build_db(base, use_gzip=True, reset=True,
                 db_specs=specs(xlogp3_not_null=True), spark=spark) == 0
    )
    db = PubChemDB(spark, base)
    assert db.compounds().count() == 5
    cids = {r["cid"] for r in db.compounds().select("cid").collect()}
    assert cids == {31038, 31039, 34517, 34518, 46773}


def test_db_import_with_transform(spark, sdf_dir, tmp_path):
    # unittests_utils.py:279-334 — xlogp3 ** 2 end-to-end
    base = make_base(tmp_path, sdf_dir)
    assert (
        build_db(base, use_gzip=True, reset=True,
                 db_specs=specs(xlogp3_create_like="lambda __x: __x ** 2"),
                 spark=spark) == 0
    )
    db = PubChemDB(spark, base)
    assert db.compounds().count() == 8
    assert db.sql(
        "SELECT xlogp3 FROM compounds WHERE cid == 31038"
    ).collect()[0][0] == pytest.approx(6.6 ** 2)
    assert (
        db.sql("SELECT inchikey FROM compounds WHERE cid == 34516").collect()[0][0]
        == "SISXGVIKZQKGLA-UHFFFAOYSA-N"
    )


def test_manifest_and_incremental_resume(spark, sdf_dir, tmp_path):
    # utils.py:272-282,327-332 — second build ingests nothing new
    base = make_base(tmp_path, sdf_dir)
    assert build_db(base, use_gzip=True, reset=True, db_specs=specs(), spark=spark) == 0
    db = PubChemDB(spark, base)
    manifest = {r["filename"]: r for r in db.sdf_file().collect()}
    assert set(manifest) == {
        "cmps_00_02.sdf.gz", "cmps_03_05.sdf.gz", "cmps_06_07.sdf.gz",
    }
    # lowest/highest parsed from the filename (utils.py:330-331)
    assert manifest["cmps_00_02.sdf.gz"]["lowest_cid"] == 0
    assert manifest["cmps_00_02.sdf.gz"]["highest_cid"] == 2
    assert manifest["cmps_00_02.sdf.gz"]["n_compounds"] == 3
    assert manifest["cmps_06_07.sdf.gz"]["n_compounds"] == 2

    # Re-run without reset: anti-join prunes everything, counts unchanged.
    assert build_db(base, use_gzip=True, reset=False, db_specs=specs(), spark=spark) == 0
    assert db.compounds().count() == 8
    assert db.sdf_file().count() == 3


def test_indexes_built(spark, sdf_dir, tmp_path):
    base = make_base(tmp_path, sdf_dir)
    s = specs()
    s["columns"]["inchikey"]["WITH_INDEX"] = True
    assert build_db(base, use_gzip=True, reset=True, db_specs=s, spark=spark) == 0
    idx_path = os.path.join(base, "db", "idx_inchikey")
    assert os.path.exists(idx_path)
    idx = spark.read.parquet(idx_path)
    assert idx.columns == ["inchikey", "cid"]
    assert idx.count() == 8


def test_strict_cast_fails_on_malformed_int(spark, sdf_dir, tmp_path):
    # Python int("3.3") raises (utils.py:47-48); Spark's default cast would
    # truncate — the engine must fail the build instead (exit code 1,
    # utils.py:343-365).
    base = make_base(tmp_path, sdf_dir)
    bad_specs = {
        "columns": {
            "cid": {
                "SD_TAG": ["PUBCHEM_COMPOUND_CID"],
                "DTYPE": "integer",
                "PRIMARY_KEY": True,
            },
            # exact mass is a float string like "252.245..." — declaring it
            # integer must fail the build, like int("252.245") would.
            "exact_mass": {
                "SD_TAG": ["PUBCHEM_EXACT_MASS"],
                "DTYPE": "integer",
            },
        }
    }
    assert (
        build_db(base, use_gzip=True, reset=True, db_specs=bad_specs, spark=spark)
        == 1
    )


def test_crash_between_data_and_manifest_does_not_duplicate(
    spark, sdf_dir, tmp_path
):
    # The batch twin of tests/test_streaming.py's replay test: a crash
    # AFTER the compounds write but BEFORE the manifest commit leaves data
    # partitions with no manifest rows. The retry must re-select those
    # files and OVERWRITE their ingest_batch partitions — never append
    # duplicates (reference utils.py:322-332 rolls the file back; here the
    # partition is rewritten instead).
    base = make_base(tmp_path, sdf_dir)
    assert build_db(base, use_gzip=True, reset=True, db_specs=specs(), spark=spark) == 0
    db = PubChemDB(spark, base)
    assert db.compounds().count() == 8

    # simulate the crash: the manifest write never happened
    shutil.rmtree(db.manifest_path)
    assert (
        build_db(base, use_gzip=True, reset=False, db_specs=specs(), spark=spark) == 0
    )
    cids = sorted(r["cid"] for r in db.compounds().select("cid").collect())
    assert cids == [31038, 31039, 31040, 34516, 34517, 34518, 46773, 46774]
    assert db.sdf_file().count() == 3

    # and a normal incremental re-run after recovery stays a no-op
    assert (
        build_db(base, use_gzip=True, reset=False, db_specs=specs(), spark=spark) == 0
    )
    assert db.compounds().count() == 8
