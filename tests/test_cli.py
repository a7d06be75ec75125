"""CLI parity (reference build_pubchem_db.py:32-54), the shipped default
layout, and the A17 per-file logging shape."""

import json
import os
import re
import shutil

import pytest

from local_pubchem_db_spark.cli import DEFAULT_LAYOUT, main
from local_pubchem_db_spark.pipeline import PubChemDB, build_db


def make_base(tmp_path, sdf_dir):
    base = tmp_path / "base"
    (base / "sdf").mkdir(parents=True)
    for f in os.listdir(sdf_dir):
        shutil.copy(os.path.join(sdf_dir, f), base / "sdf" / f)
    return str(base)


def test_cli_default_layout_end_to_end(spark, sdf_dir, tmp_path):
    # The shipped default_db_layout.json is the reference's 10-column
    # layout with line 22's invalid "lambda: __x: ..." corrected; all its
    # NOT_NULL tags exist in the 8-compound fixtures.
    base = make_base(tmp_path, sdf_dir)
    assert main([base, "--gzip", "--reset"]) == 0

    db = PubChemDB(spark, base)
    assert db.compounds().count() == 8
    row = db.sql(
        "SELECT InChIKey, InChIKey_1 FROM compounds WHERE cid == 34516"
    ).collect()[0]
    assert row["InChIKey"] == "SISXGVIKZQKGLA-UHFFFAOYSA-N"
    # the corrected CREATE_LIKE: first dash-separated InChIKey block
    assert row["InChIKey_1"] == "SISXGVIKZQKGLA"
    # WITH_INDEX columns got covering projections
    for col in ("InChIKey", "InChIKey_1", "exact_mass", "molecular_formula"):
        assert os.path.exists(os.path.join(base, "db", f"idx_{col}"))


def test_cli_custom_layout_reproduces_goldens(spark, sdf_dir, tmp_path):
    # unittests_utils.py:264-277 shape via the CLI: NOT_NULL xlogp3
    # tightens 8 -> 5 rows (34516/31040/46774 have no xlogp3 tag).
    base = make_base(tmp_path, sdf_dir)
    layout = json.load(open(DEFAULT_LAYOUT))
    layout["columns"]["xlogp3"]["NOT_NULL"] = True
    layout_fn = str(tmp_path / "layout.json")
    json.dump(layout, open(layout_fn, "w"))

    assert main([base, "--gzip", "--reset", "--db_layout_fn", layout_fn]) == 0
    db = PubChemDB(spark, base)
    cids = {r["cid"] for r in db.compounds().select("cid").collect()}
    assert cids == {31038, 31039, 34517, 34518, 46773}


def test_cli_bad_layout_exits_nonzero(tmp_path, sdf_dir):
    base = make_base(tmp_path, sdf_dir)
    layout_fn = str(tmp_path / "bad_layout.json")
    json.dump({"columns": {"cid": {"SD_TAG": ["X"], "DTYPE": "no_such_type"}}},
              open(layout_fn, "w"))
    assert main([base, "--gzip", "--db_layout_fn", layout_fn]) == 1


def test_per_file_log_shape(spark, sdf_dir, tmp_path, capsys):
    # A17 parity (utils.py:319,324,134,162-163): per-file progress +
    # row-count lines, then the batch wall time.
    base = make_base(tmp_path, sdf_dir)
    specs = json.load(open(DEFAULT_LAYOUT))
    assert build_db(base, use_gzip=True, reset=True, db_specs=specs,
                    spark=spark) == 0
    out = capsys.readouterr().out
    assert "Sdf-files to process (before filtering): 3" in out
    assert re.search(
        r"Processed sdf-file: cmps_00_02\.sdf\.gz \(1/3\): 3 compounds", out
    )
    assert re.search(
        r"Processed sdf-file: cmps_06_07\.sdf\.gz \(3/3\): 2 compounds", out
    )
    assert re.search(
        r"Extraction and insertion of the information took \d+\.\d{3}sec", out
    )


def test_minhash_bands_must_divide_num_perm():
    from local_pubchem_db_spark.functions.hashing import minhash_band_udf

    with pytest.raises(ValueError, match="bands must divide num_perm"):
        minhash_band_udf(num_perm=100, bands=32)


def test_duplicate_tag_first_wins_under_default_policy(spark):
    # parse_sdf_records must not depend on spark.sql.mapKeyDedupPolicy
    # (the session factory sets LAST_WIN, but build_db accepts arbitrary
    # sessions whose default policy EXCEPTION would fail on repeated tags).
    from local_pubchem_db_spark.sources.sdf import parse_sdf_records

    record = (
        "\n> <PUBCHEM_COMPOUND_CID>\n42\n\n"
        "> <DUP_TAG>\nfirst\n\n"
        "> <DUP_TAG>\nsecond\n"
    )
    df = spark.createDataFrame([(record,)], ["record"])
    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        parsed = parse_sdf_records(df).collect()[0]
        # the operator must NOT have mutated the foreign session's policy
        assert spark.conf.get("spark.sql.mapKeyDedupPolicy") == "EXCEPTION"
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
    assert parsed["cid"] == 42
    assert parsed["tags"]["DUP_TAG"] == "first"
