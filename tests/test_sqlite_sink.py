"""SQLite export sink: the reference's downstream SQL (EP3) runs verbatim
against our exported database (goldens from unittests_utils.py:253-334)."""

import sqlite3

from local_pubchem_db_spark.pipeline import PubChemDB, build_db
from local_pubchem_db_spark.sources.sqlite_sink import write_sqlite
from tests.test_pipeline import make_base, specs


def test_reference_queries_on_export(spark, sdf_dir, tmp_path):
    base = make_base(tmp_path, sdf_dir)
    assert build_db(base, use_gzip=True, reset=True, db_specs=specs(), spark=spark) == 0
    db = PubChemDB(spark, base)
    path = str(tmp_path / "pubchem.sqlite")
    n = write_sqlite(
        db.compounds(), path, "compounds",
        primary_key="cid", not_null=["inchikey", "InChI"], indexes=["inchikey"],
    )
    assert n == 8
    write_sqlite(db.sdf_file(), path, "sdf_file", primary_key="filename")

    con = sqlite3.connect(path)
    # reference EP3 golden queries (unittests_utils.py:253-260)
    assert con.execute("SELECT count(*) FROM compounds").fetchone()[0] == 8
    assert con.execute(
        "SELECT inchikey FROM compounds WHERE cid == 34516"
    ).fetchone()[0] == "SISXGVIKZQKGLA-UHFFFAOYSA-N"
    assert con.execute(
        "SELECT xlogp3 FROM compounds WHERE cid == 31038"
    ).fetchone()[0] == 6.6
    assert con.execute("SELECT count(*) FROM sdf_file").fetchone()[0] == 3
    # index exists and is used for the lookup
    plan = con.execute(
        "EXPLAIN QUERY PLAN SELECT cid FROM compounds WHERE inchikey = 'x'"
    ).fetchall()
    assert any("idx_inchikey" in str(r) for r in plan), plan
    con.close()


def test_append_mode(spark, sdf_dir, tmp_path):
    base = make_base(tmp_path, sdf_dir)
    assert build_db(base, use_gzip=True, reset=True, db_specs=specs(), spark=spark) == 0
    db = PubChemDB(spark, base)
    path = str(tmp_path / "pubchem.sqlite")
    first = db.compounds().filter("cid < 34000")
    rest = db.compounds().filter("cid >= 34000")
    write_sqlite(first, path, "compounds", primary_key="cid")
    write_sqlite(rest, path, "compounds", mode="append")
    con = sqlite3.connect(path)
    assert con.execute("SELECT count(*) FROM compounds").fetchone()[0] == 8
    con.close()
