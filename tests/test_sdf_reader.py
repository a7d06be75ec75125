"""SDF reader golden tests.

Goldens ported from the reference test suite (unittests_utils.py:73-156):
CID sequences per fixture file, exact InChI strings, xlogp3 multi-tag
coalesce in all three SD_TAG configurations.
"""

import os

from pyspark.sql import functions as F

from local_pubchem_db_spark.plans.layout import compile_layout, select_exprs
from local_pubchem_db_spark.sources.sdf import read_sdf

INCHIS = [
    "InChI=1S/C18H31NO/c1-2-3-4-5-6-7-8-9-10-11-12-13-18-14-16-19(20)17-15-18/h14-17H,2-13H2,1H3",
    "InChI=1S/C11H18O2/c1-2-3-4-5-6-7-8-9-10-11(12)13/h1H,3-10H2,(H,12,13)",
    "InChI=1S/C5H6O5.2Na/c6-3(5(9)10)1-2-4(7)8;;/h1-2H2,(H,7,8)(H,9,10);;/q;2*+1/p-2",
]


def base_specs(xlogp3_tags):
    return {
        "columns": {
            "cid": {
                "SD_TAG": ["PUBCHEM_COMPOUND_CID"],
                "DTYPE": "integer",
                "NOT_NULL": True,
                "PRIMARY_KEY": True,
            },
            "InChI": {
                "SD_TAG": ["PUBCHEM_IUPAC_INCHI"],
                "DTYPE": "varchar",
                "NOT_NULL": True,
            },
            "xlogp3": {
                "SD_TAG": xlogp3_tags,
                "DTYPE": "real",
                "NOT_NULL": False,
            },
        }
    }


def extract(spark, sdf_dir, fname, specs):
    layout = compile_layout(specs)
    df = read_sdf(spark, os.path.join(sdf_dir, fname))
    rows = (
        df.select(*select_exprs(layout, F.col("tags")))
        .orderBy("cid")
        .collect()
    )
    return rows


def test_cid_sequences(spark, sdf_dir):
    # unittests_utils.py:73-87
    expected = {
        "cmps_00_02.sdf": [31038, 31039, 31040],
        "cmps_03_05.sdf": [34516, 34517, 34518],
        "cmps_06_07.sdf": [46773, 46774],
    }
    for fname, cids in expected.items():
        df = read_sdf(spark, os.path.join(sdf_dir, fname))
        got = [r["cid"] for r in df.orderBy("cid").collect()]
        assert got == cids, fname


def test_gzip_matches_plain(spark, sdf_dir):
    plain = read_sdf(spark, os.path.join(sdf_dir, "cmps_00_02.sdf"))
    gz = read_sdf(spark, os.path.join(sdf_dir, "cmps_00_02.sdf.gz"))
    assert sorted(r["cid"] for r in plain.collect()) == sorted(
        r["cid"] for r in gz.collect()
    )


def test_extraction_goldens_both_tags(spark, sdf_dir):
    # unittests_utils.py:89-123 — coalesce over both xlogp3 tags
    rows = extract(
        spark, sdf_dir, "cmps_00_02.sdf",
        base_specs(["PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"]),
    )
    assert [r["InChI"] for r in rows] == INCHIS
    assert [r["xlogp3"] for r in rows] == [6.6, 3.3, None]


def test_extraction_goldens_only_plain_tag(spark, sdf_dir):
    # unittests_utils.py:125-139
    rows = extract(spark, sdf_dir, "cmps_00_02.sdf", base_specs(["PUBCHEM_XLOGP3"]))
    assert [r["xlogp3"] for r in rows] == [None, 3.3, None]


def test_extraction_goldens_only_aa_tag(spark, sdf_dir):
    # unittests_utils.py:141-156
    rows = extract(spark, sdf_dir, "cmps_00_02.sdf", base_specs(["PUBCHEM_XLOGP3_AA"]))
    assert [r["xlogp3"] for r in rows] == [6.6, None, None]


def test_apostrophe_strip(spark, sdf_dir, tmp_path):
    # utils.py:264 — every apostrophe is deleted from the record
    src = os.path.join(sdf_dir, "cmps_00_02.sdf")
    with open(src) as fh:
        content = fh.read()
    mutated = content.replace(
        "InChI=1S/C18H31NO", "InChI=1S/C18'H31'NO", 1
    )
    p = tmp_path / "apos.sdf"
    p.write_text(mutated)
    rows = extract(
        spark, str(tmp_path), "apos.sdf",
        base_specs(["PUBCHEM_XLOGP3", "PUBCHEM_XLOGP3_AA"]),
    )
    assert rows[0]["InChI"] == INCHIS[0]


def test_multiline_value_truncated_to_first_line(spark, sdf_dir):
    # Quirk: PUBCHEM_COORDINATE_TYPE has 3 value lines; reference keeps only
    # the first (utils.py:104).
    specs = {
        "columns": {
            "cid": {"SD_TAG": ["PUBCHEM_COMPOUND_CID"], "DTYPE": "integer"},
            "coord": {"SD_TAG": ["PUBCHEM_COORDINATE_TYPE"], "DTYPE": "varchar"},
        }
    }
    rows = extract(spark, sdf_dir, "cmps_00_02.sdf", specs)
    assert all(r["coord"] == "1" for r in rows)
