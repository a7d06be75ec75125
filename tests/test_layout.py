"""Layout compiler parity tests.

Golden values ported from the reference's test suite
(pubchem2sqlite/tests/unittests_utils.py:34-66) — DDL strings, PK rules,
dtype aliases.
"""

from collections import OrderedDict

import pytest
from pyspark.sql.types import DoubleType, LongType, StringType

from local_pubchem_db_spark.plans.layout import (
    compile_layout,
    get_column_stmt,
    spark_type_for_dtype,
)


def test_get_column_stmt_goldens():
    # unittests_utils.py:36-40
    specs = OrderedDict(
        [
            ("MASS", {"DTYPE": "float", "NOT_NULL": False}),
            ("INCHI", {"DTYPE": "string", "NOT_NULL": True}),
            ("CID", {"DTYPE": "integer", "PRIMARY_KEY": True}),
        ]
    )
    assert get_column_stmt(specs) == (
        "MASS float,INCHI string not null,CID integer not null primary key"
    )

    # unittests_utils.py:44-48
    specs = OrderedDict(
        [
            ("MASS", {"DTYPE": "float", "NOT_NULL": False}),
            ("INCHI", {"DTYPE": "string", "PRIMARY_KEY": True, "NOT_NULL": True}),
            ("CID", {"DTYPE": "integer"}),
        ]
    )
    assert get_column_stmt(specs) == (
        "MASS float,INCHI string not null primary key,CID integer"
    )

    # unittests_utils.py:52-56
    specs = OrderedDict(
        [
            ("MASS", {"DTYPE": "float", "NOT_NULL": False}),
            ("INCHI", {"DTYPE": "string", "PRIMARY_KEY": True}),
            ("CID", {"DTYPE": "integer"}),
        ]
    )
    assert get_column_stmt(specs) == (
        "MASS float,INCHI string not null primary key,CID integer"
    )

    # PK overrides NOT_NULL=False (unittests_utils.py:60-66)
    specs = OrderedDict(
        [
            ("MASS", {"DTYPE": "float", "NOT_NULL": False}),
            ("INCHI", {"DTYPE": "string", "PRIMARY_KEY": True, "NOT_NULL": False}),
            ("CID", {"DTYPE": "integer", "NOT_NULL": True}),
        ]
    )
    assert get_column_stmt(specs) == (
        "MASS float,INCHI string not null primary key,CID integer not null"
    )


def test_multi_primary_key_rejected():
    specs = OrderedDict(
        [
            ("A", {"DTYPE": "integer", "PRIMARY_KEY": True}),
            ("B", {"DTYPE": "integer", "PRIMARY_KEY": True}),
        ]
    )
    with pytest.raises(ValueError, match="single column"):
        get_column_stmt(specs)
    specs_full = {
        "A": {"SD_TAG": ["T1"], "DTYPE": "integer", "PRIMARY_KEY": True},
        "B": {"SD_TAG": ["T2"], "DTYPE": "integer", "PRIMARY_KEY": True},
    }
    with pytest.raises(ValueError, match="single column"):
        compile_layout(specs_full)


def test_dtype_aliases():
    # reference utils.py:47-54
    for alias in ("integer", "int"):
        assert isinstance(spark_type_for_dtype(alias), LongType)
    for alias in ("real", "float", "double"):
        assert isinstance(spark_type_for_dtype(alias), DoubleType)
    for alias in ("varchar", "character", "text"):
        assert isinstance(spark_type_for_dtype(alias), StringType)
    with pytest.raises(ValueError, match="Invalid dtype"):
        spark_type_for_dtype("blob")


def test_compile_layout_pk_implies_not_null():
    layout = compile_layout(
        {
            "columns": {
                "cid": {"SD_TAG": ["T"], "DTYPE": "integer", "PRIMARY_KEY": True,
                        "NOT_NULL": False},
                "x": {"SD_TAG": ["X"], "DTYPE": "real"},
            }
        }
    )
    assert layout.primary_key == "cid"
    assert layout.not_null_cols == ["cid"]
    assert not layout.schema["cid"].nullable
    assert layout.schema["x"].nullable


def test_compile_layout_preserves_column_order():
    layout = compile_layout(
        {
            "columns": {
                "z": {"SD_TAG": ["Z"], "DTYPE": "text"},
                "a": {"SD_TAG": ["A"], "DTYPE": "int"},
                "m": {"SD_TAG": ["M"], "DTYPE": "double", "WITH_INDEX": True},
            }
        }
    )
    assert list(layout.columns) == ["z", "a", "m"]
    assert layout.indexed_cols == ["m"]


def test_unknown_create_like_rejected_without_opt_in():
    specs = {
        "columns": {
            "c": {
                "SD_TAG": ["T"],
                "DTYPE": "varchar",
                "CREATE_LIKE": "lambda __x: __import__('os').getcwd()",
            }
        }
    }
    with pytest.raises(Exception):
        compile_layout(specs, allow_python_transforms=False)
