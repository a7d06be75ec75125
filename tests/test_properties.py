"""Property-based tests (hypothesis) for the pure-Python layers: layout
compilation and deterministic-split thresholds. No SparkSession needed —
these run in milliseconds and explore the input space the goldens can't."""

from collections import OrderedDict

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from local_pubchem_db_spark.operators.sampling import _hex4
from local_pubchem_db_spark.plans.layout import (
    compile_layout,
    get_column_stmt,
    spark_type_for_dtype,
)

_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_",
    min_size=1,
    max_size=12,
)
_dtype = st.sampled_from(
    ["integer", "int", "real", "float", "double", "varchar", "character", "text"]
)


def _layout(names, dtypes, pk_idx):
    cols = OrderedDict()
    for i, (n, d) in enumerate(zip(names, dtypes)):
        spec = {"SD_TAG": [f"TAG_{n}"], "DTYPE": d}
        if i == pk_idx:
            spec["PRIMARY_KEY"] = True
        cols[n] = spec
    return {"columns": cols}


@given(st.floats(min_value=0.0, max_value=1.0), st.floats(min_value=0.0, max_value=1.0))
def test_hex4_monotone_and_wellformed(f1, f2):
    h1, h2 = _hex4(f1), _hex4(f2)
    assert len(h1) == 4 and h1 == h1.lower()
    if f1 <= f2:
        assert h1 <= h2  # lexicographic == numeric for fixed-width hex


@given(
    st.lists(_name, min_size=1, max_size=6, unique=True).flatmap(
        lambda ns: st.tuples(
            st.just(ns),
            st.lists(_dtype, min_size=len(ns), max_size=len(ns)),
            st.integers(min_value=-1, max_value=len(ns) - 1),
        )
    )
)
@settings(max_examples=200)
def test_layout_compile_properties(args):
    names, dtypes, pk_idx = args
    layout = _layout(names, dtypes, pk_idx)
    compiled = compile_layout(layout)
    # column order is preserved exactly (reference utils.py:177 OrderedDict)
    assert [f.name for f in compiled.schema.fields] == names
    # declared types map through the alias table
    for f, d in zip(compiled.schema.fields, dtypes):
        assert f.dataType == spark_type_for_dtype(d)
    if pk_idx >= 0:
        # PK implies not-null (reference utils.py:192-197) and lands in DDL
        assert names[pk_idx] in compiled.not_null_cols
        stmt = get_column_stmt(layout["columns"])
        assert f"{names[pk_idx]} " in stmt and "primary key" in stmt


@given(
    st.lists(_name, min_size=2, max_size=5, unique=True),
    st.lists(_dtype, min_size=5, max_size=5),
)
def test_multi_pk_rejected(names, dtypes):
    cols = OrderedDict()
    for n, d in zip(names, dtypes):
        cols[n] = {"SD_TAG": [f"T_{n}"], "DTYPE": d, "PRIMARY_KEY": True}
    with pytest.raises(ValueError, match="single column"):
        compile_layout({"columns": cols})


@given(_name)
def test_unknown_dtype_rejected(s):
    if s.lower() not in {
        "integer", "int", "real", "float", "double",
        "varchar", "character", "text",
    }:
        with pytest.raises(ValueError, match="Invalid dtype"):
            spark_type_for_dtype(s)
