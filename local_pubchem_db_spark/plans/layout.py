"""Layout compiler: declarative JSON DB layout → Spark logical-plan spec.

The reference drives its whole pipeline from a JSON layout file
(reference utils.py:168-199, README.md:70-77). This module reproduces that
contract and compiles it once, up front, into everything the Spark pipeline
needs — the reference rebuilt these maps per record (its own TODO at
utils.py:73-74); here compilation happens exactly once per plan and the
result is codegen'd JVM expressions.

Parity points (reference file:line):
- DTYPE alias table  integer|int / real|float|double / varchar|character|text
  → error otherwise                                   (utils.py:37-56)
- column order is significant (OrderedDict layout)    (utils.py:177)
- PRIMARY_KEY: single column only, implies NOT NULL   (utils.py:184-197)
- NOT_NULL rows are *skipped*, not nulled             (utils.py:140-155)
- CREATE_LIKE applied after the dtype cast            (utils.py:104-108)
- get_column_stmt DDL golden strings                  (utils.py:181-201)
"""

from __future__ import annotations

import json
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from local_pubchem_db_spark.plans.transforms import (
    TransformTranslationError,
    parse_lambda,
    translate_create_like,
)

_INT_ALIASES = ("integer", "int")
_REAL_ALIASES = ("real", "float", "double")
_STR_ALIASES = ("varchar", "character", "text")


def spark_type_for_dtype(dtype: str) -> DataType:
    """DTYPE alias → Spark type. Mirrors _as_dtype (reference utils.py:37-56):
    int() → LongType, float() → DoubleType, str → StringType."""
    d = dtype.lower()
    if d in _INT_ALIASES:
        return LongType()
    if d in _REAL_ALIASES:
        return DoubleType()
    if d in _STR_ALIASES:
        return StringType()
    raise ValueError("Invalid dtype: %s." % dtype)


@dataclass
class ColumnSpec:
    name: str
    sd_tags: list[str]
    dtype: str
    spark_type: DataType
    not_null: bool = False
    primary_key: bool = False
    with_index: bool = False
    create_like: Optional[str] = None
    # Compiled native transform; None when create_like is absent or needs
    # the pandas-UDF fallback.
    transform: Optional[Callable[[Column], Column]] = None
    transform_is_native: bool = True


@dataclass
class CompiledLayout:
    columns: "OrderedDict[str, ColumnSpec]"
    primary_key: Optional[str]
    not_null_cols: list[str] = field(default_factory=list)
    indexed_cols: list[str] = field(default_factory=list)

    @property
    def schema(self) -> StructType:
        return StructType(
            [
                StructField(c.name, c.spark_type, nullable=not (c.not_null or c.primary_key))
                for c in self.columns.values()
            ]
        )

    def all_sd_tags(self) -> list[str]:
        tags: list[str] = []
        for c in self.columns.values():
            for t in c.sd_tags:
                if t not in tags:
                    tags.append(t)
        return tags


def load_db_specifications(fn: str) -> "OrderedDict[str, Any]":
    """Load a JSON DB layout preserving column order (utils.py:168-178)."""
    with open(fn, "r") as json_file:
        return json.loads(json_file.read(), object_pairs_hook=OrderedDict)


def get_column_stmt(column_specs: "OrderedDict[str, Any] | dict[str, Any]") -> str:
    """DDL column clause, byte-identical to the reference (utils.py:181-201).

    Kept because the reference's tests pin exact golden strings
    (unittests_utils.py:34-66) and the engine's SQLite-compatible DDL export
    uses it.
    """
    stmt_columns = []
    has_primary_key = False  # single-column primary keys only
    for name, spec in column_specs.items():
        new_col = [name, spec["DTYPE"]]
        if spec.get("NOT_NULL", False) or spec.get("PRIMARY_KEY", False):
            new_col.append("not null")
        if spec.get("PRIMARY_KEY", False):
            if has_primary_key:
                raise ValueError("Primary keys must be defined on a single column.")
            new_col.append("primary key")
            has_primary_key = True
        stmt_columns.append(" ".join(new_col))
    return ",".join(stmt_columns)


def compile_layout(
    specs: dict[str, Any],
    allow_python_transforms: bool = False,
) -> CompiledLayout:
    """Compile the layout JSON into a CompiledLayout.

    ``specs`` is the full layout dict (with a "columns" key) or the columns
    dict itself. CREATE_LIKE lambdas are translated to native Column
    expressions via the AST whitelist; untranslatable lambdas raise unless
    ``allow_python_transforms`` opts into the pandas-UDF/eval fallback.
    """
    columns_spec = specs.get("columns", specs)
    compiled: "OrderedDict[str, ColumnSpec]" = OrderedDict()
    primary_key: Optional[str] = None

    for name, spec in columns_spec.items():
        if "SD_TAG" not in spec:
            raise ValueError(f"column {name!r}: SD_TAG is required")
        if "DTYPE" not in spec:
            raise ValueError(f"column {name!r}: DTYPE is required")
        sd_tags = spec["SD_TAG"]
        if isinstance(sd_tags, str):
            sd_tags = [sd_tags]
        dtype = spec["DTYPE"]
        is_pk = bool(spec.get("PRIMARY_KEY", False))
        if is_pk:
            if primary_key is not None:
                raise ValueError("Primary keys must be defined on a single column.")
            primary_key = name

        col = ColumnSpec(
            name=name,
            sd_tags=list(sd_tags),
            dtype=dtype,
            spark_type=spark_type_for_dtype(dtype),
            # PK implies not-null even when NOT_NULL is false (utils.py:189-197)
            not_null=bool(spec.get("NOT_NULL", False)) or is_pk,
            primary_key=is_pk,
            with_index=bool(spec.get("WITH_INDEX", False)),
            create_like=spec.get("CREATE_LIKE"),
        )

        if col.create_like is not None:
            try:
                col.transform = translate_create_like(col.create_like)
                col.transform_is_native = True
            except TransformTranslationError:
                if not allow_python_transforms:
                    raise
                col.transform = _python_transform(col.create_like)
                col.transform_is_native = False
        compiled[name] = col

    return CompiledLayout(
        columns=compiled,
        primary_key=primary_key,
        not_null_cols=[c.name for c in compiled.values() if c.not_null],
        indexed_cols=[c.name for c in compiled.values() if c.with_index],
    )


def _python_transform(source: str) -> Callable[[Column], Column]:
    """Opt-in fallback: run the layout lambda as an Arrow-batched pandas UDF.

    This is the only place layout-provided code is executed (the reference
    evals unconditionally, utils.py:83). The UDF is elementwise over pandas
    Series batches — still ~10-100x faster than a row-at-a-time Python UDF.
    Output type is string; the layout compiler re-casts to the declared
    dtype afterwards (SQLite-affinity-like behavior).
    """
    # Validate the source parses as a single-arg lambda before shipping it
    # to executors.
    parse_lambda(source)

    def apply(col: Column) -> Column:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _udf(s: pd.Series) -> pd.Series:
            fn = eval(source)  # noqa: S307 - documented opt-in
            return s.map(lambda v: None if v is None else str(fn(v)))

        return _udf(col)

    return apply


def select_exprs(
    layout: CompiledLayout,
    tags_col: Column,
) -> list[Column]:
    """Build the per-column select expressions over a parsed tag map.

    For each layout column: coalesce over its SD_TAGs (first tag present
    wins — utils.py:85-89,102-112), strict cast to the declared type, then
    the CREATE_LIKE transform, then a final cast back to the declared type
    (mirrors SQLite column affinity coercing transform outputs).
    """
    exprs: list[Column] = []
    for col in layout.columns.values():
        raw = F.coalesce(*[tags_col.getItem(t) for t in col.sd_tags]) \
            if len(col.sd_tags) > 1 else tags_col.getItem(col.sd_tags[0])
        value = strict_cast(raw, col)
        if col.transform is not None:
            value = col.transform(value).cast(col.spark_type)
        exprs.append(value.alias(col.name))
    return exprs


def strict_cast(raw: Column, col: ColumnSpec) -> Column:
    """Cast with the reference's fail-fast semantics (utils.py:47-54).

    Python int()/float() raise on malformed input where Spark's default
    cast silently yields NULL (or truncates "3.3" → 3 for integral types).
    Here malformed non-null input raises at execution time via
    ``raise_error``, so a bad record fails the build exactly like the
    reference — instead of corrupting the output.
    """
    d = col.dtype.lower()
    if d in _INT_ALIASES:
        ok = raw.rlike(r"^\s*[+-]?[0-9]+\s*$")
        casted = raw.try_cast(LongType())
    elif d in _REAL_ALIASES:
        casted = raw.try_cast(DoubleType())
        ok = casted.isNotNull()
    else:
        return raw.cast(StringType())
    err = F.raise_error(
        F.concat(
            F.lit(f"invalid literal for column {col.name!r} ({col.dtype}): "),
            raw,
        )
    ).cast(col.spark_type)
    return F.when(raw.isNull() | ok, casted).otherwise(err)
