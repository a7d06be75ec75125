"""local_pubchem_db_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``bachi55/local_pubchem_db``.

The reference (/root/reference) is a single-threaded Python ETL that parses
PubChem SDF files into SQLite. This package re-expresses that capability —
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) — as idiomatic Spark DataFrame
plans: declarative layout compilation, file-source ingestion with an
incremental manifest, Catalyst-optimized query surface, and Structured
Streaming ingest.

Public API (mirrors the reference's ``pubchem2sqlite/__init__.py:1``):
    build_db, load_db_specifications
"""

from local_pubchem_db_spark.plans.layout import (
    CompiledLayout,
    ColumnSpec,
    compile_layout,
    get_column_stmt,
    load_db_specifications,
)
from local_pubchem_db_spark.corpus_pipeline import clean_corpus
from local_pubchem_db_spark.pipeline import PubChemDB, build_db
from local_pubchem_db_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "CompiledLayout",
    "ColumnSpec",
    "PubChemDB",
    "build_db",
    "clean_corpus",
    "compile_layout",
    "get_column_stmt",
    "get_spark",
    "load_db_specifications",
]
