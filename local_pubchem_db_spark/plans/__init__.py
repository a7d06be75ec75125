from local_pubchem_db_spark.plans.layout import (
    CompiledLayout,
    ColumnSpec,
    compile_layout,
    get_column_stmt,
    load_db_specifications,
)
from local_pubchem_db_spark.plans.transforms import (
    TransformTranslationError,
    translate_create_like,
)

__all__ = [
    "CompiledLayout",
    "ColumnSpec",
    "TransformTranslationError",
    "compile_layout",
    "get_column_stmt",
    "load_db_specifications",
    "translate_create_like",
]
