from local_pubchem_db_spark.sources.sdf import (
    parse_sdf_records,
    read_sdf,
    read_sdf_records,
)
from local_pubchem_db_spark.sources.manifest import (
    MANIFEST_SCHEMA,
    read_manifest,
    pending_files,
)
from local_pubchem_db_spark.sources.corpus import (
    read_csv_corpus,
    read_jsonl_corpus,
    read_text_dir_corpus,
)
from local_pubchem_db_spark.sources.shards import (
    append_to_training_shards,
    read_shard_manifest,
    read_training_shards,
    shard_assignment,
    write_training_shards,
)

__all__ = [
    "MANIFEST_SCHEMA",
    "append_to_training_shards",
    "parse_sdf_records",
    "pending_files",
    "read_csv_corpus",
    "read_jsonl_corpus",
    "read_manifest",
    "read_sdf",
    "read_sdf_records",
    "read_shard_manifest",
    "read_text_dir_corpus",
    "read_training_shards",
    "shard_assignment",
    "write_training_shards",
]
