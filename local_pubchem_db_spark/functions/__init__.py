from local_pubchem_db_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    lang_id,
    normalize_text,
    punct_count,
    quality_score,
    stopword_count,
    token_count,
    tokens,
    word_shingles,
)
from local_pubchem_db_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    normalize,
)
from local_pubchem_db_spark.functions.hashing import (
    band_bucket_structs,
    base_hashes,
    hamming64,
    minhash_agg_columns,
    simhash64,
    simhash_from_hashes,
)

__all__ = [
    "band_bucket_structs",
    "base_hashes",
    "char_ngrams",
    "cosine_similarity",
    "doc_fingerprint",
    "dot",
    "hamming64",
    "l2_norm",
    "lang_id",
    "minhash_agg_columns",
    "normalize",
    "normalize_text",
    "punct_count",
    "quality_score",
    "simhash64",
    "simhash_from_hashes",
    "stopword_count",
    "token_count",
    "tokens",
    "word_shingles",
]
