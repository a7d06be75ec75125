from local_pubchem_db_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    lang_id,
    normalize_text,
    punct_count,
    quality_score,
    shingle_array_udf,
    shingles_from_tokens,
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
    hamming64,
    minhash_band_udf,
    simhash_udf,
)

__all__ = [
    "char_ngrams",
    "cosine_similarity",
    "doc_fingerprint",
    "dot",
    "hamming64",
    "l2_norm",
    "lang_id",
    "minhash_band_udf",
    "normalize",
    "normalize_text",
    "punct_count",
    "quality_score",
    "shingle_array_udf",
    "shingles_from_tokens",
    "simhash_udf",
    "stopword_count",
    "token_count",
    "tokens",
    "word_shingles",
]
