from local_pubchem_db_spark.operators.dedup import (
    bounded_bucket_pairs,
    connected_components,
    contamination_report,
    decontaminate,
    dedup_keep_ids,
    exact_dedup,
    exact_dedup_by_content,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    remove_duplicate_spans,
    simhash_dedup_pairs,
)
from local_pubchem_db_spark.operators.similarity import (
    brute_force_knn,
    incremental_srp_new_ids,
    ivf_within_partition_pairs,
    srp_lsh_neardup_pairs,
    srp_sign_index,
)
from local_pubchem_db_spark.operators.clustering import (
    pca_fit,
    pca_transform,
    semantic_dedup,
)
from local_pubchem_db_spark.operators.joins import (
    as_of_join,
    banded_range_join,
    edit_distance_join,
    range_join,
)
from local_pubchem_db_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    decontaminate_bloom,
)
from local_pubchem_db_spark.operators.physical import (
    interleave_bits,
    span_amplification,
    table_health,
    write_compacted,
    write_zordered,
)
from local_pubchem_db_spark.operators.pq import (
    ivf_pq_search,
    pq_encode,
    pq_fit,
    pq_knn,
    pq_reconstruct,
)
from local_pubchem_db_spark.operators.quality import (
    bigram_logprob_scores,
    unigram_logprob_scores,
    unigram_model,
)
from local_pubchem_db_spark.operators.resampling import (
    bucket_counts,
    dsir_logweights,
    dsir_select,
    dsir_select_fraction,
    hashed_ngram_buckets,
)
from local_pubchem_db_spark.operators.sampling import (
    deterministic_shuffle,
    hash_split,
    mix_domains,
    sample_per_key,
    stratified_sample,
)
from local_pubchem_db_spark.operators.topk import (
    misra_gries_topk,
    skew_report,
    top_k_per_group,
)

__all__ = [
    "as_of_join",
    "banded_range_join",
    "bigram_logprob_scores",
    "bloom_build",
    "bloom_contains",
    "bounded_bucket_pairs",
    "brute_force_knn",
    "bucket_counts",
    "connected_components",
    "contamination_report",
    "decontaminate",
    "decontaminate_bloom",
    "dedup_keep_ids",
    "deterministic_shuffle",
    "dsir_logweights",
    "dsir_select",
    "dsir_select_fraction",
    "edit_distance_join",
    "exact_dedup",
    "exact_dedup_by_content",
    "hash_split",
    "hashed_ngram_buckets",
    "incremental_srp_new_ids",
    "interleave_bits",
    "ivf_pq_search",
    "ivf_within_partition_pairs",
    "minhash_lsh_dedup_pairs",
    "misra_gries_topk",
    "mix_domains",
    "ngram_jaccard_pairs",
    "pca_fit",
    "pca_transform",
    "pq_encode",
    "pq_fit",
    "pq_knn",
    "pq_reconstruct",
    "range_join",
    "remove_duplicate_spans",
    "sample_per_key",
    "semantic_dedup",
    "simhash_dedup_pairs",
    "skew_report",
    "span_amplification",
    "srp_lsh_neardup_pairs",
    "srp_sign_index",
    "stratified_sample",
    "table_health",
    "top_k_per_group",
    "unigram_logprob_scores",
    "unigram_model",
    "write_compacted",
    "write_zordered",
]
