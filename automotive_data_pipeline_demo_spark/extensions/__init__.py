"""Large-scale training-data pipeline operators (BASELINE.json north star).

Beyond the reference's own surface: deduplication families, similarity
search over embedding columns, text analysis, and multimodal column
plumbing — each designed so the heavy lifting is JVM-side column algebra
(explode/groupBy/join), with Python only in clearly-marked stubs.
"""

from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
    tokenize,
    ccnet_bands,
    chunk_tokens,
    doc_fingerprint,
    language_id,
    lm_cross_entropy,
    ngram_repetition,
    quality_score,
    tfidf_top_terms,
    token_count_bpe,
    unigram_entropy,
    tokenize_to_ids,
    vocab_oov_rate,
)
from automotive_data_pipeline_demo_spark.extensions.sampling import (
    hash_bucket,
    hash_split,
    mixture_resample,
    temperature_mixture,
    temperature_weights_ppm,
    pack_sequences,
    shard_manifest,
    stratified_sample,
    top_fraction_per_group,
    uniform_sample_k,
    interleave_sources,
)
from automotive_data_pipeline_demo_spark.extensions.classifier import (
    hashed_linear_score,
)
from automotive_data_pipeline_demo_spark.extensions.quantization import (
    quantize_int8,
    quantized_cosine,
    quantized_rerank_topk,
    quantized_topk,
)
from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
    build_band_index,
    minhash_signature_columns,
    dedup_cluster_stats,
    dedup_corpus_best,
    duplicated_ngram_fraction,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_jaccard_estimate,
    near_dup_against_index,
    ngram_contamination,
    ngram_jaccard_pairs,
    shingle_arrays,
    simhash,
    simhash_dedup,
    simhash_near_pairs,
)
from automotive_data_pipeline_demo_spark.extensions.similarity import (
    cosine_similarity_col,
    brute_force_topk,
    kmeans_lloyd,
    lsh_bucketed_topk,
)

__all__ = [
    "tokenize",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "lm_cross_entropy",
    "tfidf_top_terms",
    "token_count_bpe",
    "unigram_entropy",
    "tokenize_to_ids",
    "vocab_oov_rate",
    "hash_bucket",
    "hash_split",
    "pack_sequences",
    "stratified_sample",
    "top_fraction_per_group",
    "uniform_sample_k",
    "interleave_sources",
    "exact_dedup",
    "minhash_candidate_pairs",
    "minhash_jaccard_estimate",
    "ngram_jaccard_pairs",
    "shingle_arrays",
    "simhash",
    "simhash_dedup",
    "simhash_near_pairs",
    "cosine_similarity_col",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ccnet_bands",
    "chunk_tokens",
    "ngram_repetition",
    "mixture_resample",
    "temperature_mixture",
    "temperature_weights_ppm",
    "shard_manifest",
    "build_band_index",
    "minhash_signature_columns",
    "dedup_cluster_stats",
    "dedup_corpus_best",
    "duplicated_ngram_fraction",
    "near_dup_against_index",
    "ngram_contamination",
    "kmeans_lloyd",
    "hashed_linear_score",
    "quantize_int8",
    "quantized_cosine",
    "quantized_rerank_topk",
    "quantized_topk",
]
