"""LLM-data-pipeline primitives (north-star mandate, BASELINE.json):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, text analysis, and multimodal column plumbing — all
shaped for 100 TB (shuffle-on-key, broadcast-small, no driver loops)."""

from palletjack_spark.functions.dedup import (
    batch_match_pairs,
    compact_signature_store,
    cdc_chunks,
    cdc_chunk_stats,
    incremental_components,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    cross_doc_dupgrams,
    dup_span_excise,
    cluster_representatives,
    fuzzy_decontaminate,
)
from palletjack_spark.functions.similarity import (
    cosine_topk,
    lsh_bucket_topk,
    kmeans_converge,
    jl_project,
    jl_two_stage_topk,
    binary_quantize,
    bq_two_stage_topk,
    save_vector_store,
    append_vectors,
    delete_vectors,
    compact_vector_store,
    vector_store_topk,
)
from palletjack_spark.functions.graph import (
    kcore_peel,
    pagerank_converge,
    label_propagation,
    label_propagation_converge,
)
from palletjack_spark.functions.curation import snapshot_diff
from palletjack_spark.functions.fusion import rrf_fuse
from palletjack_spark.functions.text import (
    bigram_lm_score,
    bigram_lm_score_store,
    save_lm_store,
    append_lm_counts,
    compact_lm_store,
    text_stats,
    language_id,
    quality_score,
    token_count_regex,
    fingerprint_md5,
)
from palletjack_spark.functions.imagecodec import decode_image
from palletjack_spark.functions.videocodec import decode_avi, encode_avi
from palletjack_spark.functions.audiocodec import decode_wav, encode_wav
from palletjack_spark.functions.multimodal import (
    attach_fake_binary,
    extract_audio_features,
    extract_binary_features,
    sample_frames,
)

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cross_doc_dupgrams",
    "dup_span_excise",
    "cluster_representatives",
    "fuzzy_decontaminate",
    "cosine_topk",
    "lsh_bucket_topk",
    "kmeans_converge",
    "jl_project",
    "jl_two_stage_topk",
    "binary_quantize",
    "bq_two_stage_topk",
    "save_vector_store",
    "append_vectors",
    "delete_vectors",
    "compact_vector_store",
    "vector_store_topk",
    "kcore_peel",
    "pagerank_converge",
    "label_propagation",
    "label_propagation_converge",
    "batch_match_pairs",
    "compact_signature_store",
    "cdc_chunks",
    "cdc_chunk_stats",
    "incremental_components",
    "bigram_lm_score",
    "bigram_lm_score_store",
    "save_lm_store",
    "append_lm_counts",
    "compact_lm_store",
    "snapshot_diff",
    "rrf_fuse",
    "text_stats",
    "language_id",
    "quality_score",
    "token_count_regex",
    "fingerprint_md5",
    "attach_fake_binary",
    "extract_audio_features",
    "extract_binary_features",
    "sample_frames",
    "decode_image",
    "decode_avi",
    "encode_avi",
    "decode_wav",
    "encode_wav",
]
