"""LLM-data-pipeline primitives (north-star mandate, BASELINE.json):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, text analysis, and multimodal column plumbing — all
shaped for 100 TB (shuffle-on-key, broadcast-small, no driver loops)."""

from palletjack_spark.functions.dedup import (
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
)
from palletjack_spark.functions.graph import kcore_peel, pagerank_converge
from palletjack_spark.functions.fusion import rrf_fuse
from palletjack_spark.functions.text import (
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
    "kcore_peel",
    "pagerank_converge",
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
