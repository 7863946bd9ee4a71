"""Column-function library: text analysis, dedup, similarity, multimodal."""

from .text import (
    BPE_SPLIT_PATTERN,
    STOPWORDS,
    bpe_token_count,
    doc_fingerprint,
    language_id,
    punct_count,
    quality_score,
    token_count,
    tokens,
    unigram_logprob_scores,
    winnow_fingerprint,
)
from .dedup import (
    dedup_clusters,
    substring_dup_spans,
    exact_dedup,
    embedding_near_dup_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_signatures_text,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    streaming_dedup,
)
from .similarity import (
    brute_force_topk,
    cosine_sim_col,
    ivf_topk,
    lsh_bucketed_topk,
    make_planes,
    train_ivf_centroids,
)
from .semantic import assign_to_centroids, semantic_dedup
from .quantize import quantize_int8_frame, quantized_topk
from .packing import chunk_manifest, sequence_pack_offsets
from .multimodal import (
    attach_binary_payload,
    extract_media_meta,
    resize_images,
    sample_frames,
)

__all__ = [
    # text
    "BPE_SPLIT_PATTERN",
    "STOPWORDS",
    "bpe_token_count",
    "doc_fingerprint",
    "language_id",
    "punct_count",
    "quality_score",
    "token_count",
    "tokens",
    "winnow_fingerprint",
    "unigram_logprob_scores",
    # dedup
    "dedup_clusters",
    "exact_dedup",
    "embedding_near_dup_pairs",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "minhash_signatures_text",
    "ngram_jaccard_pairs",
    "shingles",
    "simhash",
    "streaming_dedup",
    "substring_dup_spans",
    # similarity
    "brute_force_topk",
    "cosine_sim_col",
    "ivf_topk",
    "lsh_bucketed_topk",
    "make_planes",
    "train_ivf_centroids",
    "assign_to_centroids",
    "semantic_dedup",
    "quantize_int8_frame",
    "quantized_topk",
    "sequence_pack_offsets",
    "chunk_manifest",
    # multimodal
    "attach_binary_payload",
    "extract_media_meta",
    "resize_images",
    "sample_frames",
]
