from .text import (
    STOPWORDS,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokens,
)
from .dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    embedding_near_dup_pairs,
)
from .similarity import brute_force_topk, cosine_sim_col, lsh_bucketed_topk

__all__ = [
    "STOPWORDS",
    "tokens",
    "token_count",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "embedding_near_dup_pairs",
    "cosine_sim_col",
    "brute_force_topk",
    "lsh_bucketed_topk",
]
