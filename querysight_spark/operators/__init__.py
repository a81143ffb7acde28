"""Training-data pipeline operators (SURVEY §7.2 phase 8; BASELINE.json
north-star): deduplication, similarity search, text analysis, multimodal
column plumbing — designed for 100 TB (no driver-side collection; JVM-side
expressions wherever the semantics allow)."""

from querysight_spark.operators.dedup import (
    embedding_cosine_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from querysight_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk
from querysight_spark.operators.textstats import (
    document_fingerprint,
    language_id,
    quality_scores,
    token_counts,
)

__all__ = [
    "exact_duplicates",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "embedding_cosine_duplicates",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "document_fingerprint",
    "language_id",
    "quality_scores",
    "token_counts",
]
