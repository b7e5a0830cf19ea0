"""LLM-data-pipeline operators (SURVEY.md §2C; BASELINE.json north star).

Deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), vector
similarity search (exact top-k + LSH ANN), text analysis (tokenize,
language-ID, quality scoring, fingerprinting), and multimodal binary
column plumbing — all designed bucketed-not-all-pairs for 100 TB scale.
"""

from etl_global_mobility_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_fingerprint,
)
from etl_global_mobility_spark.operators.similarity import (
    cosine_topk_exact,
    ivf_topk,
    lsh_ann_candidates,
    train_ivf_centroids,
)
from etl_global_mobility_spark.operators.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    text_stats,
    tokenize,
)

__all__ = [
    "exact_dedup",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "cosine_topk_exact",
    "ivf_topk",
    "lsh_ann_candidates",
    "train_ivf_centroids",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "text_stats",
    "tokenize",
]
