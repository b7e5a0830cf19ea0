"""LLM-data-pipeline operators (SURVEY.md §2C; BASELINE.json north star).

Deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), vector
similarity search (exact top-k + LSH ANN), text analysis (tokenize,
language-ID, quality scoring, fingerprinting), and multimodal binary
column plumbing — all designed bucketed-not-all-pairs for 100 TB scale.
"""

from etl_global_mobility_spark.operators.dedup import (
    dedup_components,
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_fingerprint,
    strip_boilerplate,
)
from etl_global_mobility_spark.operators.merge import (
    incremental_agg_update,
    upsert,
)
from etl_global_mobility_spark.operators.packing import (
    causal_lm_examples,
    chunk_documents,
    pack_sequences,
)
from etl_global_mobility_spark.operators.temporal import (
    asof_join,
    resample_ffill,
    sessionize,
)
from etl_global_mobility_spark.operators.similarity import (
    cosine_topk_exact,
    ivf_topk,
    lsh_ann_candidates,
    pq_codebook_from_corpus,
    pq_encode,
    pq_topk,
    semantic_dedup,
    train_ivf_centroids,
    train_pq_codebook,
)
from etl_global_mobility_spark.operators.bpe import (
    bpe_token_count,
    train_bpe_merges,
    word_frequencies,
)
from etl_global_mobility_spark.operators.graph import (
    pagerank,
)
from etl_global_mobility_spark.operators.quality_rules import (
    filter_rules,
    quality_classifier,
    split_quarantine,
)
from etl_global_mobility_spark.operators.retrieval import bm25_topk, rrf_fuse
from etl_global_mobility_spark.operators.splits import (
    cap_per_stratum,
    hash_split,
    mix_sources,
    preference_pairs,
    stratified_hash_sample,
)
from etl_global_mobility_spark.operators.text import (
    build_vocabulary,
    doc_fingerprint,
    language_id,
    oov_rates,
    quality_score,
    text_stats,
    tokenize,
)

__all__ = [
    "dedup_components",
    "strip_boilerplate",
    "upsert",
    "incremental_agg_update",
    "causal_lm_examples",
    "chunk_documents",
    "pack_sequences",
    "asof_join",
    "resample_ffill",
    "sessionize",
    "pq_codebook_from_corpus",
    "pq_encode",
    "pq_topk",
    "train_pq_codebook",
    "build_vocabulary",
    "oov_rates",
    "exact_dedup",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "cosine_topk_exact",
    "ivf_topk",
    "lsh_ann_candidates",
    "semantic_dedup",
    "train_ivf_centroids",
    "pagerank",
    "bpe_token_count",
    "train_bpe_merges",
    "word_frequencies",
    "filter_rules",
    "quality_classifier",
    "split_quarantine",
    "bm25_topk",
    "rrf_fuse",
    "hash_split",
    "stratified_hash_sample",
    "mix_sources",
    "cap_per_stratum",
    "preference_pairs",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "text_stats",
    "tokenize",
]
