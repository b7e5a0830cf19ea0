"""§2C LLM-data-pipeline corpus: dedup, similarity, text analysis,
multimodal plumbing over the ``documents`` / ``embeddings`` tables.

Everything deterministic is oracle-checked — including MinHash and
SimHash, which use md5-derived hashes precisely so an independent SQL
engine can recompute them. Only the pandas-UDF multimodal features keep
a reduced (metadata-only) oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_global_mobility_spark.corpus.base import QuerySpec, load_table
from etl_global_mobility_spark.operators.dedup import (
    dedup_components,
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_fingerprint,
)
from etl_global_mobility_spark.operators.similarity import (
    cosine_topk_exact,
    embedding_near_duplicates,
    ivf_topk,
    lsh_ann_candidates,
    random_hyperplanes,
    semantic_dedup,
)
from etl_global_mobility_spark.operators.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_count,
)

# ------------------------------------------------ shared SQL fragments ----
# DuckDB mirror of operators.text.tokenize
TOKS = "list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'), x -> len(x) > 0)"


def _shingles_sql(k: int = 3) -> str:
    """DuckDB mirror of operators.dedup._word_shingles."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({TOKS}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string(({TOKS})[i:i + {k - 1}], ' ')))"
    )


def _md5_hash_sql(expr: str, seed: int) -> str:
    """DuckDB mirror of operators.dedup._md5_band_hash (60-bit int)."""
    return f"CAST('0x' || substr(md5('{seed}:' || ({expr})), 1, 15) AS BIGINT)"


# ------------------------------------------------------------- queries ----
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id", "content_hash", "n_copies")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fp"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text_stats(d).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "digit_ratio",
    )


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_global_mobility_spark.operators.text import tfidf_top_terms

    d = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, top_k=3)


def q_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_global_mobility_spark.operators.text import bigram_novelty

    d = load_table(spark, sf_dir, "documents")
    return bigram_novelty(d, rare_max_count=2)


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: top-5 df-normalized salient terms
    joined with the language's token totals — merges the r3 variants
    llm_token_count_by_lang + llm_salient_terms so one driver row
    evidences both text-analysis components. The per-lang totals frame
    is bounded (one row per language) and broadcasts onto the bounded
    top-k term rows; see operators.text.salient_terms for the tf/df
    (not ln-idf) scoring rationale."""
    from etl_global_mobility_spark.operators.text import salient_terms

    d = load_table(spark, sf_dir, "documents")
    totals = (
        d.withColumn("n_toks", token_count("text"))
        .groupBy("lang")
        .agg(
            F.sum("n_toks").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return salient_terms(d, group_col="lang", top_k=5).join(
        F.broadcast(totals), "lang"
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("detected", language_id("text"))
        .groupBy("detected")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_fingerprint(d, bits=32).withColumnRenamed("id", "doc_id")


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d, n_hashes=16, bands=4, k=3, jaccard_threshold=0.25
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, k=2, threshold=0.25)


def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval EVALUATION as a first-class operator: per-query
    recall@k of the LSH ANN against exact cosine ground truth — the
    index-quality report a pipeline runs before trusting an ANN path
    at scale. Both sides are the existing oracle-proven operators;
    the report is two bounded aggregations over their joined top-k
    sets (never touches the corpus beyond the two retrievals)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    exact = cosine_topk_exact(e, queries, k=5).select("q_id", "c_id")
    ann = lsh_ann_candidates(e, queries, dim=64, n_planes=6, k=5).select(
        "q_id", "c_id"
    )
    hits = (
        exact.join(ann, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_exact = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        n_exact.join(hits, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


def _ann_recall_report_sql() -> str:
    return f"""
    WITH ex AS (
      SELECT q_id, c_id FROM ({_cosine_topk_sql()})
    ), an AS (
      SELECT q_id, c_id FROM ({_lsh_ann_sql()})
    ), h AS (
      SELECT q_id, count(*) AS n_hits
      FROM ex JOIN an USING (q_id, c_id) GROUP BY q_id
    ), nx AS (
      SELECT q_id, count(*) AS n_exact FROM ex GROUP BY q_id
    )
    SELECT nx.q_id, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(n_hits, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE)
             AS recall
    FROM nx LEFT JOIN h ON nx.q_id = h.q_id
    """


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware retrieval evaluation: per-query nDCG@k of the LSH
    ANN against exact cosine ground truth (operators/retrieval.py
    ndcg_report) — the companion dial to llm_ann_recall_report, which
    can't distinguish "all true neighbors at the top" from "all at the
    bottom of the k". The log2 discount is replaced by the rational
    1/(rank+1) scaled by lcm(2..k+1), so every DCG term is an integer,
    the sums are order-invariant across engines, and nDCG is one final
    IEEE division — hash-exact against the DuckDB mirror."""
    from etl_global_mobility_spark.operators.retrieval import ndcg_report

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    exact = cosine_topk_exact(e, queries, k=5)
    ann = lsh_ann_candidates(e, queries, dim=64, n_planes=6, k=5)
    return ndcg_report(exact, ann, k=5)


def _retrieval_ndcg_sql(k: int = 5) -> str:
    import math

    lcm = math.lcm(*range(2, k + 2))
    wt_rows = ", ".join(f"({r}, {lcm // (r + 1)})" for r in range(1, k + 1))
    return f"""
    WITH ex AS (
      SELECT q_id, rank, c_id FROM ({_cosine_topk_sql()})
    ), an AS (
      SELECT q_id, rank, c_id FROM ({_lsh_ann_sql()})
    ), w(rk, wt) AS (
      VALUES {wt_rows}
    ), dcg AS (
      SELECT an.q_id, sum(({k + 1} - ex.rank) * w.wt) AS dcg_num
      FROM an
      JOIN ex ON an.q_id = ex.q_id AND an.c_id = ex.c_id
      JOIN w ON w.rk = an.rank
      GROUP BY an.q_id
    ), idcg AS (
      SELECT q_id, sum(({k + 1} - rank) * w.wt) AS idcg_num
      FROM ex JOIN w ON w.rk = ex.rank
      GROUP BY q_id
    )
    SELECT i.q_id,
           CAST(COALESCE(d.dcg_num, 0) AS BIGINT) AS dcg_num,
           CAST(i.idcg_num AS BIGINT) AS idcg_num,
           CAST(COALESCE(d.dcg_num, 0) AS DOUBLE)
             / CAST(i.idcg_num AS DOUBLE) AS ndcg
    FROM idcg i LEFT JOIN dcg d ON i.q_id = d.q_id
    """


def q_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN ingest — the similarity-family mirror of
    llm_incremental_neardup's daily-shard story: embeddings with
    vec_id % 10 == 0 play the NEW shard arriving; the coarse quantizer
    is resolved once from the EXISTING corpus snapshot (deterministic
    lowest-id cells, the same rule ivf_topk defaults to), persisted
    via save_ann_artifacts, re-LOADED from disk, and only then probes
    — so the save→load→probe artifact loop is proven by construction
    every run (the llm_quality_classifier_trained discipline). Daily
    cost is ∝ shard: the shard side is broadcast into its probed
    cells, the existing side is one map-only cell-assignment scan
    (literal centroids, no join, no corpus shuffle), and NOTHING is
    retrained. The oracle recomputes the whole path — existing-side
    quantizer, assignment, probe, top-k — in DuckDB."""
    from etl_global_mobility_spark.corpus.relational import _scratch_dir
    from etl_global_mobility_spark.operators.similarity import (
        deterministic_seed_centroids,
        ivf_topk,
        load_ann_artifacts,
        save_ann_artifacts,
    )

    e = load_table(spark, sf_dir, "embeddings")
    existing = e.filter(F.col("vec_id") % 10 != 0)
    shard = e.filter(F.col("vec_id") % 10 == 0)
    # deterministic quantizer over the EXISTING snapshot — the SAME
    # helper the streaming twin uses, so the shared oracle can't drift
    cents = deterministic_seed_centroids(existing, n_cells=16)
    centroids = None
    if cents:  # empty snapshot: nothing to persist, ivf_topk
        # resolves the empty default and returns the contract schema
        path = _scratch_dir("ivf_artifact", sf_dir)
        save_ann_artifacts(spark, path, centroids=cents)
        centroids, _codebook = load_ann_artifacts(spark, path)
    return ivf_topk(
        existing, shard, n_cells=16, nprobe=2, k=5, centroids=centroids
    )


def _ivf_incremental_sql(n_cells: int = 16, nprobe: int = 2, k: int = 5) -> str:
    cos_ec = _COS.replace("a.embedding", "e.embedding").replace(
        "b.embedding", "c.embedding"
    )
    cos_pa = _COS.replace("b.embedding", "p.q_emb")
    # _EMB_OK mirrors the Spark path's exclusion of degenerate vectors
    # from seeds, assignment, and probing (r12 review finding)
    return f"""
    WITH existing AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % 10 <> 0 AND {_EMB_OK}
    ), shard AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % 10 = 0 AND {_EMB_OK}
    ), cents AS (
      SELECT vec_id AS cent_id, embedding FROM existing
      ORDER BY vec_id LIMIT {n_cells}
    ), assign AS (
      SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.cent_id) AS rn
        FROM existing e CROSS JOIN cents c
      ) WHERE rn = 1
    ), probe AS (
      SELECT vec_id AS q_id, embedding AS q_emb, cent_id AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.cent_id) AS rn
        FROM shard e CROSS JOIN cents c
      ) WHERE rn <= {nprobe}
    ), scored AS (
      SELECT p.q_id, a.vec_id AS c_id, {cos_pa} AS score
      FROM assign a JOIN probe p ON a.cent_id = p.cell
      WHERE p.q_id <> a.vec_id
    ), ranked AS (
      SELECT q_id, c_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
      FROM scored
    )
    SELECT q_id, rank, c_id, score FROM ranked WHERE rank <= {k}
    """


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-dedup text normalization with deterministic planted mess:
    a third of the docs get control chars + trailing spaces, a third
    get exotic-whitespace runs + spaced punctuation — the normalizer
    must strip/collapse them all so trivially-different bytes can't
    defeat dedup hashing. Oracle reuses the SAME pattern strings
    (written in the \\x{...} form Java regex and RE2 parse
    identically), so the normalized text must match byte-for-byte."""
    from etl_global_mobility_spark.operators.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    messy = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.expr("char(9)"), F.col("text"), F.expr("char(7)"), F.lit("  ")
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                # NB: a Python literal, NOT char(8201) — Spark's char()
                # is mod-256 above 255 (char(8201) = TAB), while DuckDB
                # chr(8201) is the Unicode codepoint U+2009. The
                # literal keeps the planted mess identical so the
                # \\x{2000}-\\x{200A} branch of NORM_WS_RE is really
                # exercised on both engines.
                F.expr("char(160)"),
                F.lit("\N{THIN SPACE}"),
                F.col("text"),
                F.lit(" ."),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return normalize_text(messy).select("doc_id", "norm_text")


def _normalize_text_sql() -> str:
    from etl_global_mobility_spark.operators.text import (
        NORM_CTRL_RE,
        NORM_PUNCT_RE,
        NORM_WS_RE,
    )

    backref = "\\1"
    return f"""
    WITH messy AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN chr(9) || text || chr(7) || '  '
                  WHEN doc_id % 3 = 1 THEN chr(160) || chr(8201) || text || ' .'
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(t,
                '{NORM_CTRL_RE}', '', 'g'),
                '{NORM_WS_RE}', ' ', 'g'),
                '{NORM_PUNCT_RE}', '{backref}', 'g')) AS norm_text
    FROM messy
    """


def q_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage near-dup: LSH banding candidates, exact shingle-set
    Jaccard verify on candidates only (never all pairs) — the
    production pipeline shape; threshold applies to the EXACT value."""
    from etl_global_mobility_spark.operators.dedup import minhash_verified_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_verified_pairs(
        d, n_hashes=16, bands=4, k=3, jaccard_threshold=0.25
    )


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance: docs with doc_id % 10 == 0
    play the NEW shard arriving against a band-signature index built
    from everything else. The shard is shingled and broadcast; the
    index side is one map-only scan (no text, no corpus shuffle). The
    oracle proves incremental ≡ full: a complete MinHash recompute
    over the union restricted to pairs involving the shard."""
    from etl_global_mobility_spark.operators.dedup import (
        incremental_minhash_neardup,
        minhash_band_index,
    )

    d = load_table(spark, sf_dir, "documents")
    existing = d.filter(F.col("doc_id") % 10 != 0)
    shard = d.filter(F.col("doc_id") % 10 == 0)
    index = minhash_band_index(existing, n_hashes=16, bands=4, k=3)
    return incremental_minhash_neardup(
        index, shard, n_hashes=16, bands=4, k=3, jaccard_threshold=0.25
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split via a stable md5
    bucket of doc_id (operators/splits.py): reproducible on any cluster
    size, immune to partition layout — counts per (split, lang)."""
    from etl_global_mobility_spark.operators.splits import hash_split

    d = load_table(spark, sf_dir, "documents")
    return (
        hash_split(d)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: connected components over the exact
    n-gram Jaccard pair graph — each clustered document labeled with its
    cluster's minimum doc_id (the canonical representative)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=2, threshold=0.25)
    return dedup_components(pairs).select(F.col("id").alias("doc_id"), "component")


def q_community_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic majority label propagation over the near-dup pair
    graph (operators/graph.py label_propagation, 3 synchronous rounds,
    ties to the smallest label): the community complement of
    llm_dedup_components — components merge everything reachable,
    majority propagation splits connected regions along density, so a
    doc bridging two dup families lands with the larger one. The
    oracle unrolls the 3 rounds as CTEs (pure argmax-per-round
    semantics, engine-exact)."""
    from etl_global_mobility_spark.operators.graph import label_propagation

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=2, threshold=0.25)
    return label_propagation(
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
        n_iters=3,
    ).select(F.col("node").alias("doc_id"), F.col("label").alias("community"))


def q_labelprop_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounds-to-convergence diagnostic for the community operator
    (operators/graph.py label_propagation_convergence): per synchronous
    round, how many nodes of the near-dup pair graph changed label and
    what fraction of the graph that is — the operational dial behind
    llm_community_labelprop's fixed 3-round contract (the Raghavan
    et al. 2007 stopping rule is exactly this curve). Same graph, same
    round semantics (shared round body), one bounded node-keyed
    join+count per round; output is n_iters rows. The oracle unrolls
    the rounds as CTEs and diffs consecutive label frames."""
    from etl_global_mobility_spark.operators.graph import (
        label_propagation_convergence,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=2, threshold=0.25)
    return label_propagation_convergence(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        n_iters=3,
    )


def q_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-based quality pruning: drop the bottom quartile of
    the heuristic quality score — the distribution-relative curation
    cut (vs the absolute-threshold filter rules). The p25 threshold is
    ONE exact interpolated percentile (1-row broadcast); the score and
    the comparison are bit-portable, so the kept set is engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select("doc_id", quality_score("text").alias("quality"))
    thr = scored.agg(
        F.expr("percentile(quality, 0.25D)").alias("_p25")
    )
    return (
        scored.join(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("_p25"))
        .select("doc_id", "quality")
    )


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: MinHash near-dup pairs grouped
    by their (canonical) source pair — the leak-analysis report that
    shows WHERE duplication comes from (within one crawl vs across
    feeds) before choosing what to drop. Pair generation is the
    banded LSH join (never all-pairs); the source join touches only
    pair rows; sources canonicalize with least/greatest so the matrix
    is triangular."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        d, n_hashes=16, bands=4, k=3, jaccard_threshold=0.25
    ).select("id_a", "id_b")
    src = d.select(F.col("doc_id"), F.col("source"))
    a = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")
    )
    b = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup audit report: the cluster-size histogram of the near-dup
    component graph plus the duplicate-document count each size class
    removes (size − 1 per cluster) — the number a curation run reports
    before committing a dedup pass. Covers CLUSTERED documents only
    (singletons never enter the pair graph). Cost beyond the pair
    graph: two bounded aggregations."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=2, threshold=0.25)
    comp = dedup_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("cluster_size") - F.lit(1)).alias("dup_docs"),
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return cosine_topk_exact(e, queries, k=5)


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_global_mobility_spark.operators.retrieval import mmr_rerank

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 4)
    return mmr_rerank(e, queries, k=5, n_candidates=10, lam=0.7, div=0.3)


def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return lsh_ann_candidates(e, queries, dim=64, n_planes=6, k=5)


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return ivf_topk(e, queries, n_cells=16, nprobe=2, k=5)


def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: map-only encode (8 subspaces × 32
    centroids), ADC shortlist of 40 via m table lookups per pair,
    exact squared-L2 re-rank of the shortlist only."""
    from etl_global_mobility_spark.operators.similarity import (
        pq_codebook_from_corpus,
        pq_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    book = pq_codebook_from_corpus(e, dim=64, m=8, k=32)
    return pq_topk(e, queries, book, k=5, rerank=40)


def _pq_ann_sql(
    dim: int = 64,
    m: int = 8,
    kc: int = 32,
    rerank: int = 40,
    k: int = 5,
    n_queries: int = 8,
) -> str:
    """DuckDB mirror of pq_codebook_from_corpus + pq_topk: the codebook
    is rebuilt from the table (k lowest-id rows' subvectors), codes are
    per-(row, subspace) argmins, and the ADC sum is the same fixed-order
    left fold Spark unrolls (FP addition is order-sensitive)."""
    sub = dim // m
    sl_c = f"list_slice(c.emb, j.j*{sub}+1, j.j*{sub}+{sub})"
    sl_s = f"list_slice(s.emb, j.j*{sub}+1, j.j*{sub}+{sub})"
    fold = f"CAST(0.0 AS DOUBLE)"
    for j in range(m):
        fold = f"({fold} + max(CASE WHEN j = {j} THEN d END))"
    return f"""
    WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, emb
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings ORDER BY vec_id LIMIT {kc})
    ), subd AS (
      -- shift-invariant score ||c||^2 - 2 s.c (the row's own ||s||^2
      -- is constant per (row, subspace) so it cancels in both the
      -- encode argmin and every per-query ADC ranking; Spark drops it
      -- the same way)
      SELECT c.vec_id, s.cid, j.j,
             list_dot_product({sl_s}, {sl_s})
             - 2 * list_dot_product({sl_c}, {sl_s}) AS d
      FROM corpus c
      CROSS JOIN seeds s
      CROSS JOIN (SELECT unnest(range({m})) AS j) j
    ), enc AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT vec_id, j, cid,
               row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
        FROM subd) WHERE rn = 1
    ), adc AS (
      SELECT e.vec_id AS c_id, t.vec_id AS q_id, e.j, t.d
      FROM enc e JOIN subd t
        ON t.j = e.j AND t.cid = e.code
       AND t.vec_id < {n_queries} AND t.vec_id <> e.vec_id
    ), shortlist AS (
      SELECT q_id, c_id FROM (
        SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY approx_dist, c_id) AS rn
        FROM (SELECT q_id, c_id, {fold} AS approx_dist
              FROM adc GROUP BY q_id, c_id)
      ) WHERE rn <= {rerank}
    ), rer AS (
      SELECT sh.q_id, sh.c_id,
             list_dot_product(ce.emb, ce.emb)
             - 2 * list_dot_product(ce.emb, qe.emb)
             + list_dot_product(qe.emb, qe.emb) AS dist
      FROM shortlist sh
      JOIN corpus ce ON ce.vec_id = sh.c_id
      JOIN corpus qe ON qe.vec_id = sh.q_id
    )
    SELECT q_id, rank, c_id, dist FROM (
      SELECT q_id, c_id, dist,
             row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS rank
      FROM rer) WHERE rank <= {k}
    """


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(e, dim=64, threshold=0.3, n_planes=4)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: coarse-quantize embeddings into 16 cells, mark any
    vector with a smaller-id cell-mate at cosine ≥ 0.35 as a semantic
    duplicate of its smallest such neighbor (0.35 sits in the bulk of
    this synthetic data's within-cell cosine range; real corpora use
    ~0.95+)."""
    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(e, n_cells=16, threshold=0.35)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference (fastText/logreg-shaped
    curation): bit-exact logit from literal weights, threshold at 0."""
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )

    d = load_table(spark, sf_dir, "documents")
    return quality_classifier(d).select("doc_id", "quality_logit", "clf_keep")


def _clf_cte_and_logit(
    weights: dict[str, float] | None = None,
) -> tuple[str, str]:
    """(``m`` CTE body, logit expression over its feature columns) —
    the DuckDB mirror of quality_rules.quality_classifier: identical
    feature expressions (shared shapes with _filter_rules_cte_block)
    and the same left-to-right logit fold — bit-exact doubles. Shared
    by the standalone classifier mirror, the trained-artifact mirror
    and the preference-pair oracle. ``weights`` values must be exact
    binary fractions so the printed literal parses to the same double
    in both engines."""
    from etl_global_mobility_spark.operators.quality_rules import (
        CLASSIFIER_WEIGHTS,
    )

    W = weights if weights is not None else CLASSIFIER_WEIGHTS
    sw = "['the', 'a', 'of', 'to', 'and', 'in']"
    logit = (
        f"{W['bias']} + {W['n_words_capped']} * f_nw + {W['mean_word_len']} * f_mwl"
        f" + {W['distinct_ratio']} * f_dr + {W['digit_ratio']} * f_dig"
        f" + {W['symbol_ratio']} * f_sym + {W['has_stopword']} * f_sw"
    )
    cte = f"""m AS (
      SELECT doc_id,
        CAST(least(len({TOKS}), 256) AS DOUBLE) / 256.0 AS f_nw,
        CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
          / greatest(len({TOKS}), 1) AS f_mwl,
        CAST(len(list_distinct({TOKS})) AS DOUBLE)
          / greatest(len({TOKS}), 1) AS f_dr,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1) AS f_dig,
        CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1) AS f_sym,
        CAST(len(list_intersect({TOKS}, {sw})) > 0 AS DOUBLE) AS f_sw
      FROM documents
    )"""
    return cte, logit


def _quality_classifier_sql(weights: dict[str, float] | None = None) -> str:
    cte, logit = _clf_cte_and_logit(weights)
    return f"""
    WITH {cte}
    SELECT doc_id, {logit} AS quality_logit,
           COALESCE(({logit}) >= 0.0, FALSE) AS clf_keep
    FROM m
    """


def q_quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-model ARTIFACT round-trip as an oracle row: the
    frozen trained-weight snapshot is persisted (parquet + manifest,
    like the BPE/ANN artifacts), reloaded with manifest validation,
    and every document is scored through the RELOADED weights on the
    same bit-exact inference path. Parquet doubles round-trip
    losslessly, so the oracle — the logit with those weights as SQL
    literals — must hash-match; any drift in save/load breaks it."""
    from etl_global_mobility_spark.corpus.relational import _scratch_dir
    from etl_global_mobility_spark.operators.quality_rules import (
        TRAINED_SNAPSHOT_WEIGHTS,
        load_classifier_weights,
        quality_classifier,
        save_classifier_weights,
    )

    # per-(sf, process) scratch: the train->persist->reload->infer
    # loop must prove itself EVERY run, and a fixed path let a second
    # driver process's save race this one's load (round-11 scratch
    # isolation sweep, same class as rel_source_text_wholetext)
    path = _scratch_dir("clf_model", sf_dir)
    save_classifier_weights(spark, TRAINED_SNAPSHOT_WEIGHTS, path)
    loaded = load_classifier_weights(spark, path)
    d = load_table(spark, sf_dir, "documents")
    return quality_classifier(d, weights=loaded).select(
        "doc_id", "quality_logit", "clf_keep"
    )


def q_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (lexical) fused with exact cosine
    top-20 for query vector 5 (dense, embedding i ↔ document i) via
    Reciprocal Rank Fusion — the standard RAG retrieval combiner."""
    from etl_global_mobility_spark.operators.retrieval import bm25_topk, rrf_fuse
    from etl_global_mobility_spark.operators.similarity import cosine_topk_exact

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bm = bm25_topk(d, BM25_TERMS, top_k=20).select("doc_id", "rank")
    qv = e.filter(F.col("vec_id") == 5)
    cos = cosine_topk_exact(e, qv, k=20).select(
        F.col("c_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([bm, cos], k=60)


def _hybrid_rrf_sql(k: int = 60, top_k: int = 20, qvec: int = 5) -> str:
    """DuckDB mirror of rrf_fuse over the BM25 mirror (embedded as a
    subquery) and the exact-cosine ranking: same fixed fold
    0.0 + coalesce(bm) + coalesce(cos), same (score DESC, id) re-rank."""
    cos = _COS.replace("a.embedding", "c.embedding").replace(
        "b.embedding", "q.embedding"
    )
    return f"""
    WITH bm AS (
      SELECT doc_id, rank FROM ({_bm25_sql(top_k=top_k)})
    ), cosr AS (
      SELECT doc_id, rank FROM (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (ORDER BY {cos} DESC, c.vec_id) AS rank
        FROM embeddings c, embeddings q
        WHERE q.vec_id = {qvec} AND c.vec_id <> {qvec}
          AND NOT isnan({cos})
      ) WHERE rank <= {top_k}
    ), fused AS (
      SELECT COALESCE(bm.doc_id, cosr.doc_id) AS doc_id,
             0.0 + COALESCE(1.0 / ({k}.0 + bm.rank), 0.0)
                 + COALESCE(1.0 / ({k}.0 + cosr.rank), 0.0) AS rrf_score,
             CAST(bm.rank IS NOT NULL AS INT)
               + CAST(cosr.rank IS NOT NULL AS INT) AS n_rankers
      FROM bm FULL OUTER JOIN cosr ON bm.doc_id = cosr.doc_id
    )
    SELECT doc_id, rrf_score, n_rankers,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
             AS rrf_rank
    FROM fused
    """


def q_e2e_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining-data materialization as ONE fused
    Catalyst plan: classifier keep-filter → exact dedup → causal-LM
    example windows. The complement of llm_e2e_curation on the
    model-input side — raw text in, training-example inventory out,
    no intermediate materialization. Catalyst prunes the (unused
    here) padded id arrays out of the final projection."""
    from etl_global_mobility_spark.operators.dedup import exact_dedup
    from etl_global_mobility_spark.operators.packing import causal_lm_examples
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )

    d = load_table(spark, sf_dir, "documents")
    kept = quality_classifier(d).filter(F.col("clf_keep")).select("doc_id", "text")
    survivors = exact_dedup(kept).select("doc_id", "text")
    ex = causal_lm_examples(survivors, seq_len=64)
    return ex.select("doc_id", "example_start", "n_real")


def _e2e_training_examples_sql(
    seq_len: int = 64, vocab_size: int = 32000, seed: int = 0
) -> str:
    """Composed mirror: classifier CTE → keep-filter → sha256 min-id
    dedup → the causal-LM window arithmetic (only n_real is needed, so
    the mirror never builds the padded arrays either)."""
    cte, logit = _clf_cte_and_logit()
    tid = _md5_hash_sql("t", seed) + f" % {vocab_size}"
    return f"""
    WITH {cte}, clf AS (
      SELECT doc_id, {logit} AS s FROM m
    ), keep AS (
      SELECT d.doc_id, d.text FROM documents d JOIN clf USING (doc_id)
      WHERE COALESCE(clf.s >= 0.0, FALSE)
    ), dedup AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id) AS rn
        FROM keep
      ) WHERE rn = 1
    ), tok AS (
      SELECT doc_id, list_transform({TOKS}, t -> {tid}) AS ids FROM dedup
    ), ex AS (
      SELECT doc_id, ids, unnest(range(0, len(ids) - 1, {seq_len})) AS st
      FROM tok WHERE len(ids) >= 2
    )
    SELECT doc_id, CAST(st AS BIGINT) AS example_start,
           CAST(len(list_slice(ids, st + 1, st + {seq_len + 1})) - 1 AS BIGINT)
             AS n_real
    FROM ex
    """


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich arXiv:1508.07909):
    8 merge iterations over the corpus word-frequency table. Iterative
    (each merge depends on the previous rewrite), so no SQL oracle —
    correctness is anchored by the sequential-reference pytest
    (tests/test_llm_operators.py::test_bpe_training_matches_sequential_reference);
    the driver records the rows-only check on the ranked merge table."""
    from etl_global_mobility_spark.operators.bpe import train_bpe_merges

    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(d, n_merges=8, min_freq=2)
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string",
    )


def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core of one BPE merge iteration, made ORACLE-CHECKABLE
    (non-iterative slice of :func:`train_bpe_merges`): corpus word
    frequencies → per-word adjacent symbol pairs → frequency-weighted
    pair counts (the table the argmax picks the next merge from).
    Covers the word-frequency shuffle, the symbol split, the
    zip_with adjacent pairing, and the weighted aggregation — the
    iterative loop on top is pinned by the sequential-reference pytest.
    """
    from etl_global_mobility_spark.operators.bpe import (
        _adjacent_pairs,
        word_frequencies,
    )

    d = load_table(spark, sf_dir, "documents")
    wf = word_frequencies(d)
    symbols = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return (
        wf.select(F.explode(_adjacent_pairs(symbols)).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l_sym"), F.col("p.r").alias("r_sym"))
        .agg(F.sum("freq").alias("pair_freq"))
        .filter(F.col("pair_freq") >= 2)
    )


def _bpe_pair_stats_sql() -> str:
    return f"""
    WITH words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({TOKS}) AS w FROM documents) t
      GROUP BY w
    ), pos AS (
      SELECT word, freq, unnest(range(1, len(word))) AS i FROM words
    )
    SELECT substr(word, CAST(i AS INTEGER), 1) AS l_sym,
           substr(word, CAST(i AS INTEGER) + 1, 1) AS r_sym,
           CAST(sum(freq) AS BIGINT) AS pair_freq
    FROM pos GROUP BY 1, 2 HAVING sum(freq) >= 2
    """


def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed unigram-LM tokenizer training (Kudo
    arXiv:1804.10959): substring-seeded vocabulary fitted by
    forward-backward EM over the segmentation lattice, pruned to the
    target size — the top-down probabilistic contrast to
    ``llm_bpe_train``'s bottom-up greedy merges. Iterative with
    per-word dynamic programming, so no SQL oracle — correctness is
    anchored by the sequential-reference pytest
    (tests/test_llm_operators.py::test_unigram_training_matches_sequential_reference)
    and the partition-invariance test (DECIMAL-exact E-step sums);
    the driver records the rows-only check on the ranked vocabulary."""
    from etl_global_mobility_spark.operators.unigram import train_unigram_lm

    d = load_table(spark, sf_dir, "documents")
    vocab = train_unigram_lm(
        d,
        vocab_size=48,
        max_piece_len=4,
        seed_size=80,
        em_iters=2,
        max_rounds=3,
        max_words=4_000,
    )
    return spark.createDataFrame(
        [(i, p, lp) for i, (p, lp) in enumerate(vocab)],
        "rank int, piece string, logprob double",
    )


def q_unigram_seed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram trainer's seed-candidate table, made
    ORACLE-CHECKABLE (non-iterative slice of :func:`q_unigram_train`,
    the analog of ``llm_bpe_pair_stats``): corpus word frequencies →
    every word substring up to 4 chars → frequency-weighted counts
    (the table the trainer's vocabulary initialization ranks).
    Covers the word-frequency shuffle and the substring explode; the
    EM loop on top is pinned by the sequential-reference pytest."""
    from etl_global_mobility_spark.operators.unigram import seed_piece_stats

    d = load_table(spark, sf_dir, "documents")
    return seed_piece_stats(d, max_piece_len=4, min_freq=2)


def _unigram_seed_stats_sql() -> str:
    return f"""
    WITH words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({TOKS}) AS w FROM documents) t
      GROUP BY w
    ), pos AS (
      SELECT word, freq, unnest(range(1, len(word) + 1)) AS i FROM words
    ), cand AS (
      SELECT word, freq, i, unnest(range(1, 5)) AS l FROM pos
    )
    SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
           CAST(sum(freq) AS BIGINT) AS piece_freq
    FROM cand
    WHERE i + l - 1 <= len(word)
    GROUP BY 1 HAVING sum(freq) >= 2
    """


def q_trigram_backoff_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram Stupid-Backoff LM perplexity filter (operators/lm.py,
    Brants EMNLP'07 scoring inside the CCNet filter shape, Wenzek
    arXiv:1911.00359): the reference model trains on the ``src0``
    slice (the held-out "Wikipedia" role) and every document is scored
    by its mean reciprocal token score in exact integer micro-units —
    rational arithmetic end to end, so Spark and DuckDB agree
    bit-for-bit where ln()-based perplexity would not."""
    from etl_global_mobility_spark.operators.lm import backoff_lm_rarity

    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("source") == "src0")
    return backoff_lm_rarity(d, ref)


def _trigram_backoff_rarity_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, source, {TOKS} AS t FROM documents
    ), ref3 AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c3 FROM (
        SELECT array_to_string(t[i:i + 2], ' ') AS g
        FROM (SELECT t, unnest(range(1, len(t) - 1)) AS i
              FROM toks WHERE source = 'src0' AND len(t) >= 3)
      ) GROUP BY g
    ), ref2 AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c2 FROM (
        SELECT array_to_string(t[i:i + 1], ' ') AS g
        FROM (SELECT t, unnest(range(1, len(t))) AS i
              FROM toks WHERE source = 'src0' AND len(t) >= 2)
      ) GROUP BY g
    ), ref1 AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c1 FROM (
        SELECT unnest(t) AS g FROM toks WHERE source = 'src0'
      ) GROUP BY g
    ), tot AS (
      SELECT CAST(coalesce(sum(c1), 0) AS BIGINT) AS n_total FROM ref1
    ), pos AS (
      SELECT doc_id,
             array_to_string(t[i - 2:i], ' ') AS tri,
             array_to_string(t[i - 2:i - 1], ' ') AS bctx,
             array_to_string(t[i - 1:i], ' ') AS bi,
             t[CAST(i AS INTEGER) - 1] AS uctx,
             t[CAST(i AS INTEGER)] AS uni
      FROM (SELECT doc_id, t, unnest(range(3, len(t) + 1)) AS i
            FROM toks WHERE len(t) >= 3)
    ), tf AS (
      SELECT doc_id, tri, bctx, bi, uctx, uni,
             CAST(count(*) AS BIGINT) AS tf
      FROM pos GROUP BY ALL
    ), sc AS (
      SELECT f.doc_id, f.tf,
             CASE
               WHEN r3.c3 IS NOT NULL
                 THEN (bc.c2 * CAST(1000000 AS BIGINT)) // r3.c3
               WHEN r2.c2 IS NOT NULL
                 THEN (uc.c1 * CAST(1000000 AS BIGINT) * 5) // (r2.c2 * 2)
               WHEN r1.c1 IS NOT NULL
                 THEN (tot.n_total * CAST(1000000 AS BIGINT) * 25)
                      // (r1.c1 * 4)
               ELSE (tot.n_total * CAST(1000000 AS BIGINT) * 25) // 4
             END AS micro,
             CASE WHEN r3.c3 IS NULL THEN 1 ELSE 0 END AS is_backoff,
             CASE WHEN r1.c1 IS NULL THEN 1 ELSE 0 END AS is_oov
      FROM tf f
      LEFT JOIN ref3 r3 ON f.tri = r3.g
      LEFT JOIN ref2 bc ON f.bctx = bc.g
      LEFT JOIN ref2 r2 ON f.bi = r2.g
      LEFT JOIN ref1 uc ON f.uctx = uc.g
      LEFT JOIN ref1 r1 ON f.uni = r1.g
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_scored,
           CAST(sum(tf * micro) AS DOUBLE)
             / (CAST(sum(tf) AS DOUBLE) * 1000000.0) AS mean_rarity,
           CAST(sum(tf * is_backoff) AS DOUBLE)
             / CAST(sum(tf) AS DOUBLE) AS backoff_frac,
           CAST(sum(tf * is_oov) AS DOUBLE)
             / CAST(sum(tf) AS DOUBLE) AS oov_frac
    FROM sc GROUP BY doc_id
    """


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source balancing (T=0.5): the mT5/XLM-R
    mixture-flattening resampler. sqrt+division are correctly-rounded
    IEEE ops, so rates — and the md5 sample they gate — are
    bit-reproducible on an independent engine."""
    from etl_global_mobility_spark.operators.splits import temperature_mix

    d = load_table(spark, sf_dir, "documents")
    return temperature_mix(d, temperature=0.5).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "rate",
    )


def _temperature_mix_sql() -> str:
    bucket = _md5_hash_sql("CAST(doc_id AS VARCHAR)", 4)
    return f"""
    WITH tok AS (
      SELECT doc_id, source, CAST(len({TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ), per_src AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      FROM tok GROUP BY source
    ), rates AS (
      -- t_min over sources WITH token mass; a zero-token source rates
      -- 0 (dropped) and must not zero every other source's rate
      SELECT source,
             CASE WHEN src_tokens > 0 THEN
               sqrt(CAST((SELECT min(src_tokens) FROM per_src
                          WHERE src_tokens > 0) AS DOUBLE)
                    / CAST(src_tokens AS DOUBLE))
             ELSE CAST(0.0 AS DOUBLE) END AS rate
      FROM per_src
    )
    SELECT t.doc_id, t.source, t.n_tokens, r.rate
    FROM tok t JOIN rates r USING (source)
    WHERE CAST(({bucket}) % 10000 AS DOUBLE) / 10000.0 < r.rate
    """


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste planning report at seq_len=32 — one corpus scan +
    one bounded-key aggregation instead of materializing the examples."""
    from etl_global_mobility_spark.operators.packing import (
        packing_efficiency_report,
    )

    d = load_table(spark, sf_dir, "documents")
    return packing_efficiency_report(d, seq_len=32)


def _packing_efficiency_sql(seq_len: int = 32) -> str:
    return f"""
    WITH t AS (
      SELECT source, CAST(len({TOKS}) AS BIGINT) AS nt FROM documents
    ), agg AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN nt >= 2 THEN 0 ELSE 1 END) AS BIGINT) AS n_skipped,
             CAST(sum(CASE WHEN nt >= 2 THEN (nt - 2) // {seq_len} + 1 ELSE 0 END)
                  AS BIGINT) AS n_examples,
             CAST(sum(CASE WHEN nt >= 2 THEN nt - 1 ELSE 0 END) AS BIGINT)
               AS real_tokens
      FROM t GROUP BY source
    )
    SELECT source, n_docs, n_skipped, n_examples, real_tokens,
           n_examples * {seq_len} AS slot_tokens,
           CASE WHEN n_examples > 0
                THEN CAST(n_examples * {seq_len} - real_tokens AS DOUBLE)
                     / CAST(n_examples * {seq_len} AS DOUBLE) END AS pad_fraction
    FROM agg
    """


def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication accounting (fixed-k form of Lee et
    al. arXiv:2107.06499): per-document fraction of tokens covered by
    k-grams shared with other documents."""
    from etl_global_mobility_spark.operators.dedup import (
        duplicated_ngram_spans,
    )

    d = load_table(spark, sf_dir, "documents")
    return duplicated_ngram_spans(d, k=3)


def _dup_ngram_spans_sql(k: int = 3, min_docs: int = 2) -> str:
    gram_hash = _md5_hash_sql("grams[CAST(i AS INT)]", 0)
    return f"""
    WITH base AS (
      SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tokens,
             list_transform(
               range(1, greatest(len({TOKS}) - {k - 1}, 0) + 1),
               i -> array_to_string(({TOKS})[i:i + {k - 1}], ' ')) AS grams
      FROM documents
    ), occ AS (
      SELECT doc_id, i - 1 AS pos, {gram_hash} AS g
      FROM (SELECT doc_id, grams, unnest(range(1, len(grams) + 1)) AS i
            FROM base)
    ), dupg AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ)
      GROUP BY g HAVING count(*) >= {min_docs}
    ), dup AS (
      SELECT occ.doc_id, occ.pos FROM occ JOIN dupg USING (g)
    ), cov AS (
      SELECT doc_id, pos, pos + unnest(range(0, {k})) AS t FROM dup
    ), stats AS (
      SELECT doc_id, count(DISTINCT pos) AS n_dup_grams,
             count(DISTINCT t) AS covered_tokens
      FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, CAST(len(b.grams) AS BIGINT) AS n_grams,
           CAST(coalesce(s.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(coalesce(s.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           CASE WHEN b.n_tokens > 0
                THEN CAST(coalesce(s.covered_tokens, 0) AS DOUBLE)
                     / CAST(b.n_tokens AS DOUBLE) END AS dup_token_fraction
    FROM base b LEFT JOIN stats s USING (doc_id)
    """


def q_dup_spans_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition accounting (operators/dedup.py
    within_doc_repeated_spans, k=3 — the Gopher duplicate-n-gram
    quality signal, Rae et al. 2021 §A1.1): complement of
    llm_dup_ngram_spans' cross-document scope. The driver corpus has
    little natural repetition, so every 4th document is deterministically
    DOUBLED (text + ' ' + text) — those must report near-total
    coverage, the rest only their natural repeats; zero shuffles, one
    map-only projection."""
    from etl_global_mobility_spark.operators.dedup import (
        within_doc_repeated_spans,
    )

    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return within_doc_repeated_spans(staged, k=3)


def _dup_spans_within_sql(k: int = 3) -> str:
    return f"""
    WITH staged AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN text || ' ' || text
                  ELSE text END AS text
      FROM documents
    ), base AS (
      SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tokens,
             list_transform(
               range(1, greatest(len({TOKS}) - {k - 1}, 0) + 1),
               i -> array_to_string(({TOKS})[i:i + {k - 1}], ' ')) AS grams
      FROM staged
    ), occ AS (
      SELECT doc_id, i - 1 AS pos, grams[CAST(i AS INT)] AS gram
      FROM (SELECT doc_id, grams, unnest(range(1, len(grams) + 1)) AS i
            FROM base)
    ), rep AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               count(*) OVER (PARTITION BY doc_id, gram) AS c
        FROM occ)
      WHERE c >= 2
    ), cov AS (
      SELECT doc_id, pos, pos + unnest(range(0, {k})) AS t FROM rep
    ), stats AS (
      SELECT doc_id, count(DISTINCT pos) AS n_rep_grams,
             count(DISTINCT t) AS covered_tokens
      FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, CAST(len(b.grams) AS BIGINT) AS n_grams,
           CAST(coalesce(s.n_rep_grams, 0) AS BIGINT) AS n_rep_grams,
           CAST(coalesce(s.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           CASE WHEN b.n_tokens > 0
                THEN CAST(coalesce(s.covered_tokens, 0) AS DOUBLE)
                     / CAST(b.n_tokens AS DOUBLE) END AS rep_token_fraction
    FROM base b LEFT JOIN stats s USING (doc_id)
    """


def q_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length exact-substring dedup (operators/dedup.py
    maximal_shared_substrings, min_len=20 — the MAXIMAL-span
    "ExactSubstr" semantics of Lee et al. arXiv:2107.06499 §4.1 that
    llm_dup_ngram_spans' fixed-k form cannot express): maximal
    verbatim shared token runs per document pair. Deterministic
    planting makes the gap measurable: documents with doc_id % 20 == 3
    get a 200-token passage appended, shared ONLY within their
    100-id block (bounded fan-out: C(5,2) pairs x 181 anchors per
    block) — fixed-k span-union reports those docs as ~80% covered but
    says the same about scattered-trigram text; this query must report
    the pair's max_len_tokens as exactly 200, the paper's cut unit.
    The oracle recomputes anchors, alignment diagonals, and
    gaps-and-islands runs from the gram STRINGS in DuckDB."""
    from etl_global_mobility_spark.operators.dedup import (
        maximal_shared_substrings,
    )

    d = load_table(spark, sf_dir, "documents")
    block = F.floor(F.col("doc_id") / F.lit(100)).cast("bigint")
    passage = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(200)),
            lambda i: F.concat(
                F.lit("planted"),
                block.cast("string"),
                F.lit("x"),
                i.cast("string"),
            ),
        ),
    )
    staged = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 3,
            F.concat(F.col("text"), F.lit(" "), passage),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # max_anchor_occ=64: inert on this corpus (natural max occurrence
    # 4, planted anchors 5 per block) but bounds the hostile worst
    # case — mirrored exactly in the oracle's `ok` CTE
    return maximal_shared_substrings(staged, min_len=20, max_anchor_occ=64)


def _dup_substring_spans_sql(min_len: int = 20, max_anchor_occ: int = 64) -> str:
    return f"""
    WITH staged AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 = 3 THEN text || ' ' || array_to_string(
                    list_transform(range(1, 201),
                      i -> 'planted' || CAST(doc_id // 100 AS VARCHAR)
                           || 'x' || CAST(i AS VARCHAR)), ' ')
                  ELSE text END AS text
      FROM documents
    ), base AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(len({TOKS}) - {min_len - 1}, 0) + 1),
               i -> array_to_string(({TOKS})[i:i + {min_len - 1}], ' ')) AS grams
      FROM staged
    ), occ_all AS (
      SELECT doc_id, i - 1 AS pos, grams[CAST(i AS INT)] AS gram
      FROM (SELECT doc_id, grams, unnest(range(1, len(grams) + 1)) AS i
            FROM base)
    ), ok AS (
      SELECT gram FROM occ_all GROUP BY gram
      HAVING count(*) <= {max_anchor_occ}
    ), occ AS (
      SELECT occ_all.* FROM occ_all JOIN ok USING (gram)
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, a.pos - b.pos AS diag
      FROM occ a JOIN occ b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ), isl AS (
      SELECT doc_a, doc_b, diag, pa,
             pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                     ORDER BY pa) AS island
      FROM pairs
    ), runs AS (
      SELECT doc_a, doc_b, count(*) + {min_len} - 1 AS span_len
      FROM isl GROUP BY doc_a, doc_b, diag, island
    )
    SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(span_len) AS BIGINT) AS max_len_tokens,
           CAST(sum(span_len) AS BIGINT) AS sum_span_tokens
    FROM runs GROUP BY doc_a, doc_b
    """


def q_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boundary-respecting RAG chunking at a 48-token budget
    (operators.packing.sentence_chunks). The driver corpus carries no
    terminal punctuation, so the query derives a deterministic
    multi-sentence text (suffixing '. ... ! ... ?' segments) — the
    oracle row then genuinely exercises segmentation and multi-chunk
    assignment, not just the degenerate one-sentence path."""
    from etl_global_mobility_spark.operators.packing import sentence_chunks

    d = load_table(spark, sf_dir, "documents")
    punctuated = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(". Second sentence about "),
            F.col("lang"),
            F.lit("! Third sentence from source "),
            F.col("source"),
            F.lit("? Final short tail."),
        ).alias("text"),
    )
    return sentence_chunks(punctuated, budget=48)


def _sentence_chunks_sql(budget: int = 48) -> str:
    sent_toks = (
        "list_filter(string_split_regex(lower(trim(sentence)), '[ \\t\\n\\x0b\\f\\r]+'), "
        "x -> len(x) > 0)"
    )
    return f"""
    WITH punct AS (
      SELECT doc_id,
             text || '. Second sentence about ' || lang
                  || '! Third sentence from source ' || source
                  || '? Final short tail.' AS text
      FROM documents
    ), m AS (
      SELECT doc_id,
             string_split(regexp_replace(text, '([.!?]+)[ \\t\\n\\x0b\\f\\r]+', '\\1' || chr(1), 'g'),
                          chr(1)) AS parts
      FROM punct
    ), raw AS (
      SELECT doc_id, i, parts[CAST(i AS INT)] AS sentence
      FROM (SELECT doc_id, parts, unnest(range(1, len(parts) + 1)) AS i FROM m)
    ), sen AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS si,
             sentence,
             CAST(len({sent_toks}) AS BIGINT) AS s_toks
      FROM raw WHERE len(trim(sentence)) > 0
    ), c AS (
      SELECT doc_id, si, sentence, s_toks,
             sum(s_toks) OVER (PARTITION BY doc_id ORDER BY si
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM sen
    )
    SELECT doc_id,
           CAST((greatest(cum, 1) - 1) // {budget} AS BIGINT) AS chunk_id,
           count(*) AS n_sentences,
           CAST(sum(s_toks) AS BIGINT) AS chunk_tokens,
           string_agg(sentence, ' ' ORDER BY si) AS chunk_text
    FROM c GROUP BY doc_id, (greatest(cum, 1) - 1) // {budget}
    """


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reward-model / DPO preference pairs: per (source, lang) group,
    the classifier's best-scored document paired against its worst,
    with the logit margin."""
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )
    from etl_global_mobility_spark.operators.splits import preference_pairs

    d = load_table(spark, sf_dir, "documents")
    scored = quality_classifier(d)
    return preference_pairs(scored, ["source", "lang"])


def _preference_pairs_sql() -> str:
    """DuckDB mirror of splits.preference_pairs over the classifier
    scores: same NULL-exclusion, same (score, id) tie-break orderings,
    same double subtraction for the margin."""
    cte, logit = _clf_cte_and_logit()
    return f"""
    WITH {cte}, clf AS (
      SELECT doc_id, {logit} AS s FROM m
    ), j AS (
      SELECT d.source, d.lang, d.doc_id, clf.s
      FROM documents d JOIN clf USING (doc_id)
      WHERE clf.s IS NOT NULL
    ), r AS (
      SELECT source, lang, doc_id, s,
             row_number() OVER (PARTITION BY source, lang
                                ORDER BY s DESC, doc_id) AS rc,
             row_number() OVER (PARTITION BY source, lang
                                ORDER BY s ASC, doc_id DESC) AS rr,
             count(*) OVER (PARTITION BY source, lang) AS n
      FROM j
    )
    SELECT c.source, c.lang, c.doc_id AS chosen_id,
           rj.doc_id AS rejected_id, c.s - rj.s AS margin
    FROM (SELECT * FROM r WHERE rc = 1 AND n >= 2) c
    JOIN (SELECT * FROM r WHERE rr = 1) rj USING (source, lang)
    """


def q_causal_lm_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-token-prediction example materialization (seq_len=32):
    hashed token ids windowed at stride seq_len with one-token overlap,
    inputs right-padded with 0, labels with -100. Arrays stringify for
    the driver compare (its canonicalizer rejects array cells)."""
    from etl_global_mobility_spark.operators.packing import causal_lm_examples

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ex = causal_lm_examples(d, seq_len=32)
    return ex.select(
        "doc_id",
        "example_start",
        F.array_join("input_ids", ",").alias("input_str"),
        F.array_join("labels", ",").alias("labels_str"),
        "n_real",
    )


def _causal_lm_sql(
    seq_len: int = 32,
    vocab_size: int = 32000,
    pad_id: int = 0,
    ignore_label: int = -100,
    seed: int = 0,
    max_doc: int = 200,
) -> str:
    """DuckDB mirror of operators.packing.causal_lm_examples. DuckDB
    list_slice is 1-based END-inclusive (Spark's F.slice takes a
    LENGTH); range(n) with n <= 0 is empty, covering the no-pad case."""
    tid = _md5_hash_sql("t", seed) + f" % {vocab_size}"
    return f"""
    WITH tok AS (
      SELECT doc_id, list_transform({TOKS}, t -> {tid}) AS ids
      FROM documents WHERE doc_id < {max_doc}
    ), ex AS (
      SELECT doc_id, ids, unnest(range(0, len(ids) - 1, {seq_len})) AS s
      FROM tok WHERE len(ids) >= 2
    ), win AS (
      SELECT doc_id, CAST(s AS BIGINT) AS example_start,
             list_slice(ids, s + 1, s + {seq_len + 1}) AS w
      FROM ex
    )
    SELECT doc_id, example_start,
           array_to_string(list_concat(
             list_slice(w, 1, {seq_len}),
             list_transform(range({seq_len} - least(len(w), {seq_len})),
                            x -> CAST({pad_id} AS BIGINT))), ',') AS input_str,
           array_to_string(list_concat(
             list_slice(w, 2, {seq_len + 1}),
             list_transform(range({seq_len} - (len(w) - 1)),
                            x -> CAST({ignore_label} AS BIGINT))), ',') AS labels_str,
           CAST(len(w) - 1 AS BIGINT) AS n_real
    FROM win
    """


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority label among the 10 exact nearest neighbors per query —
    a classification-by-retrieval pipeline stage."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    topk = cosine_topk_exact(e, queries, k=10)
    labels = e.select(F.col("vec_id").alias("c_id"), F.col("label"))
    return (
        topk.join(labels, "c_id")
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "q_id"
                ).orderBy(F.col("votes").desc(), F.col("label"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("label").alias("majority_label"), "votes")
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: top-token fraction,
    duplicate-2-gram fraction, top-2-gram fraction per document."""
    from etl_global_mobility_spark.operators.signals import repetition_signals

    d = load_table(spark, sf_dir, "documents")
    return repetition_signals(d, k=2)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs whose 2-gram shingle sets overlap
    a held-out 'benchmark' slice (doc_id % 50 == 0) above 60% — the
    pre-training hygiene step that keeps eval data out of the corpus."""
    from etl_global_mobility_spark.operators.signals import contamination_check

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return contamination_check(corpus, bench, k=2, threshold=0.6)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: deterministic synthetic emails/phones are injected
    into a slice of documents, then redacted to <EMAIL>/<PHONE> tokens.
    The oracle recomputes injection + regex pipeline independently, so
    counts AND the md5 of every redacted text must match."""
    from etl_global_mobility_spark.operators.text import pii_counts, redact_pii

    d = load_table(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit(" call +1 555 "),
                F.lpad((F.col("doc_id") % 10_000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_emails, n_phones = pii_counts("text")
    return injected.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redact_pii("text")).alias("redacted_md5"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus rebalancing: downsample each
    language at its own rate via a stable md5 bucket of doc_id."""
    from etl_global_mobility_spark.operators.splits import stratified_hash_sample

    d = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        d,
        strata_col="lang",
        rates={"en": 0.5, "es": 0.3, "fr": 0.2},
        default_rate=0.1,
        seed=1,
    ).select("doc_id", "lang")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (budget=256 tokens) per source
    shard; one summary row per training sequence."""
    from etl_global_mobility_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(d, budget=256, shard_col="source", order_col="doc_id")
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _pack_sequences_sql(budget: int) -> str:
    return f"""WITH toks AS (
             SELECT doc_id, source, CAST(len({TOKS}) AS BIGINT) AS n_tokens
             FROM documents),
           packed AS (
             SELECT source, doc_id, n_tokens,
                    CAST(floor((greatest(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id), 1) - 1)
                      / {budget}) AS BIGINT) AS seq_id
             FROM toks)
           SELECT source, seq_id, count(*) AS n_docs,
                  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
                  min(doc_id) AS first_doc, max(doc_id) AS last_doc
           FROM packed GROUP BY source, seq_id"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size=32, stride=24): one row
    per chunk, map-only explode."""
    from etl_global_mobility_spark.operators.packing import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_size=32, stride=24)


def _chunk_documents_sql(chunk_size: int, stride: int) -> str:
    return f"""WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
           starts AS (
             SELECT doc_id, t, unnest(range(0, len(t), {stride})) AS cs
             FROM toks)
           SELECT doc_id, CAST(cs AS BIGINT) AS chunk_start,
                  array_to_string(list_slice(t, cs + 1, cs + {chunk_size}), ' ')
                    AS chunk_text,
                  CAST(len(list_slice(t, cs + 1, cs + {chunk_size})) AS BIGINT)
                    AS chunk_tokens
           FROM starts"""


def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level boilerplate removal (line-level dedup analogue):
    drop 3-token segments appearing in > 5 distinct docs, reassemble."""
    from etl_global_mobility_spark.operators.dedup import strip_boilerplate

    d = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(d, seg_len=3, df_max=5)


def _strip_boilerplate_sql(seg_len: int, df_max: int) -> str:
    return f"""WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
           seg2 AS (
             SELECT doc_id, CAST(ss AS BIGINT) AS seg_start,
                    array_to_string(list_slice(t, ss + 1, ss + {seg_len}), ' ')
                      AS seg
             FROM (SELECT doc_id, t, unnest(range(0, len(t), {seg_len})) AS ss
                   FROM toks)),
           hot AS (SELECT seg FROM seg2 GROUP BY seg
                   HAVING count(DISTINCT doc_id) > {df_max}),
           kept AS (SELECT * FROM seg2
                    WHERE seg NOT IN (SELECT seg FROM hot)),
           rebuilt AS (
             SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_start) AS clean_text,
                    count(*) AS n_kept
             FROM kept GROUP BY doc_id),
           totals AS (SELECT doc_id, count(*) AS n_segs FROM seg2 GROUP BY doc_id)
           SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
                  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
                  CAST(t.n_segs - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
           FROM totals t LEFT JOIN rebuilt r USING (doc_id)"""


def q_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-16 corpus vocabulary (frequency, lexicographic ties) and the
    per-document OOV token fraction against it."""
    from etl_global_mobility_spark.operators.text import build_vocabulary, oov_rates

    d = load_table(spark, sf_dir, "documents")
    return oov_rates(d, build_vocabulary(d, top_k=16))


def _vocab_oov_sql(top_k: int = 16) -> str:
    return f"""WITH tok AS (
             SELECT doc_id, unnest({TOKS}) AS term FROM documents),
           vocab AS (
             SELECT term FROM (
               SELECT term, count(*) AS n FROM tok GROUP BY term
               ORDER BY n DESC, term LIMIT {top_k})),
           per AS (
             SELECT t.doc_id, count(*) AS n_tokens,
                    sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
             FROM tok t LEFT JOIN vocab v USING (term)
             GROUP BY t.doc_id)
           SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                  CAST(n_oov AS BIGINT) AS n_oov,
                  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
           FROM per"""


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorization: sparse L2-normalized 64-bucket
    term-frequency vectors, one row per non-zero bucket."""
    from etl_global_mobility_spark.operators.text import feature_hash_vectors

    d = load_table(spark, sf_dir, "documents")
    return feature_hash_vectors(d, n_buckets=64)


def _feature_hash_sql(n_buckets: int = 64, seed: int = 0) -> str:
    bucket = _md5_hash_sql("term", seed) + f" % {n_buckets}"
    return f"""WITH tok AS (
             SELECT doc_id, unnest({TOKS}) AS term FROM documents),
           cnt AS (
             SELECT doc_id, {bucket} AS bucket, count(*) AS c
             FROM tok GROUP BY doc_id, bucket),
           normed AS (
             SELECT doc_id, bucket, c,
                    sqrt(sum(c * c) OVER (PARTITION BY doc_id)) AS nrm
             FROM cnt)
           SELECT doc_id, bucket, CAST(c AS DOUBLE) / nrm AS weight
           FROM normed"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media plumbing: text bytes as opaque content → metadata →
    Arrow-batched (mapInPandas) feature stub. Oracle checks the
    JVM-computable metadata; the stub feature dims are asserted."""
    from etl_global_mobility_spark.operators.multimodal import (
        attach_media_metadata,
        documents_as_media,
        extract_features,
    )

    d = load_table(spark, sf_dir, "documents")
    media = attach_media_metadata(documents_as_media(d), mime="text/plain")
    feats = extract_features(media, dim=16)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "n_bytes",
        F.size("feature").alias("n_dim"),
    )


def q_asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join over the events stream: each purchase matched to the
    same user's most recent view at-or-before it (backward inclusive,
    ties to the larger event_id)."""
    from etl_global_mobility_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
    )
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id"
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_time="purchase_ts",
        right_time="ts",
        right_cols=["event_id", "ts"],
        tiebreak="event_id",
    ).select(
        "purchase_id",
        "purchase_ts",
        "user_id",
        F.col("asof_event_id").alias("view_id"),
        F.col("asof_ts").alias("view_ts"),
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: binary rows → 1→N frame rows
    through an Arrow-batched mapInPandas (decode stubbed to byte ranges)."""
    from etl_global_mobility_spark.operators.multimodal import (
        documents_as_media,
        sample_frames,
    )

    d = load_table(spark, sf_dir, "documents")
    return sample_frames(documents_as_media(d), frame_bytes=256, max_frames=8)


# ------------------------------------------------------ oracle builders ----
def _shingles_all_sql(k: int) -> str:
    """DuckDB mirror of operators.signals._word_shingles_all (duplicates
    kept, unlike _shingles_sql's distinct-set semantics)."""
    return (
        f"list_transform("
        f"range(1, greatest(len({TOKS}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string(({TOKS})[i:i + {k - 1}], ' '))"
    )


def _repetition_sql(k: int = 2) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id AS id, unnest({TOKS}) AS t FROM documents
    ), tc AS (
      SELECT id, t, count(*) AS c FROM toks GROUP BY 1, 2
    ), ts AS (
      SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top_tok
      FROM tc GROUP BY 1
    ), grams AS (
      SELECT doc_id AS id, unnest({_shingles_all_sql(k)}) AS g FROM documents
    ), gc AS (
      SELECT id, g, count(*) AS c FROM grams GROUP BY 1, 2
    ), gs AS (
      SELECT id, CAST(sum(c) AS BIGINT) AS n_grams,
             count(*) AS n_distinct, max(c) AS top_gram
      FROM gc GROUP BY 1
    )
    SELECT ts.id AS doc_id, ts.n_tokens,
           CAST(ts.top_tok AS DOUBLE) / ts.n_tokens AS top_token_frac,
           gs.n_grams,
           CAST(1 AS DOUBLE) - CAST(gs.n_distinct AS DOUBLE) / gs.n_grams
             AS dup_gram_frac,
           CAST(gs.top_gram AS DOUBLE) / gs.n_grams AS top_gram_frac
    FROM ts LEFT JOIN gs ON ts.id = gs.id
    """


def _contamination_sql(k: int = 2, thr: float = 0.6, bench_mod: int = 50) -> str:
    return f"""
    WITH cinv0 AS (
      SELECT doc_id AS c_id, unnest({_shingles_sql(k)}) AS s
      FROM documents WHERE doc_id % {bench_mod} <> 0
    ), cinv AS (
      SELECT c_id, s, count(*) OVER (PARTITION BY c_id) AS n_shingles
      FROM cinv0
    ), binv AS (
      SELECT doc_id AS bench_id, unnest({_shingles_sql(k)}) AS s
      FROM documents WHERE doc_id % {bench_mod} = 0
    ), hits AS (
      SELECT c_id, bench_id, n_shingles, count(*) AS n_hits
      FROM cinv JOIN binv USING (s) GROUP BY 1, 2, 3
    ), best AS (
      SELECT c_id, bench_id,
             CAST(n_hits AS DOUBLE) / n_shingles AS overlap_frac,
             row_number() OVER (
               PARTITION BY c_id
               ORDER BY CAST(n_hits AS DOUBLE) / n_shingles DESC, bench_id
             ) AS rn
      FROM hits
    )
    SELECT c_id AS doc_id, bench_id, overlap_frac
    FROM best WHERE rn = 1 AND overlap_frac >= {thr}
    """


def _pii_sql() -> str:
    from etl_global_mobility_spark.operators.text import PII_EMAIL_RE, PII_PHONE_RE

    return f"""
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN base || ' call +1 555 ' ||
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE base END AS text
      FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
                      CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE text END AS base
        FROM documents
      )
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS INT)
             AS n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PII_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM injected
    """


def _stratified_sample_sql(
    rates: dict[str, float], default_rate: float, seed: int
) -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {int(round(r * 10_000))}" for lang, r in rates.items()
    )
    bucket = _md5_hash_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""
    SELECT doc_id, lang FROM documents
    WHERE {bucket} % 10000 <
          (CASE lang {cases} ELSE {int(round(default_rate * 10_000))} END)
    """


def _salient_terms_sql(top_k: int = 5) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id AS id, lang AS grp, unnest({TOKS}) AS t FROM documents
    ), tf AS (
      SELECT grp, t, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dfq AS (
      SELECT t, count(*) AS df
      FROM (SELECT DISTINCT id, t FROM toks) GROUP BY 1
    ), scored AS (
      SELECT grp, t, tf, df, CAST(tf AS DOUBLE) / df AS score
      FROM tf JOIN dfq USING (t)
    ), ranked AS (
      SELECT grp, t, tf, df, score,
             row_number() OVER (PARTITION BY grp ORDER BY score DESC, t) AS rank
      FROM scored
    )
    SELECT grp AS lang, CAST(rank AS INT) AS rank, t AS term, tf, df, score
    FROM ranked WHERE rank <= {top_k}
    """
def _language_id_sql() -> str:
    from etl_global_mobility_spark.operators.text import STOPWORDS

    # coalesce mirrors Spark: NULL text scores 0 hits everywhere →
    # 'und' (without it every CASE condition is NULL and the row
    # falls through to the ELSE language — measured on hostile input)
    hits = {
        lang: (
            f"coalesce(len(list_filter({TOKS}, t -> list_contains("
            f"[{', '.join(repr(w) for w in words)}], t))), 0)"
        )
        for lang, words in STOPWORDS.items()
    }
    # argmax with tie → greatest language name (mirror of array_max on
    # (hits, lang) structs with langs sorted ascending)
    h = {k: f"h_{k}" for k in hits}
    return f"""
    WITH scored AS (
      SELECT doc_id, {', '.join(f"{v} AS {h[k]}" for k, v in hits.items())}
      FROM documents
    ), detected AS (
      SELECT CASE
        WHEN greatest({h['de']}, {h['en']}, {h['es']}, {h['fr']}) = 0 THEN 'und'
        WHEN {h['fr']} >= {h['de']} AND {h['fr']} >= {h['en']} AND {h['fr']} >= {h['es']} THEN 'fr'
        WHEN {h['es']} >= {h['de']} AND {h['es']} >= {h['en']} THEN 'es'
        WHEN {h['en']} >= {h['de']} THEN 'en'
        ELSE 'de' END AS detected
      FROM scored
    )
    SELECT detected, count(*) AS n FROM detected GROUP BY detected
    """


def _simhash_sql(bits: int = 32) -> str:
    tok_hash = _md5_hash_sql("tok", 0) + f" % {2**bits}"
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN b{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(bits))
    return f"""
    WITH exploded AS (
      SELECT doc_id AS id, unnest({TOKS}) AS tok FROM documents
    ), hashed AS (
      SELECT id, {tok_hash} AS h FROM exploded
    ), sums AS (
      SELECT id, {bit_sums} FROM hashed GROUP BY id
    )
    SELECT id AS doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums
    """


def _minhash_banded_cte(n_hashes: int = 16, bands: int = 4, k: int = 3) -> str:
    """The shared docs → signatures → band-bucket CTE chain (ending in
    ``banded(id, sig, band, bucket)``) — the SQL mirror of
    :func:`operators.dedup.minhash_band_index`, reused by the batch
    pair oracle, the incremental-maintenance oracle and the streaming
    near-dup oracle."""
    from etl_global_mobility_spark.operators.dedup import MINHASH_P, minhash_coeffs

    rows = n_hashes // bands
    coeffs = minhash_coeffs(n_hashes)
    sig = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P})) AS s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    sig_list = "[" + ", ".join(f"s{i}" for i in range(n_hashes)) + "]"
    band_selects = " UNION ALL ".join(
        f"SELECT id, sig, {b} AS band, md5(concat_ws(',', "
        + ", ".join(f"sig[{b * rows + r + 1}]" for r in range(rows))
        + ")) AS bucket FROM sigs"
        for b in range(bands)
    )
    return f"""docs AS (
      SELECT doc_id AS id,
             list_transform({_shingles_sql(k)},
                            s -> {_md5_hash_sql("s", 0)} % {MINHASH_P}) AS hs
      FROM documents
    ), sigged AS (
      SELECT id, {sig} FROM docs
    ), sigs AS (
      SELECT id, {sig_list} AS sig FROM sigged
    ), banded AS (
      {band_selects}
    )"""


def _minhash_sql(n_hashes: int = 16, bands: int = 4, k: int = 3, thr: float = 0.25) -> str:
    return f"""
    WITH {_minhash_banded_cte(n_hashes, bands, k)}, pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             len(list_filter(range(1, {n_hashes + 1}),
                             i -> a.sig[i] = b.sig[i])) / {float(n_hashes)} AS est_jaccard
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    )
    SELECT id_a, id_b, est_jaccard FROM pairs WHERE est_jaccard >= {thr}
    """


def _minhash_verified_sql(
    n_hashes: int = 16, bands: int = 4, k: int = 3, thr: float = 0.25
) -> str:
    return f"""
    WITH {_minhash_banded_cte(n_hashes, bands, k)}, cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             len(list_filter(range(1, {n_hashes + 1}),
                             i -> a.sig[i] = b.sig[i])) / {float(n_hashes)}
               AS est_jaccard
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ), sh AS (
      SELECT doc_id AS id, {_shingles_sql(k)} AS sh FROM documents
    ), verified AS (
      SELECT c.id_a, c.id_b, c.est_jaccard,
             len(list_intersect(x.sh, y.sh)) AS inter,
             len(x.sh) + len(y.sh) AS tot
      FROM cand c JOIN sh x ON x.id = c.id_a JOIN sh y ON y.id = c.id_b
    )
    SELECT id_a, id_b, est_jaccard, jaccard FROM (
      SELECT id_a, id_b, est_jaccard,
             CASE WHEN (tot - inter) > 0
                  THEN CAST(inter AS DOUBLE) / (tot - inter)
                  ELSE 0.0 END AS jaccard
      FROM verified
    ) WHERE jaccard >= {thr}
    """


def _incremental_neardup_sql(
    n_hashes: int = 16, bands: int = 4, k: int = 3, thr: float = 0.25
) -> str:
    """Full-recompute oracle for the incremental path: the complete
    MinHash banding over ALL documents, restricted to pairs where at
    least one side is in the shard (doc_id % 10 == 0) — by
    construction exactly what the index-join must produce."""
    return f"""
    SELECT id_a, id_b, est_jaccard
    FROM ({_minhash_sql(n_hashes=n_hashes, bands=bands, k=k, thr=thr)})
    WHERE id_a % 10 = 0 OR id_b % 10 = 0
    """


def _ngram_jaccard_sql(k: int = 2, thr: float = 0.25, df_max: int = 10_000) -> str:
    # df_max mirrors ngram_jaccard_pairs' document-frequency cap (shingle
    # df > df_max dropped; set sizes recomputed on the capped universe).
    return f"""
    WITH docs AS (
      SELECT doc_id AS id, {_shingles_sql(k)} AS shingles FROM documents
    ), inv0 AS (
      SELECT id, unnest(shingles) AS s FROM docs
    ), capped AS (
      SELECT id, s FROM (
        SELECT id, s, count(*) OVER (PARTITION BY s) AS s_df FROM inv0
      ) WHERE s_df <= {df_max}
    ), inv AS (
      SELECT id, s, count(*) OVER (PARTITION BY id) AS n_shingles FROM capped
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, a.n_shingles AS na, b.n_shingles AS nb,
             count(*) AS inter
      FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
    FROM inter WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {thr}
    """


_COS = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)

#: DuckDB mirror of operators/similarity.py guarded_sq_norm: TRUE only
#: for vectors the Spark QUANTIZER family admits (finite squared norm,
#: strictly positive — excludes NULL, zero, NaN/Inf components, and
#: magnitude overflow). The IVF/SemDeDup mirrors filter their base
#: relation with this, because DuckDB sorts/compares NaN ABOVE all
#: values, so an unguarded degenerate row WINS rankings and PASSES
#: >= thresholds that Spark's guarded plans never emit. Built on the
#: LAMBDA list functions, not list_dot_product: DuckDB's
#: list_inner_product validates the whole 2048-row batch's child
#: buffer and RAISES if ANY row in the batch is a NULL list — even a
#: filtered-out one — while list_transform/list_sum respect per-row
#: validity (NULL list → NULL → WHERE drops it). The squared-norm
#: value is identical (sequential fold of x*x).
#: (The cosine/LSH mirrors deliberately do NOT use this: their Spark
#: operators keep overflow vectors — scoring them 0 via dot/inf — and
#: exclude degenerates by NaN-score filtering instead; those mirrors
#: need only the NULL prefilter + NOT isnan(score).)
_EMB_OK = (
    "isfinite(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) "
    "AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0"
)


def _cosine_topk_sql(k: int = 5, n_queries: int = 8) -> str:
    # NULL prefilter only (NOT _EMB_OK): cosine_topk_exact keeps e.g.
    # overflow vectors (scored dot/inf = 0) and excludes degenerates by
    # NaN-score filtering; DuckDB's list_dot_product would RAISE over a
    # NULL list, and 0/0 is NULL here (dropped by NOT isnan's NULL)
    return f"""
    WITH nn AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
    ), scored AS (
      SELECT b.vec_id AS q_id, a.vec_id AS c_id, {_COS} AS score
      FROM nn a, nn b
      WHERE b.vec_id < {n_queries} AND a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT q_id, c_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
      FROM scored WHERE NOT isnan(score)
    )
    SELECT q_id, rank, c_id, score FROM ranked WHERE rank <= {k}
    """


def _hard_negative_sql(
    k: int = 5, n_candidates: int = 10, n_queries: int = 8
) -> str:
    """DuckDB mirror of hard_negative_mining: the cosine top-N ranking
    (same NaN exclusion as _cosine_topk_sql) label-joined, different-
    label rows re-ranked by similarity rank."""
    return f"""
    WITH nn AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
    ), scored AS (
      SELECT b.vec_id AS q_id, a.vec_id AS c_id, {_COS} AS score
      FROM nn a, nn b
      WHERE b.vec_id < {n_queries} AND a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT q_id, c_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, c_id) AS rank
      FROM scored WHERE NOT isnan(score)
    ), negs AS (
      SELECT r.q_id, qb.label AS q_label, r.c_id, ca.label AS c_label,
             r.score,
             row_number() OVER (PARTITION BY r.q_id
                                ORDER BY r.rank) AS neg_rank
      FROM ranked r
      JOIN embeddings qb ON r.q_id = qb.vec_id
      JOIN embeddings ca ON r.c_id = ca.vec_id
      WHERE r.rank <= {n_candidates}
        AND qb.label IS NOT NULL AND ca.label IS NOT NULL
        AND qb.label <> ca.label
    )
    SELECT q_id, q_label, neg_rank, c_id, c_label, score
    FROM negs WHERE neg_rank <= {k}
    """


def _mmr_sql(
    k: int = 5,
    nc: int = 10,
    nq: int = 4,
    lam: str = "0.7",
    div: str = "0.3",
) -> str:
    """MMR greedy selection unrolled into k argmax CTE steps — plain
    SQL, no recursion: step t picks, per query, the not-yet-selected
    candidate maximizing lam·rel − div·greatest(sim to each of the
    t−1 prior picks). lam/div are literal strings so both engines
    parse the identical double (never compute 1−lam at runtime)."""
    steps = [
        f"""s1 AS (
      SELECT q_id, c_id, {lam}*rel - {div}*0.0 AS mmr FROM (
        SELECT q_id, c_id, rel,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY rel DESC, c_id) AS rk
        FROM cands) WHERE rk = 1)"""
    ]
    for t in range(2, k + 1):
        prior = [f"s{i}" for i in range(1, t)]
        joins = " ".join(f"JOIN {p} ON {p}.q_id = c.q_id" for p in prior)
        notin = " AND ".join(f"c.c_id <> {p}.c_id" for p in prior)
        sim_terms = ", ".join(
            f"(SELECT sim FROM sims2 v WHERE v.q_id = c.q_id "
            f"AND v.a_id = c.c_id AND v.b_id = {p}.c_id)"
            for p in prior
        )
        maxsim = f"greatest({sim_terms})" if len(prior) > 1 else sim_terms
        steps.append(
            f"""s{t} AS (
      SELECT q_id, c_id, mmr FROM (
        SELECT c.q_id, c.c_id,
               {lam}*c.rel - {div}*{maxsim} AS mmr,
               row_number() OVER (PARTITION BY c.q_id
                                  ORDER BY {lam}*c.rel - {div}*{maxsim} DESC,
                                           c.c_id) AS rk
        FROM cands c {joins}
        WHERE {notin}) WHERE rk = 1)"""
        )
    steps_sql = ",\n    ".join(steps)
    union = "\n    UNION ALL\n    ".join(
        f"SELECT q_id, CAST({t} AS INT) AS mmr_rank, c_id, mmr AS mmr_score "
        f"FROM s{t}"
        for t in range(1, k + 1)
    )
    return f"""
    WITH cscored AS (
      SELECT b.vec_id AS q_id, a.vec_id AS c_id, {_COS} AS rel
      FROM embeddings a, embeddings b
      WHERE b.vec_id < {nq} AND a.vec_id <> b.vec_id
    ), cands AS (
      SELECT q_id, c_id, rel FROM (
        SELECT q_id, c_id, rel,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY rel DESC, c_id) AS rk
        FROM cscored WHERE NOT isnan(rel)) WHERE rk <= {nc}
    ), pair AS (
      SELECT x.q_id, x.c_id AS a_id, y.c_id AS b_id
      FROM cands x JOIN cands y ON x.q_id = y.q_id AND x.c_id < y.c_id
    ), sims AS (
      SELECT p.q_id, p.a_id, p.b_id, {_COS} AS sim
      FROM pair p JOIN embeddings a ON a.vec_id = p.a_id
                  JOIN embeddings b ON b.vec_id = p.b_id
    ), sims2 AS (
      SELECT q_id, a_id, b_id, sim FROM sims
      UNION ALL
      SELECT q_id, b_id, a_id, sim FROM sims
    ), {steps_sql}
    {union}
    """


def _lsh_ann_sql(dim: int = 64, n_planes: int = 6, k: int = 5, n_queries: int = 8) -> str:
    planes = random_hyperplanes(dim, n_planes, seed=42)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    # NULL prefilter + NaN-score exclusion, mirroring
    # lsh_ann_candidates: zero-norm pairs are NULL here (DuckDB x/0),
    # NaN-component pairs are NaN — Spark filters ~isnan on its
    # guarded score, and an unfiltered NaN would rank FIRST descending
    return f"""
    WITH nn AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
    ), bucketed AS (
      SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket FROM nn
    ), scored AS (
      SELECT b.vec_id AS q_id, a.vec_id AS c_id, {_COS} AS score
      FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket
      WHERE b.vec_id < {n_queries} AND a.vec_id <> b.vec_id
        AND ({_COS}) IS NOT NULL AND NOT isnan({_COS})
    ), ranked AS (
      SELECT q_id, c_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
      FROM scored
    )
    SELECT q_id, rank, c_id, score FROM ranked WHERE rank <= {k}
    """


def _ivf_ann_sql(n_cells: int = 16, nprobe: int = 2, k: int = 5, n_queries: int = 8) -> str:
    cos_ec = _COS.replace("a.embedding", "e.embedding").replace("b.embedding", "c.embedding")
    cos_pa = _COS.replace("b.embedding", "p.q_emb")
    return f"""
    WITH clean AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE {_EMB_OK}
    ), cents AS (
      SELECT vec_id AS cent_id, embedding FROM clean ORDER BY vec_id LIMIT {n_cells}
    ), assign AS (
      SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.cent_id) AS rn
        FROM clean e CROSS JOIN cents c
      ) WHERE rn = 1
    ), probe AS (
      SELECT vec_id AS q_id, embedding AS q_emb, cent_id AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.cent_id) AS rn
        FROM clean e CROSS JOIN cents c WHERE e.vec_id < {n_queries}
      ) WHERE rn <= {nprobe}
    ), scored AS (
      SELECT p.q_id, a.vec_id AS c_id, {cos_pa} AS score
      FROM assign a JOIN probe p ON a.cent_id = p.cell
      WHERE p.q_id <> a.vec_id
    ), ranked AS (
      SELECT q_id, c_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
      FROM scored
    )
    SELECT q_id, rank, c_id, score FROM ranked WHERE rank <= {k}
    """


def _embedding_neardup_sql(dim: int = 64, n_planes: int = 4, thr: float = 0.3) -> str:
    planes = random_hyperplanes(dim, n_planes, seed=42)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    cos = _COS.replace("a.embedding", "x.embedding").replace("b.embedding", "y.embedding")
    return f"""
    WITH bucketed AS MATERIALIZED (
      SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket
      FROM embeddings WHERE {_EMB_OK}
    )
    SELECT x.vec_id AS id_a, y.vec_id AS id_b, {cos} AS cos
    FROM bucketed x JOIN bucketed y
      ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE {cos} >= {thr}
    """


def _semantic_dedup_sql(n_cells: int = 16, thr: float = 0.5) -> str:
    """DuckDB mirror of semantic_dedup: same deterministic coarse
    quantizer as _ivf_ann_sql (lowest-id vectors, argmax cosine with
    cent_id tie-break), then within-cell smaller-id pairs ≥ thr and a
    min-dup_of window. Cosines are in-order double folds on both
    engines, so the threshold filter and the argmax agree bit-for-bit."""
    cos_ec = _COS.replace("a.embedding", "e.embedding").replace(
        "b.embedding", "c.embedding"
    )
    cos_ab = _COS.replace("a.embedding", "x.embedding").replace(
        "b.embedding", "y.embedding"
    )
    return f"""
    WITH clean AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE {_EMB_OK}
    ), cents AS (
      SELECT vec_id AS cent_id, embedding FROM clean ORDER BY vec_id LIMIT {n_cells}
    ), assign AS (
      SELECT vec_id, embedding, cent_id AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.cent_id) AS rn
        FROM clean e CROSS JOIN cents c
      ) WHERE rn = 1
    ), pairs AS (
      SELECT x.vec_id AS id, x.cell, y.vec_id AS dup_of, {cos_ab} AS cos
      FROM assign x JOIN assign y
        ON x.cell = y.cell AND y.vec_id < x.vec_id
      WHERE {cos_ab} >= {thr}
    )
    SELECT id AS vec_id, CAST(cell AS BIGINT) AS cell, dup_of, cos FROM (
      SELECT id, cell, dup_of, cos,
             row_number() OVER (PARTITION BY id ORDER BY dup_of) AS rn
      FROM pairs
    ) WHERE rn = 1
    """


def _knn_vote_sql(n_queries: int = 8, k: int = 10) -> str:
    return f"""
    WITH nn AS MATERIALIZED (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE embedding IS NOT NULL
    ), scored AS (
      SELECT b.vec_id AS q_id, a.vec_id AS c_id, a.label, {_COS} AS score
      FROM nn a, nn b
      WHERE b.vec_id < {n_queries} AND a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT q_id, c_id, label,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
      FROM scored WHERE NOT isnan(score)
    ), votes AS (
      SELECT q_id, label, count(*) AS votes FROM ranked WHERE rank <= {k}
      GROUP BY q_id, label
    ), winner AS (
      SELECT q_id, label, votes,
             row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS rk
      FROM votes
    )
    SELECT q_id, label AS majority_label, votes FROM winner WHERE rk = 1
    """


def q_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_global_mobility_spark.operators.quality_rules import filter_rules

    d = load_table(spark, sf_dir, "documents")
    return filter_rules(d).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "distinct_ratio",
        "r_min_words",
        "r_max_words",
        "r_word_length",
        "r_digit_ratio",
        "r_symbol_ratio",
        "r_no_stopwords",
        "r_repetitive",
        "keep",
        "reasons",
    )


def _filter_rules_cte_block() -> str:
    """filter_rules as a CTE chain ending in ``fr`` (doc_id + metrics
    + rule flags + keep + reasons) — shared by the standalone mirror
    and the composed end-to-end pipeline oracle."""
    sw = "['the', 'a', 'of', 'to', 'and', 'in']"
    return f"""fr_m AS (
      SELECT doc_id,
             CAST(len({TOKS}) AS INT) AS n_words,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
               / greatest(len({TOKS}), 1) AS mean_word_len,
             CAST(len(list_distinct({TOKS})) AS DOUBLE)
               / greatest(len({TOKS}), 1) AS distinct_ratio,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS digit_ratio,
             CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS symbol_ratio,
             len(list_intersect({TOKS}, {sw})) > 0 AS has_sw
      FROM documents
    ), fr_r AS (
      SELECT doc_id, n_words, mean_word_len, distinct_ratio,
             n_words < 20 AS r_min_words,
             n_words > 5000 AS r_max_words,
             mean_word_len < 3.0 OR mean_word_len > 10.0 AS r_word_length,
             digit_ratio > 0.20 AS r_digit_ratio,
             symbol_ratio > 0.10 AS r_symbol_ratio,
             NOT has_sw AS r_no_stopwords,
             distinct_ratio < 0.35 AS r_repetitive
      FROM fr_m
    ), fr AS (
      SELECT doc_id, n_words, mean_word_len, distinct_ratio,
           r_min_words, r_max_words, r_word_length, r_digit_ratio,
           r_symbol_ratio, r_no_stopwords, r_repetitive,
           NOT (r_min_words OR r_max_words OR r_word_length OR r_digit_ratio
                OR r_symbol_ratio OR r_no_stopwords OR r_repetitive) AS keep,
           concat_ws('|',
             CASE WHEN r_min_words THEN 'min_words' END,
             CASE WHEN r_max_words THEN 'max_words' END,
             CASE WHEN r_word_length THEN 'word_length' END,
             CASE WHEN r_digit_ratio THEN 'digit_ratio' END,
             CASE WHEN r_symbol_ratio THEN 'symbol_ratio' END,
             CASE WHEN r_no_stopwords THEN 'no_stopwords' END,
             CASE WHEN r_repetitive THEN 'repetitive' END) AS reasons
      FROM fr_r
    )"""


def _filter_rules_sql() -> str:
    """DuckDB mirror of operators.quality_rules.filter_rules
    (thresholds = quality_rules.DEFAULTS)."""
    return f"""WITH {_filter_rules_cte_block()}
    SELECT doc_id, n_words, mean_word_len, distinct_ratio,
           r_min_words, r_max_words, r_word_length, r_digit_ratio,
           r_symbol_ratio, r_no_stopwords, r_repetitive, keep, reasons
    FROM fr"""


#: Mixing targets: boost the first five sources 2:1 over the rest —
#: mirrors a "quality-weighted" corpus mixture table.
MIX_WEIGHTS = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(20)}


def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_global_mobility_spark.operators.splits import mix_sources

    d = load_table(spark, sf_dir, "documents")
    kept = mix_sources(d, MIX_WEIGHTS, target_fraction=0.5, seed=2)
    return kept.groupBy("source").agg(
        F.max("rate").alias("rate"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


def _mix_cte_block(relation: str, target_fraction: float, seed: int) -> str:
    """The mix_sources CTE chain over ``relation`` (must expose
    doc_id/text/source) — shared by the standalone mirror and the
    composed end-to-end pipeline oracle. Ends with the ``mix_kept``
    CTE of sampled (source, n_tokens, rate) rows."""
    total_w = sum(MIX_WEIGHTS.values())
    cases = " ".join(
        f"WHEN '{s}' THEN CAST({w / total_w!r} AS DOUBLE)"
        for s, w in MIX_WEIGHTS.items()
    )
    bucket = _md5_hash_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""mix_tok AS (
      SELECT doc_id, source, CAST(len({TOKS}) AS INT) AS n_tokens
      FROM {relation}
    ), mix_per AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      FROM mix_tok GROUP BY source
    ), mix_grand AS (
      SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens FROM mix_per
    ), mix_rates AS (
      -- zero-token source => rate 0 (no token mass); the guard also
      -- dodges DuckDB's least(1.0, x/0=NULL)=1.0 vs Spark ANSI throw
      SELECT source,
             CASE WHEN src_tokens > 0 THEN
               least(CAST(1.0 AS DOUBLE),
                     ((CAST({target_fraction!r} AS DOUBLE)
                       * CAST(total_tokens AS DOUBLE))
                      * (CASE source {cases} ELSE CAST(0.0 AS DOUBLE) END))
                     / CAST(src_tokens AS DOUBLE))
             ELSE CAST(0.0 AS DOUBLE) END AS rate
      FROM mix_per CROSS JOIN mix_grand
    ), mix_kept AS (
      SELECT t.source, t.n_tokens, r.rate
      FROM mix_tok t JOIN mix_rates r USING (source)
      WHERE CAST(({bucket} % 10000) AS DOUBLE) / 10000.0 < r.rate
    )"""


_MIX_FINAL_SELECT = """SELECT source, max(rate) AS rate, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
    FROM mix_kept GROUP BY source"""


def _mix_sources_sql(target_fraction: float = 0.5, seed: int = 2) -> str:
    """DuckDB mirror of operators.splits.mix_sources — identical
    expression tree so rates (and hence the md5 sample) match
    bit-for-bit."""
    return (
        "WITH "
        + _mix_cte_block("documents", target_fraction, seed)
        + "\n    "
        + _MIX_FINAL_SELECT
    )


#: DuckDB mirror of operators.text.quality_score (shared by the
#: standalone query and keep-best canonical selection).
_QUALITY_EXPR = f"""(CASE WHEN len(text) >= 200 THEN 0.4::DOUBLE
                    WHEN len(text) >= 50 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END
               + CASE WHEN len({TOKS}) >= 30 THEN 0.3::DOUBLE
                      WHEN len({TOKS}) >= 10 THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END
               + CASE WHEN CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                           / greatest(len(text), 1) <= 0.1 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END
               + CASE WHEN CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                           / greatest(len(text), 1) <= 0.2 THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END
              )"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best canonical selection: near-dup clusters (connected
    components over the n-gram Jaccard graph) each keep the member
    with the HIGHEST quality score (tie → lowest doc_id) — the
    production dedup policy when duplicates differ in cleanliness
    (min-id keeps an arbitrary copy; keep-best keeps the good one).
    One window over the bounded clustered subset; the component
    labeling dominates the cost."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=2, threshold=0.25)
    comp = dedup_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )
    scored = comp.join(
        d.select("doc_id", quality_score("text").alias("quality")), "doc_id"
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("component").orderBy(
            F.col("quality").desc(), F.col("doc_id")
        )
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "component",
            F.col("doc_id").alias("best_doc_id"),
            "quality",
        )
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage detector: near-duplicate pairs (n-gram
    Jaccard) whose members land in DIFFERENT hash splits — the audit
    every eval pipeline needs, because a test document with a train
    near-twin inflates benchmark scores. Composes the banded near-dup
    candidate generator with the deterministic split assignment; at
    100 TB the pair set (not the corpus) is what gets labeled, so the
    audit costs one broadcastable join over the near-dup output.
    Reports pair counts per (split_a, split_b) bucket; off-diagonal
    rows with split_a != split_b are the leaks."""
    from etl_global_mobility_spark.operators.dedup import ngram_jaccard_pairs
    from etl_global_mobility_spark.operators.splits import split_column

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=2, threshold=0.25)
    split_of = d.select(
        "doc_id", split_column("doc_id").alias("split")
    )
    labeled = (
        pairs.join(
            split_of.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
            ),
            "id_a",
        )
        .join(
            split_of.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
            ),
            "id_b",
        )
    )
    return labeled.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("split_a") != F.col("split_b")).cast("long")).alias(
            "n_leaky"
        ),
    )


def _split_leakage_sql() -> str:
    split_case = f"""CASE
        WHEN {_md5_hash_sql("CAST(doc_id AS VARCHAR)", 0)} % 100 < 80
          THEN 'train'
        WHEN {_md5_hash_sql("CAST(doc_id AS VARCHAR)", 0)} % 100 < 90
          THEN 'valid'
        ELSE 'test' END"""
    return f"""WITH pairs AS (
      SELECT id_a, id_b FROM ({_ngram_jaccard_sql()})
    ), splits AS (
      SELECT doc_id, {split_case} AS split FROM documents
    )
    SELECT sa.split AS split_a, sb.split AS split_b,
           count(*) AS n_pairs,
           CAST(sum(CASE WHEN sa.split != sb.split THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaky
    FROM pairs p
    JOIN splits sa ON p.id_a = sa.doc_id
    JOIN splits sb ON p.id_b = sb.doc_id
    GROUP BY sa.split, sb.split"""


def q_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard per-source cap (operators/splits.py:cap_per_stratum): at
    most 10 docs per source, selected by deterministic md5 order —
    exact bounds where rate-based mixing gives expected counts."""
    from etl_global_mobility_spark.operators.splits import cap_per_stratum

    d = load_table(spark, sf_dir, "documents")
    capped = cap_per_stratum(d, "source", max_rows=10, seed=3)
    return capped.select("doc_id", "source")


def _per_source_cap_sql(max_rows: int = 10, seed: int = 3) -> str:
    h = _md5_hash_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {h}, doc_id) AS rk
      FROM documents)
    SELECT doc_id, source FROM ranked WHERE rk <= {max_rows}"""


def q_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed end-to-end curation pipeline — the operators chained
    the way a real training-data job runs them:

      filter_rules (drop low-quality) → exact_dedup (keep lowest id
      per content hash) → mix_sources (reshape toward the target
      mixture) → per-source accounting.

    One logical plan: Catalyst fuses the rule filter into the scan,
    the dedup is the single content-hash shuffle, and the mix is a
    bounded agg + broadcast rate join — composing the stages adds NO
    extra corpus-sized shuffles over running dedup alone."""
    from etl_global_mobility_spark.operators.quality_rules import filter_rules
    from etl_global_mobility_spark.operators.dedup import exact_dedup
    from etl_global_mobility_spark.operators.splits import mix_sources

    d = load_table(spark, sf_dir, "documents")
    kept = filter_rules(d).filter(F.col("keep")).select(
        "doc_id", "text", "source"
    )
    uniq = exact_dedup(kept).select("doc_id", "text", "source")
    mixed = mix_sources(uniq, MIX_WEIGHTS, target_fraction=0.5, seed=2)
    return mixed.groupBy("source").agg(
        F.max("rate").alias("rate"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


def _e2e_curation_sql(target_fraction: float = 0.5, seed: int = 2) -> str:
    """Composed oracle: the filter-rules CTE block feeding a sha256
    dedup feeding the mix CTE block — stage mirrors identical to the
    standalone queries'."""
    return f"""WITH {_filter_rules_cte_block()},
    kept AS (
      SELECT d.doc_id, d.text, d.source
      FROM documents d JOIN fr USING (doc_id) WHERE fr.keep
    ), dd AS (
      SELECT doc_id, text, source,
             row_number() OVER (PARTITION BY sha256(text)
                                ORDER BY doc_id) AS rn
      FROM kept
    ), uniq AS (
      SELECT doc_id, text, source FROM dd WHERE rn = 1
    ), {_mix_cte_block("uniq", target_fraction, seed)}
    {_MIX_FINAL_SELECT}"""


#: BM25 probe: one high-df term, one mid, one lower — exercises the
#: idf spread on the synthetic corpus.
BM25_TERMS = ("the", "spark", "customer")


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_global_mobility_spark.operators.retrieval import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, BM25_TERMS, top_k=20)


def _bm25_sql(k1: float = 1.2, b: float = 0.75, top_k: int = 20) -> str:
    """DuckDB mirror of operators.retrieval.bm25_topk — identical
    expression tree (rational idf, fixed-order term sum) so IEEE
    doubles hash-match."""
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    per_term_cols = ",\n             ".join(
        f"coalesce(max(CASE WHEN t = '{t}' THEN s END), 0.0) AS s_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    score = " + ".join(f"s_{i}" for i in range(len(BM25_TERMS)))
    return f"""WITH tok AS (
      SELECT doc_id AS id, unnest({TOKS}) AS t FROM documents
    ), dl AS (
      SELECT id, count(*) AS dl FROM tok GROUP BY id
    ), stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
    ), tf AS (
      SELECT id, t, count(*) AS tf FROM tok
      WHERE t IN ({terms}) GROUP BY id, t
    ), dfreq AS (
      SELECT t, count(*) AS df FROM tf GROUP BY t
    ), scored AS (
      SELECT tf.id, tf.t,
             ((CAST(n_docs - df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * {k1 + 1.0!r})
                / (CAST(tf AS DOUBLE)
                   + {k1!r} * (1.0 - {b!r}
                               + {b!r} * (CAST(dl AS DOUBLE)
                                          / (CAST(sum_dl AS DOUBLE)
                                             / CAST(n_docs AS DOUBLE)))))) AS s
      FROM tf JOIN dfreq USING (t) JOIN dl USING (id) CROSS JOIN stats
    ), pivoted AS (
      SELECT id,
             {per_term_cols},
             count(*) AS n_terms_hit
      FROM scored GROUP BY id
    ), topk AS (
      SELECT id, n_terms_hit, ({score}) AS score
      FROM pivoted ORDER BY score DESC, id LIMIT {top_k}
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank,
           id AS doc_id, n_terms_hit, score
    FROM topk"""


def q_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint report (operators/text.py
    winnowing_fingerprints, k=5, w=4): per-document count/min/max/
    xor-fold/density of the winnowed hash set — scalars only, so the
    full fingerprint pipeline (k-grams → md5 hashes → window minima →
    distinct) is oracle-checked end to end without array cells."""
    from etl_global_mobility_spark.operators.text import (
        winnowing_fingerprints,
    )

    d = load_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(d, k=5, w=4)


#: Epoch-plan corpus parameters (weights normalized inside the
#: operator AND inlined as double literals into the oracle — both
#: sides parse the identical repr).
_EPOCH_WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 1.0}
_EPOCH_BUDGET = 50_000


def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training data-recipe table (operators/splits.py epoch_plan):
    per-source available tokens, target share, implied epochs."""
    from etl_global_mobility_spark.operators.splits import epoch_plan

    d = load_table(spark, sf_dir, "documents")
    return epoch_plan(d, weights=_EPOCH_WEIGHTS, token_budget=_EPOCH_BUDGET)


def _epoch_plan_sql() -> str:
    total = sum(_EPOCH_WEIGHTS.values())
    case = " ".join(
        f"WHEN '{s}' THEN CAST({w / total!r} AS DOUBLE)"
        for s, w in _EPOCH_WEIGHTS.items()
    )
    w = f"(CASE source {case} ELSE CAST(0.0 AS DOUBLE) END)"
    target = f"(CAST({float(_EPOCH_BUDGET)!r} AS DOUBLE) * {w})"
    return f"""
    WITH ps AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(CAST(len({TOKS}) AS BIGINT)) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, src_tokens,
           {w} AS weight,
           {target} AS target_tokens,
           ({target} / CAST(src_tokens AS DOUBLE)) AS epochs
    FROM ps"""


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget corpus cut (operators/splits.py
    token_budget_sample): 10k-token budget over 4 md5 shards — each
    shard keeps its hash-ordered prefix within budget/4 tokens."""
    from etl_global_mobility_spark.operators.splits import (
        token_budget_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return token_budget_sample(d, token_budget=10_000, n_shards=4, seed=11)


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style hard negatives (operators/retrieval.py
    hard_negative_mining): per query the 5 most cosine-similar corpus
    vectors with a DIFFERENT label, drawn from the exact top-10."""
    from etl_global_mobility_spark.operators.retrieval import (
        hard_negative_mining,
    )

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return hard_negative_mining(e, queries, k=5, n_candidates=10)


def q_winnowing_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowed-fingerprint near-dup pairs
    (operators/dedup.py winnowing_neardup_pairs, k=5, w=4,
    min_shared=2, df_max=50): structural recall over shared passages
    ≥ w+k-1 tokens, inverted-index join bounded by the df cap."""
    from etl_global_mobility_spark.operators.dedup import (
        winnowing_neardup_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    return winnowing_neardup_pairs(d, k=5, w=4, min_shared=2, df_max=50)


def q_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report (operators/text.py
    length_bucket_batching): fixed power-of-two token caps, per-bucket
    doc counts, exact token sums, padded cost and efficiency."""
    from etl_global_mobility_spark.operators.text import (
        length_bucket_batching,
    )

    d = load_table(spark, sf_dir, "documents")
    return length_bucket_batching(d)


#: Shared CTE chain of the winnowing pipeline (k=5 grams, w=4
#: windows) ending in ``f(doc_id, n_grams, fps)``.
_WINNOW_CTE = f"""
    WITH base AS (
      SELECT doc_id, {TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 5 THEN
               list_transform(range(1, len(toks) - 4 + 1),
                              i -> array_to_string(toks[i:i + 4], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM base
    ), h AS (
      SELECT doc_id,
             list_transform(grams,
               s -> CAST('0x' || substr(md5('0:' || s), 1, 15) AS BIGINT))
               AS hs
      FROM g
    ), m AS (
      SELECT doc_id, len(hs) AS n_grams,
             CASE WHEN len(hs) >= 4 THEN
                    list_transform(range(1, len(hs) - 3 + 1),
                                   j -> list_min(hs[j:j + 3]))
                  WHEN len(hs) >= 1 THEN [list_min(hs)]
                  ELSE CAST([] AS BIGINT[]) END AS mins
      FROM h
    ), f AS (
      SELECT doc_id, n_grams, list_distinct(mins) AS fps FROM m
    )"""


#: DuckDB mirror of the per-document winnowing report.
_WINNOW_SQL = f"""{_WINNOW_CTE}
    SELECT doc_id, n_grams,
           len(fps) AS n_fingerprints,
           list_min(fps) AS fp_min,
           list_max(fps) AS fp_max,
           list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
                       (a, b) -> xor(a, b)) AS fp_xor,
           CASE WHEN n_grams > 0
                THEN CAST(len(fps) AS DOUBLE) / CAST(n_grams AS DOUBLE)
           END AS fp_density
    FROM f"""


#: DuckDB mirror of the winnowing near-dup pair join (df-cap 50,
#: min_shared 2 — the corpus parameters of q_winnowing_neardup).
_WINNOW_NEARDUP_SQL = f"""{_WINNOW_CTE}
    , inv AS (
      SELECT doc_id AS id, len(fps) AS n_fp, unnest(fps) AS fp FROM f
    ), capped AS (
      SELECT id, n_fp, fp FROM (
        SELECT id, n_fp, fp, count(*) OVER (PARTITION BY fp) AS fp_df
        FROM inv)
      WHERE fp_df <= 50
    )
    SELECT a.id AS id_a, b.id AS id_b,
           count(*) AS n_shared,
           CAST(count(*) AS DOUBLE)
             / CAST(least(a.n_fp, b.n_fp) AS DOUBLE) AS overlap
    FROM capped a JOIN capped b ON a.fp = b.fp AND a.id < b.id
    GROUP BY a.id, b.id, a.n_fp, b.n_fp
    HAVING count(*) >= 2"""


#: DuckDB mirror of the length-bucket batching report.
_LENGTH_BUCKET_SQL = f"""
    WITH t AS (
      SELECT doc_id, len({TOKS}) AS tokens FROM documents
    ), b AS (
      SELECT doc_id, tokens,
             CASE WHEN tokens <= 16 THEN 16
                  WHEN tokens <= 32 THEN 32
                  WHEN tokens <= 64 THEN 64
                  WHEN tokens <= 128 THEN 128
                  WHEN tokens <= 256 THEN 256
                  WHEN tokens <= 512 THEN 512
                  WHEN tokens <= 1024 THEN 1024
                  WHEN tokens <= 2048 THEN 2048
                  ELSE NULL END AS bucket_cap
      FROM t
    )
    SELECT bucket_cap,
           count(*) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS sum_tokens,
           max(tokens) AS max_tokens,
           CAST(coalesce(bucket_cap * count(*), sum(tokens)) AS BIGINT)
             AS padded_tokens,
           CAST(sum(tokens) AS DOUBLE)
             / CAST(coalesce(bucket_cap * count(*), sum(tokens)) AS DOUBLE)
             AS efficiency
    FROM b GROUP BY bucket_cap"""


from etl_global_mobility_spark.operators.quality_rules import (  # noqa: E402
    TRAINED_SNAPSHOT_WEIGHTS as _TRAINED_W,
)


def q_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM corpus-rarity quality scores (operators/text.py
    unigram_rarity): per-document mean/max token rarity N/count(term)
    and hapax fraction — the CCNet-style perplexity-filter shape with
    rational arithmetic for cross-engine FP parity."""
    from etl_global_mobility_spark.operators.text import unigram_rarity

    d = load_table(spark, sf_dir, "documents")
    return unigram_rarity(d)


_UNIGRAM_RARITY_SQL = f"""
    WITH tf AS (
      SELECT id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id AS id, unnest({TOKS}) AS term FROM documents)
      GROUP BY id, term
    ), vocab AS (
      SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab
    )
    SELECT t.id AS doc_id,
           CAST(sum(t.tf) AS BIGINT) AS n_tokens,
           CAST(sum(t.tf * ((tot.n_total * CAST(1000000 AS BIGINT))
                            // v.cnt)) AS DOUBLE)
             / (CAST(sum(t.tf) AS DOUBLE) * 1000000.0) AS mean_rarity,
           max(CAST(tot.n_total AS DOUBLE) / CAST(v.cnt AS DOUBLE))
             AS max_rarity,
           CAST(coalesce(sum(t.tf) FILTER (WHERE v.cnt = 1), 0) AS BIGINT)
             AS n_hapax,
           CAST(coalesce(sum(t.tf) FILTER (WHERE v.cnt = 1), 0) AS DOUBLE)
             / CAST(sum(t.tf) AS DOUBLE) AS hapax_frac
    FROM tf t JOIN vocab v USING (term) CROSS JOIN tot
    GROUP BY t.id"""


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/text.py cdc_chunks, k=3,
    mod=16): LBFS/FastCDC-style insertion-stable chunk boundaries from
    local k-gram hashes; one row per chunk with its md5 content hash —
    the sub-document dedup granularity."""
    from etl_global_mobility_spark.operators.text import cdc_chunks

    d = load_table(spark, sf_dir, "documents")
    return cdc_chunks(d, k=3, mod=16)


_CDC_CHUNKS_SQL = f"""
    WITH base AS (
      SELECT doc_id, {TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(range(1, len(toks) - 2 + 1),
                              i -> array_to_string(toks[i:i + 2], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM base
    ), h AS (
      SELECT doc_id, toks,
             list_transform(grams,
               s -> CAST('0x' || substr(md5('0:' || s), 1, 15) AS BIGINT))
               AS hs
      FROM g
    ), c AS (
      SELECT doc_id, toks,
             list_filter(range(1, len(hs) + 1), j -> hs[j] % 16 = 0)
               AS cuts
      FROM h
    ), b AS (
      SELECT doc_id, toks,
             [CAST(0 AS BIGINT)]
               || list_transform(cuts, j -> j + 2)
               || [CAST(len(toks) AS BIGINT)] AS bs
      FROM c
    ), p AS (
      SELECT doc_id, toks,
             list_filter(
               list_transform(range(1, len(bs)),
                              i -> {{'s': bs[i], 'e': bs[i + 1]}}),
               q -> q.e > q.s) AS ps
      FROM b
    ), e AS (
      SELECT doc_id, toks, unnest(ps) AS pr FROM p
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pr.s) - 1
                AS INT) AS chunk_idx,
           CAST(pr.s AS INT) AS chunk_start,
           CAST(pr.e - pr.s AS INT) AS n_tokens,
           md5(array_to_string(
                 toks[CAST(pr.s + 1 AS INT):CAST(pr.e AS INT)], ' '))
             AS chunk_hash
    FROM e"""


def q_sft_chat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChatML SFT rendering + loss-mask boundary (operators/splits.py
    sft_chat_format): system/user/assistant template with a
    metadata-synthesized instruction; prompt vs completion token
    spans for prompt-masked loss."""
    from etl_global_mobility_spark.operators.splits import sft_chat_format

    d = load_table(spark, sf_dir, "documents")
    return sft_chat_format(d)


def _sft_chat_format_sql() -> str:
    def tc(expr: str) -> str:
        toks = (
            f"list_filter(string_split_regex(lower(trim({expr})), '[ \\t\\n\\x0b\\f\\r]+'), "
            "x -> len(x) > 0)"
        )
        return f"CAST(len({toks}) AS INT)"

    return f"""
    WITH r AS (
      SELECT doc_id,
             '<|im_start|>system' || chr(10)
               || 'You are a helpful assistant.<|im_end|>' || chr(10)
               || '<|im_start|>user' || chr(10)
               || 'Summarize the following ' || lang
               || ' document from ' || source || '.<|im_end|>' || chr(10)
               || '<|im_start|>assistant' || chr(10) AS prompt_part,
             text || '<|im_end|>' AS completion_part
      FROM documents
    ), t AS (
      SELECT doc_id,
             prompt_part || completion_part AS rendered,
             {tc('prompt_part')} AS prompt_tokens,
             {tc('completion_part')} AS completion_tokens
      FROM r
    )
    SELECT doc_id, rendered, prompt_tokens, completion_tokens,
           prompt_tokens + completion_tokens AS total_tokens,
           CAST(completion_tokens AS DOUBLE)
             / CAST(greatest(prompt_tokens + completion_tokens, 1)
                    AS DOUBLE) AS loss_fraction
    FROM t"""



def q_cdc_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-passage report over content-defined chunks
    (operators/dedup.py cdc_dup_passages, k=3, mod=16, min 4 tokens):
    one hash-groupBy on insertion-stable chunk content hashes — the
    cross-document boilerplate sweep."""
    from etl_global_mobility_spark.operators.dedup import cdc_dup_passages

    d = load_table(spark, sf_dir, "documents")
    return cdc_dup_passages(d, k=3, mod=16, min_tokens=4)




#: process-local memo over the persisted centroid artifact — one
#: Lloyd training per (sf_dir, k, iters, scale) per process, zero per
#: process once the on-disk artifact exists.
_KMEANS_ARTIFACT_MEM: dict[tuple, list[list[int]]] = {}

# Serializes the train-once artifact's miss path: without it, two
# threads that miss the memo concurrently write.mode("overwrite") the
# SAME artifact directory — a third loader can then read a half-
# replaced parquet dir. Spark sessions are shared across threads by
# design (one nightly session, many query threads —
# tests/test_concurrency.py), so the artifact composer must be too.
# Training under the lock serializes only the first miss; every later
# caller hits the memo without contention.
import threading as _threading

_KMEANS_ARTIFACT_LOCK = _threading.Lock()


def _kmeans_artifact_centroids(
    spark: SparkSession,
    sf_dir: str,
    k: int = 4,
    iters: int = 2,
    scale: int = 1 << 20,
) -> list[list[int]]:
    """Train-once centroid artifact shared by every kmeans-composing
    corpus query (kmeans_refine, cluster_profile,
    cluster_balanced_sample): first caller trains Lloyd and persists
    the integer centroids (operators/similarity.py
    save_kmeans_centroids); everyone after loads the artifact — the
    flow a 100 TB pipeline actually runs (train the map once, profile
    / sample / refine many times), and bit-identical to inline
    training because fixed-point centroids are exact integers. The
    artifact path is fingerprinted by (sf_dir, params, embeddings
    mtime+size) so a testdata refresh invalidates it rather than
    silently serving stale centroids."""
    import hashlib
    import os

    # the data fingerprint is part of the MEMO key too (ADVICE r9):
    # without it, a testdata refresh within one process would serve
    # stale centroids from memory even though the on-disk artifact
    # path had correctly rotated
    emb_path = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(emb_path)
        fingerprint = f"{st.st_mtime_ns}-{st.st_size}"
    except OSError:
        fingerprint = "unknown"
    key = (os.path.abspath(sf_dir), k, iters, scale, fingerprint)
    # fast path outside the lock: dict reads are GIL-atomic and the
    # memo is insert-only, so a hit never needs synchronization
    if key in _KMEANS_ARTIFACT_MEM:
        return _KMEANS_ARTIFACT_MEM[key]

    from etl_global_mobility_spark.corpus.relational import _roundtrip_dir
    from etl_global_mobility_spark.operators.similarity import (
        load_kmeans_centroids,
        save_kmeans_centroids,
        train_kmeans_centroids,
    )

    digest = hashlib.md5(
        f"{key}|{fingerprint}".encode()
    ).hexdigest()[:16]
    # repo-local staging (same root as every other roundtrip artifact)
    path = _roundtrip_dir(f"kmeans_{digest}")
    with _KMEANS_ARTIFACT_LOCK:
        # double-check: a concurrent first caller may have trained and
        # saved while this thread waited on the lock
        if key in _KMEANS_ARTIFACT_MEM:
            return _KMEANS_ARTIFACT_MEM[key]
        try:
            cents, loaded_scale = load_kmeans_centroids(spark, path)
            if loaded_scale != scale:
                raise ValueError("scale mismatch")
        except Exception:
            import shutil
            import uuid

            e = load_table(spark, sf_dir, "embeddings")
            cents = train_kmeans_centroids(e, k=k, iters=iters, scale=scale)
            # The in-process lock can't serialize ANOTHER driver
            # process sharing this roundtrip root (parallel pytest,
            # two nightly jobs): train into a per-process temp dir and
            # publish with one atomic rename, so no reader can ever
            # observe a half-replaced parquet directory. Losing the
            # rename race means another process published first; the
            # in-memory centroids are bit-identical (fixed-point
            # training is exact), so just discard the temp copy.
            tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            save_kmeans_centroids(spark, tmp, cents, scale=scale, iters=iters)
            try:
                os.rename(tmp, path)
            except OSError:
                # rename refuses a non-empty existing `path`
                # (ENOTEMPTY). Two states land here: (a) another
                # process published a valid artifact first — a lost
                # race, discard tmp; (b) `path` is the SAME
                # partial/corrupt/scale-mismatched artifact that
                # routed us into this retrain branch — silently
                # discarding tmp would leave it broken forever, every
                # subsequent process retraining per-run (ADVICE r11).
                # Only a now-loadable path counts as a lost race;
                # otherwise repair: remove the invalid artifact and
                # retry the publish.
                try:
                    _, disk_scale = load_kmeans_centroids(spark, path)
                    disk_ok = disk_scale == scale
                except Exception:
                    disk_ok = False
                if disk_ok:
                    shutil.rmtree(tmp, ignore_errors=True)
                else:
                    # Repair under an exclusive sentinel (ADVICE r12):
                    # rmtree(path) had a TOCTOU window — between the
                    # failed load above and the delete, a concurrent
                    # process may have already repaired `path`, which
                    # we'd then destroy, leaving a gap where a third
                    # reader retrains redundantly. os.rename is atomic
                    # on one filesystem: exactly ONE process moves the
                    # invalid dir aside (losers get ENOENT and fall
                    # through to the lost-race branch), and our tmp is
                    # already fully written, so the artifact-missing
                    # window shrinks to the instant between the two
                    # renames.
                    quarantine = (
                        f"{path}.quarantine-{os.getpid()}-"
                        f"{uuid.uuid4().hex[:8]}"
                    )
                    try:
                        os.rename(path, quarantine)
                    except OSError:
                        # another process quarantined it first; it
                        # will publish bit-identical centroids
                        quarantine = None
                    try:
                        os.rename(tmp, path)
                    except OSError:
                        # a concurrent repair won the re-publish race;
                        # the centroids are bit-identical either way
                        shutil.rmtree(tmp, ignore_errors=True)
                    if quarantine is not None:
                        shutil.rmtree(quarantine, ignore_errors=True)
        _KMEANS_ARTIFACT_MEM[key] = cents
    return cents


def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point Lloyd k-means (operators/similarity.py
    kmeans_fixed_point, k=4, 2 iterations, scale 2^20): an ITERATIVE
    clustering algorithm made bit-exact across engines by integer
    quantization — seeds are the 4 lowest-id vectors; the oracle
    unrolls both Lloyd iterations as CTEs. Assignment runs from the
    shared persisted-centroid artifact (train-once; hash-identical to
    inline training by integer exactness)."""
    from etl_global_mobility_spark.operators.similarity import (
        kmeans_fixed_point,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cents = _kmeans_artifact_centroids(spark, sf_dir, k=4, iters=2)
    return kmeans_fixed_point(e, k=4, iters=2, centroids=cents)


def _kmeans_sql(k: int = 4, iters: int = 2, scale: int = 1 << 20,
                dim: int = 64) -> str:
    rng = f"range(1, {dim + 1})"

    def dist(vq: str, vc: str) -> str:
        return (f"list_sum(list_transform({rng}, "
                f"i -> ({vq}[i] - {vc}[i]) * ({vq}[i] - {vc}[i])))")

    parts = [f"""WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(x * {float(scale)!r}) AS BIGINT)) AS v
      FROM embeddings
    ), c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
      FROM q ORDER BY vec_id LIMIT {k}
    )"""]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(f""", d{t} AS (
      SELECT q.vec_id, q.v, c.cid, {dist("q.v", "c.v")} AS d
      FROM q CROSS JOIN {prev} c
    ), a{t} AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, cid) AS rn
        FROM d{t}) WHERE rn = 1
    ), m{t} AS (
      SELECT cid, i, CAST(sum(v[i]) AS BIGINT) AS s, count(*) AS n
      FROM a{t}, {rng} r(i) GROUP BY cid, i
    ), mm{t} AS (
      SELECT cid, list(s // n ORDER BY i) AS v FROM m{t} GROUP BY cid
    ), c{t} AS (
      SELECT c.cid, COALESCE(m.v, c.v) AS v
      FROM {prev} c LEFT JOIN mm{t} m USING (cid)
    )""")
        prev = f"c{t}"
    parts.append(f""", df AS (
      SELECT q.vec_id, c.cid, {dist("q.v", "c.v")} AS d
      FROM q CROSS JOIN {prev} c
    )
    SELECT vec_id, cid AS cluster_id, CAST(d AS BIGINT) AS dist_sq FROM (
      SELECT vec_id, cid, d,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d, cid) AS rn
      FROM df) WHERE rn = 1""")
    return "".join(parts)


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle rendering over the corpus: a hash-chosen
    half of the documents re-rendered PSM (prefix/suffix/middle with
    sentinels), the rest raw — zero-shuffle codegen projection
    (operators/packing.py:fim_transform)."""
    from etl_global_mobility_spark.operators.packing import fim_transform

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return fim_transform(d, fim_pct=50, seed=3)


def _fim_sql(fim_pct: int = 50, seed: int = 3) -> str:
    from etl_global_mobility_spark.operators.packing import (
        FIM_MID,
        FIM_PRE,
        FIM_SUF,
    )

    pick = _md5_hash_sql("CAST(doc_id AS VARCHAR)", seed)
    h1 = _md5_hash_sql("CAST(doc_id AS VARCHAR) || ':a'", seed)
    h2 = _md5_hash_sql("CAST(doc_id AS VARCHAR) || ':m'", seed)
    return f"""
    WITH t AS (
      SELECT doc_id, {TOKS} AS ts, len({TOKS}) AS n,
             ({pick} % 100) < {fim_pct} AS pick
      FROM documents
    ), cut AS (
      SELECT doc_id, ts, n, pick AND n >= 3 AS do_fim,
             CAST(1 + {h1} % (n - 1) AS INT) AS a,
             CAST({h2} % (n - (1 + {h1} % (n - 1)) + 1) AS INT) AS m
      FROM t
    )
    SELECT doc_id,
           -- COALESCE: a DuckDB out-of-range/empty slice renders NULL
           -- (not ''), while Spark concat_ws of an empty slice is ''
           CASE WHEN do_fim THEN
             '{FIM_PRE} ' || COALESCE(array_to_string(ts[1:a], ' '), '')
             || ' {FIM_SUF} '
             || COALESCE(
                  array_to_string(ts[a+m+1:CAST(n AS INT)], ' '), '')
             || ' {FIM_MID} '
             || COALESCE(array_to_string(ts[a+1:a+m], ' '), '')
           ELSE array_to_string(ts, ' ') END AS out_text,
           CASE WHEN do_fim THEN 'psm' ELSE 'raw' END AS mode,
           CASE WHEN do_fim THEN a ELSE CAST(n AS INT) END AS n_prefix,
           CASE WHEN do_fim THEN m ELSE 0 END AS n_middle,
           CASE WHEN do_fim THEN CAST(n - a - m AS INT) ELSE 0 END
             AS n_suffix
    FROM cut"""


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling with English documents as the
    target domain: hashed-unigram count ratio in integer micro-units,
    deterministic linear-in-importance inclusion coin
    (operators/signals.py:dsir_importance_resample)."""
    from etl_global_mobility_spark.operators.signals import (
        dsir_importance_resample,
    )

    d = load_table(spark, sf_dir, "documents")
    return dsir_importance_resample(
        d, F.col("lang") == "en", n_buckets=4096
    )


def _dsir_sql(
    n_buckets: int = 4096,
    micro: int = 1_000_000,
    scale: int = 1_000_000,
    seed: int = 0,
) -> str:
    bhash = _md5_hash_sql("tok", 0)
    draw = _md5_hash_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""
    WITH tok AS (
      SELECT doc_id, is_tgt, {bhash} % {n_buckets} AS b
      FROM (SELECT doc_id, lang = 'en' AS is_tgt,
                   unnest({TOKS}) AS tok
            FROM documents)
    ), counts AS (
      SELECT b, count(*) AS raw_cnt,
             sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tgt_cnt
      FROM tok GROUP BY b
    ), w AS (
      SELECT b,
             CAST(((tgt_cnt + 1) * {micro}) // (raw_cnt + 1) AS BIGINT) AS w
      FROM counts
    ), scores AS (
      SELECT doc_id, CAST(sum(w) AS BIGINT) AS score,
             count(*) AS n_tokens
      FROM tok JOIN w USING (b) GROUP BY doc_id
    ), mx AS (SELECT max(score) AS m FROM scores)
    SELECT doc_id, score, n_tokens,
           {draw} % {scale} AS draw
    FROM scores, mx
    WHERE {draw} % {scale} < (CAST(score AS HUGEINT) * {scale}) // m"""


def q_rejection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n rejection sampling over classifier-scored documents:
    ``doc_id % 50`` stands in for the prompt group, the quality logit
    for the reward; per group the argmax response is kept with its
    margin over the runner-up (operators/splits.py:rejection_sample)."""
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )
    from etl_global_mobility_spark.operators.splits import rejection_sample

    d = load_table(spark, sf_dir, "documents")
    scored = quality_classifier(d).select(
        (F.col("doc_id") % 50).alias("grp"), "doc_id", "quality_logit"
    )
    return rejection_sample(scored, ["grp"], score_col="quality_logit")


def _rejection_sample_sql() -> str:
    cte, logit = _clf_cte_and_logit()
    return f"""
    WITH {cte}, clf AS (
      SELECT doc_id, {logit} AS s FROM m
    ), g AS (
      SELECT doc_id % 50 AS grp, doc_id, s FROM clf WHERE s IS NOT NULL
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY grp
                                ORDER BY s DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM g
    )
    SELECT grp,
           max(CASE WHEN rn = 1 THEN doc_id END) AS chosen_id,
           max(CASE WHEN rn = 1 THEN s END) AS chosen_score,
           max(CASE WHEN rn = 2 THEN doc_id END) AS runner_up_id,
           max(CASE WHEN rn = 1 THEN s END)
             - max(CASE WHEN rn = 2 THEN s END) AS margin,
           max(n) AS n_candidates
    FROM r WHERE rn <= 2 GROUP BY grp"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling with replacement over the
    corpus, token count as the weight (longer documents drawn
    proportionally more often — the standard corpus-mixing primitive
    when sampling by tokens, not documents). Inverse-CDF on exact
    integer cumulative weights: engine-portable with no
    transcendentals; the prefix sum is sharded, never a single-task
    window (operators/splits.py:weighted_sample_with_replacement)."""
    from etl_global_mobility_spark.operators.splits import (
        weighted_sample_with_replacement,
    )
    from etl_global_mobility_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("weight")
    )
    return weighted_sample_with_replacement(
        d, k=40, seed=6, weight_col="weight", n_shards=16
    )


def _weighted_sample_sql(k: int = 40, seed: int = 6, n_shards: int = 16) -> str:
    shard = _md5_hash_sql("CAST(doc_id AS VARCHAR)", seed + 1)
    draw_t = _md5_hash_sql("CAST(j AS VARCHAR)", seed + 2)
    return f"""
    WITH sh AS (
      SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS w,
             md5('{seed}:' || CAST(doc_id AS VARCHAR)) AS sort_key,
             CAST({shard} % {n_shards} AS INT) AS shard
      FROM documents
    ), pos AS (
      SELECT * FROM sh WHERE w > 0
    ), cum AS (
      SELECT doc_id, w, shard,
             sum(w) OVER (PARTITION BY shard ORDER BY sort_key, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_hi
      FROM pos
    ), tot AS (
      SELECT shard, max(cum_hi) AS t FROM cum GROUP BY shard
    ), off AS (
      SELECT shard,
             COALESCE(sum(t) OVER (ORDER BY shard
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS o
      FROM tot
    ), iv AS (
      SELECT c.doc_id, c.w, o.o + c.cum_hi AS hi,
             o.o + c.cum_hi - c.w AS lo
      FROM cum c JOIN off o USING (shard)
    ), draws AS (
      -- CAST: DuckDB sum(BIGINT) is HUGEINT, which pandas widens to
      -- float64 — the modulo result is < total weight, BIGINT-safe
      SELECT j AS draw_id,
             CAST({draw_t} % (SELECT sum(w) FROM pos) AS BIGINT) AS t
      FROM (SELECT unnest(range(0, {k})) AS j)
    )
    SELECT d.draw_id, i.doc_id, i.w AS weight, d.t
    FROM draws d JOIN iv i ON d.t >= i.lo AND d.t < i.hi"""


def q_group_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRPO-style group-relative advantage over the embeddings table:
    ``vec_id % 16`` stands in for the prompt group, the stored first
    embedding component (a parquet float — identical bits in both
    engines) for the per-response reward. Fixed-point micro-unit
    moments make the standardization bit-exact
    (operators/splits.py:group_advantage)."""
    from etl_global_mobility_spark.operators.splits import group_advantage

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        (F.col("vec_id") % 16).cast("int").alias("grp"),
        F.element_at("embedding", 1).cast("double").alias("reward"),
    )
    return group_advantage(e, ["grp"], reward_col="reward")


def _group_advantage_sql(micro: int = 1_000_000) -> str:
    return f"""
    WITH base AS (
      SELECT vec_id AS doc_id, CAST(vec_id % 16 AS INT) AS grp,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * {micro}.0)
                  AS BIGINT) AS r
      FROM embeddings WHERE embedding[1] IS NOT NULL
    ), m AS (
      SELECT grp, count(*) AS n, sum(r) AS s,
             sum(CAST(r AS HUGEINT) * r) AS s2
      FROM base GROUP BY grp
    )
    SELECT b.grp, b.doc_id,
           CAST(b.r AS DOUBLE) / {micro}.0 AS reward_us,
           CASE WHEN m.n * m.s2 - CAST(m.s AS HUGEINT) * m.s <= 0
                THEN 0.0
                ELSE CAST(m.n * b.r - m.s AS DOUBLE)
                     / sqrt(CAST(m.n * m.s2
                                 - CAST(m.s AS HUGEINT) * m.s AS DOUBLE))
           END AS advantage,
           m.n AS group_n
    FROM base b JOIN m USING (grp)"""


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption denoising examples over the corpus: ~15% of
    tokens masked by a portable hash, consecutive masks merged into
    sentinel spans, input/target rendered exactly as the pretraining
    objective consumes them (operators/packing.py:span_corruption)."""
    from etl_global_mobility_spark.operators.packing import span_corruption

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return span_corruption(d, noise_pct=15, seed=0)


def _span_corruption_sql(noise_pct: int = 15, seed: int = 0) -> str:
    mask = _md5_hash_sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)", seed
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, i - 1 AS pos, ts[CAST(i AS INT)] AS tok
      FROM (SELECT doc_id, {TOKS} AS ts,
                   unnest(range(1, len({TOKS}) + 1)) AS i
            FROM documents)
    ), m AS (
      SELECT doc_id, pos, tok, ({mask} % 100) < {noise_pct} AS msk
      FROM tok
    ), isl AS (
      SELECT doc_id, pos, tok, msk,
             msk AND NOT COALESCE(
               lag(msk) OVER (PARTITION BY doc_id ORDER BY pos),
               FALSE) AS is_start
      FROM m
    ), sp AS (
      SELECT *,
             sum(CASE WHEN is_start THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) - 1 AS span_idx
      FROM isl
    ), pieces AS (
      SELECT doc_id, pos, msk, is_start,
             '<extra_id_' || CAST(span_idx AS VARCHAR) || '>' AS sent,
             tok
      FROM sp
    ), agg AS (
      SELECT doc_id,
             string_agg(CASE WHEN NOT msk THEN tok
                             WHEN is_start THEN sent END,
                        ' ' ORDER BY pos)
               FILTER (WHERE NOT msk OR is_start) AS input_text,
             string_agg(CASE WHEN is_start THEN sent || ' ' || tok
                             WHEN msk THEN tok END,
                        ' ' ORDER BY pos)
               FILTER (WHERE msk) AS tgt_body,
             sum(CASE WHEN is_start THEN 1 ELSE 0 END) AS n_spans,
             sum(CASE WHEN msk THEN 1 ELSE 0 END) AS n_masked
      FROM pieces GROUP BY doc_id
    )
    SELECT doc_id, COALESCE(input_text, '') AS input_text,
           CASE WHEN tgt_body IS NULL
                THEN '<extra_id_' || CAST(n_spans AS VARCHAR) || '>'
                ELSE tgt_body || ' <extra_id_'
                     || CAST(n_spans AS VARCHAR) || '>'
           END AS target_text,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_masked AS BIGINT) AS n_masked
    FROM agg"""


# ------------------------------------------------- domain curation ----
# The documents table carries no URL column, so the domain queries
# synthesize a deterministic one from (doc_id, source) — subdomain
# prefixes, three TLD families (one multi-part, exercising the eTLD+1
# rule), ports, and query strings — and the OPERATORS do the real
# parsing (operators/domains.py). The oracle rebuilds the same URL in
# SQL and mirrors the parse with anchored regexes.

_URL_SQL = (
    "'https://'"
    " || CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END"
    " || source"
    " || CASE doc_id % 3 WHEN 0 THEN '.com'"
    "         WHEN 1 THEN '.org' ELSE '.co.uk' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END"
    " || '/p/' || CAST(doc_id AS VARCHAR)"
    " || CASE WHEN doc_id % 7 = 0 THEN '?ref=rss' ELSE '' END"
)

_HOST_SQL = r"regexp_extract(url, '^https?://([^/:?#]+)', 1)"

#: DuckDB mirror of operators.domains.registrable_domain (same listed
#: multi-part suffixes, same anchored extracts, same trailing-dot /
#: IPv4-literal / single-label identity branches).
_DOMAIN_SQL = r"""CASE
       WHEN regexp_matches(rtrim(host, '.'), '^[0-9.]+$')
         THEN rtrim(host, '.')
       WHEN regexp_extract(rtrim(host, '.'), '([^.]+\.[^.]+)$', 1) = ''
         THEN rtrim(host, '.')
       WHEN regexp_extract(rtrim(host, '.'), '([^.]+\.[^.]+)$', 1)
             IN ('co.uk','org.uk','gov.uk','ac.uk',
                 'co.jp','com.au','com.br','co.in')
            AND regexp_extract(rtrim(host, '.'),
                               '([^.]+\.[^.]+\.[^.]+)$', 1) <> ''
         THEN regexp_extract(rtrim(host, '.'),
                             '([^.]+\.[^.]+\.[^.]+)$', 1)
       ELSE regexp_extract(rtrim(host, '.'), '([^.]+\.[^.]+)$', 1) END"""

#: Blocklist the blocklist query pins: one registrable domain (drops
#: every subdomain under it), one exact host, one multi-part-suffix
#: domain.
_BLOCKLIST = ("src7.org", "cdn.src5.com", "src1.co.uk")


def _synth_url() -> F.Column:
    """Spark twin of _URL_SQL."""
    did = F.col("doc_id")
    return F.concat(
        F.lit("https://"),
        F.when(did % 4 == 0, F.lit("www."))
        .when(did % 4 == 1, F.lit("cdn."))
        .otherwise(F.lit("")),
        F.col("source"),
        F.when(did % 3 == 0, F.lit(".com"))
        .when(did % 3 == 1, F.lit(".org"))
        .otherwise(F.lit(".co.uk")),
        F.when(did % 5 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.lit("/p/"),
        did.cast("string"),
        F.when(did % 7 == 0, F.lit("?ref=rss")).otherwise(F.lit("")),
    )


def q_domain_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL → host / registrable domain (eTLD+1 incl. multi-part
    suffixes) / tld / path parsing (operators/domains.py
    extract_url_parts) — map-only, zero shuffles."""
    from etl_global_mobility_spark.operators.domains import extract_url_parts

    d = load_table(spark, sf_dir, "documents")
    return extract_url_parts(
        d.select("doc_id", _synth_url().alias("url"))
    ).select("doc_id", "url", "host", "domain", "tld", "path")


_DOMAIN_EXTRACT_SQL = f"""
    WITH u AS (
      SELECT doc_id, {_URL_SQL} AS url FROM documents
    ), h AS (
      SELECT doc_id, url, {_HOST_SQL} AS host FROM u
    )
    SELECT doc_id, url, host,
           {_DOMAIN_SQL} AS domain,
           regexp_extract(host, '\\.([^.]+)$', 1) AS tld,
           regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path
    FROM h"""


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filter with subdomain semantics (host equals an entry
    or sits under one) via the map-only suffix-chain ∩ literal-array
    test (operators/domains.py domain_blocklist_filter) — no join, no
    shuffle; returns the surviving documents with their parsed parts."""
    from etl_global_mobility_spark.operators.domains import (
        domain_blocklist_filter,
        extract_url_parts,
    )

    d = load_table(spark, sf_dir, "documents")
    parts = extract_url_parts(d.select("doc_id", _synth_url().alias("url")))
    return domain_blocklist_filter(parts, list(_BLOCKLIST)).select(
        "doc_id", "host", "domain"
    )


def _blocked_pred_sql() -> str:
    terms = [
        f"(host = '{e}' OR host LIKE '%.{e}')" for e in _BLOCKLIST
    ]
    return " OR ".join(terms)


_DOMAIN_BLOCKLIST_SQL = f"""
    WITH u AS (
      SELECT doc_id, {_URL_SQL} AS url FROM documents
    ), h AS (
      SELECT doc_id, {_HOST_SQL} AS host FROM u
    )
    SELECT doc_id, host, {_DOMAIN_SQL} AS domain
    FROM h WHERE NOT ({_blocked_pred_sql()})"""


def q_domain_cap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (max 5 docs per registrable domain, md5-ordered —
    C4's 'no domain dominates' policy via cap_per_stratum) followed by
    the per-domain corpus accounting report: doc/token counts and
    shares (operators/domains.py cap_per_domain + domain_report)."""
    from etl_global_mobility_spark.operators.domains import (
        cap_per_domain,
        domain_report,
    )

    d = load_table(spark, sf_dir, "documents")
    capped = cap_per_domain(
        d.select("doc_id", "text", _synth_url().alias("url")), max_docs=5
    )
    return domain_report(capped)


_DOMAIN_CAP_REPORT_SQL = f"""
    WITH u AS (
      SELECT doc_id, text, {_URL_SQL} AS url FROM documents
    ), h AS (
      SELECT doc_id, text, {_HOST_SQL} AS host FROM u
    ), d AS (
      SELECT doc_id, text, {_DOMAIN_SQL} AS domain FROM h
    ), capped AS (
      SELECT doc_id, text, domain FROM (
        SELECT doc_id, text, domain,
               row_number() OVER (
                 PARTITION BY domain
                 ORDER BY {_md5_hash_sql("CAST(doc_id AS VARCHAR)", 3)},
                          doc_id) AS rk
        FROM d)
      WHERE rk <= 5
    ), agg AS (
      SELECT domain, count(*) AS n_docs,
             CAST(sum(len({TOKS})) AS BIGINT) AS sum_tokens
      FROM capped GROUP BY domain
    ), tot AS (
      SELECT sum(n_docs) AS td, sum(sum_tokens) AS tt FROM agg
    )
    SELECT domain, n_docs, sum_tokens,
           CAST(n_docs AS DOUBLE) / td AS doc_share,
           CAST(sum_tokens AS DOUBLE) / tt AS token_share
    FROM agg, tot"""


def _normalize_url_sql(url: str) -> str:
    """DuckDB mirror of operators.domains.normalize_url (same anchored
    RE2 extracts, same tracking-param set, same sort)."""
    scheme = f"lower(regexp_extract({url}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    hostport = (
        f"lower(regexp_extract({url}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1))"
    )
    host = (
        f"CASE {scheme} WHEN 'https' THEN regexp_replace({hostport}, ':443$', '')"
        f" WHEN 'http' THEN regexp_replace({hostport}, ':80$', '')"
        f" ELSE {hostport} END"
    )
    path = (
        f"regexp_replace(regexp_extract({url}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '')"
    )
    params = (
        f"list_filter(string_split(regexp_extract({url}, '^[^?#]*\\?([^#]*)', 1), '&'),"
        " p -> len(p) > 0 AND NOT starts_with(split_part(p, '=', 1), 'utm_')"
        " AND split_part(p, '=', 1)"
        " NOT IN ('ref','fbclid','gclid','mc_cid','mc_eid'))"
    )
    qs = f"array_to_string(list_sort({params}), '&')"
    return (
        f"CASE WHEN {scheme} = '' THEN {url} ELSE "
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END END"
    )


#: Messy URL variants for the url-dedup query: five documents share a
#: logical page (pid = doc_id // 5); four of them reach it through
#: case / trailing-slash / default-port+utm / fragment noise and must
#: collapse to one canonical URL, while the %5==3 variant carries REAL
#: (non-tracking) query params in scrambled order and must survive as
#: its own page with the params sorted.
_URL_VARIANTS_SQL = """
      CASE doc_id % 5
        WHEN 1 THEN 'HTTPS://SITE' || CAST((doc_id // 5) % 12 AS VARCHAR)
                    || '.COM/p/' || CAST(doc_id // 5 AS VARCHAR) || '/'
        WHEN 2 THEN 'https://site' || CAST((doc_id // 5) % 12 AS VARCHAR)
                    || '.com:443/p/' || CAST(doc_id // 5 AS VARCHAR)
                    || '?utm_source=x'
        WHEN 3 THEN 'https://site' || CAST((doc_id // 5) % 12 AS VARCHAR)
                    || '.com/p/' || CAST(doc_id // 5 AS VARCHAR)
                    || '?b=2&a=1&ref=feed'
        WHEN 4 THEN 'https://site' || CAST((doc_id // 5) % 12 AS VARCHAR)
                    || '.com/p/' || CAST(doc_id // 5 AS VARCHAR) || '#frag'
        ELSE 'https://site' || CAST((doc_id // 5) % 12 AS VARCHAR)
             || '.com/p/' || CAST(doc_id // 5 AS VARCHAR)
      END"""


def _messy_url() -> F.Column:
    """Spark twin of _URL_VARIANTS_SQL."""
    pid = F.floor(F.col("doc_id") / 5).cast("long")
    h = (pid % 12).cast("string")
    p = pid.cast("string")
    v = F.col("doc_id") % 5
    return (
        F.when(
            v == 1,
            F.concat(
                F.lit("HTTPS://SITE"), h, F.lit(".COM/p/"), p, F.lit("/")
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://site"), h, F.lit(".com:443/p/"), p,
                F.lit("?utm_source=x"),
            ),
        )
        .when(
            v == 3,
            F.concat(
                F.lit("https://site"), h, F.lit(".com/p/"), p,
                F.lit("?b=2&a=1&ref=feed"),
            ),
        )
        .when(
            v == 4,
            F.concat(
                F.lit("https://site"), h, F.lit(".com/p/"), p, F.lit("#frag")
            ),
        )
        .otherwise(
            F.concat(F.lit("https://site"), h, F.lit(".com/p/"), p)
        )
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (operators/domains.py url_dedup): canonicalize
    messy crawl URLs (case, default ports, trailing slashes, fragments,
    tracking params, scrambled param order) and keep one document per
    canonical URL — longest text wins, ties to lowest id — with the
    absorbed-duplicate count."""
    from etl_global_mobility_spark.operators.domains import url_dedup

    d = load_table(spark, sf_dir, "documents")
    return url_dedup(
        d.select("doc_id", "text", _messy_url().alias("url"))
    ).select("canonical_url", "doc_id", "n_dups")


_URL_DEDUP_SQL = f"""
    WITH u AS (
      SELECT doc_id, text, {_URL_VARIANTS_SQL} AS url FROM documents
    ), c AS (
      SELECT doc_id, text, {_normalize_url_sql("url")} AS canonical_url
      FROM u
    ), k AS (
      SELECT doc_id, text, canonical_url,
             coalesce(canonical_url,
                      '__null-url__:' || CAST(doc_id AS VARCHAR)) AS cu_key
      FROM c
    ), r AS (
      SELECT doc_id, canonical_url,
             row_number() OVER (PARTITION BY cu_key
                                ORDER BY len(text) DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY cu_key) - 1 AS n_dups
      FROM k
    )
    SELECT canonical_url, doc_id, n_dups FROM r WHERE rn = 1"""


def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility/compression report per language
    (operators/text.py token_fertility_report): exact char/token/piece
    sums, chars-per-token, pieces-per-whitespace-token."""
    from etl_global_mobility_spark.operators.text import (
        token_fertility_report,
    )

    d = load_table(spark, sf_dir, "documents")
    return token_fertility_report(d)


_PIECES = (
    "len(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),"
    " x -> len(x) > 0))"
)

_TOKEN_FERTILITY_SQL = f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(sum(len({TOKS})) AS BIGINT) AS sum_ws_tokens,
           CAST(sum({_PIECES}) AS BIGINT) AS sum_pieces,
           CAST(sum(length(text)) AS DOUBLE)
             / CAST(sum(len({TOKS})) AS DOUBLE) AS chars_per_token,
           CAST(sum({_PIECES}) AS DOUBLE)
             / CAST(sum(len({TOKS})) AS DOUBLE) AS fertility
    FROM documents GROUP BY lang"""


def q_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector affine int8 (SQ8) quantization report
    (operators/similarity.py int8_quantize_report): codes
    round((x−min)/s) at s=(max−min)/255, reconstruction max-abs-err
    and MSE per vector — the accept/reject number before re-encoding
    a corpus at 4x compression."""
    from etl_global_mobility_spark.operators.similarity import (
        int8_quantize_report,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return int8_quantize_report(e)


_INT8_QUANTIZE_SQL = """
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             CAST(len(embedding) AS INT) AS n_dims,
             list_min(embedding::DOUBLE[]) AS mn,
             (list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[]))
               / 255.0 AS s
      FROM embeddings
    ), e AS (
      SELECT vec_id, n_dims, mn, s,
             list_transform(v, x -> abs(x - (mn +
               (CASE WHEN s = 0 THEN 0.0 ELSE round((x - mn) / s) END) * s)))
               AS errs
      FROM b
    )
    SELECT vec_id, n_dims,
           mn AS vmin,
           mn + s * 255.0 AS vmax,
           s AS qscale,
           list_max(errs) AS max_abs_err,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                    list_transform(errs, x -> x * x)),
                       (a, b) -> a + b) / CAST(n_dims AS DOUBLE) AS mse
    FROM e"""


#: Quasi-identifier columns for the k-anonymity queries: language,
#: source, and a coarse length bucket — the metadata triple an
#: auxiliary dataset could plausibly join on.
_QUASI = ("lang", "source", "size_bucket")


def _with_quasi(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id", "lang", "source",
        F.expr("n_chars div 500").alias("size_bucket"),
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators/privacy.py k_anonymity_report):
    per quasi-identifier equivalence class (lang, source, length
    bucket) the class size, at-risk flag (size < 3), and corpus
    share — the release-review table after PII redaction."""
    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_report,
    )

    d = load_table(spark, sf_dir, "documents")
    return k_anonymity_report(_with_quasi(d), list(_QUASI), k=3)


_K_ANONYMITY_SQL = """
    WITH q AS (
      SELECT doc_id, lang, source, n_chars // 500 AS size_bucket
      FROM documents
    ), c AS (
      SELECT lang, source, size_bucket, count(*) AS n_rows
      FROM q GROUP BY lang, source, size_bucket
    ), t AS (SELECT sum(n_rows) AS total FROM c)
    SELECT lang, source, size_bucket, n_rows,
           n_rows < 3 AS at_risk,
           CAST(n_rows AS DOUBLE) / total AS row_share
    FROM c, t"""


def q_k_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression baseline (operators/privacy.py k_anonymity_suppress):
    the released rows after dropping every quasi-identifier class
    smaller than k=3 — any metadata join now matches 3-or-none."""
    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_suppress,
    )

    d = load_table(spark, sf_dir, "documents")
    return k_anonymity_suppress(_with_quasi(d), list(_QUASI), k=3)


_K_SUPPRESS_SQL = """
    WITH q AS (
      SELECT doc_id, lang, source, n_chars // 500 AS size_bucket
      FROM documents
    ), c AS (
      SELECT doc_id, lang, source, size_bucket,
             count(*) OVER (PARTITION BY lang, source, size_bucket) AS n
      FROM q
    )
    SELECT doc_id, lang, source, size_bucket FROM c WHERE n >= 3"""


def q_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction examples over the event log
    (operators/temporal.py event_sequence_examples): per user, each
    event with ≥3 predecessors becomes (previous 3 event types in
    (ts, id) order, target event type) — constant lag() state per row,
    never a whole-history collect."""
    from etl_global_mobility_spark.operators.temporal import (
        event_sequence_examples,
    )

    e = load_table(spark, sf_dir, "events")
    out = event_sequence_examples(e, context_len=3)
    # driver canonicalizer hashes scalars — render the context array as
    # the space-joined token string a trainer would consume anyway
    return out.select(
        "user_id",
        "event_id",
        F.array_join("context", " ").alias("context_text"),
        "target",
    )


_EVENT_SEQUENCES_SQL = """
    WITH w AS (
      SELECT user_id, event_id, event_type,
             lag(event_type, 3) OVER ord AS c1,
             lag(event_type, 2) OVER ord AS c2,
             lag(event_type, 1) OVER ord AS c3,
             lag(event_id, 3) OVER ord AS anchor
      FROM events
      WINDOW ord AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           c1 || ' ' || c2 || ' ' || c3 AS context_text,
           event_type AS target
    FROM w WHERE anchor IS NOT NULL"""


#: Keyword policy list for the tagging query — chosen to hit the
#: synthetic vocabulary ('slow', 'big') alongside absent terms, so the
#: report exercises hits, misses, and multiplicity.
_TAG_KEYWORDS = ("slow", "big", "error", "crash")


def q_compression_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (operators/signals.py
    compression_ratio_signal): Arrow-batched pandas UDF per document —
    rows-only in the ledger (no SQL zlib); determinism + reference
    parity pinned by pytest."""
    from etl_global_mobility_spark.operators.signals import (
        compression_ratio_signal,
    )

    d = load_table(spark, sf_dir, "documents")
    return compression_ratio_signal(d)


def q_keyword_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style keyword tagging (operators/text.py keyword_tag_report):
    token-exact policy-list hits per document — occurrences, distinct
    keywords, hit fraction, flag — as one zero-shuffle map pass."""
    from etl_global_mobility_spark.operators.text import keyword_tag_report

    d = load_table(spark, sf_dir, "documents")
    return keyword_tag_report(d, list(_TAG_KEYWORDS))


_KEYWORD_TAG_SQL = f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_filter(toks,
                t -> list_contains(['slow','big','error','crash'], t)))
                AS INT) AS n_hits,
           CAST(len(list_intersect(toks, ['slow','big','error','crash']))
                AS INT) AS n_distinct_kw,
           CAST(len(list_filter(toks,
                t -> list_contains(['slow','big','error','crash'], t)))
                AS DOUBLE)
             / CAST(greatest(len(toks), 1) AS DOUBLE) AS hit_frac,
           len(list_filter(toks,
                t -> list_contains(['slow','big','error','crash'], t)))
             >= 1 AS flagged
    FROM t"""


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by exact-integer PMI ordering
    (operators/text.py pmi_collocations): corpus bigram/unigram counts,
    (c_xy*N*micro) DIV (c_x*c_y) in DECIMAL-widened arithmetic — the
    phrase-mining report without engine-divergent ln."""
    from etl_global_mobility_spark.operators.text import pmi_collocations

    d = load_table(spark, sf_dir, "documents")
    return pmi_collocations(d, min_count=5, top_k=50)


_PMI_SQL = f"""
    WITH base AS (SELECT {TOKS} AS toks FROM documents),
    uni AS (
      SELECT t, count(*) AS c
      FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni),
    pairs AS (
      SELECT unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)),
                              i -> {{'x': toks[i], 'y': toks[i + 1]}})
             ELSE [] END) AS p
      FROM base
    ),
    bi AS (
      SELECT p.x AS x, p.y AS y, count(*) AS c_xy
      FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT x, y, c_xy, ux.c AS c_x, uy.c AS c_y,
           CAST((CAST(c_xy AS HUGEINT) * n_total * 1000000)
                // (CAST(ux.c AS HUGEINT) * uy.c) AS BIGINT) AS pmi_micro
    FROM bi
    JOIN uni ux ON bi.x = ux.t
    JOIN uni uy ON bi.y = uy.t
    CROSS JOIN tot
    ORDER BY pmi_micro DESC, x, y LIMIT 50"""


#: Blocklist for the e2e web-curation pipeline — registrable domains
#: of the messy-URL synthesis (site{0..11}.com).
_E2E_WEB_BLOCKLIST = ("site2.com", "site7.com")


def q_e2e_web_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end web-curation pipeline composing the round-7 domain
    family over messy crawl URLs: URL-level dedup (canonicalize + keep
    best) → domain blocklist → keyword-fraction prune (drop docs where
    policy terms exceed 10% of tokens) → per-domain cap (max 4) →
    per-domain doc/token share report. Every stage is the operator the
    standalone queries verify; this query proves they COMPOSE — the
    C4-shaped preprocessing chain as one lazy plan."""
    from etl_global_mobility_spark.operators.domains import (
        cap_per_domain,
        domain_blocklist_filter,
        domain_report,
        url_dedup,
    )
    from etl_global_mobility_spark.operators.text import keyword_tag_report

    d = load_table(spark, sf_dir, "documents")
    with_url = d.select("doc_id", "text", _messy_url().alias("url"))
    kept = url_dedup(with_url).select("doc_id", "text", "canonical_url")
    unblocked = domain_blocklist_filter(
        kept, list(_E2E_WEB_BLOCKLIST), url_col="canonical_url"
    )
    tags = keyword_tag_report(unblocked, list(_TAG_KEYWORDS))
    clean = unblocked.join(
        tags.filter(F.col("hit_frac") <= 0.1).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    capped = cap_per_domain(clean, max_docs=4, url_col="canonical_url")
    return domain_report(capped, url_col="canonical_url")


_E2E_WEB_SQL = f"""
    WITH u AS (
      SELECT doc_id, text, {_URL_VARIANTS_SQL} AS url FROM documents
    ), c AS (
      SELECT doc_id, text, {_normalize_url_sql("url")} AS canonical_url
      FROM u
    ), r AS (
      SELECT doc_id, text, canonical_url,
             row_number() OVER (
               PARTITION BY coalesce(canonical_url,
                                     '__null-url__:' || CAST(doc_id AS VARCHAR))
               ORDER BY len(text) DESC, doc_id) AS rn
      FROM c
    ), kept AS (
      SELECT doc_id, text, canonical_url,
             regexp_extract(canonical_url, '^https?://([^/:?#]+)', 1) AS host
      FROM r WHERE rn = 1
    ), unblocked AS (
      SELECT * FROM kept
      WHERE NOT (host = 'site2.com' OR host LIKE '%.site2.com'
              OR host = 'site7.com' OR host LIKE '%.site7.com')
    ), tagged AS (
      SELECT doc_id, text, host,
             CAST(len(list_filter({TOKS},
                  t -> list_contains(['slow','big','error','crash'], t)))
                  AS DOUBLE)
               / CAST(greatest(len({TOKS}), 1) AS DOUBLE) AS hit_frac
      FROM unblocked
    ), clean AS (
      SELECT doc_id, text, host, {_DOMAIN_SQL} AS domain
      FROM tagged WHERE hit_frac <= 0.1
    ), capped AS (
      SELECT doc_id, text, domain FROM (
        SELECT doc_id, text, domain,
               row_number() OVER (
                 PARTITION BY domain
                 ORDER BY {_md5_hash_sql("CAST(doc_id AS VARCHAR)", 3)},
                          doc_id) AS rk
        FROM clean)
      WHERE rk <= 4
    ), agg AS (
      SELECT domain, count(*) AS n_docs,
             CAST(sum(len({TOKS})) AS BIGINT) AS sum_tokens
      FROM capped GROUP BY domain
    ), tot AS (SELECT sum(n_docs) AS td, sum(sum_tokens) AS tt FROM agg)
    SELECT domain, n_docs, sum_tokens,
           CAST(n_docs AS DOUBLE) / td AS doc_share,
           CAST(sum_tokens AS DOUBLE) / tt AS token_share
    FROM agg, tot"""




def _alignment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize (image, text) embedding pairs from the embeddings
    table — consecutive-id pairs: even vec_id plays the image side,
    vec_id+1 the text/caption side (at curation time pairs arrive
    pre-encoded in one row; this join is test-data synthesis only).
    Two degenerate pairs are planted deterministically so the gate's
    NaN/NULL policy is exercised end-to-end: img_id 6 gets a zero-norm
    image embedding (cosine NaN), img_id 8 a NULL text embedding."""
    e = load_table(spark, sf_dir, "embeddings")
    img = e.select(
        F.col("vec_id").alias("img_id"),
        F.col("embedding").alias("image_embedding"),
    )
    txt = e.select(
        (F.col("vec_id") - 1).alias("img_id"),
        F.col("vec_id").alias("txt_id"),
        F.col("embedding").alias("text_embedding"),
    )
    return (
        img.join(txt, "img_id")
        .filter(F.col("img_id") % 2 == 0)
        .withColumn(
            "image_embedding",
            F.when(
                F.col("img_id") == 6,
                F.array_repeat(F.lit(0.0).cast("float"), 64),
            ).otherwise(F.col("image_embedding")),
        )
        .withColumn(
            "text_embedding",
            F.when(F.col("img_id") == 8, F.lit(None).cast("array<float>"))
            .otherwise(F.col("text_embedding")),
        )
    )


def q_multimodal_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score alignment gate (operators/alignment.py
    alignment_gate): per-pair image-text cosine, keep pairs scoring
    >= 0.1 (threshold is encoder-specific; LAION used 0.28 for real
    CLIP embeddings), NaN/NULL pairs dropped explicitly — the
    LAION-5B curation filter as a map-only corpus pass."""
    from etl_global_mobility_spark.operators.alignment import (
        alignment_gate,
    )

    pairs = _alignment_pairs(spark, sf_dir)
    return alignment_gate(pairs, threshold=0.1).select(
        "img_id", "txt_id", "alignment"
    )


def q_e2e_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal curation — the LAION-style pipeline
    composed as ONE lazy plan, mirroring llm_e2e_web_curation for the
    image-text side:

      CLIP-score alignment gate (operators/alignment.py, keep cosine
      >= 0.1, NaN/NULL pairs dropped) → SemDeDup image near-dup
      (operators/similarity.py semantic_dedup over the SURVIVING
      pairs' image embeddings, within-cell cosine >= 0.35, smaller-id
      winner) → caption-source join → per-source cap (best 4 pairs by
      alignment DESC, img_id tie).

    Plan shape: the gate is map-only and fuses into the scan; the
    dedup's only corpus shuffle is its within-cell self-join (bucketed
    by cell — never all-pairs); the dup marks anti-join back on
    img_id; the source cap is one shuffle on source with the group
    limit pruning map-side (WindowGroupLimit). Composing the stages
    adds no corpus-sized shuffle beyond running the dedup alone."""
    from etl_global_mobility_spark.operators.alignment import alignment_gate
    from etl_global_mobility_spark.operators.similarity import semantic_dedup
    from pyspark.sql import Window

    gated = alignment_gate(_alignment_pairs(spark, sf_dir), threshold=0.1)
    dups = semantic_dedup(
        gated.select(
            F.col("img_id").alias("vec_id"),
            F.col("image_embedding").alias("embedding"),
        ),
        n_cells=16,
        threshold=0.35,
        # the dedup corpus is POST-JOIN here, not a bare scan: the
        # compute-parallelism guard's .rdd probe finalizes the gate
        # pipeline's AQE plan eagerly (an extra broadcast-build job per
        # declaration) and its repartition would re-shuffle what the
        # join already distributed — measured 4.89 s → 3.73 s at sf0.1
        # disabling it (identical rows; layout-invariance pinned by the
        # operator's tests)
        min_parallelism=None,
    )
    survivors = gated.join(
        dups.select(F.col("vec_id").alias("img_id")), "img_id", "left_anti"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("txt_id"), "source"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("alignment").desc(), F.col("img_id")
    )
    return (
        survivors.join(docs, "txt_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .select("img_id", "txt_id", "source", "alignment", "rk")
    )


def q_alignment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment-score distribution report (operators/alignment.py
    alignment_report): fixed-width histogram over [-1, 1] plus a
    'degenerate' row for NaN/NULL pairs — the bounded-output audit run
    before committing to a keep threshold on a 100 TB pair corpus."""
    from etl_global_mobility_spark.operators.alignment import (
        alignment_report,
    )

    return alignment_report(
        _alignment_pairs(spark, sf_dir), threshold=0.1, n_bins=20
    )


_ALIGN_PAIRS_SQL = """
      SELECT a.vec_id AS img_id, b.vec_id AS txt_id,
             CASE WHEN a.vec_id = 6 THEN {zero64}::DOUBLE[]
                  ELSE a.embedding::DOUBLE[] END AS ie,
             CASE WHEN a.vec_id = 8 THEN NULL
                  ELSE b.embedding::DOUBLE[] END AS te
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0
""".replace("{zero64}", "[0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]")

#: shared scored-pairs CTE: the SAME guarded-cosine op sequence as
#: operators/alignment.py _safe_cosine (NULL side -> NULL, zero-norm
#: -> NaN, else the identical IEEE division).
_ALIGN_SCORED_SQL = """
      SELECT img_id, txt_id,
             CASE WHEN ie IS NULL OR te IS NULL THEN NULL
                  WHEN sqrt(list_dot_product(ie, ie))
                       * sqrt(list_dot_product(te, te)) > 0
                  THEN list_dot_product(ie, te)
                       / (sqrt(list_dot_product(ie, ie))
                          * sqrt(list_dot_product(te, te)))
                  ELSE 'NaN'::DOUBLE END AS alignment
      FROM pairs
"""

_MULTIMODAL_ALIGNMENT_SQL = f"""
    WITH pairs AS ({_ALIGN_PAIRS_SQL}), scored AS ({_ALIGN_SCORED_SQL})
    SELECT img_id, txt_id, alignment FROM scored
    WHERE CASE WHEN isnan(alignment) THEN false
               ELSE alignment >= 0.1 END"""


def _cos_ii(a: str, b: str) -> str:
    """Image-image cosine over already-DOUBLE[] ``ie`` columns — the
    same in-order fold sequence as the engine's dot()/sqrt pipeline."""
    return (
        f"list_dot_product({a}.ie, {b}.ie) / "
        f"(sqrt(list_dot_product({a}.ie, {a}.ie)) * "
        f"sqrt(list_dot_product({b}.ie, {b}.ie)))"
    )


#: mirror of q_e2e_multimodal_curation: gate → SemDeDup on the gated
#: image side (same deterministic quantizer as _semantic_dedup_sql,
#: seeded from the GATED corpus) → caption-source join → per-source
#: top-4 by alignment.
_E2E_MULTIMODAL_SQL = f"""
    WITH pairs AS ({_ALIGN_PAIRS_SQL}),
    scored AS (
      SELECT img_id, txt_id, ie,
             CASE WHEN ie IS NULL OR te IS NULL THEN NULL
                  WHEN sqrt(list_dot_product(ie, ie))
                       * sqrt(list_dot_product(te, te)) > 0
                  THEN list_dot_product(ie, te)
                       / (sqrt(list_dot_product(ie, ie))
                          * sqrt(list_dot_product(te, te)))
                  ELSE 'NaN'::DOUBLE END AS alignment
      FROM pairs
    ), gated AS (
      SELECT img_id, txt_id, ie, alignment FROM scored
      WHERE CASE WHEN isnan(alignment) THEN false
                 ELSE alignment >= 0.1 END
    ), cents AS (
      SELECT img_id AS cent_id, ie FROM gated ORDER BY img_id LIMIT 16
    ), assign AS (
      SELECT img_id, ie, cent_id AS cell FROM (
        SELECT g.img_id, g.ie, c.cent_id,
               row_number() OVER (PARTITION BY g.img_id
                                  ORDER BY {_cos_ii('g', 'c')} DESC,
                                           c.cent_id) AS rn
        FROM gated g CROSS JOIN cents c
      ) WHERE rn = 1
    ), dups AS (
      SELECT DISTINCT x.img_id
      FROM assign x JOIN assign y
        ON x.cell = y.cell AND y.img_id < x.img_id
      WHERE {_cos_ii('x', 'y')} >= 0.35
    ), survivors AS (
      SELECT g.img_id, g.txt_id, g.alignment FROM gated g
      WHERE NOT EXISTS (SELECT 1 FROM dups u WHERE u.img_id = g.img_id)
    )
    SELECT img_id, txt_id, source, alignment, CAST(rk AS INT) AS rk FROM (
      SELECT s.img_id, s.txt_id, d.source, s.alignment,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY s.alignment DESC, s.img_id) AS rk
      FROM survivors s JOIN documents d ON d.doc_id = s.txt_id
    ) WHERE rk <= 4"""

_ALIGNMENT_REPORT_SQL = f"""
    WITH pairs AS ({_ALIGN_PAIRS_SQL}), scored AS ({_ALIGN_SCORED_SQL}),
    binned AS (
      SELECT CASE WHEN alignment IS NULL OR isnan(alignment) THEN NULL
                  ELSE least(greatest(
                         CAST(floor((alignment + 1.0) / 2.0 * 20) AS INT),
                         0), 19) END AS bin,
             CASE WHEN isnan(alignment) THEN false
                  ELSE alignment >= 0.1 END AS kept
      FROM scored
    ), per_bin AS (
      SELECT bin, count(*) AS n_pairs,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM binned GROUP BY bin
    ), tot AS (SELECT sum(n_pairs) AS t FROM per_bin)
    SELECT coalesce(CAST(bin AS VARCHAR), 'degenerate') AS bucket,
           CASE WHEN bin IS NOT NULL THEN (bin * 2 - 20) / 20 END AS score_lo,
           n_pairs, n_kept,
           CAST(n_pairs AS DOUBLE) / t AS share
    FROM per_bin, tot"""




def q_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/retrieval.py
    mine_bitext_pairs — Artetxe & Schwenk ACL 2019, the
    CCMatrix/LASER parallel-corpus construction operator): even
    vec_ids play the source language (bounded mining batch, < 24),
    odd vec_ids the target corpus; each source's best target by the
    ratio margin over both sides' k-NN neighborhood density, mined at
    margin >= 1.3."""
    from etl_global_mobility_spark.operators.retrieval import (
        mine_bitext_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    src = e.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 24))
    tgt = e.filter(F.col("vec_id") % 2 == 1)
    return mine_bitext_pairs(src, tgt, k=4, threshold=1.3)


def _knn_avg_sql(frm: str, out: str) -> str:
    """Fixed-order k-NN-average mirror (k=4): rank-i conditional
    extraction + explicit written-order addition chain — the same
    determinism trick as the Spark side (_fixed_order_knn_avg)."""
    return f"""
      SELECT q_id,
             (coalesce(s1, 0.0) + coalesce(s2, 0.0)
              + coalesce(s3, 0.0) + coalesce(s4, 0.0))
             / (CAST(s1 IS NOT NULL AS INT) + CAST(s2 IS NOT NULL AS INT)
                + CAST(s3 IS NOT NULL AS INT)
                + CAST(s4 IS NOT NULL AS INT)) AS {out}
      FROM (
        SELECT q_id,
               max(CASE WHEN rank = 1 THEN score END) AS s1,
               max(CASE WHEN rank = 2 THEN score END) AS s2,
               max(CASE WHEN rank = 3 THEN score END) AS s3,
               max(CASE WHEN rank = 4 THEN score END) AS s4
        FROM {frm} GROUP BY q_id)
    """


_BITEXT_MINING_SQL = f"""
    WITH src AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE vec_id % 2 = 0 AND vec_id < 24
    ), tgt AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE vec_id % 2 = 1
    ), fwd_scored AS (
      SELECT s.vec_id AS q_id, t.vec_id AS c_id,
             list_dot_product(s.emb, t.emb)
               / (sqrt(list_dot_product(s.emb, s.emb))
                  * sqrt(list_dot_product(t.emb, t.emb))) AS score
      FROM src s, tgt t
    ), fwd AS (
      SELECT q_id, c_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, c_id) AS rank
      FROM fwd_scored WHERE NOT isnan(score)
    ), fwdk AS (
      SELECT * FROM fwd WHERE rank <= 4
    ), ax AS ({_knn_avg_sql("fwdk", "nbr_src")}
    ), cand AS (
      SELECT DISTINCT c_id FROM fwdk
    ), bwd_scored AS (
      SELECT t.vec_id AS q_id, s.vec_id AS c_id,
             list_dot_product(t.emb, s.emb)
               / (sqrt(list_dot_product(t.emb, t.emb))
                  * sqrt(list_dot_product(s.emb, s.emb))) AS score
      FROM tgt t JOIN cand ON t.vec_id = cand.c_id CROSS JOIN src s
    ), bwd AS (
      SELECT q_id, c_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, c_id) AS rank
      FROM bwd_scored WHERE NOT isnan(score)
    ), bwdk AS (
      SELECT * FROM bwd WHERE rank <= 4
    ), ay AS ({_knn_avg_sql("bwdk", "nbr_tgt")}
    ), joined AS (
      SELECT f.q_id, f.c_id, f.score,
             (2.0 * f.score) / (ax.nbr_src + ay.nbr_tgt) AS margin
      FROM fwdk f
      JOIN ax ON f.q_id = ax.q_id
      JOIN ay ON f.c_id = ay.q_id
    ), best AS (
      SELECT q_id, c_id, score, margin,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY margin DESC, c_id) AS rk
      FROM joined
    )
    SELECT q_id AS src_id, c_id AS tgt_id, score AS cos, margin
    FROM best WHERE rk = 1 AND margin >= 1.3"""




def q_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cartography: per-cluster composition report over the
    fixed-point k-means assignment (the Nomic-Atlas-style "what is in
    my data" map a curation run produces before choosing mixture
    weights). Composes kmeans_fixed_point (bit-exact iterative
    clustering) with a documents join (vec_id = doc_id) and two
    mergeable aggregations: per-(cluster, source) counts roll up to
    per-cluster doc counts, dominant source via min_by on
    (-count, source) (max count, ties to the lexicographically first
    source), exact char sums, and mean squared distance (cluster
    tightness) — integer sums, ONE double division each, so the report
    is engine-exact on top of an ITERATIVE algorithm."""
    from etl_global_mobility_spark.operators.similarity import (
        kmeans_fixed_point,
    )

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    assign = kmeans_fixed_point(
        e,
        k=4,
        iters=2,
        centroids=_kmeans_artifact_centroids(spark, sf_dir, k=4, iters=2),
    )
    j = assign.join(d, assign.vec_id == d.doc_id).select(
        "cluster_id", "dist_sq", "source", "n_chars"
    )
    per_cs = j.groupBy("cluster_id", "source").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_chars").alias("chars"),
        F.sum("dist_sq").alias("dsum"),
    )
    return (
        per_cs.groupBy("cluster_id")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.min_by(
                F.struct(F.col("source"), F.col("cnt")),
                F.struct((-F.col("cnt")).alias("_nc"), F.col("source")),
            ).alias("_top"),
            F.sum("chars").alias("sum_chars"),
            F.sum("dsum").alias("sum_dist"),
        )
        .select(
            "cluster_id",
            "n_docs",
            F.col("_top.source").alias("top_source"),
            F.col("_top.cnt").alias("top_source_docs"),
            "sum_chars",
            (F.col("sum_chars").cast("double") / F.col("n_docs")).alias(
                "mean_chars"
            ),
            (F.col("sum_dist").cast("double") / F.col("n_docs")).alias(
                "mean_dist_sq"
            ),
        )
    )


def _cluster_profile_sql() -> str:
    return f"""
    WITH j AS (
      SELECT a.cluster_id, a.dist_sq, d.source, d.n_chars
      FROM ({_kmeans_sql()}) a JOIN documents d ON a.vec_id = d.doc_id
    ), per_cs AS (
      SELECT cluster_id, source, count(*) AS cnt,
             CAST(sum(n_chars) AS BIGINT) AS chars,
             CAST(sum(dist_sq) AS BIGINT) AS dsum
      FROM j GROUP BY cluster_id, source
    ), tops AS (
      SELECT cluster_id, source, cnt,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY cnt DESC, source) AS rk
      FROM per_cs
    ), agg AS (
      SELECT cluster_id, CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(sum(chars) AS BIGINT) AS sum_chars,
             CAST(sum(dsum) AS BIGINT) AS sum_dist
      FROM per_cs GROUP BY cluster_id
    )
    SELECT a.cluster_id, a.n_docs, t.source AS top_source,
           t.cnt AS top_source_docs, a.sum_chars,
           CAST(a.sum_chars AS DOUBLE) / a.n_docs AS mean_chars,
           CAST(a.sum_dist AS DOUBLE) / a.n_docs AS mean_dist_sq
    FROM agg a JOIN tops t ON a.cluster_id = t.cluster_id AND t.rk = 1"""




def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling (operators/splits.py
    cluster_balanced_sample over the fixed-point k-means assignment):
    every cluster downsampled toward the smallest cluster's mass with
    the exact-integer md5 coin — kept rows with their cluster size and
    the min-cluster target attached."""
    from etl_global_mobility_spark.operators.similarity import (
        kmeans_fixed_point,
    )
    from etl_global_mobility_spark.operators.splits import (
        cluster_balanced_sample,
    )

    e = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_fixed_point(
        e,
        k=4,
        iters=2,
        centroids=_kmeans_artifact_centroids(spark, sf_dir, k=4, iters=2),
    ).select("vec_id", "cluster_id")
    return cluster_balanced_sample(assign, id_col="vec_id", seed=9)


def _cluster_balanced_sql() -> str:
    coin = _md5_hash_sql("CAST(vec_id AS VARCHAR)", 9)
    return f"""
    WITH assign AS (
      SELECT vec_id, cluster_id FROM ({_kmeans_sql()})
    ), sizes AS (
      SELECT cluster_id, count(*) AS cluster_n
      FROM assign GROUP BY cluster_id
    ), mn AS (
      SELECT CAST(min(cluster_n) AS BIGINT) AS min_n FROM sizes
    )
    SELECT a.cluster_id, a.vec_id,
           CAST(s.cluster_n AS BIGINT) AS cluster_n, mn.min_n
    FROM assign a JOIN sizes s ON a.cluster_id = s.cluster_id, mn
    WHERE {coin} % s.cluster_n < mn.min_n"""




def q_dataset_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-over-release corpus drift report — the aggregate-level
    diff a data-release review reads next to the row-level CDC
    (rel_snapshot_diff): per-source doc/token counts of the previous
    release FULL-OUTER-joined to the current one, with deltas and the
    doc percent change (NULL for sources new in this release — no
    base to divide by). The "previous release" here is a deterministic
    subset (doc_id % 10 != 0) so both engines rebuild the same pair of
    snapshots; in production the old side is last release's committed
    card. Two bounded source-keyed aggregations + a tiny full-outer
    join — output ∝ distinct sources, never corpus-sized."""
    from etl_global_mobility_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents")

    def card(frame, tag):
        return frame.groupBy("source").agg(
            F.count(F.lit(1)).alias(f"docs_{tag}"),
            F.sum(token_count("text")).alias(f"tokens_{tag}"),
        )

    old = card(d.filter(F.col("doc_id") % 10 != 0), "old")
    new = card(d, "new")
    j = old.join(new, "source", "full_outer")
    docs_old = F.coalesce(F.col("docs_old"), F.lit(0))
    docs_new = F.coalesce(F.col("docs_new"), F.lit(0))
    tokens_old = F.coalesce(F.col("tokens_old"), F.lit(0))
    tokens_new = F.coalesce(F.col("tokens_new"), F.lit(0))
    return j.select(
        "source",
        docs_old.alias("docs_old"),
        docs_new.alias("docs_new"),
        (docs_new - docs_old).alias("docs_delta"),
        tokens_old.alias("tokens_old"),
        tokens_new.alias("tokens_new"),
        (tokens_new - tokens_old).alias("tokens_delta"),
        F.when(
            docs_old > 0,
            (docs_new - docs_old).cast("double") / docs_old,
        ).alias("docs_pct_change"),
    )


_DATASET_DRIFT_SQL = f"""
    WITH old AS (
      SELECT source, count(*) AS docs_old,
             CAST(sum(len({TOKS})) AS BIGINT) AS tokens_old
      FROM documents WHERE doc_id % 10 <> 0 GROUP BY source
    ), new AS (
      SELECT source, count(*) AS docs_new,
             CAST(sum(len({TOKS})) AS BIGINT) AS tokens_new
      FROM documents GROUP BY source
    )
    SELECT coalesce(o.source, n.source) AS source,
           coalesce(o.docs_old, 0) AS docs_old,
           coalesce(n.docs_new, 0) AS docs_new,
           coalesce(n.docs_new, 0) - coalesce(o.docs_old, 0) AS docs_delta,
           coalesce(o.tokens_old, 0) AS tokens_old,
           coalesce(n.tokens_new, 0) AS tokens_new,
           coalesce(n.tokens_new, 0) - coalesce(o.tokens_old, 0)
             AS tokens_delta,
           CASE WHEN coalesce(o.docs_old, 0) > 0 THEN
             CAST(coalesce(n.docs_new, 0) - coalesce(o.docs_old, 0)
                  AS DOUBLE) / o.docs_old END AS docs_pct_change
    FROM old o FULL OUTER JOIN new n ON o.source = n.source"""


SPECS = [
    QuerySpec(
        "llm_exact_dedup",
        q_exact_dedup,
        """WITH hashed AS (
             SELECT doc_id, sha256(text) AS content_hash,
                    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn,
                    count(*) OVER (PARTITION BY sha256(text)) AS n_copies
             FROM documents)
           SELECT doc_id, content_hash, n_copies FROM hashed WHERE rn = 1""",
        doc="exact content dedup via sha2-256 hash-groupBy",
    ),
    QuerySpec(
        "llm_fingerprint",
        q_fingerprint,
        # coalesce mirrors Spark's concat_ws: a NULL token array joins
        # to '' (fp of no content = md5('')), never a NULL fp
        f"SELECT doc_id, "
        f"substr(md5(coalesce(array_to_string({TOKS}, ' '), '')), 1, 16) AS fp "
        "FROM documents",
        doc="md5 document fingerprint of normalized tokens",
    ),
    QuerySpec(
        "llm_text_stats",
        q_text_stats,
        f"""SELECT doc_id,
              len(text) AS n_chars_calc,
              len({TOKS}) AS n_tokens,
              CAST(CASE WHEN {TOKS} IS NULL THEN NULL
                        ELSE coalesce(list_sum(list_transform({TOKS}, t -> len(t))), 0)
                   END AS DOUBLE)
                / greatest(len({TOKS}), 1) AS avg_token_len,
              CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                / greatest(len(text), 1) AS punct_ratio,
              CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                / greatest(len(text), 1) AS digit_ratio
            FROM documents""",
        doc="per-document text statistics",
    ),
    QuerySpec(
        "llm_tfidf_topterms",
        q_tfidf_topterms,
        f"""WITH toks AS (
              SELECT doc_id AS id, unnest({TOKS}) AS t FROM documents
            ), tf AS (
              SELECT id, t, count(*) AS tf FROM toks GROUP BY 1, 2
            ), dfq AS (
              SELECT t, count(*) AS df FROM tf GROUP BY 1
            ), scored AS (
              SELECT id, t, tf, df, CAST(tf AS DOUBLE) / df AS score
              FROM tf JOIN dfq USING (t)
            ), ranked AS (
              SELECT id, t, tf, df, score,
                     row_number() OVER (PARTITION BY id
                                        ORDER BY score DESC, t) AS rank
              FROM scored
            )
            SELECT id AS doc_id, CAST(rank AS INT) AS rank, t AS term,
                   tf, df, (SELECT count(*) FROM documents) AS n_docs, score
            FROM ranked WHERE rank <= 3""",
        doc="per-document TF-IDF top-3 terms (tf/df rational score; "
        "df + n_docs exposed for any idf curve)",
    ),
    QuerySpec(
        "llm_bigram_novelty",
        q_bigram_novelty,
        f"""WITH toks AS (
              SELECT doc_id AS id, unnest({TOKS}) AS t,
                     generate_subscripts({TOKS}, 1) AS pos
              FROM documents
            ), bg AS (
              SELECT a.id, a.t || ' ' || b.t AS bg
              FROM toks a JOIN toks b ON a.id = b.id AND b.pos = a.pos + 1
            ), corpus AS (
              SELECT bg, count(*) AS c FROM bg GROUP BY 1
            ), perdoc AS (
              SELECT id, count(*) AS n_bigrams,
                     count(*) FILTER (WHERE c <= 2) AS n_rare
              FROM bg JOIN corpus USING (bg) GROUP BY id
            )
            SELECT d.doc_id,
                   coalesce(n_bigrams, 0) AS n_bigrams,
                   coalesce(n_rare, 0) AS n_rare,
                   CAST(coalesce(n_rare, 0) AS DOUBLE)
                     / greatest(coalesce(n_bigrams, 0), 1) AS novelty
            FROM documents d LEFT JOIN perdoc ON perdoc.id = d.doc_id""",
        doc="corpus-conditioned rare-bigram novelty ratio per document "
        "(exact-arithmetic cousin of n-gram-LM quality scoring)",
    ),
    QuerySpec(
        "llm_lang_profile",
        q_lang_profile,
        f"""WITH totals AS (
              SELECT lang, CAST(sum(len({TOKS})) AS BIGINT) AS total_tokens,
                     count(*) AS n_docs
              FROM documents GROUP BY lang
            ), salient AS ({_salient_terms_sql(5)})
            SELECT s.lang, s.rank, s.term, s.tf, s.df, s.score,
                   t.total_tokens, t.n_docs
            FROM salient s JOIN totals t USING (lang)""",
        doc="per-language profile: top-5 salient terms + token totals "
        "(merges the r3 llm_token_count_by_lang + llm_salient_terms "
        "variants)",
    ),
    QuerySpec(
        "llm_language_id",
        q_language_id,
        _language_id_sql(),
        doc="stopword-ratio language heuristic",
    ),
    QuerySpec(
        "llm_quality_score",
        q_quality_score,
        f"""SELECT doc_id, {_QUALITY_EXPR} AS quality FROM documents""",
        doc="heuristic quality score",
    ),
    QuerySpec("llm_simhash", q_simhash, _simhash_sql(32), doc="SimHash fingerprint (md5-based)"),
    QuerySpec(
        "llm_minhash_neardup",
        q_minhash_neardup,
        _minhash_sql(),
        doc="MinHash+LSH banding near-dup candidates (md5-based, oracle-checked)",
    ),
    QuerySpec(
        "llm_hash_split",
        q_hash_split,
        f"""SELECT CASE
                 WHEN {_md5_hash_sql("CAST(doc_id AS VARCHAR)", 0)} % 100 < 80
                   THEN 'train'
                 WHEN {_md5_hash_sql("CAST(doc_id AS VARCHAR)", 0)} % 100 < 90
                   THEN 'valid'
                 ELSE 'test' END AS split,
               lang, count(*) AS n_docs
            FROM documents GROUP BY 1, 2""",
        doc="deterministic md5-bucket train/valid/test split",
    ),
    QuerySpec(
        "llm_dedup_components",
        q_dedup_components,
        f"""WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_ngram_jaccard_sql()})
           ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
           ), reach AS (
              SELECT DISTINCT src AS id, src AS r FROM edges
              UNION
              SELECT e.src AS id, reach.r FROM edges e
              JOIN reach ON reach.id = e.dst
           )
           SELECT id AS doc_id, min(r) AS component
           FROM reach GROUP BY id""",
        doc="near-dup connected components (canonical = min doc_id)",
    ),
    QuerySpec(
        "llm_community_labelprop",
        q_community_labelprop,
        f"""WITH pairs AS (
              SELECT id_a, id_b FROM ({_ngram_jaccard_sql()})
           ), und AS (
              SELECT DISTINCT src, dst FROM (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs)
           ), l0 AS (
              SELECT DISTINCT src AS node, src AS label FROM und
           ), l1 AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, label) AS rk
                FROM (SELECT u.src AS node, l.label, count(*) AS n
                      FROM und u JOIN l0 l ON l.node = u.dst
                      GROUP BY 1, 2))
              WHERE rk = 1
           ), l2 AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, label) AS rk
                FROM (SELECT u.src AS node, l.label, count(*) AS n
                      FROM und u JOIN l1 l ON l.node = u.dst
                      GROUP BY 1, 2))
              WHERE rk = 1
           ), l3 AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, label) AS rk
                FROM (SELECT u.src AS node, l.label, count(*) AS n
                      FROM und u JOIN l2 l ON l.node = u.dst
                      GROUP BY 1, 2))
              WHERE rk = 1
           )
           SELECT node AS doc_id, label AS community FROM l3""",
        doc="majority label-propagation communities over the near-dup "
        "graph (3 synchronous rounds, min-label ties) — the density-"
        "splitting complement of connected components",
    ),
    QuerySpec(
        "llm_labelprop_convergence",
        q_labelprop_convergence,
        f"""WITH pairs AS (
              SELECT id_a, id_b FROM ({_ngram_jaccard_sql()})
           ), und AS (
              SELECT DISTINCT src, dst FROM (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs)
           ), l0 AS (
              SELECT DISTINCT src AS node, src AS label FROM und
           ), l1 AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, label) AS rk
                FROM (SELECT u.src AS node, l.label, count(*) AS n
                      FROM und u JOIN l0 l ON l.node = u.dst
                      GROUP BY 1, 2))
              WHERE rk = 1
           ), l2 AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, label) AS rk
                FROM (SELECT u.src AS node, l.label, count(*) AS n
                      FROM und u JOIN l1 l ON l.node = u.dst
                      GROUP BY 1, 2))
              WHERE rk = 1
           ), l3 AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY n DESC, label) AS rk
                FROM (SELECT u.src AS node, l.label, count(*) AS n
                      FROM und u JOIN l2 l ON l.node = u.dst
                      GROUP BY 1, 2))
              WHERE rk = 1
           ), nn AS (
              SELECT count(*) AS n_nodes FROM l0
           ), diffs AS (
              SELECT 1 AS round,
                     count(*) FILTER (WHERE b.label <> a.label) AS n_changed
              FROM l1 b JOIN l0 a ON a.node = b.node
              UNION ALL
              SELECT 2,
                     count(*) FILTER (WHERE b.label <> a.label)
              FROM l2 b JOIN l1 a ON a.node = b.node
              UNION ALL
              SELECT 3,
                     count(*) FILTER (WHERE b.label <> a.label)
              FROM l3 b JOIN l2 a ON a.node = b.node
           )
           SELECT CAST(round AS INT) AS round, n_changed, n_nodes,
                  CASE WHEN n_nodes = 0 THEN 0.0
                       ELSE CAST(n_changed AS DOUBLE) / n_nodes
                  END AS frac_changed
           FROM diffs CROSS JOIN nn""",
        doc="rounds-to-convergence diagnostic for label propagation: "
        "per synchronous round, the count and fraction of nodes that "
        "changed label — the operational dial behind the fixed-round "
        "community contract",
    ),
    QuerySpec(
        "llm_quality_prune",
        q_quality_prune,
        f"""WITH scored AS (
             SELECT doc_id, {_QUALITY_EXPR} AS quality FROM documents
           ), thr AS (
             SELECT quantile_cont(quality, 0.25) AS _p25 FROM scored
           )
           SELECT doc_id, quality FROM scored, thr
           WHERE quality >= _p25""",
        doc="percentile-based quality pruning: drop the bottom "
        "quartile of the heuristic score (distribution-relative cut)",
    ),
    QuerySpec(
        "llm_cross_source_dups",
        q_cross_source_dups,
        f"""WITH pairs AS (
             SELECT id_a, id_b FROM ({_minhash_sql()})
           )
           SELECT least(da.source, db.source) AS source_a,
                  greatest(da.source, db.source) AS source_b,
                  count(*) AS n_pairs
           FROM pairs
           JOIN documents da ON pairs.id_a = da.doc_id
           JOIN documents db ON pairs.id_b = db.doc_id
           GROUP BY 1, 2""",
        doc="cross-source duplication matrix: near-dup pairs grouped "
        "by canonical source pair (leak-analysis report)",
    ),
    QuerySpec(
        "llm_dedup_cluster_stats",
        q_dedup_cluster_stats,
        f"""WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_ngram_jaccard_sql()})
           ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
           ), reach AS (
              SELECT DISTINCT src AS id, src AS r FROM edges
              UNION
              SELECT e.src AS id, reach.r FROM edges e
              JOIN reach ON reach.id = e.dst
           ), comp AS (
              SELECT id, min(r) AS component FROM reach GROUP BY id
           ), sizes AS (
              SELECT component, count(*) AS cluster_size
              FROM comp GROUP BY component
           )
           SELECT cluster_size, count(*) AS n_clusters,
                  CAST(sum(cluster_size - 1) AS BIGINT) AS dup_docs
           FROM sizes GROUP BY cluster_size""",
        doc="dedup audit report: near-dup cluster-size histogram + "
        "duplicate documents removed per size class",
    ),
    QuerySpec(
        "llm_ngram_jaccard",
        q_ngram_jaccard,
        _ngram_jaccard_sql(),
        doc="exact n-gram Jaccard via inverted-index join",
    ),
    QuerySpec(
        "llm_incremental_neardup",
        q_incremental_neardup,
        _incremental_neardup_sql(),
        doc="incremental near-dup maintenance: new shard vs persisted "
        "band-signature index, proven ≡ full recompute on the union",
    ),
    QuerySpec(
        "llm_minhash_verified",
        q_minhash_verified,
        _minhash_verified_sql(),
        doc="two-stage near-dup: LSH banding candidates + exact "
        "shingle-set Jaccard verify on candidates only",
    ),
    QuerySpec(
        "llm_ann_recall_report",
        q_ann_recall_report,
        _ann_recall_report_sql(),
        doc="retrieval evaluation as an operator: per-query recall@k of "
        "LSH ANN vs exact cosine ground truth",
    ),
    QuerySpec(
        "llm_retrieval_ndcg",
        q_retrieval_ndcg,
        _retrieval_ndcg_sql(),
        doc="rank-aware retrieval evaluation: per-query nDCG@k of LSH "
        "ANN vs exact cosine ground truth, exact-integer rational "
        "rank discounts (order-invariant cross-engine sums)",
    ),
    QuerySpec(
        "llm_ivf_incremental",
        q_ivf_incremental,
        _ivf_incremental_sql(),
        doc="incremental ANN ingest: new embedding shard probed through "
        "the persisted IVF quantizer artifact (save→load→probe proven "
        "each run), cost ∝ shard, no retraining",
    ),
    QuerySpec(
        "llm_normalize_text",
        q_normalize_text,
        _normalize_text_sql(),
        doc="pre-dedup text normalization: control-char strip, Unicode "
        "whitespace collapse, punctuation tightening — byte-identical "
        "across engines via shared portable regex patterns",
    ),
    QuerySpec(
        "llm_cosine_topk",
        q_cosine_topk,
        _cosine_topk_sql(),
        doc="exact cosine top-k similarity search",
    ),
    QuerySpec(
        "llm_mmr_rerank",
        q_mmr_rerank,
        _mmr_sql(),
        doc="Maximal Marginal Relevance re-ranking (Carbonell & "
        "Goldstein, SIGIR 1998): redundancy-aware greedy top-k over "
        "dense-retrieval candidates; oracle unrolls the greedy into "
        "k argmax CTE steps",
    ),
    QuerySpec(
        "llm_lsh_ann",
        q_lsh_ann,
        _lsh_ann_sql(),
        doc="LSH-bucketed approximate nearest neighbors",
    ),
    QuerySpec(
        "llm_ivf_ann",
        q_ivf_ann,
        _ivf_ann_sql(),
        doc="IVF approximate nearest neighbors (nprobe cell search)",
    ),
    QuerySpec(
        "llm_pq_ann",
        q_pq_ann,
        _pq_ann_sql(),
        doc="product-quantization ANN: ADC shortlist + exact re-rank",
    ),
    QuerySpec(
        "llm_embedding_neardup",
        q_embedding_neardup,
        _embedding_neardup_sql(),
        doc="embedding-cosine near-dup dedup (LSH-bucketed candidates)",
    ),
    QuerySpec(
        "llm_semantic_dedup",
        q_semantic_dedup,
        _semantic_dedup_sql(thr=0.35),
        doc="SemDeDup semantic dedup: coarse-quantized cells, within-cell cosine ≥ 0.35",
    ),
    QuerySpec(
        "llm_quality_classifier",
        q_quality_classifier,
        _quality_classifier_sql(),
        doc="linear quality-classifier inference: bit-exact logit, threshold keep",
    ),
    QuerySpec(
        "llm_quality_classifier_trained",
        q_quality_classifier_trained,
        _quality_classifier_sql(_TRAINED_W),
        doc="trained-model artifact round-trip: weights persisted as "
        "parquet+manifest, reloaded with validation, scored through the "
        "bit-exact inference path",
    ),
    QuerySpec(
        "llm_hybrid_retrieval_rrf",
        q_hybrid_retrieval_rrf,
        _hybrid_rrf_sql(),
        doc="hybrid retrieval: BM25 + dense cosine fused by Reciprocal Rank Fusion",
    ),
    QuerySpec(
        "llm_e2e_training_examples",
        q_e2e_training_examples,
        _e2e_training_examples_sql(),
        doc="fused pipeline: classifier filter → exact dedup → causal-LM example windows",
    ),
    QuerySpec(
        "llm_bpe_train",
        q_bpe_train,
        None,
        doc="distributed BPE tokenizer training (iterative; reference-tested, rows-only)",
    ),
    QuerySpec(
        "llm_bpe_pair_stats",
        q_bpe_pair_stats,
        _bpe_pair_stats_sql(),
        doc="one BPE merge iteration's pair-count table (oracle-backed "
        "non-iterative slice of llm_bpe_train)",
    ),
    QuerySpec(
        "llm_unigram_train",
        q_unigram_train,
        None,
        doc="distributed unigram-LM (SentencePiece-style) tokenizer "
        "training: EM + prune (iterative; reference-tested, rows-only)",
    ),
    QuerySpec(
        "llm_unigram_seed_stats",
        q_unigram_seed_stats,
        _unigram_seed_stats_sql(),
        doc="the unigram trainer's substring seed-candidate table "
        "(oracle-backed non-iterative slice of llm_unigram_train)",
    ),
    QuerySpec(
        "llm_trigram_backoff_rarity",
        q_trigram_backoff_rarity,
        _trigram_backoff_rarity_sql(),
        doc="trigram Stupid-Backoff LM perplexity filter: reference "
        "model on the src0 slice, exact integer micro-unit scoring "
        "(the full CCNet shape beyond llm_unigram_rarity)",
    ),
    QuerySpec(
        "llm_sentence_chunks",
        q_sentence_chunks,
        _sentence_chunks_sql(),
        doc="sentence-boundary-respecting RAG chunking (pack_sequences "
        "contract at sentence granularity; no mid-sentence cuts)",
    ),
    QuerySpec(
        "llm_temperature_mix",
        q_temperature_mix,
        _temperature_mix_sql(),
        doc="temperature-scaled source balancing (T=0.5, closed-form "
        "sqrt(t_min/t_s) rates, md5-deterministic sample)",
    ),
    QuerySpec(
        "llm_packing_efficiency",
        q_packing_efficiency,
        _packing_efficiency_sql(),
        doc="padding-waste planning report for causal-LM examples "
        "(integer-exact, one scan + one bounded agg)",
    ),
    QuerySpec(
        "llm_dup_ngram_spans",
        q_dup_ngram_spans,
        _dup_ngram_spans_sql(),
        doc="exact-substring duplication coverage per doc (fixed-k "
        "inverted-index form of Lee et al. 2022)",
    ),
    QuerySpec(
        "llm_dup_spans_within",
        q_dup_spans_within,
        _dup_spans_within_sql(),
        doc="WITHIN-document repeated k-gram coverage (Gopher duplicate-"
        "n-gram signal) — zero-shuffle map-only complement of "
        "llm_dup_ngram_spans",
    ),
    QuerySpec(
        "llm_dup_substring_spans",
        q_dup_substring_spans,
        _dup_substring_spans_sql(),
        doc="variable-length exact-substring dedup (Lee et al. "
        "ExactSubstr maximal spans via anchor chaining) — finds the "
        "planted 200-token passage fixed-k span-union cannot size",
    ),
    QuerySpec(
        "llm_preference_pairs",
        q_preference_pairs,
        _preference_pairs_sql(),
        doc="RLHF preference pairs: per-group best vs worst classifier score + margin",
    ),
    QuerySpec(
        "llm_causal_lm_examples",
        q_causal_lm_examples,
        _causal_lm_sql(),
        doc="causal-LM training examples: windowed hashed ids, shifted labels, loss mask",
    ),
    QuerySpec(
        "llm_knn_label_vote",
        q_knn_label_vote,
        _knn_vote_sql(),
        doc="kNN majority-label vote",
    ),
    QuerySpec(
        "llm_repetition_signals",
        q_repetition_signals,
        _repetition_sql(2),
        doc="Gopher-style repetition quality signals (top-token/dup-2-gram fractions)",
    ),
    QuerySpec(
        "llm_contamination",
        q_contamination,
        _contamination_sql(),
        doc="benchmark decontamination via 2-gram shingle overlap (broadcast bench index)",
    ),
    QuerySpec(
        "llm_pii_redact",
        q_pii_redact,
        _pii_sql(),
        doc="PII scrub: inject deterministic emails/phones, redact, count + hash",
    ),
    QuerySpec(
        "llm_stratified_sample",
        q_stratified_sample,
        _stratified_sample_sql({"en": 0.5, "es": 0.3, "fr": 0.2}, 0.1, seed=1),
        doc="deterministic per-language stratified sample (stable md5 buckets)",
    ),
    QuerySpec(
        "llm_vocab_oov",
        q_vocab_oov,
        _vocab_oov_sql(),
        doc="top-k vocabulary build + per-doc OOV fraction (broadcast vocab)",
    ),
    QuerySpec(
        "llm_feature_hash",
        q_feature_hash,
        _feature_hash_sql(),
        doc="hashing-trick vectorization: sparse L2-normalized tf vectors",
    ),
    QuerySpec(
        "llm_pack_sequences",
        q_pack_sequences,
        _pack_sequences_sql(256),
        doc="concat-and-chunk sequence packing: per-shard window cumsum, budget=256",
    ),
    QuerySpec(
        "llm_chunk_documents",
        q_chunk_documents,
        _chunk_documents_sql(32, 24),
        doc="overlapping token-window chunking (32/24), map-only explode",
    ),
    QuerySpec(
        "llm_strip_boilerplate",
        q_strip_boilerplate,
        _strip_boilerplate_sql(3, 5),
        doc="segment-level boilerplate dedup: df>5 3-token segments dropped, docs rebuilt",
    ),
    QuerySpec(
        "llm_multimodal_features",
        q_multimodal_features,
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, 16 AS n_dim FROM documents",
        doc="binary media plumbing + Arrow-batched feature stub",
    ),
    QuerySpec(
        "llm_asof_join",
        q_asof_view_before_purchase,
        """WITH p AS (SELECT event_id, ts, user_id FROM events
                      WHERE event_type = 'purchase'),
                v AS (SELECT event_id, ts, user_id FROM events
                      WHERE event_type = 'view'),
                matched AS (
                  SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
                         p.user_id, v.event_id AS view_id, v.ts AS view_ts,
                         row_number() OVER (PARTITION BY p.event_id
                                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
                  FROM p LEFT JOIN v
                    ON v.user_id = p.user_id AND v.ts <= p.ts
                )
           SELECT purchase_id, purchase_ts, user_id, view_id, view_ts
           FROM matched WHERE rn = 1""",
        doc="as-of join (merge-asof via union+window, no pair explosion)",
    ),
    QuerySpec(
        "llm_frame_sample",
        q_frame_sample,
        """WITH sized AS (
              SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
              FROM documents
           ), exploded AS (
              SELECT media_id, n_bytes,
                     unnest(range(0, least(8, CAST(ceil(n_bytes / 256.0) AS BIGINT))))
                       AS frame_idx
              FROM sized
           )
           SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
                  frame_idx * 256 AS off_bytes,
                  least(256, n_bytes - frame_idx * 256) AS frame_len
           FROM exploded""",
        doc="video-frame sampling stub (1-to-N mapInPandas explode)",
    ),
    QuerySpec(
        "llm_filter_rules",
        q_filter_rules,
        _filter_rules_sql(),
        doc="Gopher/C4-style rule engine: named flags + keep + reasons "
        "(the reference's quality-quarantine pattern, NB:561-678)",
    ),
    QuerySpec(
        "llm_bm25",
        q_bm25,
        _bm25_sql(),
        doc="BM25 lexical top-k (rational idf for cross-engine FP parity)",
    ),
    QuerySpec(
        "llm_mix_sources",
        q_mix_sources,
        _mix_sources_sql(),
        doc="data mixing: data-derived per-source rates toward a target "
        "token mixture + deterministic md5 sample",
    ),
    QuerySpec(
        "llm_e2e_curation",
        q_e2e_curation,
        _e2e_curation_sql(),
        doc="composed curation pipeline: filter_rules → exact_dedup → "
        "mix_sources in one fused plan",
    ),
    QuerySpec(
        "llm_split_leakage",
        q_split_leakage,
        _split_leakage_sql(),
        doc="train/test leakage audit: near-dup pairs straddling splits",
    ),
    QuerySpec(
        "llm_per_source_cap",
        q_per_source_cap,
        _per_source_cap_sql(),
        doc="exact per-source row cap, deterministic md5 order "
        "(no source dominates)",
    ),
    QuerySpec(
        "llm_dedup_keep_best",
        q_dedup_keep_best,
        f"""WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_ngram_jaccard_sql()})
           ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
           ), reach AS (
              SELECT DISTINCT src AS id, src AS r FROM edges
              UNION
              SELECT e.src AS id, reach.r FROM edges e
              JOIN reach ON reach.id = e.dst
           ), comp AS (
              SELECT id AS doc_id, min(r) AS component
              FROM reach GROUP BY id
           ), scored AS (
              SELECT c.component, c.doc_id, {_QUALITY_EXPR} AS quality,
                     row_number() OVER (PARTITION BY c.component
                                        ORDER BY {_QUALITY_EXPR} DESC, c.doc_id)
                       AS rk
              FROM comp c JOIN documents USING (doc_id)
           )
           SELECT component, doc_id AS best_doc_id, quality
           FROM scored WHERE rk = 1""",
        doc="keep-best canonical selection per near-dup cluster "
        "(quality argmax, tie -> lowest id)",
    ),
    QuerySpec(
        "llm_winnowing_fingerprint",
        q_winnowing_fingerprint,
        _WINNOW_SQL,
        doc="winnowing document fingerprints (Schleimer et al. "
        "SIGMOD'03): sliding-window minima over k-gram md5 hashes, "
        "map-side array expressions only",
    ),
    QuerySpec(
        "llm_length_bucket_batching",
        q_length_bucket_batching,
        _LENGTH_BUCKET_SQL,
        doc="length-bucketed batching report: fixed power-of-two "
        "caps, padded cost and efficiency per bucket",
    ),
    QuerySpec(
        "llm_epoch_plan",
        q_epoch_plan,
        _epoch_plan_sql(),
        doc="training data-recipe table: per-source tokens, target "
        "share, implied epochs at a token budget (bounded agg + "
        "literal arithmetic)",
    ),
    QuerySpec(
        "llm_token_budget_sample",
        q_token_budget_sample,
        f"""WITH t AS (
             SELECT doc_id,
                    CAST(len({TOKS}) AS BIGINT) AS n_tokens,
                    md5('11:' || CAST(doc_id AS VARCHAR)) AS sort_key,
                    CAST({_md5_hash_sql("CAST(doc_id AS VARCHAR)", 12)}
                         % 4 AS INT) AS shard
             FROM documents
           ), r AS (
             SELECT doc_id, shard, n_tokens,
                    row_number() OVER w AS pos,
                    CAST(sum(n_tokens) OVER (PARTITION BY shard
                         ORDER BY sort_key, doc_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      AS cum_tokens
             FROM t
             WINDOW w AS (PARTITION BY shard ORDER BY sort_key, doc_id)
           )
           SELECT doc_id, shard, pos, n_tokens, cum_tokens
           FROM r WHERE cum_tokens <= 2500""",
        doc="deterministic token-budget corpus cut: md5-sharded "
        "hash-ordered prefixes, per-shard running-total windows "
        "(never a global sort)",
    ),
    QuerySpec(
        "llm_hard_negative_mining",
        q_hard_negative_mining,
        _hard_negative_sql(),
        doc="DPR-style hard-negative mining: most-similar different-"
        "label corpus items per query (contrastive retrieval "
        "training negatives)",
    ),
    QuerySpec(
        "llm_winnowing_neardup",
        q_winnowing_neardup,
        _WINNOW_NEARDUP_SQL,
        doc="MOSS-style near-dup pairs over winnowed fingerprints "
        "(df-capped inverted-index join, structural recall over "
        "shared passages)",
    ),
    QuerySpec(
        "llm_unigram_rarity",
        q_unigram_rarity,
        _UNIGRAM_RARITY_SQL,
        doc="unigram-LM corpus-rarity quality scores (CCNet-style "
        "perplexity filter, rational arithmetic; vocab-sized agg + "
        "skew-tolerant term join)",
    ),
    QuerySpec(
        "llm_cdc_chunks",
        q_cdc_chunks,
        _CDC_CHUNKS_SQL,
        doc="content-defined chunking (LBFS/FastCDC boundary rule): "
        "insertion-stable sub-document chunks with md5 content "
        "hashes, map-side array pipeline",
    ),
    QuerySpec(
        "llm_sft_chat_format",
        q_sft_chat_format,
        _sft_chat_format_sql(),
        doc="ChatML SFT rendering + prompt/completion loss-mask "
        "token spans (zero-shuffle codegen projection)",
    ),
    QuerySpec(
        "llm_cdc_dup_passages",
        q_cdc_dup_passages,
        f"""WITH chunks AS ({_CDC_CHUNKS_SQL})
    SELECT chunk_hash, count(*) AS n_occ,
           count(DISTINCT doc_id) AS n_docs,
           max(n_tokens) AS chunk_tokens,
           min(doc_id) AS example_doc
    FROM chunks WHERE n_tokens >= 4
    GROUP BY chunk_hash HAVING count(*) >= 2""",
        doc="repeated-passage report over insertion-stable CDC chunk "
        "hashes (cross-document boilerplate sweep, one uniform "
        "hash-groupBy)",
    ),
    QuerySpec(
        "llm_kmeans_refine",
        q_kmeans_refine,
        _kmeans_sql(),
        doc="fixed-point Lloyd k-means (2 iterations, integer "
        "quantization): iterative clustering oracle-checked "
        "bit-exactly; map-only assignment vs literal centroids, "
        "bounded k x dim driver exchange per iteration",
    ),
    QuerySpec(
        "llm_weighted_sample",
        q_weighted_sample,
        _weighted_sample_sql(),
        doc="deterministic weighted sampling with replacement "
        "(inverse-CDF over exact integer cumulative token weights, "
        "sharded prefix sum — no transcendentals, no global window)",
    ),
    QuerySpec(
        "llm_group_advantage",
        q_group_advantage,
        _group_advantage_sql(),
        doc="GRPO-style group-relative advantage: fixed-point group "
        "moments, (n*r - s)/sqrt(n*s2 - s^2) in one identical double "
        "op sequence; zero-variance groups emit 0",
    ),
    QuerySpec(
        "llm_span_corruption",
        q_span_corruption,
        _span_corruption_sql(),
        doc="T5 span-corruption denoising examples: hash-deterministic "
        "mask, islands span grouping, sentinel-rendered input/target "
        "(strings only - nothing to diverge)",
    ),
    QuerySpec(
        "llm_dsir_resample",
        q_dsir_resample,
        _dsir_sql(),
        doc="DSIR-style importance resampling (hashed-unigram "
        "target/raw ratio in integer micro-units, deterministic "
        "linear-in-importance inclusion coin; two corpus scans, "
        "n_buckets-row weight broadcast)",
    ),
    QuerySpec(
        "llm_rejection_sample",
        q_rejection_sample,
        _rejection_sample_sql(),
        doc="best-of-n rejection sampling: per prompt group the "
        "reward-argmax response with its margin over the runner-up "
        "(rank window cut to top-2, bounded conditional agg)",
    ),
    QuerySpec(
        "llm_fim_transform",
        q_fim_transform,
        _fim_sql(),
        doc="fill-in-the-middle (PSM) rendering: hash-chosen docs "
        "split at two hash-derived cut points and re-rendered with "
        "sentinels - zero-shuffle codegen projection",
    ),
    QuerySpec(
        "llm_domain_extract",
        q_domain_extract,
        _DOMAIN_EXTRACT_SQL,
        doc="URL -> host/registrable-domain (eTLD+1 with multi-part "
        "suffixes)/tld/path parsing, map-only",
    ),
    QuerySpec(
        "llm_domain_blocklist",
        q_domain_blocklist,
        _DOMAIN_BLOCKLIST_SQL,
        doc="domain blocklist filter with subdomain semantics via "
        "map-only suffix-chain x literal-array overlap (no join)",
    ),
    QuerySpec(
        "llm_domain_cap_report",
        q_domain_cap_report,
        _DOMAIN_CAP_REPORT_SQL,
        doc="per-domain cap (max 5, md5-ordered) + per-domain "
        "doc/token counts and corpus shares",
    ),
    QuerySpec(
        "llm_url_dedup",
        q_url_dedup,
        _URL_DEDUP_SQL,
        doc="URL-level dedup: canonicalize (case/port/slash/fragment/"
        "tracking-param/param-order noise) then keep-best per "
        "canonical URL with absorbed-duplicate counts",
    ),
    QuerySpec(
        "llm_token_fertility",
        q_token_fertility,
        _TOKEN_FERTILITY_SQL,
        doc="tokenizer fertility/compression report per language: "
        "exact char/token/piece sums, chars-per-token, fertility",
    ),
    QuerySpec(
        "llm_int8_quantize",
        q_int8_quantize,
        _INT8_QUANTIZE_SQL,
        doc="per-vector affine int8 quantization (SQ8) with "
        "reconstruction max-abs-err and MSE — map-only, let-bound "
        "min/max/scale, identical float sequence in both engines",
    ),
    QuerySpec(
        "llm_k_anonymity",
        q_k_anonymity,
        _K_ANONYMITY_SQL,
        doc="k-anonymity audit per quasi-identifier class (lang, "
        "source, length bucket): size, at-risk flag, corpus share",
    ),
    QuerySpec(
        "llm_k_suppress",
        q_k_suppress,
        _K_SUPPRESS_SQL,
        doc="k-anonymity suppression baseline: rows surviving the "
        "class-size >= k filter (keyed window, no join-back)",
    ),
    QuerySpec(
        "llm_event_sequences",
        q_event_sequences,
        _EVENT_SEQUENCES_SQL,
        doc="next-event prediction examples: per-user (ts,id)-ordered "
        "lag-window contexts + target — constant state per row",
    ),
    QuerySpec(
        "llm_compression_signal",
        q_compression_signal,
        None,
        doc="zlib compression-ratio repetitiveness signal (Gopher "
        "filter family): Arrow-batched pandas UDF — deterministic but "
        "not SQL-recomputable, rows-only; python-zlib reference test",
    ),
    QuerySpec(
        "llm_keyword_tag",
        q_keyword_tag,
        _KEYWORD_TAG_SQL,
        doc="C4-style keyword tagging: token-exact policy-list hits "
        "per document, zero-shuffle map pass",
    ),
    QuerySpec(
        "llm_pmi_collocations",
        q_pmi_collocations,
        _PMI_SQL,
        doc="top-k collocations by exact-integer PMI ordering "
        "(no engine-divergent ln); bigram/unigram aggs + top-k",
    ),
    QuerySpec(
        "llm_e2e_web_curation",
        q_e2e_web_curation,
        _E2E_WEB_SQL,
        doc="e2e web-curation composition: url dedup -> domain "
        "blocklist -> keyword-fraction prune -> per-domain cap -> "
        "share report, one lazy plan",
    ),
    QuerySpec(
        "llm_multimodal_alignment",
        q_multimodal_alignment,
        _MULTIMODAL_ALIGNMENT_SQL,
        doc="CLIP-score image-text alignment gate: per-pair cosine, "
        "keep >= threshold, NaN/NULL pairs dropped explicitly — "
        "map-only corpus pass (LAION-5B curation shape)",
    ),
    QuerySpec(
        "llm_e2e_multimodal_curation",
        q_e2e_multimodal_curation,
        _E2E_MULTIMODAL_SQL,
        doc="e2e multimodal curation composition: CLIP alignment gate "
        "-> SemDeDup image near-dup on the gated pairs -> caption-"
        "source join -> per-source cap (top-4 by alignment) — one "
        "lazy plan, LAION-curation shape",
    ),
    QuerySpec(
        "llm_alignment_report",
        q_alignment_report,
        _ALIGNMENT_REPORT_SQL,
        doc="alignment-score distribution report: fixed-width bins "
        "over [-1,1] + degenerate row, keep counts per bin — bounded "
        "one-agg threshold-tuning audit",
    ),
    QuerySpec(
        "llm_bitext_mining",
        q_bitext_mining,
        _BITEXT_MINING_SQL,
        doc="margin-based bitext mining (Artetxe & Schwenk 2019): "
        "best cross-lingual candidate per source by ratio margin over "
        "both sides' k-NN neighborhood density, fixed-order double "
        "arithmetic — the CCMatrix parallel-corpus constructor",
    ),
    QuerySpec(
        "llm_cluster_profile",
        q_cluster_profile,
        _cluster_profile_sql(),
        doc="corpus cartography: per-cluster doc counts, dominant "
        "source, char sums, and mean squared distance over the "
        "bit-exact fixed-point k-means assignment — the what's-in-my-"
        "data map behind mixture decisions",
    ),
    QuerySpec(
        "llm_cluster_balanced_sample",
        q_cluster_balanced_sample,
        _cluster_balanced_sql(),
        doc="cluster-balanced diversity sampling: every k-means "
        "cluster downsampled toward the smallest cluster's mass via "
        "the exact-integer md5 coin (h % cluster_n < min_n) — "
        "DataComp/SemDeDup-pipeline rebalancing",
    ),
    QuerySpec(
        "llm_dataset_drift",
        q_dataset_drift,
        _DATASET_DRIFT_SQL,
        doc="release-over-release corpus drift: per-source doc/token "
        "deltas + pct change via two bounded cards full-outer-joined "
        "— the aggregate diff next to row-level CDC",
    ),
]
