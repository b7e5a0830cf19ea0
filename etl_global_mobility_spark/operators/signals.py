"""Corpus-quality signal operators for training-data pipelines:
repetition statistics (Gopher-style filters) and benchmark
contamination checks.

Scale design (100 TB): both operators are explode → hash-aggregate
pipelines — per-document statistics come from distributed groupBys on
uniformly distributed keys, never from per-row quadratic higher-order
functions. The contamination check broadcasts the benchmark inverted
index (eval suites are MBs, corpora are TBs), so the corpus side is
map-side matched and only matched rows shuffle.

All hashes/scores are exact integer or single-IEEE-op arithmetic, so
every output is oracle-checkable on an independent SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.parallelism import (
    AUTO,
    ensure_compute_parallelism,
)
from etl_global_mobility_spark.operators.text import tokenize


def _word_shingles_all(text_col: str, k: int) -> F.Column:
    """ALL k-word shingles in order (duplicates kept — repetition is the
    signal here, unlike dedup's distinct-set semantics). Token array
    let-bound (text._bind) so the per-shingle slice does not
    re-tokenize the document per element."""
    from etl_global_mobility_spark.operators.dedup import _shingle_index
    from etl_global_mobility_spark.operators.text import _bind

    return _bind(
        tokenize(text_col),
        lambda ts: F.transform(
            _shingle_index(F.size(ts), k),
            lambda i: F.concat_ws(" ", F.slice(ts, i, k)),
        ),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """Per-document repetition statistics (the Gopher/MassiveText-style
    quality filters for machine-generated or boilerplate text):

    * ``top_token_frac``   — occurrences of the most frequent token
      / total tokens (high → keyword stuffing);
    * ``dup_gram_frac``    — 1 − distinct/total k-grams (high → the
      same phrases repeat);
    * ``top_gram_frac``    — occurrences of the most frequent k-gram
      / total k-grams.

    Documents with fewer than ``k`` tokens have no k-grams; their gram
    fractions are NULL (token stats still present). Rows with zero
    tokens are dropped (no signal).

    Shape: one explode per granularity → groupBy(id, term) →
    groupBy(id). Both shuffles key on (id, term)/(id) — uniform, no hot
    keys, linear in corpus size.
    """
    tid = F.col(id_col).alias("id")
    df = ensure_compute_parallelism(df, min_parallelism)  # tokenize+shingle ×2 passes

    toks = df.select(tid, F.explode(tokenize(text_col)).alias("t"))
    tok_stats = (
        toks.groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_tok"),
        )
    )

    grams = df.select(tid, F.explode(_word_shingles_all(text_col, k)).alias("g"))
    gram_stats = (
        grams.groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.max("c").alias("top_gram"),
        )
    )

    return tok_stats.join(gram_stats, "id", "left").select(
        F.col("id").alias(id_col),
        "n_tokens",
        (F.col("top_tok").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
        "n_grams",
        (
            F.lit(1.0)
            - F.col("n_distinct_grams").cast("double") / F.col("n_grams")
        ).alias("dup_gram_frac"),
        (F.col("top_gram").cast("double") / F.col("n_grams")).alias("top_gram_frac"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """Benchmark-contamination detection: for each corpus document, the
    fraction of its distinct k-gram shingles that also occur in some
    single benchmark document; rows with best-match overlap ≥
    ``threshold`` are flagged (these are the documents to DROP before
    training, or the eval is graded on memorized data).

    Returns (``id_col``, bench_id, overlap_frac) — one row per
    contaminated corpus document, best benchmark match only
    (ties → lowest bench_id).

    Scale shape: the benchmark inverted index is broadcast (eval suites
    are bounded — MBs against a TB corpus), so the corpus side never
    shuffles for the match; only (doc, bench) hit rows enter the
    aggregation. The corpus shingle explode is map-side.
    """
    from etl_global_mobility_spark.operators.dedup import _word_shingles

    corpus_inv = ensure_compute_parallelism(corpus, min_parallelism).select(
        F.col(id_col).alias("c_id"),
        F.explode(_word_shingles(text_col, k)).alias("s"),
    ).withColumn("n_shingles", F.count(F.lit(1)).over(Window.partitionBy("c_id")))

    bench_inv = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(_word_shingles(text_col, k)).alias("s"),
    )

    hits = (
        corpus_inv.join(F.broadcast(bench_inv), "s")
        .groupBy("c_id", "bench_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .withColumn(
            "overlap_frac",
            F.col("n_hits").cast("double") / F.col("n_shingles"),
        )
    )
    best = hits.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("c_id").orderBy(
                F.col("overlap_frac").desc(), F.col("bench_id")
            )
        ),
    ).filter(F.col("_rn") == 1)
    return best.filter(F.col("overlap_frac") >= threshold).select(
        F.col("c_id").alias(id_col), "bench_id", "overlap_frac"
    )
