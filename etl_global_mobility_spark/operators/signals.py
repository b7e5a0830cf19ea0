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

    # n_shingles is measured MAP-SIDE from the shingle array before the
    # explode (F.size) — the previous Window.partitionBy(c_id) stamp
    # shuffled AND sorted the entire corpus inverted index just to
    # attach a per-doc count, contradicting this operator's own scale
    # contract (the corpus side must never shuffle; the benchmark side
    # is the broadcast). Same value by construction: explode emits one
    # row per (distinct-shingle) array element.
    corpus_inv = ensure_compute_parallelism(corpus, min_parallelism).select(
        F.col(id_col).alias("c_id"),
        _word_shingles(text_col, k).alias("_arr"),
    ).select(
        "c_id",
        F.size("_arr").alias("n_shingles"),
        F.explode("_arr").alias("s"),
    )

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


def _dsir_threshold_expr(scale: int) -> F.Column:
    """The DSIR inclusion threshold ``(score·scale) DIV _mx`` with the
    product widened to DECIMAL(38,0): ``score`` ≤ n_tokens·micro, so
    the BIGINT product overflows for documents past ~9M tokens (at the
    defaults) and non-ANSI Spark would wrap silently, flipping keep
    decisions. The oracle mirrors with HUGEINT; ``div`` on decimals
    returns BIGINT in both engines. Factored out so the overflow
    regression test can drive it against Python big-int math."""
    return F.expr(f"(cast(score as decimal(38,0)) * {scale}) div _mx")


def dsir_importance_resample(
    df: DataFrame,
    target_filter: F.Column,
    n_buckets: int = 4096,
    micro: int = 1_000_000,
    scale: int = 1_000_000,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"),
    fixed-point variant: score every document by how target-like its
    HASHED-unigram distribution is, then keep it with probability
    proportional to that importance — selecting general-corpus data
    that looks like a target domain without training a model.

    * feature = md5(token) mod ``n_buckets`` (the paper's hashed
      n-gram features — bounds the count tables at ``n_buckets`` rows
      regardless of corpus vocabulary);
    * bucket weight = ``((tgt_cnt+1)·micro) DIV (raw_cnt+1)`` — the
      add-1-smoothed target/raw ratio in integer micro-units (the
      paper's log-ratio replaced by the ratio itself: exact integer
      arithmetic instead of engine-divergent ``ln``; a documented
      variant, not a claim of log-likelihood equivalence). The target
      is a SUBSET of the corpus, so raw ≥ tgt and weights are bounded
      by ~``micro``;
    * doc score = Σ bucket weights over its tokens — an exact BIGINT,
      order-independent (≤ tokens·micro, far inside BIGINT);
    * inclusion: keep iff ``md5(id,seed) mod scale <
      (score·scale) DIV max_score`` — a deterministic linear-in-
      importance coin, reproducible anywhere.

    Scale shape: two corpus scans (count pass, score pass — inherent
    to DSIR), both explode → hash-agg on uniform keys; the weight
    table (``n_buckets`` rows) and the 1-row max-score frame are the
    only broadcasts. Returns kept documents with (score, n_tokens,
    draw) for audit.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive: {n_buckets}")
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash

    # compute fan-out before the explode: the md5-per-token pass runs
    # in BOTH aggregation subtrees (count pass and score pass), and a
    # single-row-group scan would execute each on one core; both
    # subtrees read the one round-robin exchange back via
    # ReusedExchange, so the guard adds one small shuffle, not two
    # (no-op at real file counts, like every other text operator here)
    df = ensure_compute_parallelism(df, min_parallelism)
    tok = df.select(
        F.col(id_col),
        target_filter.alias("_is_tgt"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    ).select(
        id_col,
        "_is_tgt",
        (_md5_band_hash(F.col("tok"), 0) % F.lit(n_buckets)).alias("b"),
    )
    counts = tok.groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(F.col("_is_tgt").cast("bigint")).alias("tgt_cnt"),
    )
    weights = counts.select(
        "b",
        F.expr(f"((tgt_cnt + 1) * {micro}) div (raw_cnt + 1)").alias("w"),
    )
    scores = (
        tok.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.sum("w").alias("score"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    mx = scores.agg(F.max("score").alias("_mx"))
    draw = _md5_band_hash(F.col(id_col).cast("string"), seed) % F.lit(scale)
    return (
        scores.crossJoin(F.broadcast(mx))  # 1-row aggregate frame
        .withColumn("draw", draw)
        .filter(F.col("draw") < _dsir_threshold_expr(scale))
        .select(id_col, "score", "n_tokens", "draw")
    )


def compression_ratio_signal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    repetitive_max_ratio: float = 0.3,
) -> DataFrame:
    """Compression-ratio quality signal (the Gopher/MassiveText-family
    repetitiveness filter): zlib-compress each document and report
    compressed/raw byte ratio — templated or looping text compresses
    far below prose, and a near-1 ratio on long text flags binary
    noise. This is the one quality signal that genuinely needs Python
    (no SQL zlib), so it runs as an Arrow-batched pandas UDF — one
    vectorized call per batch, never per-row Python — and everything
    around it (byte lengths, ratio, flag) stays JVM-side. zlib output
    is deterministic for a given (input, level), so the signal is
    reproducible; it is rows-only in the oracle ledger because DuckDB
    cannot recompute it.

    Scale shape: zero shuffles — a pure map pass whose cost is the
    Arrow transfer plus zlib itself (~100 MB/s/core); at 100 TB this
    runs where the data is, like every other map-only signal."""
    import pandas as pd  # noqa: F401 - pandas_udf signature

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _zlib_len(s):
        import zlib

        return s.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
        )

    raw_bytes = F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
    return (
        df.select(
            F.col(id_col),
            raw_bytes.alias("n_bytes"),
            _zlib_len(F.col(text_col)).alias("n_compressed"),
        )
        .select(
            id_col,
            "n_bytes",
            "n_compressed",
            # empty/NULL docs have no meaningful ratio (zlib's 8-byte
            # header over 0 bytes is not a signal) — NULL, not 8.0
            F.when(
                F.col("n_bytes") > 0,
                F.col("n_compressed").cast("double")
                / F.col("n_bytes").cast("double"),
            ).alias("compression_ratio"),
        )
        .withColumn(
            "flagged_repetitive",
            F.coalesce(
                F.col("compression_ratio") < repetitive_max_ratio,
                F.lit(False),
            ),
        )
    )
