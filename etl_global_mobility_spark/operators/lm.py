"""N-gram backoff language-model scoring for corpus quality filtering.

The full CCNet shape (Wenzek et al., arXiv:1911.00359): train an
n-gram LM on a REFERENCE corpus (CCNet uses Wikipedia), score every
candidate document by how surprising its token stream is under that
model, and filter on the score. :func:`~etl_global_mobility_spark.
operators.text.unigram_rarity` is the degenerate n=1 form scored
against the corpus itself; this module adds the real thing — a
TRIGRAM model over a held-out reference slice, so unseen n-grams
genuinely back off.

The backoff scheme is Stupid Backoff (Brants et al., EMNLP 2007 §4
— the scheme built FOR distributed MapReduce-style LM serving):

    S(w | w-2 w-1) = c(w-2 w-1 w) / c(w-2 w-1)      if c(trigram) > 0
                   = alpha * c(w-1 w) / c(w-1)       elif c(bigram) > 0
                   = alpha^2 * c(w) / N              elif c(w) > 0
                   = alpha^2 * 1 / N                 else (OOV floor)

with alpha = 0.4. Because a present n-gram implies its context prefix
is present, no division can hit zero.

Cross-engine FP parity uses the unigram_rarity trade: instead of mean
log-probability (libm ln() differs in the last ulp between engines),
each token reports its RECIPROCAL score in exact integer micro-units —
1/alpha = 5/2, so every rung is a pure rational:

    k=0: (c(ctx)   * 1e6)      DIV  c(tri)
    k=1: (c(w-1)   * 1e6 * 5)  DIV (c(bi) * 2)
    k=2: (N        * 1e6 * 25) DIV (c(w)  * 4)
    OOV: (N        * 1e6 * 25) DIV  4

Integral division is bit-identical on any engine, and the mean of a
monotone transform ranks documents exactly like perplexity does for
filtering purposes. BIGINT bounds: micro <= 6.25e6 * N; the per-doc
sum adds n_tokens of those — exact within BIGINT up to ~N * n_doc ~
1e12-token reference corpora; at true 100 TB widen the sum to
DECIMAL(38,0) (still exact, statistic unchanged).

Scale shape (100 TB lens): scoring runs at (doc, distinct-trigram)
granularity — one scan builds per-doc trigram term frequencies, so a
document repeating a pattern probes the count tables once per
DISTINCT pattern. The three reference count tables are vocab-scale
aggregations of the reference slice only; joins key on the n-gram
string (Zipf-skewed up to one row per doc-distinct-pattern, absorbed
by AQE skew handling), and the 1-row total broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.text import _bind, tokenize

ALPHA_NUM, ALPHA_DEN = 2, 5  # alpha = 0.4 = ALPHA_NUM / ALPHA_DEN
MICRO = 1_000_000


def _ngram_strings(toks: F.Column, n: int) -> F.Column:
    """array<string> of space-joined n-grams (empty below n tokens).

    ``toks`` is let-bound (text._bind) before the per-gram transform:
    a bare tokenize() chain referenced inside the lambda re-tokenizes
    the document once PER GRAM — O(n²) row work (measured 30.9 s →
    the binding restores the O(n) single evaluation)."""
    return _bind(
        toks,
        lambda ts: F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def reference_ngram_counts(
    ref_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(trigram, bigram, unigram) count tables over the reference
    slice — the trained model. Each is a vocab-scale aggregation; the
    unigram table carries the corpus total via a windowless rollup at
    the caller (sum of cnt1)."""
    toks = tokenize(text_col)
    tri = (
        ref_docs.select(F.explode(_ngram_strings(toks, 3)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    bi = (
        ref_docs.select(F.explode(_ngram_strings(toks, 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    uni = (
        ref_docs.select(F.explode(toks).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    return tri, bi, uni


def backoff_lm_rarity(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document of ``docs`` under a trigram Stupid-Backoff
    LM trained on ``ref_docs``.

    Returns one row per document with at least one scoreable position
    (>= 3 tokens): ``(doc_id, n_scored, mean_rarity, backoff_frac,
    oov_frac)`` where ``n_scored`` counts trigram positions,
    ``mean_rarity`` is the mean reciprocal token score in micro-units
    / 1e6 (higher = more surprising under the reference model — the
    perplexity-filter signal), ``backoff_frac`` the fraction of
    positions that left the trigram rung, and ``oov_frac`` the
    fraction that fell through to the OOV floor. Documents under 3
    tokens have no defined trigram score and are absent, matching the
    oracle."""
    tri, bi, uni = reference_ngram_counts(ref_docs, text_col)
    # coalesce: sum over an EMPTY reference slice is NULL, which would
    # poison every OOV-floor micro value; 0 keeps the degenerate case
    # well-defined (micro 0 — everything equally "unscored")
    n_total = uni.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).cast("bigint").alias("n_total")
    )

    # let-bind the token array (text._bind): referencing the bare
    # tokenize() chain inside the per-position lambda re-tokenizes the
    # document once per trigram position AND per struct field — O(n²)
    # row work (measured: 30.9 s at sf0.1; bound: the one-pass cost)
    positions = _bind(
        tokenize(text_col),
        lambda ts: F.when(
            F.size(ts) >= 3,
            F.transform(
                F.sequence(F.lit(3), F.size(ts)),
                lambda i: F.struct(
                    F.concat_ws(" ", F.slice(ts, i - 2, 3)).alias("tri"),
                    F.concat_ws(" ", F.slice(ts, i - 2, 2)).alias("bctx"),
                    F.concat_ws(" ", F.slice(ts, i - 1, 2)).alias("bi"),
                    F.element_at(ts, i - 1).alias("uctx"),
                    F.element_at(ts, i).alias("uni"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<tri:string,bctx:string,bi:string,"
                "uctx:string,uni:string>>"
            )
        ),
    )
    pos = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(positions).alias("p"),
        )
        .groupBy(
            "id",
            F.col("p.tri").alias("tri"),
            F.col("p.bctx").alias("bctx"),
            F.col("p.bi").alias("bi"),
            F.col("p.uctx").alias("uctx"),
            F.col("p.uni").alias("uni"),
        )
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    scored = (
        pos.join(tri.withColumnRenamed("g", "tri"), "tri", "left")
        .join(
            bi.select(F.col("g").alias("bctx"), F.col("c2").alias("c2ctx")),
            "bctx",
            "left",
        )
        .join(bi.withColumnRenamed("g", "bi"), "bi", "left")
        .join(
            uni.select(F.col("g").alias("uctx"), F.col("c1").alias("c1ctx")),
            "uctx",
            "left",
        )
        .join(uni.withColumnRenamed("g", "uni"), "uni", "left")
        .crossJoin(F.broadcast(n_total))
    )
    micro = (
        F.when(
            F.col("c3").isNotNull(),
            F.expr(f"(c2ctx * CAST({MICRO} AS BIGINT)) DIV c3"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.expr(
                f"(c1ctx * CAST({MICRO} AS BIGINT) * 5) DIV (c2 * 2)"
            ),
        )
        .when(
            F.col("c1").isNotNull(),
            F.expr(
                f"(n_total * CAST({MICRO} AS BIGINT) * 25) DIV (c1 * 4)"
            ),
        )
        .otherwise(
            F.expr(f"(n_total * CAST({MICRO} AS BIGINT) * 25) DIV 4")
        )
    )
    return (
        scored.select(
            "id",
            "tf",
            micro.alias("micro"),
            F.col("c3").isNull().cast("long").alias("is_backoff"),
            (F.col("c3").isNull() & F.col("c2").isNull() & F.col("c1").isNull())
            .cast("long")
            .alias("is_oov"),
        )
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_scored"),
            (
                F.sum(F.col("tf") * F.col("micro")).cast("double")
                / (F.sum("tf").cast("double") * F.lit(float(MICRO)))
            ).alias("mean_rarity"),
            (
                F.sum(F.col("tf") * F.col("is_backoff")).cast("double")
                / F.sum("tf").cast("double")
            ).alias("backoff_frac"),
            (
                F.sum(F.col("tf") * F.col("is_oov")).cast("double")
                / F.sum("tf").cast("double")
            ).alias("oov_frac"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_scored",
            "mean_rarity",
            "backoff_frac",
            "oov_frac",
        )
    )
