"""Image-text alignment gating — the CLIP-score curation filter.

LAION-5B (Schuhmann et al. 2022, arXiv:2210.08402) built its corpus by
scoring every (image, caption) candidate pair with CLIP cosine
similarity and keeping pairs above a threshold (0.28 for English); the
same gate — score, threshold, report the score distribution — is the
standard multimodal-curation step between "we have crawled pairs" and
"we can train on them". This module implements that gate over
pre-paired embedding columns (``array<float>`` image embedding +
``array<float>`` text embedding in ONE row), which is how the pairs
exist at curation time: the (expensive, GPU-side) encoder ran upstream;
the engine's job is the corpus-scale filter.

Scale shape: scoring is a pure per-row expression — ``zip_with`` +
``aggregate`` double cosine (the proven portable dot product from
:mod:`operators.similarity`), ZERO shuffles, fully codegen, so the gate
streams over 100 TB of pairs at scan speed. The report adds exactly one
bounded aggregation (``n_bins + 1`` keys). Nothing here needs the
image bytes, so the gate runs without any image library (the decode
stub in :mod:`operators.multimodal` stays env-attested).

Reference: the reference notebook has no multimodal surface
(notebooks/ETL_Entregas_Base.ipynb is delivery-record ETL); this
implements BASELINE.json's "multimodal columns" north star as a
curation component.

Degenerate pairs (zero-norm or NULL embedding on either side) score
NaN/NULL; the gate DROPS them explicitly (``isnan`` guard — in both
Spark and DuckDB a bare ``NaN >= t`` comparison is TRUE under their
shared NaN-sorts-last semantics, which would wave every broken pair
through the filter) and the report counts them in a separate
``degenerate`` row rather than a score bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.similarity import dot, l2_norm

#: LAION-English's CLIP-score keep threshold; callers pass their own
#: per-encoder value (the right threshold is encoder-specific).
DEFAULT_THRESHOLD = 0.28


def _safe_cosine(a: F.Column, b: F.Column) -> F.Column:
    """cosine with the ANSI /0 guard (the similarity.py pattern):
    zero-norm pairs score NaN — exactly what DuckDB's 0/0 produces —
    instead of killing a 100 TB scan with DIVIDE_BY_ZERO; NULL sides
    score NULL. For every real pair it is the SAME IEEE division."""
    nrm_prod = l2_norm(a) * l2_norm(b)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(nrm_prod > 0, dot(a, b) / nrm_prod)
        .otherwise(F.lit(float("nan")))
    )


def alignment_scores(
    pairs: DataFrame,
    img_col: str = "image_embedding",
    txt_col: str = "text_embedding",
    score_col: str = "alignment",
) -> DataFrame:
    """Per-pair cosine alignment score (the CLIP score): one new
    double column, NaN when either side is zero-norm, NULL when either
    side is NULL. Pure map-side expression — zero shuffles."""
    return pairs.withColumn(
        score_col, _safe_cosine(F.col(img_col), F.col(txt_col))
    )


def _is_aligned(score: F.Column, threshold: float) -> F.Column:
    """Three-valued kept flag: true/false for real scores, false for
    NaN (explicitly — NaN compares GREATER than every double in both
    engines, so ``score >= t`` alone would keep broken pairs), NULL
    for NULL scores."""
    return F.when(F.isnan(score), F.lit(False)).otherwise(score >= threshold)


def alignment_gate(
    pairs: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    img_col: str = "image_embedding",
    txt_col: str = "text_embedding",
    score_col: str = "alignment",
) -> DataFrame:
    """Keep only pairs whose alignment score clears ``threshold``
    (strictly: ``score >= threshold`` with NaN/NULL dropped). Returns
    the surviving rows with the score column attached — still a pure
    map-side plan (scan → project → filter), no shuffle anywhere."""
    scored = alignment_scores(pairs, img_col, txt_col, score_col)
    return scored.filter(
        F.coalesce(_is_aligned(F.col(score_col), threshold), F.lit(False))
    )


def alignment_report(
    pairs: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    n_bins: int = 20,
    img_col: str = "image_embedding",
    txt_col: str = "text_embedding",
) -> DataFrame:
    """Score-distribution report for threshold tuning: one row per
    occupied histogram bin over [-1, 1] (fixed-width — engine-portable
    integer arithmetic, no percentile estimation) plus one
    ``degenerate`` row for NaN/NULL scores, each with its pair count
    and the fraction of the corpus it holds; ``n_kept`` marks whether
    the bin survives ``threshold``.

    Output is bounded (≤ ``n_bins`` + 1 rows) and the plan is one
    map pass + one hash aggregation on a bounded key + one broadcast
    1-row total — the audit you run BEFORE committing to a threshold
    on a 100 TB pair corpus.
    """
    score = _safe_cosine(F.col(img_col), F.col(txt_col))
    # clamp BOTH edges into the boundary bins: exact cos==1.0 lands on
    # the top edge, and sqrt rounding can put a perfectly
    # anti-aligned pair a ulp BELOW -1 (dot/(sqrt(s)·sqrt(s)) is not
    # exactly -1), which would otherwise mint a phantom bin "-1"
    bin_idx = F.least(
        F.greatest(
            F.floor(
                (score + F.lit(1.0)) / F.lit(2.0) * F.lit(n_bins)
            ).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    binned = pairs.select(
        F.when(score.isNull() | F.isnan(score), F.lit(None).cast("int"))
        .otherwise(bin_idx)
        .alias("bin"),
        _is_aligned(score, threshold).alias("_kept"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0)).alias("n_kept"),
    )
    total = per_bin.agg(F.sum("n_pairs").alias("_total"))
    return (
        per_bin.crossJoin(F.broadcast(total))  # 1-row total frame
        .select(
            F.coalesce(F.col("bin").cast("string"), F.lit("degenerate")).alias(
                "bucket"
            ),
            # integer-exact numerator, ONE double division — a
            # bin*width float product diverges cross-engine (DuckDB
            # parses 0.1 as DECIMAL; Spark as double)
            F.when(
                F.col("bin").isNotNull(),
                (F.col("bin") * 2 - F.lit(n_bins)) / F.lit(n_bins),
            ).alias("score_lo"),
            "n_pairs",
            "n_kept",
            (F.col("n_pairs").cast("double") / F.col("_total")).alias("share"),
        )
        .orderBy(F.col("score_lo").asc_nulls_last())
    )
