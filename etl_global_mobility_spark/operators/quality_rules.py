"""Rule-based document filtering for LLM training corpora.

The reference implements a 6-rule row-level quality engine that tags
each record with named rule outcomes, joins the failed-rule names into
a pipe-separated reason column, and splits clean rows from quarantined
ones (NB:561-678; the ``motivo_obs`` pattern NB:632).  This module is
the same contract applied to a *document* corpus, with rules drawn
from the published web-corpus filtering heuristics (Gopher, Rae et
al. 2021, appendix A1.1; C4, Raffel et al. 2019 §2.2): length bands,
mean word length, symbol/digit density, stopword presence, and
word-level repetition.

Scale design: every rule is a closed-form JVM expression over the
document text — one codegen stage, zero shuffles, zero Python.  At
100 TB this runs as a map-only pass fused into the scan; the
keep/quarantine split downstream is a predicate, not a repartition.

All expressions are restricted to constructs with exact DuckDB
equivalents (regexp character classes, array intersect/distinct,
IEEE double division) so the whole rule engine is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.text import tokenize

#: Minimal cross-language stopword probe (C4 uses an English list; the
#: point is "does the document contain *any* glue words at all").
STOPWORD_PROBE = ("the", "a", "of", "to", "and", "in")

#: rule name -> default threshold. Tuned on the synthetic driver corpus
#: so each data-dependent rule fires on a nontrivial fraction at
#: sf0.01; the structural rules (digits/symbols/max length) guard
#: regressions real web data would trip.
DEFAULTS = {
    "min_words": 20,  # Gopher: drop docs with < 50 words (scaled down)
    "max_words": 5000,  # Gopher: drop docs with > 100k words (scaled)
    "mean_word_len_lo": 3.0,  # Gopher: mean word length outside [3, 10]
    "mean_word_len_hi": 10.0,
    "max_digit_ratio": 0.20,  # C4-style numeric-noise cut
    "max_symbol_ratio": 0.10,  # Gopher: symbol-to-word ratio cut
    "min_distinct_ratio": 0.35,  # repetition: distinct/total words
}


def _ratio(num: Column, den: Column) -> Column:
    return num.cast("double") / F.greatest(den, F.lit(1)).cast("double")


def filter_rules(
    df: DataFrame,
    text_col: str = "text",
    **overrides: float,
) -> DataFrame:
    """Append per-rule boolean columns, a ``keep`` flag, and a
    pipe-joined ``reasons`` string (failed rule names, fixed order).

    Columns added: ``n_words``, ``mean_word_len``, ``distinct_ratio``,
    ``r_min_words``, ``r_max_words``, ``r_word_length``,
    ``r_digit_ratio``, ``r_symbol_ratio``, ``r_no_stopwords``,
    ``r_repetitive``, ``keep``, ``reasons``.
    """
    p = {**DEFAULTS, **overrides}
    text = F.col(text_col)
    toks = tokenize(text)
    n_words = F.size(toks)
    n_chars = F.length(text)
    # non-whitespace characters / words — mean word length without a
    # per-token loop (exactly sum(len(token))/count for whitespace
    # tokenization).
    non_ws = F.length(F.regexp_replace(text, r"\s", ""))
    mean_wl = _ratio(non_ws, n_words)
    digit_ratio = _ratio(F.length(F.regexp_replace(text, r"[^0-9]", "")), n_chars)
    symbol_ratio = _ratio(
        F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")), n_chars
    )
    distinct_ratio = _ratio(F.size(F.array_distinct(toks)), n_words)
    has_stopword = F.arrays_overlap(
        toks, F.array(*[F.lit(w) for w in STOPWORD_PROBE])
    )

    rules = [
        ("r_min_words", n_words < F.lit(p["min_words"])),
        ("r_max_words", n_words > F.lit(p["max_words"])),
        (
            "r_word_length",
            (mean_wl < F.lit(p["mean_word_len_lo"]))
            | (mean_wl > F.lit(p["mean_word_len_hi"])),
        ),
        ("r_digit_ratio", digit_ratio > F.lit(p["max_digit_ratio"])),
        ("r_symbol_ratio", symbol_ratio > F.lit(p["max_symbol_ratio"])),
        ("r_no_stopwords", ~has_stopword),
        ("r_repetitive", distinct_ratio < F.lit(p["min_distinct_ratio"])),
    ]

    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("distinct_ratio", distinct_ratio)
    )
    for name, cond in rules:
        out = out.withColumn(name, cond)
    keep = F.lit(True)
    for name, _ in rules:
        keep = keep & ~F.col(name)
    # NULL text makes every rule expression NULL, which would make
    # ``keep`` NULL — and a NULL keep passes neither filter(keep) nor
    # filter(~keep), silently dropping the row from BOTH halves of
    # split_quarantine. Conservative contract (same as expectations.py):
    # unevaluable rows quarantine.
    keep = F.coalesce(keep, F.lit(False))
    # concat_ws drops NULLs in Spark and DuckDB alike — the standard
    # trick for "join only the failed rule names, fixed rule order".
    reason_parts = [
        F.when(F.col(name), F.lit(name.removeprefix("r_"))) for name, _ in rules
    ]
    reasons = F.when(text.isNull(), F.lit("unevaluable")).otherwise(
        F.concat_ws("|", *reason_parts)
    )
    return out.withColumn("keep", keep).withColumn("reasons", reasons)


def split_quarantine(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Clean/quarantine split on :func:`filter_rules` — the reference's
    depurado/obs table pair (NB:647-678) for a document corpus.

    Partition contract: every input row lands in exactly one output
    (``keep`` is never NULL — NULL/unevaluable text quarantines)."""
    flagged = filter_rules(df, text_col)
    return flagged.filter(F.col("keep")), flagged.filter(~F.col("keep"))


#: Fixed "trained" weights for :func:`quality_classifier` — every value
#: is a small binary fraction so each product is a single exact-parity
#: IEEE op on any engine.
CLASSIFIER_WEIGHTS = {
    "bias": -2.5,
    "n_words_capped": 2.0,
    "mean_word_len": 0.25,
    "distinct_ratio": 1.5,
    "digit_ratio": -3.0,
    "symbol_ratio": -2.0,
    "has_stopword": 0.5,
}


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Linear quality-classifier INFERENCE as pure Catalyst
    expressions — the fastText/logreg-shaped curation stage (score
    every document with a trained model, keep above threshold), with
    the model small enough to inline as literals.

    ``quality_logit = bias + Σ wᵢ·fᵢ`` folded strictly left-to-right,
    features are single-division ratios — every step is one IEEE
    double op, so an independent engine reproduces the logit
    bit-for-bit (no sigmoid: monotone, so thresholding the logit at 0
    IS thresholding the probability at 0.5, without transcendental
    cross-engine drift). A real deployment swaps the literal weights
    for its trained ones (still driver-side literals: d+1 doubles —
    broadcast-free, map-only, stays in WholeStageCodegen).

    Adds ``quality_logit`` (NULL for NULL text) and ``clf_keep``
    (never NULL — unevaluable text drops, the conservative contract
    shared with :func:`filter_rules`).
    """
    unknown = set(weights or {}) - set(CLASSIFIER_WEIGHTS)
    if unknown:
        raise ValueError(
            f"unknown classifier weight keys: {sorted(unknown)}; "
            f"valid: {sorted(CLASSIFIER_WEIGHTS)}"
        )
    w = {**CLASSIFIER_WEIGHTS, **(weights or {})}
    score = F.lit(float(w["bias"]))
    for name, col in classifier_features(text_col):
        score = score + F.lit(float(w[name])) * col
    return df.withColumn("quality_logit", score).withColumn(
        "clf_keep", F.coalesce(score >= F.lit(0.0), F.lit(False))
    )


def classifier_features(text_col: str = "text") -> list[tuple[str, Column]]:
    """The classifier's feature expressions, shared verbatim by
    training and inference — the one place the feature definition
    lives, so a model trained here scores identically at inference."""
    text = F.col(text_col)
    toks = tokenize(text)
    n_words = F.size(toks)
    n_chars = F.length(text)
    non_ws = F.length(F.regexp_replace(text, r"\s", ""))
    return [
        (
            "n_words_capped",
            F.least(n_words, F.lit(256)).cast("double") / F.lit(256.0),
        ),
        ("mean_word_len", _ratio(non_ws, n_words)),
        ("distinct_ratio", _ratio(F.size(F.array_distinct(toks)), n_words)),
        (
            "digit_ratio",
            _ratio(F.length(F.regexp_replace(text, r"[^0-9]", "")), n_chars),
        ),
        (
            "symbol_ratio",
            _ratio(F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")), n_chars),
        ),
        (
            "has_stopword",
            F.arrays_overlap(
                toks, F.array(*[F.lit(s) for s in STOPWORD_PROBE])
            ).cast("double"),
        ),
    ]


#: A trained-weight SNAPSHOT in :data:`CLASSIFIER_WEIGHTS` key space:
#: the values a :func:`train_quality_classifier` run on the planted
#: test corpus produced, rounded to exact binary fractions so the
#: artifact round-trip below stays bit-exact across engines. The live
#: training loop is float-iterative (property-tested); this frozen
#: model is what the oracle-checked artifact path scores with.
TRAINED_SNAPSHOT_WEIGHTS = {
    "bias": -1.5,
    "n_words_capped": 1.75,
    "mean_word_len": 0.125,
    "distinct_ratio": 2.25,
    "digit_ratio": -2.75,
    "symbol_ratio": -1.25,
    "has_stopword": 0.75,
}


def save_classifier_weights(spark, weights: dict[str, float], path: str) -> None:
    """Persist trained classifier weights as parquet (+ JSON manifest)
    — the model artifact a curation pipeline trains once and every
    scoring job loads (same artifact pattern as save_bpe_merges /
    save_ann_artifacts). Parquet doubles round-trip bit-exactly, so a
    reloaded model scores identically to the in-memory one. The
    manifest routes through the Hadoop-FS wrapper (like the
    export_training_shards manifest) so on a remote path (s3://,
    hdfs://) it lands NEXT TO the parquet, not on the driver's local
    disk."""
    import json

    from etl_global_mobility_spark.sinks.writer import _fs

    unknown = set(weights) - set(CLASSIFIER_WEIGHTS)
    if unknown:
        raise ValueError(f"unknown classifier weight keys: {sorted(unknown)}")
    fs = _fs(spark, path)
    fs.mkdirs(path)
    base = path.rstrip("/")
    rows = [(k, float(v)) for k, v in sorted(weights.items())]
    # one slice from the start (parallelism.driver_rows_df): the
    # createDataFrame().coalesce(1) idiom slices a KB-sized row list
    # into defaultParallelism pickle partitions and the single write
    # task drains them sequentially, one python-worker round-trip each
    # — cost scales with CORES, not data (same fix as the r12 ANN
    # artifact writer)
    from etl_global_mobility_spark.operators.parallelism import (
        driver_rows_df,
    )

    driver_rows_df(spark, rows, "name string, weight double").write.mode(
        "overwrite"
    ).parquet(f"{base}/weights")
    fs.write_text(
        f"{base}/_clf_manifest.json",
        json.dumps({"n_weights": len(rows), "keys": [k for k, _ in rows]}),
    )


def load_classifier_weights(spark, path: str) -> dict[str, float]:
    """Load weights saved by :func:`save_classifier_weights`, validated
    against the manifest and the known key space — ready to pass
    straight into ``quality_classifier(df, weights=...)``. Reads the
    manifest through the Hadoop-FS wrapper so remote artifact paths
    (s3://, hdfs://) resolve to the artifact, not the driver disk."""
    import json

    from etl_global_mobility_spark.sinks.writer import _fs

    base = path.rstrip("/")
    manifest = json.loads(_fs(spark, path).read_text(f"{base}/_clf_manifest.json"))
    rows = spark.read.parquet(f"{base}/weights").collect()
    weights = {r.name: float(r.weight) for r in rows}
    if len(weights) != manifest["n_weights"] or sorted(weights) != sorted(
        manifest["keys"]
    ):
        raise ValueError(
            f"weight artifact at {path} disagrees with its manifest: "
            f"{sorted(weights)} vs {sorted(manifest['keys'])}"
        )
    unknown = set(weights) - set(CLASSIFIER_WEIGHTS)
    if unknown:
        raise ValueError(f"unknown classifier weight keys: {sorted(unknown)}")
    return weights


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> dict[str, float]:
    """Distributed TRAINING for :func:`quality_classifier` — the other
    half of the fastText/logreg curation loop: fit a logistic
    regression (Spark MLlib's distributed L-BFGS) on labeled documents
    over the EXACT inference feature expressions
    (:func:`classifier_features`), and return the learned weights in
    ``CLASSIFIER_WEIGHTS`` key space, ready to pass straight back into
    ``quality_classifier(df, weights=...)``.

    Scale shape: feature extraction is the same map-only codegen pass
    as inference; L-BFGS iterations each run one tree-aggregated
    gradient pass over the corpus (no per-row Python); the artifact
    that reaches the driver is d+1 doubles. Training is
    float-iterative, so (like BPE/k-means) it carries property tests
    rather than a SQL oracle — but the MODEL it produces feeds the
    bit-exact oracle-checked inference path.

    Rows with NULL text or NULL label are excluded (unevaluable either
    way); labels must be 0/1.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = classifier_features(text_col)
    names = [n for n, _ in feats]
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(F.array(*[c for _, c in feats])).alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(base)
    weights = {"bias": float(model.intercept)}
    for name, coef in zip(names, model.coefficients):
        weights[name] = float(coef)
    return weights
