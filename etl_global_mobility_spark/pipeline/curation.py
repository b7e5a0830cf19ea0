"""Config-driven curation pipeline — the reference's architecture,
generalized to the LLM-corpus surface.

The reference's defining design is "a validated YAML config drives a
fixed engine" (config sections → per-country ETL runs,
notebooks/ETL_Entregas_Base.ipynb:150-232, 708-721; see config.py for
the parity loader). This module applies the same shape to document
curation: a declared STAGE LIST in YAML composes the engine's curation
operators into one pipeline —

.. code-block:: yaml

    input:  {path: /data/documents}
    stages:
      - {op: quality_classifier, keep: true}
      - {op: exact_dedup}
      - {op: pii_redact}
      - {op: temperature_mix, temperature: 0.5}
      - {op: hash_split}
    output: {path: /data/shards, rows_per_shard: 100000,
             token_col: n_tokens}

Stages are CONFIGURATION, not code: misspelled ops or parameters fail
at load time with a ConfigError naming the valid choices (the
reference's startup-validation discipline). Composition stays lazy —
the map-only stages (classifier, redaction, mixing filters) fuse into
single Catalyst stages exactly as if hand-written; only the operators
that inherently shuffle (dedup, caps) break the chain. At 100 TB the
config is the knob an operator of the pipeline turns; the plan shape
is owned by the engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_global_mobility_spark.config import ConfigError, load_yaml


def _stage_filter_rules(df: DataFrame, keep: bool = True, **thresholds):
    from etl_global_mobility_spark.operators.quality_rules import filter_rules

    out = filter_rules(df, **thresholds)
    if keep:
        added = [c for c in out.columns if c not in df.columns]
        out = out.filter(F.col("keep")).drop(*added)
    return out


def _stage_quality_classifier(
    df: DataFrame, keep: bool = True, weights: dict | None = None
):
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )

    out = quality_classifier(df, weights=weights)
    if keep:
        out = out.filter(F.col("clf_keep")).drop("quality_logit", "clf_keep")
    return out


def _stage_exact_dedup(df: DataFrame, id_col: str = "doc_id"):
    from etl_global_mobility_spark.operators.dedup import exact_dedup

    return exact_dedup(df, id_col=id_col).drop("content_hash", "n_copies")


def _stage_pii_redact(df: DataFrame, text_col: str = "text"):
    from etl_global_mobility_spark.operators.text import redact_pii

    return df.withColumn(text_col, redact_pii(text_col))


def _stage_strip_boilerplate(
    df: DataFrame,
    seg_len: int = 16,
    df_max: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    from etl_global_mobility_spark.operators.dedup import strip_boilerplate

    cleaned = strip_boilerplate(
        df, seg_len=seg_len, df_max=df_max, id_col=id_col, text_col=text_col
    ).select(id_col, "clean_text")
    return (
        df.join(cleaned, id_col)
        .withColumn(text_col, F.col("clean_text"))
        .drop("clean_text")
    )


def _stage_temperature_mix(df: DataFrame, temperature: float = 0.5, **kw):
    from etl_global_mobility_spark.operators.splits import temperature_mix

    return temperature_mix(df, temperature=temperature, **kw)


def _stage_mix_sources(df: DataFrame, weights: dict, **kw):
    from etl_global_mobility_spark.operators.splits import mix_sources

    return mix_sources(df, weights=weights, **kw)


def _stage_stratified_sample(df: DataFrame, strata_col: str, rates: dict, **kw):
    from etl_global_mobility_spark.operators.splits import (
        stratified_hash_sample,
    )

    return stratified_hash_sample(df, strata_col=strata_col, rates=rates, **kw)


def _stage_cap_per_stratum(df: DataFrame, strata_col: str, max_rows: int, **kw):
    from etl_global_mobility_spark.operators.splits import cap_per_stratum

    return cap_per_stratum(df, strata_col=strata_col, max_rows=max_rows, **kw)


def _stage_hash_split(df: DataFrame, **kw):
    from etl_global_mobility_spark.operators.splits import hash_split

    return hash_split(df, **kw)


def _stage_normalize_text(df: DataFrame, text_col: str = "text"):
    from etl_global_mobility_spark.operators.text import normalize_text

    return (
        normalize_text(df, text_col=text_col)
        .withColumn(text_col, F.col("norm_text"))
        .drop("norm_text")
    )


def _stage_dsir_resample(
    df: DataFrame,
    target_col: str,
    target_value,
    n_buckets: int = 4096,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    from etl_global_mobility_spark.operators.signals import (
        dsir_importance_resample,
    )

    kept = dsir_importance_resample(
        df,
        F.col(target_col) == F.lit(target_value),
        n_buckets=n_buckets,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
    ).select(id_col)
    # left-semi keeps the document schema untouched; kept is already
    # distinct by construction (one row per surviving doc)
    return df.join(kept, id_col, "left_semi")


def _stage_neardup_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw
):
    from etl_global_mobility_spark.operators.dedup import (
        dedup_components,
        minhash_near_duplicates,
    )

    pairs = minhash_near_duplicates(df, text_col=text_col, id_col=id_col, **kw)
    comp = dedup_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


CURATION_STAGES: dict[str, Callable[..., DataFrame]] = {
    "filter_rules": _stage_filter_rules,
    "quality_classifier": _stage_quality_classifier,
    "exact_dedup": _stage_exact_dedup,
    "pii_redact": _stage_pii_redact,
    "strip_boilerplate": _stage_strip_boilerplate,
    "temperature_mix": _stage_temperature_mix,
    "mix_sources": _stage_mix_sources,
    "stratified_sample": _stage_stratified_sample,
    "cap_per_stratum": _stage_cap_per_stratum,
    "hash_split": _stage_hash_split,
    "normalize_text": _stage_normalize_text,
    "dsir_resample": _stage_dsir_resample,
    "neardup_dedup": _stage_neardup_dedup,
}


def build_curation_pipeline(
    docs: DataFrame, stages: list[dict]
) -> DataFrame:
    """Fold the declared stage list over the document frame.

    Each entry is ``{op: <name>, **params}``; unknown ops and unknown
    parameters fail here — at plan-declaration time, before any
    cluster time is spent — with the valid choices in the message.
    """
    if not isinstance(stages, list) or not stages:
        raise ConfigError("stages must be a non-empty list")
    df = docs
    for i, spec in enumerate(stages):
        if not isinstance(spec, dict) or "op" not in spec:
            raise ConfigError(f"stage {i}: each stage needs an 'op' key")
        params = {k: v for k, v in spec.items() if k != "op"}
        op = spec["op"]
        fn = CURATION_STAGES.get(op)
        if fn is None:
            raise ConfigError(
                f"stage {i}: unknown op {op!r}; valid: "
                f"{sorted(CURATION_STAGES)}"
            )
        try:
            df = fn(df, **params)
        except TypeError as e:
            raise ConfigError(f"stage {i} ({op}): bad parameters: {e}") from e
    return df


def run_curation(spark: SparkSession, config_path: str) -> dict:
    """Load a curation YAML (input / stages / output sections), run the
    pipeline, export manifest'd training shards; returns the manifest.

    The output stage always attaches ``n_tokens`` when the manifest is
    token-aware and the pipeline didn't already produce it.
    """
    from etl_global_mobility_spark.operators.layout import (
        export_training_shards,
    )
    from etl_global_mobility_spark.operators.text import token_count

    cfg = load_yaml(config_path)
    for section in ("input", "stages", "output"):
        if section not in cfg:
            raise ConfigError(f"curation config missing section: {section}")
    if "path" not in cfg["input"] or "path" not in cfg["output"]:
        raise ConfigError("input/output sections need a 'path'")

    docs = spark.read.parquet(cfg["input"]["path"])
    curated = build_curation_pipeline(docs, cfg["stages"])

    out = cfg["output"]
    token_col = out.get("token_col")
    if token_col and token_col not in curated.columns:
        curated = curated.withColumn(token_col, token_count("text"))
    return export_training_shards(
        curated,
        out["path"],
        rows_per_shard=int(out.get("rows_per_shard", 100_000)),
        token_col=token_col,
    )
