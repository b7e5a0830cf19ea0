"""Config-driven curation pipeline (pipeline/curation.py): the
reference's validated-YAML-drives-the-engine architecture applied to
the LLM-corpus surface."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_global_mobility_spark.config import ConfigError
from etl_global_mobility_spark.pipeline.curation import (
    build_curation_pipeline,
    run_curation,
)

SF = "/root/testdata/sf0.001"


def test_declared_stages_equal_hand_composition(spark):
    """The config-declared pipeline must equal the identical chain
    composed by hand from the operators (no adapter drift)."""
    from etl_global_mobility_spark.operators.dedup import exact_dedup
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )
    from etl_global_mobility_spark.operators.splits import temperature_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    declared = build_curation_pipeline(
        docs,
        [
            {"op": "quality_classifier", "keep": True},
            {"op": "exact_dedup"},
            {"op": "temperature_mix", "temperature": 0.5},
        ],
    )
    hand = temperature_mix(
        exact_dedup(
            quality_classifier(docs)
            .filter(F.col("clf_keep"))
            .drop("quality_logit", "clf_keep")
        ).drop("content_hash", "n_copies"),
        temperature=0.5,
    )
    got = {r.doc_id for r in declared.select("doc_id").collect()}
    want = {r.doc_id for r in hand.select("doc_id").collect()}
    assert got == want and got


def test_unknown_op_and_bad_params_fail_at_declaration(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ConfigError, match="unknown op"):
        build_curation_pipeline(docs, [{"op": "dedupe_exactly"}])
    with pytest.raises(ConfigError, match="bad parameters"):
        build_curation_pipeline(docs, [{"op": "exact_dedup", "idcol": "x"}])
    with pytest.raises(ConfigError, match="non-empty"):
        build_curation_pipeline(docs, [])
    with pytest.raises(ConfigError, match="'op'"):
        build_curation_pipeline(docs, [{"operation": "exact_dedup"}])


def test_run_curation_from_yaml_writes_shards(spark, tmp_path):
    """End-to-end from a YAML file: input -> declared stages -> shard
    export with manifest; pii redaction verified in the shipped text."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    # plant a PII string so the redaction stage is observable
    docs = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" contact bob@example.com now"))
    )
    inp = str(tmp_path / "docs_in")
    docs.write.parquet(inp)
    out_dir = str(tmp_path / "shards")
    cfg = tmp_path / "curation.yaml"
    cfg.write_text(
        f"""input:
  path: '{inp}'
stages:
  - op: 'quality_classifier'
    keep: true
  - op: 'pii_redact'
  - op: 'exact_dedup'
output:
  path: '{out_dir}'
  rows_per_shard: 50
  token_col: 'n_tokens'
"""
    )
    manifest = run_curation(spark, str(cfg))
    assert manifest["n_rows"] > 0
    assert manifest["total_tokens"] > 0
    assert all(e["rows"] <= 50 for e in manifest["shards"].values())
    back = spark.read.parquet(out_dir)
    assert back.count() == manifest["n_rows"]
    assert back.filter(F.col("text").contains("bob@example.com")).count() == 0
    assert back.filter(F.col("text").contains("[EMAIL]")).count() > 0 or \
        back.filter(F.col("text").rlike("EMAIL|REDACT")).count() > 0
    assert os.path.exists(os.path.join(out_dir, "_manifest.json"))
    on_disk = json.load(open(os.path.join(out_dir, "_manifest.json")))
    assert on_disk["n_rows"] == manifest["n_rows"]


def test_run_curation_validates_sections(spark, tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("input:\n  path: '/nope'\nstages:\n  - op: 'exact_dedup'\n")
    with pytest.raises(ConfigError, match="missing section: output"):
        run_curation(spark, str(cfg))


def test_new_stages_compose_and_preserve_schema(spark):
    """normalize_text / dsir_resample / neardup_dedup stages must keep
    the document schema (so any stage order composes), subset rows
    monotonically where they filter, and equal the hand-built chain."""
    from etl_global_mobility_spark.operators.dedup import (
        dedup_components,
        minhash_near_duplicates,
    )
    from etl_global_mobility_spark.operators.signals import (
        dsir_importance_resample,
    )
    from etl_global_mobility_spark.operators.text import normalize_text

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    declared = build_curation_pipeline(
        docs,
        [
            {"op": "normalize_text"},
            {"op": "dsir_resample", "target_col": "lang",
             "target_value": "en", "n_buckets": 512},
            {"op": "neardup_dedup"},
        ],
    )
    assert declared.columns == docs.columns
    got = sorted(r["doc_id"] for r in declared.select("doc_id").collect())

    norm = (
        normalize_text(docs)
        .withColumn("text", F.col("norm_text"))
        .drop("norm_text")
    )
    kept = dsir_importance_resample(
        norm, F.col("lang") == "en", n_buckets=512
    ).select("doc_id")
    sampled = norm.join(kept, "doc_id", "left_semi")
    pairs = minhash_near_duplicates(sampled)
    losers = dedup_components(pairs).filter(
        F.col("id") != F.col("component")
    ).select(F.col("id").alias("doc_id"))
    hand = sampled.join(losers, "doc_id", "left_anti")
    want = sorted(r["doc_id"] for r in hand.select("doc_id").collect())
    assert got == want and 0 < len(got) <= docs.count()
