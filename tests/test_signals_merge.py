"""Unit/property tests for the round-3 training-data operators:
repetition signals, contamination check, PII redaction, stratified
sampling, salient terms, and batch MERGE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.merge import upsert
from etl_global_mobility_spark.operators.signals import (
    contamination_check,
    repetition_signals,
)
from etl_global_mobility_spark.operators.splits import stratified_hash_sample
from etl_global_mobility_spark.operators.text import redact_pii, salient_terms


def test_repetition_signals_flags_repeated_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # pure repetition
            (2, "one two three four five six"),  # all distinct
            (3, "x"),  # 1 token → no 2-grams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(df, k=2).collect()}
    assert out[1].top_token_frac == 1.0
    assert out[1].dup_gram_frac == pytest.approx(0.8)  # 5 grams, 1 distinct
    assert out[1].top_gram_frac == 1.0
    assert out[2].top_token_frac == pytest.approx(1 / 6)
    assert out[2].dup_gram_frac == 0.0
    assert out[3].n_tokens == 1 and out[3].n_grams is None
    assert out[3].dup_gram_frac is None


def test_contamination_flags_only_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a sleepy cat"),  # heavy overlap
            (2, "completely unrelated words about spark engines"),
        ],
        "doc_id long, text string",
    )
    out = contamination_check(corpus, bench, k=3, threshold=0.3).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].bench_id == 100
    # doc 1: 7 distinct 3-gram shingles, 4 shared with the benchmark
    assert out[0].overlap_frac == pytest.approx(4 / 7)


def test_pii_redaction_scrubs_emails_and_phones(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at alice.smith+work@corp.example.org today"),
            (2, "call +44 123 4567 before noon"),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.red
        for r in df.select("doc_id", redact_pii("text").alias("red")).collect()
    }
    assert out[1] == "reach me at <EMAIL> today"
    assert out[2] == "call <PHONE> before noon"
    assert out[3] == "no pii here"


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    sampled = stratified_hash_sample(
        df, "lang", rates={"en": 0.5}, default_rate=0.05
    )
    counts = {
        r.lang: r.n
        for r in sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["en"] == pytest.approx(1000, rel=0.15)
    assert counts["zh"] == pytest.approx(100, rel=0.5)
    # determinism across partition layouts
    a = {r.doc_id for r in sampled.collect()}
    b = {
        r.doc_id
        for r in stratified_hash_sample(
            df.repartition(13), "lang", rates={"en": 0.5}, default_rate=0.05
        ).collect()
    }
    assert a == b


def test_stratified_sample_rejects_bad_rate(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="rate out of"):
        stratified_hash_sample(df, "lang", rates={"en": 1.5})


def test_salient_terms_surfaces_group_specific_terms(spark):
    # 'commun' appears everywhere (high df → low score); each group has
    # its own marker term appearing twice in-group only.
    rows = [
        (1, "a", "commun alpha alpha"),
        (2, "a", "commun filler"),
        (3, "b", "commun beta beta"),
        (4, "b", "commun filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = salient_terms(df, group_col="lang", top_k=1).collect()
    best = {r.lang: r.term for r in out}
    assert best == {"a": "alpha", "b": "beta"}


def test_upsert_replaces_matched_inserts_new_keeps_rest(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    got = {(r.k, r.v, r.x) for r in upsert(target, source, ["k"]).collect()}
    assert got == {(1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)}


def test_shingles_tolerate_docs_shorter_than_k(spark):
    """Regression: sequence(1, 0) is descending in Spark, so sub-k docs
    used to crash slice() with start=0 in every shingle-based operator."""
    from etl_global_mobility_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "one two three four one two three four")],
        "doc_id long, text string",
    )
    assert ngram_jaccard_pairs(df, k=3, threshold=0.1).count() == 0
    sig = repetition_signals(df, k=3).collect()
    assert {r.doc_id for r in sig} == {1, 3}  # empty doc: no tokens at all


def test_ensure_compute_parallelism_guard(spark):
    """Fans a 1-partition input out to defaultParallelism; no-op when
    the input is already at least that wide (the 100 TB state) or when
    disabled with None."""
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_compute_parallelism,
    )

    one = spark.range(100).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    assert ensure_compute_parallelism(one).rdd.getNumPartitions() == target
    assert ensure_compute_parallelism(one, None).rdd.getNumPartitions() == 1
    wide = spark.range(100).repartition(target + 4)
    assert ensure_compute_parallelism(wide).rdd.getNumPartitions() == target + 4
    # results are unchanged, only layout
    assert sorted(
        r.id for r in ensure_compute_parallelism(one).collect()
    ) == list(range(100))


def test_upsert_validates_keys(spark):
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    source = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="missing"):
        upsert(target, source, ["nope"])


def test_incremental_agg_update_semantics(spark):
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.merge import incremental_agg_update

    base = spark.createDataFrame(
        [(1, 10, 2), (2, 5, 1)], "k long, s long, n long"
    )
    delta = spark.createDataFrame(
        [(2, 7), (3, 4), (3, 6)], "k long, s long"
    )
    out = {
        r.k: (r.s, r.n)
        for r in incremental_agg_update(
            base, delta, keys=["k"], sums=["s"], counts=["n"]
        ).collect()
    }
    assert out[1] == (10, 2)  # untouched key carried through
    assert out[2] == (12, 2)  # 5+7, 1+1
    assert out[3] == (10, 2)  # new key inserted from delta alone


def test_incremental_agg_update_validates(spark):
    from etl_global_mobility_spark.operators.merge import incremental_agg_update

    df = spark.createDataFrame([(1, 2)], "k long, s long")
    with pytest.raises(ValueError):
        incremental_agg_update(df, df, keys=["k"])


def test_scd2_version_lifecycle(spark):
    """Changed keys close + reopen; identical changes are no-ops;
    new keys insert; closed history passes through untouched."""
    from etl_global_mobility_spark.operators.merge import scd2_apply
    from pyspark.sql import functions as F

    current = spark.createDataFrame(
        [
            # closed history for key 1
            (1, "alpha", "2018-01-01", "2020-01-01"),
            # open versions
            (1, "beta", "2020-01-01", None),
            (2, "gamma", "2020-01-01", None),
            (3, "delta", "2020-01-01", None),
        ],
        "k long, attr string, valid_from string, valid_to string",
    ).select(
        "k",
        "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    changes = spark.createDataFrame(
        [
            (1, "beta2"),  # changed -> close + new version
            (2, "gamma"),  # identical -> no-op
            (9, "new"),  # brand-new key
        ],
        "k long, attr string",
    )
    out = scd2_apply(current, changes, "k", ["attr"], "2024-06-01")
    rows = {(r["k"], r["attr"], str(r["valid_from"]), str(r["valid_to"])) for r in out.collect()}
    assert rows == {
        (1, "alpha", "2018-01-01 00:00:00", "2020-01-01 00:00:00"),
        (1, "beta", "2020-01-01 00:00:00", "2024-06-01 00:00:00"),
        (1, "beta2", "2024-06-01 00:00:00", "None"),
        (2, "gamma", "2020-01-01 00:00:00", "None"),
        (3, "delta", "2020-01-01 00:00:00", "None"),
        (9, "new", "2024-06-01 00:00:00", "None"),
    }


def test_snapshot_diff_roundtrip(spark):
    """Algebraic consistency: upsert(old, diff-upserts) minus
    diff-deletes == new. Unchanged rows emit no change row."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.merge import (
        snapshot_diff,
        upsert,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e")], "k long, v string"
    )  # 2 updated, 3+4 deleted, 5 inserted, 1 unchanged
    diff = snapshot_diff(old, new, keys=["k"])
    ops = {(r["op"], r["k"]) for r in diff.collect()}
    assert ops == {
        ("update", 2),
        ("delete", 3),
        ("delete", 4),
        ("insert", 5),
    }

    applied = upsert(
        old, diff.filter(F.col("op") != "delete").drop("op"), keys=["k"]
    ).join(
        diff.filter(F.col("op") == "delete").select("k"), "k", "left_anti"
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_snapshot_diff_null_keys_participate(spark):
    """eqNullSafe keys + presence markers: NULL-key rows diff like any
    other key value. Before the fix a NULL-key row in either snapshot
    produced no insert/update/delete row at all."""
    from etl_global_mobility_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (None, "x")], "k long, v string")
    new = spark.createDataFrame([(1, "a"), (None, "y")], "k long, v string")
    ops = {
        (r["op"], r["k"], r["v"])
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    assert ops == {("update", None, "y")}

    # NULL-key row deleted / inserted
    gone = snapshot_diff(old, spark.createDataFrame([(1, "a")], "k long, v string"), ["k"])
    assert {(r["op"], r["k"], r["v"]) for r in gone.collect()} == {
        ("delete", None, "x")
    }


def test_scd2_null_key_versions_survive(spark):
    """A NULL-key open version must not vanish from the dimension when
    a changeset arrives (and a NULL-key change row must match it)."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.merge import scd2_apply

    current = spark.createDataFrame(
        [(None, "nk", "2020-01-01", None), (1, "one", "2020-01-01", None)],
        "k long, attr string, valid_from string, valid_to string",
    ).select(
        "k",
        "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    changes = spark.createDataFrame([(None, "nk2")], "k long, attr string")
    out = scd2_apply(current, changes, "k", ["attr"], "2024-06-01")
    rows = {
        (r["k"], r["attr"], str(r["valid_to"])) for r in out.collect()
    }
    assert rows == {
        (None, "nk", "2024-06-01 00:00:00"),  # closed, not dropped
        (None, "nk2", "None"),  # new open version
        (1, "one", "None"),  # untouched (no change row)
    }
