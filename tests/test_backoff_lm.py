"""Trigram Stupid-Backoff LM perplexity filter (operators/lm.py) —
hand-computed reference values on a corpus small enough to score by
hand, exercising every rung of the backoff ladder (trigram hit,
bigram backoff, unigram backoff, OOV floor) plus the sub-trigram
document exclusion contract.
"""

from __future__ import annotations

import pytest


REF = "the cat sat on the mat"
# reference model: N = 6; unigrams the:2 cat:1 sat:1 on:1 mat:1;
# every bigram and trigram of REF occurs once.


def _docs(spark):
    rows = [
        (1, REF, "wiki"),              # all 4 positions trigram hits
        (2, "the cat sat quickly", "web"),   # 1 hit + 1 OOV
        (3, "on the cat", "web"),      # bigram backoff ("the cat")
        (4, "mat mat the", "web"),     # unigram backoff ("the")
        (5, "hi yo", "web"),           # < 3 tokens: absent from output
        (6, None, "web"),              # NULL text: absent
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_backoff_ladder_hand_computed(spark):
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.lm import backoff_lm_rarity

    docs = _docs(spark)
    ref = docs.filter(F.col("source") == "wiki")
    got = {
        r.doc_id: r
        for r in backoff_lm_rarity(docs, ref).collect()
    }
    assert set(got) == {1, 2, 3, 4}

    # doc 1: four trigram hits, each micro = (c2ctx*1e6)//c3 = 1e6
    assert got[1].n_scored == 4
    assert got[1].mean_rarity == pytest.approx(1.0)
    assert got[1].backoff_frac == 0.0 and got[1].oov_frac == 0.0

    # doc 2: "the cat sat" hit (1e6); "cat sat quickly" OOV
    # (6*1e6*25)//4 = 37_500_000 -> mean (1e6+37.5e6)/(2*1e6)
    assert got[2].n_scored == 2
    assert got[2].mean_rarity == pytest.approx(19.25)
    assert got[2].backoff_frac == pytest.approx(0.5)
    assert got[2].oov_frac == pytest.approx(0.5)

    # doc 3: trigram "on the cat" unseen; bigram "the cat" seen ->
    # micro = (c1("the")=2 * 1e6 * 5) // (c2=1 * 2) = 5_000_000
    assert got[3].n_scored == 1
    assert got[3].mean_rarity == pytest.approx(5.0)
    assert got[3].backoff_frac == 1.0 and got[3].oov_frac == 0.0

    # doc 4: trigram+bigram unseen; unigram "the" seen ->
    # micro = (N=6 * 1e6 * 25) // (c1=2 * 4) = 18_750_000
    assert got[4].n_scored == 1
    assert got[4].mean_rarity == pytest.approx(18.75)
    assert got[4].backoff_frac == 1.0 and got[4].oov_frac == 0.0


def test_backoff_scoring_is_tf_weighted(spark):
    """A document repeating one trigram pattern scores it once per
    occurrence through a single count-table probe (the (doc,
    distinct-pattern) granularity claim)."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.lm import backoff_lm_rarity

    docs = _docs(spark).union(
        _docs(spark)
        .sparkSession.createDataFrame(
            [(7, "the cat sat the cat sat the cat sat", "web")],
            "doc_id long, text string, source string",
        )
    )
    ref = docs.filter(F.col("source") == "wiki")
    row = {
        r.doc_id: r for r in backoff_lm_rarity(docs, ref).collect()
    }[7]
    # 9 tokens -> 7 positions; "the cat sat" occurs 3 times (micro
    # 1e6); "cat sat the" / "sat the cat" each occur 2x and back off
    assert row.n_scored == 7
    assert 0.0 < row.backoff_frac < 1.0


def test_empty_reference_scores_everything_oov(spark):
    """An empty reference slice: every position takes the OOV floor
    with n_total = 0 -> micro = 0, mean_rarity 0, oov_frac 1 — a
    degenerate but well-defined (and empty-input-sweep-safe) result."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.lm import backoff_lm_rarity

    docs = _docs(spark)
    ref = docs.filter(F.lit(False))
    got = {r.doc_id: r for r in backoff_lm_rarity(docs, ref).collect()}
    assert set(got) == {1, 2, 3, 4}
    for r in got.values():
        assert r.oov_frac == 1.0
        assert r.mean_rarity == 0.0
