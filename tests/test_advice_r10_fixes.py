"""Regression pins for the round-10 ADVICE items: total-order-safe
UDTF tie-breaks, observable degenerate-row exclusion (strict flag),
underflowed-zero-norm centroid handling, and the cross-process
kmeans-artifact publish."""

from __future__ import annotations

import datetime as dt
import math
import os

import pytest
from pyspark.sql import functions as F


def test_top_users_null_id_tie_ranks_instead_of_crashing(spark, tmp_path):
    """A NULL user_id tying on total with an integer user must rank
    (NULL after real ids), not TypeError out of the UDTF worker on
    None<int tuple comparison."""
    from etl_global_mobility_spark.corpus.udfs import q_udtf_table_arg

    base = dt.datetime(2024, 1, 1)
    rows = [
        # exact tie: user 7 and NULL both total 5.0 for "view"
        (0, base, 7, "view", 5.0, "{}"),
        (1, base, None, "view", 5.0, "{}"),
        (2, base, 3, "view", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf_dir, "events.parquet"))

    got = {
        (r.user_id, r.rk): r.total_millis
        for r in q_udtf_table_arg(spark, sf_dir).collect()
    }
    # integer id wins the tie (NULL sorts last), NULL holds rank 2
    assert got == {(7, 1): 5000, (None, 2): 5000}


@pytest.mark.slow
def test_pq_encode_strict_raises_default_drops(spark):
    from etl_global_mobility_spark.operators.similarity import (
        pq_encode,
        train_pq_codebook,
    )

    clean = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0, float(i % 3)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    book = train_pq_codebook(clean, dim=4, m=2, k=2, n_iters=1)
    hostile = clean.union(
        spark.createDataFrame(
            [(100, [float("nan"), 1.0, 2.0, 3.0]), (101, [1.0, 2.0])],
            "vec_id long, embedding array<double>",
        )
    )
    # default contract: silent exclusion, documented
    assert pq_encode(hostile, book).count() == 8
    # strict: loud failure naming the operator
    with pytest.raises(Exception, match="pq_encode.*strict=True"):
        pq_encode(hostile, book, strict=True).count()


@pytest.mark.slow
def test_ivf_topk_strict_raises_on_degenerate_query(spark):
    from etl_global_mobility_spark.operators.similarity import ivf_topk

    corpus = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [0.0, 0.0])],  # zero vector: cosine undefined
        "vec_id long, embedding array<double>",
    )
    ok = ivf_topk(corpus, queries, n_cells=2, nprobe=2, k=2)
    # default: the degenerate query silently drops out
    assert {r.q_id for r in ok.collect()} == {0}
    with pytest.raises(Exception, match="ivf_topk.*strict=True"):
        ivf_topk(corpus, queries, n_cells=2, nprobe=2, k=2, strict=True).count()


def test_centroid_scores_skips_underflowed_zero_norm(spark):
    """FINITE components whose squared sum underflows to 0.0 must skip
    that cell (like the trainer's degenerate-update rule), not raise;
    an all-underflowed centroid list still raises with the cause."""
    from etl_global_mobility_spark.operators.similarity import (
        _centroid_scores,
    )

    tiny = 5e-324  # denormal min: tiny*tiny underflows to exactly 0.0
    assert tiny * tiny == 0.0 and math.isfinite(tiny)
    cents = [(0, [1.0, 0.0]), (1, [tiny, tiny])]
    norms = [1.0, math.sqrt(sum(x * x for x in cents[1][1]))]
    assert norms[1] == 0.0
    df = spark.createDataFrame(
        [([1.0, 0.5], 1.25)], "embedding array<double>, nv double"
    )
    scores = df.select(
        _centroid_scores(cents, norms, "embedding", "nv").alias("s")
    ).collect()[0]["s"]
    assert len(scores) == 1  # cell 1 skipped, cell 0 scored
    assert scores[0]["neg_id"] == 0

    with pytest.raises(ValueError, match="underflowed zero norm"):
        df.select(
            _centroid_scores(
                [(0, [tiny, tiny])], [0.0], "embedding", "nv"
            )
        )
    # non-finite components still fail at build time
    with pytest.raises(ValueError, match="non-finite"):
        df.select(
            _centroid_scores(
                [(0, [float("nan"), 1.0])], [1.0], "embedding", "nv"
            )
        )


@pytest.mark.slow
def test_kmeans_artifact_publish_is_atomic_rename(spark, tmp_path, monkeypatch):
    """The train-once artifact must appear via one rename — no reader
    window onto a half-written directory — and losing the rename race
    must fall back to the in-memory centroids without error."""
    from etl_global_mobility_spark.corpus import llm
    from etl_global_mobility_spark.corpus import relational

    root = str(tmp_path / "rt")
    monkeypatch.setattr(
        relational, "_roundtrip_dir", lambda name: os.path.join(root, name)
    )
    llm._KMEANS_ARTIFACT_MEM.clear()
    sf_dir = "/root/testdata/sf0.001"
    cents = llm._kmeans_artifact_centroids(spark, sf_dir, k=2, iters=1)
    assert len(cents) == 2
    # exactly one published artifact dir, zero temp leftovers
    entries = os.listdir(root)
    assert len(entries) == 1 and ".tmp-" not in entries[0]

    # simulate LOSING the publish race: another process already put a
    # valid artifact at the path — our rename fails, temp is cleaned,
    # in-memory centroids are served
    llm._KMEANS_ARTIFACT_MEM.clear()
    from etl_global_mobility_spark.operators import similarity as sim

    real_rename = os.rename

    def racing_rename(src, dst):
        if ".tmp-" in src:
            raise OSError("simulated lost publish race")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", racing_rename)
    monkeypatch.setattr(
        sim,
        "load_kmeans_centroids",
        lambda *a, **k: (_ for _ in ()).throw(ValueError("cold cache")),
    )
    cents2 = llm._kmeans_artifact_centroids(spark, sf_dir, k=2, iters=1)
    assert cents2 == cents
    assert all(".tmp-" not in e for e in os.listdir(root))
