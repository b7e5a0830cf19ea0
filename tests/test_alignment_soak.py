"""Round-8 scale soaks: the alignment gate and bitext mining at 10-100x
the oracle-gate volume, with runtime budgets that fail if the plans
ever stop being (respectively) one map pass and one bounded fan-out."""

import time

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_alignment_gate_soak_structural_at_volume(spark):
    """500k synthetic pairs with ANALYTICALLY known outcomes: ids
    divisible by 4 pair a vector with itself (cos 1, kept), %4==1 with
    its negation (cos -1, dropped), %4==2 orthogonal (cos 0, dropped at
    0.5), %4==3 zero-norm (NaN, dropped). Exact keep count = n/4; the
    runtime budget fails the test if scoring stops being a single
    zero-shuffle map pass."""
    from etl_global_mobility_spark.operators.alignment import (
        alignment_gate,
        alignment_report,
    )

    n = 500_000
    dim = 16
    base = spark.range(n).select(
        F.col("id").alias("pair_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.col("id") % 97 + i).cast("double"),
        ).alias("v"),
    )
    pairs = base.select(
        "pair_id",
        F.col("v").alias("image_embedding"),
        F.when(F.col("pair_id") % 4 == 0, F.col("v"))
        .when(
            F.col("pair_id") % 4 == 1,
            F.transform(F.col("v"), lambda x: -x),
        )
        .when(
            F.col("pair_id") % 4 == 2,
            # [v2, -v1, v4, -v3, ...]: exactly orthogonal to v (the
            # paired products cancel term-by-term, so dot is exact 0)
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim // 2 - 1)),
                    lambda j: F.array(
                        F.element_at(F.col("v"), j * 2 + 2),
                        -F.element_at(F.col("v"), j * 2 + 1),
                    ),
                )
            ),
        )
        .otherwise(F.transform(F.col("v"), lambda x: x * F.lit(0.0)))
        .alias("text_embedding"),
    ).repartition(32)

    t0 = time.time()
    kept = alignment_gate(pairs, threshold=0.5).count()
    elapsed = time.time() - t0
    assert kept == n // 4
    assert elapsed < 60, f"alignment gate soak took {elapsed:.1f}s"

    rep = {r["bucket"]: r for r in alignment_report(pairs, threshold=0.5).collect()}
    assert rep["degenerate"]["n_pairs"] == n // 4      # zero-norm quarter
    assert rep["19"]["n_pairs"] == n // 4              # cos 1 quarter
    assert rep["0"]["n_pairs"] == n // 4               # cos -1 quarter
    assert rep["10"]["n_pairs"] == n // 4              # cos 0 quarter
    assert sum(r["n_kept"] for r in rep.values()) == n // 4


@pytest.mark.slow
def test_bitext_mining_soak_planted_pairs_at_volume(spark):
    """64 source embeddings vs 20k targets (1.28M forward candidate
    scores): every source has EXACTLY ONE planted near-copy in the
    target side; mining at a real threshold must recover all 64
    plants and nothing else, inside a runtime budget. dim 64 keeps
    random cosines concentrated near 0 so the margin separates (at
    dim 16 the best of 20k random neighbors approaches the plant's
    cosine and the margin signal collapses — the same reason real
    LASER mining runs on 1024-dim embeddings)."""
    import random

    from etl_global_mobility_spark.operators.retrieval import (
        mine_bitext_pairs,
    )

    dim, n_src, n_tgt = 64, 64, 20_000
    rng = random.Random(11)
    src_vecs = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_src)
    ]
    src = spark.createDataFrame(
        [(2 * i, v) for i, v in enumerate(src_vecs)],
        "vec_id long, embedding array<double>",
    )
    # targets: plant the near-copy of source i at tgt id 2*(1000+i)+1;
    # everything else random
    plants = {
        2 * (1000 + i) + 1: [v + 0.001 for v in src_vecs[i]]
        for i in range(n_src)
    }

    def tvec(j):
        tid = 2 * j + 1
        if tid in plants:
            return plants[tid]
        r = random.Random(j * 7919 + 3)
        return [r.uniform(-1, 1) for _ in range(dim)]

    tgt = (
        spark.range(n_tgt)
        .repartition(32)
        .select(
            (F.col("id") * 2 + 1).alias("vec_id"),
            F.udf(tvec, "array<double>")(F.col("id")).alias("embedding"),
        )
    )
    t0 = time.time()
    mined = {
        r["src_id"]: r
        for r in mine_bitext_pairs(src, tgt, k=4, threshold=1.4).collect()
    }
    elapsed = time.time() - t0
    assert set(mined) == {2 * i for i in range(n_src)}
    for i in range(n_src):
        assert mined[2 * i]["tgt_id"] == 2 * (1000 + i) + 1
        assert mined[2 * i]["cos"] > 0.95
    assert elapsed < 120, f"bitext soak took {elapsed:.1f}s"
