"""Mergeable t-digest-style quantile sketch (operators/sketch.py):
the sketch-once / merge-for-any-rollup flow and its invariants — the
quantile twin of test_hll_sketch_union_error_bounds' mergeability
shape. The Spark tests exercise the distributed flow; the Hypothesis
tests hammer the pure-Python compression/estimation core with
adversarial multisets and arbitrary shard boundaries (no Spark per
example)."""

import bisect

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _digest_map(rows, key="grp"):
    return {r[key]: r.digest for r in rows}


def test_tdigest_mergeability_matches_direct_sketch(spark):
    """Per-group digests merged into a global one must EQUAL the digest
    built over everything at once — bit-identical, not just
    within-error: both paths compress the same sorted multiset with
    the same deterministic rule. This is the property that lets a
    pipeline sketch per (source, day) and re-roll arbitrary rollups
    without re-reading the corpus."""
    from etl_global_mobility_spark.operators.sketch import (
        tdigest_build,
        tdigest_merge,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("grp"),
        # deterministic non-uniform values, several exact ties
        ((F.hash(F.col("id")) % 1000) * (F.hash(F.col("id")) % 1000))
        .cast("double")
        .alias("v"),
    )
    per_group = tdigest_build(df, "v", ["grp"], delta=100)
    merged = tdigest_merge(per_group, "digest", (), delta=100).collect()
    assert len(merged) == 1
    direct = tdigest_build(
        df.select(F.lit(0).alias("g"), "v"), "v", ["g"], delta=100
    ).collect()[0]

    def centroids(d):
        return [(c["m"], c["w"]) for c in d]

    # merging sorted per-group centroid lists then re-compressing the
    # global sorted multiset need not be bit-identical to compressing
    # raw values (weights arrive pre-clustered) — but the ESTIMATES
    # must agree within the rank-error bound, and the total weight
    # exactly
    from etl_global_mobility_spark.operators.sketch import (
        tdigest_n,
        tdigest_quantile,
    )

    n = 10_000
    assert tdigest_n(merged[0].digest) == n
    assert tdigest_n(direct.digest) == n
    exact = sorted(
        r.v for r in df.select("v").collect()
    )
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        for est in (
            tdigest_quantile(merged[0].digest, q),
            tdigest_quantile(direct.digest, q),
        ):
            # rank error within one cluster: <= ceil(2n/delta) = 200
            import bisect

            lo = bisect.bisect_left(exact, est)
            hi = bisect.bisect_right(exact, est)
            target = q * n
            err = min(abs(target - lo), abs(target - hi))
            assert err <= 2 * n / 100 + 1, (q, est, err)


def test_tdigest_partition_layout_and_merge_order_invariance(spark):
    """A digest is a pure function of the input multiset: repartitioning
    the input, or merging per-group digests in a different grouping
    order, changes NOTHING (the sort-before-compress contract)."""
    from etl_global_mobility_spark.operators.sketch import (
        tdigest_build,
        tdigest_merge,
    )

    df = spark.range(5_000).select(
        (F.col("id") % 5).alias("grp"),
        (F.hash(F.col("id")) % 100_000).cast("double").alias("v"),
    )

    a = _digest_map(tdigest_build(df, "v", ["grp"]).collect())
    b = _digest_map(
        tdigest_build(df.repartition(17, "v"), "v", ["grp"]).collect()
    )
    assert a == b

    per_group = tdigest_build(df, "v", ["grp"])
    m1 = tdigest_merge(per_group, "digest", ()).collect()[0].digest
    m2 = (
        tdigest_merge(per_group.repartition(7), "digest", ())
        .collect()[0]
        .digest
    )
    assert m1 == m2


def test_tdigest_rank_error_bound_uniform(spark):
    """On 0..n-1 the q-quantile is exactly q·(n-1): every estimate must
    land within the one-cluster rank bound 2n/delta, at delta 100 and
    the tighter delta 400."""
    from etl_global_mobility_spark.operators.sketch import (
        tdigest_build,
        tdigest_quantile,
    )

    n = 20_000
    df = spark.range(n).select(
        F.lit(0).alias("g"), F.col("id").cast("double").alias("v")
    )
    for delta in (100, 400):
        digest = tdigest_build(df, "v", ["g"], delta=delta).collect()[0].digest
        assert len(digest) <= delta // 2 + 2  # bounded size
        for q in (0.001, 0.1, 0.5, 0.9, 0.999):
            est = tdigest_quantile(digest, q)
            assert abs(est - q * (n - 1)) <= 2 * n / delta + 1, (delta, q, est)


def test_tdigest_rollup_from_persisted_digests(spark, tmp_path):
    """The sketch-once flow end-to-end: persist per-group digests to
    parquet, read them back, merge a SUBSET rollup, and the estimate
    must match a digest built directly over that subset's raw rows
    within the error bound — no raw-data re-read."""
    from etl_global_mobility_spark.operators.sketch import (
        tdigest_build,
        tdigest_merge,
        tdigest_n,
        tdigest_quantile,
    )

    df = spark.range(8_000).select(
        (F.col("id") % 8).alias("grp"),
        (F.hash(F.col("id"), F.lit(3)) % 10_000).cast("double").alias("v"),
    )
    path = str(tmp_path / "digests")
    tdigest_build(df, "v", ["grp"]).write.parquet(path)
    persisted = spark.read.parquet(path)

    subset = persisted.filter(F.col("grp") < 3)
    rolled = tdigest_merge(subset, "digest", ()).collect()[0].digest

    raw = df.filter(F.col("grp") < 3)
    n_subset = raw.count()
    assert tdigest_n(rolled) == n_subset
    exact = sorted(r.v for r in raw.select("v").collect())
    import bisect

    for q in (0.25, 0.5, 0.9):
        est = tdigest_quantile(rolled, q)
        lo = bisect.bisect_left(exact, est)
        hi = bisect.bisect_right(exact, est)
        target = q * n_subset
        assert min(abs(target - lo), abs(target - hi)) <= 2 * n_subset / 100 + 1


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=400,
    ),
    delta=st.sampled_from([20, 100]),
    shard_seed=st.integers(min_value=0, max_value=2**31),
)
def test_tdigest_core_properties_hypothesis(vals, delta, shard_seed):
    """Pure-Python core under adversarial multisets and ARBITRARY shard
    boundaries: weight is conserved exactly, the digest stays bounded,
    and any-shape shard→build→merge keeps every quantile estimate
    inside the one-cluster rank bound (the invariant that makes the
    distributed flow trustworthy, independent of how the data was
    partitioned)."""
    import math
    import random

    from etl_global_mobility_spark.operators.sketch import (
        _compress,
        tdigest_quantile,
    )

    n = len(vals)
    cap = max(1, math.ceil(2.0 * n / delta))

    # direct build: sorted singletons
    direct = _compress([(x, 1) for x in sorted(vals)], delta)
    assert sum(w for _, w in direct) == n           # exact conservation
    assert len(direct) <= delta // 2 + 2            # bounded size
    assert [m for m, _ in direct] == sorted(m for m, _ in direct)

    # arbitrary sharding -> per-shard digests -> one-shot merge
    rng = random.Random(shard_seed)
    shards: list[list[float]] = [[] for _ in range(rng.randint(1, 5))]
    for v in vals:
        shards[rng.randrange(len(shards))].append(v)
    cents: list[tuple[float, int]] = []
    for sh in shards:
        cents.extend(_compress([(x, 1) for x in sorted(sh)], delta))
    cents.sort()
    merged = _compress(cents, delta)
    assert sum(w for _, w in merged) == n

    exact = sorted(vals)
    for digest in (direct, merged):
        d = [{"m": m, "w": w} for m, w in digest]
        for q in (0.0, 0.1, 0.5, 0.9, 1.0):
            est = tdigest_quantile(d, q)
            # rank error within one (possibly merged) cluster; merged
            # digests can carry up-to-cap centroids from each shard,
            # so allow 2 cluster-caps of slack
            lo = bisect.bisect_left(exact, est)
            hi = bisect.bisect_right(exact, est)
            err = min(abs(q * n - lo), abs(q * n - hi))
            assert err <= 2 * cap + 1, (q, est, err, cap)


def test_tdigest_edge_cases(spark):
    """Empty groups (all-NULL values) digest to an empty array and
    estimate None; single values estimate themselves; exact ties
    survive compression with full weight."""
    from etl_global_mobility_spark.operators.sketch import (
        tdigest_build,
        tdigest_n,
        tdigest_quantile,
    )

    df = spark.createDataFrame(
        [(0, None), (0, None), (1, 42.0)]
        + [(2, 7.0)] * 500,
        "grp int, v double",
    )
    out = _digest_map(tdigest_build(df, "v", ["grp"]).collect())
    assert out[0] == [] and tdigest_quantile(out[0], 0.5) is None
    assert tdigest_quantile(out[1], 0.5) == 42.0
    assert tdigest_n(out[2]) == 500
    assert tdigest_quantile(out[2], 0.01) == 7.0
    assert tdigest_quantile(out[2], 0.99) == 7.0


def test_tdigest_merge_tree_shape_not_bit_stable():
    """Pin the DOCUMENTED merge-invariance boundary (ADVICE r9): one
    FLAT merge is invariant to input order and grouping, but a NESTED
    merge tree is not bit-identical to the flat merge — intermediate
    compression discards within-cluster detail. Both shapes conserve
    weight exactly and estimate quantiles within the rank bound; only
    the flat shape is hash-stable."""
    from etl_global_mobility_spark.operators.sketch import (
        _compress,
        tdigest_quantile,
    )

    delta = 4
    a = [(0.0, 1), (1.0, 1)]
    b = [(2.0, 1), (3.0, 1)]
    c = [(4.0, 1), (5.0, 1)]

    def merge(*digs):
        cents = sorted(cent for d in digs for cent in d)
        return _compress(cents, delta)

    flat = merge(a, b, c)
    # flat merge: any order/grouping of the SAME digest rows is
    # bit-identical
    assert merge(c, a, b) == flat
    assert merge(b, c, a) == flat
    assert flat == [(1.0, 3), (4.0, 3)]

    # nested merge: merge(merge(A,B),C) loses the 0/1 and 2/3
    # distinction inside (0.5,2)/(2.5,2) before the final pass
    nested = merge(merge(a, b), c)
    assert nested == [(0.5, 2), (3.0, 3), (5.0, 1)]
    assert nested != flat

    # ... but accuracy properties hold for both tree shapes
    exact = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    import bisect
    import math

    cap = math.ceil(2.0 * len(exact) / delta)
    for digest in (flat, nested):
        assert sum(w for _, w in digest) == len(exact)
        d = [{"m": m, "w": w} for m, w in digest]
        for q in (0.0, 0.5, 1.0):
            est = tdigest_quantile(d, q)
            lo = bisect.bisect_left(exact, est)
            hi = bisect.bisect_right(exact, est)
            err = min(abs(q * len(exact) - lo), abs(q * len(exact) - hi))
            assert err <= 2 * cap + 1


def test_tdigest_quantiles_df_report_stage(spark):
    """tdigest_quantiles_df expands digests distributedly and its
    estimates honor the rank-error bound against the exact per-group
    distribution; weight and centroid-count columns are exact."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.sketch import (
        tdigest_build,
        tdigest_merge,
        tdigest_quantiles_df,
    )

    n = 4000
    df = spark.range(n).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
    )
    per = tdigest_build(df, "v", ["g"], delta=100)
    merged = tdigest_merge(per, group_cols=["g"], delta=100)
    rep = {r.g: r for r in tdigest_quantiles_df(merged, [0.5, 0.999]).collect()}
    assert set(rep) == {0, 1, 2, 3}
    exact = {
        r.g: sorted(x.v for x in rows)
        for g, rows in [
            (g, df.filter(F.col("g") == g).collect()) for g in range(4)
        ]
        for r in [type("R", (), {"g": g})]
    }
    for g, row in rep.items():
        vals = exact[g]
        assert row.n == len(vals)
        assert 0 < row.n_centroids <= 52
        for q, est in ((0.5, row.p50), (0.999, row.p99_9)):
            lo = sum(1 for v in vals if v < est)
            hi = sum(1 for v in vals if v <= est)
            err = min(abs(q * len(vals) - lo), abs(q * len(vals) - hi))
            assert err <= 2 * (2 * len(vals) / 100) + 1, (g, q, est, err)


def test_tdigest_quantile_stays_inside_bracketing_centroids():
    """Regression (Hypothesis-found, round 10): interpolating between
    centroid means -1.0 and -5.55e-17 at frac=1.0 used to cancel to
    exactly 0.0 — OUTSIDE the data range (every value negative), so the
    estimated rank fell off the distribution entirely. The estimate
    must never leave [prev_mean, mean]."""
    from etl_global_mobility_spark.operators.sketch import (
        _compress,
        tdigest_quantile,
    )

    vals = [-1.0, -1.0, -1.0, -5.551115123125783e-17,
            -2.7755575615628914e-17, -2.7755575615628914e-17,
            -4.411620044532945e-280]
    digest = [
        {"m": m, "w": w}
        for m, w in _compress([(x, 1) for x in sorted(vals)], 20)
    ]
    est = tdigest_quantile(digest, 0.5)
    assert est <= 0.0 and min(vals) <= est
    import bisect
    exact = sorted(vals)
    lo = bisect.bisect_left(exact, est)
    hi = bisect.bisect_right(exact, est)
    assert min(abs(3.5 - lo), abs(3.5 - hi)) <= 3  # 2*cap+1, cap=1
