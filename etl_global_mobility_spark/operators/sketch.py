"""Mergeable quantile sketch — a t-digest-style centroid digest
(Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests", arXiv:1902.04023) with the k0 (linear) scale function.

Why this exists: Spark's ``approx_percentile`` (Greenwald-Khanna) is a
black-box aggregate — its intermediate state is not user-mergeable, so
a pipeline cannot sketch-once-per-partition/day/source and re-roll the
digests into arbitrary rollups later (the property that makes HLL
sketches scale, already covered by ``rel_hll_sketch_union``). This
module provides that flow for quantiles:

    build per-group digests  ->  persist  ->  merge for ANY rollup
    ->  estimate quantiles from the merged digest

Design for determinism (the repo's cross-engine discipline applied to
an approximate structure): values are SORTED before clustering and the
k0 scale function forms equal-weight clusters by a greedy left-to-right
rule, so a digest is a pure function of the input MULTISET — partition
layout cannot change it. Merging concatenates centroid lists, sorts by
(mean, weight), and re-compresses with the same rule, so a SINGLE
FLAT merge is invariant to the order and grouping of its inputs: one
``tdigest_merge`` call over any permutation/partitioning of the same
digest rows yields bit-identical output. NESTED merge trees are NOT
bit-stable — ``merge(merge(A, B), C)`` can differ from
``merge(A, B, C)`` because the intermediate compression discards
within-cluster detail (counterexample in tests/test_sketch.py). A
pipeline that re-merges incrementally (day-by-day) gets digests with
the same rank-error bound, not hash-identical ones; if tree-shape
invariance is required, keep the uncompressed per-partition digests
and do ONE flat rollup at the end. Rank error is bounded by the cluster
cap: with compression ``delta``, every cluster holds at most
ceil(2·n/delta) points, and midpoint interpolation keeps the rank
error of any quantile estimate within one cluster (<= 2n/delta).

Scale shape: the digest build is an Arrow-batched pandas grouped
aggregation (a DECLARED Python escape hatch — the sketch itself is the
point, and per group it is O(n log n) local work returning O(delta)
bytes); merging is the same shape over O(delta)-sized rows. At 100 TB
the flow is: digest per (source, day) partition at ingest (embarrassingly
parallel, bounded output), then any report merges a few thousand
digests — never re-touching the raw corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def _compress(cents: list[tuple[float, int]], delta: int) -> list[tuple[float, int]]:
    """Greedy left-to-right k0 compression of SORTED (mean, weight)
    centroids: clusters are capped at ceil(2·total/delta) weight, so the
    output has at most ~delta/2 + 1 centroids. Deterministic: depends
    only on the sorted centroid list and delta."""
    if not cents:
        return []
    total = sum(w for _, w in cents)
    cap = max(1, math.ceil(2.0 * total / delta))
    out: list[tuple[float, int]] = []
    cur_m, cur_w = cents[0]
    for m, w in cents[1:]:
        if cur_w + w <= cap:
            # exact weighted mean; weights are ints so only the mean
            # is float arithmetic
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out.append((cur_m, cur_w))
            cur_m, cur_w = m, w
    out.append((cur_m, cur_w))
    return out


def _digest_field():
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    return StructField(
        "digest",
        ArrayType(
            StructType(
                [
                    StructField("m", DoubleType()),
                    StructField("w", LongType()),
                ]
            )
        ),
    )


def tdigest_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | tuple[str, ...],
    delta: int = 100,
) -> DataFrame:
    """One digest row per group: ``group_cols... , digest`` where
    digest is a bounded centroid array (<= ~delta/2 + 1 entries).
    NULL values are dropped (they carry no rank). Values are sorted
    in the UDF, so the digest is partition-layout-invariant.
    Arrow-batched grouped-map transform (complex aggregate states are
    a grouped-map shape — grouped-agg pandas UDFs only return scalar
    types)."""
    import pandas as pd
    from pyspark.sql.types import StructType

    from etl_global_mobility_spark.operators.parallelism import (
        ensure_grouped_compute_parallelism,
    )

    out_schema = StructType(
        [df.schema[c] for c in group_cols] + [_digest_field()]
    )

    def _dig(pdf: "pd.DataFrame") -> "pd.DataFrame":
        vals = sorted(float(x) for x in pdf[value_col].dropna())
        digest = [
            {"m": m, "w": w}
            for m, w in _compress([(x, 1) for x in vals], delta)
        ]
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["digest"] = [digest]
        return pd.DataFrame(row)

    # pandas cost scales with GROUP COUNT, not bytes — pre-partition by
    # the key (the r8 grouped-parallelism guard) so AQE's bytes-based
    # coalescing can't serialize many per-group Python calls onto a
    # couple of tasks
    fanned = ensure_grouped_compute_parallelism(df, list(group_cols))
    return fanned.groupBy(*group_cols).applyInPandas(_dig, out_schema)


def tdigest_merge(
    digests: DataFrame,
    digest_col: str = "digest",
    group_cols: list[str] | tuple[str, ...] = (),
    delta: int = 100,
) -> DataFrame:
    """Merge digest rows into one digest per ``group_cols`` rollup
    (global when empty): concatenate centroids, sort by (mean, weight),
    re-compress. The sort makes ONE FLAT merge invariant to input
    order and partition layout (any grouping of the same digest rows
    into a single call yields bit-identical output). Nested merges —
    ``merge(merge(A, B), C)`` vs ``merge(A, B, C)`` — are equivalent
    in accuracy (same rank-error bound) but NOT bit-identical: the
    intermediate compression loses within-cluster detail. For a
    hash-stable rollup, merge all partials in one call."""
    import pandas as pd
    from pyspark.sql.types import StructType

    src = (
        digests
        if group_cols
        else digests.withColumn("__all", F.lit(1))
    )
    keys = list(group_cols) if group_cols else ["__all"]
    out_schema = StructType(
        [src.schema[c] for c in keys] + [_digest_field()]
    )

    def _merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cents: list[tuple[float, int]] = []
        for row in pdf[digest_col]:
            if row is None:
                continue
            for c in row:
                cents.append((float(c["m"]), int(c["w"])))
        cents.sort()
        digest = [{"m": m, "w": w} for m, w in _compress(cents, delta)]
        out = {c: [pdf[c].iloc[0]] for c in keys}
        out["digest"] = [digest]
        return pd.DataFrame(out)

    merged = src.groupBy(*keys).applyInPandas(_merge, out_schema)
    return merged.drop("__all") if not group_cols else merged


def tdigest_quantile(digest, q: float) -> float | None:
    """Estimate the q-quantile from a digest (rows as returned by
    collect(): dicts or Rows with m/w). Midpoint piecewise-linear
    interpolation — centroid i sits at cumulative rank cum + w_i/2 —
    clamped to the extreme centroid means at the ends. Driver-side on
    a bounded (<= ~delta/2 + 1) structure."""
    cents = [(float(c["m"]), int(c["w"])) for c in (digest or [])]
    if not cents:
        return None
    total = sum(w for _, w in cents)
    target = q * total
    cum = 0.0
    prev_pos, prev_m = None, None
    for m, w in cents:
        pos = cum + w / 2.0
        if target <= pos:
            if prev_pos is None:
                return m
            frac = (target - prev_pos) / (pos - prev_pos)
            # two-product lerp + clamp: the naive a + t*(b-a) form can
            # LEAVE [a, b] by catastrophic cancellation (found by the
            # Hypothesis suite: a=-1.0, b=-5.55e-17, t=1.0 → b-a
            # rounds to exactly 1.0 and the estimate lands on 0.0 —
            # OUTSIDE the data range, blowing the rank bound). The
            # estimate must stay inside the bracketing centroid means
            # for the one-cluster rank-error guarantee to hold.
            est = prev_m * (1.0 - frac) + m * frac
            return min(max(est, prev_m), m)
        prev_pos, prev_m = pos, m
        cum += w
    return cents[-1][0]


def tdigest_n(digest) -> int:
    """Total weight (row count) carried by a digest."""
    return sum(int(c["w"]) for c in (digest or []))


def tdigest_quantiles_df(
    digests: DataFrame,
    qs: list[float] | tuple[float, ...],
    digest_col: str = "digest",
) -> DataFrame:
    """Expand each digest row into quantile-estimate columns
    (``p50``-style names), plus ``n`` (total weight) and
    ``n_centroids`` — the report stage of the sketch flow, distributed
    (Arrow-batched ``mapInPandas``; digests never collect to the
    driver). Column per q: ``p{int(q*100)}`` (``p99_9`` for
    fractional-percent quantiles)."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    def _qname(q: float) -> str:
        pct = q * 100.0
        if abs(pct - round(pct)) < 1e-9:
            return f"p{int(round(pct))}"
        return "p" + f"{pct:.10g}".replace(".", "_")

    names = [_qname(q) for q in qs]
    keep = [f for f in digests.schema.fields if f.name != digest_col]
    out_schema = StructType(
        keep
        + [StructField("n", LongType()), StructField("n_centroids", IntegerType())]
        + [StructField(nm, DoubleType()) for nm in names]
    )

    def _expand(it):
        for pdf in it:
            if pdf.empty:
                continue
            out = {f.name: pdf[f.name] for f in keep}
            digs = [
                [] if d is None else [(float(c["m"]), int(c["w"])) for c in d]
                for d in pdf[digest_col]
            ]
            out["n"] = [sum(w for _, w in d) for d in digs]
            out["n_centroids"] = [len(d) for d in digs]
            for q, nm in zip(qs, names):
                out[nm] = [
                    tdigest_quantile([{"m": m, "w": w} for m, w in d], q)
                    for d in digs
                ]
            yield pd.DataFrame(out)

    return digests.mapInPandas(_expand, out_schema)
