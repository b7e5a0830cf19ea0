"""Batch MERGE (upsert) — the engine-level equivalent of Delta's
``MERGE INTO`` for parquet-backed tables.

The reference's write mode is partition-overwrite (``replaceWhere``,
NB:502-507); MERGE is its row-level generalization and the backbone of
CDC/dimension maintenance in a lakehouse pipeline. Semantics here are
whole-row "source wins":

* matched target rows are REPLACED by their source row,
* unmatched source rows are INSERTED,
* all other target rows are carried through unchanged.

Scale shape: one left-anti join of target against source keys + one
union — both sides shuffle once on the merge keys (or not at all when
the target is bucketed on them, see sinks/bucketing.py; the anti join
then co-locates). Source is typically a small changeset → Spark
broadcasts it and the target never shuffles. No window, no driver-side
row movement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE ``source`` into ``target`` on ``keys`` (whole-row replace).

    Both frames must share a schema (column order may differ —
    ``unionByName`` aligns). Duplicate keys WITHIN source are the
    caller's bug (classic MERGE raises on multi-match); deduplicate the
    changeset first — this function does not silently pick one.
    """
    keys = list(keys)
    missing = [k for k in keys if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"merge keys missing from a side: {missing}")
    untouched = target.join(source.select(*keys), on=keys, how="left_anti")
    return untouched.unionByName(source)


def incremental_agg_update(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: Sequence[str] = (),
) -> DataFrame:
    """Incremental maintenance of a sum/count aggregate table: fold a
    delta batch of RAW rows into a pre-aggregated ``base`` without
    rescanning base data.

    ``base`` holds one row per key with columns named in ``sums`` (sum
    aggregates) and ``counts`` (count aggregates). ``delta`` holds raw
    rows whose ``sums`` columns are the addends (each delta row
    contributes 1 to every ``counts`` column). Sum/count are the
    self-mergeable aggregates (avg = sum/count at read time); min/max
    need the scale-out sketch or a re-scan of the affected keys.

    Scale shape: the delta aggregates first (map-side combine, output
    bounded by touched keys), then a single outer join + coalesce-add
    against base — the 100 TB base shuffles once on its key (or never,
    if bucketed on it), and only keys touched by the delta change.
    This is the engine-level equivalent of a materialized-view refresh.
    """
    from pyspark.sql import functions as F

    keys = list(keys)
    aggs = [F.sum(F.col(c)).alias(c) for c in sums] + [
        F.count(F.lit(1)).alias(c) for c in counts
    ]
    if not aggs:
        raise ValueError("nothing to maintain: sums and counts both empty")
    d = delta.groupBy(*keys).agg(*aggs)
    b = base.alias("b")
    d = d.alias("d")
    merged = b.join(d, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys]
    for c in list(sums) + list(counts):
        out_cols.append(
            (
                F.coalesce(F.col(f"b.{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            ).alias(c)
        )
    return merged.select(*out_cols)
