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


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: Sequence[str],
    effective_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 merge: apply a changeset to a
    versioned dimension, closing superseded versions and inserting new
    ones — full history retained (vs :func:`upsert`'s Type-1
    overwrite).

    ``current`` carries ``key``, ``tracked`` attributes, and the
    ``valid_from``/``valid_to`` version interval (``valid_to`` NULL =
    open version). ``changes`` carries ``key`` + ``tracked``. At
    ``effective_ts``:

    * an open version whose tracked attributes DIFFER from its change
      row (null-safe comparison) is closed (``valid_to`` set) and a
      new open version is inserted;
    * identical change rows are no-ops (no spurious versions);
    * brand-new keys insert an open version;
    * closed historical versions pass through untouched.

    Scale shape: closed history never joins — only open versions meet
    the changeset, in ONE equi-join on the key (broadcast when the
    changeset is small), then a union of the four disjoint branches.
    No window functions, no driver-side rows.
    """
    from pyspark.sql import functions as F

    ts = F.lit(effective_ts).cast("timestamp")
    open_rows = current.filter(F.col(valid_to).isNull()).withColumn(
        "_cur_present", F.lit(True)
    )
    closed_rows = current.filter(F.col(valid_to).isNotNull())

    chg = changes.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"_c_{c}") for c in tracked],
        F.lit(True).alias("_chg_present"),
    )
    # eqNullSafe + explicit presence markers: a NULL key is a real
    # (single-valued) key, not an unmatchable row — without this a
    # NULL-key version would silently vanish from the output.
    joined = open_rows.join(chg, F.col(key).eqNullSafe(F.col("_k")), "full_outer")
    cur_present = F.coalesce(F.col("_cur_present"), F.lit(False))
    chg_present = F.coalesce(F.col("_chg_present"), F.lit(False))

    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_c_{c}"))

    matched = joined.filter(cur_present & chg_present)
    # 1. unchanged open versions (change row identical or absent)
    untouched = joined.filter(cur_present & ~chg_present).select(
        current.columns
    )
    same = matched.filter(~differs).select(current.columns)
    # 2. superseded versions -> closed at effective_ts
    closed_now = (
        matched.filter(differs)
        .select(current.columns)
        .withColumn(valid_to, ts)
    )
    # 3. new versions for changed keys + 4. brand-new keys
    inserts_src = matched.filter(differs).unionByName(
        joined.filter(chg_present & ~cur_present)
    )
    inserted = inserts_src.select(
        F.col("_k").alias(key),
        *[F.col(f"_c_{c}").alias(c) for c in tracked],
        ts.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
    ).select(current.columns)

    return (
        closed_rows.unionByName(untouched)
        .unionByName(same)
        .unionByName(closed_now)
        .unionByName(inserted)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Change-data-feed generation — the INVERSE of :func:`upsert`:
    diff two snapshots of a table into an op-tagged changeset
    (``op`` ∈ insert/delete/update), the feed a downstream incremental
    consumer or :func:`scd2_apply` ingests when the source system
    only provides full dumps.

    One full-outer join on the keys; rows equal under null-safe
    whole-row comparison produce NO change row (the common case — the
    changeset is proportional to the churn, not the table). Emitted
    rows carry the NEW values (OLD for deletes).

    Keys compare null-safely (``eqNullSafe``) and presence is tracked
    by explicit marker literals, so NULL-key rows participate like any
    other key value instead of silently dropping out of the diff.
    """
    from pyspark.sql import functions as F

    value_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_ov_{c}") for c in value_cols],
        F.lit(True).alias("_o_present"),
    )
    n = new.withColumn("_n_present", F.lit(True))
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_ok_{k}"))
        cond = c if cond is None else cond & c
    j = n.join(o, cond, "full_outer")

    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"_ov_{c}"))
    new_present = F.coalesce(F.col("_n_present"), F.lit(False))
    old_present = F.coalesce(F.col("_o_present"), F.lit(False))

    inserts = j.filter(new_present & ~old_present).select(
        F.lit("insert").alias("op"), *keys, *value_cols
    )
    updates = j.filter(new_present & old_present & ~same).select(
        F.lit("update").alias("op"), *keys, *value_cols
    )
    deletes = j.filter(~new_present & old_present).select(
        F.lit("delete").alias("op"),
        *[F.col(f"_ok_{k}").alias(k) for k in keys],
        *[F.col(f"_ov_{c}").alias(c) for c in value_cols],
    )
    return inserts.unionByName(updates).unionByName(deletes)
