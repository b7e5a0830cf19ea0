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
