"""Deterministic dataset splitting for training pipelines.

``randomSplit``/``sample`` are the wrong tool for splitting a 100 TB
training corpus: their RNG draws depend on partition layout, so the
same document can land in train on one run and test on the next (data
leakage across experiments). The production recipe is a content-stable
hash split: bucket = hash(id) mod 100, fixed bucket ranges per split.
Same id → same split, forever, on any cluster size, with no shuffle
(the split column is a map-side expression) — and it is portable
(md5-based), so an independent engine assigns identical splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.dedup import _md5_band_hash

#: (name, percent) — must sum to 100.
DEFAULT_FRACTIONS = (("train", 80), ("valid", 10), ("test", 10))


def split_column(
    id_col: Column | str,
    fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    seed: int = 0,
) -> Column:
    """Split-name column from a stable md5 bucket of ``id_col``."""
    if sum(p for _, p in fractions) != 100:
        raise ValueError(f"fractions must sum to 100: {fractions}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = _md5_band_hash(c.cast("string"), seed) % 100
    expr = None
    cum = 0
    for name, pct in fractions[:-1]:
        cum += pct
        expr = (
            F.when(bucket < cum, name)
            if expr is None
            else expr.when(bucket < cum, name)
        )
    last = fractions[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    seed: int = 0,
) -> DataFrame:
    """Attach a deterministic ``split`` column (map-side, no shuffle)."""
    return df.withColumn("split", split_column(id_col, fractions, seed))
