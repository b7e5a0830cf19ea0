"""Privacy auditing for training-data release — the k-anonymity pass a
corpus runs after PII redaction (operators/text.py redact_pii handles
the in-text identifiers; this module handles the METADATA side): rows
whose quasi-identifier combination is shared by fewer than k records
are re-identifiable by joining on those attributes alone (Sweeney 2002),
so a release either suppresses them or generalizes the attributes until
every equivalence class reaches size k.

Scale shape: both operators are ONE hash aggregation / keyed window on
the quasi-identifier tuple — map-side combined, output ∝ distinct
combinations — the same plan at 60k rows and 100 TB. No all-pairs
anything: k-anonymity is a group-size property, not a similarity one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 3
) -> DataFrame:
    """Per-equivalence-class audit: one row per distinct
    quasi-identifier combination with its size and whether it violates
    k-anonymity (size < k) — plus the headline numbers a release
    review reads: rows at risk per class and the class's share of the
    corpus.

    One hash aggregation on the quasi tuple; a second tiny aggregate
    (1 row) broadcasts back for the share division."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 2:
        raise ValueError(f"k must be >= 2 for a meaningful audit: {k}")
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = classes.agg(F.sum("n_rows").alias("_total"))
    return (
        classes.crossJoin(F.broadcast(total))  # 1-row total frame
        .select(
            *quasi_cols,
            "n_rows",
            (F.col("n_rows") < k).alias("at_risk"),
            (F.col("n_rows").cast("double") / F.col("_total")).alias(
                "row_share"
            ),
        )
    )


def k_anonymity_suppress(
    df: DataFrame, quasi_cols: list[str], k: int = 3
) -> DataFrame:
    """Suppression baseline: drop every row whose quasi-identifier
    equivalence class has fewer than k members, leaving a release in
    which ANY quasi-identifier join matches k-or-none. (Generalization
    — coarsening attributes instead of dropping rows — retains more
    data; suppression is the correctness baseline it's measured
    against.)

    Mergeable class-size aggregation + left-semi join back on the
    surviving classes (round 8; previously a count-over-window, which
    moved EVERY row of a giant equivalence class to one task and
    sorted it there — the window twin of the hot-key join problem,
    except AQE can skew-split a JOIN but never a window). The
    aggregation combines map-side so the class-size frame is ∝
    distinct combinations; AQE broadcasts it when small and
    skew-splits the row-side shuffle when one class dominates."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 2:
        # same guard as the audit: k=1 (or less) suppresses NOTHING and
        # would hand the full table downstream as a "privacy release"
        raise ValueError(f"k must be >= 2 for meaningful suppression: {k}")
    keep = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_class_n"))
        .filter(F.col("_class_n") >= k)
        .select(
            *[F.col(c).alias(f"_k_{c}") for c in quasi_cols]
        )
    )
    # null-safe equality: groupBy puts NULL quasi values in one class
    # (as the old window did), so the join back must match them too —
    # plain '=' would silently drop every NULL-attribute row. <=> is
    # still an equi-join key (hash/SMJ + AQE skew-split all apply).
    cond = None
    for c in quasi_cols:
        clause = F.col(c).eqNullSafe(F.col(f"_k_{c}"))
        cond = clause if cond is None else cond & clause
    return df.join(keep, cond, "left_semi")
