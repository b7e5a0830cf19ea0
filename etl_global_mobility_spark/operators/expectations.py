"""Declarative data-quality expectations (deequ/dbt-test-style).

The reference's quality engine (NB:561-678) tags ROWS and splits them;
this module is the complementary TABLE-level contract check a
production pipeline runs before publishing: named expectations
(non-null, accepted values, ranges, key uniqueness, referential
integrity) evaluated into one violations report.

Scale design: all row-level rules fold into a SINGLE aggregation pass
over the table (one scan, map-side partial counts — adding a rule
costs one conditional counter, not one job); uniqueness rides the same
pass as ``count - count(DISTINCT key)``; referential integrity is a
broadcast-or-shuffle anti-join counted, the only rule that touches a
second table. The report is a tiny (n_rules)-row frame: rule name,
violation count, pass flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validation_report(
    df: DataFrame,
    row_rules: dict[str, Column],
    unique_key: str | None = None,
    fk: tuple[DataFrame, str, str] | None = None,
) -> DataFrame:
    """Evaluate named expectations; return (rule, n_violations, ok).

    ``row_rules`` maps rule name → a BOOLEAN Column that is True when
    the row SATISFIES the expectation (violations = rows where it is
    False or NULL — an unevaluable rule counts as a violation, the
    conservative contract).  ``unique_key`` adds a duplicate-count
    rule; ``fk=(parent, child_col, parent_col)`` adds an orphan-count
    referential rule.
    """
    if not row_rules and unique_key is None and fk is None:
        raise ValueError("no expectations given")

    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in row_rules.items()
    ]
    names = list(row_rules)
    if unique_key is not None:
        aggs.append(
            (F.count(unique_key) - F.count_distinct(F.col(unique_key))).alias(
                f"unique_{unique_key}"
            )
        )
        names.append(f"unique_{unique_key}")
    report = None
    if aggs:
        # stack the one-row wide frame into (rule, n_violations)
        wide = df.agg(*aggs)
        stack_expr = ", ".join(f"'{n}', `{n}`" for n in names)
        report = wide.selectExpr(
            f"stack({len(names)}, {stack_expr}) AS (rule, n_violations)"
        )

    if fk is not None:
        parent, child_col, parent_col = fk
        orphans = (
            df.select(F.col(child_col))
            .filter(F.col(child_col).isNotNull())
            .join(
                parent.select(F.col(parent_col)),
                F.col(child_col) == F.col(parent_col),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(
                F.lit(f"fk_{child_col}").alias("rule"), F.col("n_violations")
            )
        )
        report = orphans if report is None else report.unionByName(orphans)

    return report.select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("ok"),
    )
