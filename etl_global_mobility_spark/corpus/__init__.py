"""Declared query corpus — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 is represented here as a
:class:`QuerySpec`: a named PySpark query over the driver's test tables
plus (where SQL-expressible) an equivalent DuckDB oracle SQL string.
``__spark_entry__.py`` assembles these into the driver contract.
"""

from __future__ import annotations

from etl_global_mobility_spark.corpus.base import QuerySpec, load_table


def all_queries() -> dict[str, QuerySpec]:
    """name → QuerySpec for every declared query, stable order."""
    from etl_global_mobility_spark.corpus import (
        llm,
        parity,
        relational,
        streaming,
        udfs,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (parity, relational, llm, streaming, udfs):
        for spec in mod.SPECS:
            if spec.name in out:
                raise ValueError(f"duplicate query name: {spec.name}")
            out[spec.name] = spec
    return out


__all__ = ["QuerySpec", "load_table", "all_queries"]
