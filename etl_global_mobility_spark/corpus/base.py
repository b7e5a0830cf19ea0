"""QuerySpec plumbing shared by the corpus modules.

Determinism conventions (the driver hash-compares against DuckDB):

* Aggregations over DOUBLE columns are computed in DECIMAL (exact,
  order-independent) and only the FINAL value is cast to DOUBLE, so
  Spark's and DuckDB's partial-aggregation orders can't produce
  different floating-point sums.
* Every computed column is aliased identically in the Spark plan and
  the oracle SQL (the driver sorts columns by name before hashing).
* Ties in top-k / window orderings are always broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver test table (TESTDATA.md)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive scan of events.parquet, normalizing ``ts`` to a
    session-zone TimestampType column.

    The driver has shipped two physical layouts for ``ts``:

    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects — read
      nanos as LONG (legacy conf) and rebuild microseconds with integer
      div (double math would overflow 2^53);
    * plain timestamp[us], which arrives as TIMESTAMP_NTZ — cast to
      TimestampType (identical wall-clock under the UTC session zone
      every entrypoint pins).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def spark_round_sql(expr: str, n: int) -> str:
    """DuckDB SQL that reproduces Spark's ``F.round(double, n)`` /
    ``CAST(double AS DECIMAL)`` bit-for-bit.

    Spark rounds the SHORTEST decimal repr of the double (Java
    ``BigDecimal.valueOf`` goes through ``Double.toString``), while
    DuckDB's ``round(double, n)`` multiplies by 10^n in FP — they
    disagree on edge values in both directions. DuckDB's double→VARCHAR
    is shortest-repr, so VARCHAR → DECIMAL → round(HALF_UP) mirrors
    Spark exactly (verified on 60k-row corpora).
    """
    # scale 20: a double's shortest repr carries ≤17 significant digits,
    # so scale 15 truncates values like 3.7864999999999998 (16 fractional
    # digits) into 3.7865 and flips the rounding — found at sf0.1.
    return f"CAST(round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20)), {n}) AS DECIMAL(21,{n}))"


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark implementation + optional DuckDB oracle.

    ``oracle`` is ANSI SQL over the pre-registered table views; ``None``
    marks a genuinely non-SQL-expressible operator (approximate / ML /
    stateful) for which the driver records a weaker rows-only check.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
