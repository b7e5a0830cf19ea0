"""Custom sources (Spark 4.x Python Data Source API)."""

from etl_global_mobility_spark.sources.pysource import (
    SyntheticEventsSource,
    register,
)

__all__ = ["SyntheticEventsSource", "register"]
