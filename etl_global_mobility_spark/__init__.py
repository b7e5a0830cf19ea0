"""etl_global_mobility_spark — a PySpark-native analytics engine.

A brand-new, library-shaped Spark engine with the query/data-processing
capabilities of the reference ETL (a config-driven medallion bronze→silver
delivery pipeline; see SURVEY.md), extended with a full relational query
surface and LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout:
    session        SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
    config         config load + validation (reference parity: NB:150-232)
    schemas        explicit StructTypes + DDL emission (NB:300-429)
    pipeline       bronze/silver parity pipeline + quality rule engine
    sinks          idempotent replaceWhere-style writers (parquet fallback)
    operators      relational wrappers + dedup/similarity/text/multimodal
    functions      scalar expression helpers (vector math, text stats)
    streaming      structured-streaming surface over the events table
"""

__version__ = "0.1.0"
