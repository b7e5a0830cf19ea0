"""Scalar/array expression helpers — the engine's public Column API.

Pure expression builders (no I/O, no actions): vector math over
array<float/double> embedding columns, text normalization/statistics,
portable hashing. All JVM-side ``pyspark.sql.functions`` compositions —
usable in any DataFrame context and oracle-reproducible in plain SQL.
"""

from etl_global_mobility_spark.operators.dedup import (
    minhash_signature,
    shingle_hashes,
)
from etl_global_mobility_spark.operators.similarity import (
    cosine,
    dot,
    l2_norm,
    lsh_bucket,
)
from etl_global_mobility_spark.operators.splits import split_column
from etl_global_mobility_spark.operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokenize,
)
from etl_global_mobility_spark.pipeline.quality import (
    factor_lookup,
    factor_map_literal,
    norm,
    parse_compact_date,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "lsh_bucket",
    "tokenize",
    "token_count",
    "bpe_ish_token_count",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "shingle_hashes",
    "minhash_signature",
    "norm",
    "parse_compact_date",
    "factor_map_literal",
    "factor_lookup",
    "split_column",
]
