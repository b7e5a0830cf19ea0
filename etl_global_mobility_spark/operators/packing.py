"""Sequence packing and document chunking for LLM training pipelines.

Two map-shaped preprocessing operators every large-scale training-data
pipeline needs between "cleaned documents" and "model batches":

* :func:`pack_sequences` — concat-and-chunk packing: concatenate
  documents in a stable order and cut the token stream every ``budget``
  tokens, assigning each document to the training sequence its last
  token lands in. This is the GPT-style packing strategy (no padding
  waste), expressed as a per-shard window cumulative sum.
* :func:`chunk_documents` — overlapping fixed-size token windows
  (RAG / long-doc splitting): each document explodes into
  ``ceil(n_tokens / stride)`` chunks of up to ``chunk_size`` tokens.

Scale design: both are pure JVM expression pipelines (no Python eval).
``pack_sequences`` partitions its window by a shard column — at 100 TB
packing is embarrassingly parallel across shards (source / language /
date bucket), and a global packing order is neither needed nor wanted
(any stable shard-local order yields equally dense packs). The only
shuffle is the per-shard sort; chunking is map-only and shuffle-free.

All token logic mirrors :func:`operators.text.tokenize` so the DuckDB
oracle can recompute results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from etl_global_mobility_spark.operators.text import token_count, tokenize


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    shard_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence.

    Documents are concatenated per shard in ``order_col`` order and the
    token stream is cut every ``budget`` tokens; a document belongs to
    the sequence containing its LAST token (``(cum_tokens - 1) div
    budget``), so ``seq_id`` is dense, deterministic, and identical on
    any cluster layout. Empty documents attach to the current sequence.

    Returns the input plus ``n_tokens``, ``cum_tokens``, ``seq_id``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    w = Window.partitionBy(shard_col).orderBy(order_col)
    return (
        docs.withColumn("n_tokens", token_count(text_col))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "seq_id",
            F.floor((F.greatest(F.col("cum_tokens"), F.lit(1)) - 1) / budget),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Chunk starts are ``0, stride, 2*stride, ...`` while ``start <
    n_tokens``; each chunk holds tokens ``[start, start + chunk_size)``
    joined with single spaces. Documents with zero tokens produce no
    chunks. Map-only: the explode happens where the row already lives.

    Returns one row per chunk: ``(id_col, chunk_start, chunk_text,
    chunk_tokens)``.
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError(f"chunk_size/stride must be positive: {chunk_size}/{stride}")
    toks = tokenize(text_col)
    # sequence() with a descending range throws; guard n_tokens == 0.
    starts = F.when(F.size(toks) > 0, F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select(id_col, F.col(text_col), starts.alias("_starts"))
        .select(id_col, F.col(text_col), F.explode("_starts").alias("chunk_start"))
        .select(
            id_col,
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.array_join(
                F.slice(tokenize(text_col), F.col("chunk_start") + 1, chunk_size), " "
            ).alias("chunk_text"),
        )
        .withColumn("chunk_tokens", token_count("chunk_text"))
    )
