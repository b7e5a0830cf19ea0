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

from etl_global_mobility_spark.operators.parallelism import AUTO
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
    # tokenize ONCE and carry the array through the explode: slicing a
    # carried array per chunk row is a bounded copy, while re-running
    # tokenize(text) per chunk row would redo the regex split O(n)
    # times per document (O(n²/stride) row work on long documents).
    return (
        docs.select(id_col, toks.alias("_toks"), starts.alias("_starts"))
        .select(id_col, "_toks", F.explode("_starts").alias("chunk_start"))
        .select(
            id_col,
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("chunk_start") + 1, chunk_size),
                " ",
            ).alias("chunk_text"),
        )
        .withColumn("chunk_tokens", token_count("chunk_text"))
    )


def sentence_chunks(
    docs: DataFrame,
    budget: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-BOUNDARY-respecting chunking (the RAG recipe
    :func:`chunk_documents`'s fixed token windows can't express: a
    retrieval chunk should not cut a sentence in half).

    Sentences end at terminal-punctuation runs (``[.!?]+``) followed by
    whitespace — marked with a control char and split, instead of a
    lookbehind (RE2-based engines can't run lookbehinds, and the oracle
    must segment identically). Empty/whitespace-only segments are
    dropped, surviving sentences are renumbered, and each sentence
    joins the chunk containing its LAST token under continuous
    concatenation (``(cum_tokens - 1) div budget`` — the same
    pack_sequences contract at sentence granularity, so a sentence
    longer than the budget still lands in exactly one chunk; chunks
    can overflow rather than ever splitting a sentence).

    Returns one row per (doc, chunk): ``chunk_id``, ``n_sentences``,
    ``chunk_tokens``, ``chunk_text`` (sentences joined with single
    spaces, original order). Documents with no sentences emit nothing.

    Scale shape: segmentation and token counts are map-side; the only
    shuffle is the per-document window + rollup (both on ``id_col`` —
    one exchange, AQE-coalesced), output ∝ corpus tokens / budget.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    mark = "\x01"
    # explicit whitespace class — Java \s has \x0B, RE2's does not
    # (see operators.text.WS_CLASS_RE); identical Java semantics
    marked = F.regexp_replace(
        F.col(text_col), r"([.!?]+)[ \t\n\x0b\f\r]+", "$1" + mark
    )
    sents = F.filter(
        F.split(marked, mark), lambda s: F.length(F.trim(s)) > 0
    )
    base = (
        docs.select(F.col(id_col), F.posexplode(sents).alias("_i", "sentence"))
        .withColumn("s_toks", token_count(F.col("sentence")).cast("bigint"))
    )
    w = Window.partitionBy(id_col).orderBy("_i")
    chunked = base.withColumn("cum", F.sum("s_toks").over(w)).withColumn(
        "chunk_id",
        F.floor((F.greatest(F.col("cum"), F.lit(1)) - 1) / budget),
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("s_toks").alias("chunk_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "sentence"))),
                    lambda s: s["sentence"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def packing_efficiency_report(
    docs: DataFrame,
    seq_len: int = 32,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Padding-waste planning report for :func:`causal_lm_examples`:
    per group, how many training examples a given ``seq_len`` yields
    and what fraction of label slots would be padding — the metric
    that drives the seq_len / packing-strategy decision BEFORE
    materializing terabytes of examples.

    Mirrors the example-windowing arithmetic exactly: a document with
    ``n`` tokens (``n ≥ 2``) yields ``(n-2) div seq_len + 1`` examples
    covering ``n-1`` real label slots; shorter documents yield nothing
    and are counted as skipped. Everything is BIGINT except the final
    single-division ``pad_fraction`` (NULL for groups with no
    examples), so an independent engine reproduces the report
    bit-for-bit.

    Scale shape: map-only token counting + ONE hash aggregation on the
    bounded group key — a plan whose cost is one corpus scan,
    vs. actually exploding the examples.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    nt = token_count(text_col)
    per_doc = docs.select(
        F.col(group_col),
        nt.cast("bigint").alias("_nt"),
    )
    eligible = F.col("_nt") >= 2
    n_examples_doc = F.when(
        eligible, F.expr(f"(_nt - 2) div {seq_len}") + 1
    ).otherwise(F.lit(0))
    real_doc = F.when(eligible, F.col("_nt") - 1).otherwise(F.lit(0))
    agg = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(eligible, 0).otherwise(1)).alias("n_skipped"),
        F.sum(n_examples_doc).alias("n_examples"),
        F.sum(real_doc).alias("real_tokens"),
    )
    slots = F.col("n_examples") * seq_len
    return agg.select(
        group_col,
        "n_docs",
        "n_skipped",
        "n_examples",
        "real_tokens",
        slots.alias("slot_tokens"),
        F.when(
            slots > 0,
            (slots - F.col("real_tokens")).cast("double")
            / slots.cast("double"),
        ).alias("pad_fraction"),
    )


def causal_lm_examples(
    docs: DataFrame,
    seq_len: int = 32,
    vocab_size: int = 32000,
    pad_id: int = 0,
    ignore_label: int = -100,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Materialize next-token-prediction training examples — the last
    hop from curated text to model batches.

    Tokens map to ids via the portable 60-bit md5 hash mod
    ``vocab_size`` (a stand-in for a real tokenizer vocab: stateless,
    deterministic, oracle-reproducible). Each document's id stream is
    cut into windows of ``seq_len + 1`` at stride ``seq_len`` —
    consecutive windows overlap by ONE token, so every token except a
    document's first is predicted exactly once:

    * ``input_ids`` = window[0 : seq_len], right-padded with
      ``pad_id``;
    * ``labels``    = window[1 : seq_len+1], right-padded with
      ``ignore_label`` (the loss mask convention);
    * ``n_real``    = count of real (unpadded) labels.

    Documents with < 2 tokens yield no examples (nothing to predict).
    Map-only and shuffle-free like :func:`chunk_documents`: windows
    explode where the row lives, output ∝ total tokens / seq_len.

    Caveat: hashed ids cover the FULL [0, vocab_size) range, so
    ``pad_id`` (default 0) can collide with a genuine token id —
    ``n_real`` (not pad scanning) is the authoritative real-position
    count, and ``labels``' ``ignore_label`` (-100, outside any vocab)
    is the unambiguous mask. A deployment with a real tokenizer
    reserves index 0 for padding as usual.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash

    ids = F.transform(
        tokenize(text_col), lambda t: _md5_band_hash(t, seed) % vocab_size
    )
    starts = F.when(
        F.size(ids) >= 2, F.sequence(F.lit(0), F.size(ids) - 2, F.lit(seq_len))
    ).otherwise(F.array().cast("array<int>"))

    def pad_to(arr: F.Column, fill: int) -> F.Column:
        return F.concat(
            arr,
            F.array_repeat(
                F.lit(fill).cast("bigint"),
                F.greatest(F.lit(0), F.lit(seq_len) - F.size(arr)),
            ),
        )

    win = F.slice(F.col("_ids"), F.col("example_start") + 1, seq_len + 1)
    return (
        docs.select(F.col(id_col), ids.alias("_ids"), starts.alias("_starts"))
        .select(id_col, "_ids", F.explode("_starts").alias("_s"))
        .select(
            id_col,
            F.col("_s").cast("bigint").alias("example_start"),
            "_ids",
        )
        .select(id_col, "example_start", win.alias("_win"))
        .select(
            id_col,
            "example_start",
            pad_to(F.slice("_win", 1, seq_len), pad_id).alias("input_ids"),
            pad_to(F.slice(F.col("_win"), 2, seq_len), ignore_label).alias(
                "labels"
            ),
            (F.size("_win") - 1).cast("bigint").alias("n_real"),
        )
    )


def span_corruption(
    docs: DataFrame,
    noise_pct: int = 15,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """T5-style span-corruption (denoising) example construction
    (Raffel et al. 2020, "Exploring the Limits of Transfer Learning"):
    mask a deterministic ~``noise_pct``% of each document's tokens,
    merge CONSECUTIVE masked positions into spans, and emit

    * ``input_text``  — the unmasked tokens with each span replaced by
      its sentinel ``<extra_id_K>`` (K = span index in position order);
    * ``target_text`` — for each span its sentinel followed by the
      masked tokens, closed by the final sentinel ``<extra_id_N>``
      (N = span count; a document with nothing masked yields
      ``<extra_id_0>`` alone and an untouched input).

    The mask decision is the portable md5 hash of (seed, doc, pos) mod
    100 — a pure function of the inputs, so the corruption is
    reproducible across runs and engines (a real pipeline swaps in an
    RNG keyed the same way). Span grouping is the classic islands
    computation: a span starts where ``masked`` rises, the span index
    is the running count of starts.

    Scale shape: tokens explode where the document lives, the
    lag/running-count windows and the re-assembling aggregation all
    key on ``doc_id`` — per-document work bounded by document length,
    shuffle keyed on the id, no global ordering anywhere. Strings
    only: no float arithmetic to diverge.
    """
    if not 0 <= noise_pct <= 100:
        raise ValueError(f"noise_pct must be in [0, 100]: {noise_pct}")
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_grouped_compute_parallelism,
    )

    # keyed compute fan-out BEFORE the tokenize + md5-per-position
    # explode: every downstream window/aggregation keys on doc_id, so
    # hash-partitioning the raw docs here REPLACES the post-explode
    # window exchange (ClusteredDistribution already satisfied) rather
    # than adding one — the operator's single shuffle now carries
    # whole documents instead of exploded tokens, and a
    # single-row-group scan no longer runs the explode on one core
    # (measured 1.11 s → 0.91 s at sf0.1)
    docs = ensure_grouped_compute_parallelism(docs, [id_col], min_parallelism)

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    )
    masked = (
        _md5_band_hash(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("pos").cast("string")),
            seed,
        )
        % 100
        < noise_pct
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = (
        toks.withColumn("m", masked)
        .withColumn(
            "is_start",
            F.col("m") & ~F.coalesce(F.lag("m").over(w), F.lit(False)),
        )
        .withColumn(
            "span_idx", F.sum(F.col("is_start").cast("int")).over(run) - 1
        )
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("span_idx").cast("string"), F.lit(">")
    )
    in_piece = F.when(~F.col("m"), F.col("tok")).when(
        F.col("is_start"), sentinel
    )  # masked non-start positions contribute nothing to the input
    tgt_piece = F.when(
        F.col("is_start"), F.concat(sentinel, F.lit(" "), F.col("tok"))
    ).when(F.col("m"), F.col("tok"))
    join_pieces = lambda c: F.concat_ws(  # noqa: E731 — local plumbing
        " ",
        F.transform(
            F.sort_array(F.collect_list(c)), lambda s: s.getField("p")
        ),
    )
    agg = t.groupBy(id_col).agg(
        join_pieces(
            F.when(
                in_piece.isNotNull(), F.struct(F.col("pos"), in_piece.alias("p"))
            )
        ).alias("input_text"),
        join_pieces(
            F.when(
                tgt_piece.isNotNull(),
                F.struct(F.col("pos"), tgt_piece.alias("p")),
            )
        ).alias("_tgt_body"),
        F.sum(F.col("is_start").cast("int")).alias("n_spans"),
        F.sum(F.col("m").cast("int")).alias("n_masked"),
    )
    closing = F.concat(
        F.lit("<extra_id_"), F.col("n_spans").cast("string"), F.lit(">")
    )
    return agg.select(
        id_col,
        "input_text",
        F.when(F.col("_tgt_body") == "", closing)
        .otherwise(F.concat(F.col("_tgt_body"), F.lit(" "), closing))
        .alias("target_text"),
        "n_spans",
        "n_masked",
    )


#: FIM sentinels (public convention from the OpenAI FIM paper /
#: SantaCoder-class code models; literals shared verbatim with SQL).
FIM_PRE = "<fim_prefix>"
FIM_SUF = "<fim_suffix>"
FIM_MID = "<fim_middle>"


def fim_transform(
    docs: DataFrame,
    fim_pct: int = 50,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    for a deterministic ``fim_pct``% of documents, split the token
    stream at two hash-chosen cut points into (prefix, middle, suffix)
    and re-render in PSM order —
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M`` — so an
    autoregressive model learns infilling; the rest pass through
    unchanged (``mode = 'raw'``). Documents under 3 tokens are never
    transformed (no interior to cut).

    Cut-point derivation (all exact integer arithmetic on the portable
    md5 hash — a pure function of (id, seed), engine-reproducible):
    prefix length ``a = 1 + h1 mod (n-1)`` (1..n-1), middle length
    ``m = h2 mod (n-a+1)`` (0..n-a), suffix the remainder.

    Scale shape: one codegen projection over the scan — tokenization,
    slicing, and re-rendering are all map-side; ZERO shuffles at any
    corpus size. The token array is let-bound (``_bind``) so it is
    computed once per row, not once per derived column.
    """
    if not 0 <= fim_pct <= 100:
        raise ValueError(f"fim_pct must be in [0, 100]: {fim_pct}")
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash
    from etl_global_mobility_spark.operators.text import _bind

    sid = F.col(id_col).cast("string")
    pick = _md5_band_hash(sid, seed) % 100 < fim_pct
    h1 = _md5_band_hash(F.concat(sid, F.lit(":a")), seed)
    h2 = _md5_band_hash(F.concat(sid, F.lit(":m")), seed)

    def render(ts):
        n = F.size(ts)
        a = (F.lit(1) + h1 % (n - 1)).cast("int")
        m = (h2 % (n - a + 1)).cast("int")
        prefix = F.concat_ws(" ", F.slice(ts, 1, a))
        middle = F.concat_ws(" ", F.slice(ts, a + 1, m))
        suffix = F.concat_ws(" ", F.slice(ts, a + m + 1, n - a - m))
        fim = F.concat(
            F.lit(FIM_PRE + " "), prefix,
            F.lit(" " + FIM_SUF + " "), suffix,
            F.lit(" " + FIM_MID + " "), middle,
        )
        do_fim = pick & (n >= 3)
        return F.struct(
            F.when(do_fim, fim)
            .otherwise(F.concat_ws(" ", ts))
            .alias("out_text"),
            F.when(do_fim, F.lit("psm")).otherwise(F.lit("raw")).alias("mode"),
            F.when(do_fim, a).otherwise(n.cast("int")).alias("n_prefix"),
            F.when(do_fim, m).otherwise(F.lit(0)).alias("n_middle"),
            F.when(do_fim, (n - a - m).cast("int"))
            .otherwise(F.lit(0))
            .alias("n_suffix"),
        )

    s = _bind(tokenize(F.col(text_col)), render)
    return docs.select(F.col(id_col), s.alias("_s")).select(
        id_col, "_s.out_text", "_s.mode", "_s.n_prefix", "_s.n_middle",
        "_s.n_suffix",
    )
