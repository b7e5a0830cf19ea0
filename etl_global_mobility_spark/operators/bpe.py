"""Distributed BPE (byte-pair-encoding) tokenizer training + application.

The classic Sennrich et al. 2016 algorithm (arXiv:1508.07909), shaped
for Spark the way a 100 TB corpus demands:

* ONE corpus-sized shuffle builds the word-frequency table (distinct
  words ≪ corpus tokens — the only stage that touches raw text);
* every merge iteration then runs on the vocab-sized table only:
  adjacent-pair counts are a frequency-weighted explode + hash agg,
  the winning pair is a bounded 1-row collect, and the merge rewrite
  is a pure array fold — no Python in the loop;
* the trained artifact (``n_merges`` ranked pairs) is tiny and
  broadcastable, so application is an Arrow-batched map over raw text.

Variant notes: symbols are characters with no end-of-word marker
(GPT-2-style per-word merging; words come from the engine's standard
whitespace tokenizer) and ties in pair frequency break
deterministically by (count DESC, left ASC, right ASC) so training is
reproducible on any cluster layout.
"""

from __future__ import annotations

import re

import pandas as pd  # module-level: pandas_udf resolves the (stringified
# by `from __future__ import annotations`) type hints from module globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.parallelism import driver_rows_df
from etl_global_mobility_spark.operators.text import tokenize


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the one
    corpus-sized stage of BPE training."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(symbols: F.Column) -> F.Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for len<2)."""
    n = F.size(symbols)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(symbols, 1, n - 1),
            F.slice(symbols, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_pair(symbols: F.Column, left: str, right: str) -> F.Column:
    """Replace every non-overlapping adjacent (left, right) with the
    concatenation, leftmost-first — the BPE merge step as a pure fold
    (no UDF): carry the rebuilt array and greedily join when the
    previous kept symbol is ``left`` and the current is ``right``."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 20,
    min_freq: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Train a ranked BPE merge list on the corpus.

    Returns up to ``n_merges`` (left, right) pairs in merge order;
    training stops early when the best remaining pair's weighted
    frequency drops below ``min_freq``. The returned artifact is the
    ONLY data that ever reaches the driver (1 row per iteration) —
    the word table stays distributed and is re-materialized each
    iteration (``localCheckpoint``) so the iterative plan never
    deepens.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive: {n_merges}")
    words = (
        word_frequencies(docs, text_col)
        .select(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ).alias("symbols"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            words.select(F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()  # bounded: exactly one row
        )
        if not best or best[0]["n"] < min_freq:
            break
        left, right = best[0]["p"]["l"], best[0]["p"]["r"]
        merges.append((left, right))
        words = words.select(
            _merge_pair(F.col("symbols"), left, right).alias("symbols"), "freq"
        ).localCheckpoint()
        # The superseded checkpoint's blocks are reclaimed by the
        # ContextCleaner once the old DataFrame is garbage-collected
        # (rebinding `words` drops the last reference). DataFrame
        # .unpersist() would NOT release them — localCheckpoint blocks
        # belong to the underlying RDD, not the CacheManager.
    return merges


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a trained merge list and count BPE tokens per document.

    The merge table is tiny (``n_merges`` rows) and ships as a plain
    Python closure into an Arrow-batched ``pandas_udf`` — the
    dictionary-driven greedy merge loop is genuinely imperative
    (GPT-2's ``bpe()`` shape), so this is the intended Python-UDF use
    case: per-batch vectorized transfer, per-token cached merging.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> int:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
            if not ranked:
                break
            rank, _ = min(ranked)
            left, right = merges[rank]
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = len(syms)
        return len(syms)

    # Split EXACTLY like tokenize()'s Java regex `\s+` (ASCII whitespace
    # only): Python str.split() would also break on Unicode spaces
    # (NBSP, ideographic space...), segmenting web text into different
    # words than the merge list was trained on.
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("long")
    def count_bpe(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        def one(t):
            if t is None:
                return 0
            return sum(
                encode_word(w, cache)
                for w in java_ws.split(t.lower())
                if w
            )
        return texts.map(one)

    return docs.withColumn(out_col, count_bpe(F.col(text_col)))


def save_bpe_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a trained merge list as rank-ordered parquet (+ count in
    a JSON manifest) — the tokenizer artifact a training pipeline
    trains once and every downstream job loads. KB-sized by
    construction (vocab-scale, never corpus-scale)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    rows = [(i, l, r) for i, (l, r) in enumerate(merges)]
    driver_rows_df(
        spark, rows, "rank int, left string, right string"
    ).write.mode("overwrite").parquet(os.path.join(path, "merges"))
    with open(os.path.join(path, "_bpe_manifest.json"), "w") as f:
        json.dump({"n_merges": len(merges)}, f)


def load_bpe_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a merge list saved by :func:`save_bpe_merges`, in training
    order, validated against the manifest."""
    import json
    import os

    with open(os.path.join(path, "_bpe_manifest.json")) as f:
        n = json.load(f)["n_merges"]
    rows = (
        spark.read.parquet(os.path.join(path, "merges"))
        .orderBy("rank")
        .collect()
    )
    if len(rows) != n:
        raise ValueError(f"merge artifact has {len(rows)} rows, manifest says {n}")
    return [(r.left, r.right) for r in rows]
