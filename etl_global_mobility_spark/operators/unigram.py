"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

Kudo's subword regularization trainer (arXiv:1804.10959 §3.2): seed a
candidate piece vocabulary from frequent substrings, fit piece
probabilities with EM over the segmentation lattice (forward-backward
expected counts — soft EM, not Viterbi hard assignment), and prune the
vocabulary down to the target size between EM rounds. This is the
principled contrast to BPE (operators/bpe.py): BPE grows a vocabulary
bottom-up by greedy merges; the unigram LM starts from a superset and
shrinks it top-down under a probabilistic objective.

Shaped for Spark the way a 100 TB corpus demands, mirroring the BPE
trainer's structure:

* ONE corpus-sized shuffle builds the word-frequency table (distinct
  words ≪ corpus tokens — the only stage that touches raw text);
* seeding is a vocab-table-scale substring explode + hash aggregation
  (no Python); the trainer then restricts EM to the ``max_words`` most
  frequent words — the head carries the probability mass, and capping
  the lattice work is standard practice (SentencePiece itself
  subsamples input sentences via ``input_sentence_size``);
* each E-step is an Arrow-batched ``pandas_udf`` over the word table
  (the per-word forward-backward DP is genuinely imperative — the
  intended Python escape hatch), aggregated as DECIMAL(38,18) so the
  freq-weighted expected-count sums are EXACT and order-independent:
  training produces bit-identical vocabularies on any partition
  layout, which is what makes the artifact reference-testable;
* the M-step and prune run on the driver over the collected
  piece-count table (bounded: vocab-scale rows, like the k-means
  centroid and BPE merge collects);
* the trained artifact (ranked pieces + log-probabilities) is tiny
  and broadcastable; application is an Arrow-batched Viterbi map.

Variant notes (documented deviations from the paper): pruning drops
the lowest expected-count pieces (the common approximation of the
paper's per-piece likelihood-delta criterion, which needs a second
Viterbi pass per candidate); single-character pieces are never pruned
(as in the paper) so every training word stays segmentable; words come
from the engine's standard whitespace tokenizer (operators/text.py),
matching the BPE trainer.
"""

from __future__ import annotations

import math
import re

import pandas as pd  # module-level: pandas_udf resolves the (stringified
# by `from __future__ import annotations`) type hints from module globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.bpe import word_frequencies
from etl_global_mobility_spark.operators.parallelism import driver_rows_df

NEG_INF = float("-inf")


def _logadd(a: float, b: float) -> float:
    """log(exp(a) + exp(b)) without overflow; the serial fold both the
    distributed E-step and the test reference share, so accumulation
    order is part of the contract (callers fold in ascending position
    order)."""
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def word_lattice_expected_counts(
    word: str, logp: dict[str, float], max_piece_len: int
) -> tuple[dict[str, float], float]:
    """Forward-backward over one word's segmentation lattice.

    Returns ``(expected_counts, log_likelihood)``: the expected number
    of times each vocabulary piece is used across ALL segmentations of
    ``word`` under the current unigram model, and log P(word). The DP
    is serial and deterministic — alpha fills positions left to right
    folding start positions in ascending order, beta right to left
    folding end positions in ascending order — so one word always
    yields bit-identical doubles regardless of which executor runs it.
    A word containing a character outside the vocabulary has no path:
    returns ``({}, -inf)`` (cannot happen during training, where every
    corpus character is seeded)."""
    n = len(word)
    alpha = [NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = NEG_INF
        for i in range(max(0, j - max_piece_len), j):
            lp = logp.get(word[i:j])
            if lp is not None and alpha[i] != NEG_INF:
                acc = _logadd(acc, alpha[i] + lp)
        alpha[j] = acc
    z = alpha[n]
    if z == NEG_INF:
        return {}, NEG_INF
    beta = [NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG_INF
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] != NEG_INF:
                acc = _logadd(acc, lp + beta[j])
        beta[i] = acc
    counts: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == NEG_INF:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] != NEG_INF:
                c = math.exp(alpha[i] + lp + beta[j] - z)
                piece = word[i:j]
                counts[piece] = counts.get(piece, 0.0) + c
    return counts, z


def word_viterbi_pieces(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Single best segmentation of ``word`` (ties broken toward the
    LONGEST final piece, then recursively — deterministic). Characters
    outside the vocabulary segment as themselves (single-char
    fallback), so application never fails on unseen text."""
    n = len(word)
    best = [NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    fallback = min(logp.values()) - 10.0 if logp else -10.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            if best[i] == NEG_INF:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None and j - i == 1:
                lp = fallback  # unseen character: penalized singleton
            if lp is None:
                continue
            score = best[i] + lp
            # >= : later (smaller) i wins ties -> longest final piece
            if score >= best[j]:
                best[j] = score
                back[j] = i
    pieces: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces


def seed_piece_stats(
    docs: DataFrame,
    max_piece_len: int = 4,
    min_freq: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(piece, piece_freq) — frequency-weighted counts of every word
    substring up to ``max_piece_len`` characters, the candidate table
    the unigram trainer seeds its vocabulary from (Kudo §3.2 seeds
    from frequent substrings; an exact count table is the tractable
    equivalent of the paper's suffix-array top-k at these piece
    lengths). Runs on the word-frequency table, never the raw corpus:
    the substring explode is vocab-scale × O(word_len · max_piece_len)
    and fully JVM-side."""
    return _seed_from_words(
        word_frequencies(docs, text_col), max_piece_len, min_freq
    )


def _seed_from_words(
    wf: DataFrame, max_piece_len: int, min_freq: int
) -> DataFrame:
    """The substring-count aggregation over an existing (word, freq)
    table — shared by the public stats query (full word table) and the
    trainer (its ``max_words``-capped table)."""
    pieces = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(
                            F.lit(max_piece_len), F.length("word") - i + 1
                        ),
                    ),
                    lambda ln: F.col("word").substr(i, ln),
                ),
            )
        )
    )
    return (
        wf.select(pieces.alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("piece_freq"))
        .filter(F.col("piece_freq") >= min_freq)
    )


def _em_expected_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """One distributed E-step: per-word forward-backward in an
    Arrow-batched UDF (counts pre-weighted by word frequency in DOUBLE
    — per-word, so deterministic), then an order-independent
    DECIMAL(38,18) sum per piece. The vocabulary ships as a plain
    closure (vocab-scale, broadcast-sized)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<piece:string,cnt:double>>")
    def ec(word_s: pd.Series, freq_s: pd.Series) -> pd.Series:
        out = []
        for word, freq in zip(word_s, freq_s):
            counts, _z = word_lattice_expected_counts(
                word, logp, max_piece_len
            )
            f = float(freq)
            out.append(
                [(p, c * f) for p, c in sorted(counts.items())]
            )
        return pd.Series(out)

    return (
        words.select(F.explode(ec("word", "freq")).alias("e"))
        .groupBy(F.col("e.piece").alias("piece"))
        .agg(
            F.sum(F.col("e.cnt").cast("decimal(38,18)")).alias("cnt")
        )
    )


def _cast_decimal18(x: float) -> "object":
    """Mirror Spark's CAST(double AS DECIMAL(38,18)) bit-for-bit:
    shortest decimal representation (Java's Double.toString and
    Python's repr agree on it), then scale-18 HALF_UP — the exact
    per-element quantization the distributed E-step's
    ``sum(cnt.cast("decimal(38,18)"))`` applies, so the single-task
    fast path's Decimal sums equal the distributed aggregation.

    JDK caveat (ADVICE r14): the "Java and Python agree" premise holds
    for the shortest-repr algorithm (JDK-4511638, fixed in JDK 19+).
    On JDK 17 the legacy FloatingDecimal can emit MORE digits than the
    shortest repr for rare doubles, which can move the scale-18
    HALF_UP result by 1 ulp at 1e-18. Spark 4 ships on JDK 17+, and
    this repo's supported runtime for the pinned-bit-identical
    guarantee is JDK 19+; on JDK 17 the fast≡distributed equality is
    exact-to-1e-18-ulp rather than bitwise (no corpus query's oracle
    depends on the difference — both paths quantize BEFORE the
    order-independent Decimal sum, so the 1-ulp case would shift both
    engines' inputs identically only when the same double appears;
    the equality tests pin the property on the test JDK)."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(float(x))).quantize(
        Decimal("1e-18"), rounding=ROUND_HALF_UP
    )


def _train_single_task(
    words: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int,
    seed_size: int,
    em_iters: int,
    max_rounds: int,
    shrink: float,
    min_freq: int,
) -> list[tuple[str, float]]:
    """Driver-side seed + EM over an already-capped (word, freq) list —
    the single-task fast path of :func:`train_unigram_lm`. Every stage
    mirrors its distributed twin exactly: integer char/substring sums,
    (count DESC, piece ASC) seed ranking, per-word double expected
    counts from the SHARED lattice DP, :func:`_cast_decimal18`
    quantization before the (order-independent) Decimal sums, and the
    shared ``_m_step`` / ``_prune``. Pinned row-identical to the
    distributed path by tests/test_unigram.py."""
    from decimal import Decimal

    chars: dict[str, int] = {}
    sub: dict[str, int] = {}
    for w, f in words:
        for i in range(len(w)):
            chars[w[i]] = chars.get(w[i], 0) + f
            for ln in range(2, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + ln]
                sub[p] = sub.get(p, 0) + f
    multi = sorted(
        ((p, c) for p, c in sub.items() if c >= min_freq),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    if not chars and not multi:
        return []
    init = dict(chars)
    init.update(dict(multi))
    total = sum(init.values())
    logp = {p: math.log(c / total) for p, c in init.items()}

    for _ in range(max_rounds):
        for _ in range(em_iters):
            counts: dict[str, "object"] = {}
            for w, f in words:
                ec, _z = word_lattice_expected_counts(w, logp, max_piece_len)
                for p, c in ec.items():
                    counts[p] = counts.get(p, Decimal(0)) + _cast_decimal18(
                        c * float(f)
                    )
            logp = _m_step(counts)
        n_multi = sum(1 for p in logp if len(p) > 1)
        if n_multi <= vocab_size:
            break
        logp = _prune(logp, counts, vocab_size, shrink)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def _m_step(counts: dict[str, "object"]) -> dict[str, float]:
    """Normalize exact Decimal expected counts into log-probabilities.
    Driver-side, vocab-scale; float conversion is correctly rounded,
    so the result is reproducible from the same count table."""
    total = sum(counts.values())
    ft = float(total)
    return {
        p: math.log(float(c) / ft) for p, c in counts.items() if c > 0
    }


def _prune(
    logp: dict[str, float],
    counts: dict[str, "object"],
    target_multi: int,
    shrink: float,
) -> dict[str, float]:
    """Drop the lowest expected-count MULTI-character pieces, keeping
    at least ``target_multi`` and shrinking by at most ``shrink`` per
    round; single characters are never pruned (every word must stay
    segmentable — Kudo §3.2). Ties break by piece ascending."""
    multi = [p for p in logp if len(p) > 1]
    if len(multi) <= target_multi:
        return logp
    keep_n = max(target_multi, int(len(multi) * shrink))
    ranked = sorted(
        multi, key=lambda p: (-float(counts.get(p, 0)), p)
    )
    kept = set(ranked[:keep_n])
    return {p: lp for p, lp in logp.items() if len(p) == 1 or p in kept}


def train_unigram_lm(
    docs: DataFrame,
    vocab_size: int = 64,
    max_piece_len: int = 4,
    seed_size: int = 96,
    em_iters: int = 2,
    max_rounds: int = 4,
    shrink: float = 0.75,
    min_freq: int = 2,
    max_words: int = 10_000,
    text_col: str = "text",
) -> list[tuple[str, float]]:
    """Train a unigram-LM piece vocabulary on the corpus.

    Returns the final vocabulary as ``(piece, logprob)`` ranked by
    (probability DESC, piece ASC) — ``vocab_size`` bounds the number
    of MULTI-character pieces (single characters always survive, as in
    the paper, so the total can exceed it on diverse alphabets).

    The loop: seed from :func:`seed_piece_stats` (top ``seed_size``
    multi-char candidates by weighted count, plus every corpus
    character), then alternate ``em_iters`` distributed EM rounds with
    an expected-count prune until the multi-char vocabulary fits.
    Only vocab-scale tables ever reach the driver: the seed top-k, and
    one (piece, count) row per vocabulary entry per E-step. The word
    table is localCheckpoint'd once — the EM loop re-reads a flat
    materialization, never a deepening plan."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive: {vocab_size}")
    from etl_global_mobility_spark.operators.parallelism import (
        SINGLE_TASK_MAX_WORDS,
    )

    capped = (
        word_frequencies(docs, text_col)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
    )
    if max_words <= SINGLE_TASK_MAX_WORDS:
        # Single-task fast path: the EM table is bounded by the
        # CALLER's max_words cap (parameter, not data — no count job
        # needed), so collect it once and run seed + EM driver-side:
        # ONE Spark job instead of ~9 (checkpoint, char/seed collects,
        # and an Arrow E-step + DECIMAL agg + collect per EM iter),
        # whose per-job scheduling dominates at this table size. Same
        # words, same arithmetic (see _train_single_task), same
        # result — pinned bit-identical by tests/test_unigram.py.
        rows = capped.collect()  # bounded: <= max_words rows
        return _train_single_task(
            [(r.word, int(r.freq)) for r in rows],
            vocab_size,
            max_piece_len,
            seed_size,
            em_iters,
            max_rounds,
            shrink,
            min_freq,
        )
    words = capped.localCheckpoint()
    # Seed from the SAME capped word table EM will run on (the
    # sequential reference mirrors this exactly): every character with
    # its freq-weighted count (no min_freq — the alphabet must be
    # complete over the training words or rare-char words lose their
    # lattice path), plus the top ``seed_size`` multi-char substrings.
    chars = {
        r.piece: int(r.cnt)
        for r in words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.col("word").substr(i, F.lit(1)),
                )
            ).alias("piece"),
            "freq",
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .collect()  # bounded: alphabet-scale
    }
    multi = [
        (r.piece, int(r.piece_freq))
        for r in _seed_from_words(words, max_piece_len, min_freq)
        .filter(F.length("piece") >= 2)
        .orderBy(F.col("piece_freq").desc(), F.col("piece").asc())
        .limit(seed_size)
        .collect()  # bounded: seed_size rows
    ]
    if not chars and not multi:
        return []
    init = dict(chars)
    init.update(dict(multi))
    total = sum(init.values())
    logp = {p: math.log(c / total) for p, c in init.items()}

    target_multi = vocab_size
    for _ in range(max_rounds):
        for _ in range(em_iters):
            rows = _em_expected_counts(
                words, logp, max_piece_len
            ).collect()  # bounded: one row per vocabulary piece
            counts = {r.piece: r.cnt for r in rows}
            logp = _m_step(counts)
        n_multi = sum(1 for p in logp if len(p) > 1)
        if n_multi <= target_multi:
            break
        logp = _prune(logp, counts, target_multi, shrink)
    ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked


def unigram_token_count(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    max_piece_len: int = 4,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Apply a trained unigram vocabulary: Viterbi-segment each word
    and count pieces per document (the fertility measure training
    pipelines budget by). The vocabulary ships as a closure into an
    Arrow-batched ``pandas_udf`` with a per-batch word cache; unseen
    characters fall back to penalized singletons, so the count is
    total on any text. Splits words EXACTLY like tokenize()'s Java
    ``\\s+`` (ASCII whitespace only) — see the BPE twin's note."""
    from pyspark.sql.functions import pandas_udf

    logp = dict(vocab)
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("long")
    def count_pieces(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def word_n(w: str) -> int:
            got = cache.get(w)
            if got is None:
                got = len(word_viterbi_pieces(w, logp, max_piece_len))
                cache[w] = got
            return got

        def one(t):
            if t is None:
                return 0
            return sum(
                word_n(w) for w in java_ws.split(t.lower()) if w
            )

        return texts.map(one)

    return docs.withColumn(out_col, count_pieces(F.col(text_col)))


def save_unigram_vocab(
    spark, vocab: list[tuple[str, float]], path: str
) -> None:
    """Persist a trained vocabulary as rank-ordered parquet + JSON
    manifest — the same train-once/load-anywhere artifact shape as
    :func:`~etl_global_mobility_spark.operators.bpe.save_bpe_merges`.
    KB-sized by construction (vocab-scale, never corpus-scale)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    rows = [(i, p, lp) for i, (p, lp) in enumerate(vocab)]
    driver_rows_df(
        spark, rows, "rank int, piece string, logprob double"
    ).write.mode("overwrite").parquet(os.path.join(path, "vocab"))
    with open(os.path.join(path, "_unigram_manifest.json"), "w") as f:
        json.dump({"n_pieces": len(vocab)}, f)


def load_unigram_vocab(spark, path: str) -> list[tuple[str, float]]:
    """Load a vocabulary saved by :func:`save_unigram_vocab`, in rank
    order, validated against the manifest."""
    import json
    import os

    with open(os.path.join(path, "_unigram_manifest.json")) as f:
        n = json.load(f)["n_pieces"]
    rows = (
        spark.read.parquet(os.path.join(path, "vocab"))
        .orderBy("rank")
        .collect()
    )
    if len(rows) != n:
        raise ValueError(
            f"unigram artifact has {len(rows)} rows, manifest says {n}"
        )
    return [(r.piece, r.logprob) for r in rows]
