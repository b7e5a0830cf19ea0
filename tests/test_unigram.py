"""Unigram-LM (SentencePiece-style) tokenizer trainer tests
(operators/unigram.py, Kudo arXiv:1804.10959).

Test strategy mirrors the BPE trainer's: the per-word forward-backward
DP is pinned against hand-computed lattice math, and the DISTRIBUTED
machinery (word-frequency shuffle, substring seeding, Arrow E-step,
DECIMAL-exact aggregation) is pinned against a sequential driver-side
reference that shares only the deliberately-serial pieces
(word_lattice_expected_counts / _m_step / _prune) — the sequential
reference replaces every Spark stage with pure-Python equivalents, so
a drift in any distributed stage breaks the equality.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest


def _dec18(x: float) -> Decimal:
    """Mirror Spark's CAST(double AS DECIMAL(38,18)): shortest decimal
    repr (Java Double.toString == Python repr for the value), then
    scale-18 HALF_UP."""
    return Decimal(repr(float(x))).quantize(
        Decimal("1e-18"), rounding=ROUND_HALF_UP
    )


def test_word_expected_counts_hand_computed():
    """Word 'ab' under vocab {a, b, ab}: two segmentations.
    Z = log(exp(la+lb) + exp(lab)); E[ab] = P(ab-path), E[a] = E[b] =
    P(a·b-path)."""
    from etl_global_mobility_spark.operators.unigram import (
        word_lattice_expected_counts,
    )

    la, lb, lab = math.log(0.5), math.log(0.3), math.log(0.2)
    logp = {"a": la, "b": lb, "ab": lab}
    counts, z = word_lattice_expected_counts("ab", logp, max_piece_len=2)
    z_want = math.log(math.exp(la + lb) + math.exp(lab))
    assert z == pytest.approx(z_want, abs=1e-12)
    p_split = math.exp(la + lb - z)
    p_whole = math.exp(lab - z)
    assert counts["a"] == pytest.approx(p_split, abs=1e-12)
    assert counts["b"] == pytest.approx(p_split, abs=1e-12)
    assert counts["ab"] == pytest.approx(p_whole, abs=1e-12)
    assert p_split + p_whole == pytest.approx(1.0, abs=1e-12)

    # unsegmentable word (char outside vocab): no path
    counts, z = word_lattice_expected_counts("ax", logp, max_piece_len=2)
    assert counts == {} and z == float("-inf")


def test_seed_piece_stats_hand_computed(spark):
    """'abab ab' twice: substring counts are freq-weighted and capped
    at max_piece_len."""
    from etl_global_mobility_spark.operators.unigram import seed_piece_stats

    df = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab ab")], "doc_id long, text string"
    )
    got = {
        r.piece: r.piece_freq
        for r in seed_piece_stats(df, max_piece_len=3, min_freq=2).collect()
    }
    # words: abab (freq 2), ab (freq 2)
    # 'a': 2*2 + 1*2 = 6; 'ab': 2*2 + 1*2 = 6; 'aba': 1*2 = 2;
    # 'bab': 1*2 = 2; 'b': 6; 'ba': 2
    assert got == {"a": 6, "b": 6, "ab": 6, "ba": 2, "aba": 2, "bab": 2}


def _reference_train(
    texts: list[str],
    vocab_size: int,
    max_piece_len: int,
    seed_size: int,
    em_iters: int,
    max_rounds: int,
    shrink: float,
    min_freq: int,
    max_words: int,
) -> list[tuple[str, float]]:
    """Sequential mirror of train_unigram_lm: every distributed stage
    replaced by pure Python — word counting, word cap, substring
    seeding, and the freq-weighted DECIMAL(38,18) expected-count sums
    (quantized per word exactly like Spark's double→decimal cast)."""
    from etl_global_mobility_spark.operators.unigram import (
        _m_step,
        _prune,
        word_lattice_expected_counts,
    )

    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    words = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]

    chars: dict[str, int] = {}
    sub: dict[str, int] = {}
    for w, f in words:
        for i in range(len(w)):
            chars[w[i]] = chars.get(w[i], 0) + f
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + ln]
                sub[p] = sub.get(p, 0) + f
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1 and c >= min_freq),
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
            counts: dict[str, Decimal] = {}
            for w, f in words:
                ec, _z = word_lattice_expected_counts(w, logp, max_piece_len)
                for p, c in ec.items():
                    counts[p] = counts.get(p, Decimal(0)) + _dec18(
                        c * float(f)
                    )
            logp = _m_step(counts)
        n_multi = sum(1 for p in logp if len(p) > 1)
        if n_multi <= vocab_size:
            break
        logp = _prune(logp, counts, vocab_size, shrink)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "low new lower newer",
    "widest wide wider wide wide",
    "lowest newest widest newest",
]

PARAMS = dict(
    vocab_size=6,
    max_piece_len=3,
    seed_size=12,
    em_iters=2,
    max_rounds=3,
    shrink=0.75,
    min_freq=2,
    max_words=100,
)


def test_unigram_training_matches_sequential_reference(spark, monkeypatch):
    """BOTH execution paths — the default single-task fast path
    (collect the capped word table, EM on the driver) and the
    distributed E-step (pinned by monkeypatching the fast-path
    threshold to 0) — must equal this module's independent sequential
    reference EXACTLY."""
    import etl_global_mobility_spark.operators.parallelism as par
    from etl_global_mobility_spark.operators.unigram import train_unigram_lm

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    want = _reference_train(TEXTS, **PARAMS)
    got_fast = train_unigram_lm(df, **PARAMS)
    monkeypatch.setattr(par, "SINGLE_TASK_MAX_WORDS", 0)
    got_dist = train_unigram_lm(df, **PARAMS)
    # logprobs are EXACT on both paths: identical serial per-word
    # doubles, identical decimal quantization (Spark's double→decimal
    # cast mirrored by _cast_decimal18), order-independent decimal
    # sums, identical driver-side M-step arithmetic
    assert got_fast == want
    assert got_dist == want
    assert any(len(p) > 1 for p, _ in got_fast)  # it actually learned
    n_multi = sum(1 for p, _ in got_fast if len(p) > 1)
    assert n_multi <= PARAMS["vocab_size"]


@pytest.mark.slow
def test_unigram_training_is_partition_invariant(spark, monkeypatch):
    """The DECIMAL(38,18) E-step aggregation makes training
    bit-identical on any partition layout — the property that lets a
    persisted vocabulary be reproduced by an independent run. Pins the
    DISTRIBUTED path (threshold → 0): the fast path is trivially
    layout-free."""
    import etl_global_mobility_spark.operators.parallelism as par
    from etl_global_mobility_spark.operators.unigram import train_unigram_lm

    monkeypatch.setattr(par, "SINGLE_TASK_MAX_WORDS", 0)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    a = train_unigram_lm(df.repartition(7), **PARAMS)
    b = train_unigram_lm(df.coalesce(1), **PARAMS)
    assert a == b


def test_unigram_artifact_roundtrip(spark, tmp_path):
    from etl_global_mobility_spark.operators.unigram import (
        load_unigram_vocab,
        save_unigram_vocab,
        train_unigram_lm,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    vocab = train_unigram_lm(df, **PARAMS)
    path = str(tmp_path / "unigram_artifact")
    save_unigram_vocab(spark, vocab, path)
    assert load_unigram_vocab(spark, path) == vocab

    # manifest validation: a truncated vocab table is rejected
    import json
    import os

    with open(os.path.join(path, "_unigram_manifest.json"), "w") as f:
        json.dump({"n_pieces": len(vocab) + 1}, f)
    with pytest.raises(ValueError, match="manifest"):
        load_unigram_vocab(spark, path)


def test_unigram_token_count_applies_trained_vocab(spark):
    """Trained pieces compress repeated substrings below the char
    count; unseen characters fall back to singletons; NULL-safe; and
    word segmentation matches tokenize()'s ASCII-whitespace split
    (NBSP stays inside a word — the BPE twin's round-4 advice)."""
    from etl_global_mobility_spark.operators.unigram import (
        train_unigram_lm,
        unigram_token_count,
    )

    df = spark.createDataFrame(
        [(1, "abab abab abab ab"), (2, "zq")], "doc_id long, text string"
    )
    vocab = train_unigram_lm(
        df, vocab_size=4, max_piece_len=3, seed_size=8,
        em_iters=2, max_rounds=2, min_freq=2,
    )
    out = {
        r.doc_id: r.unigram_tokens
        for r in unigram_token_count(df, vocab, max_piece_len=3).collect()
    }
    assert out[1] < 3 * 4 + 2  # 'abab' words compress below char count
    assert out[2] == 2  # unseen 'zq' falls back to two singletons
    df2 = spark.createDataFrame([(3, None)], "doc_id long, text string")
    assert (
        unigram_token_count(df2, vocab, max_piece_len=3)
        .collect()[0]
        .unigram_tokens
        == 0
    )
    # NBSP inside a word: ASCII split sees words ['a b', 'c'];
    # with an empty vocab every char is a singleton: 3 + 1 = 4
    df3 = spark.createDataFrame([(4, "a b c")], "doc_id long, text string")
    assert (
        unigram_token_count(df3, [], max_piece_len=3)
        .collect()[0]
        .unigram_tokens
        == 4
    )


def test_unigram_train_empty_corpus_returns_empty_vocab(spark):
    from etl_global_mobility_spark.operators.unigram import train_unigram_lm

    df = spark.createDataFrame([], "doc_id long, text string")
    assert train_unigram_lm(df, **PARAMS) == []
