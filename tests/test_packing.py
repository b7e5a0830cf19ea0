"""Unit tests for sequence packing, chunking, and segment-level
boilerplate dedup (the oracle gate covers end-to-end parity; these pin
the operator semantics on hand-built edge cases)."""

from __future__ import annotations

import pytest

from etl_global_mobility_spark.operators.dedup import strip_boilerplate
from etl_global_mobility_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_pack_sequences_budget_boundaries(spark):
    # 4 tokens each, budget 8: docs pack pairwise into sequences 0,0,1,1.
    rows = [(i, "a b c d", "s") for i in range(4)]
    out = pack_sequences(_docs(spark, rows), budget=8).orderBy("doc_id").collect()
    assert [r.seq_id for r in out] == [0, 0, 1, 1]
    assert [r.cum_tokens for r in out] == [4, 8, 12, 16]


def test_pack_sequences_doc_spanning_boundary_lands_in_ending_seq(spark):
    # 5-token doc after 6 tokens with budget 8: tokens 7-11 span the
    # 8-token cut; the doc belongs to the sequence of its LAST token.
    rows = [(0, "a b c d e f", "s"), (1, "a b c d e", "s")]
    out = pack_sequences(_docs(spark, rows), budget=8).orderBy("doc_id").collect()
    assert [r.seq_id for r in out] == [0, 1]


def test_pack_sequences_empty_doc_attaches_to_current_seq(spark):
    rows = [(0, "", "s"), (1, "a b", "s")]
    out = pack_sequences(_docs(spark, rows), budget=8).orderBy("doc_id").collect()
    assert [r.n_tokens for r in out] == [0, 2]
    assert [r.seq_id for r in out] == [0, 0]  # no negative seq for empty head


def test_pack_sequences_shards_are_independent(spark):
    rows = [(0, "a b c", "s1"), (1, "a b c", "s2")]
    out = pack_sequences(_docs(spark, rows), budget=4).collect()
    assert {(r.source, r.seq_id) for r in out} == {("s1", 0), ("s2", 0)}


def test_pack_sequences_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(0, "a", "s")]), budget=0)


def test_chunk_documents_overlap_and_tail(spark):
    toks = " ".join(f"t{i}" for i in range(10))
    out = (
        chunk_documents(_docs(spark, [(0, toks, "s")]), chunk_size=4, stride=3)
        .orderBy("chunk_start")
        .collect()
    )
    assert [r.chunk_start for r in out] == [0, 3, 6, 9]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert out[-1].chunk_text == "t9"  # short tail kept
    assert [r.chunk_tokens for r in out] == [4, 4, 4, 1]


def test_chunk_documents_empty_doc_yields_no_chunks(spark):
    out = chunk_documents(
        _docs(spark, [(0, "", "s"), (1, "x y", "s")]), chunk_size=4, stride=3
    ).collect()
    assert {r.doc_id for r in out} == {1}


def test_strip_boilerplate_removes_planted_segment(spark):
    # "cookie banner text" planted as the head segment of every doc;
    # unique payloads survive, the hot segment is dropped everywhere.
    rows = [
        (i, f"cookie banner text unique{i} payload{i} words{i}", "s")
        for i in range(8)
    ]
    out = (
        strip_boilerplate(_docs(spark, rows), seg_len=3, df_max=4)
        .orderBy("doc_id")
        .collect()
    )
    assert all(r.n_removed == 1 for r in out)
    assert all(r.clean_text == f"unique{i} payload{i} words{i}" for i, r in enumerate(out))


def test_strip_boilerplate_below_threshold_is_lossless(spark):
    rows = [(i, f"alpha{i} beta{i} gamma{i} delta{i}", "s") for i in range(5)]
    out = strip_boilerplate(_docs(spark, rows), seg_len=2, df_max=4).collect()
    assert all(r.n_removed == 0 for r in out)
    # reassembly preserves token order exactly (text is lowercase already)
    by_id = {r.doc_id: r.clean_text for r in out}
    assert by_id[3] == "alpha3 beta3 gamma3 delta3"


def test_strip_boilerplate_all_boilerplate_doc_goes_empty(spark):
    rows = [(i, "same same same", "s") for i in range(6)]
    out = strip_boilerplate(_docs(spark, rows), seg_len=3, df_max=2).collect()
    assert all(r.clean_text == "" and r.n_kept == 0 and r.n_removed == 1 for r in out)


def test_vocabulary_tie_break_and_topk(spark):
    from etl_global_mobility_spark.operators.text import build_vocabulary

    rows = [(0, "b b a a c", "s"), (1, "a b d", "s")]
    v = build_vocabulary(_docs(spark, rows), top_k=2).collect()
    # a:3, b:3, c:1, d:1 → ties at n=3 break lexicographically: a, b
    assert [(r.term, r.n) for r in v] == [("a", 3), ("b", 3)]


def test_oov_rates_counts(spark):
    from etl_global_mobility_spark.operators.text import build_vocabulary, oov_rates

    rows = [(0, "a a b zz", "s"), (1, "a qq rr ss", "s"), (2, "", "s")]
    vocab = build_vocabulary(_docs(spark, rows), top_k=2)  # a, b
    out = {r.doc_id: r for r in oov_rates(_docs(spark, rows), vocab).collect()}
    assert out[0].n_tokens == 4 and out[0].n_oov == 1 and out[0].oov_rate == 0.25
    assert out[1].n_oov == 3 and out[1].oov_rate == 0.75
    assert 2 not in out  # zero-token docs produce no row


def test_vocabulary_plans_distributed_topk(spark):
    from etl_global_mobility_spark.operators.text import build_vocabulary
    from tests.test_plans import plan_of

    plan = plan_of(build_vocabulary(_docs(spark, [(0, "a b", "s")]), top_k=4))
    assert "TakeOrderedAndProject" in plan  # no single-partition window


def test_hll_sketch_union_error_bounds(spark):
    """Sketch estimates stay within HLL error of exact counts, and the
    union-of-sketches estimate equals the sketch-of-everything estimate
    (mergeability — the property that makes sketches scale)."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.corpus.relational import q_hll_sketch_union

    out = {r.grp: r for r in q_hll_sketch_union(spark, "/root/testdata/sf0.001").collect()}
    for grp, r in out.items():
        assert abs(r.est_custs - r.exact_custs) <= max(3, 0.05 * r.exact_custs), (
            grp,
            r,
        )
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    direct = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("e")
    ).collect()[0]["e"]
    assert out[-1].est_custs == direct  # union of per-group == global sketch


def test_feature_hash_vectors_are_unit_norm_and_stable(spark):
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.text import feature_hash_vectors

    rows = [(0, "a b a c", "s"), (1, "zz", "s")]
    v = feature_hash_vectors(_docs(spark, rows), n_buckets=8)
    norms = (
        v.groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("weight")).alias("n2"))
        .collect()
    )
    assert all(abs(r.n2 - 1.0) < 1e-12 for r in norms)  # L2-normalized
    # partition-layout invariant (hash depends only on token text)
    a = sorted(map(tuple, v.collect()))
    b = sorted(
        map(
            tuple,
            feature_hash_vectors(
                _docs(spark, rows).repartition(5), n_buckets=8
            ).collect(),
        )
    )
    assert a == b
    assert all(0 <= r[1] < 8 for r in a)


def test_approx_percentile_rank_error_bound(spark):
    """GK-sketch percentiles stay within the configured rank error of
    the exact interpolated percentiles (value-compared via the exact
    distribution's neighborhood)."""
    from etl_global_mobility_spark.corpus.relational import (
        q_agg_approx_percentile,
    )

    rows = q_agg_approx_percentile(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # accuracy=1000 → ±0.1% rank error; on this distribution that
        # maps to well under 2% relative value error
        assert abs(r.ap50 - r.p50) <= 0.02 * abs(r.p50) + 1e-9, r
        assert abs(r.ap90 - r.p90) <= 0.02 * abs(r.p90) + 1e-9, r


def test_causal_lm_examples_shift_pad_and_mask(spark):
    """Shift/pad contract on a hand-sized doc: 7 tokens at seq_len=4
    → windows [0:5] and [4:7]; labels are inputs shifted by one; the
    tail example pads inputs with pad_id and labels with -100."""
    from etl_global_mobility_spark.operators.packing import causal_lm_examples

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r.example_start: r
        for r in causal_lm_examples(df, seq_len=4, vocab_size=1000)
        .filter("doc_id = 1")
        .collect()
    }
    assert set(out) == {0, 4}
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash
    import pyspark.sql.functions as F

    ids = (
        spark.createDataFrame([(t,) for t in "abcdefg"], "t string")
        .select(_md5_band_hash(F.col("t"), 0).alias("h"))
        .collect()
    )
    ids = [r.h % 1000 for r in ids]
    # window 0 covers tokens 0-4: full, no padding
    assert out[0].input_ids == ids[0:4]
    assert out[0].labels == ids[1:5]
    assert out[0].n_real == 4
    # window 4 covers tokens 4-6: 3-token window → pad 1 input, 2 labels
    assert out[4].input_ids == ids[4:7] + [0]
    assert out[4].labels == ids[5:7] + [-100, -100]
    assert out[4].n_real == 2
    # docs with < 2 tokens produce nothing
    full = causal_lm_examples(df, seq_len=4, vocab_size=1000)
    assert full.filter("doc_id >= 2").count() == 0


def test_causal_lm_every_token_predicted_once(spark):
    """Across a document's examples, the multiset of real labels ==
    tokens[1:]: stride = seq_len with one-token overlap double-counts
    nothing and drops nothing."""
    from etl_global_mobility_spark.operators.packing import causal_lm_examples
    import pyspark.sql.functions as F

    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = causal_lm_examples(df, seq_len=5, vocab_size=50).collect()
    real_labels = []
    for r in rows:
        real_labels += [l for l in r.labels if l != -100]
        assert len(r.input_ids) == 5 and len(r.labels) == 5
    assert len(real_labels) == 22  # 23 tokens → 22 predictions


def test_causal_lm_examples_property_random_corpora(spark):
    """Randomized coverage property: for any corpus and seq_len, each
    document's real labels are exactly its hashed ids[1:] in order,
    inputs are the ids the labels shift from, and padding is confined
    to the final window."""
    import random as _random

    from etl_global_mobility_spark.operators.packing import causal_lm_examples

    rng = _random.Random(41)
    vocab = ["tok%d" % i for i in range(30)]
    docs = []
    for doc_id in range(25):
        n = rng.choice([0, 1, 2, 5, 16, 17, 33, 64])
        docs.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for seq_len in (4, 16):
        rows = causal_lm_examples(df, seq_len=seq_len, vocab_size=97).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, text in docs:
            n = len(text.split())
            got = sorted(by_doc.get(doc_id, []), key=lambda r: r.example_start)
            if n < 2:
                assert got == []
                continue
            # reconstruct the full id stream from inputs (first window's
            # inputs + each window's real labels)
            labels = [l for r in got for l in r.labels if l != -100]
            assert len(labels) == n - 1  # every token after the first, once
            first_inputs = [x for x in got[0].input_ids][: min(seq_len, n)]
            # shift property inside window 0
            assert first_inputs[1 : len(labels) + 1] == labels[: len(first_inputs) - 1]
            for r in got:
                assert len(r.input_ids) == seq_len and len(r.labels) == seq_len
                assert r.n_real == len([l for l in r.labels if l != -100])
            # padding only in the last window
            for r in got[:-1]:
                assert r.n_real == seq_len


def test_packing_efficiency_report_matches_materialized_examples(spark):
    """The report's planning numbers must equal what causal_lm_examples
    actually materializes: n_examples == example count per group and
    real_tokens == sum(n_real) — the report is a promise about the
    explode it avoids."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.packing import (
        causal_lm_examples,
        packing_efficiency_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "a", " ".join(f"t{i}" for i in range(70))),   # 70 tokens
            (2, "a", "one two"),                               # 2 tokens
            (3, "a", "single"),                                # skipped
            (4, "b", ""),                                      # skipped
            (5, "b", " ".join(f"u{i}" for i in range(33))),    # 33 tokens
        ],
        "doc_id long, source string, text string",
    )
    seq_len = 32
    rep = {
        r.source: r
        for r in packing_efficiency_report(docs, seq_len=seq_len).collect()
    }
    ex = (
        docs.join(
            causal_lm_examples(docs, seq_len=seq_len, vocab_size=97),
            "doc_id",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_ex"),
            F.sum("n_real").alias("real"),
        )
    )
    actual = {r.source: r for r in ex.collect()}
    for src in ("a", "b"):
        assert rep[src].n_examples == actual[src].n_ex
        assert rep[src].real_tokens == actual[src].real
    # closed-form spot checks: 70 tokens -> ceil(69/32)=3 examples,
    # 69 real slots; plus the 2-token doc -> 1 example, 1 real slot
    assert rep["a"].n_examples == 4 and rep["a"].real_tokens == 70
    assert rep["a"].n_docs == 3 and rep["a"].n_skipped == 1
    # 33 tokens -> one [0..32] window: exactly 32 real labels, no pad
    assert rep["b"].n_examples == 1 and rep["b"].real_tokens == 32
    assert rep["b"].slot_tokens == 32
    assert rep["b"].pad_fraction == 0.0
    # group 'a': 4 examples x 32 slots, 70 real -> 58/128 padding
    assert abs(rep["a"].pad_fraction - 58 / 128) < 1e-15


def test_sentence_chunks_respects_boundaries_and_budget(spark):
    """Sentences never split across chunks; a chunk may overflow the
    budget rather than cut a sentence; punctuation runs ('?!') end one
    sentence; empty segments drop; no-punctuation docs are one
    sentence; concatenating chunk_texts reconstructs the sentence
    stream."""
    from etl_global_mobility_spark.operators.packing import sentence_chunks

    docs = spark.createDataFrame(
        [
            # 3 sentences of 4, 4, 3 tokens; budget 8: s1+s2 fill chunk
            # 0 exactly (cum 8), s3 starts chunk 1
            (1, "one two three four. five six seven eight! nine ten eleven?"),
            # single 9-token sentence > budget -> ONE overflowing chunk
            (2, "a b c d e f g h i."),
            # punctuation runs + double spaces + trailing empties
            (3, "hey!!  ho?!   let us go...  "),
            (4, "no punctuation at all here"),
        ],
        "doc_id long, text string",
    )
    rows = sentence_chunks(docs, budget=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_id)

    d1 = by_doc[1]
    assert [(r.chunk_id, r.n_sentences, r.chunk_tokens) for r in d1] == [
        (0, 2, 8),
        (1, 1, 3),
    ]
    assert d1[0].chunk_text == "one two three four. five six seven eight!"
    assert d1[1].chunk_text == "nine ten eleven?"

    d2 = by_doc[2]
    assert [(r.chunk_id, r.n_sentences, r.chunk_tokens) for r in d2] == [
        (1, 1, 9)  # 9 tokens end in chunk (9-1)//8 = 1; never split
    ]

    d3 = by_doc[3]
    # 'hey!!', 'ho?!', 'let us go...' -> 1+1+3 = 5 tokens, one chunk
    assert [(r.n_sentences, r.chunk_tokens) for r in d3] == [(3, 5)]
    assert d3[0].chunk_text == "hey!! ho?! let us go..."

    d4 = by_doc[4]
    assert [(r.n_sentences, r.chunk_tokens) for r in d4] == [(1, 5)]


def test_sentence_chunks_matches_python_reference_on_random_texts(spark):
    """Hypothesis-randomized parity: sentence_chunks vs an independent
    pure-Python reimplementation of the contract (marker segmentation,
    ASCII-whitespace tokenization, last-token chunk assignment) over
    adversarial texts — punctuation runs, leading/trailing whitespace,
    empty sentences, budget-straddling lengths."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_global_mobility_spark.operators.packing import sentence_chunks

    word = st.sampled_from(["alpha", "bee", "sea...x", "d", "Ee", "12"])
    piece = st.one_of(
        word,
        st.sampled_from([".", "!", "?", "!!", "?!", "...", "", " ", "  "]),
    )
    text = st.lists(piece, min_size=0, max_size=24).map(" ".join)

    def ref(t: str, budget: int):
        marked = re.sub(r"([.!?]+)[ \t\n\x0b\f\r]+", "\\1\x01", t)
        sents = [s for s in marked.split("\x01") if s.strip()]
        out, cum = {}, 0
        for si, s in enumerate(sents):
            toks = [w for w in re.split(r"[ \t\n\x0b\f\r]+", s.lower().strip()) if w]
            cum += len(toks)
            cid = (max(cum, 1) - 1) // budget
            e = out.setdefault(cid, [0, 0, []])
            e[0] += 1
            e[1] += len(toks)
            e[2].append(s)
        return {
            cid: (n, tk, " ".join(texts)) for cid, (n, tk, texts) in out.items()
        }

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(text, min_size=1, max_size=8), st.integers(1, 9))
    def check(texts, budget):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {}
        for r in sentence_chunks(docs, budget=budget).collect():
            got.setdefault(r.doc_id, {})[r.chunk_id] = (
                r.n_sentences,
                r.chunk_tokens,
                r.chunk_text,
            )
        want = {
            i: ref(t, budget) for i, t in enumerate(texts) if ref(t, budget)
        }
        assert got == want

    check()
