"""Unit tests: Gopher/C4 filter-rules engine + BM25 retrieval on
hand-built documents (edge semantics the corpus oracle can't isolate)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.quality_rules import (
    filter_rules,
    split_quarantine,
)
from etl_global_mobility_spark.operators.retrieval import bm25_topk

GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs off to "
    "find more of the meadow where many other small animals live in peace"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_doc_keeps(spark):
    row = filter_rules(_docs(spark, [(1, GOOD)])).first()
    assert row["keep"] is True
    assert row["reasons"] == ""


def test_short_doc_flags_min_words(spark):
    row = filter_rules(_docs(spark, [(1, "too short to keep")])).first()
    assert row["r_min_words"] is True
    assert row["keep"] is False
    assert "min_words" in row["reasons"]


def test_repetitive_doc_flags(spark):
    text = " ".join(["the spam"] * 40)  # 80 words, 2 distinct
    row = filter_rules(_docs(spark, [(1, text)])).first()
    assert row["r_repetitive"] is True
    assert row["distinct_ratio"] == pytest.approx(2 / 80)


def test_no_stopword_flags(spark):
    text = " ".join(f"word{i}" for i in range(30))
    row = filter_rules(_docs(spark, [(1, text)])).first()
    assert row["r_no_stopwords"] is True
    assert row["keep"] is False


def test_digit_and_symbol_ratio_rules(spark):
    digits = "the " + " ".join(["12345 678"] * 10)
    symbols = "the " + " ".join(["@#$%^ &*!?"] * 10) + " " + GOOD
    out = {
        r["doc_id"]: r
        for r in filter_rules(_docs(spark, [(1, digits), (2, symbols)])).collect()
    }
    assert out[1]["r_digit_ratio"] is True
    assert out[2]["r_symbol_ratio"] is True


def test_reasons_fixed_order(spark):
    # short AND no stopwords AND repetitive -> pipe order is rule order
    row = filter_rules(_docs(spark, [(1, "spam spam spam")])).first()
    assert row["reasons"] == "min_words|no_stopwords|repetitive"


def test_split_quarantine_partitions_corpus(spark):
    df = _docs(spark, [(1, GOOD), (2, "tiny")])
    clean, quarantine = split_quarantine(df)
    assert [r["doc_id"] for r in clean.collect()] == [1]
    assert [r["doc_id"] for r in quarantine.collect()] == [2]


def test_split_quarantine_null_text_lands_in_quarantine(spark):
    """Partition contract: a NULL-text row must land in exactly one
    output. Before the fix, NULL text made every rule flag (and keep)
    NULL, so the row passed neither filter(keep) nor filter(~keep) and
    silently vanished from both halves."""
    df = _docs(spark, [(1, GOOD), (2, None)])
    clean, quarantine = split_quarantine(df)
    assert [r["doc_id"] for r in clean.collect()] == [1]
    q = quarantine.collect()
    assert [r["doc_id"] for r in q] == [2]
    assert q[0]["keep"] is False
    assert q[0]["reasons"] == "unevaluable"
    assert clean.count() + quarantine.count() == df.count()


# ------------------------------------------------------------- BM25 ----


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    """Plain-Python BM25 with the same rational idf."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for i, words in toks.items():
        s = 0.0
        for term in terms:
            tf = words.count(term)
            if tf == 0:
                continue
            df = sum(1 for w in toks.values() if term in w)
            idf = (n - df + 0.5) / (df + 0.5)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(words) / avgdl))
        scores[i] = s
    return scores


def test_bm25_matches_reference_scores(spark):
    rows = [
        (1, "spark shuffles data across the cluster"),
        (2, "spark spark spark tuning guide for spark"),
        (3, "a totally unrelated document about cooking pasta"),
        (4, "cluster management and data locality in the scheduler"),
    ]
    out = bm25_topk(
        _docs(spark, rows), ("spark", "cluster"), top_k=10
    ).collect()
    ref = _bm25_reference(rows, ("spark", "cluster"))
    got = {r["doc_id"]: r["score"] for r in out}
    # doc 3 matches nothing -> absent
    assert 3 not in got
    for doc_id, score in got.items():
        assert math.isclose(score, ref[doc_id], rel_tol=1e-12)
    # ranking matches the reference ordering (BM25 saturates tf, so the
    # two-term doc 1 outranks the spark-spam doc 2)
    want = sorted(got, key=lambda d: (-ref[d], d))
    assert [r["doc_id"] for r in out] == want


def test_bm25_tie_breaks_on_doc_id(spark):
    rows = [(7, "alpha beta"), (3, "alpha beta"), (9, "alpha beta")]
    out = bm25_topk(_docs(spark, rows), ("alpha",), top_k=3).collect()
    assert [r["doc_id"] for r in out] == [3, 7, 9]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_bm25_topk_truncates(spark):
    rows = [(i, "needle in haystack") for i in range(30)]
    out = bm25_topk(_docs(spark, rows), ("needle",), top_k=5).collect()
    assert len(out) == 5


def test_bm25_plan_is_take_ordered(spark):
    """The global top-k must be TakeOrderedAndProject (distributed
    partial top-k), not a single-task global-sort window."""
    df = _docs(spark, [(1, "x y"), (2, "x z")])
    plan = bm25_topk(df, ("x",), top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(1, "a")]), ())


# --------------------------------------------- operator validation ----


def test_mix_sources_validates_inputs(spark):
    from etl_global_mobility_spark.operators.splits import mix_sources

    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        mix_sources(df, {})
    with pytest.raises(ValueError):
        mix_sources(df, {"s": 1.0}, target_fraction=0.0)
    with pytest.raises(ValueError):
        mix_sources(df, {"s": 1.0}, target_fraction=1.5)


def test_zero_token_sources_are_guarded_everywhere(spark):
    """Round-9 adversarial sweep: a source whose documents are all
    empty/whitespace has ZERO countable tokens — unguarded, every
    per-source rate/ratio division is an ANSI DIVIDE_BY_ZERO crash.
    Contract: the zero-token source is DROPPED from mixes (no token
    mass to allocate), must not distort other sources' rates, and
    reports NULL where no ratio is defined."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.splits import (
        epoch_plan,
        mix_sources,
        temperature_mix,
    )
    from etl_global_mobility_spark.operators.text import (
        token_fertility_report,
    )

    rows = (
        [(i, "w o r d s " * 5, "full") for i in range(40)]
        + [(100 + i, "   ", "empty") for i in range(10)]
        + [(200 + i, "a b c", "small") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # mix_sources: empty source dropped, others sampled normally
    kept = mix_sources(
        df, {"full": 1.0, "empty": 1.0, "small": 1.0}, target_fraction=0.9
    )
    srcs = {r.source for r in kept.select("source").distinct().collect()}
    assert "empty" not in srcs and "full" in srcs

    # temperature_mix: t_min over POSITIVE sources — the small source
    # (30 tokens) is kept whole; the empty one is dropped, not allowed
    # to zero everyone's rate
    tm = temperature_mix(df, temperature=0.5)
    rates = {
        r.source: r.rate
        for r in tm.select("source", "rate").distinct().collect()
    }
    assert "empty" not in rates
    assert rates["small"] == 1.0
    assert 0.0 < rates["full"] < 1.0

    # epoch_plan: NULL epochs for the zero-token source, exact for rest
    plan = {
        r.source: r
        for r in epoch_plan(
            df, {"full": 1.0, "empty": 1.0, "small": 1.0}, token_budget=100
        ).collect()
    }
    assert plan["empty"].src_tokens == 0 and plan["empty"].epochs is None
    assert plan["full"].epochs is not None

    # token_fertility: NULL ratios for an all-empty language bucket
    lang_df = df.withColumn("lang", F.col("source"))
    fert = {r.lang: r for r in token_fertility_report(lang_df).collect()}
    assert fert["empty"].sum_ws_tokens == 0
    assert fert["empty"].chars_per_token is None
    assert fert["empty"].fertility is None
    assert fert["full"].fertility is not None


def test_mix_sources_caps_rates_and_never_upsamples(spark):
    """A source far below its target share keeps rate 1.0 (all rows);
    totals never exceed the source's own size."""
    from etl_global_mobility_spark.operators.splits import mix_sources

    rows = [(i, "word " * 50, "big") for i in range(40)] + [
        (100 + i, "word " * 50, "small") for i in range(2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # target: 50% of tokens, weighted 1:9 toward 'small' — small can't
    # supply its share, so its rate caps at 1.0 and every row survives
    out = mix_sources(df, {"big": 1.0, "small": 9.0}, target_fraction=0.5)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per.get("small") == 2
    assert per.get("big", 0) <= 40
    rates = {r["source"]: r["rate"] for r in out.select("source", "rate").distinct().collect()}
    assert rates["small"] == 1.0


def test_cap_per_stratum_exact_and_deterministic(spark):
    from etl_global_mobility_spark.operators.splits import cap_per_stratum

    rows = [(i, "t", f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = cap_per_stratum(df, "source", max_rows=5)
    counts = {
        r["source"]: r["n"]
        for r in a.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"s0": 5, "s1": 5, "s2": 5}
    b = cap_per_stratum(df.repartition(7), "source", max_rows=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with pytest.raises(ValueError):
        cap_per_stratum(df, "source", max_rows=0)


def test_bm25_no_matching_terms_returns_empty(spark):
    out = bm25_topk(
        _docs(spark, [(1, "alpha beta"), (2, "gamma")]),
        ("zzz_not_present",),
        top_k=5,
    )
    assert out.count() == 0


def test_filter_rules_threshold_overrides(spark):
    # with min_words lowered, a short doc passes; with it raised, the
    # long doc fails — thresholds are injectable per corpus
    short = _docs(spark, [(1, "the tiny a doc of note")])
    assert filter_rules(short, min_words=3).first()["r_min_words"] is False
    long_doc = _docs(spark, [(1, GOOD)])
    assert filter_rules(long_doc, min_words=999).first()["r_min_words"] is True


def test_filter_rules_empty_text(spark):
    row = filter_rules(_docs(spark, [(1, "")])).first()
    assert row["keep"] is False
    assert row["n_words"] == 0
    assert row["r_min_words"] is True


def test_rrf_fusion_rewards_consensus(spark):
    """A candidate ranked by BOTH lists must outscore one ranked top-1
    by a single list when k dampens rank gaps (1/(k+2)+1/(k+3) >
    1/(k+1)); missing lists contribute exactly 0."""
    from etl_global_mobility_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 3), (40, 1), (50, 2)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse([a, b], k=60).collect()}
    assert set(out) == {10, 20, 30, 40, 50}
    assert out[20].n_rankers == 2
    assert out[20].rrf_score == 1.0 / 62 + 1.0 / 63
    assert out[10].rrf_score == 1.0 / 61
    # consensus wins the fused ranking
    assert out[20].rrf_rank == 1
    # deterministic ordering: ranks are a permutation of 1..5
    assert sorted(r.rrf_rank for r in out.values()) == [1, 2, 3, 4, 5]


def test_rrf_requires_input(spark):
    import pytest as _pytest

    from etl_global_mobility_spark.operators.retrieval import rrf_fuse

    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_mmr_rerank_diversifies_near_duplicate_candidates(spark):
    """A near-duplicate of the best hit must NOT take rank 2 under MMR
    (pure cosine would rank it 2nd); a moderately relevant but novel
    vector takes it instead. Also pins determinism across layouts."""
    from etl_global_mobility_spark.operators.retrieval import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # the query
        (10, [0.99, 0.14, 0.0, 0.0]),  # best hit
        (11, [0.98, 0.15, 0.0, 0.0]),  # near-dup of 10 (2nd by cosine)
        (12, [0.7, 0.0, 0.7, 0.0]),    # relevant but novel direction
        (13, [0.6, 0.0, 0.0, 0.8]),    # another novel direction
        (14, [-1.0, 0.0, 0.0, 0.0]),   # irrelevant
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    out = mmr_rerank(df, q, k=3, n_candidates=5, lam=0.5, div=0.5)
    got = {r.mmr_rank: r.c_id for r in out.collect()}
    assert got[1] == 10            # pure relevance pick
    assert got[2] in (12, 13)      # diversity beats the near-dup
    assert 11 not in got.values()  # the dup never makes top-3

    again = {
        r.mmr_rank: r.c_id
        for r in mmr_rerank(
            df.repartition(7), q, k=3, n_candidates=5, lam=0.5, div=0.5
        ).collect()
    }
    assert again == got


def test_mmr_rerank_structural_invariants_random_vectors(spark):
    """Randomized structural contract (fixed seed): for any embedding
    set, MMR output per query is (1) exactly min(k, n_candidates) rows,
    (2) a duplicate-free subset of the cosine top-n candidate ids,
    (3) rank-1 equals the pure-relevance argmax, (4) ranks are
    contiguous from 1."""
    import random

    from etl_global_mobility_spark.operators.retrieval import mmr_rerank
    from etl_global_mobility_spark.operators.similarity import (
        cosine_topk_exact,
    )

    rng = random.Random(20260814)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 3")
    k, nc = 4, 9
    out = mmr_rerank(df, q, k=k, n_candidates=nc, lam=0.7, div=0.3).collect()
    cands = cosine_topk_exact(df, q, k=nc).collect()
    cand_ids = {}
    best = {}
    for r in cands:
        cand_ids.setdefault(r.q_id, set()).add(r.c_id)
        if r.rank == 1:
            best[r.q_id] = r.c_id
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q_id, rs in by_q.items():
        assert len(rs) == min(k, len(cand_ids[q_id]))
        ids = [r.c_id for r in sorted(rs, key=lambda r: r.mmr_rank)]
        assert len(set(ids)) == len(ids)
        assert set(ids) <= cand_ids[q_id]
        assert ids[0] == best[q_id]
        assert [r.mmr_rank for r in sorted(rs, key=lambda r: r.mmr_rank)] == list(
            range(1, len(rs) + 1)
        )


def test_mmr_rerank_rejects_non_integral_ids_and_drops_nan_relevance(spark):
    from etl_global_mobility_spark.operators.retrieval import mmr_rerank
    import pytest as _pytest

    sdf = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="integral id column"):
        mmr_rerank(sdf, sdf)

    # a zero vector produces NaN cosine relevance; it must be dropped
    # from the candidate set (symmetric with the oracle's NOT isnan)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 0.0, 0.0]),   # zero vector -> NaN rel
        (3, [0.5, 0.5, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    out = mmr_rerank(df, q, k=3, n_candidates=3, lam=0.7, div=0.3).collect()
    ids = {r.c_id for r in out}
    assert 2 not in ids and ids <= {1, 3}


def test_bitext_mining_finds_planted_translation(spark):
    """A target vector that is a near-copy of a source vector is that
    source's translation: it must be mined with the TOP margin, while
    a source with no counterpart in a uniform neighborhood stays near
    margin 1 (cos ~ its own k-NN average) and falls below a modest
    threshold."""
    import random

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.retrieval import (
        mine_bitext_pairs,
    )

    rng = random.Random(7)

    def vec(seed=None):
        r = random.Random(seed) if seed is not None else rng
        return [r.uniform(-1, 1) for _ in range(16)]

    base = vec(seed=99)
    near = [v + 0.01 * i for i, v in enumerate(base)]  # near-copy
    src_rows = [(0, base), (2, vec()), (4, vec())]
    tgt_rows = [(1, near)] + [(2 * i + 1, vec()) for i in range(1, 12)]
    src = spark.createDataFrame(
        src_rows, "vec_id long, embedding array<double>"
    )
    tgt = spark.createDataFrame(
        tgt_rows, "vec_id long, embedding array<double>"
    )

    mined = {
        r["src_id"]: r
        for r in mine_bitext_pairs(src, tgt, k=4, threshold=0.0).collect()
    }
    # the planted pair wins for src 0, with a big margin
    assert mined[0]["tgt_id"] == 1
    assert mined[0]["cos"] > 0.95
    assert mined[0]["margin"] > 1.5
    # unpaired sources sit near margin 1 — a real threshold separates
    high = {
        r["src_id"]
        for r in mine_bitext_pairs(src, tgt, k=4, threshold=1.5).collect()
    }
    assert 0 in high
    assert high <= {0, 2, 4}

    # determinism: partition layout changes nothing
    a = sorted(
        (r["src_id"], r["tgt_id"], r["margin"])
        for r in mine_bitext_pairs(src, tgt, k=4, threshold=0.0).collect()
    )
    b = sorted(
        (r["src_id"], r["tgt_id"], r["margin"])
        for r in mine_bitext_pairs(
            src.repartition(5), tgt.repartition(7), k=4, threshold=0.0
        ).collect()
    )
    assert a == b


def test_bitext_mining_small_side_shrinks_divisor(spark):
    """A target side smaller than k still mines: the neighborhood
    average divides by the ranks that EXIST, not a padded k."""
    from etl_global_mobility_spark.operators.retrieval import (
        mine_bitext_pairs,
    )

    src = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(1, [1.0, 0.1]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = mine_bitext_pairs(src, tgt, k=4, threshold=0.0).collect()
    assert {r["src_id"] for r in rows} == {0, 2}
    for r in rows:
        assert r["margin"] is not None and r["margin"] > 0


def test_bitext_mining_overlapping_id_spaces(spark):
    """Source and target are two INDEPENDENT id spaces (two languages):
    a shared id value is a coincidence, not a self-match, and (i, i)
    is often exactly the true translation. mine_bitext_pairs must run
    cosine_topk_exact with exclude_self=False — with the default
    self-exclusion the true pair (0, 0) below could never be mined
    (found by round-8 advisory review)."""
    import random

    from etl_global_mobility_spark.operators.retrieval import (
        mine_bitext_pairs,
    )

    rng = random.Random(13)

    def vec():
        return [rng.uniform(-1, 1) for _ in range(16)]

    base = vec()
    near = [v + 0.01 * i for i, v in enumerate(base)]
    # both sides use ids 0..4 — the planted translation SHARES id 0
    src = spark.createDataFrame(
        [(0, base)] + [(i, vec()) for i in range(1, 5)],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(0, near)] + [(i, vec()) for i in range(1, 5)],
        "vec_id long, embedding array<double>",
    )
    mined = {
        r["src_id"]: r
        for r in mine_bitext_pairs(src, tgt, k=3, threshold=0.0).collect()
    }
    assert mined[0]["tgt_id"] == 0, "same-id true pair must be minable"
    assert mined[0]["cos"] > 0.95


def test_bitext_mining_zero_denominator_margin_guard(spark):
    """One-hot / orthogonal embeddings make both k-NN neighborhood
    averages EXACTLY 0.0 (IEEE dot products of orthogonal vectors are
    exact zeros). Under Spark 4 ANSI mode an unguarded margin division
    would throw DIVIDE_BY_ZERO; the guard emits NaN, and — because NaN
    compares LARGER than any number in Spark and DuckDB alike — the
    NaN margin must also be DROPPED before max_by/threshold rather
    than winning them."""
    from etl_global_mobility_spark.operators.retrieval import (
        mine_bitext_pairs,
    )

    # every src⊥every tgt except the planted pair (0 -> 1): for src 2
    # all 4 of its k-NN cosines are exactly 0 -> nbr averages 0 ->
    # denominator 0
    src = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (5, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    # must not raise; src 2's candidates are (1, margin 0.0) and
    # (3, margin NaN — both neighborhoods exactly 0). The NaN row must
    # not win max_by nor pass >= threshold (NaN compares LARGER than
    # any number in Spark), so at threshold 0.5 src 2 mines nothing
    rows = mine_bitext_pairs(src, tgt, k=2, threshold=0.5).collect()
    by_src = {r["src_id"]: r for r in rows}
    assert 2 not in by_src
    assert by_src[0]["tgt_id"] == 1


# ---------------------------------------------------------------- ndcg


def _rank_frame(spark, rows):
    return spark.createDataFrame(rows, "q_id long, rank int, c_id long")


def test_ndcg_perfect_retrieval_scores_one(spark):
    """ANN that reproduces the exact ranking exactly → ndcg == 1.0 and
    dcg_num == idcg_num (integer equality, not float closeness)."""
    from etl_global_mobility_spark.operators.retrieval import ndcg_report

    exact = _rank_frame(spark, [(1, r, 100 + r) for r in range(1, 6)])
    got = ndcg_report(exact, exact, k=5).collect()
    assert len(got) == 1
    r = got[0]
    assert r.dcg_num == r.idcg_num and r.ndcg == 1.0


def test_ndcg_rewards_rank_position_not_just_overlap(spark):
    """Recall@k is identical (all 5 true neighbors retrieved) but the
    REVERSED ordering must score strictly below 1 — the dial this
    report adds over llm_ann_recall_report."""
    from etl_global_mobility_spark.operators.retrieval import ndcg_report

    exact = _rank_frame(spark, [(1, r, 100 + r) for r in range(1, 6)])
    reversed_ann = _rank_frame(spark, [(1, 6 - r, 100 + r) for r in range(1, 6)])
    r = ndcg_report(exact, reversed_ann, k=5).collect()[0]
    assert 0.0 < r.ndcg < 1.0
    # exact integer check: gains (5..1), weights (30,20,15,12,10);
    # reversed pairs gain g with weight w(6-rank(g)):
    # 5*10 + 4*12 + 3*15 + 2*20 + 1*30 = 213; ideal = 5*30+4*20+3*15+2*12+1*10 = 309
    assert r.dcg_num == 213 and r.idcg_num == 309
    assert r.ndcg == 213 / 309


def test_ndcg_zero_overlap_scores_zero_and_missing_query_rows_kept(spark):
    """A query whose ANN top-k shares nothing with the exact top-k
    scores 0 (not NULL, not dropped); queries absent from the ANN
    frame entirely also surface with ndcg 0."""
    from etl_global_mobility_spark.operators.retrieval import ndcg_report

    exact = _rank_frame(
        spark,
        [(1, r, 100 + r) for r in range(1, 6)]
        + [(2, r, 200 + r) for r in range(1, 6)],
    )
    ann = _rank_frame(spark, [(1, r, 900 + r) for r in range(1, 6)])
    by_q = {r.q_id: r for r in ndcg_report(exact, ann, k=5).collect()}
    assert set(by_q) == {1, 2}
    assert by_q[1].dcg_num == 0 and by_q[1].ndcg == 0.0
    assert by_q[2].dcg_num == 0 and by_q[2].ndcg == 0.0


def test_ndcg_rejects_bad_k(spark):
    from etl_global_mobility_spark.operators.retrieval import ndcg_report

    exact = _rank_frame(spark, [(1, 1, 2)])
    with pytest.raises(ValueError):
        ndcg_report(exact, exact, k=0)
