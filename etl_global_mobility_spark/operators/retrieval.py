"""Lexical ranked retrieval (BM25) over a document corpus.

The similarity-search side of the engine (operators/similarity.py)
covers dense/embedding retrieval; this module adds the sparse/lexical
counterpart a training-data pipeline uses for benchmark-contamination
sweeps and quality-targeted sampling: score every document against a
bag of query terms with BM25 (Robertson & Walker 1994; the Okapi
formulation) and return the global top-k.

Scale design — pure relational, three hash aggregations and two
broadcastable joins, no Python:

1. tokenize + explode (map-only, fused with the scan);
2. per-document length ``dl`` (hash agg keyed on doc_id — uniform);
3. term frequencies for the *query terms only* (the token stream is
   filtered to the handful of query terms BEFORE the shuffle, so the
   agg input is a tiny fraction of the corpus);
4. per-term document frequencies (bounded by |query|, broadcast);
5. corpus stats N / total dl (single-row aggregate, broadcast);
6. a conditional-aggregation pivot to one row per document with a
   FIXED-ORDER floating-point sum over the query terms.

At 100 TB the only corpus-sized shuffle is (2); everything else is
proportional to |query terms| or |matching docs|.

Oracle portability: the classic ln-based idf is replaced by its
rational core ``(N - df + 0.5) / (df + 0.5)`` — ln() differs between
libm implementations in the last ulp, while +,*,/ are exactly rounded
IEEE ops that hash-match across engines when the expression tree is
mirrored (same discipline as operators/text.py salient_terms). Note
this is a deliberate BM25 *variant* chosen for cross-engine FP parity:
for a SINGLE-term query the per-term transform is monotone and the
ranking matches textbook Okapi BM25, but the returned score is a SUM
of per-term contributions, and a per-term monotone transform does not
preserve the ordering of sums — multi-term rankings can diverge from
the ln-idf formulation. Callers needing textbook Okapi ordering should
apply ln() inside the per-term contribution, at the cost of
cross-engine hash parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.text import tokenize


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Global BM25 top-k: (rank, doc_id, n_terms_hit, score).

    ``score`` is the fixed-order sum of per-term BM25 contributions
    (term order = ``query_terms`` order); ties break on ascending
    doc_id via the row_number window.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("t")
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    # Corpus stats as exact integers; the single division is done once,
    # explicitly, in double (identical in the oracle).
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    qlits = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        toks.filter(F.array_contains(qlits, F.col("t")))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "t")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"))
        .withColumn(
            "idf",
            (
                (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
            )
            / (F.col("df").cast("double") + F.lit(0.5)),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (
                (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
                    )
                )
            ),
        )
    )

    # Pivot to one row per doc with a deterministic per-term column,
    # then sum in FIXED term order (FP addition is order-sensitive;
    # a plain sum() aggregates in partition order and would not
    # hash-match an independent engine).
    per_term = scored.groupBy("id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("t") == t, F.col("s"))), F.lit(0.0)
            ).alias(f"s_{i}")
            for i, t in enumerate(query_terms)
        ],
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    score = F.col("s_0")
    for i in range(1, len(query_terms)):
        score = score + F.col(f"s_{i}")
    # Global top-k via orderBy+limit → TakeOrderedAndProject (each task
    # keeps k rows, the driver merges k·tasks) — NOT a row_number window
    # over the full match set, which would be a single-task sort. The
    # rank window then runs over only k rows.
    topk = (
        per_term.withColumn("score", score)
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(top_k)
    )
    return topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("id"))),
    ).select(
        "rank",
        F.col("id").alias("doc_id"),
        "n_terms_hit",
        "score",
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) — the
    standard hybrid-retrieval combiner: given N ranked lists (each
    ``(id_col, rank)`` with rank 1-based), score every candidate
    ``Σ_r 1/(k + rank_r)`` over the lists that contain it, missing
    lists contributing 0.

    RRF needs no score calibration between rankers (only ranks), which
    is why it is the default way to fuse lexical BM25 with dense
    cosine retrieval. Arithmetic parity: each contribution is a single
    IEEE division and the sum folds in ranking-list order with
    coalesce(…, 0.0), so any engine reproduces the fused score
    bit-for-bit. Inputs are top-k lists (bounded), so the full-outer
    candidate join and the global re-rank window are trivially small —
    the expensive work stays inside the upstream rankers.

    Contract: each input list holds at most one row per id (true of
    any ranked top-k); duplicate ids in one list would fan out the
    candidate join.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql import Window

    out: DataFrame | None = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(id_col), F.col("rank").alias(f"__rank_{i}"))
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"__rank_{i}")), F.lit(0.0)
        )
    n_rankers = None
    for i in range(len(rankings)):
        c = F.col(f"__rank_{i}").isNotNull().cast("int")
        n_rankers = c if n_rankers is None else n_rankers + c
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        out.select(
            id_col, score.alias("rrf_score"), n_rankers.alias("n_rankers")
        )
        .withColumn("rrf_rank", F.row_number().over(w))
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 10,
    lam: float = 0.7,
    div: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the standard redundancy-aware final stage of dense
    retrieval: greedily select ``k`` of the top-``n_candidates``
    results, each step maximizing ``lam·rel(c) − div·max_{s∈S}
    sim(c, s)`` so near-duplicate hits don't crowd the context window.

    ``lam``/``div`` are independent parameters (NOT forced to sum to
    1): computing ``1 − lam`` at runtime would yield 0.30000000000000004
    for lam=0.7 and break bit-parity with an oracle writing the
    literal 0.3. Ties break toward the smaller candidate id (strict
    ``>`` while scanning ids ascending), mirroring ``ORDER BY score
    DESC, c_id`` exactly.

    Scale shape (100 TB lens): relevance and ALL pairwise candidate
    similarities are computed in the JVM with the same sequential-fold
    dot product the cosine oracle proves portable — the corpus streams
    map-only against a broadcast query side (cosine_topk_exact), and
    the candidate-embedding fetch broadcasts the tiny candidate list,
    not the corpus. Only the greedy argmax — O(k·n) comparisons over
    PRE-COMPUTED doubles, no float arithmetic beyond lam·rel − div·sim
    — runs in Python, via a cogrouped applyInPandas keyed on q_id:
    one bounded group per query, embarrassingly parallel across
    queries, never a driver-side loop.
    """
    import pandas as pd

    from etl_global_mobility_spark.operators.similarity import (
        cosine_topk_exact,
        dot,
    )

    from pyspark.sql import types as T

    id_type = corpus.schema[id_col].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise ValueError(
            f"mmr_rerank requires an integral id column; {id_col} is "
            f"{id_type.simpleString()} (the cogrouped greedy emits a "
            "bigint id schema)"
        )

    cands = (
        cosine_topk_exact(
            corpus, queries, k=n_candidates, id_col=id_col, vec_col=vec_col
        )
        .select("q_id", "c_id", F.col("score").alias("rel"))
        # cosine_topk_exact excludes NaN-relevance (zero-norm / NULL
        # vector) candidates BEFORE ranking by contract, so every rank
        # 1..n_candidates here is a real-similarity neighbor — matching
        # the oracle, which applies NOT isnan(rel) pre-ranking too. The
        # greedy's strict `>` and the oracle's greatest() therefore
        # never see a NaN.
    )
    # The candidate frame feeds THREE consumers (rels + both sides of
    # the pairwise-sim self-join); without materialization Spark would
    # replay the corpus-wide retrieval subtree per consumer — three
    # full corpus scans at 100 TB. It is bounded by contract
    # (n_queries × n_candidates rows), so checkpoint it once.
    cands = cands.localCheckpoint(eager=False)

    emb = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
    )
    # candidate list is (n_queries × n_candidates) — broadcast it so the
    # corpus-side embedding fetch is map-only
    cand_emb = emb.join(
        F.broadcast(cands.select("q_id", "c_id").distinct()), "c_id"
    )
    x, y = cand_emb.alias("x"), cand_emb.alias("y")
    sims = x.join(
        y,
        (F.col("x.q_id") == F.col("y.q_id"))
        & (F.col("x.c_id") < F.col("y.c_id")),
    ).select(
        F.col("x.q_id").alias("q_id"),
        F.col("x.c_id").alias("a_id"),
        F.col("y.c_id").alias("b_id"),
        (
            dot(F.col("x.c_vec"), F.col("y.c_vec"))
            / (
                F.sqrt(dot(F.col("x.c_vec"), F.col("x.c_vec")))
                * F.sqrt(dot(F.col("y.c_vec"), F.col("y.c_vec")))
            )
        ).alias("sim"),
    )

    def greedy(key, rel_pdf: pd.DataFrame, sim_pdf: pd.DataFrame) -> pd.DataFrame:
        (q_id,) = key
        rels = dict(zip(rel_pdf["c_id"], rel_pdf["rel"]))
        simd: dict[tuple[int, int], float] = {}
        for a_id, b_id, s in zip(
            sim_pdf["a_id"], sim_pdf["b_id"], sim_pdf["sim"]
        ):
            simd[(a_id, b_id)] = s
            simd[(b_id, a_id)] = s
        selected: list[int] = []
        rows = []
        while len(selected) < min(k, len(rels)):
            best_c, best_score = None, None
            for c in sorted(rels):
                if c in selected:
                    continue
                # max over the SELECTED set only (no 0.0 floor once
                # non-empty — sims can be negative and the oracle's
                # greatest() has no floor); empty set contributes 0.0
                maxsim = max(
                    (simd[(c, s)] for s in selected), default=0.0
                )
                score = lam * rels[c] - div * maxsim
                if best_c is None or score > best_score:
                    best_c, best_score = c, score
            selected.append(best_c)
            rows.append((q_id, len(selected), best_c, best_score))
        return pd.DataFrame(
            rows, columns=["q_id", "mmr_rank", "c_id", "mmr_score"]
        )

    return (
        cands.groupBy("q_id")
        .cogroup(sims.groupBy("q_id"))
        .applyInPandas(
            greedy, "q_id bigint, mmr_rank int, c_id bigint, mmr_score double"
        )
    )


def hard_negative_mining(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training (the
    DPR recipe, Karpukhin et al. EMNLP 2020): for each query, the most
    SIMILAR corpus items carrying a DIFFERENT label — the negatives
    that actually move a dense retriever, unlike random negatives the
    model separates for free. Returns the top ``k`` hard negatives per
    query (``neg_rank`` 1..k by similarity), drawn from the exact
    cosine top-``n_candidates``.

    Scale shape: composes :func:`similarity.cosine_topk_exact`
    (bounded query side broadcast, corpus streams map-only), so the
    label join touches only queries × n_candidates rows; rows with a
    NULL label on either side are excluded (a NULL label can't attest
    a true negative)."""
    from etl_global_mobility_spark.operators.similarity import (
        cosine_topk_exact,
    )
    from pyspark.sql import Window

    cands = cosine_topk_exact(
        corpus, queries, k=n_candidates, id_col=id_col, vec_col=vec_col
    )
    ql = queries.select(
        F.col(id_col).alias("q_id"), F.col(label_col).alias("q_label")
    )
    cl = corpus.select(
        F.col(id_col).alias("c_id"), F.col(label_col).alias("c_label")
    )
    w = Window.partitionBy("q_id").orderBy("rank")
    return (
        cands.join(F.broadcast(ql), "q_id")
        .join(cl, "c_id")
        .filter(
            F.col("q_label").isNotNull()
            & F.col("c_label").isNotNull()
            & (F.col("q_label") != F.col("c_label"))
        )
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("q_id", "q_label", "neg_rank", "c_id", "c_label", "score")
    )


def _fixed_order_knn_avg(cands: DataFrame, k: int, out_col: str) -> DataFrame:
    """Average similarity of each query's k-NN list, summed in FIXED
    written order (rank 1 + rank 2 + …): a plain ``avg(score)`` over
    doubles is partial-aggregation-order-dependent, so two engines (or
    two partition layouts) can disagree in the last ulp — the rank-i
    conditional-extraction + explicit addition chain is the same
    determinism trick as rel_decayed_activity's lag chain. Missing
    ranks (a side smaller than k) contribute nothing and shrink the
    divisor."""
    per_q = cands.groupBy("q_id").agg(
        *[
            F.max(F.when(F.col("rank") == i, F.col("score"))).alias(f"_s{i}")
            for i in range(1, k + 1)
        ]
    )
    total = F.coalesce(F.col("_s1"), F.lit(0.0))
    n = F.col("_s1").isNotNull().cast("int")
    for i in range(2, k + 1):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
        n = n + F.col(f"_s{i}").isNotNull().cast("int")
    return per_q.select("q_id", (total / n).alias(out_col))


def mine_bitext_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
    CCMatrix/LASER parallel-corpus construction operator): for each
    source-language embedding x, its best target-language candidate y
    scored by the RATIO margin

        margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

    where ``avgNN_k`` is the mean cosine of each side's k nearest
    neighbors in the OTHER language — absolute cosine is not
    comparable across sentences (hubness), the margin over each
    point's own neighborhood density is. Pairs with
    ``margin >= threshold`` are mined as translations (1.0 = "no
    better than its neighborhood"; CCMatrix mined at ~1.06).

    Scale shape: composes :func:`similarity.cosine_topk_exact` twice —
    ``src`` is the bounded mining batch (broadcast; mine in batches at
    100 TB, or swap the exact top-k for the ANN shortlist — the margin
    arithmetic is unchanged), the target corpus streams map-only; the
    backward direction queries ONLY the ≤ |src|·k distinct forward
    candidates. Neighborhood averages use a fixed-order addition chain
    so the doubles are bit-reproducible across engines and partition
    layouts. Zero-norm embeddings score NaN in the top-k and are
    excluded there.

    Returns one row per source item whose best candidate clears the
    threshold: (src_id, tgt_id, cos, margin)."""
    from etl_global_mobility_spark.operators.similarity import (
        cosine_topk_exact,
    )

    # Source and target are two INDEPENDENT id spaces (two languages):
    # an id shared across the sides is a coincidence, not a self-match,
    # and (i, i) is often exactly the true translation — so both top-k
    # passes run with exclude_self=False (the SQL-oracle cross join has
    # no id-inequality either; with the default the engines diverge the
    # moment ids overlap).
    fwd = cosine_topk_exact(
        tgt, src, k=k, id_col=id_col, vec_col=vec_col, exclude_self=False
    )
    a_src = _fixed_order_knn_avg(fwd, k, "nbr_src")
    cand_tgt = tgt.join(
        fwd.select(F.col("c_id").alias(id_col)).distinct(), id_col, "left_semi"
    )
    bwd = cosine_topk_exact(
        src, cand_tgt, k=k, id_col=id_col, vec_col=vec_col, exclude_self=False
    )
    a_tgt = (
        _fixed_order_knn_avg(bwd, k, "nbr_tgt")
        .withColumnRenamed("q_id", "c_id")
    )
    # Both neighborhood averages can be exactly 0.0 (orthogonal /
    # one-hot embeddings — IEEE dot products of orthogonal vectors are
    # exact zeros): ANSI mode would throw DIVIDE_BY_ZERO where DuckDB
    # yields NaN, so guard like _safe_cosine does — NaN margins then
    # fail the >= threshold filter identically on both engines.
    denom = F.col("nbr_src") + F.col("nbr_tgt")
    scored = (
        fwd.join(F.broadcast(a_src), "q_id")
        .join(F.broadcast(a_tgt), "c_id")
        .withColumn(
            "margin",
            F.when(
                denom != 0, (F.lit(2.0) * F.col("score")) / denom
            ).otherwise(F.lit(float("nan"))),
        )
    )
    # NaN compares LARGER than any number in both Spark and DuckDB, so
    # an unguarded NaN margin would win the max_by AND pass the >=
    # threshold filter — drop degenerate candidates before ranking.
    best = scored.filter(~F.isnan(F.col("margin"))).groupBy("q_id").agg(
        F.max_by(
            F.struct("c_id", "score", "margin"),
            F.struct(F.col("margin"), (-F.col("c_id")).alias("_nid")),
        ).alias("_best")
    )
    return best.select(
        F.col("q_id").alias("src_id"),
        F.col("_best.c_id").alias("tgt_id"),
        F.col("_best.score").alias("cos"),
        F.col("_best.margin").alias("margin"),
    ).filter(F.col("margin") >= threshold)


def ndcg_report(
    exact: DataFrame,
    ann: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Per-query nDCG@k of an ANN retrieval against exact ground
    truth (Järvelin & Kekäläinen 2002, "Cumulated gain-based
    evaluation of IR techniques") — the rank-aware companion to the
    recall@k report (recall treats a hit at rank 1 and rank k
    identically; nDCG grades WHERE the true neighbors landed).

    Both inputs are (q_id, rank, c_id) top-k frames: ``exact`` defines
    graded relevance (the true rank-r neighbor has gain ``k - r + 1``;
    anything outside the exact top-k has gain 0) and ``ann`` supplies
    the evaluated ordering.

    Exact-arithmetic discipline (the cross-engine hash contract): the
    textbook 1/log2(rank+1) discount is transcendental — libm log2
    differs between engines in the last ulp and float SUM order is
    engine-private — so the discount is the RATIONAL 1/(rank+1)
    scaled by lcm(2..k+1), making every DCG term an integer:

        dcg_num  = sum over ANN hits of gain(c) * (L / (ann_rank+1))
        idcg_num = sum over exact ranks of (k-r+1) * (L / (r+1))

    Integer sums are order-invariant; ``ndcg`` is ONE final double
    division, identical on any IEEE engine. Zipfian-style discount
    weights preserve nDCG's top-heaviness (rank 1 weighs 3x rank 5 at
    k=5 — steeper than log2's ~2.6x).

    Scale shape: both inputs are (n_queries x k)-bounded, so every
    join/agg here is trivially broadcastable — cost lives in the two
    retrievals upstream, the report adds one small-frame join chain.
    """
    import math

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lcm = math.lcm(*range(2, k + 2))
    weights = F.lit([lcm // (r + 1) for r in range(1, k + 1)])

    rel = exact.select(
        "q_id", "c_id", (F.lit(k + 1) - F.col("rank")).alias("gain")
    )
    dcg = (
        ann.select("q_id", "rank", "c_id")
        .join(rel, ["q_id", "c_id"])
        .select(
            "q_id",
            (F.col("gain") * F.element_at(weights, F.col("rank").cast("int"))).alias(
                "term"
            ),
        )
        .groupBy("q_id")
        .agg(F.sum("term").alias("dcg_num"))
    )
    idcg = exact.select(
        "q_id",
        (
            (F.lit(k + 1) - F.col("rank"))
            * F.element_at(weights, F.col("rank").cast("int"))
        ).alias("term"),
    ).groupBy("q_id").agg(F.sum("term").alias("idcg_num"))
    return idcg.join(dcg, "q_id", "left").select(
        "q_id",
        F.coalesce("dcg_num", F.lit(0)).cast("long").alias("dcg_num"),
        F.col("idcg_num").cast("long").alias("idcg_num"),
        (
            F.coalesce("dcg_num", F.lit(0)).cast("double")
            / F.col("idcg_num").cast("double")
        ).alias("ndcg"),
    )
