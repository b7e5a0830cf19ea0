"""Vector similarity search over embedding columns (array<float>).

Exact path: brute-force cosine top-k — deterministic, oracle-checkable;
fine for a bounded query set (k queries × N corpus rows, distributed by
corpus partition). Scale path: random-hyperplane LSH bucketing so only
bucket-mates are compared (never all-pairs at 100 TB).

All dot products run in DOUBLE over zipped arrays with sequential
(index-order) accumulation — bit-identical across engines for the same
float inputs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.parallelism import (
    AUTO,
    driver_rows_df,
    ensure_compute_parallelism,
)


def dot(a, b) -> F.Column:
    """Sequential-order double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def finite_vec(a, dim: int | None = None) -> F.Column:
    """TRUE iff every component is a finite number (no NULL/NaN/±Inf)
    and, when ``dim`` is given, the vector has exactly that length —
    the PQ-family inclusion contract (L2 machinery: a ZERO vector is a
    legal point here, unlike the cosine family's guarded_sq_norm, but
    a NaN component poisons the argmin into code -1 and an ANSI
    INVALID_ARRAY_INDEX at lookup, and a mis-sized vector slices into
    nonsense)."""
    pred = a.isNotNull() & ~F.exists(
        a,
        lambda x: x.isNull()
        | F.isnan(x)
        | (F.abs(x) == F.lit(float("inf"))),
    )
    if dim is not None:
        pred = pred & (F.size(a) == dim)
    return pred


def _exclude_or_raise(
    df: DataFrame, pred: F.Column, what: str, strict: bool
) -> DataFrame:
    """The degenerate-row exclusion contract, observable (ADVICE r10):
    by default rows failing ``pred`` are silently DROPPED (documented
    per operator — the scale-friendly choice: one hostile row must not
    kill a 100 TB encode). Callers that rely on one-output-row-per-
    input-row pass ``strict=True`` to fail loudly on the first
    excluded row instead of getting quiet shrinkage. assert_true
    evaluates inside the same filter (returns NULL when the predicate
    holds), so the strict path costs no extra pass."""
    if not strict:
        return df.filter(pred)
    return df.filter(
        F.assert_true(
            pred,
            F.lit(
                f"{what}: degenerate or mis-sized vector with "
                "strict=True — clean the input, or use the default "
                "strict=False to drop such rows"
            ),
        ).isNull()
    )


def guarded_sq_norm(a) -> F.Column:
    """Squared L2 norm, NULL for any DEGENERATE vector: NULL, zero
    (cosine undefined), a NaN/±Inf component, or magnitude overflow
    (1e30-scale components square to +Inf in float64). One predicate
    shared by the whole cosine family so 'excluded from similarity' is
    a single engine-wide contract — under ANSI mode an unguarded zero
    norm is a DIVIDE_BY_ZERO job failure, and a NaN norm silently
    poisons rankings (round-10 adversarial-embeddings sweep)."""
    nv = dot(a, a)
    return F.when(
        (~F.isnan(nv)) & (nv > 0) & (nv != F.lit(float("inf"))), nv
    )


def cosine(a, b) -> F.Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_parallelism: int | str | None = AUTO,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k nearest corpus
    vectors, rank 1..k.

    ``exclude_self`` (default True) drops candidates whose id equals
    the query id — correct for SELF-retrieval, where queries are drawn
    from the corpus and the trivial (i, i) match must not eat a top-k
    slot. For CROSS-corpus retrieval (two independent id spaces, e.g.
    bitext mining where source and target sentences legitimately share
    id values) pass ``exclude_self=False`` — otherwise any id shared
    across the two sides silently loses its true match.

    The query side is broadcast (bounded query sets by contract), so the
    corpus — the 100 TB side — streams through map tasks with no
    shuffle; only the tiny (n_queries × k) result set shuffles for the
    final per-query ordering. Ties break by corpus id ascending.

    Degenerate candidates (zero-norm or NULL embeddings score NaN, which
    sorts FIRST descending in Spark and DuckDB alike) are excluded
    BEFORE ranking — by contract the returned ranks 1..k cover only
    real-similarity neighbors, so downstream consumers (RRF fusion, kNN
    vote, MMR) never see a top-k slot eaten by a broken vector.
    """
    # Norms are materialized once per ROW before the join; only the
    # cross dot product runs per PAIR. Same IEEE arithmetic as
    # cosine() — dot/(sqrt(dot aa)·sqrt(dot bb)) — but 1 array fold
    # per candidate instead of 3 (the quadratic side is where 100 TB
    # hurts; measured ~3× at sf0.1).
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = ensure_compute_parallelism(corpus, min_parallelism).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_nrm"),
    )
    from pyspark.sql import Window

    # Zero-norm (all-zeros) vectors: ANSI mode would throw
    # DIVIDE_BY_ZERO, so guard the division and emit NaN — exactly
    # what DuckDB's 0/0 produces — keeping the two engines' candidate
    # rankings identical (both sort NaN first descending); for every
    # nonzero pair the guarded expression is the SAME division.
    nrm_prod = F.col("q_nrm") * F.col("c_nrm")
    pair_cond = (
        F.col("q_id") != F.col("c_id") if exclude_self else F.lit(True)
    )
    scored = (
        c.join(F.broadcast(q), pair_cond)
        .withColumn(
            "score",
            F.when(
                nrm_prod > 0,
                dot(F.col("q_vec"), F.col("c_vec")) / nrm_prod,
            ).otherwise(F.lit(float("nan"))),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        scored.filter(~F.isnan(F.col("score")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "score")
    )


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    cos ≥ threshold, id_a < id_b.

    Candidates come from LSH bucket collisions (sign-of-projection
    buckets), then the exact cosine verifies — at 100 TB the bucket
    join replaces the quadratic all-pairs compare. High-cosine pairs
    collide with probability (1 − θ/π)^planes, so few planes keep
    near-duplicate recall high while still pruning the far pairs.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    df = ensure_compute_parallelism(df, min_parallelism)
    # Per-row norm materialized before the self-join: the bucket join is
    # the quadratic stage, so each candidate pair costs one array fold
    # (the cross dot), not three. Identical IEEE value to cosine().
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    x = b.alias("x")
    y = b.alias("y")
    # Zero-norm guard (the cosine_topk_exact convention): ALL-ZERO
    # vectors project to 0 on every hyperplane, so they share one LSH
    # bucket and WILL pair up — unguarded, that is an ANSI
    # DIVIDE_BY_ZERO crash, and an unfiltered NaN would PASS the
    # >= threshold filter (NaN compares larger than any number in both
    # Spark and DuckDB). Guard to NaN, then drop.
    nrm_prod = F.col("x.nrm") * F.col("y.nrm")
    pairs = x.join(
        y,
        (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")),
    ).select(
        F.col("x.id").alias("id_a"),
        F.col("y.id").alias("id_b"),
        F.when(
            nrm_prod > 0,
            dot(F.col("x.vec"), F.col("y.vec")) / nrm_prod,
        )
        .otherwise(F.lit(float("nan")))
        .alias("cos"),
    )
    return pairs.filter(
        ~F.isnan(F.col("cos")) & (F.col("cos") >= threshold)
    )


def _resolve_centroids(
    corpus: DataFrame,
    n_cells: int,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]] | None,
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """(cent_id, vector) pairs + their L2 norms for a coarse quantizer.

    Explicit ``centroids`` (e.g. from :func:`train_ivf_centroids`) are
    indexed 0..k-1; the default deterministic quantizer is the
    ``n_cells`` lowest-id corpus vectors (cell id = that vector's id),
    which keeps results oracle-checkable. Either way the collect is
    bounded (n_cells rows), never row data.
    """
    if centroids is not None:
        cents = [(i, [float(x) for x in v]) for i, v in enumerate(centroids)]
        for i, v in cents:
            if not all(math.isfinite(x) for x in v) or not any(v):
                raise ValueError(
                    f"quantizer centroid {i} is degenerate (non-finite "
                    "component or zero norm) — train on a corpus with "
                    "the degenerate vectors excluded"
                )
    else:
        # degenerate vectors (guarded_sq_norm NULL: zero norm, NaN/Inf,
        # magnitude overflow) can never anchor a cosine cell — skip
        # them when picking the deterministic lowest-id quantizer
        # (no-op on clean corpora)
        cents = [
            (int(r[0]), [float(x) for x in r[1]])
            for r in corpus.select(id_col, vec_col)
            .filter(guarded_sq_norm(F.col(vec_col)).isNotNull())
            .orderBy(id_col)
            .limit(n_cells)
            .collect()
        ]
    # Python-side sequential fold == DuckDB list_dot_product == Spark
    # F.aggregate — all three are in-order IEEE double chains.
    norms = [math.sqrt(sum(x * x for x in v)) for _, v in cents]
    return cents, norms


def _centroid_scores(
    cents: list[tuple[int, list[float]]],
    norms: list[float],
    vec_name: str,
    nv_name: str,
) -> F.Column:
    """(cos, -cent_id) structs vs every literal centroid; the squared
    norm of the data vector (`nv_name`) is materialized once by the
    caller (no CSE inside the fan-out). Built as ONE parsed SQL
    expression: per-centroid F.lit arrays cost ~100 ms of py4j
    conversion each (measured 5 s of plan build per ivf_topk at
    n_cells=16 — two call sites), parsing is ~1 ms. The arithmetic:
    sequential double fold, then dot / (sqrt(nv) · ||centroid||)."""
    parts = []
    skipped = []
    for (cid, v), n in zip(cents, norms):
        if not all(math.isfinite(x) for x in v) or not math.isfinite(n):
            # a non-finite value would interpolate as the SQL token
            # `nanD`/`infD` (an unresolvable column, not a literal) —
            # fail at build time with the cause, not at runtime with
            # parser noise (round-10 adversarial-embeddings sweep)
            raise ValueError(
                f"centroid {cid} is degenerate (non-finite component); "
                "exclude degenerate vectors before training"
            )
        if n == 0.0:
            # FINITE components whose squared sum underflows to 0.0:
            # the division is DOUBLE, so a zero norm yields Inf/NaN
            # cos (never an ANSI error) and the cell could only rank
            # garbage — skip it, the way the trainer skips degenerate
            # centroid updates, instead of turning denormal-tiny but
            # legal input into a build-time ValueError (ADVICE r10)
            skipped.append(cid)
            continue
        arr = "array(" + ",".join(f"{float(x)!r}D" for x in v) + ")"
        d = (
            f"aggregate(zip_with({vec_name}, {arr}, "
            f"(x, y) -> double(x) * y), 0.0D, (acc, v) -> acc + v)"
        )
        parts.append(
            f"named_struct('cos', {d} / (sqrt({nv_name}) * {float(n)!r}D), "
            f"'neg_id', {-cid})"
        )
    if not parts:
        raise ValueError(
            f"every centroid has an underflowed zero norm ({skipped}); "
            "no cell can score — retrain on non-degenerate vectors"
        )
    return F.expr("array(" + ",".join(parts) + ")")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    min_parallelism: int | str | None = AUTO,
    strict: bool = False,
    preassigned: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors: partition the
    corpus into `n_cells` Voronoi cells around centroid vectors, then
    answer each query by exact top-k over only the `nprobe` cells whose
    centroids are nearest to the query.

    ``preassigned`` (from :func:`ivf_assign_cells`, with the SAME
    centroids) skips the corpus-side assignment scan entirely — the
    streaming-ingest path: assign the corpus once, persist the cell
    index, and serve every later micro-batch from it, so per-batch
    cost is bounded by the batch, never the corpus.

    The default coarse quantizer is the `n_cells` lowest-id corpus
    vectors — deterministic, so the result is oracle-checkable. Pass
    ``centroids`` (e.g. from :func:`train_ivf_centroids`) for a trained
    quantizer; cell ids are then centroid list indices. The *scale*
    machinery is identical either way: the centroid table is tiny and
    collected to the driver (bounded: n_cells rows), every cell
    assignment is a map-only pass over literal centroids (no shuffle,
    no join), and the only shuffle is the candidate top-k on the
    (n_queries × cell-size) candidate set. At 100 TB the corpus is
    scanned once to build the cell assignment and each query touches
    ~nprobe/n_cells of the data.
    """
    from pyspark.sql import Window

    if preassigned is not None and centroids is None:
        # A persisted index's quantizer cannot be recovered from
        # `corpus`: re-deriving seed centroids here could disagree
        # with the centroids that built `preassigned`, and the probe
        # side would then target the WRONG cells — silently wrong or
        # empty top-k. The 'SAME centroids' requirement is enforced,
        # not just documented (r13 advice finding).
        raise ValueError(
            "ivf_topk(preassigned=...) requires the `centroids` that "
            "built the persisted index; pass the quantizer loaded via "
            "load_ann_artifacts, not None"
        )
    cents, norms = _resolve_centroids(corpus, n_cells, id_col, vec_col, centroids)
    if not cents:
        # empty corpus and no trained quantizer: there is nothing to
        # search. Empty-in -> empty-out with the contract schema (an
        # empty centroid list would otherwise build a VOID-typed
        # array() literal and fail analysis — round-10 empty-input
        # sweep).
        return queries.limit(0).select(
            F.col(id_col).alias("q_id"),
            F.lit(1).alias("rank"),
            F.col(id_col).alias("c_id"),
            F.lit(0.0).alias("score"),
        )

    def cell_scores(vec_name: str, nv_name: str):
        return _centroid_scores(cents, norms, vec_name, nv_name)

    # degenerate vectors (guarded_sq_norm NULL) are EXCLUDED from both
    # sides — the cosine-family contract: a zero norm is an ANSI
    # DIVIDE_BY_ZERO in the assignment expression, a NaN norm poisons
    # the ranking; no-op on clean corpora. The inline branch and
    # ivf_assign_cells share ONE construction (_assigned_cells_frame)
    # so a persisted index can never drift from inline assignment.
    if preassigned is not None:
        assigned = preassigned.select("c_id", "c_vec", "cell", "c_nv")
    else:
        assigned = _assigned_cells_frame(
            corpus, id_col, vec_col, cents, norms, min_parallelism
        )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    # strict=True raises on a degenerate QUERY vector instead of
    # silently dropping that query from the result (ADVICE r10)
    probed = (
        _exclude_or_raise(
            q.withColumn("nv", guarded_sq_norm(F.col("q_vec"))),
            F.col("nv").isNotNull(),
            "ivf_topk",
            strict,
        )
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(
                        F.reverse(F.array_sort(cell_scores("q_vec", "nv"))), 1, nprobe
                    ),
                    lambda s: -s.getField("neg_id"),
                )
            ),
        )
        .select("q_id", "q_vec", "cell", F.col("nv").alias("q_nv"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "score",
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.sqrt(F.col("q_nv")) * F.sqrt(F.col("c_nv"))),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "score")
    )


def _assigned_cells_frame(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[tuple[int, list[float]]],
    norms: list[float],
    min_parallelism: int | str | None,
) -> DataFrame:
    """The ONE construction of the corpus-side cell assignment —
    ``(c_id, c_vec, cell, c_nv)``, degenerate vectors excluded, one
    map-only scan over literal centroids. Shared by ivf_topk's inline
    branch and :func:`ivf_assign_cells` so the persisted index is the
    inline assignment BY CONSTRUCTION, not by test pin alone. The
    squared norm (`c_nv`) computed for assignment is carried through
    so candidate scoring pays one array fold per pair."""
    return (
        ensure_compute_parallelism(corpus, min_parallelism)
        .select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
        .withColumn("nv", guarded_sq_norm(F.col("c_vec")))
        .filter(F.col("nv").isNotNull())
        .withColumn(
            "cell",
            -F.array_max(_centroid_scores(cents, norms, "c_vec", "nv")).getField(
                "neg_id"
            ),
        )
        .select("c_id", "c_vec", "cell", F.col("nv").alias("c_nv"))
    )


def ivf_assign_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """One-time corpus → Voronoi-cell assignment, the persistable cell
    index :func:`ivf_topk` consumes via ``preassigned``: one map-only
    scan over literal centroids (no join, no shuffle) producing
    ``(c_id, c_vec, cell, c_nv)`` with degenerate vectors excluded —
    byte-identical to ivf_topk's inline assignment because both call
    :func:`_assigned_cells_frame`. The streaming-ingest recipe: assign
    once, persist the index, serve every micro-batch from it."""
    cents, norms = _resolve_centroids(corpus, n_cells, id_col, vec_col, centroids)
    if not cents:
        return (
            ensure_compute_parallelism(corpus, min_parallelism)
            .select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
            .withColumn("nv", guarded_sq_norm(F.col("c_vec")))
            .filter(F.col("nv").isNotNull())
            .limit(0)
            .select(
                "c_id", "c_vec", F.lit(0).alias("cell"), F.col("nv").alias("c_nv")
            )
        )
    return _assigned_cells_frame(
        corpus, id_col, vec_col, cents, norms, min_parallelism
    )


def deterministic_seed_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The ``n_cells`` lowest-id NON-DEGENERATE vectors as a literal
    list — the deterministic coarse quantizer both incremental-ingest
    twins (llm_ivf_incremental, stream_ivf_ingest) derive from the
    EXISTING snapshot, kept in one place so the twins (and their
    shared DuckDB oracle) can never drift. Bounded n_cells-row
    collect; degenerate vectors can't anchor a cosine cell."""
    return [
        [float(x) for x in r[1]]
        for r in corpus.select(id_col, vec_col)
        .filter(guarded_sq_norm(F.col(vec_col)).isNotNull())
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    ]


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer, then
    compare pairs ONLY within a cell — a vector is a semantic duplicate
    iff some smaller-id cell-mate has cosine ≥ ``threshold``.

    Returns one row per duplicate: ``(vec_id, cell, dup_of, cos)``
    where ``dup_of`` is the SMALLEST such smaller-id neighbor (the
    kept representative under min-id canonicalization) and ``cos`` is
    that pair's cosine. Deterministic, so exact-oracle-checkable.

    Scale shape (the SemDeDup cost model): cell assignment is a
    map-only pass over literal centroids (no shuffle, no join — same
    machinery as :func:`ivf_topk`); the only corpus shuffle is the
    self-join on ``cell``. Within-cell comparison is quadratic in cell
    size, so ``n_cells`` must grow ∝ corpus size (the paper runs 11k
    clusters for 100M points; a 100 TB run trains centroids with
    :func:`train_ivf_centroids` and passes them in). The dedup-marking
    step is a per-id window over candidate pairs, output ∝ duplicates
    found, not corpus size.

    Degenerate rows — NULL embedding, zero norm, any NaN/Inf component
    (guarded_sq_norm NULL) — get a NULL cell and silently drop out of
    the self-join (they can be neither duplicate nor source) — filter
    or impute upstream if they must be accounted for.
    """
    from pyspark.sql import Window

    cents, norms = _resolve_centroids(corpus, n_cells, id_col, vec_col, centroids)
    if not cents:
        # empty corpus, no quantizer: no rows can be duplicates —
        # empty-in -> empty-out with the contract schema (round-10
        # empty-input sweep; see ivf_topk).
        return corpus.limit(0).select(
            F.col(id_col),
            F.lit(None).cast("long").alias("cell"),
            F.col(id_col).alias("dup_of"),
            F.lit(0.0).alias("cos"),
        )
    c = ensure_compute_parallelism(corpus, min_parallelism).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    # Squared norm computed once per row for assignment is carried into
    # the pair stage: each candidate pair costs ONE array fold (the
    # cross dot), with sqrt(nv) the identical IEEE value l2_norm gives.
    assigned = (
        c.withColumn("nv", guarded_sq_norm(F.col("vec")))
        .withColumn(
            "cell",
            # Degenerate rows (NULL embedding, zero norm, NaN/Inf —
            # guarded_sq_norm NULL) get a genuinely NULL cell and drop
            # out of the self-join: they can be neither duplicate nor
            # source (a zero norm would be an ANSI DIVIDE_BY_ZERO in
            # the pair cosine; without the cell guard, array_max over
            # all-NULL cosines would fall through to the neg_id
            # tie-break and land them in cell 0, where they'd fan out
            # through the self-join for nothing).
            F.when(
                F.col("nv").isNotNull(),
                (
                    -F.array_max(
                        _centroid_scores(cents, norms, "vec", "nv")
                    ).getField("neg_id")
                ).cast("long"),
            ),
        )
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell")) & (F.col("b.id") < F.col("a.id")),
    ).select(
        F.col("a.id").alias("id"),
        F.col("a.cell").alias("cell"),
        F.col("b.id").alias("dup_of"),
        (
            dot(F.col("a.vec"), F.col("b.vec"))
            / (F.sqrt(F.col("a.nv")) * F.sqrt(F.col("b.nv")))
        ).alias("cos"),
    ).filter(F.col("cos") >= threshold)
    w = Window.partitionBy("id").orderBy(F.col("dup_of"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("id").alias(id_col), "cell", "dup_of", "cos")
    )


#: Above this many centroids, the UNROLLED assignment expression (one
#: zip_with+aggregate subtree per centroid → O(k·dim) generated code)
#: risks Janino's 64 KB method limit / WholeStageCodegen fallback —
#: measured fine at the corpus defaults (k ≤ 16), growing linearly
#: after. At or past the threshold the trainers switch to the LITERAL
#: path: all centroids ride in ONE array<array<...>> Literal (data,
#: not code) and a single indexed F.transform lambda computes every
#: distance — constant-size generated code for any k, same map-only
#: zero-join plan, and (for the float trainer) the same sequential
#: summation order, so both paths are bit-identical (pinned by
#: tests/test_llm_operators.py).
LARGE_K_CODEGEN_THRESHOLD = 64


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    large_k_threshold: int = LARGE_K_CODEGEN_THRESHOLD,
) -> list[list[float]]:
    """Spherical k-means (Lloyd's) trainer for the IVF coarse quantizer:
    assign by max cosine, update each centroid to the member mean.

    Scale shape per iteration: one MAP-ONLY assignment pass over literal
    centroids (no join, no shuffle of the corpus), then ONE shuffle of
    (cell, dim-position) partial averages — map-side combined, so the
    exchanged data is O(n_cells × dim × partitions), independent of
    corpus size. Only n_cells × dim aggregate rows ever reach the
    driver. Initialization is the deterministic lowest-id seed set
    (same as ivf_topk's default quantizer), so training is reproducible
    up to float partial-sum order; the trained centroids feed
    ``ivf_topk(..., centroids=...)``, while the oracle-checked corpus
    query keeps the deterministic default.

    Empty cells keep their previous centroid (the standard Lloyd's
    degenerate-cell rule).
    """
    # degenerate vectors can neither seed nor move a cosine centroid —
    # exclude them from seeds AND the assignment pass (zero norm is an
    # ANSI DIVIDE_BY_ZERO in the per-centroid score); no-op on clean
    # corpora
    cents = [
        [float(x) for x in r[1]]
        for r in corpus.select(id_col, vec_col)
        .filter(guarded_sq_norm(F.col(vec_col)).isNotNull())
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    ]
    c = (
        corpus.select(F.col(vec_col).alias("vec"))
        .withColumn("nv", guarded_sq_norm(F.col("vec")))
        .filter(F.col("nv").isNotNull())
    )
    for _ in range(n_iters):
        norms = [math.sqrt(sum(x * x for x in v)) for v in cents]
        if n_cells < large_k_threshold:
            scores = F.array(
                *[
                    F.struct(
                        (
                            dot(F.col("vec"), F.lit(v))
                            / (F.sqrt(F.col("nv")) * F.lit(n))
                        ).alias("cos"),
                        F.lit(-cid).alias("neg_id"),
                    )
                    for cid, (v, n) in enumerate(zip(cents, norms))
                ]
            )
        else:
            # literal path: centroids as DATA, one lambda as code —
            # dot() keeps the identical sequential summation order, so
            # the float results match the unrolled path bit-for-bit
            cvecs = F.lit([[float(x) for x in v] for v in cents]).cast(
                "array<array<double>>"
            )
            norms_lit = F.lit([float(n) for n in norms])
            scores = F.transform(
                cvecs,
                lambda cv, i: F.struct(
                    (
                        dot(F.col("vec"), cv)
                        / (F.sqrt(F.col("nv")) * F.element_at(norms_lit, i + 1))
                    ).alias("cos"),
                    (-i).cast("int").alias("neg_id"),
                ),
            )
        assigned = c.withColumn("cell", -F.array_max(scores).getField("neg_id"))
        means = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_cents = [list(v) for v in cents]  # empty cells keep position
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["m"])
        for cid, dims in by_cell.items():
            new_cents[cid] = [dims[i] for i in range(len(dims))]
        cents = new_cents
    return cents


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (python Random, seeded) —
    no numpy dependency at plan-build time, reproducible across runs."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col, planes: list[list[float]]) -> F.Column:
    """Sign-of-projection LSH bucket id: bit i = 1 iff vec · plane_i > 0.
    Near vectors (cosine) collide with high probability."""
    # one array literal per plane (a 64-element F.array of F.lit nodes
    # costs real plan-build + codegen time; a literal array is one node)
    bits = [
        F.when(dot(vec_col, F.lit(list(p))) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    return sum(bits, F.lit(0)).cast("bigint")


def lsh_ann_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 1,
    min_parallelism: int | str | None = AUTO,
) -> DataFrame:
    """Approximate top-k: exact ranking within the union of the query's
    LSH buckets across `n_tables` independent hash tables
    (OR-construction: a candidate qualifies if it collides in ANY
    table — the standard recall amplification).

    Corpus is bucketed once per table (map-side, no shuffle); each join
    key is a bucket id, so each query only meets bucket-mates — at
    100 TB this replaces an O(N·Q) cross join with
    O(n_tables · N/2^planes · Q) per bucket. Tune recall with fewer
    planes (bigger buckets) or more tables (more unions).
    """
    from pyspark.sql import Window

    # Per-row norms ride along with the bucket keys so post-join scoring
    # is one array fold per candidate (see cosine_topk_exact note).
    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        cols = [
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            l2_norm(F.col(vec_col)).alias(f"{prefix}_nrm"),
        ]
        for t in range(n_tables):
            planes = random_hyperplanes(dim, n_planes, seed + 1000 * t)
            cols.append(lsh_bucket(F.col(vec_col), planes).alias(f"bucket{t}"))
        return df.select(*cols)

    c = bucketed(ensure_compute_parallelism(corpus, min_parallelism), "c")
    q = bucketed(queries, "q")

    cand = None
    for t in range(n_tables):
        hit = c.join(
            F.broadcast(q.select("q_id", "q_vec", "q_nrm", f"bucket{t}")),
            on=f"bucket{t}",
        ).select("q_id", "q_vec", "q_nrm", "c_id", "c_vec", "c_nrm")
        cand = hit if cand is None else cand.unionByName(hit)
    cand = cand.filter(F.col("q_id") != F.col("c_id")).dropDuplicates(
        ["q_id", "c_id"]
    )

    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    # Zero-norm guard + NaN exclusion (the cosine_topk_exact contract):
    # all-zero vectors share every LSH bucket (projections are exact
    # zeros), so degenerate pairs DO reach scoring — unguarded that is
    # an ANSI DIVIDE_BY_ZERO, and NaN sorts FIRST descending, eating
    # top-k slots.
    nrm_prod = F.col("q_nrm") * F.col("c_nrm")
    return (
        cand.withColumn(
            "score",
            F.when(
                nrm_prod > 0,
                dot(F.col("q_vec"), F.col("c_vec")) / nrm_prod,
            ).otherwise(F.lit(float("nan"))),
        )
        .filter(~F.isnan(F.col("score")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "score")
    )


# ------------------------------------------------------------------ PQ ----
def pq_codebook_from_corpus(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic data-derived PQ codebook: subspace ``j``'s ``k``
    centroids are the ``j``-th subvectors of the ``k`` lowest-id corpus
    rows (bounded k-row collect — the same deterministic-seed rule as
    the IVF coarse quantizer, so the DuckDB oracle can rebuild the
    identical codebook from the table itself). A pseudo-random codebook
    is NOT usable here: embeddings live far from gauss noise, every
    subvector snaps to the same centroid, and ADC degenerates to a
    constant (measured recall@5 0.025 vs 0.75+ for data-derived).
    :func:`train_pq_codebook` refines with Lloyd iterations."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    # only finite, correctly-sized vectors can seed a codebook (a NaN
    # seed would interpolate as unparseable SQL in _pq_scores); no-op
    # on clean corpora
    seeds = [
        [float(x) for x in r[1]]
        for r in corpus.select(id_col, vec_col)
        .filter(finite_vec(F.col(vec_col), dim))
        .orderBy(id_col)
        .limit(k)
        .collect()
    ]
    if len(seeds) < k:
        raise ValueError(f"corpus has {len(seeds)} rows < k={k}")
    return [
        [seeds[c][j * sub : (j + 1) * sub] for c in range(k)] for j in range(m)
    ]


def _pq_sub(vec_col, j: int, sub: int) -> F.Column:
    return F.slice(vec_col, j * sub + 1, sub)


def _pq_scores(vec_col: str, cents: list[list[float]], j: int, sub: int) -> F.Column:
    """Array of k shift-invariant subspace-j scores ``||c||² - 2·(s·c)``
    (the row's own ``||s||²`` is constant across centroids AND across a
    query's candidates, so dropping it changes neither the encode
    argmin nor any per-query ADC ranking). One ``transform`` over
    index + two literal arrays — O(1) expression nodes per subspace
    instead of O(k) (a struct-per-centroid build cost 33 s of py4j
    plan assembly at m=8, k=32)."""
    # One parsed SQL expression: F.lit on a nested 32×8 list costs
    # ~250 ms of py4j conversion EACH (16 call sites → 8 s of plan
    # build); parsing the same literals as SQL text is ~1 ms. The
    # arithmetic mirrors dot(): double casts, sequential left-fold.
    k = len(cents)
    if not all(math.isfinite(x) for c in cents for x in c):
        # non-finite values interpolate as the SQL tokens `nanD`/`infD`
        # (unresolvable columns, not literals) — fail at build time
        # with the cause (round-10 adversarial-embeddings sweep)
        raise ValueError(
            f"PQ subspace {j} codebook contains a non-finite value; "
            "exclude degenerate vectors before training"
        )
    ccs = "array(" + ",".join(f"{float(sum(x * x for x in c))!r}D" for c in cents) + ")"
    vecs = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")" for c in cents
        )
        + ")"
    )
    s = f"slice({vec_col}, {j * sub + 1}, {sub})"
    return F.expr(
        f"transform(sequence(0, {k - 1}), i -> element_at({ccs}, i + 1) - "
        f"2.0D * aggregate(zip_with({s}, element_at({vecs}, i + 1), "
        f"(x, y) -> double(x) * y), 0.0D, (acc, v) -> acc + v))"
    )


def pq_encode(
    df: DataFrame,
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    strict: bool = False,
) -> DataFrame:
    """Map-only PQ encoding: per subspace, the argmin-distance centroid
    id (ties → lowest id). ``m`` int codes replace ``dim`` floats —
    the 100 TB story is 32× memory compression for the candidate
    scan, with no shuffle at encode time.

    Rows that are not finite ``m*sub``-dim vectors are EXCLUDED: a NaN
    component makes every subspace score NaN, array_position misses
    (NaN != NaN) and the code becomes -1 — an ANSI
    INVALID_ARRAY_INDEX at ADC lookup time (round-10
    adversarial-embeddings sweep); no-op on clean corpora. Callers
    that need one output row per input row pass ``strict=True`` to
    raise on the first excluded row instead (the exclusion is
    otherwise silent by design)."""
    sub = len(codebook[0][0])
    codes = []
    for j, cents in enumerate(codebook):
        scores = _pq_scores(vec_col, cents, j, sub)
        # first-minimum position = lowest centroid id on ties (the
        # min value compares bit-equal to itself, so array_position
        # is exact)
        codes.append((F.array_position(scores, F.array_min(scores)) - 1).cast("int"))
    m = len(codebook)
    return _exclude_or_raise(
        df, finite_vec(F.col(vec_col), m * sub), "pq_encode", strict
    ).withColumn(out_col, F.array(*codes))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 5,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strict: bool = False,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k, optionally with an exact
    re-rank stage (the production shape: ADC shortlists ``rerank``
    candidates with m table lookups per pair, then only the shortlist
    pays a full d-float distance).

    Plan shape: encode is map-only; each query precomputes its m×k
    distance table ONCE (bounded side, broadcast); the corpus side then
    streams map-only through the broadcast join — no shuffle of corpus
    data, same scale story as ``cosine_topk_exact`` but with the
    per-pair cost collapsed from O(dim) multiplies to O(m) lookups.
    The re-rank join broadcasts the (queries × rerank)-bounded
    shortlist into a corpus-streaming join.

    Without ``rerank``: returns ``(q_id, rank, c_id, approx_dist)``.
    With it: ``(q_id, rank, c_id, dist)`` where dist is exact squared
    L2. The ADC sum is a static left-fold (fixed FP order) so an
    independent engine reproduces it bit-for-bit.
    """
    from pyspark.sql import Window

    m = len(codebook)
    sub = len(codebook[0][0])
    enc = pq_encode(corpus, codebook, vec_col=vec_col).select(
        F.col(id_col).alias("c_id"), "pq_codes"
    )
    qdt = F.array(
        *[
            _pq_scores(vec_col, cents, j, sub)
            for j, cents in enumerate(codebook)
        ]
    )
    # same inclusion contract as pq_encode: a non-finite query vector
    # yields a NaN distance table and poisons its whole ranking
    # (strict=True raises instead of silently dropping the query)
    q = _exclude_or_raise(
        queries, finite_vec(F.col(vec_col), m * sub), "pq_topk", strict
    ).select(F.col(id_col).alias("q_id"), qdt.alias("qdt"))
    # static unroll: m element_at lookups stay in codegen (no HOF fold)
    score = sum(
        (
            F.element_at(F.element_at(F.col("qdt"), j + 1),
                         F.element_at(F.col("pq_codes"), j + 1) + 1)
            for j in range(m)
        ),
        F.lit(0.0),
    )
    scored = (
        enc.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("approx_dist", score)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("approx_dist").asc(), F.col("c_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if rerank is None:
        return ranked.filter(F.col("rank") <= k).select(
            "q_id", "rank", "c_id", "approx_dist"
        )

    short = ranked.filter(F.col("rank") <= rerank).select("q_id", "c_id")
    ce = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("_ce"))
    qe = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qe"))
    exact = (
        ce.join(F.broadcast(short), "c_id")
        .join(F.broadcast(qe), "q_id")
        .withColumn(
            "dist",
            dot(F.col("_ce"), F.col("_ce"))
            - 2.0 * dot(F.col("_ce"), F.col("_qe"))
            + dot(F.col("_qe"), F.col("_qe")),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("c_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "dist")
    )


def train_pq_codebook(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Lloyd's refinement of the data-derived codebook, all m subspaces
    trained in ONE pass per iteration: a single map-only assignment
    computes every subspace's nearest-centroid code, then one shuffle
    of (subspace, cell, dim-position) partial means — exchanged data is
    O(m × k × dim/m × partitions), independent of corpus size. Empty
    cells keep their previous centroid."""
    book = pq_codebook_from_corpus(corpus, dim, m, k, id_col=id_col, vec_col=vec_col)
    sub = dim // m
    # non-finite / mis-sized rows can't contribute to subspace means
    # (a single NaN poisons avg into NaN centroids -> unparseable SQL
    # literals downstream); no-op on clean corpora
    c = corpus.select(F.col(vec_col).alias("vec")).filter(
        finite_vec(F.col("vec"), dim)
    )
    for _ in range(n_iters):
        enc = pq_encode(c, book, vec_col="vec")
        parts = (
            enc.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(j).alias("j"),
                                F.element_at("pq_codes", j + 1).alias("cell"),
                                _pq_sub(F.col("vec"), j, sub).alias("s"),
                            )
                            for j in range(m)
                        ]
                    )
                ).alias("e")
            )
            .select("e.j", "e.cell", F.posexplode("e.s").alias("pos", "x"))
            .groupBy("j", "cell", "pos")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        new_book = [[list(cent) for cent in cents] for cents in book]
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in parts:
            acc.setdefault((int(r["j"]), int(r["cell"])), {})[int(r["pos"])] = float(
                r["mu"]
            )
        for (j, cell), dims in acc.items():
            new_book[j][cell] = [dims[i] for i in range(sub)]
        book = new_book
    return book


def save_ann_artifacts(
    spark,
    path: str,
    centroids: list[list[float]] | None = None,
    codebook: list[list[list[float]]] | None = None,
) -> None:
    """Persist trained ANN artifacts (IVF coarse centroids and/or a PQ
    codebook) as parquet + a JSON manifest — train once on a corpus
    snapshot, reuse across every subsequent query job (retraining a
    quantizer per query would rescan the corpus for no reason; the
    artifacts are KB-sized).

    Layout: ``<path>/centroids`` holds (cell, pos, v) rows,
    ``<path>/codebook`` holds (subspace, code, pos, v) rows — exploded
    scalar rows rather than array cells so ANY engine (or a plain
    parquet reader) can consume them — plus ``_ann_manifest.json`` with
    the shapes for validation at load time.
    """
    import json
    import os

    if centroids is None and codebook is None:
        raise ValueError("nothing to save")
    os.makedirs(path, exist_ok=True)
    manifest: dict = {}
    if centroids is not None:
        rows = [
            (cell, pos, float(v))
            for cell, vec in enumerate(centroids)
            for pos, v in enumerate(vec)
        ]
        # one slice from the start: createDataFrame().coalesce(1) makes
        # the write task drain defaultParallelism python partitions
        # sequentially — ~5 s per KB-sized artifact on 32 cores
        driver_rows_df(spark, rows, "cell int, pos int, v double").write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "centroids"))
        manifest["centroids"] = {
            "n_cells": len(centroids),
            "dim": len(centroids[0]),
        }
    if codebook is not None:
        rows = [
            (sub, code, pos, float(v))
            for sub, cents in enumerate(codebook)
            for code, vec in enumerate(cents)
            for pos, v in enumerate(vec)
        ]
        driver_rows_df(
            spark, rows, "subspace int, code int, pos int, v double"
        ).write.mode("overwrite").parquet(os.path.join(path, "codebook"))
        manifest["codebook"] = {
            "m": len(codebook),
            "k": len(codebook[0]),
            "sub_dim": len(codebook[0][0]),
        }
    with open(os.path.join(path, "_ann_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


def load_ann_artifacts(
    spark, path: str
) -> tuple[list[list[float]] | None, list[list[list[float]]] | None]:
    """Load artifacts written by :func:`save_ann_artifacts`, validated
    against the manifest shapes. Returns (centroids, codebook), either
    None if absent. Bounded driver data by construction (quantizer
    sizes, not corpus)."""
    import json
    import os

    with open(os.path.join(path, "_ann_manifest.json")) as f:
        manifest = json.load(f)
    centroids = None
    codebook = None
    if "centroids" in manifest:
        meta = manifest["centroids"]
        rows = spark.read.parquet(os.path.join(path, "centroids")).collect()
        centroids = [[0.0] * meta["dim"] for _ in range(meta["n_cells"])]
        for r in rows:
            centroids[r.cell][r.pos] = r.v
        if len(rows) != meta["n_cells"] * meta["dim"]:
            raise ValueError("centroid artifact shape mismatch vs manifest")
    if "codebook" in manifest:
        meta = manifest["codebook"]
        rows = spark.read.parquet(os.path.join(path, "codebook")).collect()
        codebook = [
            [[0.0] * meta["sub_dim"] for _ in range(meta["k"])]
            for _ in range(meta["m"])
        ]
        for r in rows:
            codebook[r.subspace][r.code][r.pos] = r.v
        if len(rows) != meta["m"] * meta["k"] * meta["sub_dim"]:
            raise ValueError("codebook artifact shape mismatch vs manifest")
    return centroids, codebook


def kmeans_fixed_point(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    scale: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    large_k_threshold: int = LARGE_K_CODEGEN_THRESHOLD,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Lloyd's k-means in FIXED-POINT integer arithmetic — the
    bit-exact companion to :func:`train_ivf_centroids` (which is
    reproducible only up to float partial-sum order): embeddings are
    quantized once to an integer grid (``round(x · scale)`` — the
    multiply is exact because ``scale`` is a power of two, and both
    Spark and DuckDB round half away from zero), after which every
    step — squared L2 distances, argmin assignment (ties → lowest
    centroid id), member means under truncating integer division,
    and the empty-cluster keep-previous rule — is exact integer math
    that any engine reproduces bit-identically. Quantized k-means is
    standard practice at retrieval scale (the PQ/IVF literature
    trains coarse quantizers on compressed representations); here it
    additionally makes an ITERATIVE algorithm oracle-checkable.

    Seeds are the ``k`` lowest-id vectors. Returns one row per vector
    with its final cluster and integer squared distance.

    Scale shape per iteration: ONE map-only assignment pass over
    literal centroid arrays (no join — the corpus never shuffles for
    assignment), then one (k × dim)-keyed aggregation with map-side
    combine; only k × dim (cid, dim, sum, count) aggregate rows ever
    reach the driver between iterations (bounded by construction,
    like train_ivf_centroids). The FINAL returned plan is a
    zero-shuffle codegen projection. Overflow bound: |v| ≤ scale·max|x|,
    so Σ_dim (Δv)² ≤ dim·(2·scale·max|x|)² must stay under 2⁶³ —
    at scale 2²⁰, dim 64, |x| ≤ 1 that is ~3·10¹⁴, five orders of
    magnitude of headroom.

    k ceiling: below ``large_k_threshold`` the assignment unrolls one
    expression subtree per centroid (fastest — codegen constant-folds
    the literals, but generated code grows O(k·dim)); at or past it,
    centroids ride in a single array Literal and one indexed
    ``transform`` lambda is the only generated code, so any k works
    without hitting Janino's method-size limit. Both paths are exact
    integer math and bit-identical (pinned by test).

    ``centroids`` (trained by :func:`train_kmeans_centroids`, possibly
    persisted/reloaded via :func:`save_kmeans_centroids` /
    :func:`load_kmeans_centroids`) skips training entirely — the
    train-once-assign-many flow a 100 TB pipeline actually runs, and
    bit-identical to inline training because the fixed-point centroids
    are exact integers that round-trip losslessly. ``k``/``iters`` are
    ignored when centroids are supplied."""
    q = _kmeans_quantize(corpus, scale, id_col, vec_col)
    if centroids is None:
        centroids = train_kmeans_centroids(
            corpus,
            k=k,
            iters=iters,
            scale=scale,
            id_col=id_col,
            vec_col=vec_col,
            large_k_threshold=large_k_threshold,
        )
    final = _kmeans_best_of(centroids, large_k_threshold)
    return q.select(
        F.col(id_col),
        F.inline(
            F.array(
                F.struct(
                    final["cid"].alias("cluster_id"),
                    final["d"].alias("dist_sq"),
                )
            )
        ),
    )


def _kmeans_quantize(
    corpus: DataFrame, scale: int, id_col: str, vec_col: str
) -> DataFrame:
    """The exact fixed-point grid projection shared by the k-means
    trainer and assigner (round half away from zero, then long).

    Rows whose vector can't live on the grid are EXCLUDED before the
    cast: a NaN/Inf component or a magnitude past 2^62/scale is an
    ANSI CAST_OVERFLOW job failure in the DOUBLE→BIGINT projection
    (round-10 adversarial-embeddings sweep; 2^62 leaves a 2× margin
    under the BIGINT ceiling for the round-half-up). Exclusion is the
    contract for both training and assignment — shared here so they
    can never disagree; no-op on clean corpora."""
    bound = float((1 << 62) / scale)
    ok = F.col(vec_col).isNotNull() & ~F.exists(
        F.col(vec_col),
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) >= F.lit(bound)),
    )
    # try_cast, NOT cast: the exclusion filter above is not enough on
    # its own, because Catalyst's InferFiltersFromGenerate sees a
    # downstream posexplode(__v), infers `size(__v) > 0`, substitutes
    # __v's defining transform, and lands the UNGUARDED cast in the
    # same Filter as the exclusion predicate — and conjunct evaluation
    # order is not a contract (Spark assumes expressions are
    # side-effect-free; under ANSI a throwing cast isn't). try_cast
    # makes the expression total — bit-identical for every value the
    # filter admits (|x·scale| < 2^62 cannot overflow), NULL for rows
    # the filter rejects anyway. Round-10 adversarial-embeddings
    # sweep: CAST_OVERFLOW thrown from inside the inferred conjunct.
    return corpus.filter(ok).select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x * F.lit(float(scale))).try_cast("long"),
        ).alias("__v"),
    )


def _kmeans_best_of(
    cs: list[list[int]], large_k_threshold: int
) -> F.Column:
    """(dist_sq, cid) argmin struct over the quantized ``__v`` column —
    ties break to the lowest centroid id via (d, cid) min. Unrolled
    per-centroid subtrees below ``large_k_threshold``, one array
    Literal + indexed transform at or past it (identical integer
    math)."""

    def _sq_dist(carr: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(F.col("__v"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    if len(cs) < large_k_threshold:
        structs = [
            F.struct(
                _sq_dist(
                    F.array(*[F.lit(int(x)).cast("long") for x in c])
                ).alias("d"),
                F.lit(cid).cast("int").alias("cid"),
            )
            for cid, c in enumerate(cs)
        ]
        return F.array_min(F.array(*structs))
    cvecs = F.lit([[int(x) for x in c] for c in cs]).cast(
        "array<array<bigint>>"
    )
    return F.array_min(
        F.transform(
            cvecs,
            lambda cv, i: F.struct(
                _sq_dist(cv).alias("d"), i.cast("int").alias("cid")
            ),
        )
    )


def train_kmeans_centroids(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    scale: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    large_k_threshold: int = LARGE_K_CODEGEN_THRESHOLD,
) -> list[list[int]]:
    """The Lloyd trainer behind :func:`kmeans_fixed_point`, exposed so
    a pipeline can train ONCE, persist the integer centroids
    (:func:`save_kmeans_centroids`), and run every downstream
    assignment/profiling/sampling job from the artifact — the same
    train-once flow as :func:`train_ivf_centroids`, but bit-exact:
    every step is integer math, so the trained centroids are
    partition-layout- and engine-independent.

    Scale shape per iteration: ONE map-only assignment pass over
    literal centroid arrays (no join — the corpus never shuffles for
    assignment), then one (k × dim)-keyed aggregation with map-side
    combine; only k × dim (cid, dim, sum, count) aggregate rows ever
    reach the driver between iterations (bounded by construction)."""
    q = _kmeans_quantize(corpus, scale, id_col, vec_col)
    seeds = q.orderBy(id_col).limit(k).collect()
    cents = [list(r["__v"]) for r in seeds]
    if not cents:
        # training is the one operation that genuinely cannot produce
        # an empty-but-valid result — fail with the contract, not an
        # IndexError (round-10 empty-input sweep)
        raise ValueError(
            f"cannot train k-means: corpus has 0 rows with a non-NULL "
            f"'{vec_col}' (k={k})"
        )
    dim = len(cents[0])

    for _ in range(iters):
        assigned = q.select(
            "__v", _kmeans_best_of(cents, large_k_threshold)["cid"].alias("__cid")
        )
        agg = (
            assigned.select(
                "__cid", F.posexplode("__v").alias("__i", "__x")
            )
            .groupBy("__cid", "__i")
            .agg(F.sum("__x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, tuple[int, int]]] = {}
        for r in agg:
            by_cid.setdefault(r["__cid"], {})[r["__i"]] = (r["s"], r["n"])
        nxt = []
        for cid, prev in enumerate(cents):
            dims = by_cid.get(cid)
            if not dims:
                nxt.append(prev)  # empty cluster keeps its centroid
            else:
                # truncating integer division (matches SQL DIV / //)
                nxt.append(
                    [
                        (abs(s) // n) * (1 if s >= 0 else -1)
                        for s, n in (dims[i] for i in range(dim))
                    ]
                )
        cents = nxt
    return cents


def save_kmeans_centroids(
    spark,
    path: str,
    centroids: list[list[int]],
    scale: int,
    iters: int,
) -> None:
    """Persist fixed-point k-means centroids as a reusable artifact
    (parquet long rows + JSON manifest — the same shape as
    :func:`save_ann_artifacts`). Integer centroids round-trip through
    parquet losslessly, so an assignment from the loaded artifact is
    bit-identical to one from the in-memory trainer output."""
    import json
    import os

    rows = [
        (cid, pos, int(v))
        for cid, vec in enumerate(centroids)
        for pos, v in enumerate(vec)
    ]
    driver_rows_df(spark, rows, "cid int, pos int, v long").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "kmeans_centroids"))
    manifest = {
        "kmeans": {
            "k": len(centroids),
            "dim": len(centroids[0]),
            "scale": int(scale),
            "iters": int(iters),
        }
    }
    with open(os.path.join(path, "_kmeans_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


def load_kmeans_centroids(spark, path: str) -> tuple[list[list[int]], int]:
    """Load (centroids, scale) written by :func:`save_kmeans_centroids`,
    validated against the manifest shape. Bounded driver data by
    construction (k × dim longs, not corpus)."""
    import json
    import os

    with open(os.path.join(path, "_kmeans_manifest.json")) as f:
        meta = json.load(f)["kmeans"]
    rows = spark.read.parquet(
        os.path.join(path, "kmeans_centroids")
    ).collect()
    if len(rows) != meta["k"] * meta["dim"]:
        raise ValueError("kmeans artifact shape mismatch vs manifest")
    cents = [[0] * meta["dim"] for _ in range(meta["k"])]
    for r in rows:
        cents[r.cid][r.pos] = int(r.v)
    return cents, int(meta["scale"])


def int8_quantize_report(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector affine int8 quantization with a reconstruction-error
    report — the standard vector-compression stage before ANN at scale
    (4x smaller than float32; FAISS's SQ8, Milvus/pgvector int8):
    each vector is mapped to codes ``q_i = round((x_i − min) / s)``
    with ``s = (max − min)/255``, reconstructed as ``min + q_i·s``, and
    scored by its max absolute error and MSE so a pipeline can decide
    whether SQ8 recall is acceptable before re-encoding a corpus.

    Constant vectors (max == min) quantize to all-zero codes with zero
    error (s = 0 guard). Every step is a let-bound map-only array
    expression — min/max/scale evaluate ONCE per row (the _bind rule:
    a bare array_min referenced inside a transform lambda would
    re-evaluate per ELEMENT, turning O(dim) into O(dim²)) — and the
    float sequence (subtract, divide, round-half-away, multiply, add)
    is identical in DuckDB, so the report is oracle-exact. Zero
    shuffles; at 100 TB this is scan-bound, like every quantizer
    encode pass.
    """
    from etl_global_mobility_spark.operators.text import _bind

    # float32 storage widens to double ONCE, before any arithmetic —
    # float-vs-double op parity between engines is not a given, but
    # f32→f64 widening is exact and identical everywhere
    v = F.col(vec_col).cast("array<double>")

    def with_stats(vv):
        return _bind(
            F.array_min(vv),
            lambda mn: _bind(
                (F.array_max(vv) - mn) / F.lit(255.0),
                lambda s: _bind(
                    F.zip_with(
                        vv,
                        F.transform(
                            vv,
                            lambda x: F.when(s == 0.0, F.lit(0.0)).otherwise(
                                F.round((x - mn) / s)
                            ),
                        ),
                        lambda x, q: F.abs(x - (mn + q * s)),
                    ),
                    lambda errs: F.struct(
                        mn.alias("vmin"),
                        (mn + s * F.lit(255.0)).alias("vmax"),
                        s.alias("qscale"),
                        F.array_max(errs).alias("max_abs_err"),
                        (
                            F.aggregate(
                                errs,
                                F.lit(0.0),
                                lambda acc, e: acc + e * e,
                            )
                            / F.size(errs).cast("double")
                        ).alias("mse"),
                    ),
                ),
            ),
        )

    return corpus.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        F.inline(F.array(with_stats(v))),
    )
