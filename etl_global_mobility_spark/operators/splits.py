"""Deterministic dataset splitting for training pipelines.

``randomSplit``/``sample`` are the wrong tool for splitting a 100 TB
training corpus: their RNG draws depend on partition layout, so the
same document can land in train on one run and test on the next (data
leakage across experiments). The production recipe is a content-stable
hash split: bucket = hash(id) mod 100, fixed bucket ranges per split.
Same id → same split, forever, on any cluster size, with no shuffle
(the split column is a map-side expression) — and it is portable
(md5-based), so an independent engine assigns identical splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.dedup import _md5_band_hash

#: (name, percent) — must sum to 100.
DEFAULT_FRACTIONS = (("train", 80), ("valid", 10), ("test", 10))


def split_column(
    id_col: Column | str,
    fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    seed: int = 0,
) -> Column:
    """Split-name column from a stable md5 bucket of ``id_col``."""
    if sum(p for _, p in fractions) != 100:
        raise ValueError(f"fractions must sum to 100: {fractions}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = _md5_band_hash(c.cast("string"), seed) % 100
    expr = None
    cum = 0
    for name, pct in fractions[:-1]:
        cum += pct
        expr = (
            F.when(bucket < cum, name)
            if expr is None
            else expr.when(bucket < cum, name)
        )
    last = fractions[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    seed: int = 0,
) -> DataFrame:
    """Attach a deterministic ``split`` column (map-side, no shuffle)."""
    return df.withColumn("split", split_column(id_col, fractions, seed))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its stable md5
    bucket (0‥9999) falls under its stratum's rate — e.g. downsample
    over-represented languages while keeping rare ones whole, the
    standard corpus-rebalancing step before training.

    Unlike ``df.sampleBy``, the decision is a pure function of the row
    id: reproducible across runs, cluster sizes, and partition layouts,
    and engine-portable (md5). Map-side filter — no shuffle, and with a
    distinct ``seed`` per sampling purpose, decisions are independent
    of :func:`hash_split` buckets (reusing one hash for both would make
    "the sample" and "the test split" correlated subsets).

    Rates are resolved per-row from a map literal; strata not listed in
    ``rates`` fall back to ``default_rate``.
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate out of [0,1] for {name!r}: {r}")
    bucket = _md5_band_hash(F.col(id_col).cast("string"), seed) % 10_000
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    rate = F.coalesce(
        F.element_at(rate_map, F.col(strata_col)), F.lit(float(default_rate))
    )
    return df.filter(bucket < (rate * 10_000).cast("bigint"))


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    target_fraction: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_count_col: Column | None = None,
    seed: int = 2,
) -> DataFrame:
    """Data mixing: compute per-source sampling rates that reshape the
    corpus toward a target token mixture, then apply them with the
    deterministic md5 sample — the curation step that turns "what we
    crawled" into "what we train on" (cf. the published mixture tables
    of Gopher/LLaMA-class training sets).

    Given target weights w_s and a global token budget
    ``target_fraction × total_tokens``, each source's rate is
    ``min(1, budget·w_s/Σw / tokens_s)`` — over-represented sources are
    downsampled toward their share, under-represented ones are kept
    whole (rates are capped at 1; this op never upsamples).

    Scale shape: one hash aggregation over the bounded source key for
    the token totals, a single-row grand-total aggregate, a broadcast
    join of the tiny per-source rate frame back onto the corpus, and a
    map-side hash filter. No corpus-sized shuffle at any step.

    Normalized weights are computed driver-side in Python (they are
    configuration, not data); everything data-dependent uses exact
    BIGINT token sums and single IEEE divisions, so an independent
    engine reproduces rates — and therefore the sample — bit-for-bit.

    Returns the kept rows with ``n_tokens``, ``rate`` attached.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(f"target_fraction out of (0,1]: {target_fraction}")
    total_w = sum(weights.values())
    wn = {s: w / total_w for s, w in weights.items()}

    from etl_global_mobility_spark.operators.text import token_count

    n_tokens = (
        token_count("text") if token_count_col is None else token_count_col
    )
    with_tok = df.withColumn("n_tokens", n_tokens)
    per_source = with_tok.groupBy(source_col).agg(
        F.sum("n_tokens").alias("src_tokens")
    )
    grand = per_source.agg(F.sum("src_tokens").alias("total_tokens"))
    # map literal pairwise: key, value, key, value, ...
    pairs = []
    for s, w in wn.items():
        pairs.append(F.lit(s))
        pairs.append(F.lit(float(w)))
    w_map = F.create_map(*pairs)
    rates = (
        per_source.crossJoin(F.broadcast(grand))
        .withColumn("w", F.coalesce(F.element_at(w_map, F.col(source_col)), F.lit(0.0)))
        .withColumn(
            "rate",
            # a source with ZERO countable tokens has no token mass for
            # the budget to allocate: rate 0 (dropped). Unguarded, the
            # division is an ANSI DIVIDE_BY_ZERO crash — and DuckDB's
            # least(1.0, x/0=NULL) would silently give 1.0 (least
            # ignores NULLs), the opposite answer.
            F.when(
                F.col("src_tokens") > 0,
                F.least(
                    F.lit(1.0),
                    (
                        F.lit(float(target_fraction))
                        * F.col("total_tokens").cast("double")
                        * F.col("w")
                    )
                    / F.col("src_tokens").cast("double"),
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select(source_col, "rate")
    )
    bucket = _md5_band_hash(F.col(id_col).cast("string"), seed) % 10_000
    return (
        with_tok.join(F.broadcast(rates), source_col)
        .filter(bucket.cast("double") / F.lit(10_000.0) < F.col("rate"))
    )


def temperature_mix(
    df: DataFrame,
    temperature: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_count_col: Column | None = None,
    seed: int = 4,
) -> DataFrame:
    """Temperature-scaled source balancing (the multilingual /
    multi-source flattening of mT5 / XLM-R-class training mixtures):
    resample so the expected token share of source *s* follows
    ``p_s^T`` instead of its natural share ``p_s`` — ``T = 1`` keeps
    the natural mixture, ``T → 0`` approaches uniform tokens per
    source, intermediate ``T`` up-weights the tail without starving
    the head.

    Derivation (no upsampling): target share ``q_s ∝ p_s^T`` needs
    keep-rate ``∝ q_s / t_s ∝ t_s^(T-1)``; scaling so the largest rate
    is exactly 1 gives ``rate_s = (t_min / t_s)^(1-T)`` with ``t_min``
    the SMALLEST source's token count — the rarest source is kept
    whole, every other source is flattened toward it. This closed form
    avoids normalizing by ``Σ t^T`` (a float sum whose partial order
    differs between engines); for the default ``T = 0.5`` the rate is
    ``sqrt(t_min/t_s)``: one exact-rounded division + one
    correctly-rounded sqrt, so an independent engine reproduces every
    rate — and therefore the md5 sample — bit-for-bit. (Other
    temperatures go through ``pow``, which carries no cross-platform
    exactness guarantee; same semantics, weaker reproducibility.)

    Scale shape: one hash aggregation on the bounded source key, a
    1-row broadcast of the min, a broadcast rate join, map-side md5
    filter. No corpus-sized shuffle.

    Returns kept rows with ``n_tokens`` and ``rate`` attached.
    """
    if not 0.0 <= temperature <= 1.0:
        raise ValueError(f"temperature out of [0,1]: {temperature}")
    from etl_global_mobility_spark.operators.text import token_count

    n_tokens = (
        token_count("text") if token_count_col is None else token_count_col
    )
    with_tok = df.withColumn("n_tokens", n_tokens)
    per_source = with_tok.groupBy(source_col).agg(
        F.sum("n_tokens").alias("src_tokens")
    )
    # t_min over sources WITH token mass: a zero-token source must not
    # zero every other source's rate (its p_s^T share is 0 regardless),
    # and its own 0/0 ratio would ANSI-throw — it gets rate 0
    # (dropped: no token mass to balance), consistently at every T.
    tmin = per_source.filter(F.col("src_tokens") > 0).agg(
        F.min("src_tokens").alias("min_tokens")
    )
    ratio = (
        F.col("min_tokens").cast("double") / F.col("src_tokens").cast("double")
    )
    if temperature == 0.5:
        rate_expr = F.sqrt(ratio)
    elif temperature == 1.0:
        rate_expr = F.lit(1.0)
    elif temperature == 0.0:
        rate_expr = ratio
    else:
        rate_expr = F.pow(ratio, F.lit(1.0 - temperature))
    rates = (
        per_source.crossJoin(F.broadcast(tmin))
        .withColumn(
            "rate",
            F.when(F.col("src_tokens") > 0, rate_expr).otherwise(F.lit(0.0)),
        )
        .select(source_col, "rate")
    )
    bucket = _md5_band_hash(F.col(id_col).cast("string"), seed) % 10_000
    return with_tok.join(F.broadcast(rates), source_col).filter(
        bucket.cast("double") / F.lit(10_000.0) < F.col("rate")
    )


def cap_per_stratum(
    df: DataFrame,
    strata_col: str,
    max_rows: int,
    id_col: str = "doc_id",
    seed: int = 3,
) -> DataFrame:
    """Hard cap: at most ``max_rows`` rows per stratum, chosen by a
    deterministic md5 order (hash of id, tie id) — the "no single
    source dominates" curation policy. Unlike rate-based sampling
    (:func:`stratified_hash_sample` / :func:`mix_sources`), the bound
    is exact, partition-layout-independent, and reproducible.

    One shuffle on the stratum key; the per-group limit prunes
    map-side (WindowGroupLimit pushes rank<=k before the exchange).
    """
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1: {max_rows}")
    from pyspark.sql import Window

    order_key = _md5_band_hash(F.col(id_col).cast("string"), seed)
    rk = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(order_key, F.col(id_col))
    )
    return df.withColumn("_rk", rk).filter(F.col("_rk") <= max_rows).drop("_rk")


def preference_pairs(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    score_col: str = "quality_logit",
) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training:
    within each group (prompt, source bucket, ...), pair the
    highest-scored example (*chosen*) against the lowest-scored
    (*rejected*), with the score margin.

    Deterministic ordering contract: chosen = first by (score DESC,
    id ASC); rejected = first by (score ASC, id DESC) — with ≥ 2 rows
    the two are distinct even when every score ties. NULL scores are
    excluded BEFORE ranking: engines disagree on NULL ordering
    placement (Spark NULLS FIRST asc vs DuckDB NULLS LAST), and an
    unevaluable example belongs in no pair anyway. Groups with < 2
    scored rows emit nothing.

    Scale shape: ONE exchange on the group key — chosen and rejected
    are the max and min of a lexicographically-ordered (score, -id)
    struct, so the whole operator is a single hash aggregation with
    map-side partial combine (each partition reduces to at most one
    candidate pair per group before the shuffle). No windows, no
    self-join; output ∝ groups.
    """
    base = df.filter(F.col(score_col).isNotNull())
    pick = F.struct(
        F.col(score_col).alias("s"), (-F.col(id_col)).alias("neg_id")
    )
    # struct ordering is lexicographic: max (s, -id) = highest score
    # then SMALLEST id; min (s, -id) = lowest score then LARGEST id —
    # exactly the (score DESC, id ASC) / (score ASC, id DESC) contract
    agg = (
        base.groupBy(*group_cols)
        .agg(
            F.max(pick).alias("__c"),
            F.min(pick).alias("__r"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= 2)
    )
    return agg.select(
        *group_cols,
        (-F.col("__c.neg_id")).alias("chosen_id"),
        (-F.col("__r.neg_id")).alias("rejected_id"),
        (F.col("__c.s") - F.col("__r.s")).alias("margin"),
    )


def token_budget_sample(
    docs: DataFrame,
    token_budget: int,
    n_shards: int = 8,
    seed: int = 11,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic token-budget corpus cut: md5-shuffle documents
    into ``n_shards`` pseudo-random shards, give each shard an equal
    share of the budget, and keep each shard's hash-ordered prefix
    while the running token total stays within that share — how a
    100 TB corpus is trimmed to a fixed training budget (say 1 T
    tokens) WITHOUT a global sort: the only shuffle keys on the
    shard (n_shards reducers, uniformly loaded by the hash), and the
    cumulative-sum window is per-shard, never single-task. The cut is
    a pure function of (id, seed): reproducible across runs, cluster
    sizes, and partition layouts, and engine-portable (md5 ordering).

    Prefix rule: a document is kept iff the running total INCLUDING it
    is ≤ the shard budget — later, smaller documents past the first
    overflow are excluded too (deterministic, and what a streaming
    writer does). Returns kept rows with shard, hash-order position,
    and running token totals.
    """
    if token_budget <= 0 or n_shards <= 0:
        raise ValueError(f"positive budget/shards: {token_budget}/{n_shards}")
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash
    from etl_global_mobility_spark.operators.text import token_count

    per_shard = token_budget // n_shards
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = (
        _md5_band_hash(F.col(id_col).cast("string"), seed + 1)
        % F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        docs.select(
            F.col(id_col),
            token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
            key.alias("sort_key"),
            shard.alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("cum_tokens") <= per_shard)
        .select(id_col, "shard", "pos", "n_tokens", "cum_tokens")
    )


def epoch_plan(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The training "data recipe" table (the per-source
    sampling-proportion/epochs accounting published for LLaMA-class
    mixtures): given target mixture weights and a total token budget,
    report for every source its available tokens, target token share,
    and the number of EPOCHS the budget implies — epochs > 1 flags the
    sources the run will repeat (the overfitting watch-list), epochs
    < 1 the ones it undersamples.

    Scale shape: one bounded-key aggregation over the corpus (exact
    BIGINT token sums), then pure literal arithmetic — the weight map
    is configuration. target_tokens = budget · w_s/Σw and epochs =
    target/available are each ONE double operation on exact integers,
    so an independent engine reproduces the plan bit-for-bit. Sources
    absent from ``weights`` get weight 0; weight keys absent from the
    corpus are a configuration error and raise.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive: {token_budget}")
    if not weights:
        raise ValueError("weights must be non-empty")
    total_w = sum(weights.values())
    wn = {s: w / total_w for s, w in weights.items()}
    from etl_global_mobility_spark.operators.text import token_count

    per_source = (
        df.select(
            F.col(source_col).alias("source"),
            token_count(F.col(text_col)).cast("bigint").alias("_t"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").alias("src_tokens"),
        )
    )
    present = {r["source"] for r in per_source.select("source").collect()}
    missing = sorted(set(wn) - present)
    if missing:
        raise ValueError(f"weight keys not in corpus: {missing}")
    pairs = []
    for s, w in wn.items():
        pairs.append(F.lit(s))
        pairs.append(F.lit(float(w)))
    w_map = F.create_map(*pairs)
    weight = F.coalesce(F.element_at(w_map, F.col("source")), F.lit(0.0))
    target = F.lit(float(token_budget)) * weight
    return per_source.select(
        "source",
        "n_docs",
        "src_tokens",
        weight.alias("weight"),
        target.alias("target_tokens"),
        # a zero-token source has no defined epoch count (any budget
        # implies infinitely many passes over nothing): NULL, matching
        # DuckDB's x/0 → NULL — unguarded, Spark ANSI throws instead
        F.when(
            F.col("src_tokens") > 0,
            target / F.col("src_tokens").cast("double"),
        ).alias("epochs"),
    )


#: ChatML-style special tokens for SFT rendering (public convention
#: popularized by the OpenAI ChatML spec; any template works — these
#: are literals shared verbatim with the oracle SQL).
CHAT_BOS = "<|im_start|>"
CHAT_EOS = "<|im_end|>"


def sft_chat_format(
    df: DataFrame,
    system_prompt: str = "You are a helpful assistant.",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Render documents into ChatML-style supervised-fine-tuning
    examples and compute the loss-mask boundary. Each document
    becomes a single-turn conversation: a literal system prompt, a
    synthesized user instruction derived from the document's metadata
    (language + source — the instruction-synthesis step of
    self-instruct-style pipelines), and the document text as the
    assistant completion. The output carries the fully rendered
    training string plus ``prompt_tokens`` / ``completion_tokens`` —
    the span arithmetic a trainer needs to mask loss over the prompt
    (only assistant tokens receive gradient) — and the loss fraction
    as a packing-efficiency signal.

    Scale shape: pure map-side string concatenation + array token
    counts inside one codegen projection over the scan — zero
    shuffles at any corpus size. All counts are integers; the single
    double op is the loss-fraction division (guarded for empty
    renders)."""
    nl = "\n"
    prompt_part = F.concat(
        F.lit(CHAT_BOS + "system" + nl + system_prompt + CHAT_EOS + nl),
        F.lit(CHAT_BOS + "user" + nl + "Summarize the following "),
        F.col("lang"),
        F.lit(" document from "),
        F.col("source"),
        F.lit("." + CHAT_EOS + nl),
        F.lit(CHAT_BOS + "assistant" + nl),
    )
    completion_part = F.concat(F.col(text_col), F.lit(CHAT_EOS))
    from etl_global_mobility_spark.operators.text import token_count

    return df.select(
        F.col(id_col),
        F.concat(prompt_part, completion_part).alias("rendered"),
        token_count(prompt_part).alias("prompt_tokens"),
        token_count(completion_part).alias("completion_tokens"),
    ).select(
        id_col,
        "rendered",
        "prompt_tokens",
        "completion_tokens",
        (F.col("prompt_tokens") + F.col("completion_tokens")).alias(
            "total_tokens"
        ),
        (
            F.col("completion_tokens").cast("double")
            / F.greatest(
                (F.col("prompt_tokens") + F.col("completion_tokens")),
                F.lit(1),
            ).cast("double")
        ).alias("loss_fraction"),
    )


def weighted_sample_with_replacement(
    df: DataFrame,
    k: int,
    seed: int = 0,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic weighted sampling WITH replacement by inverse-CDF
    over exact integer cumulative weights: document i owns the global
    position interval ``[cum_i - w_i, cum_i)``; draw j lands at
    ``t_j = hash(seed, j) mod total_weight``; the owner of ``t_j`` is
    the sample. Every quantity is integer arithmetic on a portable md5
    hash, so the sample is a pure function of (ids, weights, seed) —
    reproducible across runs, cluster sizes, partition layouts, and
    engines (no transcendentals: the classic exponential-key scheme
    u^(1/w) needs ln/pow, whose last-ulp behavior differs across math
    libraries; inverse-CDF on integers is bit-exact everywhere).

    Scale shape: the cumulative sum is NEVER a single-task global
    window — documents are md5-bucketed into ``n_shards`` shards, the
    running sum is per-shard (uniform reducers), and shard offsets are
    composed from the n_shards-row totals frame (a BOUNDED collect —
    rows = n_shards, never corpus-sized). The draw lookup broadcasts
    the k-row draws frame against the interval frame (bounded
    broadcast: k rows). For k beyond broadcast size, equi-bucket the
    positions by ``t DIV stride`` first; at corpus-sample sizes the
    bounded nested-loop is one map-only pass.

    Rows with NULL or non-positive weight are excluded (they own an
    empty interval by definition). Returns one row per draw:
    (draw_id, id, weight, t).
    """
    if k <= 0 or n_shards <= 0:
        raise ValueError(f"positive k/n_shards required: {k}/{n_shards}")
    spark = df.sparkSession
    sort_key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    shard = (
        _md5_band_hash(F.col(id_col).cast("string"), seed + 1)
        % F.lit(n_shards)
    ).cast("int")
    base = (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("bigint").alias("w"),
            sort_key.alias("sort_key"),
            shard.alias("shard"),
        )
        .filter(F.col("w") > 0)
    )
    # Shard totals come from a PLAIN aggregation on the base frame —
    # not from max(cum_hi) — so the corpus-sized windowed frame is
    # never materialized twice (nor checkpointed): the window runs
    # exactly once, inside the final interval plan.
    totals = {
        r["shard"]: r["t"]
        for r in base.groupBy("shard").agg(F.sum("w").alias("t")).collect()
    }  # bounded collect: ≤ n_shards rows
    wspec = Window.partitionBy("shard").orderBy("sort_key", id_col)
    cum = base.withColumn(
        "cum_hi",
        F.sum("w").over(
            wspec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    offsets: dict[int, int] = {}
    acc = 0
    for s in sorted(totals):
        offsets[s] = acc
        acc += totals[s]
    total_weight = acc
    if total_weight <= 0:
        if df.select(id_col).take(1):
            # non-empty input with zero positive mass is a CONFIG/DATA
            # bug (wrong weight column, all-zero weights) — fail loud
            raise ValueError("no rows with positive weight to sample from")
        # sampling from an EMPTY population is well-defined: the empty
        # sample, in the contract schema (round-10 empty-input sweep)
        return df.limit(0).select(
            F.lit(0).cast("bigint").alias("draw_id"),
            F.col(id_col),
            F.lit(0).cast("bigint").alias("weight"),
            F.lit(0).cast("bigint").alias("t"),
        )
    om = F.create_map(
        *[x for s in sorted(offsets) for x in (F.lit(s), F.lit(offsets[s]))]
    )
    intervals = cum.select(
        F.col(id_col),
        F.col("w"),
        (F.element_at(om, F.col("shard")) + F.col("cum_hi")).alias("hi"),
    ).withColumn("lo", F.col("hi") - F.col("w"))
    draws = spark.range(k).select(
        F.col("id").alias("draw_id"),
        (
            _md5_band_hash(F.col("id").cast("string"), seed + 2)
            % F.lit(total_weight)
        ).alias("t"),
    )
    return intervals.join(
        F.broadcast(draws),
        (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")),
    ).select("draw_id", id_col, F.col("w").alias("weight"), "t")


def group_advantage(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    reward_col: str = "reward",
    micro: int = 1_000_000,
) -> DataFrame:
    """GRPO-style group-relative advantage: standardize each example's
    reward against ITS GROUP's mean and population std —
    ``adv = (r - mean_g) / std_g`` — the policy-gradient baseline that
    group-relative methods (GRPO; also best-of-n re-weighting) use in
    place of a learned value model. Groups are prompts; rows are the
    sampled responses.

    Engine-portable float discipline: rewards are first fixed-pointed
    to integer micro-units (``floor(r * micro)`` — IEEE multiply then
    floor, identical everywhere; NOT a bare double→BIGINT cast, which
    truncates in Spark but rounds in DuckDB), so the group
    moments are EXACT integer/decimal sums with no accumulation-order
    sensitivity, and the advantage is computed as
    ``(n·r_i - Σr) / sqrt(n·Σr² - (Σr)²)`` — a single double division
    + sqrt on exact integers, the same op sequence in any engine.
    Zero-variance groups (all rewards equal, incl. singleton groups)
    emit advantage 0.0 by definition rather than NaN.

    Scale shape: one hash aggregation on the group key (map-side
    partial moments) broadcast-joined back to the rows — rewards need
    only two exact accumulators (Σr, Σr²) per group; no window, no
    sort, group count ∝ prompts.
    """
    r_us = F.floor(
        F.col(reward_col).cast("double") * F.lit(float(micro))
    ).cast("bigint")
    base = df.filter(F.col(reward_col).isNotNull()).select(
        *group_cols, F.col(id_col), r_us.alias("_r")
    )
    moments = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_r").alias("_s"),
        F.sum(F.col("_r").cast("decimal(38,0)") * F.col("_r")).alias("_s2"),
    )
    joined = base.join(moments, on=group_cols)
    num = (F.col("_n") * F.col("_r") - F.col("_s")).cast("double")
    disc = (
        F.col("_n").cast("decimal(38,0)") * F.col("_s2")
        - F.col("_s").cast("decimal(38,0)") * F.col("_s")
    )
    adv = F.when(disc <= 0, F.lit(0.0)).otherwise(
        num / F.sqrt(disc.cast("double"))
    )
    return joined.select(
        *group_cols,
        id_col,
        (F.col("_r").cast("double") / F.lit(float(micro))).alias("reward_us"),
        adv.alias("advantage"),
        F.col("_n").alias("group_n"),
    )


def rejection_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    score_col: str = "reward",
) -> DataFrame:
    """Best-of-n rejection sampling (the RLHF data-collection recipe:
    sample n responses per prompt, keep the reward-argmax): per group,
    emit the CHOSEN response (first by score DESC, id ASC), the
    RUNNER-UP (second by the same order — the margin baseline), the
    chosen-vs-runner-up margin, and the candidate count. Singleton
    groups keep their only response with NULL runner-up/margin.
    NULL scores are excluded before ranking (engines disagree on NULL
    placement, and an unscored response belongs in no pool).

    Distinct from :func:`preference_pairs` (max vs MIN — the DPO pair)
    — rejection sampling measures how decisive the argmax was against
    the NEXT-best, not the worst.

    Scale shape: one rank window partitioned on the group key (never
    unpartitioned), rows cut to rank ≤ 2 immediately, then a bounded
    per-group conditional aggregation; output ∝ groups. The margin is
    one double subtraction — identical everywhere.
    """
    base = df.filter(F.col(score_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = (
        base.select(*group_cols, id_col, score_col)
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
    )
    pick = F.struct(F.col(id_col).alias("i"), F.col(score_col).alias("s"))
    agg = ranked.groupBy(*group_cols).agg(
        F.max(F.when(F.col("_rn") == 1, pick)).alias("_c"),
        F.max(F.when(F.col("_rn") == 2, pick)).alias("_r"),
        F.max("_n").alias("n_candidates"),
    )
    return agg.select(
        *group_cols,
        F.col("_c.i").alias("chosen_id"),
        F.col("_c.s").alias("chosen_score"),
        F.col("_r.i").alias("runner_up_id"),
        (F.col("_c.s") - F.col("_r.s")).alias("margin"),
        "n_candidates",
    )


def cluster_balanced_sample(
    df: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
    seed: int = 9,
) -> DataFrame:
    """Cluster-balanced diversity sampling (the DataComp /
    SemDeDup-pipeline rebalancing step, arXiv:2304.14108 §3.4 family):
    downsample every cluster toward the SMALLEST cluster's mass so no
    dense region of embedding space dominates training — the
    cluster-level complement of per-source mixing, run after a
    clustering pass (e.g. ``similarity.kmeans_fixed_point``).

    The coin is exact integer arithmetic: keep a row iff
    ``md5_hash(id) % cluster_n < min_n`` — expected kept per cluster
    ≈ min_n, the smallest cluster keeps EVERYTHING (h % n < n is
    always true), and the decision is a pure function of (id, seed),
    so partition layout, engine, and retry all reproduce the same
    sample bit-for-bit. No float rates anywhere.

    Scale shape: one map-side-combined size aggregation on the bounded
    cluster key, a broadcast join of the tiny size frame + 1-row min,
    then a map-side filter — no corpus-sized shuffle. Returns kept
    rows with ``cluster_n`` and ``min_n`` attached."""
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash

    sizes = df.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("cluster_n"))
    min_row = sizes.agg(F.min("cluster_n").alias("min_n"))
    coin = _md5_band_hash(F.col(id_col).cast("string"), seed) % F.col(
        "cluster_n"
    )
    return (
        df.join(F.broadcast(sizes), cluster_col)
        .crossJoin(F.broadcast(min_row))  # 1-row min frame
        .filter(coin < F.col("min_n"))
    )
