"""Physical-plan audits (SURVEY §4): the scale properties are asserted,
not assumed — predicate pushdown reaches the parquet scan, column
pruning shrinks ReadSchema, dim joins broadcast, global top-k plans as
TakeOrderedAndProject, aggregations are partial (map-side combine),
and the hot expression paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan_of(df) -> str:
    """Plan AFTER execution — AQE finalizes (and codegen-wraps) the
    plan only once a job has run — and the job must be THIS df's own
    queryExecution (count()/write wrap it in a new one)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    from etl_global_mobility_spark.corpus.parity import q_filter_eq_range

    plan = plan_of(q_filter_eq_range(spark, SF))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_returnflag)" in plan or "EqualTo(l_returnflag,R)" in plan


def test_column_pruning_shrinks_read_schema(spark):
    from etl_global_mobility_spark.corpus.parity import q_rename_project

    plan = plan_of(q_rename_project(spark, SF))
    # 4 of 11 lineitem columns read — the scan schema must not contain
    # the unprojected measure columns
    assert "l_extendedprice" not in plan
    assert "l_quantity" not in plan


def test_dim_join_broadcasts(spark):
    from etl_global_mobility_spark.corpus.relational import (
        q_join_broadcast_dims,
        q_join_revenue_by_nation,
    )

    assert "BroadcastHashJoin" in plan_of(q_join_broadcast_dims(spark, SF))
    assert "BroadcastHashJoin" in plan_of(q_join_revenue_by_nation(spark, SF))


def test_semi_anti_join_types(spark):
    from etl_global_mobility_spark.corpus.relational import q_join_anti, q_join_semi

    assert "LeftSemi" in plan_of(q_join_semi(spark, SF))
    assert "LeftAnti" in plan_of(q_join_anti(spark, SF))


def test_global_topk_is_take_ordered(spark):
    from etl_global_mobility_spark.corpus.relational import q_topk_global

    assert "TakeOrderedAndProject" in plan_of(q_topk_global(spark, SF))


def test_aggregation_is_partial(spark):
    from etl_global_mobility_spark.corpus.relational import q_agg_pricing_summary

    plan = plan_of(q_agg_pricing_summary(spark, SF))
    # partial + final HashAggregate pair = map-side combine before shuffle
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2
    assert "*(" in final_plan_of(q_agg_pricing_summary(spark, SF))  # *(n) = WholeStageCodegen span


def test_quality_engine_stays_in_codegen(spark):
    """The 6-rule engine is pure JVM expressions — no Python workers in
    the plan (BatchEvalPython/ArrowEvalPython would mean a UDF leaked
    into the hot path)."""
    from etl_global_mobility_spark.corpus.parity import q_quality_reasons

    plan = final_plan_of(q_quality_reasons(spark, SF))
    assert "EvalPython" not in plan
    assert "*(" in plan  # *(n) = WholeStageCodegen span


def test_exact_topk_broadcasts_query_side(spark):
    """Brute-force cosine must broadcast the bounded query side so the
    corpus side streams without a shuffle."""
    from etl_global_mobility_spark.corpus.llm import q_cosine_topk

    plan = plan_of(q_cosine_topk(spark, SF))
    assert "Broadcast" in plan


def test_partition_pruning_on_partitioned_table(spark, tmp_path):
    """A date filter over a date-partitioned table scans only matching
    partitions (the silver-table layout at 100 TB)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "pt")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("day"),
    )
    df.write.partitionBy("day").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("day") == "3")
    plan = plan_of(scan)
    # the day predicate must land in PartitionFilters (metadata-only
    # pruning), NOT in PushedFilters/data filters
    assert "PartitionFilters: [isnotnull(day" in plan and "day#" in plan
    assert "(day" in plan.split("PartitionFilters")[1].split("]")[0]
    assert scan.count() == 20  # exactly one of five partitions


def test_ivf_assignment_is_map_only(spark):
    """IVF cell assignment runs over literal centroids — the corpus pass
    must not shuffle: the whole query carries exactly ONE exchange (the
    final per-query top-k), the probe join is broadcast, and the rank
    filter prunes map-side (partial WindowGroupLimit)."""
    from etl_global_mobility_spark.corpus.llm import q_ivf_ann

    plan = plan_of(q_ivf_ann(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_median_windows_share_one_shuffle(spark):
    """row_number and count windows over the same partition key must
    reuse a single exchange, not shuffle twice."""
    from etl_global_mobility_spark.corpus.relational import q_median_disc

    plan = plan_of(q_median_disc(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 2


def test_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge join with ZERO exchanges — the write paid the shuffle
    once (the 100 TB fact-fact co-location strategy)."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.corpus.base import load_table
    from etl_global_mobility_spark.sinks.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS corpus_cat")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "corpus_cat.li_plan_bkt", "l_orderkey", 4)
    write_bucketed(o, "corpus_cat.o_plan_bkt", "o_orderkey", 4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lib = read_bucketed(spark, "corpus_cat.li_plan_bkt")
        ob = read_bucketed(spark, "corpus_cat.o_plan_bkt")
        joined = lib.join(ob, lib.l_orderkey == ob.o_orderkey)
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        # sanity: same rows as the path-based join
        expected = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_spreads_hot_keys(spark):
    """The salted join must key the shuffle/build on (orderkey, salt) so
    a hot orderkey spreads across SALT reducers."""
    from etl_global_mobility_spark.corpus.relational import q_join_salted_skew

    plan = plan_of(q_join_salted_skew(spark, SF))
    join_line = next(l for l in plan.splitlines() if "Join [" in l or "Join(" in l or "HashJoin" in l)
    assert "salt" in join_line, join_line


def test_chunk_documents_is_map_only(spark):
    """Chunking must not shuffle: sequence+explode+slice runs where the
    row lives, entirely inside codegen."""
    from etl_global_mobility_spark.corpus.base import load_table
    from etl_global_mobility_spark.operators.packing import chunk_documents

    plan = plan_of(chunk_documents(load_table(spark, SF, "documents")))
    assert "Exchange" not in plan
    assert "Generate explode" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_sequences_single_shard_shuffle(spark):
    """Packing is one hash exchange on the shard column + per-shard
    sort; the token math is map-side expressions."""
    from etl_global_mobility_spark.corpus.base import load_table
    from etl_global_mobility_spark.operators.packing import pack_sequences

    plan = plan_of(pack_sequences(load_table(spark, SF, "documents")))
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(source" in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_strip_boilerplate_anti_join_unhinted(spark):
    """The hot-segment anti-join must carry NO unconditional broadcast
    hint: the >df_max set is unbounded on a web corpus (hundreds of
    millions of short segments), so a forced broadcast OOMs at scale.
    The LeftAnti join still executes, and once AQE has measured the
    (small) hot set at runtime it is free to broadcast it — or to
    shuffle, if it isn't."""
    from etl_global_mobility_spark.corpus.base import load_table
    from etl_global_mobility_spark.operators.dedup import strip_boilerplate

    df = strip_boilerplate(load_table(spark, SF, "documents"))
    initial = plan_of(df)
    assert "LeftAnti" in initial
    # the logical plan must not pin the strategy before sizes are known
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()
    final = final_plan_of(df)
    assert "LeftAnti" in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_filter_rules_is_map_only(spark):
    """The rule engine must fuse into the scan: no Exchange, no Python
    eval — a single codegen stage at any scale."""
    from etl_global_mobility_spark.corpus.llm import q_filter_rules

    plan = plan_of(q_filter_rules(spark, SF))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_mix_sources_rates_broadcast(spark):
    """mix_sources joins the tiny per-source rate frame back onto the
    corpus — that join must broadcast (never shuffle the corpus on
    source), and the keep-filter must stay JVM-side."""
    from etl_global_mobility_spark.corpus.llm import q_mix_sources

    plan = plan_of(q_mix_sources(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_decayed_activity_single_window_exchange(spark):
    """The lag chain is one window over one shuffle on user_id; the
    8-term arithmetic itself must not add exchanges."""
    from etl_global_mobility_spark.corpus.relational import q_decayed_activity

    plan = final_plan_of(q_decayed_activity(spark, SF))
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert final.count("Exchange hashpartitioning") == 1
    assert "Window" in final


def test_histogram_aggregation_is_partial(spark):
    """Fixed-width histogram: map-side partial agg on the bounded
    bucket key before the exchange."""
    from etl_global_mobility_spark.corpus.relational import q_histogram_prices

    plan = plan_of(q_histogram_prices(spark, SF))
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan


def test_join_hint_forces_shuffled_hash(spark):
    """The SHUFFLE_HASH hint must override the sort-merge default —
    and the MERGE hint must force it back."""
    from etl_global_mobility_spark.corpus.base import load_table
    from etl_global_mobility_spark.corpus.relational import (
        q_join_hinted_shuffle_hash,
    )

    assert "ShuffledHashJoin" in plan_of(q_join_hinted_shuffle_hash(spark, SF))

    c = load_table(spark, SF, "customer").hint("merge")
    o = load_table(spark, SF, "orders")
    merged = o.join(c, o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in plan_of(merged)


def test_runtime_bloom_filter_injects_semi_join_reduction(spark):
    """Spark's runtime bloom filter: a selective filter on the build
    side of a shuffle join injects might_contain() onto the probe side
    scan — rows that cannot match are dropped BEFORE the shuffle (the
    config-only semi-join reduction; at 100 TB this is the difference
    between shuffling the fact table and shuffling the matching
    slice). The application-side size threshold defaults to 10GB, so
    it is lowered for the sf0.001 fixture."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.corpus.base import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        assert "might_contain" in plan_of(j).lower()
        # and the result is unchanged by the reduction
        plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == plain
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling: a runaway hot key in a sort-merge join
    is split into subpartitions at RUNTIME (OptimizeSkewedJoin) — the
    no-code-change complement to the explicit salted join
    (rel_join_salted_skew). At 100 TB this is what keeps one hot key
    from pinning a single 2-hour task; thresholds are lowered so the
    optimization fires on the test-sized fixture. Asserted on the
    POST-execution plan: AQE only finalizes skew decisions from
    measured map output sizes."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 90% of the left side lands on key 0 → one shuffle partition
        # dwarfs the rest; pad makes the hot partition exceed the
        # (lowered) skew threshold in bytes
        left = spark.range(60_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, "k")
        rows = j.count()
        plan = final_plan_of(j)
        assert "skew=true" in plan, plan
        assert "skewed" in plan.lower()
        # correctness unchanged by the split: every left row matches
        # exactly one right row
        assert j.count() == 60_000 == rows
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quality_classifier_is_map_only_codegen(spark):
    """Classifier inference must fuse into the scan: literal weights,
    no Exchange, no Python eval — one codegen stage at any scale."""
    from etl_global_mobility_spark.corpus.llm import q_quality_classifier

    plan = plan_of(q_quality_classifier(spark, SF))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_causal_lm_examples_map_only(spark):
    """Example materialization is explode-shaped: windows materialize
    where the document row lives — no Exchange, no Python eval."""
    from etl_global_mobility_spark.corpus.llm import q_causal_lm_examples

    plan = plan_of(q_causal_lm_examples(spark, SF))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "Generate" in plan  # the window explode


def test_semantic_dedup_single_corpus_shuffle(spark):
    """Cell assignment is a map over literal centroids (no join for
    the quantizer), so the ONLY corpus exchanges are the self-join on
    cell + the final dup-marking window; Python never evaluates."""
    from etl_global_mobility_spark.corpus.llm import q_semantic_dedup

    plan = plan_of(q_semantic_dedup(spark, SF))
    assert "EvalPython" not in plan
    # windowed rank<=1 must use the group-limit pushdown, not a full sort
    assert "WindowGroupLimit" in plan


def test_preference_pairs_single_partial_aggregation(spark):
    """Chosen/rejected are struct-ordered max/min in ONE hash
    aggregation: exactly one exchange (on the group key), partial
    map-side combine, no windows, no self-join, no Python eval."""
    from etl_global_mobility_spark.corpus.llm import q_preference_pairs

    plan = plan_of(q_preference_pairs(spark, SF))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan or "partial" in plan.lower()
    assert "Window" not in plan and "Join" not in plan


def test_e2e_training_examples_prunes_padding(spark):
    """The fused pipeline's output needs only window arithmetic, so
    Catalyst must prune the padded id arrays (array_repeat) out of the
    plan entirely — proof the composition optimizes as ONE query."""
    from etl_global_mobility_spark.corpus.llm import q_e2e_training_examples

    plan = plan_of(q_e2e_training_examples(spark, SF))
    assert "array_repeat" not in plan
    assert "EvalPython" not in plan


def test_lateral_topk_decorrelates_to_window(spark):
    """The LATERAL correlated LIMIT subquery must decorrelate into a
    ranked window join — no per-row re-execution, no cartesian
    product."""
    from etl_global_mobility_spark.corpus.relational import q_lateral_topk

    plan = plan_of(q_lateral_topk(spark, SF))
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # rank<=3 pruned map-side


def test_dataset_card_single_partial_aggregation(spark):
    """The corpus report is one scan + one hash aggregation with
    map-side combine (count-distinct adds its expand/regroup internal
    exchanges, but the documents table is read exactly once)."""
    from etl_global_mobility_spark.corpus.relational import q_dataset_card

    plan = plan_of(q_dataset_card(spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "partial" in plan.lower()
    assert "EvalPython" not in plan


def test_temperature_mix_broadcasts_rates_onto_map_only_corpus(spark):
    """The corpus side must stay map-only: the tiny per-source rate
    frame broadcasts onto it (no corpus-sized shuffle for the join) and
    the md5 sample is a plain Filter above the join."""
    from etl_global_mobility_spark.corpus.llm import q_temperature_mix

    plan = plan_of(q_temperature_mix(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_packing_efficiency_is_single_partial_aggregation(spark):
    """One scan, one hash aggregation with map-side partial combine,
    no join anywhere — the whole point of the report vs materializing
    examples."""
    from etl_global_mobility_spark.corpus.llm import q_packing_efficiency

    plan = plan_of(q_packing_efficiency(spark, SF))
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Generate" not in plan  # no explode: the examples are never built


def test_tpch_q5_broadcasts_region_nation_and_q10_is_topk(spark):
    """Q5's region→nation side must broadcast (explicit hint); Q10's
    global top-20 must plan as TakeOrderedAndProject, never a full
    sort."""
    from etl_global_mobility_spark.corpus.relational import (
        q_tpch_q5_local_supplier,
        q_tpch_q10_returned_items,
    )

    assert "BroadcastHashJoin" in plan_of(q_tpch_q5_local_supplier(spark, SF))
    assert "TakeOrderedAndProject" in plan_of(
        q_tpch_q10_returned_items(spark, SF)
    )


def test_normalize_text_is_shuffle_free_codegen(spark):
    """The normalization chain must fuse into the scan: no exchange of
    any kind, whole plan codegen."""
    from etl_global_mobility_spark.corpus.llm import q_normalize_text

    plan = plan_of(q_normalize_text(spark, SF))
    assert "Exchange" not in plan
    assert "*(1) Project" in plan  # whole-stage codegen, single stage


def test_incremental_neardup_cost_proportional_to_shard(spark, tmp_path):
    """Incremental near-dup against a PERSISTED band index must cost
    ∝ the new shard, not the corpus: the shard's band rows broadcast
    onto a map-only scan of the index (no corpus-side shuffle — the
    only hashpartitioning exchange in the whole plan is the final
    pair-distinct), and the index scan reads the narrow
    (id, sig, band, bucket) schema — never the text column, so corpus
    shingling/md5 is never recomputed."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.corpus.base import load_table
    from etl_global_mobility_spark.operators.dedup import (
        incremental_minhash_neardup,
        minhash_band_index,
    )

    d = load_table(spark, SF, "documents")
    idx_path = str(tmp_path / "bandindex")
    minhash_band_index(d.filter(F.col("doc_id") % 10 != 0)).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    shard = d.filter(F.col("doc_id") % 10 == 0)
    res = incremental_minhash_neardup(index, shard, jaccard_threshold=0.25)
    plan = plan_of(res)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the distinct only
    read_schema = [seg for seg in plan.split("ReadSchema: ") if "sig" in seg]
    assert read_schema and "text" not in read_schema[0].split("\n")[0]


def test_dup_ngram_spans_marks_via_semi_join(spark):
    """Occurrence marking must be a LeftSemi against the >=min_docs
    gram set (never materializing occurrence x gram pair columns), and
    the doc rollup joins back LeftOuter so zero-dup docs survive."""
    from etl_global_mobility_spark.corpus.llm import q_dup_ngram_spans

    plan = plan_of(q_dup_ngram_spans(spark, SF))
    assert "LeftSemi" in plan
    assert "LeftOuter" in plan


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP (optimizer effect, config-default): joining a partitioned
    fact to a selectively-filtered dim on the partition column must
    inject a dynamicpruning subquery into the fact scan's
    PartitionFilters — at 100 TB this skips every fact partition whose
    key the dim filter eliminated, before any fact I/O happens. Also
    asserts the pruned result equals the logical answer."""
    from pyspark.sql import functions as F

    fpath = str(tmp_path / "fact")
    (
        spark.range(2000)
        .select((F.col("id") % 20).alias("day"), F.col("id").alias("v"))
        .write.partitionBy("day")
        .parquet(fpath)
    )
    dim = spark.createDataFrame(
        [(d, d % 5) for d in range(20)], "day long, cat long"
    ).filter(F.col("cat") == 1)  # keeps days 1, 6, 11, 16
    fact = spark.read.parquet(fpath)
    q = fact.join(dim, "day").groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    plan = plan_of(q)
    assert "dynamicpruning" in plan.lower(), plan
    got = {(r.day, r.n) for r in q.collect()}
    assert got == {(d, 100) for d in (1, 6, 11, 16)}


def test_no_plan_antipatterns_across_entire_corpus(spark):
    """Corpus-wide physical-plan sweep — the per-round manual audit as
    a standing gate. For EVERY registered non-streaming query:

    * no CartesianProduct, ever (an unbounded pair explosion is never
      the right plan at 100 TB);
    * BroadcastNestedLoopJoin only where a BOUNDED side is broadcast by
      design (1-row aggregate frames, top-k query sides, codebooks,
      interval tables) — anything new joining without keys must be
      justified here;
    * row-at-a-time Python (BatchEvalPython/PythonUDTF) only in the two
      UDTF showcase queries — never in an engine hot path;
    * Arrow-vectorized Python only in the declared escape-hatch
      queries (pandas/Arrow UDF corpus, multimodal decode plumbing).

    Streaming queries are excluded only because their fn() executes the
    stream; their plans are pinned individually elsewhere.
    """
    from etl_global_mobility_spark.corpus import all_queries

    BNLJ_BOUNDED_BY_DESIGN = {
        "llm_hybrid_retrieval_rrf",   # broadcast per-ranker top-k lists
        "rel_range_join_buckets",     # broadcast interval table
        "llm_cosine_topk",            # broadcast bounded query side
        "llm_mmr_rerank",             # composes cosine_topk (broadcast query side)
        "llm_pq_ann",                 # broadcast m x k codebook
        "llm_temperature_mix",        # broadcast 1-row min-tokens frame
        "llm_knn_label_vote",         # broadcast bounded query side
        "llm_bm25",                   # broadcast 1-row corpus stats
        "llm_mix_sources",            # broadcast 1-row grand total
        "llm_tfidf_topterms",         # broadcast 1-row n_docs frame
        "llm_e2e_curation",           # composes mix_sources
        "rel_skew_report",            # broadcast 1-row total/n_keys frame
        "llm_ann_recall_report",      # composes cosine_topk (broadcast query side)
        "llm_retrieval_ndcg",         # composes cosine_topk (broadcast query side)
        "rel_tpch_q22_global_sales",  # broadcast 1-row avg-balance frame
        "llm_hard_negative_mining",   # composes cosine_topk (broadcast query side)
        "rel_tpch_q11_important_parts",  # broadcast 1-row value-total frame
        "llm_quality_prune",             # broadcast 1-row p25-threshold frame
        "llm_unigram_rarity",            # broadcast 1-row corpus-total frame
        "llm_trigram_backoff_rarity",    # broadcast 1-row reference-total frame
        "llm_weighted_sample",           # broadcast k-row draws frame
        "llm_dsir_resample",             # broadcast 1-row max-score frame
        "llm_domain_cap_report",         # broadcast 1-row corpus-totals frame
        "llm_k_anonymity",               # broadcast 1-row class-total frame
        "llm_pmi_collocations",          # broadcast 1-row token-total frame
        "llm_e2e_web_curation",          # composes domain_report
        #                                  (broadcast 1-row totals frame)
        "llm_alignment_report",          # broadcast 1-row pair-total frame
        "llm_bitext_mining",             # composes cosine_topk (broadcast
        #                                  bounded mining batch)
        "llm_cluster_balanced_sample",   # broadcast 1-row min-cluster frame
    }
    # Unpartitioned windows (WindowExec with an empty partition spec)
    # move ALL rows to one task — allowed only where the window input
    # is BOUNDED by construction (a preceding top-k limit).
    UNPARTITIONED_WINDOW_BOUNDED = {
        "llm_bm25",                  # rank over the top-k limit output
        "llm_hybrid_retrieval_rrf",  # rank over a union of bounded top-k lists
        "llm_ann_recall_report",     # composes bounded ANN top-k outputs
    }
    ROW_PYTHON_ALLOWED = {"udf_python_udtf", "udf_udtf_table_arg"}
    ARROW_PYTHON_ALLOWED = {
        "udf_pandas_scalar", "udf_pandas_grouped_agg",
        "udf_pandas_grouped_map", "udf_map_in_arrow", "udf_apply_in_arrow",
        "udf_cogroup_profile", "llm_multimodal_features", "llm_frame_sample",
        "llm_bpe_train",  # Arrow-batched merge application
        "llm_mmr_rerank",  # cogrouped greedy over bounded per-query groups
        "llm_compression_signal",  # zlib has no SQL/JVM twin; one
        # vectorized pandas_udf, everything around it JVM-side
        "rel_tdigest_quantiles",  # the digest build/merge/report IS
        # the declared Arrow escape hatch (complex aggregate state —
        # operators/sketch.py module docstring)
        # NOTE (r14): the components/LPA small-graph fast paths DO run
        # one Arrow-batched job (union-find / in-memory LPA), but it
        # executes EAGERLY at declaration and the returned frame is a
        # localCheckpoint scan — so no Python node reaches these
        # queries' static plans; the escape hatch is justified at the
        # operator (SINGLE_TASK_MAX_EDGES) and pinned equal to the
        # distributed rounds by tests/test_r14_fastpaths.py.
    }
    ARROW_NODES = (
        "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
        "MapInArrow", "FlatMapCoGroupsInPandas", "FlatMapGroupsInArrow",
        "AggregateInPandas",
    )

    def unpartitioned_windows(plan: str) -> bool:
        # WindowExec prints "Window [exprs], [part], [order]", omitting
        # EMPTY specs — so a 2-group line is unpartitioned only when
        # its second group is a SORT spec (contains ASC/DESC); a bare
        # column list there is a partition with no ordering (running
        # counts), which distributes fine. (WindowGroupLimit prints its
        # partition first and doesn't match the "Window " prefix.)
        for raw in plan.splitlines():
            line = raw.strip().lstrip("+-: *")
            if not line.startswith("Window "):
                continue
            groups, depth, cur = [], 0, []
            for ch in line:
                if ch == "[":
                    if depth == 0:
                        cur = []
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        groups.append("".join(cur))
                elif depth >= 1:
                    cur.append(ch)
            if len(groups) == 2 and (
                " ASC" in groups[1] or " DESC" in groups[1]
            ):
                return True
        return False

    def audit_one(item) -> list[str]:
        name, spec = item
        if name.startswith("stream_"):
            return []
        plan = plan_of(spec.fn(spark, SF))
        bad: list[str] = []
        if "CartesianProduct" in plan:
            bad.append(f"{name}: CartesianProduct")
        if unpartitioned_windows(plan) and name not in UNPARTITIONED_WINDOW_BOUNDED:
            bad.append(f"{name}: unpartitioned (single-task) window")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_BOUNDED_BY_DESIGN:
            bad.append(f"{name}: unjustified BroadcastNestedLoopJoin")
        if (
            ("BatchEvalPython" in plan or "PythonUDTF" in plan)
            and name not in ROW_PYTHON_ALLOWED
        ):
            bad.append(f"{name}: row-at-a-time Python in plan")
        if any(n in plan for n in ARROW_NODES) and name not in (
            ARROW_PYTHON_ALLOWED | ROW_PYTHON_ALLOWED
        ):
            bad.append(f"{name}: undeclared Python eval node")
        return bad

    # Declaration + EXPLAIN of 246 independent queries from a driver
    # thread pool (guide §2.6): py4j releases the GIL during JVM
    # analysis, and the few queries that execute jobs at declaration
    # (train-persist artifacts, fast paths) are concurrency-safe —
    # the same property test_concurrency pins for whole queries.
    # Measured 115 s serial → ~40 s at 8 threads, identical verdicts.
    from concurrent.futures import ThreadPoolExecutor

    bad: list[str] = []
    with ThreadPoolExecutor(max_workers=12) as pool:
        for errs in pool.map(audit_one, all_queries().items()):
            bad.extend(errs)
    assert not bad, "plan anti-patterns:\n" + "\n".join(bad)


def test_tpch_q18_plans_bounded_topk_after_having(spark):
    """Q18 shape: the HAVING-filtered aggregate must come BEFORE the
    rejoin (the join input is the surviving key set, not the raw fact),
    and the global top-20 must plan as TakeOrderedAndProject (never a
    full sort)."""
    from etl_global_mobility_spark.corpus.relational import (
        q_tpch_q18_large_orders,
    )

    plan = plan_of(q_tpch_q18_large_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan
    # the quantity aggregation is partial (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_sentence_chunks_single_exchange(spark):
    """Window (cumulative tokens) and rollup both key on the document
    id, so the whole operator must run on ONE shuffle exchange —
    segmentation and token counting stay map-side."""
    from etl_global_mobility_spark.corpus.llm import q_sentence_chunks

    plan = plan_of(q_sentence_chunks(spark, SF))
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 1, plan


def test_tpch_q6_is_pure_scan_aggregate(spark):
    """Q6 is the query whose cost at 100 TB is ENTIRELY the scan: all
    three predicates must reach the parquet reader as PushedFilters,
    the aggregation must be partial (map-side combine), and the only
    shuffle is the 1-row final-agg exchange."""
    from etl_global_mobility_spark.corpus.relational import (
        q_tpch_q6_forecast_revenue,
    )

    plan = plan_of(q_tpch_q6_forecast_revenue(spark, SF))
    # toString truncates the PushedFilters list, so assert the head of
    # the pushed set plus the ship-date bound that fits before the cut
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_shipda" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
    assert "Join" not in plan


def test_tpch_q19_disjunction_keeps_equi_join(spark):
    """Q19's OR-of-conjunction predicate must NOT degrade the join to a
    nested-loop/cartesian: Catalyst extracts the common l_partkey =
    p_partkey conjunct as the equi-join key and the OR blocks become a
    post-join filter."""
    from etl_global_mobility_spark.corpus.relational import (
        q_tpch_q19_disjunctive_revenue,
    )

    plan = plan_of(q_tpch_q19_disjunctive_revenue(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_tpch_q4_exists_plans_left_semi(spark):
    """Q4's EXISTS must execute as ONE left-semi join (each order
    emitted at most once — no post-join distinct), with the cross-side
    ship-lag condition attached to the join, not a later filter."""
    from etl_global_mobility_spark.corpus.relational import (
        q_tpch_q4_order_priority,
    )

    plan = plan_of(q_tpch_q4_order_priority(spark, SF))
    assert "LeftSemi" in plan
    assert "Distinct" not in plan


def test_tpch_q21_single_fact_pass_no_self_joins(spark):
    """Q21's EXISTS + NOT-EXISTS textbook form would self-join lineitem
    twice; the rewrite computes both conditions in ONE per-order
    aggregation, so the fact table must appear exactly twice in the
    plan (the lo frame feeding the agg and the candidate filter), not
    four times."""
    from etl_global_mobility_spark.corpus.relational import (
        q_tpch_q21_waiting_suppliers,
    )

    plan = plan_of(q_tpch_q21_waiting_suppliers(spark, SF))
    assert plan.count("lineitem.parquet") <= 2, plan
    assert "CartesianProduct" not in plan


def test_sql_udf_inlines_to_pure_codegen(spark):
    """A SQL scalar UDF must be inlined at analysis time: the executed
    plan contains NO Python eval node of any kind and stays inside
    WholeStageCodegen — the scale contrast to every Python UDF."""
    from etl_global_mobility_spark.corpus.udfs import q_sql_function

    plan = plan_of(q_sql_function(spark, SF))
    for node in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert node not in plan, plan
    assert "HashAggregate" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime row-level filtering — the 100 TB join shape Spark adds
    on top of static pruning: with a selective dimension filter and a
    shuffle join, the optimizer injects a bloom_filter_agg subquery
    over the dim keys and applies might_contain() on the fact side
    BEFORE the shuffle, so most fact rows never leave their input
    partition. Thresholds default to creation ≤ 10 MB / application
    ≥ 10 GB scan — exactly the 100 TB regime; test data sits below
    them, so the application floor is lowered here to make the
    rewrite observable. Results must be identical with the filter on
    and off (it is pure pruning)."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }

    def run():
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
        )

    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df = run()
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, opt
        assert "might_contain" in opt, opt
        with_filter = {tuple(r) for r in df.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    baseline = {tuple(r) for r in run().collect()}
    assert with_filter == baseline


def test_weighted_sample_shuffles_once_and_broadcasts_draws(spark):
    """Inverse-CDF weighted sampling: exactly ONE real shuffle (the
    shard-keyed prefix-sum window — never unpartitioned/single-task),
    the k-row draws frame broadcast, no cartesian product, and no
    second corpus pass (shard totals come from a separate plain
    aggregation, so the windowed frame is never materialized twice)."""
    from etl_global_mobility_spark.corpus.llm import q_weighted_sample

    plan = plan_of(q_weighted_sample(spark, SF))
    assert "BroadcastExchange" in plan  # the bounded draws side
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(shard" in plan, plan
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 1, plan


def test_group_advantage_single_agg_plus_broadcast_back(spark):
    """Group moments = ONE partial hash aggregation on the group key;
    the moments frame (rows ∝ groups) joins back without a second
    corpus shuffle (AQE broadcast) — the embeddings scan must prune to
    the two used columns."""
    from etl_global_mobility_spark.corpus.llm import q_group_advantage

    plan = final_plan_of(q_group_advantage(spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial + final moments
    assert "BroadcastHashJoin" in plan, plan  # AQE broadcasts the moments
    assert "vec_id" in plan and "label" not in plan  # column pruning


def test_dsir_resample_bounded_broadcasts_only(spark):
    """DSIR: the two corpus scans are inherent; everything joined must
    be bounded — the n_buckets-row weight table and the 1-row max
    broadcast. No corpus-sized shuffle join, no cartesian product."""
    from etl_global_mobility_spark.corpus.llm import q_dsir_resample

    plan = final_plan_of(q_dsir_resample(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2, plan
    # the only real shuffles are the two hash aggregations (counts,
    # per-doc scores) — never a corpus-vs-corpus sort-merge join
    assert "SortMergeJoin" not in plan, plan


def test_rejection_sample_topk_window_partitioned(spark):
    """Best-of-n: the rank window must partition on the group key
    (never single-task), rows are cut to rank<=2 before the final
    aggregation, and the aggregation is partial."""
    from etl_global_mobility_spark.corpus.llm import q_rejection_sample

    plan = plan_of(q_rejection_sample(spark, SF))
    assert "hashpartitioning(grp" in plan, plan
    # struct-max aggregation plans as SortAggregate/ObjectHashAggregate
    # (struct is not a hash-agg buffer type) — still partial+final
    assert plan.count("Aggregate") >= 2, plan
    assert "CartesianProduct" not in plan


def test_span_corruption_shuffles_only_on_doc_id(spark):
    """Span corruption: the lag/running-count windows and the
    reassembly aggregation all key on doc_id, so the operator needs
    exactly ONE real shuffle of the exploded tokens."""
    from etl_global_mobility_spark.corpus.llm import q_span_corruption

    plan = plan_of(q_span_corruption(spark, SF))
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 1, plan
    assert "hashpartitioning(doc_id" in plan, plan


def test_grouped_pandas_parallelism_guard_single_exchange(spark):
    """ensure_grouped_compute_parallelism must REPLACE the grouped-map
    shuffle, not add one (hash-partitioning on the group key satisfies
    the ClusteredDistribution requirement), and its user-specified
    partition count must survive AQE — otherwise AQE's bytes-based
    coalescing serializes thousands of per-group Python calls onto 2
    tasks (measured 14 s -> 2 s on udf_pandas_grouped_map at sf0.1)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.parallelism import (
        ensure_grouped_compute_parallelism,
    )

    df = spark.range(2000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    guarded = ensure_grouped_compute_parallelism(df, ["k"], 16)

    def ident(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    out = guarded.groupBy("k").applyInPandas(ident, "k long, v long")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly ONE shuffle: the user repartition; no second
    # ENSURE_REQUIREMENTS exchange above it
    assert plan.count("Exchange") == 1, plan
    assert "REPARTITION_BY_NUM" in plan, plan
    # the count survives into the Python stage even with AQE on
    assert out.rdd.getNumPartitions() == 16


def test_plan_cost_report_pins_audited_shapes(spark):
    """rel_plan_cost_report's rows must agree with the plan audits
    this suite asserts individually: the broadcast-dim join carries 1
    shuffle + 3 broadcasts, global top-k needs NO exchange
    (TakeOrderedAndProject), the grouped-pandas query has exactly one
    python node and one (explicit, keyed) shuffle, and nothing audited
    plans a cartesian product."""
    from etl_global_mobility_spark.corpus import all_queries

    rows = {
        r["query"]: r
        for r in all_queries()["rel_plan_cost_report"]
        .fn(spark, SF)
        .collect()
    }
    assert set(rows) == {
        "tpch_q3", "revenue_by_nation", "salted_skew", "topk_global",
        "exact_dedup", "pandas_grouped_map",
    }
    assert rows["revenue_by_nation"].n_shuffles == 1
    assert rows["revenue_by_nation"].n_broadcasts == 3
    assert rows["topk_global"].n_shuffles == 0
    assert rows["topk_global"].est_rows == 10  # CBO sees the LIMIT
    assert rows["pandas_grouped_map"].n_python_nodes == 1
    assert rows["pandas_grouped_map"].n_shuffles == 1
    assert all(not r.has_cartesian for r in rows.values())
    assert all(r.n_python_nodes == 0 for n, r in rows.items()
               if n != "pandas_grouped_map")
