"""Declared query corpus — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 is represented here as a
:class:`QuerySpec`: a named PySpark query over the driver's test tables
plus (where SQL-expressible) an equivalent DuckDB oracle SQL string.
``__spark_entry__.py`` assembles these into the driver contract.

ORDERING POLICY (do not regress): the driver's correctness harness
checks the FIRST 50 registered queries. The window ROTATES each round
so that, over rounds, EVERY registered oracle-backed query earns a
green driver row, and no query's evidence gets stale:

* round 2 covered the parity/relational head (positions 1-50 then);
* round 3 covered all llm_*/stream_*/udf_* operators + repaired rows
  (CORRECTNESS_r03: 50/50 green);
* round 4 covered the never-driver-checked tail — the r3-new
  relational queries, the 5 llm compositions, the sliding/python-source
  streams, the cogroup UDF (CORRECTNESS_r04: 50/50 green);
* round 5 covered the 13 round-4 additions, the two canaries, and 35
  of the 41 r2-only evidence rows (CORRECTNESS_r05: 50/50 green —
  every oracle-backed query registered through round 4 now holds a
  green driver row in some round);
* round 6 took the 20 round-5 additions, the six r2-only rows at the
  staleness bound, the two canaries, and 22 of the 48 r3-only
  evidence rows (CORRECTNESS_r06: 50/50 green — every oracle-backed
  query registered through round 5 holds a green driver row). Round 6
  grew the surface 176 → 225, which makes a FIXED 3-round staleness
  bound arithmetically unsatisfiable; the invariant scales with the
  corpus (tests/test_corpus_oracle.py computes ceil(N/50), floor 3);
* round 7 (this window) takes 48 of the 49 round-6 additions — every
  one except ``rel_source_text_wholetext``, which holds the r8 slot
  below — plus the two standing canaries. First driver rows for the
  entire TPC-H tail, winnowing/CDC, k-means, and the sampling/RL
  block.

* round 8 took the 26 rows whose newest green row was
  CORRECTNESS_r03, all 14 SCHEDULED_NEXT_WINDOW entries from round 7,
  the 2 standing canaries, and the 8 alphabetically-first r4-only
  rows (CORRECTNESS_r08: 50/50 green — every oracle-backed query
  registered through round 7 holds a green driver row);
* round 9 (this window) takes the 40 remaining rows whose newest
  green row is CORRECTNESS_r04 (at the ceil(241/50)=5 staleness
  bound), all 7 SCHEDULED_NEXT_WINDOW entries from round 8 (first
  driver rows for the alignment gate, bitext mining, cluster
  cartography/sampling, dataset drift, conditional aggregates), the
  2 standing canaries, and 1 spare spent on the earliest-deadline
  r5-only row: 40 + 7 + 2 + 1 = 50.

* round 10 (this window) takes the 2 round-9 additions
  (llm_dup_spans_within, stream_schema_drift), the 2 standing
  canaries, and the 46 alphabetically-first of the 47 rows whose
  newest green row is CORRECTNESS_r05 (they reach the corpus-scaled
  staleness bound at round 11): 2 + 2 + 46 = 50.

* round 11 took ``udf_apply_in_arrow`` (the one remaining r5-only
  row, at its hard staleness deadline that round),
  ``llm_community_labelprop`` (the round-10 addition, from
  SCHEDULED_NEXT_WINDOW), the 2 standing canaries, and the 46
  alphabetically-first of the 48 rows whose newest green row is
  CORRECTNESS_r06: 1 + 1 + 2 + 46 = 50 (CORRECTNESS_r11: 50/50
  green — every oracle-backed query registered through round 10
  holds a green driver row);

* round 12 took the 2 remaining r6-only rows —
  ``stream_static_join`` and ``udf_udtf_table_arg``, at their hard
  staleness deadline that round (they led ``RESERVED_NEXT_WINDOW``
  through the round-11 close, as planned) — then the 3 round-11
  additions from SCHEDULED_NEXT_WINDOW, the 43 alphabetically-first
  of the 48 rows whose newest green row is CORRECTNESS_r07, and the
  2 standing canaries: 2 + 3 + 43 + 2 = 50 (CORRECTNESS_r12: 50/50
  green — every oracle-backed query registered through round 11
  holds a green driver row);

* round 13 took the 5 remaining r7-only rows —
  ``rel_tpch_q8_market_share``, ``rel_tpch_q9_product_profit``,
  ``stream_neardup_dedup``, ``stream_windowed_topk``,
  ``udf_sql_function``, at their hard staleness deadline that round
  (they led ``RESERVED_NEXT_WINDOW`` through the round-12 close, as
  planned) — then the 2 round-12 additions from
  SCHEDULED_NEXT_WINDOW (``llm_ivf_incremental``,
  ``llm_retrieval_ndcg``, their FIRST driver rows), the 41
  alphabetically-first of the 48 rows whose newest green row was
  CORRECTNESS_r08, and the 2 standing canaries: 5 + 2 + 41 + 2 = 50
  (CORRECTNESS_r13: 50/50 green — every oracle-backed query
  registered through round 12 holds a green driver row);

* round 14 took the 7 remaining r8-only rows —
  ``stream_stream_join``, ``stream_tumbling_counts``,
  ``udf_map_in_arrow``, ``udf_pandas_grouped_agg``,
  ``udf_pandas_grouped_map``, ``udf_pandas_scalar``,
  ``udf_python_udtf``, at their hard staleness deadline that round
  (they led ``RESERVED_NEXT_WINDOW`` through the round-13 close, as
  planned) — then the 2 round-13 additions from
  SCHEDULED_NEXT_WINDOW (``llm_dup_substring_spans``,
  ``stream_ivf_ingest``, their FIRST driver rows), the 39
  alphabetically-first of the 48 rows whose newest green row is
  CORRECTNESS_r09 (stale-bound at round 15), and the 2 standing
  canaries: 7 + 2 + 39 + 2 = 50 (CORRECTNESS_r14: 50/50 green);

* round 15 (this window, an OPTIMIZATION round) takes the 9
  remaining r9-only rows at their hard staleness deadline (they led
  RESERVED_NEXT_WINDOW through the round-14 close, as planned), the
  2 round-14 additions from SCHEDULED_NEXT_WINDOW
  (``llm_unigram_seed_stats``, ``llm_trigram_backoff_rarity``, their
  FIRST driver rows), then — per the round-14 verdict's item 5 — 20
  rows whose OPERATOR CODE the round-14/15 optimization passes
  touched (graph fast paths, the ngram pair core, the UDTF
  pre-aggregation, wholetext write, classifier artifact, text-op
  fan-out guards, interval buckets), putting every optimized path
  under the driver's post-change oracle, then the 17
  alphabetically-first untouched r10-stale rows (the remaining 31
  hit their deadline at round 16 and are pinned in
  RESERVED_NEXT_WINDOW to lead that window), and the 2 standing
  canaries: 9 + 2 + 20 + 17 + 2 = 50 — the invariant tests enforce
  the staleness arithmetic rather than this comment.

``DRIVER_GREEN_PAST_ROUNDS`` records which queries already hold a
green row (union of all CORRECTNESS_r0N files); those may sit past the
window. Everything registered is ALWAYS enforced every round by the
local DuckDB gate (scripts/selfcheck.py via tests/test_corpus_oracle.py),
which mirrors the driver's pandas canonicalization exactly.

The only queries exempt from window coverage are the approximate /
iterative rows-only checks with no oracle (they must not spend a
window slot — pinned by test_driver_window_invariants).
"""

from __future__ import annotations

from etl_global_mobility_spark.corpus.base import QuerySpec, load_table

#: First 50 registered names — the driver's round-15 correctness window.
DRIVER_WINDOW = (
    # the 9 remaining r9-only rows, at their HARD staleness deadline
    # this round — they led RESERVED_NEXT_WINDOW through the round-14
    # close; now they lead the window itself
    "rel_source_python_ds",
    "rel_tpch_q3_shipping_priority",
    "rel_triangle_count",
    "rel_variant_json",
    "rel_window_first_last",
    "rel_zorder_key",
    "stream_python_source",
    "stream_sliding_counts",
    "udf_cogroup_profile",
    # the 2 round-14 additions (SCHEDULED_NEXT_WINDOW last round) —
    # first driver rows for the unigram-LM seed statistics and the
    # trigram Stupid-Backoff perplexity filter
    "llm_unigram_seed_stats",
    "llm_trigram_backoff_rarity",
    # 20 rows whose operator code the round-14/15 OPTIMIZATION passes
    # touched (small-graph fast paths, the ngram pair core + packed
    # key, UDTF pre-aggregation, wholetext partitioned write,
    # classifier artifact, compute fan-out guards, interval bucket
    # width) — pulled forward per the round-14 verdict item 5 so every
    # optimized path holds a POST-change driver oracle row
    "llm_ngram_jaccard",
    "llm_dedup_components",
    "llm_dedup_cluster_stats",
    "llm_dedup_keep_best",
    "llm_community_labelprop",
    "llm_labelprop_convergence",
    "llm_split_leakage",
    "llm_cross_source_dups",
    "rel_pagerank_convergence",
    "rel_interval_overlap_join",
    "stream_neardup_dedup",
    "udf_udtf_table_arg",
    "rel_source_text_wholetext",
    "llm_quality_classifier_trained",
    "llm_e2e_multimodal_curation",
    "llm_dsir_resample",
    "llm_span_corruption",
    "llm_winnowing_fingerprint",
    "llm_cdc_dup_passages",
    "llm_strip_boilerplate",
    # the 17 alphabetically-first untouched rows whose newest green
    # row is CORRECTNESS_r10 (the remaining 31 lead round 16 — see
    # RESERVED_NEXT_WINDOW)
    "llm_dup_spans_within",
    "llm_e2e_training_examples",
    "llm_hybrid_retrieval_rrf",
    "llm_preference_pairs",
    "llm_quality_classifier",
    "llm_semantic_dedup",
    "parity_casts",
    "parity_date_parse",
    "parity_filter_eq_range",
    "parity_indicators",
    "parity_map_lookup",
    "parity_membership",
    "parity_quality_rule_counts",
    "parity_rename_project",
    "parity_split_clean",
    "parity_split_quarantine",
    "parity_unit_conversion",
    # standing canaries (green every round since r2/r3) for
    # cross-round regression signal — one parity + one llm
    "parity_derived_all",
    "llm_exact_dedup",)

#: Queries holding a green driver row in CORRECTNESS_r02…r13 —
#: allowed past the window (their evidence is already recorded; the
#: local gate still re-verifies them every round). Regenerated each
#: round as the union of green rows across all CORRECTNESS_r0N.json.
DRIVER_GREEN_PAST_ROUNDS = frozenset(
    {
        "llm_alignment_report", "llm_ann_recall_report",
        "llm_asof_join", "llm_bigram_novelty", "llm_bitext_mining",
        "llm_bm25", "llm_bpe_pair_stats", "llm_causal_lm_examples",
        "llm_cdc_chunks", "llm_cdc_dup_passages",
        "llm_chunk_documents", "llm_cluster_balanced_sample",
        "llm_cluster_profile", "llm_community_labelprop",
        "llm_contamination",
        "llm_cosine_topk", "llm_cross_source_dups",
        "llm_dataset_drift", "llm_dedup_cluster_stats",
        "llm_dedup_components", "llm_dedup_keep_best",
        "llm_domain_blocklist", "llm_domain_cap_report",
        "llm_domain_extract", "llm_dsir_resample",
        "llm_dup_ngram_spans", "llm_dup_spans_within",
        "llm_dup_substring_spans",
        "llm_e2e_curation", "llm_e2e_multimodal_curation",
        "llm_e2e_training_examples", "llm_e2e_web_curation",
        "llm_embedding_neardup", "llm_epoch_plan",
        "llm_event_sequences", "llm_exact_dedup",
        "llm_feature_hash", "llm_filter_rules", "llm_fim_transform",
        "llm_fingerprint", "llm_frame_sample",
        "llm_group_advantage", "llm_hard_negative_mining",
        "llm_hash_split", "llm_hybrid_retrieval_rrf",
        "llm_incremental_neardup", "llm_int8_quantize",
        "llm_ivf_ann", "llm_ivf_incremental", "llm_k_anonymity",
        "llm_k_suppress",
        "llm_keyword_tag", "llm_kmeans_refine",
        "llm_knn_label_vote", "llm_labelprop_convergence",
        "llm_lang_profile", "llm_language_id",
        "llm_length_bucket_batching", "llm_lsh_ann",
        "llm_minhash_neardup", "llm_minhash_verified",
        "llm_mix_sources", "llm_mmr_rerank",
        "llm_multimodal_alignment", "llm_multimodal_features",
        "llm_ngram_jaccard", "llm_normalize_text",
        "llm_pack_sequences", "llm_packing_efficiency",
        "llm_per_source_cap", "llm_pii_redact",
        "llm_pmi_collocations", "llm_pq_ann",
        "llm_preference_pairs", "llm_quality_classifier",
        "llm_quality_classifier_trained", "llm_quality_prune",
        "llm_quality_score", "llm_rejection_sample",
        "llm_repetition_signals", "llm_retrieval_ndcg",
        "llm_semantic_dedup",
        "llm_sentence_chunks", "llm_sft_chat_format", "llm_simhash",
        "llm_span_corruption", "llm_split_leakage",
        "llm_stratified_sample", "llm_strip_boilerplate",
        "llm_temperature_mix", "llm_text_stats",
        "llm_tfidf_topterms", "llm_token_budget_sample",
        "llm_token_fertility", "llm_unigram_rarity",
        "llm_url_dedup", "llm_vocab_oov", "llm_weighted_sample",
        "llm_winnowing_fingerprint", "llm_winnowing_neardup",
        "parity_casts", "parity_catalog_table_scan",
        "parity_csv_scan", "parity_date_parse",
        "parity_derived_all", "parity_filter_eq_range",
        "parity_indicators", "parity_map_lookup",
        "parity_membership", "parity_quality_reasons",
        "parity_quality_rule_counts", "parity_rename_project",
        "parity_rounding", "parity_split_clean",
        "parity_split_quarantine", "parity_unit_conversion",
        "parity_unit_price", "rel_agg_conditional_modern",
        "rel_agg_count_distinct", "rel_agg_cube",
        "rel_agg_grouping_sets", "rel_agg_pricing_summary",
        "rel_agg_rollup", "rel_agg_stats_moments", "rel_array_ops",
        "rel_bucketed_join", "rel_cohort_retention",
        "rel_collect_sorted_lists", "rel_csv_corrupt_records",
        "rel_dataset_card", "rel_decayed_activity",
        "rel_dropduplicates", "rel_equidepth_bins",
        "rel_error_safe_functions", "rel_expectations_report",
        "rel_funnel_analysis", "rel_fuzzy_match",
        "rel_histogram_prices", "rel_hof_arrays",
        "rel_incremental_agg", "rel_interval_overlap_join",
        "rel_join_anti", "rel_join_broadcast_dims",
        "rel_join_full_outer", "rel_join_hinted_shuffle_hash",
        "rel_join_left_orders", "rel_join_nonequi_self",
        "rel_join_revenue_by_nation", "rel_join_right",
        "rel_join_salted_skew", "rel_join_semi", "rel_json_events",
        "rel_lateral_topk", "rel_listagg", "rel_mad_outliers",
        "rel_mask_redaction", "rel_median_disc", "rel_merge_upsert",
        "rel_moving_window_sum", "rel_null_aware_anti_join",
        "rel_null_safe_join", "rel_ohlc_downsample", "rel_pagerank",
        "rel_pagerank_convergence",
        "rel_percentiles_exact", "rel_pivot_linestatus",
        "rel_range_join_buckets", "rel_ratio_to_report",
        "rel_recursive_chain", "rel_resample_ffill",
        "rel_robust_scaling", "rel_running_distinct",
        "rel_scalar_dates", "rel_scalar_string_date_math",
        "rel_scalar_strings_extended", "rel_scd2_dimension",
        "rel_scd2_point_in_time", "rel_schema_evolution",
        "rel_sessionize_batch", "rel_set_ops", "rel_skew_report",
        "rel_snapshot_diff", "rel_source_avro",
        "rel_source_binaryfile", "rel_source_json",
        "rel_source_orc", "rel_source_parquet_zstd",
        "rel_source_python_ds", "rel_source_text_wholetext",
        "rel_source_xml", "rel_spatial_grid_nearest",
        "rel_subquery_exists", "rel_subquery_scalar",
        "rel_time_rollup", "rel_topk_global",
        "rel_tpch_q10_returned_items",
        "rel_tpch_q11_important_parts",
        "rel_tpch_q12_late_shipments", "rel_tpch_q13_custdist",
        "rel_tpch_q14_promo_effect", "rel_tpch_q15_top_supplier",
        "rel_tpch_q16_supplier_cnt", "rel_tpch_q17_small_quantity",
        "rel_tpch_q18_large_orders", "rel_tpch_q19_disjunctive",
        "rel_tpch_q20_small_part_suppliers",
        "rel_tpch_q21_waiting_suppliers",
        "rel_tpch_q22_global_sales", "rel_tpch_q2_min_cost",
        "rel_tpch_q3_shipping_priority",
        "rel_tpch_q4_order_priority", "rel_tpch_q5_local_supplier",
        "rel_tpch_q6_forecast_revenue",
        "rel_tpch_q7_volume_shipping", "rel_tpch_q8_market_share",
        "rel_tpch_q9_product_profit", "rel_triangle_count",
        "rel_unpivot_part", "rel_variant_json",
        "rel_window_distribution", "rel_window_first_last",
        "rel_window_lag_lead", "rel_window_range_frame",
        "rel_window_rank_dense", "rel_window_running_sum",
        "rel_window_topk_per_group", "rel_zorder_key",
        "stream_dedup_keys", "stream_ivf_ingest",
        "stream_medallion_batch_parity",
        "stream_neardup_dedup", "stream_ohlc_bars",
        "stream_python_source", "stream_scd2_enrichment",
        "stream_schema_drift",
        "stream_session_windows", "stream_sliding_counts",
        "stream_stateful_profile", "stream_static_join",
        "stream_stream_join", "stream_tumbling_counts",
        "stream_windowed_topk", "udf_apply_in_arrow",
        "udf_cogroup_profile", "udf_map_in_arrow",
        "udf_pandas_grouped_agg", "udf_pandas_grouped_map",
        "udf_pandas_scalar", "udf_python_udtf", "udf_sql_function",
        "udf_udtf_table_arg"
    }
)


#: Queries ADDED this round (registered past the already-frozen
#: window): the NEXT rotation must pull these in. The window-invariant
#: test treats this as the only legitimate reason an oracle-backed
#: query lacks both window coverage and a past green row. EMPTY at
#: round 15 (an optimization round adds no queries; the two round-14
#: additions rotated into the round-15 window above).
SCHEDULED_NEXT_WINDOW: frozenset[str] = frozenset()

#: Queries whose existing driver evidence reaches its hard staleness
#: deadline NEXT round — reserved to LEAD the next rotation (the 31
#: r10-stale rows the round-15 window did not drain; see the round-15
#: paragraph in the module docstring). The staleness invariant tolerates these
#: for EXACTLY ONE round past the bound: once the driver drops this
#: round's CORRECTNESS file, rotating the frozen window is impossible
#: until next round opens, so without the reserve the closed round's
#: HEAD would be permanently red. If the next rotation skips them the
#: alarm still trips (tests/test_corpus_oracle.py pins both sides).
RESERVED_NEXT_WINDOW: tuple[str, ...] = (
    "parity_unit_price",
    "rel_agg_count_distinct",
    "rel_agg_grouping_sets",
    "rel_agg_stats_moments",
    "rel_dataset_card",
    "rel_dropduplicates",
    "rel_join_anti",
    "rel_join_broadcast_dims",
    "rel_join_full_outer",
    "rel_join_left_orders",
    "rel_join_nonequi_self",
    "rel_join_salted_skew",
    "rel_lateral_topk",
    "rel_listagg",
    "rel_median_disc",
    "rel_null_aware_anti_join",
    "rel_pagerank",
    "rel_pivot_linestatus",
    "rel_range_join_buckets",
    "rel_scalar_string_date_math",
    "rel_source_xml",
    "rel_subquery_exists",
    "rel_subquery_scalar",
    "rel_time_rollup",
    "rel_topk_global",
    "rel_unpivot_part",
    "rel_window_distribution",
    "rel_window_lag_lead",
    "rel_window_running_sum",
    "rel_window_topk_per_group",
    "stream_schema_drift",
)


def all_queries() -> dict[str, QuerySpec]:
    """name → QuerySpec for every declared query.

    ``DRIVER_WINDOW`` names come first (in that exact order); the rest
    follow in module order (parity, relational, llm, streaming, udfs).
    """
    from etl_global_mobility_spark.corpus import (
        llm,
        parity,
        relational,
        streaming,
        udfs,
    )

    by_name: dict[str, QuerySpec] = {}
    for mod in (parity, relational, llm, streaming, udfs):
        for spec in mod.SPECS:
            if spec.name in by_name:
                raise ValueError(f"duplicate query name: {spec.name}")
            by_name[spec.name] = spec

    missing = [n for n in DRIVER_WINDOW if n not in by_name]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not defined: {missing}")

    out: dict[str, QuerySpec] = {n: by_name[n] for n in DRIVER_WINDOW}
    for name, spec in by_name.items():
        if name not in out:
            out[name] = spec
    return out


__all__ = [
    "QuerySpec",
    "load_table",
    "all_queries",
    "DRIVER_WINDOW",
    "DRIVER_GREEN_PAST_ROUNDS",
    "SCHEDULED_NEXT_WINDOW",
]
