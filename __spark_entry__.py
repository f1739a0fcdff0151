"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``flink_ci_flink_spark``; this module is a thin view
over its query registry (one entry per implemented operator, SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from flink_ci_flink_spark.queries import QUERIES  # noqa: E402

FLAGSHIP = "tpch_q3_shipping_priority"

# The driver samples a 50-query prefix of queries() for its sf0.01
# correctness check. Round-9 prefix (the round-8 judge's #1 task): a
# RE-VALIDATION rotation — (1) every query added or reshaped THIS round
# (both sessions: 21 names, each sf0.01 parity- AND driver-sim-green
# locally), then (2) the oldest driver proofs (r2-proven first, then r3
# oldest-first). 50 fit the prefix, so ~29 of the 45 re-validation names
# land this round; the tail of the r3 list plus the late-round-9
# additions that miss the cut (tpcds_shape_channel_band_agreement,
# tpcds_shape_cross_channel_growth, pipe_quality_perceptron,
# graph_canonical_by_model, pipe_e2e_curation_v3,
# streaming_model_screen_replay, streaming_feature_drift_replay, and the
# r3-proven udf/fn/pivot/json names — all covered by their own pytest
# groups every run) lead the round-10 rotation.
_PRIORITY = [
    # -- (1) round-9 additions / changes, never driver-proven --
    "tpcds_shape_cross_channel_items",
    "tpcds_shape_multi_channel_drilldown",
    "tpcds_shape_repeatable_subquery",
    "streaming_declarative_fold_replay",  # NEW: declarative fold via PTF
    "pipe_ann_recall",  # reshaped: held-out-sample exact side
    "pipe_dsir_select",  # NEW: DSIR importance resampling
    "pipe_gopher_rules",  # NEW: Gopher rule bitmask
    "pipe_lsh_dedup_recall",  # NEW: LSH dedup-recall eval (sampled shape)
    "pipe_leakage_safe_split",  # NEW: split + decontamination composite
    "streaming_gopher_screen_replay",  # NEW: rule filter online-serve
    "pipe_classifier_eval",  # NEW: confusion-matrix model eval
    "pipe_e2e_curation_v4",  # NEW: heuristic+model+DSIR composite
    "streaming_dsir_screen_replay",  # NEW: DSIR scoring on ingest
    "pipe_blocklist_screen",  # NEW: banned-phrase bitmask
    "pipe_dup_source_matrix",  # NEW: cross-source near-dup matrix
    "pipe_image_stats",  # NEW: decoded-BMP luminance screen
    "pipe_tokenizer_fertility",  # NEW: per-source chars-per-token report
    "streaming_rule_monitor_replay",  # NEW: declarative rule dashboard
    "pipe_simhash_band_pairs",  # NEW: banded SimHash candidate pairs
    "tpcds_shape_cov_pair",  # NEW: q39 CV pairs
    "tpcds_shape_rank_position_join",  # NEW: q44
    "tpcds_shape_week_over_year",  # NEW: q2/q59
    "tpcds_shape_order_count_exists",  # NEW: q16/q94
    "tpcds_shape_band_distinct_stats",  # NEW: q28
    "tpcds_shape_yoy_net_decline",  # NEW: q75
    "tpcds_shape_delay_band_pivot",  # NEW: q62/q99
    "tpcds_shape_conditional_scalar_report",  # NEW: q9
    "tpcds_shape_disjunctive_in",  # NEW: q45
    "tpcds_shape_deviation_with_neighbors",  # NEW: q47/q57
    # -- (2) re-validation: r2-proven first --
    "setop_union",
    "sort_limit_offset",
    "subquery_scalar",
    "tpch_q10_returned_items",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "values_inline",
    "window_hop",
    # -- then r3-proven --
    "agg_grouping_sets",
    "asof_join_events",
    "calc_project_filter",
    "cep_click_click_purchase",
    "cep_click_no_purchase",
    "cep_mr_price_dip",
    "cep_mr_sql_view_to_purchase",
    "dedup_keep_last",
    "graph_pagerank_nations",
    "join_anti",
    "join_left_outer_agg",
    "join_semi",
    "over_ranking",
    "over_value_functions",
    "pipe_cosine_topk",
    "pipe_e2e_curation",
    "pipe_exact_dedup",
    "pipe_ivf_ann_topk",
    "pipe_ivf_partial_probe",
    "pipe_jaccard_pairs",
    "pipe_lsh_ann_topk",
    "pipe_minhash_lsh",
    "pipe_mix_token_budget",
    "pipe_sample_stratified",
    "pipe_text_features",
    "sessionize_ordinal",
    "setop_intersect_except",
    "subquery_in_exists",
    "topn_per_group",
    "tpcds_shape_first_purchase_cohort",
    "tpcds_shape_percentile_report",
    "tpch_q18_large_orders",
    "tpch_q1_pricing_summary",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_profit",
    "window_tumble",
]


def _ordered_names() -> list[str]:
    pri = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(pri)]
    return pri + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
