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
# correctness check. Round-7 prefix: (1) the 13 queries never yet in a
# recorded driver artifact (round-6 additions + the 4 names that fell off
# the r6 50-slot window), (2) the queries added THIS round, then (3) a
# re-validation tail of the longest-unchecked names — everything whose
# latest green row is r1/r2 (26 names, including `windowed_stream_join`),
# `interval_join_events` (r3, called out by VERDICT.md task 6), and r3
# names touching code changed this round (CEP ordering, similarity).
_PRIORITY = [
    # -- (1) never driver-proven --
    "pipe_pack_sequences",
    "pipe_lm_quality_screen",
    "pipe_decode_png",
    "pipe_decode_gif_frames",
    "pipe_knn_join",
    "graph_jaccard_index",
    "graph_clustering_coeffs",
    "graph_vertex_metrics",
    "graph_triadic_census",
    "skew_salted_join",
    "skew_split_distinct",
    "flinksql_hop",
    "flinksql_temporal_fn",
    # -- (2) round-7 additions --
    "cep_mr_secondary_order",
    "pipe_knn_join_scaled",
    "streaming_count_window_replay",
    "pipe_sql_front_door",
    "cep_mr_prev_stream_replay",
    "streaming_bounded_over_replay",
    "streaming_count_sliding_replay",
    "streaming_topn_replay",
    "streaming_dedup_keeplast_replay",
    "streaming_running_agg_replay",
    "streaming_sessionize_replay",
    "streaming_topn_retractable_replay",
    "graph_label_propagation",
    "graph_community_detection",
    "pipe_containment_pairs",
    "pipe_random_projection",
    "graph_triangle_listing",
    "graph_edge_metrics",
    # -- (3) re-validation: oldest-proven first --
    "interval_join_events",
    "windowed_stream_join",
    "agg_collect_listagg",
    "agg_distinct_multi",
    "agg_rollup_cube",
    "agg_stats",
    "explode_lateral_words",
    "fn_conditional_cast",
    "fn_hash_encode",
    "fn_math",
    "fn_string_regex_predicates",
    "fn_temporal",
    "join_cross",
    "join_full_outer_counts",
    "join_right_outer",
    "join_theta_nonequi",
    "lookup_join_dim",
    "over_frames",
    "over_range_interval_days",
    "setop_union",
    "sort_limit_offset",
    "subquery_scalar",
    "tpch_q10_returned_items",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "values_inline",
    "window_hop",
    # r3 names touching this round's changed code paths
    "cep_click_click_purchase",
    "cep_click_no_purchase",
    "cep_mr_sql_view_to_purchase",
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
