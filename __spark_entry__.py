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
# correctness check. Round-12 prefix (the round-11 judge's #1 task):
# (1) the final 14 names whose latest official proof is still r4 —
# closing the r4 freshness floor for good (two of them, countmin/
# heavy-hitters family, had their PLANS changed in r11, so a fresh
# official row matters more than usual); (2) the 8 TPC-DS batch-9/10
# shapes that have never appeared in an official CORRECTNESS_rN
# artifact (the r11 judge driver-sim'd all 8 green); (3) the first 28
# (alphabetical) of the 49 names whose latest proof is r6. 14+8+28 =
# 50 exactly. Round-13 prefix, recorded now so the rotation stays
# mechanical: the remaining 21 r6-stale names
# (tpcds_shape_histogram_buckets .. tpch_q*, udf_cogroup,
# udf_map_partitions) + the 14 never-official round-12 additions
# (batches 11-13 + pipe_delta_dedup_shared_index) + ~15 of the 46
# r7-stale names.
_PRIORITY = [
    # -- (1) the last 14 r4-proven names (freshness floor -> r6) --
    "flinksql_tumble",
    "flinksql_session",
    "flinksql_temporal_join",
    "pipe_hll_distinct",
    "pipe_kmv_distinct",
    "pipe_countmin_freq",
    "pipe_quantized_ann",
    "pipe_chunk_documents",
    "pipe_redact_pii",
    "pipe_contamination_overlap",
    "pipe_repetition_filters",
    "pipe_span_dedup",
    "pipe_strip_spans",
    "pipe_shard_assignment",
    # -- (2) never officially driver-sampled (r11 judge-sim green x8) --
    "tpcds_shape_max_channel_compose",
    "tpcds_shape_channel_pl_report",
    "tpcds_shape_exists_not_exists",
    "tpcds_shape_triple_fact_stats",
    "tpcds_shape_line_net_returns",
    "tpcds_shape_above_avg_of_sums",
    "tpcds_shape_disjunctive_bands",
    "tpcds_shape_cross_nation_basket",
    # -- (3) freshness floor: first 28 of the 49 r6-stale names --
    "cep_match_recognize_view_run",
    "cep_mr_error_run_until_purchase",
    "cep_timeout_click_purchase",
    "graph_adamic_adar",
    "graph_dedup_clusters_minhash",
    "graph_gsa_sssp_nations",
    "graph_sg_min_id_nations",
    "graph_sssp_nations",
    "graph_summarize_sources",
    "map_construct_explode",
    "null_safe_comparison",
    "over_count_distinct",
    "pipe_boilerplate_screen",
    "pipe_cosine_near_dup",
    "pipe_frame_sample",
    "pipe_ivf_full_probe",
    "pipe_multimodal_features",
    "pipe_resize_bmp",
    "pipe_sample_k_per_source",
    "pipe_token_count_by_source",
    "skew_salted_agg",
    "str_to_map_canonical",
    "temporal_overlaps_pred",
    "tpcds_shape_before_after_band",
    "tpcds_shape_dual_rank_union",
    "tpcds_shape_exists_either",
    "tpcds_shape_exists_over_avg",
    "tpcds_shape_having_count_between",
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
