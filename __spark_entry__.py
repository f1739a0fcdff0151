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
# correctness check. Round-6 prefix = the complement of the 124 queries
# already driver-proven green across rounds 1-4 (CORRECTNESS_r01..r04.json;
# no r5 artifact was recorded), 54 names total with the four queries added
# in round 5 (Gelly iteration models, CEP timeout, expansion-compiled
# MATCH_RECOGNIZE run) placed first. The driver checks the first 50; the
# remaining 4 rotate into round 7's prefix.
_PRIORITY = [
    "graph_gsa_sssp_nations",
    "graph_sg_min_id_nations",
    "cep_timeout_click_purchase",
    "cep_mr_error_run_until_purchase",
    "pipe_token_count_by_source",
    "pipe_cosine_near_dup",
    "pipe_multimodal_features",
    "pipe_resize_bmp",
    "pipe_frame_sample",
    "pipe_ivf_full_probe",
    "pipe_boilerplate_screen",
    "pipe_sample_k_per_source",
    "pipe_tfidf_top_terms",
    "graph_sssp_nations",
    "graph_adamic_adar",
    "graph_summarize_sources",
    "graph_dedup_clusters_minhash",
    "cep_match_recognize_view_run",
    "udf_cogroup",
    "udf_map_partitions",
    "tpch_q4_order_priority",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q22_global_sales",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q20_potential_promotion",
    "tpcds_shape_multi_bucket_counts",
    "tpcds_shape_threeway_intersect",
    "tpcds_shape_exists_either",
    "tpcds_shape_having_count_between",
    "tpcds_shape_quarter_share",
    "tpcds_shape_sale_return_rebuy",
    "tpcds_shape_dual_rank_union",
    "tpcds_shape_part_or_filter",
    "tpcds_shape_before_after_band",
    "tpcds_shape_scalar_ratio",
    "tpcds_shape_histogram_buckets",
    "tpcds_shape_topn_intersection",
    "tpcds_shape_exists_over_avg",
    "map_construct_explode",
    "null_safe_comparison",
    "str_to_map_canonical",
    "temporal_overlaps_pred",
    "over_count_distinct",
    "skew_salted_agg",
    "skew_salted_join",
    "skew_split_distinct",
    "flinksql_hop",
    "flinksql_temporal_fn",
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
