"""Scalar/temporal/string function surface (SURVEY.md §2.9)."""

from flink_ci_flink_spark.functions.scalar import (  # noqa: F401
    FLINK_TO_SPARK,
    ceil_ts,
    hash_code,
    is_alpha,
    is_decimal,
    is_digit,
    register_all,
    split_index,
    sum0,
    temporal_overlaps,
    truncate,
)
