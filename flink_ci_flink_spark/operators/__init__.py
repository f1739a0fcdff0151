"""Custom operators the reference has and Spark lacks as single primitives.

Each module documents its reference analog (file:line) and why the chosen
Spark formulation is the scalable one.
"""

from flink_ci_flink_spark.operators.joins import (  # noqa: F401
    asof_join,
    async_lookup,
    interval_join,
    lookup_join,
)
from flink_ci_flink_spark.operators.topn import top_n  # noqa: F401
from flink_ci_flink_spark.operators.dedup import deduplicate  # noqa: F401
from flink_ci_flink_spark.operators.windows import tumble, hop, session, sessionize  # noqa: F401
