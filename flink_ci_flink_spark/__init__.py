"""flink_ci_flink_spark — a PySpark-native analytics engine.

A brand-new engine offering the query and data-processing surface of the
reference stream processor (an Apache Flink fork, see SURVEY.md), re-expressed
Spark-first:

- Batch SQL / Table surface  -> Spark SQL / DataFrame (Catalyst + Tungsten + AQE)
- DataStream / windows       -> Structured Streaming (+ stateful pandas operators)
- CEP / MATCH_RECOGNIZE      -> NFA over per-key ordered buffers (custom)
- Gelly graph ops            -> DataFrame join/agg iteration (driver loop)
- LLM-data-pipeline extras   -> dedup / similarity / text analysis / multimodal

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's public source tree.
"""

__version__ = "0.1.0"

from flink_ci_flink_spark.session import get_spark  # noqa: F401
from flink_ci_flink_spark.catalog import Tables, load_tables  # noqa: F401
