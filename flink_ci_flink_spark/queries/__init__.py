"""Import all query modules so the registry is fully populated."""

from flink_ci_flink_spark.queries.registry import QUERIES, QuerySpec, query  # noqa: F401

# Each import registers its queries as a side effect.
from flink_ci_flink_spark.queries import tpch  # noqa: F401,E402
from flink_ci_flink_spark.queries import relational  # noqa: F401,E402
from flink_ci_flink_spark.queries import functions_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import events_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import pipeline_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import graph_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import cep_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import udf_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpch2  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpch3  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpch4  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes2  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes3  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes4  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes5  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes6  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes7  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes8  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes9  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes10  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes11  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes12  # noqa: F401,E402
from flink_ci_flink_spark.queries import tpcds_shapes13  # noqa: F401,E402
from flink_ci_flink_spark.queries import misc_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import dialect_q  # noqa: F401,E402
from flink_ci_flink_spark.queries import sketch_q  # noqa: F401,E402
