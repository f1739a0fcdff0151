"""CEP: pattern matching over event streams (flink-cep parity, SURVEY §2.11)."""

from flink_ci_flink_spark.cep.pattern import NO_SKIP, SKIP_PAST_LAST, Pattern  # noqa: F401
from flink_ci_flink_spark.cep.nfa import Match, find_matches  # noqa: F401
from flink_ci_flink_spark.cep.operator import cep, cep_stream  # noqa: F401
from flink_ci_flink_spark.cep.match_recognize import compile_pattern, match_recognize  # noqa: F401
