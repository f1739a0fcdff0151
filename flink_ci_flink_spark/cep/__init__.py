"""CEP: pattern matching over event streams (flink-cep parity, SURVEY §2.11)."""

from flink_ci_flink_spark.cep.pattern import (  # noqa: F401
    NO_SKIP,
    SKIP_PAST_LAST,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    Pattern,
)
from flink_ci_flink_spark.cep.nfa import Match, find_matches  # noqa: F401
from flink_ci_flink_spark.cep.operator import cep, cep_stream, measure_select  # noqa: F401
from flink_ci_flink_spark.cep.match_recognize import (  # noqa: F401
    compile_pattern,
    match_recognize,
    match_recognize_sql,
    parse_match_recognize_sql,
)
