"""CEP: pattern matching over event streams (flink-cep parity, SURVEY §2.11)."""

from flink_ci_flink_spark.cep.pattern import (  # noqa: F401
    NO_SKIP,
    SKIP_PAST_LAST,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    Pattern,
)
from flink_ci_flink_spark.cep.nfa import (  # noqa: F401
    Match,
    TimedOutPartial,
    find_matches,
    find_matches_and_timeouts,
)
from flink_ci_flink_spark.cep.operator import (  # noqa: F401
    cep,
    cep_stream,
    cep_stream_timed_out,
    cep_timed_out,
    measure_select,
    timeout_measure_select,
)
from flink_ci_flink_spark.cep.match_recognize import (  # noqa: F401
    compile_pattern,
    match_recognize,
    match_recognize_sql,
    parse_match_recognize_sql,
)
