"""MATCH_RECOGNIZE-style helper over the CEP engine.

Reference: SQL `MATCH_RECOGNIZE` compiles onto the CEP NFA
(`StreamExecMatch.scala:68`, runtime glue flink-table-runtime-blink
`operators/match/`). Spark SQL has no MATCH_RECOGNIZE; this helper exposes
the same model as a DataFrame transform without parser work:

    match_recognize(
        df, partition_by="user_id", order_by="ts",
        pattern="A B+ C",
        define={
            "A": lambda e: e["event_type"] == "click",
            "B": lambda e: e["event_type"] == "view",
            "C": lambda e: e["event_type"] == "purchase",
        },
        measures={
            "first_a": ("A", "first", "event_id"),
            "n_b": ("B", "count", None),
            "last_c": ("C", "last", "event_id"),
        },
        within=3600,
        after_match="skip_past_last",   # SKIP PAST LAST ROW (SQL default)
        output_schema="user_id long, first_a long, n_b long, last_c long",
    )

Pattern grammar: variables separated by spaces; quantifiers `?` (optional),
`+` (one-or-more, bounded), `{m}` / `{m,n}`. Contiguity between variables is
strict (MATCH_RECOGNIZE rows are consecutive within the partition).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame

from flink_ci_flink_spark.cep.operator import cep, cep_stream
from flink_ci_flink_spark.cep.pattern import NO_SKIP, SKIP_PAST_LAST, Pattern

_TOKEN = re.compile(r"^(\w+)(\?|\+|\*|\{(\d+)(,(\d+))?\})?$")

#: measure kinds: (variable, kind, field) — kind in first/last/count/sum_field
_MEASURE_FNS = {
    "first": lambda events, idxs, field: events[idxs[0]][field],
    "last": lambda events, idxs, field: events[idxs[-1]][field],
    "count": lambda events, idxs, field: len(idxs),
    "sum": lambda events, idxs, field: sum(events[i][field] for i in idxs),
}


def compile_pattern(
    pattern: str,
    define: dict[str, Callable[[dict], bool]],
    within: float | None = None,
    after_match: str = SKIP_PAST_LAST,
    max_repeat: int = 16,
    define_expr: dict[str, str] | None = None,
) -> Pattern:
    """Compile a MATCH_RECOGNIZE pattern string into a Pattern.

    ``define_expr`` optionally maps variables to equivalent Spark SQL
    boolean expressions — with every variable expr'd, fixed patterns take
    the compiled lead() plan and variable ones still get JVM-side predicate
    evaluation (cep/compiled.py, cep/operator.py)."""
    define_expr = define_expr or {}
    p: Pattern | None = None
    for tok in pattern.split():
        m = _TOKEN.match(tok)
        if not m:
            raise ValueError(f"bad pattern token {tok!r}")
        name, quant = m.group(1), m.group(2)
        pred = define.get(name)
        expr = define_expr.get(name)
        if p is None:
            p = Pattern.begin(name, pred, expr=expr)
        else:
            p = p.next(name, pred, expr=expr)
        # MATCH_RECOGNIZE rows are consecutive within the partition, so
        # quantified variables repeat strictly (consecutive) — unlike the
        # Pattern API, where loop repeats default to relaxed contiguity.
        if quant == "?":
            p = p.optional_()
        elif quant == "+":
            p = p.times(1, max_repeat).consecutive_()
        elif quant == "*":
            p = p.times(1, max_repeat).optional_().consecutive_()
        elif quant and quant.startswith("{"):
            lo = int(m.group(3))
            hi = int(m.group(5)) if m.group(5) else lo
            p = p.times(lo, hi).consecutive_()
    assert p is not None, "empty pattern"
    if within is not None:
        p = p.within(within)
    return p.after_match_skip(after_match)


def _measure_select(measures: dict[str, tuple], keys: list[str]):
    def select(key_tuple, match, events):
        out = {k: key_tuple[i] for i, k in enumerate(keys)}
        for out_name, (var, kind, field) in measures.items():
            idxs = match.groups.get(var, [])
            out[out_name] = _MEASURE_FNS[kind](events, idxs, field) if idxs else None
        return out

    return select


def match_recognize(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str,
    pattern: str,
    define: dict[str, Callable[[dict], bool]],
    measures: dict[str, tuple],
    output_schema: str,
    within: float | None = None,
    after_match: str = SKIP_PAST_LAST,
    streaming: bool = False,
    delay_seconds: float = 0.0,
    define_expr: dict[str, str] | None = None,
) -> DataFrame:
    """One row per match, with MEASURES computed per pattern variable.

    Pass ``define_expr`` (variable -> Spark SQL boolean expr) to unlock the
    compiled lead() plan for fixed-length patterns and JVM predicate
    pushdown otherwise."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    pat = compile_pattern(pattern, define, within, after_match, define_expr=define_expr)
    select = _measure_select(measures, keys)
    if streaming:
        return cep_stream(
            df, pat, keys, order_by, select, output_schema, delay_seconds
        )
    if all(st.expr is not None for st in pat.stages):
        return cep(df, pat, keys, order_by, select, output_schema, measures=measures)
    return cep(df, pat, keys, order_by, select, output_schema)
