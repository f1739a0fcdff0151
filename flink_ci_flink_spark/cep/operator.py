"""CEP execution operators: batch (applyInPandas) and streaming
(applyInPandasWithState).

Reference: `cep/operator/CepOperator.java:83` — buffers events per key in
keyed state, sorts by event time as the watermark advances, and runs the NFA
over the ordered prefix. Our streaming operator does exactly that shape:
per-key buffer in group state, matches emitted once their last event falls
at or before (max event time seen − delay), matched-or-expired prefix
pruned. The batch operator sorts each key group once and evaluates in a
single pass (the bounded-input degenerate case).

SQL MATCH_RECOGNIZE (`StreamExecMatch.scala:68`) compiles to the same NFA in
the reference; here `match_recognize`-style queries are expressed by
building a Pattern and calling cep() — see queries/cep_q.py.

Scale: one shuffle on the key; per-key buffers bounded by the within-window
(+ delay) in streaming. Python evaluation is per key-group and
Arrow-batched; for hot keys the within bound caps the buffer.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame

from flink_ci_flink_spark.cep.nfa import find_matches
from flink_ci_flink_spark.cep.pattern import Pattern

#: A select function: (key_tuple, match, events) -> dict of output columns.
SelectFn = Callable[[tuple, "Match", list], dict]


def cep(
    df: DataFrame,
    pattern: Pattern,
    keys: list[str],
    ts_col: str,
    select: SelectFn,
    output_schema: str,
) -> DataFrame:
    """Batch CEP: find all pattern matches per key over event-time order.

    `select` maps each match to an output row (dict). Events are passed to
    predicates as plain dicts; ts is converted to epoch seconds under the
    key `__ts`. Ties in ts are broken by original row order (stable sort)."""

    def run(key_tuple, pdf: pd.DataFrame):
        pdf = pdf.sort_values(ts_col, kind="stable").reset_index(drop=True)
        events = pdf.to_dict("records")
        for e in events:
            t = e[ts_col]
            e["__ts"] = t.timestamp() if hasattr(t, "timestamp") else float(t)
        out = [
            select(key_tuple, m, events)
            for m in find_matches(pattern, events, ts_field="__ts")
        ]
        return pd.DataFrame(out) if out else pd.DataFrame()

    return df.groupBy(*keys).applyInPandas(
        lambda key, pdf: run(key, pdf), output_schema
    )


def cep_stream(
    df: DataFrame,
    pattern: Pattern,
    keys: list[str],
    ts_col: str,
    select: SelectFn,
    output_schema: str,
    delay_seconds: float = 0.0,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming CEP over a keyed stream (CepOperator analog).

    Buffers events in group state; a match is emitted once its last event's
    time ≤ (max event time observed for the key − delay_seconds) — the
    per-key watermark proxy. Buffer entries older than the emit frontier
    minus the pattern's within-window are pruned. Exactly-once emission via
    a monotone frontier stored in state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    payload_cols = payload_cols or [c for c in df.columns if c not in keys]
    if pattern.within_seconds is None:
        raise ValueError(
            "cep_stream requires pattern.within(...) — it bounds per-key state"
        )
    within = pattern.within_seconds
    state_schema = "ts array<double>, payload array<string>, frontier double"

    def run(key_tuple, pdf_iter, state):
        import json

        if state.exists:
            ts_list, payload, frontier = state.get
            ts_list = list(ts_list)
            payload = list(payload)
        else:
            ts_list, payload, frontier = [], [], float("-inf")
        for pdf in pdf_iter:
            for _, row in pdf.iterrows():
                t = row[ts_col]
                tsec = t.timestamp() if hasattr(t, "timestamp") else float(t)
                ts_list.append(tsec)
                payload.append(json.dumps({c: str(row[c]) for c in payload_cols}))
        order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
        ts_list = [ts_list[i] for i in order]
        payload = [payload[i] for i in order]
        max_ts = ts_list[-1] if ts_list else float("-inf")
        emit_upto = max_ts - delay_seconds

        events = []
        for tsec, pj in zip(ts_list, payload):
            e = json.loads(pj)
            e["__ts"] = tsec
            events.append(e)
        out = []
        for m in find_matches(pattern, events, ts_field="__ts"):
            last_ts = events[m.end_idx]["__ts"]
            if frontier < last_ts <= emit_upto:
                out.append(select(key_tuple, m, events))
        new_frontier = max(frontier, emit_upto)
        keep_from = emit_upto - within
        kept = [(t, p) for t, p in zip(ts_list, payload) if t >= keep_from]
        state.update(
            ([t for t, _ in kept], [p for _, p in kept], new_frontier)
        )
        yield pd.DataFrame(out) if out else pd.DataFrame(
            {c: [] for c in _schema_cols(output_schema)}
        )

    return df.groupBy(*keys).applyInPandasWithState(
        run, output_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _schema_cols(schema: str) -> list[str]:
    return [part.strip().split()[0] for part in schema.split(",")]
