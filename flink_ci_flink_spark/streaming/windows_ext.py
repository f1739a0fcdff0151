"""Streaming window extensions Spark lacks natively: count windows and
running (over-window) aggregates on a stream.

Reference parity:
- Count windows: `CountTumblingWindowAssigner` / `CountSlidingWindowAssigner`
  (flink-table-runtime-blink operators/window/assigners/) and DataStream
  `countWindow`. Spark has no count-based windows → keyed-process state.
- Streaming over-window: `ProcTimeUnboundedPrecedingFunction.java` /
  `RowTimeRangeBoundedPrecedingFunction.java:60` (operators/over/) —
  per-record running aggregates on a keyed stream → keyed-process state.

Both operators process events in event-time order within each micro-batch
(sorted per key), with running state carried across batches. As with the
reference's proc-time variants, cross-batch ordering follows arrival order.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from flink_ci_flink_spark.streaming.process import keyed_process


def count_tumbling_window(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    size: int,
) -> DataFrame:
    """Tumbling COUNT window: emit (count, sum) for every `size` events per
    key, in event-time order of arrival. Output rows carry the window ordinal.
    """
    out_schema = f"{key} long, win long, n long, total double"
    state_schema = "buf_n long, buf_sum double, win long"

    def fn(key_tuple, pdf_iter, state):
        if state.exists:
            buf_n, buf_sum, win = state.get
        else:
            buf_n, buf_sum, win = 0, 0.0, 0
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="stable")
            for v in pdf[value_col]:
                buf_n += 1
                buf_sum += float(v)
                if buf_n == size:
                    out_rows.append((key_tuple[0], win, buf_n, buf_sum))
                    buf_n, buf_sum, win = 0, 0.0, win + 1
        state.update((buf_n, buf_sum, win))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[key, "win", "n", "total"])

    return keyed_process(
        df, [key], fn, out_schema, state_schema, output_mode="append"
    )


def streaming_running_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Unbounded-preceding running sum/count/avg per key, one output row per
    input row (streaming over-window, RANGE UNBOUNDED PRECEDING)."""
    out_schema = (
        f"{key} long, ts_s double, value double, running_sum double, running_n long"
    )
    state_schema = "running_sum double, running_n long"

    def fn(key_tuple, pdf_iter, state):
        s, n = state.get if state.exists else (0.0, 0)
        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="stable")
            for _, row in pdf.iterrows():
                t = row[ts_col]
                tsec = t.timestamp() if hasattr(t, "timestamp") else float(t)
                s += float(row[value_col])
                n += 1
                rows.append((key_tuple[0], tsec, float(row[value_col]), s, n))
        state.update((s, n))
        if rows:
            yield pd.DataFrame(
                rows, columns=[key, "ts_s", "value", "running_sum", "running_n"]
            )

    return keyed_process(df, [key], fn, out_schema, state_schema, output_mode="append")
