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
        import numpy as np

        if state.exists:
            buf_n, buf_sum, win = state.get
        else:
            buf_n, buf_sum, win = 0, 0.0, 0
        chunks = [
            pdf.sort_values(ts_col, kind="stable")[value_col].astype(float).to_numpy()
            for pdf in pdf_iter
            if len(pdf)
        ]
        out_rows = []
        v = np.concatenate(chunks) if chunks else np.empty(0)
        total = buf_n + len(v)
        k = total // size  # full windows completed this batch
        if k:
            # vectorized window sums: cumsum + slicing, one state merge
            csum = np.cumsum(v)
            ends = np.array([size - buf_n + i * size - 1 for i in range(k)])
            sums = csum[ends].astype(float)
            sums[0] += buf_sum
            sums[1:] -= csum[ends[:-1]]
            out_rows = [
                (key_tuple[0], win + i, size, float(s)) for i, s in enumerate(sums)
            ]
            buf_sum = float(csum[-1] - csum[ends[-1]])
            win += k
        elif len(v):
            buf_sum += float(v.sum())
        buf_n = total - k * size
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
        import numpy as np

        s, n = state.get if state.exists else (0.0, 0)
        frames = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col, kind="stable")
            tcol = pdf[ts_col]
            tsec = (
                tcol.astype("int64").to_numpy() / 1e9
                if pd.api.types.is_datetime64_any_dtype(tcol)
                else tcol.astype(float).to_numpy()
            )
            vals = pdf[value_col].astype(float).to_numpy()
            run = np.cumsum(vals) + s
            cnt = np.arange(1, len(vals) + 1, dtype="int64") + n
            s = float(run[-1])
            n = int(cnt[-1])
            frames.append(
                pd.DataFrame(
                    {
                        key: key_tuple[0],
                        "ts_s": tsec,
                        "value": vals,
                        "running_sum": run,
                        "running_n": cnt,
                    }
                )
            )
        state.update((s, n))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return keyed_process(df, [key], fn, out_schema, state_schema, output_mode="append")


def streaming_bounded_over(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    rows_preceding: int | None = None,
    range_preceding: float | None = None,
) -> DataFrame:
    """Bounded streaming over-window: per input row, sum/count over the
    last `rows_preceding` rows (ROWS BETWEEN N PRECEDING AND CURRENT ROW) or
    the last `range_preceding` seconds (RANGE BETWEEN T PRECEDING AND
    CURRENT ROW), per key, in event-time order.

    Reference: `RowTimeRangeBoundedPrecedingFunction.java:60` /
    `ProcTimeRowsBoundedPrecedingFunction.java` (operators/over/) — keyed
    state retains only the in-window suffix, exactly as here (state is the
    last N rows / last T seconds per key, pruned every batch). Events are
    processed in event-time order within each micro-batch; cross-batch
    ordering follows arrival order (the proc-time caveat shared by every
    operator in this module).

    Output: (key, ts_s, value, w_sum, w_n) — one row per input row.
    """
    if (rows_preceding is None) == (range_preceding is None):
        raise ValueError("exactly one of rows_preceding / range_preceding")
    out_schema = f"{key} long, ts_s double, value double, w_sum double, w_n long"
    state_schema = "ts array<double>, vals array<double>"

    def fn(key_tuple, pdf_iter, state):
        import numpy as np

        if state.exists:
            buf_ts, buf_vals = state.get
            buf_ts = np.asarray(buf_ts, dtype=float)
            buf_vals = np.asarray(buf_vals, dtype=float)
        else:
            buf_ts = np.empty(0)
            buf_vals = np.empty(0)
        frames = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col, kind="stable")
            tcol = pdf[ts_col]
            tsec = (
                tcol.astype("int64").to_numpy() / 1e9
                if pd.api.types.is_datetime64_any_dtype(tcol)
                else tcol.astype(float).to_numpy()
            )
            vals = pdf[value_col].astype(float).to_numpy()
            all_ts = np.concatenate([buf_ts, tsec])
            all_vals = np.concatenate([buf_vals, vals])
            csum = np.concatenate([[0.0], np.cumsum(all_vals)])
            k = len(buf_ts)
            idx = np.arange(k, len(all_ts))
            if rows_preceding is not None:
                lo = np.maximum(idx - rows_preceding, 0)
            else:
                # windows are time-based: binary search the left edge
                lo = np.searchsorted(all_ts, all_ts[idx] - range_preceding, "left")
            w_sum = csum[idx + 1] - csum[lo]
            w_n = idx + 1 - lo
            frames.append(
                pd.DataFrame(
                    {
                        key: key_tuple[0],
                        "ts_s": tsec,
                        "value": vals,
                        "w_sum": w_sum,
                        "w_n": w_n.astype("int64"),
                    }
                )
            )
            # retain only the suffix future windows can reach
            if rows_preceding is not None:
                buf_ts = all_ts[-rows_preceding:] if rows_preceding else all_ts[:0]
                buf_vals = all_vals[-rows_preceding:] if rows_preceding else all_vals[:0]
            else:
                keep = all_ts > all_ts[-1] - range_preceding
                buf_ts = all_ts[keep]
                buf_vals = all_vals[keep]
        state.update((buf_ts.tolist(), buf_vals.tolist()))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return keyed_process(df, [key], fn, out_schema, state_schema, output_mode="append")


def count_sliding_window(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    size: int,
    slide: int,
) -> DataFrame:
    """Sliding COUNT window (`CountSlidingWindowAssigner`): every `slide`
    events per key, emit (count, sum) over the last `size` events. The first
    emission waits for a full `size` events (reference semantics: windows
    are [n*slide - size, n*slide))."""
    out_schema = f"{key} long, win long, n long, total double"
    state_schema = "ts array<double>, vals array<double>, seen long, win long"

    def fn(key_tuple, pdf_iter, state):
        import numpy as np

        if state.exists:
            buf_ts, buf_vals, seen, win = state.get
            buf_ts = list(buf_ts)
            buf_vals = list(buf_vals)
        else:
            buf_ts, buf_vals, seen, win = [], [], 0, 0
        out_rows = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col, kind="stable")
            tcol = pdf[ts_col]
            tsec = (
                tcol.astype("int64").to_numpy() / 1e9
                if pd.api.types.is_datetime64_any_dtype(tcol)
                else tcol.astype(float).to_numpy()
            )
            vals = pdf[value_col].astype(float).to_numpy()
            for t, v in zip(tsec, vals):
                buf_ts.append(float(t))
                buf_vals.append(float(v))
                seen += 1
                if seen >= size and (seen - size) % slide == 0:
                    window = buf_vals[-size:]
                    out_rows.append(
                        (key_tuple[0], win, len(window), float(np.sum(window)))
                    )
                    win += 1
            # only the last size-1 values can appear in a future window
            buf_ts = buf_ts[-(size - 1) :] if size > 1 else []
            buf_vals = buf_vals[-(size - 1) :] if size > 1 else []
        state.update((buf_ts, buf_vals, seen, win))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[key, "win", "n", "total"])

    return keyed_process(df, [key], fn, out_schema, state_schema, output_mode="append")
