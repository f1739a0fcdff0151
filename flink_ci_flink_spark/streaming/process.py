"""Keyed process-function kit: per-key state + timeouts on a stream.

Reference parity: `KeyedProcessFunction` (+ keyed state `ValueState`/
`MapState`... `flink-core/.../api/common/state/`, timers
`TimerService.java`) → `applyInPandasWithState`: one state object per key,
processing-/event-time timeouts, Arrow-batched user code. Derived operators
below: streaming top-n (`AppendOnlyTopNFunction.java:46`) and keep-last
dedup (`DeduplicateKeepLastRowFunction.java:36`).

Scale: state lives in the Spark state store (RocksDB provider in prod),
partitioned by key — identical distribution story to the reference's keyed
state backend.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def keyed_process(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[Any, Iterable[pd.DataFrame], GroupState], Iterable[pd.DataFrame]],
    output_schema: str,
    state_schema: str,
    output_mode: str = "update",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """ProcessFunction analog: ``fn(key, batch_iter, state) -> pdf iter``.

    ``timeout``: NoTimeout | ProcessingTimeTimeout | EventTimeTimeout
    (EventTimeTimeout requires a watermark on ``df``)."""
    return df.groupBy(*keys).applyInPandasWithState(
        fn, output_schema, state_schema, output_mode, getattr(GroupStateTimeout, timeout)
    )


def streaming_top_n(
    df: DataFrame,
    key: str,
    order_col: str,
    n: int,
    payload_cols: list[str],
    output_mode: str = "update",
) -> DataFrame:
    """Keep the running top-n rows per key (descending by order_col),
    re-emitting the current top-n on every update — the AppendOnlyTopN
    behavior (inserts only, no retractions needed upstream)."""
    schema_out = ", ".join(
        [f"{key} long", f"{order_col} double", "rn integer"]
        + [f"{c} string" for c in payload_cols]
    )
    state_schema = (
        f"vals array<double>, payloads array<string>"
    )

    def fn(key_tuple, pdf_iter, state: GroupState):
        if state.exists:
            vals, payloads = state.get
            vals = list(vals)
            payloads = [list(p) for p in payloads]
        else:
            vals, payloads = [], []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            # vectorized per-batch extraction (no per-row iterrows)
            vals.extend(pdf[order_col].astype(float).tolist())
            payloads.extend(pdf[payload_cols].astype(str).to_numpy().tolist())
        order = sorted(range(len(vals)), key=lambda i: (-vals[i], payloads[i]))[:n]
        vals = [vals[i] for i in order]
        payloads = [payloads[i] for i in order]
        state.update((vals, payloads))
        out = {
            key: [key_tuple[0]] * len(vals),
            order_col: vals,
            "rn": list(range(1, len(vals) + 1)),
        }
        for ci, c in enumerate(payload_cols):
            out[c] = [p[ci] for p in payloads]
        yield pd.DataFrame(out)

    return keyed_process(df, [key], fn, schema_out, state_schema, output_mode)


def streaming_dedup_keep_last(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Keep-last deduplication on a stream: emits the latest row per key on
    every update (update mode — the changelog-style output the reference's
    DeduplicateKeepLastRow produces, minus retract records)."""
    schema_out = ", ".join(
        [f"{k} long" for k in keys] + ["ts_s double"] + [f"{c} string" for c in payload_cols]
    )
    state_schema = "ts_s double, payload array<string>"

    def fn(key_tuple, pdf_iter, state: GroupState):
        best_ts = state.get[0] if state.exists else float("-inf")
        best_payload = list(state.get[1]) if state.exists else None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            # vectorized batch reduction: single idxmax, one state merge
            s = pdf[ts_col]
            tsv = (
                s.astype("int64") / 1e9
                if pd.api.types.is_datetime64_any_dtype(s)
                else s.astype(float)
            )
            i = tsv.idxmax()  # first occurrence of the max, like the scan
            if float(tsv.loc[i]) > best_ts:
                best_ts = float(tsv.loc[i])
                best_payload = [str(pdf.loc[i, c]) for c in payload_cols]
        if best_payload is not None:
            state.update((best_ts, best_payload))
            out = {k: [key_tuple[i]] for i, k in enumerate(keys)}
            out["ts_s"] = [best_ts]
            for ci, c in enumerate(payload_cols):
                out[c] = [best_payload[ci]]
            yield pd.DataFrame(out)

    return keyed_process(df, keys, fn, schema_out, state_schema, "update")
