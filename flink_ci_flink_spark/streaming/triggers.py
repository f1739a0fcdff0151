"""Custom window triggers and evictors on the keyed-process kit.

Reference parity (flink-streaming-java `windowing/triggers/`, `windowing/
evictors/`, wired via `WindowedStream.java:137` trigger() / `:190` evictor()):

- `CountTrigger.java` — fire every N elements in the window.
- `DeltaTrigger.java` — fire when delta(baseline, element) > threshold; the
  firing element becomes the new baseline.
- `ContinuousEventTimeTrigger.java` — fire at each event-time interval
  boundary while the window is open, and at the window end.
- `EventTimeTrigger.java` — the default: fire once when the watermark
  passes the window end.
- `PurgingTrigger.java` — wrapper turning FIRE into FIRE_AND_PURGE.
- `CountEvictor.java` — keep only the last N elements at firing time.
- `TimeEvictor.java` — keep only elements within the trailing T seconds
  of the window's max timestamp.
- `DeltaEvictor.java` — evict elements whose delta against the window's
  LAST element is >= threshold.

The reference's own count windows are compositions of these
(`DataStream.countWindow(n)` = GlobalWindows + PurgingTrigger(CountTrigger);
`countWindow(size, slide)` = GlobalWindows + CountTrigger(slide) +
CountEvictor(size)) — tests assert this module reproduces the dedicated
count-window operators (`windows_ext.py`) through exactly those
compositions.

Spark-first shape: Structured Streaming's built-in windows always fire at
watermark close, so custom firing needs keyed state —
`applyInPandasWithState` via `keyed_process`, per-key window buffers in a
JSON state blob (bounded: tumbling windows are purged once fired at the
event-time frontier; evictors prune buffers; global-window users fire/purge
by count or delta). Elements are processed in event-time order within each
micro-batch; cross-batch ordering follows arrival order — the same
proc-time caveat as every operator in `windows_ext.py`. The per-key
event-time frontier (max ts seen) stands in for the watermark, matching
`cep_stream`'s convention.

Evictor semantics follow the reference's evictBefore: evicted elements are
removed from window STATE, not just from the emitted aggregate.

ProcessingTime trigger variants (`ProcessingTimeTrigger`,
`ContinuousProcessingTimeTrigger`) are deliberately absent: in the
micro-batch model every element is processed at arrival and batch
boundaries ARE the processing-time ticks, so their observable behavior is
the element/batch-boundary firing already provided; a wall-clock-firing
trigger would make replay tests nondeterministic for no added capability.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame

from flink_ci_flink_spark.streaming.process import keyed_process

CONTINUE, FIRE, FIRE_AND_PURGE = 0, 1, 2


@dataclass(frozen=True)
class CountTrigger:
    """Fire every `n` elements (`CountTrigger.java`)."""

    n: int

    def on_element(
        self, trig: dict, ts: float, val: float, win_end: float = math.inf,
        frontier: float | None = None,
    ) -> int:
        trig["c"] = trig.get("c", 0) + 1
        if trig["c"] >= self.n:
            trig["c"] = 0
            return FIRE
        return CONTINUE

    def on_time(self, trig: dict, win_end: float, frontier: float) -> int:
        return CONTINUE


@dataclass(frozen=True)
class DeltaTrigger:
    """Fire when |value - baseline| > threshold; the firing element becomes
    the new baseline (`DeltaTrigger.java` with the scalar delta function).
    The first element seeds the baseline without firing."""

    threshold: float

    def on_element(
        self, trig: dict, ts: float, val: float, win_end: float = math.inf,
        frontier: float | None = None,
    ) -> int:
        if "b" not in trig:
            trig["b"] = val
            return CONTINUE
        if abs(val - trig["b"]) > self.threshold:
            trig["b"] = val
            return FIRE
        return CONTINUE

    def on_time(self, trig: dict, win_end: float, frontier: float) -> int:
        return CONTINUE


@dataclass(frozen=True)
class EventTimeTrigger:
    """Fire once when the event-time frontier passes the window end
    (`EventTimeTrigger.java` — the default trigger).

    Late-but-allowed elements fire immediately (the reference's
    `EventTimeTrigger.onElement`: window.maxTimestamp <= currentWatermark
    -> FIRE), producing the corrected re-emission; purging is the
    operator's job at win_end + allowedLateness, never the trigger's."""

    def on_element(
        self, trig: dict, ts: float, val: float, win_end: float = math.inf,
        frontier: float | None = None,
    ) -> int:
        if frontier is not None and win_end <= frontier:
            trig["fired"] = True
            return FIRE
        return CONTINUE

    def on_time(self, trig: dict, win_end: float, frontier: float) -> int:
        if frontier >= win_end and not trig.get("fired"):
            trig["fired"] = True
            return FIRE
        return CONTINUE


@dataclass(frozen=True)
class ContinuousEventTimeTrigger:
    """Fire at every `interval` event-time boundary while the window is
    open, plus the final fire at the window end; late-but-allowed elements
    re-fire immediately (`ContinuousEventTimeTrigger.java`)."""

    interval: float

    def on_element(
        self, trig: dict, ts: float, val: float, win_end: float = math.inf,
        frontier: float | None = None,
    ) -> int:
        if "next" not in trig:
            trig["next"] = math.floor(ts / self.interval) * self.interval + self.interval
        if frontier is not None and win_end <= frontier:
            trig["fired"] = True
            return FIRE
        return CONTINUE

    def on_time(self, trig: dict, win_end: float, frontier: float) -> int:
        if frontier >= win_end:
            if trig.get("fired"):
                return CONTINUE
            trig["fired"] = True
            return FIRE
        if "next" in trig and frontier >= trig["next"]:
            # advance past every boundary the frontier already crossed
            trig["next"] = (
                math.floor(frontier / self.interval) * self.interval + self.interval
            )
            return FIRE
        return CONTINUE


@dataclass(frozen=True)
class PurgingTrigger:
    """Turn an inner trigger's FIRE into FIRE_AND_PURGE (`PurgingTrigger.java`)."""

    inner: object

    def on_element(
        self, trig: dict, ts: float, val: float, win_end: float = math.inf,
        frontier: float | None = None,
    ) -> int:
        r = self.inner.on_element(trig, ts, val, win_end=win_end, frontier=frontier)
        return FIRE_AND_PURGE if r == FIRE else r

    def on_time(self, trig: dict, win_end: float, frontier: float) -> int:
        r = self.inner.on_time(trig, win_end, frontier)
        return FIRE_AND_PURGE if r == FIRE else r


@dataclass(frozen=True)
class CountEvictor:
    """Keep only the last `n` elements (`CountEvictor.java`)."""

    n: int

    def select(self, ts: list[float], vals: list[float]):
        return ts[-self.n :], vals[-self.n :]


@dataclass(frozen=True)
class TimeEvictor:
    """Keep only elements within `seconds` of the buffer's max timestamp
    (`TimeEvictor.java`)."""

    seconds: float

    def select(self, ts: list[float], vals: list[float]):
        cut = max(ts) - self.seconds
        kept = [(t, v) for t, v in zip(ts, vals) if t > cut]
        return [t for t, _ in kept], [v for _, v in kept]


@dataclass(frozen=True)
class DeltaEvictor:
    """Evict elements whose |value - last element's value| >= threshold
    (`DeltaEvictor.java`, evictBefore against the window's last element)."""

    threshold: float

    def select(self, ts: list[float], vals: list[float]):
        last = vals[-1]
        kept = [(t, v) for t, v in zip(ts, vals) if abs(v - last) < self.threshold]
        return [t for t, _ in kept], [v for _, v in kept]


#: aggregate library for triggered_window firings (WindowedStream.reduce /
#: aggregate analog): name -> fn(values) over the evictor-retained buffer
WINDOW_AGGS = {
    "count": lambda vals: len(vals),
    "sum": lambda vals: float(sum(vals)),
    "min": lambda vals: float(min(vals)),
    "max": lambda vals: float(max(vals)),
    "avg": lambda vals: float(sum(vals)) / len(vals),
    "first": lambda vals: float(vals[0]),
    "last": lambda vals: float(vals[-1]),
}


def triggered_window(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    trigger,
    evictor=None,
    window_seconds: float | None = None,
    aggs: dict[str, str] | None = None,
    allowed_lateness: float = 0.0,
) -> DataFrame:
    """Keyed windowed stream with a custom trigger and optional evictor
    (`WindowedStream.trigger/evictor`). ``window_seconds=None`` uses a
    single global window per key (`GlobalWindows`), else event-time
    tumbling windows of that size.

    Output: one row per firing — (key, win, fire_seq, n, total, *aggs)
    where `win` is the window start epoch (0 for the global window),
    `fire_seq` numbers the firings per window, `n`/`total` are count/sum
    of the evictor-retained elements, and ``aggs`` optionally adds named
    columns from WINDOW_AGGS (``{"low": "min", "high": "max"}`` — the
    `WindowedStream.reduce/aggregate` analog). Firings happen on elements
    (count/delta triggers) and, for event-time triggers, when the per-key
    frontier (max event time seen) crosses a boundary at the end of each
    micro-batch; fired tumbling windows are purged once
    win_end + allowed_lateness passes the frontier, which bounds state.

    ``allowed_lateness`` (reference: `WindowedStream.allowedLateness`,
    `WindowOperator.java:349,388,420`): an element landing in an
    already-fired window that is still within lateness RE-FIRES the window
    with the corrected aggregate — an update-mode re-emission carrying the
    next ``fire_seq`` for the same ``win``, so downstream keeps the
    max-fire_seq row per (key, win). Elements beyond
    win_end + allowed_lateness are dropped here; route them to a side sink
    by composing with `streaming/late.py::side_output_late_data` upstream
    (the `sideOutputLateData` analog)."""
    aggs = aggs or {}
    for out_name, agg_name in aggs.items():
        if agg_name not in WINDOW_AGGS:
            raise ValueError(f"unknown window aggregate {agg_name!r}")
    extra_cols = "".join(f", {name} double" for name in aggs)
    out_schema = (
        f"{key} long, win long, fire_seq long, n long, total double{extra_cols}"
    )
    state_schema = "blob string"

    def fn(key_tuple, pdf_iter, state):
        st = json.loads(state.get[0]) if state.exists else {"w": {}, "frontier": None}
        wins: dict = st["w"]
        out_rows = []

        def fire(wk: str, w: dict, purge: bool) -> None:
            ts_l, vals_l = w["ts"], w["vals"]
            if not ts_l:
                return
            if evictor is not None:
                ts_l, vals_l = evictor.select(ts_l, vals_l)
                w["ts"], w["vals"] = list(ts_l), list(vals_l)  # evict from state
            w["seq"] = w.get("seq", 0) + 1
            out_rows.append(
                (
                    key_tuple[0],
                    int(float(wk)),
                    w["seq"] - 1,
                    len(vals_l),
                    float(sum(vals_l)),
                    *(WINDOW_AGGS[a](vals_l) for a in aggs.values()),
                )
            )
            if purge:
                w["ts"], w["vals"] = [], []

        frontier = st["frontier"]
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
                t, v = float(t), float(v)
                wk = (
                    "0"
                    if window_seconds is None
                    else str(math.floor(t / window_seconds) * window_seconds)
                )
                # Drop elements whose window is beyond allowed lateness
                # (its state was GC'd): recreating the window would re-fire
                # with fire_seq reset to 0, emitting duplicate
                # (win, fire_seq) keys downstream. Matches the reference's
                # WindowOperator isWindowLate gate; within lateness the
                # element is added and the trigger re-fires the window
                # (corrected update-mode emission).
                win_end = (
                    math.inf if window_seconds is None else float(wk) + window_seconds
                )
                if frontier is not None and win_end + allowed_lateness <= frontier:
                    continue
                w = wins.setdefault(wk, {"ts": [], "vals": [], "trig": {}, "seq": 0})
                w["ts"].append(t)
                w["vals"].append(v)
                d = trigger.on_element(
                    w["trig"], t, v, win_end=win_end, frontier=frontier
                )
                if d != CONTINUE:
                    fire(wk, w, d == FIRE_AND_PURGE)
                frontier = t if frontier is None else max(frontier, t)

        # event-time firings at the end of the batch (per-key frontier)
        if frontier is not None:
            for wk in list(wins):
                w = wins[wk]
                win_end = (
                    float("inf")
                    if window_seconds is None
                    else float(wk) + window_seconds
                )
                d = trigger.on_time(w["trig"], win_end, frontier)
                if d != CONTINUE:
                    fire(wk, w, d == FIRE_AND_PURGE)
                if win_end + allowed_lateness <= frontier:
                    del wins[wk]  # lateness expired: GC the window's state

        st["frontier"] = frontier
        state.update((json.dumps(st),))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[key, "win", "fire_seq", "n", "total", *aggs],
            )

    return keyed_process(df, [key], fn, out_schema, state_schema, output_mode="append")
