"""Fluent DataStream-style facade over the streaming kit.

Reference parity: the DataStream program shape —
``env.addSource(...).keyBy(...).window(...).trigger(...).evictor(...)
.sum(...)`` (`DataStream.java`, `KeyedStream.java:keyBy`,
`WindowedStream.java:137/190`, `countWindow` at `KeyedStream.java:779`) —
so a reference user's program structure transliterates one combinator at a
time. Every method DELEGATES to the independently-tested operators
(`keyed_process`, `triggered_window`, `count_*_window`,
`streaming_running_agg`, `with_watermark`, `side_output`); the facade adds
no execution logic of its own.

Works identically over batch and streaming DataFrames wherever the
underlying operator does (the stateful ones require a streaming source,
exactly like the reference requires an execution environment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_ci_flink_spark.streaming.core import side_output, with_watermark
from flink_ci_flink_spark.streaming.process import keyed_process
from flink_ci_flink_spark.streaming.triggers import (
    CountEvictor,
    CountTrigger,
    PurgingTrigger,
    triggered_window,
)
from flink_ci_flink_spark.streaming.windows_ext import (
    count_sliding_window,
    count_tumbling_window,
    streaming_bounded_over,
    streaming_running_agg,
)


class DataStream:
    """Wrap a (streaming or batch) DataFrame with DataStream combinators."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- stateless transforms (DataStream.map/filter/flatMap) ---------------

    def map(self, *cols: Column | str) -> "DataStream":
        return DataStream(self.df.select(*cols))

    def filter(self, cond) -> "DataStream":
        return DataStream(self.df.filter(cond))

    def flat_map(self, explode_col, alias: str) -> "DataStream":
        c = F.col(explode_col) if isinstance(explode_col, str) else explode_col
        return DataStream(self.df.withColumn(alias, F.explode(c)))

    def side_output(self, condition) -> tuple["DataStream", "DataStream"]:
        main, side = side_output(self.df, condition)
        return DataStream(main), DataStream(side)

    def assign_timestamps_and_watermarks(
        self, ts_col: str, delay: str
    ) -> "DataStream":
        """BoundedOutOfOrderness watermark assigner."""
        return DataStream(with_watermark(self.df, ts_col, delay))

    def key_by(self, *keys: str) -> "KeyedStream":
        return KeyedStream(self.df, list(keys))


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[str]):
        self.df = df
        self.keys = keys

    def process(
        self,
        fn,
        output_schema: str,
        state_schema: str,
        output_mode: str = "update",
        timeout: str = "NoTimeout",
    ) -> DataFrame:
        """KeyedProcessFunction analog (state + timers via the kit)."""
        return keyed_process(
            self.df, self.keys, fn, output_schema, state_schema, output_mode, timeout
        )

    def window(
        self, ts_col: str, value_col: str, size_seconds: float
    ) -> "WindowedStream":
        """Tumbling event-time windows (TumblingEventTimeWindows.of)."""
        return WindowedStream(self, ts_col, value_col, size_seconds)

    def global_window(self, ts_col: str, value_col: str) -> "WindowedStream":
        """GlobalWindows: one window per key; fire via a custom trigger."""
        return WindowedStream(self, ts_col, value_col, None)

    def count_window(
        self, ts_col: str, value_col: str, size: int, slide: int | None = None
    ) -> DataFrame:
        """countWindow(size[, slide]) (`KeyedStream.java:779`) — delegates
        to the dedicated count-window operators, which are themselves
        asserted equal to the GlobalWindows + CountTrigger[+CountEvictor]
        compositions in tests/test_triggers.py."""
        (key,) = self.keys
        if slide is None:
            return count_tumbling_window(self.df, key, ts_col, value_col, size)
        return count_sliding_window(self.df, key, ts_col, value_col, size, slide)

    def running_sum(self, ts_col: str, value_col: str) -> DataFrame:
        """Per-record running aggregate (streaming over-window)."""
        (key,) = self.keys
        return streaming_running_agg(self.df, key, ts_col, value_col)

    def bounded_over(
        self,
        ts_col: str,
        value_col: str,
        rows_preceding: int | None = None,
        range_preceding: float | None = None,
    ) -> DataFrame:
        (key,) = self.keys
        return streaming_bounded_over(
            self.df, key, ts_col, value_col, rows_preceding, range_preceding
        )


class WindowedStream:
    """`WindowedStream.trigger/evictor` chaining; `sum()` executes."""

    def __init__(self, ks: KeyedStream, ts_col, value_col, window_seconds):
        self.ks = ks
        self.ts_col = ts_col
        self.value_col = value_col
        self.window_seconds = window_seconds
        self._trigger = None
        self._evictor = None
        self._allowed_lateness = 0.0

    def trigger(self, t) -> "WindowedStream":
        self._trigger = t
        return self

    def evictor(self, e) -> "WindowedStream":
        self._evictor = e
        return self

    def allowed_lateness(self, seconds: float) -> "WindowedStream":
        """`WindowedStream.allowedLateness` analog: late-but-allowed
        elements re-fire their window with the corrected aggregate
        (update-mode re-emission, next fire_seq)."""
        self._allowed_lateness = float(seconds)
        return self

    def sum(self) -> DataFrame:
        """Execute with (count, sum) output per firing. Default trigger for
        a count-style composition matches the reference's countWindow:
        PurgingTrigger(CountTrigger) on the global window."""
        return self.aggregate(None)

    def aggregate(self, aggs: dict[str, str] | None) -> DataFrame:
        """WindowedStream.reduce/aggregate analog: extra named aggregate
        columns from triggers.WINDOW_AGGS (e.g. {"low": "min"})."""
        from flink_ci_flink_spark.streaming.triggers import EventTimeTrigger

        trig = self._trigger
        if trig is None:
            if self.window_seconds is None:
                raise ValueError("global windows need an explicit trigger")
            trig = EventTimeTrigger()
        (key,) = self.ks.keys
        return triggered_window(
            self.ks.df,
            key,
            self.ts_col,
            self.value_col,
            trigger=trig,
            evictor=self._evictor,
            window_seconds=self.window_seconds,
            aggs=aggs,
            allowed_lateness=self._allowed_lateness,
        )


def count_window_composition(size: int, slide: int | None = None):
    """The reference's countWindow trigger/evictor composition
    (`KeyedStream.java:779/805`): returns (trigger, evictor)."""
    if slide is None:
        return PurgingTrigger(CountTrigger(size)), None
    return CountTrigger(slide), CountEvictor(size)
