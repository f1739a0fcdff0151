"""Time-window operators over batch DataFrames (TUMBLE / HOP / SESSION).

Reference parity: group-window aggregates —
`flink-table-runtime-blink/.../operators/window/WindowOperator.java:98`,
assigners `operators/window/assigners/` (Tumbling/Sliding/Session), Table API
`Tumble.java:47` / `Slide.java` / `Session.java`, batch
`BatchExecHashWindowAggregate.scala`.

Spark-first: the built-in `F.window(ts, size[, slide])` and
`F.session_window(ts, gap)` produce the identical bucketing for batch AND
streaming; these helpers only flatten the window struct to explicit
``window_start`` / ``window_end`` columns (the reference's
``TUMBLE_START/END`` auxiliaries) so results are oracle-comparable.

Sessionization additionally gets a window-function formulation
(`sessionize`) — lag + gap-flag + running sum — because that version also
yields per-session ordinals, which the reference's session windows expose
via merging window state.

Scale: tumble/hop are stateless projections before a keyed agg — they
shuffle once on (key, window). Session windows shuffle on key then sort
within key; `session_window` in Spark uses the same merging strategy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _flatten(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs,
    )


def tumble(
    df: DataFrame, ts: str, size: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """TUMBLE(ts, size) group-window aggregate."""
    g = df.groupBy(F.window(ts, size).alias("window"), *keys).agg(*aggs)
    return _flatten(g, keys, [F.col(c) for c in g.columns if c not in ("window", *keys)])


def hop(
    df: DataFrame, ts: str, size: str, slide: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """HOP(ts, slide, size) (sliding) group-window aggregate."""
    g = df.groupBy(F.window(ts, size, slide).alias("window"), *keys).agg(*aggs)
    return _flatten(g, keys, [F.col(c) for c in g.columns if c not in ("window", *keys)])


def session(
    df: DataFrame, ts: str, gap: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """SESSION(ts, gap) group-window aggregate (built-in session_window)."""
    g = df.groupBy(F.session_window(ts, gap).alias("window"), *keys).agg(*aggs)
    return _flatten(g, keys, [F.col(c) for c in g.columns if c not in ("window", *keys)])


def sessionize(
    df: DataFrame,
    ts: str,
    gap_seconds: int,
    keys: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a per-key session id (0-based) via gap detection.

    Window-function formulation: new session when the gap from the previous
    event exceeds ``gap_seconds``; session id = running count of gap flags.
    Exactly expressible in ANSI SQL (the DuckDB oracle uses the same shape).

    ``tiebreak``: extra unique ordering columns — equal-``ts`` rows otherwise
    get engine-dependent lag/running-sum attribution.
    """
    from flink_ci_flink_spark.functions.scalar import epoch_seconds

    w = Window.partitionBy(*keys).orderBy(F.col(ts), *[F.col(c) for c in tiebreak])
    sec = epoch_seconds(df, ts)
    prev = F.lag(sec).over(w)
    is_new = (prev.isNull() | (sec - prev > F.lit(gap_seconds))).cast("long")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(wrun) - 1)


def session_dynamic(
    df: DataFrame, ts: str, gap: Column, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """SESSION with per-event dynamic gap (`DynamicGapSession` /
    `SessionWindowAssigner` with a SessionWindowTimeGapExtractor).

    Spark's session_window accepts a gap Column natively: each event opens
    [ts, ts+gap) and overlapping windows merge — identical merge semantics
    to the reference's dynamic-gap session assigner. ``gap`` is an interval
    Column or an expression yielding one (e.g.
    ``F.when(cond, "30 seconds").otherwise("5 seconds")``)."""
    g = df.groupBy(F.session_window(ts, gap).alias("window"), *keys).agg(*aggs)
    return _flatten(g, keys, [F.col(c) for c in g.columns if c not in ("window", *keys)])
