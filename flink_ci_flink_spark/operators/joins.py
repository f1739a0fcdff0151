"""Join operators Spark lacks natively: as-of (temporal), interval, lookup.

Reference parity:
- As-of/temporal join: `flink-table-runtime-blink/.../join/temporal/
  TemporalRowTimeJoinOperator.java:71` (watermark-driven emit of the latest
  right-side version at-or-before the left row's time; javadoc :50-69).
- Interval join: `flink-table-runtime-blink/.../join/TimeBoundedStreamJoin.java:46`,
  DataStream `KeyedStream.java:425` (intervalJoin).
- Lookup join: `flink-table-runtime-blink/.../join/lookup/LookupJoinRunner.java:36`.

Spark-first design (batch semantics; streaming variants live in
`flink_ci_flink_spark.streaming`):

- **As-of join = union + forward-fill window.** No UDF, no per-key pandas:
  tag both sides, union, one shuffle+sort per key, `last(..., ignorenulls)`
  forward-fills the most recent right-side values, then keep left rows.
  This scales: a 100 TB left side is one wide sort-merge per key group —
  the same cost profile as any keyed window — and never materializes the
  cross product. (The pandas `merge_asof` alternative would force a
  per-key groupBy-apply with Python serde on the full fact table.)
- **Interval join = equi-join on key + range predicate.** Catalyst plans
  the equi-part as a shuffled join and applies the range as a post-join
  filter, which is the right plan when keys are selective.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str] | None = None,
    *,
    how: str = "left",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` (or ``<`` if not allow_exact_matches),
    per join key. DuckDB's ``ASOF JOIN`` is the oracle equivalent.

    ``right_values``: right columns to carry (default: all non-key,
    non-time columns).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [c for c in right.columns if c not in keys and c != right_time]

    # Tag and align the two sides on a common schema:
    # (keys..., __t, __is_left, left payload (null on right rows),
    #  right_values (null on left rows))
    left_payload = [c for c in left.columns if c not in keys and c != left_time]
    # the right side rides as ONE struct so the forward-fill attaches a whole
    # right-row version atomically (a NULL in one value column must not mix
    # values from different versions), and its non-nullness doubles as the
    # match marker for inner semantics
    from pyspark.sql.types import StructField, StructType

    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_values]
    )
    lt = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    rt = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c) for c in right_values]).alias("__r"),
    )
    # At equal times the right row must sort before the left row iff exact
    # matches are allowed.
    order = [F.col("__t"), F.col("__is_left") if allow_exact_matches else F.col("__is_left").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lt.unionByName(rt).select(
        *keys,
        "__t",
        "__is_left",
        *left_payload,
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *keys,
        F.col("__t").alias(left_time),
        *left_payload,
        *[F.col(f"__r.{c}").alias(c) for c in right_values],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    lower,
    upper,
    *,
    how: str = "inner",
) -> DataFrame:
    """Time-bounded join: match right rows with
    ``left_time + lower <= right_time <= left_time + upper``.

    ``lower``/``upper`` are Column interval expressions or SQL interval
    strings (e.g. ``F.expr("INTERVAL 1 HOUR")``); negative bounds look back.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lo = F.expr(lower) if isinstance(lower, str) else lower
    hi = F.expr(upper) if isinstance(upper, str) else upper
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (right[right_time] >= left[left_time] + lo)
        & (right[right_time] <= left[left_time] + hi)
    )
    out = left.join(right, cond, how)
    # Equi-keys appear on both sides post-join; keep the left copy only.
    for k in keys:
        out = out.drop(right[k])
    return out


def lookup_join(
    stream: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    *,
    how: str = "left",
) -> DataFrame:
    """Lookup join against a (small) dimension snapshot: broadcast hash join.

    The reference does per-row (async) RPC lookups; the Spark-native answer
    for a bounded/snapshot dimension is a broadcast join — no network chatter,
    scales with the fact side only. For dims too large to broadcast, drop the
    hint and let AQE pick a shuffled join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), keys, how)


def async_lookup(
    df: DataFrame,
    lookup_fn,
    key_cols: Sequence[str],
    output_schema: str,
    batch_size: int = 256,
    max_workers: int = 8,
) -> DataFrame:
    """Async-I/O enrichment (`AsyncWaitOperator.java` / `AsyncFunction` —
    flink-streaming-java api/operators/async/): enrich rows against an
    external service without blocking per row.

    `lookup_fn(list_of_key_tuples) -> list[dict|None]` is called per
    micro-batch of keys; batches within an Arrow chunk run concurrently on
    a thread pool (max_workers in-flight batches, the reference's async
    capacity knob). Works on batch and streaming DataFrames alike
    (mapInPandas — Arrow-batched, ordered output like the reference's
    ordered-wait mode).

    The returned columns are the input columns plus whatever keys
    `lookup_fn` returns in its dicts; declare them in `output_schema`."""
    import pandas as pd

    def run(batches):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keys = list(pdf[list(key_cols)].itertuples(index=False, name=None))
                chunks = [
                    keys[i : i + batch_size] for i in range(0, len(keys), batch_size)
                ]
                results: list = []
                for out in pool.map(lookup_fn, chunks):
                    results.extend(out)
                extra = pd.DataFrame(
                    [r if r is not None else {} for r in results]
                )
                yield pd.concat(
                    [pdf.reset_index(drop=True), extra.reset_index(drop=True)], axis=1
                )

    return df.mapInPandas(run, output_schema)
