"""Changelog (retract-stream) emission for streaming group aggregates.

Reference: the changelog data model — every row carries a `RowKind`:
INSERT (`flink-core/.../types/RowKind.java:32`), UPDATE_BEFORE (`:41`),
UPDATE_AFTER (`:50`), DELETE (`:55`) — and `toRetractStream`
(`StreamTableEnvironment`), which turns an updating table into a stream of
(+I/-U/+U) records. Structured Streaming's update mode only emits the new
row; this operator adds the reference's retraction records explicitly:

- first result for a key        -> (+I, new)
- every subsequent change       -> (-U, old), (+U, new)

Granularity is the micro-batch (one -U/+U pair per key per batch that
touches it), not per input record — the same final semantics, batched; the
reference itself batches retractions under MiniBatch mode
(`MiniBatchGroupAggFunction.java`).

Each emission round carries a per-key `seq` number; -U and +U of the same
round share the seq, so a changelog can be folded back into a table
deterministically (`changelog_to_table`). DELETE never occurs for a pure
additive aggregate over an append stream (keys don't vanish); consumers
that need -D apply TTL/window close upstream.

Scale: one shuffle on the key into the state store; per-key state is just
the current aggregate tuple + seq (constant size); batch partials are
computed vectorized before the single state merge.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from flink_ci_flink_spark.streaming.process import keyed_process

#: supported aggregate fns: batch-partial, merge(old, partial), identity
_AGG_FNS = {
    "sum": (lambda s: float(s.sum()), lambda a, b: a + b),
    "count": (lambda s: float(len(s)), lambda a, b: a + b),
    "min": (lambda s: float(s.min()), min),
    "max": (lambda s: float(s.max()), max),
}

INSERT = "+I"
UPDATE_BEFORE = "-U"
UPDATE_AFTER = "+U"
DELETE = "-D"


def changelog_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Streaming group aggregate emitting a retract stream.

    ``aggs``: out_col -> (fn, src_col) with fn in sum|count|min|max
    (count ignores src_col). Output: (row_kind, seq, keys..., agg cols...)
    in update mode; agg values are doubles (state-serializable and exact
    for integer-valued sums well past any test scale).
    """
    for out, (fn, _src) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported agg fn {fn!r} for {out!r}")
    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema_out = ", ".join(
        ["row_kind string", "seq long"]
        + [f"{k} {key_types[k]}" for k in keys]
        + [f"{c} double" for c in aggs]
    )
    state_schema = "vals array<double>, seq long"
    out_cols = list(aggs)

    def fn(key_tuple, pdf_iter, state: GroupState):
        old = None
        seq = 0
        if state.exists:
            vals, seq = state.get
            old = list(vals)
        partial = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            batch = [
                _AGG_FNS[f][0](pdf[src] if f != "count" else pdf.index.to_series())
                for _out, (f, src) in aggs.items()
            ]
            if partial is None:
                partial = batch
            else:
                partial = [
                    _AGG_FNS[f][1](p, b)
                    for (p, b), (f, _s) in zip(
                        zip(partial, batch), (v for v in aggs.values())
                    )
                ]
        if partial is None:
            return
        new = (
            partial
            if old is None
            else [
                _AGG_FNS[f][1](o, p)
                for (o, p), (f, _s) in zip(zip(old, partial), aggs.values())
            ]
        )
        seq += 1
        state.update((new, seq))
        base = {k: key_tuple[i] for i, k in enumerate(keys)}
        rows = []
        if old is None:
            rows.append({"row_kind": INSERT, "seq": seq, **base,
                         **dict(zip(out_cols, new))})
        else:
            rows.append({"row_kind": UPDATE_BEFORE, "seq": seq, **base,
                         **dict(zip(out_cols, old))})
            rows.append({"row_kind": UPDATE_AFTER, "seq": seq, **base,
                         **dict(zip(out_cols, new))})
        yield pd.DataFrame(rows)

    return keyed_process(df, keys, fn, schema_out, state_schema, "update")


def changelog_to_table(changelog: DataFrame, keys: list[str]) -> DataFrame:
    """Fold an accumulated changelog back into the current table: per key,
    the +I/+U row of the highest seq (retractions and superseded updates
    drop out) — the materialization a downstream upsert sink performs."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.desc("seq"))
    return (
        changelog.filter(F.col("row_kind").isin(INSERT, UPDATE_AFTER))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "row_kind", "seq")
    )
