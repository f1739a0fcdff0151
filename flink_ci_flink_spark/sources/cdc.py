"""CDC changelog formats: debezium-json / canal-json decode + materialize.

Reference parity: the reference (Flink 1.11) introduced first-class CDC
ingestion (FLIP-105) — `flink-formats/flink-json/.../debezium/
DebeziumJsonDeserializationSchema.java` maps each Debezium envelope to
RowKind rows (`op=c|r` → INSERT, `op=u` → UPDATE_BEFORE + UPDATE_AFTER,
`op=d` → DELETE), `.../canal/CanalJsonDeserializationSchema.java` does the
same for Canal's `{data, old, type}` envelopes.

Spark-first: decode is `from_json` over struct schemas (JVM, codegen);
the changelog explodes to rows tagged with the reference's RowKind strings
(`+I`/`-U`/`+U`/`-D` — `RowKind.java:32,41,50,55`); materialization of the
latest state per key is one window (last version wins, deletes drop) —
exactly the plan a 100 TB snapshot rebuild wants: one shuffle by key, no
Python. Streaming: feed the same changelog through `foreachBatch` with the
keyed upsert sink (`streaming/core.py`) — micro-batch upserts are the
Spark analog of the reference's changelog consumption.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_debezium(df: DataFrame, value_col: str, row_schema: str) -> DataFrame:
    """Decode Debezium envelopes: adds ``op``, ``ts_ms``, ``before``,
    ``after`` (structs of ``row_schema``); other input columns pass through."""
    env = f"struct<before:struct<{row_schema}>, after:struct<{row_schema}>, op:string, ts_ms:bigint>"
    parsed = df.withColumn("__env", F.from_json(F.col(value_col), env))
    return parsed.select(
        *[c for c in df.columns if c != value_col],
        F.col("__env.op").alias("op"),
        F.col("__env.ts_ms").alias("ts_ms"),
        F.col("__env.before").alias("before"),
        F.col("__env.after").alias("after"),
    )


def parse_canal(df: DataFrame, value_col: str, row_schema: str) -> DataFrame:
    """Decode Canal envelopes (`{data: [...], old: [...], type: ...}`) into
    the same (op, ts_ms, before, after) shape as `parse_debezium`, so one
    changelog pipeline serves both formats. Canal batches rows per message —
    data[i] pairs with old[i]."""
    env = (
        f"struct<data:array<struct<{row_schema}>>, old:array<struct<{row_schema}>>, "
        "type:string, ts:bigint>"
    )
    parsed = df.withColumn("__env", F.from_json(F.col(value_col), env))
    op = (
        F.when(F.col("__env.type") == "INSERT", F.lit("c"))
        .when(F.col("__env.type") == "UPDATE", F.lit("u"))
        .when(F.col("__env.type") == "DELETE", F.lit("d"))
    )
    exploded = parsed.select(
        *[c for c in df.columns if c != value_col],
        op.alias("op"),
        F.col("__env.ts").alias("ts_ms"),
        F.posexplode(F.col("__env.data")).alias("__i", "__row"),
        F.col("__env.old").alias("__old"),
        F.col("__env.type").alias("__type"),
    )
    # Canal: DELETE carries the deleted row in `data`; UPDATE's old values
    # ride in `old[i]`.
    before = (
        F.when(F.col("__type") == "UPDATE", F.col("__old")[F.col("__i")])
        .when(F.col("__type") == "DELETE", F.col("__row"))
    )
    after = F.when(F.col("__type") != "DELETE", F.col("__row"))
    return exploded.select(
        *[c for c in df.columns if c != value_col],
        "op",
        "ts_ms",
        before.alias("before"),
        after.alias("after"),
    )


def to_changelog(parsed: DataFrame) -> DataFrame:
    """Envelope rows → RowKind changelog (the reference's mapping):
    c/r → +I(after); u → -U(before) AND +U(after); d → -D(before).

    Single-pass: each envelope row explodes into its changelog entries.
    The union-of-filtered-branches form this replaces executed the parsed
    upstream once PER BRANCH (4 scans of the source at any scale)."""

    def entry(kind: str, row):
        return F.struct(
            F.lit(kind).alias("row_kind"),
            F.col("ts_ms").alias("ts_ms"),
            row.alias("row"),
        )

    entries = (
        F.when(
            F.col("op").isin("c", "r"), F.array(entry("+I", F.col("after")))
        )
        .when(
            F.col("op") == "u",
            F.array(
                entry("-U", F.col("before")), entry("+U", F.col("after"))
            ),
        )
        .when(F.col("op") == "d", F.array(entry("-D", F.col("before"))))
    )
    return parsed.select(F.explode(entries).alias("__e")).select(
        "__e.row_kind", "__e.ts_ms", "__e.row"
    )


def materialize(
    changelog: DataFrame, keys: Sequence[str], order_col: str = "ts_ms"
) -> DataFrame:
    """Latest surviving state per key from a RowKind changelog: the
    highest-`order_col` +I/+U/-D row wins; a winning -D means the key is
    gone. One window shuffle by key — the snapshot-rebuild plan."""
    from pyspark.sql.window import Window

    eff = changelog.filter(F.col("row_kind").isin("+I", "+U", "-D"))
    w = Window.partitionBy(*[F.col(f"row.{k}") for k in keys]).orderBy(
        F.col(order_col).desc()
    )
    latest = eff.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return latest.filter(F.col("row_kind") != "-D").select("row.*")
