"""Count windows, streaming over-window, broadcast-state enrich, skew utils."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tests.test_streaming import events_stream_dir, _events_stream  # noqa: F401


def test_count_tumbling_window(spark, events_stream_dir):  # noqa: F811
    """Count-window totals == chunking each key's event-time-ordered series."""
    from flink_ci_flink_spark.streaming import run_to_completion
    from flink_ci_flink_spark.streaming.windows_ext import count_tumbling_window

    stream = _events_stream(spark, events_stream_dir, per_trigger=3)
    out = count_tumbling_window(
        stream.select("user_id", "ts", "value"), "user_id", "ts", "value", size=10
    )
    name = f"cw_{uuid.uuid4().hex[:8]}"
    run_to_completion(out, name, "append")
    got = {
        (r.user_id, r.win): (r.n, round(r.total, 6))
        for r in spark.table(name).collect()
    }
    path, schema = events_stream_dir
    ev = spark.read.schema(schema).parquet(path).orderBy("ts").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r.value)
    want = {}
    for u, vals in per_user.items():
        for w in range(len(vals) // 10):
            chunk = vals[w * 10 : (w + 1) * 10]
            want[(u, w)] = (10, round(sum(chunk), 6))
    assert got == want


def test_streaming_running_agg(spark, events_stream_dir):  # noqa: F811
    """Streaming over-window running sums == batch window function result."""
    from pyspark.sql.window import Window

    from flink_ci_flink_spark.streaming import run_to_completion
    from flink_ci_flink_spark.streaming.windows_ext import streaming_running_agg

    stream = _events_stream(spark, events_stream_dir, per_trigger=3)
    out = streaming_running_agg(
        stream.select("user_id", "ts", "value"), "user_id", "ts", "value"
    )
    name = f"ra_{uuid.uuid4().hex[:8]}"
    run_to_completion(out, name, "append")
    got = {
        (r.user_id, round(r.ts_s, 6)): (round(r.running_sum, 6), r.running_n)
        for r in spark.table(name).collect()
    }
    path, schema = events_stream_dir
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    batch = (
        spark.read.schema(schema).parquet(path)
        .select(
            "user_id",
            F.col("ts").cast("double").alias("ts_s"),
            F.sum("value").over(w).alias("rs"),
            F.count(F.lit(1)).over(w).alias("rn"),
        )
        .collect()
    )
    want = {(r.user_id, round(r.ts_s, 6)): (round(r.rs, 6), r.rn) for r in batch}
    assert got == want


def test_broadcast_state_enrich(spark, events_stream_dir):  # noqa: F811
    """Broadcast-state connect analog: stream enriched by a small control
    table via stream-static broadcast join (KeyedBroadcastProcessFunction)."""
    from flink_ci_flink_spark.streaming import run_to_completion

    control = spark.createDataFrame(
        [("click", 2.0), ("purchase", 10.0)], "event_type string, weight double"
    )
    stream = _events_stream(spark, events_stream_dir, per_trigger=3)
    enriched = stream.join(F.broadcast(control), "event_type", "inner").select(
        "event_id", (F.col("value") * F.col("weight")).alias("weighted")
    )
    name = f"bc_{uuid.uuid4().hex[:8]}"
    run_to_completion(enriched, name, "append")
    n = spark.table(name).count()
    path, schema = events_stream_dir
    want = (
        spark.read.schema(schema).parquet(path)
        .filter(F.col("event_type").isin("click", "purchase"))
        .count()
    )
    assert n == want


def test_salted_agg_matches_plain(spark, sf_dir):
    from flink_ci_flink_spark.catalog import load_tables
    from flink_ci_flink_spark.operators.skew import salted_agg

    li = load_tables(spark, sf_dir).lineitem
    got = {
        r.l_returnflag: (round(r.qty, 6), r.n, round(r.mx, 6))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "qty": ("sum", "l_quantity"),
                "n": ("count", "l_orderkey"),
                "mx": ("max", "l_extendedprice"),
            },
            salt_source="l_orderkey",
        ).collect()
    }
    want = {
        r.l_returnflag: (round(r.qty, 6), r.n, round(r.mx, 6))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.count("l_orderkey").alias("n"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_broadcast_join_matches_plain(spark, sf_dir):
    from flink_ci_flink_spark.catalog import load_tables
    from flink_ci_flink_spark.operators.skew import salted_broadcast_left

    t = load_tables(spark, sf_dir)
    big = t.lineitem.select(F.col("l_partkey").alias("k"), "l_quantity")
    small = t.part.select(F.col("p_partkey").alias("k"), "p_brand")
    got = salted_broadcast_left(big, small, "k").count()
    want = big.join(small, "k").count()
    assert got == want


def test_asof_join_null_column_whole_row(spark):
    """A right row with NULL in one value column must attach as-is (whole-row
    version semantics, ref TemporalRowTimeJoinOperator.java:50-69) — not mix
    values forward-filled from an older version; inner keeps rows whose
    matched version has NULLs."""
    from flink_ci_flink_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b")], "k long, t double, payload string"
    )
    right = spark.createDataFrame(
        [(1, 5.0, "v1", 100), (1, 15.0, None, 200)],
        "k long, rt double, val string, num int",
    )
    out = asof_join(left, right, "k", "t", "rt").orderBy("t").collect()
    assert [(r.val, r.num) for r in out] == [("v1", 100), (None, 200)]
    inner = asof_join(left, right, "k", "t", "rt", how="inner").orderBy("t").collect()
    # both left rows matched a version; the NULL val row must survive inner
    assert len(inner) == 2 and inner[1].val is None and inner[1].num == 200
