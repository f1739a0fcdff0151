"""Focused tests for the SQL/JSON scalar function family
(functions/scalar.py) — mode switches and escaping the fn_json
oracle-parity query exercises only partially."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ci_flink_spark.functions.scalar import (
    is_json,
    json_array,
    json_arrayagg,
    json_exists,
    json_object,
    json_objectagg,
    json_string,
    json_value,
)


def _one(spark, *cols):
    return spark.range(1).select(*cols).collect()[0]


def test_json_object_null_modes(spark):
    null_s = F.lit(None).cast("string")
    r = _one(
        spark,
        json_object("a", F.lit(1), "b", null_s).alias("keep"),
        json_object("a", F.lit(1), "b", null_s, on_null="absent").alias("drop"),
    )
    assert r.keep == '{"a":1,"b":null}'  # NULL ON NULL (Flink default)
    assert r.drop == '{"a":1}'  # ABSENT ON NULL


def test_json_array_null_modes(spark):
    null_l = F.lit(None).cast("long")
    r = _one(
        spark,
        json_array(F.lit(1), null_l, F.lit(3)).alias("absent"),
        json_array(F.lit(1), null_l, F.lit(3), on_null="null").alias("kept"),
    )
    assert r.absent == "[1,3]"  # ABSENT ON NULL (Flink default)
    assert r.kept == "[1,null,3]"


def test_json_string_escaping(spark):
    r = _one(
        spark,
        json_string(F.lit(5)).alias("num"),
        json_string(F.lit('he said "hi"\\n')).alias("quoted"),
        json_string(F.lit(2.5)).alias("dbl"),
    )
    assert r.num == "5"
    assert r.quoted.startswith('"') and '\\"' in r.quoted
    assert r.dbl == "2.5"


def test_json_value_query_exists(spark):
    doc = F.lit('{"a": {"b": [1, 2]}, "s": "x", "z": null}')
    r = _one(
        spark,
        json_value(doc, "$.s").alias("scalar"),
        json_value(doc, "$.a.b").alias("subtree"),
        json_exists(doc, "$.a").alias("hit"),
        json_exists(doc, "$.missing").alias("miss"),
        is_json(doc).alias("valid"),
        is_json(F.lit("not json")).alias("invalid"),
    )
    assert r.scalar == "x"  # unquoted scalar (JSON_VALUE)
    assert r.subtree == "[1,2]"  # compact subtree text (JSON_QUERY flavor)
    assert r.hit is True and r.miss is False
    assert r.valid is True and r.invalid is False


def test_json_aggs_deterministic_order(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("c", 3)], "k string, v long"
    ).repartition(3)
    r = df.agg(
        json_objectagg("k", "v").alias("oa"), json_arrayagg("v").alias("aa")
    ).collect()[0]
    assert r.oa == '{"a":1,"b":2,"c":3}'  # sorted keys, any partitioning
    assert r.aa == "[1,2,3]"
