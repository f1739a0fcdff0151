"""UDF / UDAF / UDTF surface queries (SURVEY.md §2.12).

Spark's pandas-UDF family is the engine's user-function surface:
- scalar pandas UDF  ↔ ScalarFunction (`ScalarFunction.java:94`)
- grouped-agg pandas UDF ↔ AggregateFunction (`AggregateFunction.java:117`)
- applyInPandas (grouped map) ↔ TableAggregateFunction (`:115`)
- cogroup applyInPandas ↔ DataSet.coGroup (`DataSet.java:1009`, `CoGroupDriver.java`)
- mapInPandas ↔ DataSet.mapPartition (`DataSet.java:237`)

All results are deterministic and partition-invariant, so plain SQL oracles
verify the Python execution path end-to-end (Arrow round-trip included).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ci_flink_spark.catalog import load_tables
from flink_ci_flink_spark.queries.registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000 + 0.5) / 1000 AS charge
    FROM lineitem WHERE l_orderkey % 31 = 0
    """,
    group="udf",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow-batched — the fast UDF path)."""
    t = load_tables(spark, sf_dir)

    @F.pandas_udf("double")
    def charge(p: pd.Series, d: pd.Series, x: pd.Series) -> pd.Series:
        import numpy as np

        # floor(x*1e3+0.5)/1e3: portable rounding (pandas .round is
        # half-even; SQL ROUND is half-away — this matches both engines)
        return np.floor(p * (1 - d) * (1 + x) * 1000 + 0.5) / 1000

    return (
        t.lineitem.filter(F.col("l_orderkey") % 31 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
        )
    )


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    group="udf",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (custom UDAF: quantity-weighted mean)."""
    t = load_tables(spark, sf_dir)

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@query(
    "udf_cogroup",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS n_items, FLOOR(SUM(l_quantity) * 100 + 0.5) / 100 AS qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey, FLOOR(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
           COALESCE(n_items, 0) AS n_items,
           COALESCE(qty, 0.0) AS qty
    FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
    WHERE o_orderkey % 37 = 0
    """,
    group="udf",
)
def udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coGroup: per-key (orders-group, lineitem-group) pandas callback.
    Ref: `DataSet.coGroup` (DataSet.java:1009), `CoGroupDriver.java`."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    li = t.lineitem.filter(F.col("l_orderkey") % 37 == 0).select(
        "l_orderkey", "l_quantity"
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import math

        def r2(x: float) -> float:
            # portable rounding (python round() is half-even)
            return math.floor(x * 100 + 0.5) / 100

        if left.empty:
            return pd.DataFrame()
        return pd.DataFrame(
            {
                "o_orderkey": [int(key[0])],
                "o_totalprice": [r2(float(left["o_totalprice"].iloc[0]))],
                "n_items": [int(len(right))],
                "qty": [r2(float(right["l_quantity"].sum())) if len(right) else 0.0],
            }
        )

    return orders.groupBy("o_orderkey").cogroup(
        li.groupBy("l_orderkey")
    ).applyInPandas(
        merge, "o_orderkey long, o_totalprice double, n_items long, qty double"
    )


@query(
    "udf_map_partitions",
    oracle="""
    SELECT p_partkey, UPPER(p_name) AS name_u,
           CASE WHEN p_size >= 25 THEN 'L' ELSE 'S' END AS size_class
    FROM part WHERE p_partkey % 9 = 0
    """,
    group="udf",
)
def udf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapPartition analog: per-partition Arrow batch iterator (mapInPandas).
    Ref: `DataSet.mapPartition` (DataSet.java:237)."""
    t = load_tables(spark, sf_dir)
    p = t.part.filter(F.col("p_partkey") % 9 == 0).select("p_partkey", "p_name", "p_size")

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "p_partkey": pdf["p_partkey"],
                    "name_u": pdf["p_name"].str.upper(),
                    "size_class": pdf["p_size"].map(lambda s: "L" if s >= 25 else "S"),
                }
            )

    return p.mapInPandas(op, "p_partkey long, name_u string, size_class string")


@query(
    "udf_python_udtf",
    oracle=r"""
    SELECT doc_id,
           CAST(UNNEST(generate_series(1, LEN(t))) AS INT) AS pos,
           UNNEST(t) AS word
    FROM (SELECT doc_id,
                 list_filter(str_split_regex(text, '\s+'), x -> x != '') AS t
          FROM documents WHERE doc_id % 97 = 0)
    """,
    group="udf",
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True user-defined TABLE function: a Python UDTF class (Spark 4
    `@udtf`) applied via SQL LATERAL — one input row fans out to N output
    rows with their own schema, the exact TableFunction.eval/collect
    contract (`TableFunction.java:40,139`; registration parity with
    `StreamTableEnvironment.registerFunction`). Unlike the posexplode
    mapping in `unnest_with_ordinality`, the row expansion here runs in
    the Python worker (Arrow-batched), proving the full UDTF execution
    path; the oracle zips two UNNESTs for the ordinal."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            import re

            for i, w in enumerate(x for x in re.split(r"\s+", text or "") if x):
                yield (i + 1, w)

    spark.udtf.register("split_words_udtf", SplitWords)
    t = load_tables(spark, sf_dir)
    t.documents.filter(F.col("doc_id") % 97 == 0).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.word "
        "FROM __udtf_docs d, LATERAL split_words_udtf(d.text) s"
    )
