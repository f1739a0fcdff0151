"""Top-N / rank operators.

Reference parity: `flink-table-runtime-blink/.../operators/rank/
AppendOnlyTopNFunction.java:46` (+ Updatable/Retractable variants),
batch `operators/sort/RankOperator.java:35`, planner `StreamExecRank.scala` /
`BatchExecRank.scala`.

Spark-first: `row_number()/rank()/dense_rank()` over a key-partitioned
window + range filter. Catalyst's `WindowGroupLimit` pushes the limit into
the sort on modern Spark, so per-partition it is a bounded heap, not a full
sort — the same algorithm the reference's RankOperator uses. Always pass a
deterministic tie-break ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RANK_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_n(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    n: int,
    *,
    rank_type: str = "row_number",
    rank_col: str | None = "rn",
) -> DataFrame:
    """Keep the top ``n`` rows per key under ``order_by``.

    ``rank_col=None`` drops the rank column from the output (the reference's
    `RankNumberColumnRemoveRule` analog — just don't project it).
    """
    fn = _RANK_FNS[rank_type]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rank", fn().over(w)).filter(F.col("__rank") <= n)
    if rank_col:
        return ranked.withColumnRenamed("__rank", rank_col)
    return ranked.drop("__rank")
