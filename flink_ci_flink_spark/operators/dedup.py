"""Deduplication operators (keep-first / keep-last per key).

Reference parity: `flink-table-runtime-blink/.../operators/deduplicate/
DeduplicateKeepFirstRowFunction.java` / `DeduplicateKeepLastRowFunction.java:36`
(the planner rewrites ``ROW_NUMBER() OVER (PARTITION BY k ORDER BY t) = 1``
into these — `StreamExecDeduplicateRule`).

Spark-first: the same rewrite, expressed directly — `row_number() == 1`
over (key, order). For exact duplicate removal with no ordering semantics
use `df.dropDuplicates(keys)` (hash-based, one shuffle). Streaming keep-first
maps to `dropDuplicatesWithinWatermark` (see streaming module).

Scale: one shuffle on the key; `WindowGroupLimit` keeps it a per-key
top-1 heap rather than a full per-key sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def deduplicate(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    *,
    keep: str = "first",
) -> DataFrame:
    """Keep exactly one row per ``keys``: the first/last under ``order_by``.

    ``order_by`` must be a total order within a key (add a unique tiebreak
    column) for deterministic results.
    """
    if keep not in ("first", "last"):
        raise ValueError("keep must be 'first' or 'last'")
    ordering = list(order_by) if keep == "first" else [c.desc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
