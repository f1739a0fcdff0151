"""Deterministic output sharding for training-data export.

North-star extension (training-data pipeline): a curated corpus is written
as N shards that downstream dataloaders stream independently, so shard
assignment must be (a) deterministic across reruns, (b) balanced by token
budget, (c) computable without funneling data through one node.

Two policies:

- `hash_shards` — shard = md5-derived hash(id) % n. Map-only, zero
  shuffle; at 100 TB the law of large numbers balances token totals to
  within a fraction of a percent. The default export path.

- `balanced_shards` — exact greedy round-robin by descending weight
  (longest-processing-time order): global rank r over (weight DESC, id)
  -> shard = (r - 1) % n. Ranking is computed with the distributed
  two-phase idiom, NOT a single-partition window: repartitionByRange on
  the sort key gives globally ordered partitions, each partition ranks
  locally (window partitioned by spark_partition_id), and the per-
  partition row counts — at most `spark.sql.shuffle.partitions` rows —
  are collected and broadcast back as cumulative offsets. The global rank
  (offset + local rank) depends only on the total order, not on where
  range boundaries fall, so the assignment is deterministic under any
  partitioning. Use for small N / final rebalancing passes where exact
  balance matters more than the extra range shuffle.

Reference scope note: the reference (Flink 1.11) partitions sinks by key
or round-robin per subtask (`DataStream.partitionCustom`,
`rebalance` — flink-streaming-java); the token-budget-balanced policy is
the LLM-export extension of that surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Map-only deterministic shard assignment: md5(id) % n_shards."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return df.withColumn("shard", (h % n_shards).cast("bigint"))


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact round-robin by descending weight via distributed ranking.

    Equivalent to ROW_NUMBER() OVER (ORDER BY weight DESC, id) -> (rn-1)
    % n_shards, but never moves the corpus to one partition: range-
    repartition on the sort key, rank within partitions, offset by the
    (tiny, collected) cumulative partition counts.
    """
    from pyspark.sql import Window

    ordered = df.repartitionByRange(
        F.col(weight_col).desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id())
    win = Window.partitionBy("__pid").orderBy(
        F.col(weight_col).desc(), F.col(id_col).asc()
    )
    # materialize the ranked frame ONCE: the counts collect below and the
    # returned DataFrame both read the checkpointed partitions instead of
    # re-executing the range shuffle + sort twice
    local = ordered.withColumn(
        "__lrn", F.row_number().over(win)
    ).localCheckpoint(eager=True)
    # bounded collect: one row per shuffle partition (<= 32 in tests,
    # <= a few thousand on a real cluster) — never corpus rows
    counts = {
        r["__pid"]: r["cnt"]
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[
                x
                for pid in sorted(offsets)
                for x in (F.lit(pid), F.lit(offsets[pid]))
            ]
        ),
        F.col("__pid"),
    )
    return (
        local.withColumn("__grn", off_expr + F.col("__lrn"))
        .withColumn(
            "shard", ((F.col("__grn") - 1) % n_shards).cast("bigint")
        )
        .drop("__pid", "__lrn", "__grn")
    )


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    compression: str = "zstd",
    max_records_per_file: int | None = None,
) -> None:
    """Export with hash sharding: one parquet directory per shard
    (partitioned write -> downstream readers prune to their shard).

    Training-export knobs: ``compression`` defaults to zstd (the archival
    ratio/speed point for write-once corpora); ``max_records_per_file``
    caps rows per output file so dataloader work units stay uniform — at
    100 TB this, not partition count, is what controls shard-file
    granularity."""
    w = hash_shards(df, n_shards, id_col).write.partitionBy("shard").mode(
        "overwrite"
    ).option("compression", compression)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
