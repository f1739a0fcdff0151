"""Bloom-filter semi-join screen: map-only big-side pruning before a join.

At 100 TB the expensive part of `big ⋉ small` is shuffling the big side;
when the small side is selective, most big rows are shuffled only to be
dropped. A Bloom filter of the small side's keys screens the big side
BEFORE the shuffle with zero false negatives — the classic runtime-filter
optimization (Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`
does this inside AQE; this operator is the explicit, engine-portable form,
usable where the optimizer doesn't inject one — e.g. ahead of a custom
pandas-side operator or a non-equi post-condition).

Reference parity: the reference plans semi/anti joins via its join operators
(`flink-table-runtime-blink/.../join/HashJoinOperator.java`); it has no
runtime-filter pass — this is a Spark-first scale addition.

Design (all JVM-side, no UDF):
- Bitmap build: each key sets k md5-derived bit positions; positions
  aggregate into ≤ m/64 (word_idx, bits BIGINT) rows via bit_or — map-side
  combinable, one tiny shuffle.
- Screen: k successive BROADCAST joins of the big side against the word
  table (each probes one computed word index) + a conjunctive bit test —
  MAP-ONLY on the big side: no shuffle touches unpruned big rows.
- Zero false negatives by construction, so `bloom_semi_join` composes the
  screen with the exact join — results are EXACTLY the semi join (the
  oracle is plain `WHERE EXISTS`), the screen only cuts the shuffled volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_ci_flink_spark.pipeline.text import token_hash


def _position(col: Column, salt: int, m_bits: int) -> Column:
    """i-th Bloom bit position of a key — md5-derived (engine-portable)."""
    return token_hash(F.concat_ws("#", F.lit(str(salt)), col.cast("string"))) % m_bits


def bloom_build(
    small: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """Bitmap of the small side's keys: (word_idx, bits) rows, ≤ m_bits/64
    of them. bit_or is associative/commutative — partial aggregation makes
    the build one tiny shuffle."""
    pos = small.select(
        F.explode(
            F.array(*[_position(F.col(key), i, m_bits) for i in range(k)])
        ).alias("pos")
    )
    return (
        pos.withColumn("word_idx", F.expr("CAST(pos / 64 AS BIGINT)"))
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_screen(
    big: DataFrame, key: str, bitmap: DataFrame, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """Keep big rows whose key MIGHT be in the bitmap (all k bits set).
    k broadcast hash joins + bit tests — map-only on the big side."""
    out = big
    for i in range(k):
        w = bitmap.select(
            F.col("word_idx").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        pos = _position(F.col(key), i, m_bits)
        out = (
            out.withColumn(f"__p{i}", pos)
            .join(
                F.broadcast(w),
                F.expr(f"CAST(__p{i} / 64 AS BIGINT)") == F.col(f"__w{i}"),
                "left",
            )
            .filter(
                F.col(f"__b{i}").isNotNull()
                & (
                    F.expr(
                        f"__b{i} & shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT))"
                    )
                    != 0
                )
            )
            .drop(f"__p{i}", f"__w{i}", f"__b{i}")
        )
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    small_key: str | None = None,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """`big ⋉ small` with a Bloom pre-screen: screen (map-only, no false
    negatives) then the exact left-semi join (removes false positives).
    Result is EXACTLY the semi join; only the shuffled volume shrinks."""
    sk = small_key or on
    keys = small.select(F.col(sk).alias(on))
    # materialize the bitmap once: bloom_screen broadcasts it k times, and
    # each lazy broadcast re-executed the build's small-side scan (k+1
    # executed scans of the small table); the bitmap is ≤ m_bits/64 rows
    bitmap = bloom_build(keys, on, m_bits, k).localCheckpoint(eager=True)
    screened = bloom_screen(big, on, bitmap, m_bits, k)
    return screened.join(keys.distinct(), on, "left_semi")
