"""transformWithState-based keyed processing: native split state primitives.

Reference: the keyed-state model — named `ValueState`/`ListState`/`MapState`
descriptors per operator (`flink-core/.../api/common/state/ValueState.java`,
`ListState.java`, `MapState.java`) plus per-key timers
(`TimerService.java`). Spark 4's `transformWithStateInPandas` exposes
exactly this model natively (StatefulProcessor + named state handles +
timers), unlike `applyInPandasWithState`'s single per-key tuple that the
`KeyedStates` facade splits in Python. Both surfaces are supported here;
this module is the native-primitive path.

Requires the RocksDB state store provider (bundled with Spark 4):
`spark.sql.streaming.stateStore.providerClass =
 org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
— `use_rocksdb_state()` below sets it on the session — and the
`google.protobuf` Python package (Spark's transformWithState state-server
protocol is protobuf-framed). The test image ships without protobuf, so
the pytest is environment-gated (importorskip), the same honest gating as
the Avro JVM path; `require_tws()` raises a clear error otherwise.

Scale: state is per-key in the state store, same distribution story as the
reference's keyed state backend; handles read/write only the touched keys.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def require_tws() -> None:
    """Raise with a clear message when the transformWithState prerequisites
    are missing (protobuf is not bundled in every image)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(Spark's state-server protocol); install protobuf or use the "
            "applyInPandasWithState surface (streaming/process.py)"
        ) from e


def use_rocksdb_state(spark: SparkSession) -> str | None:
    """Set the RocksDB state store provider (required by transformWithState);
    returns the previous provider setting so callers can restore it."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    return prev


def streaming_running_agg_tws(
    df: DataFrame,
    key: str,
    value_col: str,
) -> DataFrame:
    """Running per-key sum/count via a native ValueState — the
    RichFlatMapFunction-with-ValueState classic (the reference's canonical
    keyed-state example). Emits (key, running_sum, running_n) after each
    batch that touches the key; the last emission per key is the final
    aggregate. Update mode."""
    require_tws()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "running_sum double, running_n long"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            total, n = self._agg.get() if self._agg.exists() else (0.0, 0)
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                total += float(pdf[value_col].sum())
                n += int(len(pdf))
            self._agg.update((total, n))
            yield pd.DataFrame(
                {key: [key_tuple[0]], "running_sum": [total], "running_n": [n]}
            )

        def close(self) -> None:
            pass

    key_type = df.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_type}, running_sum double, running_n long"
    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningAgg(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
