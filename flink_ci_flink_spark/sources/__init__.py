"""Sources, sinks and formats (SURVEY.md §2.1).

Reference → Spark mapping implemented here:
- `readTextFile`/`readCsvFile`/`readFile` (ExecutionEnvironment.java:431,538,544)
  → `read_text` / `read_csv` / `spark.read.format(...)`
- Format (de)serialization schemas: CSV (`CsvRowDeserializationSchema.java`),
  JSON (`JsonRowDeserializationSchema.java`) → `decode_json` / `decode_csv`
  column-level decoders (`from_json` / `from_csv`) for payload columns (the
  Kafka-value pattern).
- Parquet/ORC (`ParquetRowInputFormat.java`, `OrcRowInputFormat.java`)
  → built-in vectorized readers.
- Avro (`AvroRowDeserializationSchema.java`) → `from_avro` when the
  spark-avro package is on the classpath (import-gated; not in this image).
- Sinks: `write_partitioned` (FileSystemTableSink partition-commit analog —
  Spark's file committer is manifest-transactional).
- JDBC (`JDBCTableSource.java:48`) → `read_jdbc` (thin wrapper; needs a
  driver jar at runtime).

Streaming sources live in `flink_ci_flink_spark.streaming.core`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**options)
        .load()
    )


def decode_json(col, schema) -> Column:
    """Payload-column JSON decode (JsonRowDeserializationSchema analog)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def decode_csv(col, schema: str, sep: str = ",") -> Column:
    """Payload-column CSV decode (CsvRowDeserializationSchema analog)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_csv(c, F.lit(schema), {"sep": sep})


def decode_avro(col, json_schema: str, use_jvm: bool | None = None) -> Column:
    """Avro payload decode (AvroRowDeserializationSchema analog).

    Uses the JVM `from_avro` when the spark-avro package is loaded;
    otherwise falls back to the vendored pure-Python binary decoder
    (`sources/avro_codec.py`, Arrow-batched pandas UDF — records of
    primitives and nullable unions)."""
    c = F.col(col) if isinstance(col, str) else col
    if use_jvm is not False:
        try:
            from pyspark.sql.avro.functions import from_avro

            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            # probe: AVRO_NOT_LOADED raises at expression creation time
            out = from_avro(c, json_schema)
            spark.range(0).select(
                from_avro(F.lit(b"").cast("binary"), json_schema)
            ).schema
            return out
        except Exception:
            if use_jvm:
                raise
    from pyspark.sql.types import StructType

    from flink_ci_flink_spark.sources.avro_codec import decode_record, spark_ddl_for

    ddl = spark_ddl_for(json_schema)
    out_type = StructType.fromDDL(ddl)

    @F.pandas_udf(out_type)
    def _decode(s):
        import pandas as pd

        recs = [
            decode_record(bytes(b), json_schema) if b is not None else None
            for b in s
        ]
        return pd.DataFrame(
            [
                {f.name: (r.get(f.name) if r else None) for f in out_type.fields}
                for r in recs
            ]
        )

    return _decode(c)


# -- Kafka wrappers (FlinkKafkaConsumer.java:73 / FlinkKafkaProducer.java:99) -

#: Flink Kafka consumer/producer property -> Spark kafka source/sink option.
#: (`flink-connectors/flink-connector-kafka/.../FlinkKafkaConsumer.java`,
#: Spark Structured Streaming Kafka integration guide — both public.)
KAFKA_OPTION_MAP = {
    "bootstrap.servers": "kafka.bootstrap.servers",
    "group.id": "kafka.group.id",
    "topic": "subscribe",
    "topics": "subscribe",
    "topic-pattern": "subscribePattern",
    "scan.startup.mode:earliest-offset": ("startingOffsets", "earliest"),
    "scan.startup.mode:latest-offset": ("startingOffsets", "latest"),
    "properties.security.protocol": "kafka.security.protocol",
    "properties.sasl.mechanism": "kafka.sasl.mechanism",
    "properties.sasl.jaas.config": "kafka.sasl.jaas.config",
    "sink.parallelism": None,  # Spark derives sink parallelism from the plan
    "format": None,  # payload decode is a separate decode_* call here
}


def kafka_options(flink_props: dict) -> dict:
    """Map Flink Kafka connector properties to Spark reader/writer options.

    Pure function (unit-testable without a broker). Unknown `properties.*`
    keys pass through with the `kafka.` prefix (both systems hand them to
    the Kafka client verbatim); mapped keys translate per KAFKA_OPTION_MAP;
    keys mapped to None are intentionally dropped."""
    out: dict = {}
    for k, v in flink_props.items():
        enum_key = f"{k}:{v}"
        if enum_key in KAFKA_OPTION_MAP:
            opt, val = KAFKA_OPTION_MAP[enum_key]
            out[opt] = val
        elif k in KAFKA_OPTION_MAP:
            tgt = KAFKA_OPTION_MAP[k]
            if tgt is not None:
                out[tgt] = v
        elif k.startswith("properties."):
            out["kafka." + k[len("properties.") :]] = v
        else:
            out[k] = v
    return out


def read_kafka(spark: SparkSession, flink_props: dict, streaming: bool = True) -> DataFrame:
    """Kafka source (FlinkKafkaConsumer analog): returns the raw
    (key, value, topic, partition, offset, timestamp) frame; decode the
    value payload with decode_json/decode_csv/decode_avro. Requires the
    spark-sql-kafka package on the classpath at runtime."""
    opts = kafka_options(flink_props)
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    return reader.options(**opts).load()


def write_kafka(df: DataFrame, flink_props: dict, checkpoint_dir: str):
    """Kafka sink (FlinkKafkaProducer analog): df must carry `value` (and
    optionally `key`/`topic`) columns, per the Spark Kafka sink contract.
    Returns the started StreamingQuery."""
    opts = kafka_options(flink_props)
    return (
        df.writeStream.format("kafka")
        .options(**opts)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Partitioned file sink (FileSystemTableSink/StreamingFileSink analog —
    the committer's manifest gives the same atomic-visibility guarantee the
    reference gets from its two-phase partition commit)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def save_table(
    df: DataFrame,
    name: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Catalog-table sink (Hive source/sink analog — reference
    `flink-connectors/flink-connector-hive/.../HiveTableSink.java`): write a
    managed table registered in the session catalog (warehouse dir +
    catalog entry). With a Hive metastore configured
    (`spark.sql.catalogImplementation=hive`) the same call persists to the
    metastore; the test image has no metastore service, so tests exercise
    the in-memory catalog — the API surface and partition layout are
    identical."""
    w = df.write.mode(mode).format(fmt)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog-table source (HiveTableSource analog): partition pruning and
    pushdown apply exactly as for path-based reads."""
    return spark.table(name)


def insert_into_table(df: DataFrame, name: str, overwrite: bool = False) -> None:
    """INSERT INTO / INSERT OVERWRITE a catalog table (dynamic partition
    insert when the table is partitioned)."""
    df.write.insertInto(name, overwrite=overwrite)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a BUCKETED (and optionally sorted) managed table.

    The 100 TB co-located-join lever: two tables bucketed on the join key
    with the same bucket count join WITHOUT a shuffle on either side
    (Catalyst sees the hash-distribution from the bucket spec), and a
    bucket-sorted layout removes the sort from sort-merge joins. The
    plan-level guarantee is asserted in
    tests/test_plans.py::test_bucketed_join_no_shuffle.

    Reference analog: Flink's batch planner relies on shuffle-by-key for
    every co-location (`FlinkBatchRuleSets` exchange insertion — no
    persistent bucketing in 1.11); pre-bucketed storage is how the same
    join becomes exchange-free on Spark."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
