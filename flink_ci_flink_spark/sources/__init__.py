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


def decode_avro(col, json_schema: str) -> Column:
    """Avro payload decode — requires the spark-avro package (not bundled)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro package not available in this environment"
        ) from exc
    c = F.col(col) if isinstance(col, str) else col
    return from_avro(c, json_schema)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Partitioned file sink (FileSystemTableSink/StreamingFileSink analog —
    the committer's manifest gives the same atomic-visibility guarantee the
    reference gets from its two-phase partition commit)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)
