"""Source connectors: one interface over the formats the engine reads.

The reference's sources are a Kafka raw-format topic
(flink/jobs/flink_json_to_iceberg.py:95-108) and Postgres via
Debezium (kafka/config/connect-postgres-source.json). Here every
source is addressed by URI and returns a DataFrame (batch) or
streaming DataFrame:

- ``parquet|csv|json|orc|text:<path>``  — file formats, batch + stream
- ``avro:<path>``                       — needs the spark-avro module
  (external to core Spark; a clear error is raised if absent)
- ``kafka:<bootstrap>/<topic>``         — needs the spark-sql-kafka jar
  (not in this image; the builder raises a clear error if absent)
- ``jdbc:<url>#<table>``                — needs a JDBC driver jar

Kafka/JDBC construct the standard Spark readers, so on a cluster with
the jars present the same call sites work unchanged; the file-stream
path is the test stand-in with identical downstream semantics
(earliest-offset ≙ read all existing files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FILE_FORMATS = ("parquet", "csv", "json", "orc", "text")


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro module (external to core) is present.

    Probes the DataSource registration class (DefaultSource): some
    avro classes (AvroFileFormat, SchemaConverters) ship in core Spark
    jars, but format("avro") resolves only when the spark-avro module
    jar contributes its DefaultSource registration.
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.DefaultSource"
        )
        return True
    except Exception:
        return False


def _split(uri: str) -> tuple[str, str]:
    scheme, _, rest = uri.partition(":")
    if not rest:
        raise ValueError(f"source URI needs a scheme: {uri!r}")
    return scheme, rest


def read_batch(
    spark: SparkSession,
    uri: str,
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Batch read of any supported source URI."""
    scheme, rest = _split(uri)
    if scheme == "avro" and not avro_available(spark):
        raise RuntimeError(
            "avro source needs the spark-avro module on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
        )
    if scheme in _FILE_FORMATS or scheme == "avro":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if scheme == "csv":
            options.setdefault("header", "true")
        return reader.options(**options).format(scheme).load(rest)
    if scheme == "jdbc":
        url, _, table = rest.partition("#")
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .options(**options)
            .load()
        )
    if scheme == "kafka":
        raise ValueError("kafka is a streaming source; use open_stream()")
    raise ValueError(f"unsupported source scheme: {scheme}")


def open_stream(
    spark: SparkSession,
    uri: str,
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Unbounded read of any supported source URI.

    ``kafka:<bootstrap>/<topic>`` mirrors the reference's source table
    exactly: earliest offsets, value as raw string column ``raw_data``
    (flink_json_to_iceberg.py:95-107).
    """
    scheme, rest = _split(uri)
    if scheme == "avro" and not avro_available(spark):
        raise RuntimeError(
            "avro source needs the spark-avro module on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
        )
    if scheme in _FILE_FORMATS or scheme == "avro":
        reader = spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        elif scheme != "text":
            raise ValueError(f"streaming {scheme} source requires an explicit schema")
        if scheme == "csv":
            options.setdefault("header", "true")
        return reader.options(**options).format(scheme).load(rest)
    if scheme == "kafka":
        if not kafka_available(spark):
            raise RuntimeError(
                "spark-sql-kafka connector jar not on the classpath; "
                "submit with --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver> "
                "(file streams provide the same semantics for local testing)"
            )
        bootstrap, _, topic = rest.partition("/")
        from pyspark.sql import functions as F

        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", options.pop("startingOffsets", "earliest"))
            .options(**options)
            .load()
        )
        return raw.select(F.col("value").cast("string").alias("raw_data"))
    raise ValueError(f"unsupported streaming scheme: {scheme}")
