"""Bounded source wrappers (SURVEY.md §2.1 batch rows).

| reference                          | here               |
|------------------------------------|--------------------|
| fromElements(...)                  | from_elements      |
| fromCollection(list)               | from_collection    |
| fromParallelCollection / fromSequence / generateSequence | from_range |
| readTextFile(path)                 | read_text          |
| filesystem+CSV table connector     | read_csv           |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def from_elements(spark: SparkSession, *rows, schema=None) -> DataFrame:
    """fromElements — CollectionSourceDemo.java:23 (bounded, exactly-once)."""
    return spark.createDataFrame(list(rows), schema=schema)


def from_collection(spark: SparkSession, data, schema=None) -> DataFrame:
    """fromCollection — CollectionSourceDemo.java:28."""
    return spark.createDataFrame(data, schema=schema)


def from_range(spark: SparkSession, start: int, end: int, num_partitions: int | None = None) -> DataFrame:
    """fromSequence(a,b) / generateSequence — CollectionSourceDemo.java:
    40-45: parallel number range, inclusive bounds like Flink's."""
    return spark.range(start, end + 1, numPartitions=num_partitions)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """readTextFile — FileSourceDemo.java:58 (bounded parallel scan)."""
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, schema: StructType, header: bool = False) -> DataFrame:
    """Filesystem+CSV table connector — day10/_03_Source_File.java:30-36
    (explicit schema, never inferSchema in production)."""
    return spark.read.csv(path, schema=schema, header=header)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines table connector (the reference's Kafka-JSON table
    format family, day10 `_11_SQL_KafkaToKafka.java:18-36` value format,
    as a file source): explicit schema, never inference — unknown fields
    drop, missing fields null, malformed lines follow the standard
    PERMISSIVE/corrupt-record contract (tests/test_sources.py)."""
    return spark.read.json(path, schema=schema)
