"""Synchronous streaming execution helpers: run a Structured Streaming
query over a bounded source to completion and hand back the result as a
normal DataFrame (the driver/oracle contract needs batch results).

`stream_table` mirrors session.load_table's nano-timestamp handling for
the readStream path.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

from flink_tutorial_spark.session import NANO_TS_COLUMNS, ensure_runtime_confs


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """readStream over a testdata parquet table (file-arrival source)."""
    ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema: StructType = spark.read.parquet(path).schema
    # the file source wants a directory: watch sf_dir, filter to this table
    df = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .load(sf_dir)
    )
    for col in NANO_TS_COLUMNS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def run_to_memory(out: DataFrame, mode: str = "append") -> DataFrame:
    """Execute a streaming DataFrame to completion via a memory sink;
    returns the materialized result. processAllAvailable() drains every
    micro-batch including the trailing no-data batch that fires event-
    time timers after the final watermark update."""
    spark = out.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = out.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
