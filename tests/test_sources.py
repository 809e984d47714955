"""Source wrapper tests: rate + sensor simulation (unbounded sources
driven for one trigger), file-watch source schema, kafka wrapper shape
(no broker in the container — construction only)."""

from __future__ import annotations

import uuid

from flink_tutorial_spark.sources.streaming import (
    file_stream_source,
    rate_source,
    sensor_source,
)


def _drain_once(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 15
        while time.time() < deadline:
            rows = df.sparkSession.sql(f"SELECT * FROM {name}").collect()
            if rows:
                return rows
            time.sleep(0.5)
        return []
    finally:
        q.stop()


def test_rate_source_emits_rows(spark):
    rows = _drain_once(rate_source(spark, rows_per_second=50), f"r_{uuid.uuid4().hex[:8]}")
    assert rows and {c for c in rows[0].asDict()} == {"timestamp", "value"}


def test_sensor_source_deterministic_walk(spark):
    rows = _drain_once(sensor_source(spark, rows_per_second=50), f"s_{uuid.uuid4().hex[:8]}")
    assert rows
    r = rows[0]
    assert r.id.startswith("sensor_") and 55.0 <= r.temperature <= 85.0


def test_file_stream_source_schema(spark, sf_dir, tmp_path):
    from flink_tutorial_spark.session import load_table

    schema = load_table(spark, sf_dir, "documents").schema
    df = file_stream_source(spark, sf_dir + "/documents.parquet", schema)
    assert df.isStreaming and df.schema == schema


def test_csv_malformed_row_modes(spark, tmp_path):
    # source robustness (day10 file-connector family): PERMISSIVE keeps a
    # malformed row null-padded with the raw line captured; DROPMALFORMED
    # silently drops it — the production knob for dirty corpus ingestion
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    p = tmp_path / "in.csv"
    p.write_text("1,alice\nnot_an_int,bob\n3,carol\n")
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    permissive = spark.read.csv(
        str(p), schema=schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = {r.name: (r.id, r._corrupt_record) for r in permissive.collect()}
    assert rows["alice"] == (1, None)
    assert rows["bob"][0] is None and rows["bob"][1] == "not_an_int,bob"
    assert rows["carol"] == (3, None)

    dropped = spark.read.csv(
        str(p),
        schema=StructType(schema.fields[:2]),
        mode="DROPMALFORMED",
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]


def test_jsonl_source_schema_first(spark, tmp_path):
    # JSON-lines connector: explicit schema; extra fields drop, missing
    # fields read as null — the Kafka-JSON value-format contract
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from flink_tutorial_spark.sources.batch import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "kind": "view", "value": 2.5, "extra": "ignored"}\n'
        '{"id": 2, "kind": "click"}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("kind", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    rows = {r.id: (r.kind, r.value) for r in read_jsonl(spark, str(p), schema).collect()}
    assert rows == {1: ("view", 2.5), 2: ("click", None)}
