"""Runtime + SQL-layer tests: CSV bean parsing, DDL end-to-end SQL
pipeline (day10/_11 shape), checkpoint recovery (exactly-once restart),
restart-strategy supervisor, partitioning wrappers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_tutorial_spark import schemas
from flink_tutorial_spark.operators.partitioning import rescale, two_stage_count
from flink_tutorial_spark.runtime import NO_RESTART, RestartStrategy, supervise
from flink_tutorial_spark.session import load_table


def test_csv_bean_parsing(spark):
    # day10/_01_StreamToTable.java:26-30: 'ws_001,1577844001,45' -> WaterSensor
    lines = spark.createDataFrame(
        [("ws_001,1577844001,45",), ("ws_002,1577844015,43",)], ["value"]
    )
    parsed = lines.select(
        schemas.parse_csv_line("value", schemas.WATER_SENSOR).alias("b")
    ).select("b.*")
    rows = {r.id: (r.ts, r.vc) for r in parsed.collect()}
    assert rows == {"ws_001": (1577844001, 45), "ws_002": (1577844015, 43)}
    ts = schemas.with_event_time(parsed, "ts", "s").select("ts", "id")
    assert ts.schema["ts"].dataType.typeName() == "timestamp"


def test_sql_ddl_insert_pipeline(spark, sf_dir, tmp_path):
    # day10/_11_SQL_KafkaToKafka.java:18-36: DDL source + sink, then
    # 'insert into sink select ... where id = ...' fires the pipeline
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ddl_src")
    sink_loc = str(tmp_path / "sink_tbl")
    spark.sql("DROP TABLE IF EXISTS sink_sensor")
    spark.sql(
        f"""
        CREATE TABLE sink_sensor (event_id BIGINT, user_id BIGINT, value DOUBLE)
        USING parquet LOCATION '{sink_loc}'
        """
    )
    spark.sql(
        "INSERT INTO sink_sensor SELECT event_id, user_id, value FROM ddl_src WHERE event_type = 'purchase'"
    )
    got = spark.sql("SELECT count(*) AS c FROM sink_sensor").collect()[0].c
    want = spark.sql("SELECT count(*) AS c FROM ddl_src WHERE event_type = 'purchase'").collect()[0].c
    assert got == want > 0
    spark.sql("DROP TABLE sink_sensor")


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    # enableCheckpointing + restart == resume from offset WAL, no dupes
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    sch = pa.schema([("k", pa.int64())])

    def add_file(i, vals):
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame({"k": vals}), schema=sch, preserve_index=False),
            str(src / f"f{i}.parquet"),
        )

    def start():
        stream = (
            spark.readStream.format("parquet")
            .schema("k long")
            .option("maxFilesPerTrigger", "1")
            .load(str(src))
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    add_file(0, [1, 2, 3])
    q = start()
    q.processAllAvailable()
    q.stop()
    add_file(1, [4, 5])
    q = start()  # restart from the same checkpoint
    q.processAllAvailable()
    q.stop()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]  # batch 0 not re-emitted, batch 1 present


def test_supervisor_restart_policy():
    class FlakyQuery:
        failures_left = 2
        starts = 0

        def awaitTermination(self):
            FlakyQuery.starts += 1
            if FlakyQuery.failures_left > 0:
                FlakyQuery.failures_left -= 1
                raise RuntimeError("boom")

    supervise(FlakyQuery, RestartStrategy(max_attempts=3, delay_seconds=0.01))
    assert FlakyQuery.starts == 3  # 2 failures + 1 success

    class AlwaysFails:
        def awaitTermination(self):
            raise RuntimeError("fatal")

    with pytest.raises(RuntimeError):
        supervise(AlwaysFails, NO_RESTART)


def test_partitioning_wrappers(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # coalesce can only reduce partitions (narrow dep) — widen first
    assert rescale(events.repartition(8), 2).rdd.getNumPartitions() == 2
    plain = {
        (r.event_type, r.cnt)
        for r in events.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {
        (r.event_type, r.cnt) for r in two_stage_count(events, "event_type").collect()
    }
    assert plain == salted
