"""Queryable state via the statestore read format — the Spark-native
QueryableStateClient analog (QueryableStateDemo.java:27-67)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_streaming import EVENT_SCHEMA, _row, write_batches


def test_state_snapshot_point_lookup(spark, tmp_path):
    from flink_tutorial_spark.streaming.state_reader import lookup, state_snapshot

    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    write_batches(
        src,
        [
            [_row(1, "a", value=1), _row(2, "a", value=2), _row(3, "b", value=5)],
            [_row(4, "a", value=9)],
        ],
    )
    stream = (
        spark.readStream.format("parquet").schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    agg = stream.groupBy("key").agg(F.count("*").alias("cnt"))
    q = (agg.writeStream.outputMode("update").format("memory")
         .queryName("sr_out").option("checkpointLocation", ck).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = state_snapshot(spark, ck)
    by_key = {r.key.key: r.value["count"] for r in snap.collect()}
    assert by_key == {"a": 3, "b": 1}
    assert lookup(snap, "key", "a")[0].value["count"] == 3
    # time travel: after batch 0 the state held a=2, b=1
    early = {r.key.key: r.value["count"] for r in state_snapshot(spark, ck, batch_id=0).collect()}
    assert early == {"a": 2, "b": 1}
