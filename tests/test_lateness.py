"""allowedLateness emit-then-revise, explicit retract rows, and the
late-updating Top-N — golden traces for NetworkFlow.scala:49-148 and
_08_lateReadingsOutput.java:86-94 (VERDICT r1 #3 / missing #5).

Watermark mechanics under test (see memory): the watermark computed at
the end of batch N takes effect in batch N+1, and state eviction runs
at that batch's end — so a late row ONE batch after the advance still
revises the window; TWO batches after, it is dropped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.test_streaming import EVENT_SCHEMA, T0, _row, write_batches


def _drive(spark, src, sink, lateness="30 seconds"):
    from flink_tutorial_spark.streaming.lateness import late_window_counts

    stream = (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    agg = late_window_counts(stream, "key", "ts", "10 seconds", lateness)
    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_allowed_lateness_emit_then_revise(spark, tmp_path):
    from flink_tutorial_spark.streaming.lateness import RetractingUpsertSink

    src = str(tmp_path / "src")
    write_batches(
        src,
        [
            # window [0,10) fires with cnt=2; t=50 drives the watermark
            [_row(1, "a"), _row(2, "a"), _row(50, "z")],
            # late row inside the lateness horizon -> REVISES the window
            [_row(3, "a")],
            # state evicted now; this late row must be dropped silently
            [_row(4, "a"), _row(200, "z")],
        ],
    )
    sink = RetractingUpsertSink(spark, str(tmp_path / "out"), ["window_start", "key"])
    _drive(spark, src, sink)

    w0 = T0  # window [0,10) start
    log = [
        (r.is_insert, r.cnt, r.epoch)
        for r in sink.log()
        .where((F.col("window_start") == w0) & (F.col("key") == "a"))
        .orderBy("epoch", "is_insert")
        .collect()
    ]
    # epoch 0: first fire (true, 2); epoch 1: retract pair (false,2)+(true,3)
    assert log == [(True, 2, 0), (False, 2, 1), (True, 3, 1)]
    final = {
        (r.window_start, r.key): r.cnt for r in sink.read().collect()
    }
    assert final[(w0.to_pydatetime(), "a")] == 3  # epoch-2 late row dropped


def test_late_updating_topn(spark, tmp_path):
    # NetworkFlow.scala:49-148: a late row flips the ranking of its
    # window in place; untouched windows are never rewritten
    from flink_tutorial_spark.streaming.lateness import LateTopNSink

    sink = LateTopNSink(spark, str(tmp_path / "topn"), n=2)
    w0 = T0.to_pydatetime()
    w1 = (T0 + pd.Timedelta(seconds=10)).to_pydatetime()
    b0 = spark.createDataFrame(
        [(w0, "x", 2), (w0, "y", 3), (w0, "q", 1), (w1, "m", 5)],
        ["window_start", "item_key", "cnt"],
    )
    sink(b0, 0)
    first = {
        (r.window_start, r.rank): r.item_key for r in sink.read().collect()
    }
    assert first[(w0, 1)] == "y" and first[(w0, 2)] == "x"
    assert first[(w1, 1)] == "m"

    paths_before = dict(sink.table._live_bucket_paths())
    # late revision: x jumps to 4 -> overtakes y; window w1 untouched
    b1 = spark.createDataFrame([(w0, "x", 4)], ["window_start", "item_key", "cnt"])
    sink(b1, 1)
    got = {(r.window_start, r.rank): r.item_key for r in sink.read().collect()}
    assert got[(w0, 1)] == "x" and got[(w0, 2)] == "y"
    assert got[(w1, 1)] == "m"
    # epoch-proportional: only w0's bucket was rewritten; any bucket not
    # holding w0 keeps its pre-epoch pointer untouched
    paths_after = dict(sink.table._live_bucket_paths())
    dirty = {b for b in paths_before if paths_before[b] != paths_after.get(b)}
    assert len(dirty) <= 1


def test_streaming_late_topn_end_to_end(spark, tmp_path):
    # full pipeline: update-mode window counts -> LateTopNSink; the late
    # row re-ranks its window through the live streaming path
    from flink_tutorial_spark.streaming.lateness import LateTopNSink

    src = str(tmp_path / "src")
    write_batches(
        src,
        [
            # [0,10): y x3, x x2 ; watermark driver at t=50
            [_row(1, "a", kind="y"), _row(2, "a", kind="y"), _row(3, "a", kind="y"),
             _row(4, "a", kind="x"), _row(5, "a", kind="x"), _row(50, "a", kind="w")],
            # late: x gains 2 -> x overtakes y in [0,10)
            [_row(6, "a", kind="x"), _row(7, "a", kind="x")],
        ],
    )
    sink = LateTopNSink(spark, str(tmp_path / "out"), n=3)

    def fb(batch_df, epoch_id):
        sink(
            batch_df.select("window_start", F.col("kind").alias("item_key"), "cnt"),
            epoch_id,
        )

    stream = (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    agg = (
        stream.withWatermark("ts", "30 seconds")
        .groupBy(F.window("ts", "10 seconds").alias("w"), "kind")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "kind", "cnt")
    )
    q = agg.writeStream.outputMode("update").foreachBatch(fb).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    w0 = T0.to_pydatetime()
    got = {
        (r.window_start, r.rank): (r.item_key, r.cnt)
        for r in sink.read().collect()
    }
    assert got[(w0, 1)] == ("x", 4)  # 2 on time + 2 late
    assert got[(w0, 2)] == ("y", 3)
