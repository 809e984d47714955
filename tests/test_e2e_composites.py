"""End-to-end composite scenarios mirroring the reference's flagship
demo programs:

- KafkaToRedisWordCount.java:38-59: checkpointed streaming wordcount
  into an idempotent KV upsert sink, surviving a restart
- BroadcastStateDemo.java:50-130 / _11_BroadcastStateFunction.scala:
  stream-static join where the dim table CHANGES between micro-batches
  (Spark re-plans the static side per batch — the broadcast-state refresh)
- CountWindowAllApplyDemo.java:32-55: full-buffer count window with
  in-window sort (apply = buffer-all, then sort)
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_tutorial_spark.sinks.foreach import KeyedUpsertSink
from tests.test_streaming import EVENT_SCHEMA, _row, write_batches


def test_wordcount_to_upsert_sink_with_restart(spark, tmp_path):
    src = tmp_path / "lines"
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    sink = KeyedUpsertSink(spark, str(tmp_path / "kv"), ["word"])
    sch = pa.schema([("line", pa.string())])

    def add(i, lines):
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame({"line": lines}), schema=sch, preserve_index=False),
            str(src / f"f{i}.parquet"),
        )

    def start():
        stream = (
            spark.readStream.format("parquet").schema("line string")
            .option("maxFilesPerTrigger", "1").load(str(src))
        )
        counts = (
            stream.select(F.explode(F.split("line", " ")).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt"))
        )
        return (
            counts.writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink).start()
        )

    add(0, ["spark flink spark"])
    q = start(); q.processAllAvailable(); q.stop()
    add(1, ["flink beam"])
    q = start(); q.processAllAvailable(); q.stop()  # restart from checkpoint
    got = {r.word: r.cnt for r in sink.read().collect()}
    # counts aggregate ACROSS the restart: streaming state recovered
    assert got == {"spark": 2, "flink": 2, "beam": 1}


def test_stream_static_join_with_refreshed_dim(spark, tmp_path):
    src = str(tmp_path / "src")
    dim_dir = str(tmp_path / "dim")
    os.makedirs(dim_dir)
    dim_schema = pa.schema([("user", pa.int64()), ("tier", pa.string())])

    def set_dim(rows):
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows, columns=["user", "tier"]), schema=dim_schema, preserve_index=False),
            os.path.join(dim_dir, "dim.parquet"),
        )

    set_dim([(1, "bronze"), (2, "bronze")])
    write_batches(src, [[_row(1, user=1)], [_row(2, user=2)]])

    name = f"enr_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("parquet").schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    dim = spark.read.schema("user long, tier string").parquet(dim_dir)
    joined = stream.join(F.broadcast(dim), "user").select("user", "tier", "ts")

    seen = []

    def capture(batch_df, epoch_id):
        seen.extend((r.user, r.tier) for r in batch_df.collect())
        if epoch_id == 0:
            set_dim([(1, "bronze"), (2, "GOLD")])  # refresh between batches

    q = joined.writeStream.foreachBatch(capture).start()
    q.processAllAvailable()
    q.stop()
    # batch 0 saw the old dim; batch 1 the refreshed one — the
    # broadcast-state update without any state machinery
    assert (1, "bronze") in seen and (2, "GOLD") in seen


def test_streaming_hot_items_pipeline(spark, tmp_path):
    # HotItems.scala:47-136 STREAMING-NATIVE: windowed count with
    # watermark -> per-window top-N ranking inside foreachBatch ->
    # keyed upsert sink (rank re-emitted as windows update/close).
    from pyspark.sql import Window as W

    src = str(tmp_path / "src")
    write_batches(
        src,
        [
            [_row(1, kind="view", value=7), _row(2, kind="view", value=7),
             _row(3, kind="view", value=8)],
            [_row(4, kind="view", value=7), _row(5, kind="view", value=9)],
            [_row(4000, kind="view", value=1)],  # closes the first window
        ],
    )
    sink = KeyedUpsertSink(spark, str(tmp_path / "topn"), ["window_start", "rank"])

    def rank_batch(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        w = W.partitionBy("window_start").orderBy(F.desc("cnt"), F.asc("item"))
        ranked = (
            batch_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
        )
        sink(ranked, epoch_id)

    stream = (
        spark.readStream.format("parquet").schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    counts = (
        stream.where(F.col("kind") == "view")
        .withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("value").alias("item"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "item", "cnt")
    )
    q = counts.writeStream.outputMode("append").foreachBatch(rank_batch).start()
    q.processAllAvailable()
    q.stop()
    got = {(r.window_start.isoformat(), r.rank): (r.item, r.cnt) for r in sink.read().collect()}
    # window [00:00, 01:00): item 7 seen 3x, items 8/9 once -> top2 = 7, 8
    assert got[("2024-01-01T00:00:00", 1)] == (7.0, 3)
    assert got[("2024-01-01T00:00:00", 2)] == (8.0, 1)


def test_stateful_op_state_survives_restart(spark, tmp_path):
    # §2.9 crash-recovery demos (MyKeyedStateDemo00/01/02): keyed state
    # must resume from the checkpoint — a count window whose buffer
    # spans a restart still fires exactly once with the full window.
    from flink_tutorial_spark.streaming.stateful import count_window_sum

    src = tmp_path / "src"
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    def add(i, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "key", "user", "kind", "value"])
        from tests.test_streaming import _ARROW_SCHEMA

        pq.write_table(
            pa.Table.from_pandas(pdf, schema=_ARROW_SCHEMA, preserve_index=False),
            str(src / f"f{i}.parquet"),
        )

    fired = []

    def capture(batch_df, epoch_id):
        fired.extend(
            (r.key, r.window_seq, r.cnt, r.sum_value) for r in batch_df.collect()
        )

    def start():
        stream = (
            spark.readStream.format("parquet").schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1").load(str(src))
        )
        out = count_window_sum(stream, "key", "ts", "value", 3)
        return (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(capture).start()
        )

    add(0, [_row(1, "a", value=1.0), _row(2, "a", value=2.0)])  # buffer=2
    q = start(); q.processAllAvailable(); q.stop()
    assert fired == []  # window not yet full
    add(1, [_row(3, "a", value=3.0)])  # 3rd row -> window fires post-restart
    q = start(); q.processAllAvailable(); q.stop()
    assert fired == [("a", 1, 3, 6.0)]  # buffer recovered from state store


def test_full_buffer_sorted_count_window(spark, tmp_path):
    # countWindowAll(5).apply(sort) — buffer 5 rows, emit them sorted
    from collections.abc import Iterator

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StringType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("key", StringType()),
        StructField("window_seq", LongType()),
        StructField("sorted_values", ArrayType(DoubleType())),
    ])
    state_schema = StructType([
        StructField("buf", ArrayType(DoubleType())),
        StructField("emitted", LongType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        buf, emitted = (list(state.get[0]), state.get[1]) if state.exists else ([], 0)
        out = []
        for pdf in pdfs:
            for v in pdf.sort_values("ts")["value"]:
                buf.append(float(v))
                if len(buf) == 5:
                    emitted += 1
                    out.append((key[0], emitted, sorted(buf)))
                    buf = []
        state.update((buf, emitted))
        if out:
            yield pd.DataFrame(out, columns=["key", "window_seq", "sorted_values"])

    src = str(tmp_path / "src")
    write_batches(src, [[_row(i, "k", value=float(v))] for i, v in enumerate([5, 1, 4, 2, 3, 9])])
    stream = (
        spark.readStream.format("parquet").schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = stream.groupBy("key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    name = f"buf_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) == 1
    assert rows[0].sorted_values == [1.0, 2.0, 3.0, 4.0, 5.0]  # sorted buffer; 9 still buffered
