"""transformWithState migration spike (Spark 4.1+, VERDICT r1 #9).

transformWithStateInPandas is Structured Streaming's successor to
applyInPandasWithState: a StatefulProcessor gets NAMED state slots
(getValueState/getListState/getMapState) plus a timer list — closing
the modeling gap documented in stateful.py (Flink's ValueState/
ListState/MapState had to be packed into ONE state tuple per key).

This module migrates the keyed COUNT window (countWindow(n),
CountWindowDemo.java:32) as the spike: same semantics and golden trace
as stateful.count_window_sum, state held in a named ValueState slot.
`TWS_AVAILABLE` is the version guard — callers (and the A/B test) fall
back to the applyInPandasWithState path on older runtimes.

Requires the RocksDB state store provider (set automatically by
`rocksdb_conf()`); the HDFS-backed default provider does not implement
the transformWithState operator contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # version guard: Spark 4.1+ AND protobuf (the state-server wire
    # protocol dependency — absent in this container, so the A/B test
    # skips here and runs on any standard Spark 4.1 deployment).
    # Re-probed on the Spark 4.1.2 container (r6): the
    # pyspark.sql.streaming.stateful_processor import now succeeds, but
    # google.protobuf is still not installed and pyspark.zip vendors no
    # copy, so transformWithStateInPandas's state-server client cannot
    # start; the guard (and the applyInPandasWithState fallback) stays.
    # r7: `pip install protobuf` was attempted in-container and fails —
    # the sandbox has no package index ("No matching distribution found
    # for protobuf"), so this is environment-final, not a TODO: the tws
    # path activates automatically on any deployment that has protobuf,
    # and nothing further can be done from inside this container.
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - exercised only on old runtimes
    if "StatefulProcessor" not in dir():
        StatefulProcessor = object  # type: ignore[assignment,misc]
        StatefulProcessorHandle = object  # type: ignore[assignment,misc]
    TWS_AVAILABLE = False

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COUNT_WINDOW_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("window_seq", LongType()),
        StructField("cnt", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
_BUF_SCHEMA = StructType(
    [
        StructField("buf_cnt", LongType()),
        StructField("buf_sum", DoubleType()),
        StructField("emitted", LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_conf(spark) -> None:
    """transformWithState runs on the RocksDB state store provider — the
    same provider a >heap-state production deployment would configure
    (SURVEY §2.9 state backends row)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class _CountWindowProcessor(StatefulProcessor):
    """countWindow(n) as a StatefulProcessor: the ring counters live in a
    named ValueState slot ('buf') — with more slots this is where Flink's
    ListState/MapState would each get their own named handle."""

    def __init__(self, ts_col: str, value_col: str, n: int, sort_cols: list[str]):
        self.ts_col = ts_col
        self.value_col = value_col
        self.n = n
        self.sort_cols = sort_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.buf = handle.getValueState("buf", _BUF_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        buf_cnt, buf_sum, emitted = (
            self.buf.get() if self.buf.exists() else (0, 0.0, 0)
        )
        out = []
        for pdf in rows:
            vals = pdf.sort_values(self.sort_cols, kind="stable")[self.value_col].to_numpy(
                dtype="float64"
            )
            if len(vals) == 0:
                continue
            cs = np.cumsum(vals)
            total = buf_cnt + len(vals)
            complete = total // self.n
            if complete:
                ends = (np.arange(1, complete + 1) * self.n) - buf_cnt - 1
                window_sums = cs[ends].copy()
                window_sums[1:] -= cs[ends[:-1]]
                window_sums[0] += buf_sum
                out.extend(
                    (key[0], emitted + i + 1, self.n, float(ws))
                    for i, ws in enumerate(window_sums)
                )
                emitted += complete
                buf_sum = float(cs[-1] - cs[ends[-1]])
            else:
                buf_sum += float(cs[-1])
            buf_cnt = total % self.n
        self.buf.update((buf_cnt, buf_sum, emitted))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in COUNT_WINDOW_OUT.fields])

    def close(self) -> None:
        pass


def count_window_sum_tws(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """transformWithState twin of stateful.count_window_sum — identical
    semantics/golden trace, new-API state plumbing."""
    if not TWS_AVAILABLE:  # pragma: no cover
        raise RuntimeError("transformWithState requires Spark 4.1+")
    rocksdb_conf(df.sparkSession)
    proc = _CountWindowProcessor(ts_col, value_col, n, sort_cols or [ts_col, value_col])
    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=COUNT_WINDOW_OUT,
        outputMode="Append",
        timeMode="None",
    )
