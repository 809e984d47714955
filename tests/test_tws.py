"""transformWithState spike (Spark 4.1+): the migrated count window must
reproduce the applyInPandasWithState golden on the new API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from tests.test_streaming import _row, run_stream, write_batches

tws = pytest.importorskip("flink_tutorial_spark.streaming.tws")


@pytest.mark.skipif(
    not tws.TWS_AVAILABLE,
    reason="needs Spark 4.1+ transformWithState and google.protobuf (state-server protocol)",
)
def test_count_window_tws_matches_golden(spark, tmp_path):
    src = str(tmp_path / "src")
    write_batches(
        src,
        [
            [_row(1, "a", value=1), _row(2, "a", value=2), _row(3, "b", value=10)],
            [_row(4, "a", value=3), _row(5, "b", value=20), _row(6, "b", value=30)],
            [_row(7, "a", value=4)],
        ],
    )
    got = run_stream(
        spark,
        src,
        lambda s: tws.count_window_sum_tws(s, "key", "ts", "value", 3),
        "append",
    ).collect()
    by_key = {(r.key, r.window_seq): (r.cnt, r.sum_value) for r in got}
    assert by_key[("a", 1)] == (3, 6.0)
    assert by_key[("b", 1)] == (3, 60.0)
    assert ("a", 2) not in by_key  # 4th a-row still buffered


def test_rocksdb_provider_stateful_equivalence(spark, tmp_path):
    # SURVEY §2.9 state backends: the RocksDB provider (the >heap
    # production backend, Flink's RocksDBStateBackend analog) must
    # produce the identical result as the default HDFS-backed provider
    # for the same stateful op — proven by running the count window
    # A/B under both providers
    from flink_tutorial_spark.streaming.stateful import count_window_sum

    src = str(tmp_path / "src")
    write_batches(
        src,
        [
            [_row(1, "a", value=1), _row(2, "a", value=2), _row(3, "b", value=10)],
            [_row(4, "a", value=3), _row(5, "b", value=20), _row(6, "b", value=30)],
            [_row(7, "a", value=4)],
        ],
    )

    def q(stream):
        return count_window_sum(stream, "key", "ts", "value", 3)

    results = {}
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        for label, provider in [
            ("hdfs", None),
            ("rocksdb", tws.ROCKSDB_PROVIDER),
        ]:
            if provider is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, provider)
            results[label] = sorted(
                (r.key, r.window_seq, r.cnt, r.sum_value)
                for r in run_stream(spark, src, q, "append").collect()
            )
    finally:
        spark.conf.unset(key) if prev is None else spark.conf.set(key, prev)
    assert results["rocksdb"] == results["hdfs"]
    assert results["rocksdb"], "stateful op should emit complete windows"
