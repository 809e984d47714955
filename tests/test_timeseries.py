"""Planted-data tests for queries_timeseries: the sf catalog oracle
test covers the happy path; these pin the branches the synthetic data
doesn't exercise (leading gaps before a key's first observation, SCD2
consecutive-repeat compression)."""

from __future__ import annotations

import json
from datetime import datetime

from flink_tutorial_spark.plans.queries_timeseries import (
    scd2_item_intervals,
    timeseries_gap_fill,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_gap_fill_forward_and_leading_null(spark, tmp_path):
    t = datetime(2024, 3, 1)
    rows = [
        # type 'a': hours 0 and 3; hours 1-2 are gaps carrying hour-0 avg
        (1, t.replace(hour=0), 1, "a", 10.0, "{}"),
        (2, t.replace(hour=0), 1, "a", 20.0, "{}"),
        (3, t.replace(hour=3), 1, "a", 50.0, "{}"),
        # type 'b': first data at hour 2 -> hours 0-1 have NO fill source
        (4, t.replace(hour=2), 2, "b", 7.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        (r.event_type, r.bucket.hour): r
        for r in timeseries_gap_fill(spark, sf_dir).collect()
    }
    assert len(out) == 8  # 2 keys x hours 0..3
    a0, a1, a2, a3 = (out[("a", h)] for h in range(4))
    assert (a0.filled, a0.n_events, a0.avg_value) == (False, 2, 15.0)
    assert (a1.filled, a1.n_events, a1.avg_value) == (True, 0, 15.0)
    assert (a2.filled, a2.n_events, a2.avg_value) == (True, 0, 15.0)
    assert (a3.filled, a3.n_events, a3.avg_value) == (False, 1, 50.0)
    b0, b1, b2 = (out[("b", h)] for h in range(3))
    # leading gaps: filled=True but no value available yet
    assert b0.filled and b0.avg_value is None and b0.n_events == 0
    assert b1.filled and b1.avg_value is None
    assert (b2.filled, b2.n_events, b2.avg_value) == (False, 1, 7.0)


def test_scd2_compresses_repeats_and_versions(spark, tmp_path):
    t = datetime(2024, 3, 1)
    k = lambda v: json.dumps({"k": v})
    rows = [
        # user 1 item history: 5, 5 (repeat, compressed), 7, 5
        (1, t.replace(hour=1), 1, "view", 0.0, k(5)),
        (2, t.replace(hour=2), 1, "view", 0.0, k(5)),
        (3, t.replace(hour=3), 1, "view", 0.0, k(7)),
        (4, t.replace(hour=4), 1, "view", 0.0, k(5)),
        # user 2: single item -> one open interval
        (5, t.replace(hour=1), 2, "view", 0.0, k(9)),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = sorted(
        scd2_item_intervals(spark, sf_dir).collect(),
        key=lambda r: (r.user_id, r.version),
    )
    u1 = [r for r in got if r.user_id == 1]
    assert [(r.item_id, r.version, r.is_current) for r in u1] == [
        (5, 1, False),
        (7, 2, False),
        (5, 3, True),
    ]
    # intervals chain: each effective_to equals the next effective_from
    assert u1[0].effective_to == u1[1].effective_from
    assert u1[1].effective_to == u1[2].effective_from
    assert u1[2].effective_to is None
    (u2,) = [r for r in got if r.user_id == 2]
    assert (u2.item_id, u2.version, u2.is_current) == (9, 1, True)
    assert u2.effective_to is None
