"""Window operators — tumbling / sliding / session, keyed and global.

Reference semantics (SURVEY.md §2.6):
- TumblingEventTimeWindows.of(n)  — EvenTimeTumblingWindowDemo.java:43
- SlidingEventTimeWindows.of(w,s) — HotItems.scala:50
- EventTimeSessionWindows.withGap — EventTimeSessionWindowDemo.java:43
- keyed `window(...)` vs global `windowAll(...)` — note/03.Window.md:20-70

Spark-first mapping: `F.window(ts, size, slide)` / `F.session_window(ts,
gap)` inside a groupBy — epoch-aligned, identical [start, end) semantics
to Flink's aligned windows. Aggregation is incremental (partial agg /
map-side combine) by design, matching the reference's `sum/reduce/
aggregate` incremental path rather than the buffer-all `apply` path.
A "global" window (Flink windowAll, parallelism 1) is simply a groupBy
with no key columns — Spark still computes it with partial aggregation
across all partitions, so it does NOT serialize onto one task.

Scale note: windowed groupBy shuffles on (window, key). With slide <<
size each row logically lands in size/slide windows, but the map-side
partial aggregation combines per (window, key) before the shuffle, so
the network volume is bounded by distinct groups, not input rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str | None = None,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    window_alias: str = "w",
) -> DataFrame:
    """Tumbling (slide=None) or sliding keyed/global window aggregation.

    Returns the window struct column `w` (fields start/end) plus keys
    plus aggregate columns; callers project/rename as needed.
    """
    keys = keys or []
    aggs = aggs or [F.count("*").alias("cnt")]
    win = F.window(ts_col, size, slide) if slide else F.window(ts_col, size)
    return df.groupBy(win.alias(window_alias), *keys).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str | Column,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    window_alias: str = "w",
) -> DataFrame:
    """Session windows with static or dynamic (per-row expression) gap.

    Dynamic gap ≈ ProcessingTimeSessionWindows.withDynamicGap
    (ProcessingTimeSessionWindowDemo.java:43): pass a Column for `gap`.
    Session merging is a built-in physical operator (no state UDF).
    """
    keys = keys or []
    aggs = aggs or [F.count("*").alias("cnt")]
    return df.groupBy(F.session_window(ts_col, gap).alias(window_alias), *keys).agg(*aggs)
