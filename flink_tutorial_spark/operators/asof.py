"""As-of (temporal) join — the operator Flink exposes as temporal table
joins / `FOR SYSTEM_TIME AS OF` (and TxMatchWithJoin.scala:38-54
approximates with an interval join): each left row picks the LATEST
right row with right_ts <= left_ts per key.

Spark has no built-in as-of join; the scalable formulation is the
union + last-ignorenulls window trick — NO join at all:

  1. tag both sides, union them on (keys, ts, side, payload-struct)
  2. one window per key ordered by (ts, side, tie-break) carries the
     most recent right payload forward (last, ignorenulls)
  3. keep left rows, unpack the carried payload

One shuffle total (the key partition), versus a key+bucket equi-join
plus per-row max-subselect for the naive form. At 100 TB this is the
difference between a sort within each key partition and an exploding
range join: cost is O(rows log rows-per-key) with NO candidate-pair
blowup for hot keys, skew handled by AQE exactly like any other single
window. The same shape serves last-touch attribution, slowly-changing-
dimension lookups, and sensor forward-fill.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: every left row + the latest right row
    with ``right_ts <= left_ts`` on the ``on`` keys (NULLs when no such
    row). Ties at equal right_ts resolve to the greatest
    ``right_order`` tuple (pass e.g. ["event_id"] to make the pick
    deterministic — REQUIRED for oracle-exactness if right rows can
    share a timestamp). ``tolerance`` (a day-time interval Column)
    drops matches older than ``left_ts - tolerance``.

    Right payload columns come back suffixed; the right's ts column is
    ``right_ts + suffix``."""
    right_order = right_order or []
    payload_cols = [c for c in right.columns if c not in on]
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_o_{c}") for c in right_order],
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols)
            + ">"
        )
        .alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_o_{c}") for c in right_order],
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns)
            + ">"
        )
        .alias("_row"),
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # same-instant right row is visible to the left row — the <= contract.
    order = ["_ts", "_side"] + [f"_o_{c}" for c in right_order]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "_carried", F.last("_payload", ignorenulls=True).over(w)
    )
    out = filled.where(F.col("_side") == 1)
    if tolerance is not None:
        # the carried right ts must sit inside [left_ts - tolerance, left_ts]
        out = out.withColumn(
            "_carried",
            F.when(
                F.col(f"_carried.{right_ts}") >= F.col("_ts") - tolerance,
                F.col("_carried"),
            ),
        )
    return out.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_carried.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
