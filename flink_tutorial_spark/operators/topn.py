"""Top-N ranking operators.

Reference semantics: hot-items Top-N (HotItems.scala:47-136 — sliding
window count, keyBy(windowEnd), ListState buffer, onTimer sort + take N)
and hot-URLs with late updates (NetworkFlow.scala:49-148).

Spark-first: the whole ListState+timer dance collapses into a window
aggregation followed by `row_number() OVER (PARTITION BY window ORDER BY
cnt DESC)`. Catalyst plans the ranking as a single shuffle on the window
key; no per-key buffering code.

Determinism: ties are broken by the item key ascending so results are
stable across engines (the reference's sort is not tie-stable either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    n: int,
    tiebreak_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-n rows per partition ordered by order_col desc.

    Scale note: row_number over a window is a single hash shuffle on
    partition_cols + per-partition sort; with AQE this handles skewed
    windows. For huge N-per-group workloads prefer a pre-aggregation to
    cut rows before ranking (callers here always rank post-agg counts).
    """
    tiebreak = tiebreak_cols or []
    w = Window.partitionBy(*partition_cols).orderBy(
        F.desc(order_col), *[F.asc(c) for c in tiebreak]
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
