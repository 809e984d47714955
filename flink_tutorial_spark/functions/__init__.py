"""User-defined function surface (SURVEY.md §2.12).

The reference's "UDF surface" is its function-interface family —
Map/FlatMap/Filter/Reduce lambdas, AggregateFunction UDAFs
(java/.../function/AggregateFunctionDemo.java:30-62), and RichXxx
variants with an open()/close() lifecycle
(note/01.Souce_and_Sink.md:199-206). Spark's mapping, demonstrated
here with working implementations rather than a table of names:

- scalar lambdas    -> stay JVM-side as column expressions (the engine
                       rule: no Python in relational plans); when user
                       Python is genuinely needed, `pandas_udf` (Arrow).
- AggregateFunction -> `pandas_udf` GROUPED_AGG (`weighted_avg_udaf`):
                       whole-group Arrow batch in, scalar out, usable
                       inside groupBy(...).agg(...) like any builtin.
- RichFunction      -> `rich_map_in_pandas`: open() runs once per
                       partition before the first batch, close() after
                       the last — the Flink operator lifecycle mapped
                       onto the mapInPandas iterator contract.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg_udaf(values: pd.Series, weights: pd.Series) -> float:
    """GROUPED_AGG UDAF: weighted average, exact and order-independent.

    The Flink analog accumulates (sum, count) in an ACC class
    (AggregateFunctionDemo.java:30-62); here the whole group arrives as
    one Arrow batch. Both inputs are 2-dp decimals by contract, so they
    scale exactly to int64 — the two sums are exact integers and every
    engine (and every partial-aggregation order) computes the identical
    double ratio, which keeps the UDAF oracle-checkable bit-exactly.

    Rounding is half-away-from-zero on both the input scaling and the
    result, matching SQL round() tie-breaking (np.rint/Python round are
    half-to-even — divergent exactly on .5 boundaries)."""
    import numpy as np

    def half_away(x: "np.ndarray") -> "np.ndarray":
        return np.copysign(np.floor(np.abs(x) + 0.5), x)

    v = half_away(values.to_numpy(dtype="float64") * 100).astype("int64")
    w = half_away(weights.to_numpy(dtype="float64") * 100).astype("int64")
    den = int(w.sum())
    if den == 0:
        return float("nan")
    r = float(int((v * w).sum()) / (100.0 * den))
    return float(np.copysign(np.floor(abs(r) * 1e6 + 0.5) / 1e6, r))


def rich_map_in_pandas(
    df: DataFrame,
    schema,
    open_fn: Callable[[], Any],
    map_fn: Callable[[Any, pd.DataFrame], pd.DataFrame],
    close_fn: Callable[[Any], None] | None = None,
) -> DataFrame:
    """RichMapFunction lifecycle over mapInPandas: `open_fn` builds the
    per-partition resource (connection, model, ...) once before the
    first Arrow batch, `map_fn(resource, batch)` transforms each batch,
    `close_fn(resource)` runs after the last — exactly open()/map()/
    close() of the reference's Rich functions, without per-row cost."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resource = open_fn()
        try:
            for pdf in batches:
                yield map_fn(resource, pdf)
        finally:
            if close_fn is not None:
                close_fn(resource)

    return df.mapInPandas(run, schema)
