"""Per-record transform wrappers (SURVEY.md §2.3) — the thin layer that
names each reference operator on top of DataFrame primitives.

map/filter/project are literally select/where (kept as documentation
aliases); flat_map and process cover the 1->N and arbitrary-logic cases
the reference implements with FlatMapFunction / ProcessFunction.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def map_rows(df: DataFrame, *exprs: Column) -> DataFrame:
    """map(MapFunction) — MapDemo.java:23-47: 1:1 record transform ==
    a projection; stays in whole-stage codegen."""
    return df.select(*exprs)


def flat_map(df: DataFrame, array_expr: Column, alias: str, keep: list[str] | None = None) -> DataFrame:
    """flatMap(FlatMapFunction) — FlatMapDemo.java:27-53: 1 -> 0..N via
    explode of an array-valued expression (split+filter in one)."""
    keep = keep or []
    return df.select(*keep, F.explode(array_expr).alias(alias))


def process(df: DataFrame, fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]], schema: StructType) -> DataFrame:
    """process(ProcessFunction) non-keyed — NokeyedProcessFunctionDemo.
    java:21-29: arbitrary per-record logic with full context. Spark-
    first: Arrow-batched mapInPandas (the ONLY sanctioned escape hatch
    to Python; everything expressible as columns should use map_rows)."""
    return df.mapInPandas(fn, schema)


def bucketize(col: Column, boundaries: list[float]) -> Column:
    """Value-binning chains — BMWMileAvgCount.scala:31-57: map a numeric
    column into bucket indexes 0..len(boundaries) via chained when()."""
    expr = F.when(col < boundaries[0], 0)
    for i in range(1, len(boundaries)):
        expr = expr.when(col < boundaries[i], i)
    return expr.otherwise(len(boundaries))
