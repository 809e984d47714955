"""Query catalog — the single source of truth for the engine's surface.

Every operator/query from SURVEY.md §2 that the engine implements is
registered here as a named QuerySpec:

- ``fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation
- ``oracle``                          — equivalent DuckDB SQL (None for
  genuinely non-SQL-expressible ops; those get a rows-only check)

``__spark_entry__.py`` (the driver contract) and the pytest oracle suite
both read this registry, so a query is tested the moment it's registered.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a catalog query. The decorated fn takes (spark, sf_dir)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
