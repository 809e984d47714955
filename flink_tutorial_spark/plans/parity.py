"""Cross-engine float-determinism helpers shared by the catalog plans.

Double summation is order-dependent; Spark's partial aggregation and
DuckDB's sequential scan can land a sum on opposite sides of a rounding
boundary (the flake ADVICE.md r1 flagged). The fix mirrors the TPC-H
`_dec` pattern: cast each element to DECIMAL once (deterministic — no
binary double sits exactly on a decimal rounding boundary, since that
would need a factor of 5^k in the denominator), sum in the decimal
domain (order-independent), round there, and only then cast to double.

DECIMAL(18,6) keeps 6 fractional digits per element; the rounded sum at
scale 4 stays far below 2^53 when integer-scaled, so the final
decimal->double cast is exact in both engines (see memory: decimal cast
trap).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dec_sum(col: str, scale: int = 4) -> F.Column:
    """Order-independent double sum: sum as DECIMAL(18,6), round, cast."""
    return (
        F.round(F.sum(F.col(col).cast("decimal(18,6)")), scale).cast("double")
    )


def dec_avg(col: str, scale: int = 4) -> F.Column:
    """Deterministic avg: exact decimal sum -> double, one IEEE divide."""
    return F.round(
        F.sum(F.col(col).cast("decimal(18,6)")).cast("double") / F.count("*"),
        scale,
    )


def dec_sum_sql(col: str, scale: int = 4) -> str:
    """DuckDB twin of dec_sum (bit-identical result)."""
    return f"CAST(round(sum(CAST({col} AS DECIMAL(18,6))), {scale}) AS DOUBLE)"


def dec_avg_sql(col: str, scale: int = 4) -> str:
    """DuckDB twin of dec_avg."""
    return (
        f"round(CAST(sum(CAST({col} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count(*), {scale})"
    )
