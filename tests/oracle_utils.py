"""Order-insensitive DataFrame-vs-DuckDB comparison, mirroring the
driver's t2 gate (row-count + schema + value-hash, columns sorted by
name). Floats are rounded before comparison; queries are expected to
round unstable float aggregates themselves so engine-vs-oracle sums
agree bit-wise after rounding."""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            # duckdb may hand back Decimal/hugeint as object
            df[c] = df[c].apply(
                lambda v: float(v) if isinstance(v, (int,)) or _is_decimal(v) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _is_decimal(v) -> bool:
    import decimal

    return isinstance(v, decimal.Decimal)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = pd.to_numeric(sv, errors="coerce")
            oa = pd.to_numeric(ov, errors="coerce")
            bad = ~(
                (sa.isna() & oa.isna())
                | (abs(sa - oa) <= 1e-6 + 1e-6 * abs(oa).fillna(0))
            )
            if bad.any():
                i = bad.idxmax()
                problems.append(f"col {c}: first float mismatch at row {i}: {sv[i]!r} vs {ov[i]!r}")
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(f"col {c}: first mismatch at row {i}: {sv[i]!r} vs {ov[i]!r}")
    return problems


def run_and_compare(spark, sf_dir: str, name: str) -> list[str]:
    """Run catalog query `name` in Spark and its oracle in DuckDB."""
    from flink_tutorial_spark import plans

    spec = plans.REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only check: the query must execute, produce a non-empty
        # schema, and (for this test corpus) at least one row
        problems = []
        if len(spark_pdf.columns) == 0:
            problems.append("empty schema")
        if len(spark_pdf) == 0:
            problems.append("rows-only query returned 0 rows")
        return problems
    con = duckdb_connect(sf_dir)
    try:
        oracle_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
