"""Every registered catalog query hash-matches its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01 — this is the
fast local loop)."""

from __future__ import annotations

import pytest

from flink_tutorial_spark import plans
from tests.oracle_utils import run_and_compare


def _names():
    return sorted(plans.REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    problems = run_and_compare(spark, sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_simhash"])
def test_materialize_parquet_mode_matches_oracle(spark, sf_dir, name, monkeypatch):
    """VERDICT r17 #3: FTS_MATERIALIZE=parquet — the documented 100 TB
    deployment path for full-corpus signature tables (object-storage
    checkpoint instead of executor persist, operators/dedup.py
    materialize()) — must stay oracle-exact; without this test the
    branch is dead code in CI after the r17 default flipped to persist."""
    from flink_tutorial_spark.operators.dedup import purge_scratch

    monkeypatch.setenv("FTS_MATERIALIZE", "parquet")
    try:
        problems = run_and_compare(spark, sf_dir, name)
    finally:
        purge_scratch()
    assert not problems, f"{name} (parquet materialize): " + "; ".join(problems)
