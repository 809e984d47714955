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
