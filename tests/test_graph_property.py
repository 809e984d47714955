"""Property tests for operators/graph.py: on random small graphs the
distributed fixed-point PageRank must equal an independent pure-python
reference (same integer arithmetic, different code path), and the
oriented triangle count must equal brute force over all vertex
triples. Mirrors the CEP-vs-reference-NFA property-test convention
(tests/test_cep_vectorized.py)."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_tutorial_spark.operators import graph as G

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=16,
).map(
    # collapse duplicate (src, dst) pairs (the operator contract takes an
    # aggregated edge list) and drop self-loops
    lambda es: sorted(
        {
            (s, d): sum(c for s2, d2, c in es if (s2, d2) == (s, d))
            for s, d, _ in es
            if s != d
        }.items()
    )
)


def _ref_pagerank(pairs, iterations=3, scale=G.PR_SCALE):
    """Independent reference: plain dict arithmetic, same fixed point."""
    edges = [(s, d, c) for (s, d), c in pairs]
    if not edges:
        return {}
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, c in edges:
        outw[s] = outw.get(s, 0) + c
    n = len(nodes)
    base = 15 * scale // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        acc = {}
        for s, d, c in edges:
            acc[d] = acc.get(d, 0) + (r[s] * c) // outw[s]
        r = {v: base + (85 * acc.get(v, 0)) // 100 for v in nodes}
    return r


@pytest.mark.slow
@given(pairs=edges_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_pagerank_matches_pure_python_reference(spark, pairs):
    if not pairs:
        return
    e = spark.createDataFrame(
        [(s, d, c) for (s, d), c in pairs], "src int, dst int, cnt long"
    )
    got = {r.item_id: r.rank_fp for r in G.pagerank(e, iterations=3).collect()}
    assert got == _ref_pagerank(pairs)


@pytest.mark.slow
@given(pairs=edges_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_triangle_count_matches_brute_force(spark, pairs):
    und = sorted({(min(s, d), max(s, d)) for (s, d), _ in pairs})
    if not und:
        return
    df = spark.createDataFrame(
        [(a, b, 2) for a, b in und], "a int, b int, w long"
    )
    r = G.triangle_stats(df).collect()[0]
    es = set(und)
    nodes = sorted({v for e in und for v in e})
    brute = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in es and (y, z) in es and (x, z) in es
    )
    assert r.n_triangles == brute
    assert r.n_edges == len(und) and r.n_nodes == len(nodes)
