"""Planted-graph tests for operators/graph.py (the catalog oracle test
covers the events-derived queries end-to-end; these pin the operator
semantics on graphs small enough to verify by hand)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_tutorial_spark.operators import graph as G


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src int, dst int, cnt long")


def test_transition_edges_order_selfloops_and_interleave(spark):
    t = datetime(2024, 1, 1)
    rows = [
        # user 1: 10 -> 10 (self-loop, dropped) -> 20 -> 10
        (1, t.replace(hour=1), 1, 10),
        (1, t.replace(hour=2), 2, 10),
        (1, t.replace(hour=3), 3, 20),
        (1, t.replace(hour=4), 4, 10),
        # user 2 interleaved in time with user 1: 20 -> 30
        (2, t.replace(hour=1, minute=30), 5, 20),
        (2, t.replace(hour=3, minute=30), 6, 30),
        # same-ts tie broken by event_id: 7 before 8 => 40 -> 50
        (3, t.replace(hour=5), 7, 40),
        (3, t.replace(hour=5), 8, 50),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, item int"
    )
    got = {
        (r.src, r.dst): r.cnt for r in G.transition_edges(ev).collect()
    }
    assert got == {(10, 20): 1, (20, 10): 1, (20, 30): 1, (40, 50): 1}


def test_pagerank_mass_and_hub_ordering(spark):
    # star: 1,2,3 all point at 4; 4 points back at 1 only
    e = _edges(
        spark,
        [(1, 4, 1), (2, 4, 1), (3, 4, 1), (4, 1, 1)],
    )
    out = {r.item_id: r for r in G.pagerank(e, iterations=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    # hub 4 collects from three sources; 1 collects only from 4;
    # 2 and 3 get base rank only and tie exactly (integer arithmetic)
    assert out[4].rank_fp > out[1].rank_fp > out[2].rank_fp
    assert out[2].rank_fp == out[3].rank_fp
    # no mass created: total <= 1.0 * scale (leakage from floor div only)
    total = sum(r.rank_fp for r in out.values())
    assert total <= G.PR_SCALE
    assert total >= G.PR_SCALE * 0.99  # no dangling nodes here
    # rank column is the 6-dp projection of rank_fp (half-away-from-zero,
    # matching Spark/DuckDB ROUND — python round() is half-even)
    import math

    for r in out.values():
        expect = math.floor(r.rank_fp / G.PR_SCALE * 1e6 + 0.5) / 1e6
        assert abs(r.rank - expect) < 1e-12


def test_pagerank_dangling_leaks_mass(spark):
    # 1 -> 2, 2 has no out-edges: 2's mass leaks each round
    e = _edges(spark, [(1, 2, 1)])
    out = {r.item_id: r.rank_fp for r in G.pagerank(e, iterations=3).collect()}
    assert sum(out.values()) < G.PR_SCALE


def test_triangle_stats_k4_and_square(spark):
    # K4 (complete on 4 nodes): 4 triangles, 12 wedges, clustering 1.0
    k4 = [(a, b, 2) for a in range(1, 5) for b in range(a + 1, 5)]
    und = spark.createDataFrame(k4, "a int, b int, w long")
    r = G.triangle_stats(und).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.global_clustering == 1.0
    # square (4-cycle): 4 wedges, 0 triangles
    sq = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 2), (3, 4, 2), (1, 4, 2)], "a int, b int, w long"
    )
    r = G.triangle_stats(sq).collect()[0]
    assert (r.n_wedges, r.n_triangles, r.global_clustering) == (4, 0, 0.0)


def test_undirected_edges_symmetrize_and_threshold(spark):
    e = _edges(spark, [(1, 2, 1), (2, 1, 1), (3, 4, 1)])
    got = {(r.a, r.b): r.w for r in G.undirected_edges(e, min_weight=2).collect()}
    # 1<->2 sums to 2 and survives; 3-4 at weight 1 is cut
    assert got == {(1, 2): 2}


def test_label_propagation_two_cliques_weak_bridge(spark):
    """Two weight-5 triangles joined by a weight-1 bridge resolve to
    two communities labeled by each clique's min node id; the bridge
    endpoints stay with their own clique."""
    tri1 = [(1, 2, 5), (2, 3, 5), (1, 3, 5)]
    tri2 = [(7, 8, 5), (8, 9, 5), (7, 9, 5)]
    bridge = [(3, 7, 1)]
    und = spark.createDataFrame(tri1 + tri2 + bridge, "a int, b int, w long")
    got = {r.item_id: r.community for r in G.label_propagation(und, 2).collect()}
    assert got[1] == got[2] == got[3]
    assert got[7] == got[8] == got[9]
    assert got[1] != got[7]


def test_label_propagation_deterministic_tie_break(spark):
    """Equal-weight neighbor labels: the smaller label wins (the
    determinism contract that makes LPA oracle-checkable)."""
    # node 5 sees labels 1 and 9 at equal weight -> adopts 1
    und = spark.createDataFrame(
        [(1, 5, 3), (5, 9, 3)], "a int, b int, w long"
    )
    got = {r.item_id: r.community for r in G.label_propagation(und, 1).collect()}
    assert got[5] == 1


def test_bfs_hops_chain_and_unreached(spark):
    """Hop distances on a directed chain with a shortcut: min wins;
    nodes beyond max_hops (or unreachable against edge direction) are
    absent."""
    e = _edges(
        spark,
        # 0 -> 1 -> 2 -> 3 -> 4 -> 5 (chain), plus shortcut 0 -> 3
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1), (0, 3, 1),
         # 9 -> 0: reachable only AGAINST direction from 0
         (9, 0, 1)],
    )
    got = {r.item_id: r.hops for r in G.bfs_hops(e, 0, max_hops=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3}
    # 9 unreachable (wrong direction); nothing beyond 4 hops needed here
    assert 9 not in got


def test_cheapest_paths_prefers_cheap_multihop(spark):
    """Bellman-Ford must pick a cheap 2-hop route over an expensive
    direct edge (where BFS would pick the direct one), carry exact
    integer costs, and leave unreachable nodes absent."""
    from flink_tutorial_spark.operators.graph import cheapest_paths

    # costs: w = ceil(1e6 / cnt). 0->1 cnt=1 (w=1e6); 0->2 cnt=100
    # (w=10000), 2->1 cnt=100 (w=10000): via 2 costs 20000 < 1e6.
    edges = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 100), (2, 1, 100), (3, 4, 50)],
        "src long, dst long, cnt long",
    )
    got = {r.item_id: r.cost_fp for r in cheapest_paths(edges, 0).collect()}
    assert got[0] == 0
    assert got[2] == 10_000
    assert got[1] == 20_000  # NOT the direct 1_000_000 edge
    assert 3 not in got and 4 not in got  # disconnected component
