"""Graph analytics operators over event-derived graphs.

The reference ships one graph-shaped computation (the iterative
min-label loop behind its dedup clustering; see `operators/dedup.py`
connected_components and IterateDemo.java:22-52 for the iteration
contract). This module rounds that out with the two classic
whole-graph operators every large-scale log/link pipeline runs:
weighted PageRank and triangle counting, both expressed as driver-
controlled loops / joins over plain DataFrames — the canonical way
Spark runs iterative graph algorithms (GraphX/Pregel is the same
join-aggregate loop under the hood).

Cross-engine determinism: PageRank is computed in FIXED-POINT integer
arithmetic (rank scaled by 1e9, integer `div` at every step — the
same quantization trick as `queries_datapipe.embedding_kmeans_assign`).
Integer sums are order-independent, so the result is bit-exact in any
engine and any partitioning, which is what lets a DuckDB oracle
hash-match a distributed float-free PageRank.
"""

from __future__ import annotations

from flink_tutorial_spark import plan_capture
from pyspark.sql import DataFrame, functions as F

#: fixed-point scale for PageRank ranks (1.0 == 1e9 units). At this
#: scale rank*edge-weight products stay far below 2^63 for edge
#: weights up to ~1e9 per edge (rank mass <= 1e9 total).
PR_SCALE = 10**9


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    ts_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Directed item-transition (clickstream Markov) edges: for every
    user's event stream in (ts, event_id) order, each consecutive
    item pair contributes one unit to edge prev_item -> item
    (self-loops dropped). Returns (src, dst, cnt).

    Scale shape: one window over the user partitioning (the same
    shuffle every per-user sessionization query pays), then a
    partial-aggregable groupBy(src, dst) — edge count is bounded by
    |items|^2, not by events."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in ts_cols])
    seq = events.select(
        F.col(user_col),
        F.col(item_col).alias("_item"),
        F.lag(item_col).over(w).alias("_prev"),
    )
    return (
        seq.where(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_item")))
        .groupBy(F.col("_prev").alias("src"), F.col("_item").alias("dst"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Weighted PageRank over (src, dst, cnt) edges, `iterations`
    synchronous rounds in fixed-point integer arithmetic:

        contrib(e)  = (r(src) * cnt) div out_weight(src)
        r'(v)       = (15 * scale) div (100 * N)
                      + (damping_pct * sum(contrib)) div 100

    Dangling nodes (no out-edges) simply leak their mass — the
    standard simplified formulation. Returns (item_id, rank_fp, rank)
    where rank = rank_fp / scale rounded to 6 dp.

    Scale shape: the per-iteration work is one join of the rank table
    against the edge table on src (shuffle on item id; AQE handles
    skewed hubs) and one partial-aggregable groupBy(dst). The edge
    table with its out-weights is computed ONCE and cached — only the
    small rank table moves between iterations; the driver holds a
    single scalar (N), never rows. Lineage stays flat (each round
    localCheckpoints the rank table), the same guard the dedup
    connected-components loop uses."""
    outw = edges.groupBy("src").agg(F.sum("cnt").alias("w"))
    e = edges.join(outw, "src").select("src", "dst", "cnt", "w")
    nodes = (
        edges.select(F.col("src").alias("item"))
        .unionByName(edges.select(F.col("dst").alias("item")))
        .distinct()
    )
    e = e.persist()
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        out = nodes.select(
            F.col("item").alias("item_id"),
            F.lit(0).cast("long").alias("rank_fp"),
            F.lit(0.0).alias("rank"),
        )
        e.unpersist()
        nodes.unpersist()
        return out
    base = 15 * scale // (100 * n)
    ranks = nodes.select("item", F.lit(scale // n).cast("long").alias("r"))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.item)
            .select(
                F.col("dst").alias("item"),
                F.expr("r * cnt div w").alias("c"),
            )
            .groupBy("item")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "item", "left").select(
            "item",
            (
                F.lit(base).cast("long")
                + F.expr(f"{damping_pct} * coalesce(s, 0L) div 100")
            ).alias("r"),
        )
        # checkpoint EVERY round (incl. the last): truncates lineage and
        # lets the returned plan depend only on the materialized rank
        # table, so unpersisting e/nodes below costs no recompute
        ranks = plan_capture.checkpoint(ranks, "ckpt:pagerank")
    out = ranks.select(
        F.col("item").alias("item_id"),
        F.col("r").alias("rank_fp"),
        F.round(F.col("r") / F.lit(float(scale)), 6).alias("rank"),
    )
    e.unpersist()
    nodes.unpersist()
    return out


def undirected_edges(edges: DataFrame, min_weight: int = 2) -> DataFrame:
    """Symmetrize directed (src, dst, cnt) edges: undirected weight is
    the sum of both directions' counts; keep pairs with weight >=
    min_weight. Returns (a, b, w) with a < b."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("cnt"),
        )
        .groupBy("a", "b")
        .agg(F.sum("cnt").cast("long").alias("w"))
        .where(F.col("w") >= min_weight)
    )


def triangle_stats(und: DataFrame) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected (a, b, w) edge set. Single-row result:
    (n_nodes, n_edges, n_wedges, n_triangles, global_clustering).

    Scale shape — degree-ordered orientation (the trick that makes
    distributed triangle counting survive power-law graphs): every
    edge is directed from its lower-(degree, id) endpoint to the
    higher one, which bounds any vertex's out-degree by O(sqrt(m));
    candidate wedges come from a self-join of the ORIENTED edge list
    on the shared source (never the raw adjacency, whose hub wedges
    explode as deg^2), and each triangle is counted exactly once at
    its minimum-order vertex. The closing-edge check is an equi-join
    on the oriented pair. n_wedges (open+closed triads, sum over
    C(deg,2)) comes from the degree table alone."""
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    # monotone composite order key (deg, id) -> single BIGINT: ids are
    # item ids < 2^31 by contract
    okey = (F.col("deg") * F.lit(2**32) + F.col("v")).alias("ok")
    degk = deg.select("v", "deg", okey)
    ed = (
        und.join(degk.select(F.col("v").alias("a"), F.col("ok").alias("ok_a")), "a")
        .join(degk.select(F.col("v").alias("b"), F.col("ok").alias("ok_b")), "b")
        .select(
            F.when(F.col("ok_a") < F.col("ok_b"), F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(F.col("ok_a") < F.col("ok_b"), F.col("b")).otherwise(F.col("a")).alias("x"),
            F.when(F.col("ok_a") < F.col("ok_b"), F.col("ok_b")).otherwise(F.col("ok_a")).alias("ok_x"),
        )
    )
    e1 = ed.select(F.col("u"), F.col("x").alias("p"), F.col("ok_x").alias("ok_p"))
    e2 = ed.select(F.col("u"), F.col("x").alias("q"), F.col("ok_x").alias("ok_q"))
    wedges = e1.join(e2, "u").where(F.col("ok_p") < F.col("ok_q"))
    closing = ed.select(F.col("u").alias("p"), F.col("x").alias("q"))
    tri = wedges.join(closing, ["p", "q"]).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    stats = (
        und.agg(F.count("*").cast("long").alias("n_edges"))
        .crossJoin(
            deg.agg(
                F.count("*").cast("long").alias("n_nodes"),
                F.sum(F.expr("deg * (deg - 1) div 2")).cast("long").alias("n_wedges"),
            )
        )
        .crossJoin(tri)
    )
    return stats.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.lit(3) * F.col("n_triangles") / F.greatest(F.col("n_wedges"), F.lit(1)),
            6,
        ).alias("global_clustering"),
    )


def label_propagation(und: DataFrame, iterations: int = 2) -> DataFrame:
    """Deterministic synchronous label propagation (community
    detection) over an undirected (a, b, w) edge set: labels start as
    node ids; each round every node adopts the label with the highest
    total incident edge weight among its neighbors, ties broken by
    smallest label — the deterministic variant of LPA (classic LPA's
    random tie-breaks can't be oracle-checked; weight-then-min-label
    gives identical results in any engine). Isolated-from-update nodes
    keep their label. Returns (item_id, community) after ``iterations``
    synchronous rounds.

    Scale shape: per round one equi-join of the label table against the
    symmetrized adjacency (shuffle on node id) + one partial-aggregable
    groupBy(node, label) + a per-node top-1 window — the same
    join-aggregate loop as pagerank, label table localCheckpointed per
    round to keep lineage flat."""
    from pyspark.sql import Window

    adj = und.select(
        F.col("a").alias("node"), F.col("b").alias("nbr"), "w"
    ).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"), "w")
    )
    # EAGER checkpoint, not lazy persist: the first loop action references
    # adj through several branches at once, and concurrent cache
    # population re-runs the (data-sized) edge build per branch — measured
    # 2.9s -> 24.8s at sf1 before this. After the checkpoint every round
    # touches only the materialized |edges|-sized table.
    adj = plan_capture.checkpoint(adj, "ckpt:lpa_adj")
    nodes = plan_capture.checkpoint(adj.select("node").distinct(), "ckpt:lpa_nodes")
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(iterations):
        nb = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "lbl"), "nbr"
            )
            .groupBy("node", "lbl")
            .agg(F.sum("w").alias("wt"))
        )
        pick = (
            nb.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("node").orderBy(
                        F.col("wt").desc(), F.col("lbl")
                    )
                ),
            )
            .where(F.col("rk") == 1)
            .select("node", "lbl")
        )
        labels = plan_capture.checkpoint(
            nodes.join(pick, "node", "left").select(
                "node", F.coalesce("lbl", "node").alias("lbl")
            ),
            "ckpt:lpa_labels",
        )
    return labels.select(
        F.col("node").cast("long").alias("item_id"),
        F.col("lbl").cast("long").alias("community"),
    )


def bfs_hops(edges: DataFrame, source_item: int, max_hops: int = 4) -> DataFrame:
    """Single-source hop distances (BFS) over directed (src, dst, cnt)
    edges, `max_hops` synchronous frontier rounds: dist starts {source:
    0}; each round adds every destination reachable from the current
    table at +1 hop and keeps the per-node minimum. Nodes unreached
    within the bound are absent (a production run raises the bound or
    switches to iterate-until-fixpoint with the same loop body).
    Returns (item_id, hops).

    Scale shape: the classic Pregel/frontier loop — per round one
    equi-join of the dist table against the cached edge list (shuffle
    on item id) + one partial-aggregable min-groupBy; dist is
    localCheckpointed per round (flat lineage). Integer hop counts, so
    the result is bit-exact against an unrolled-CTE oracle."""
    e = plan_capture.checkpoint(edges.select("src", "dst"), "ckpt:bfs_edges")
    dist = e.sparkSession.createDataFrame(
        [(source_item, 0)], "item int, hops int"
    )
    for _ in range(max_hops):
        step = (
            e.join(dist, e.src == dist.item)
            .select(F.col("dst").alias("item"), (F.col("hops") + 1).alias("hops"))
        )
        dist = plan_capture.checkpoint(
            dist.unionByName(step).groupBy("item").agg(F.min("hops").alias("hops")),
            "ckpt:bfs_dist",
        )
    return dist.select(
        F.col("item").cast("long").alias("item_id"),
        F.col("hops").cast("long").alias("hops"),
    )


def cheapest_paths(
    edges: DataFrame, source_item: int, rounds: int = 4
) -> DataFrame:
    """Single-source CHEAPEST paths (Bellman-Ford) over directed
    (src, dst, cnt) edges — the weighted sibling of bfs_hops: edge cost
    is the integer fixed-point ceil(1e6 / cnt) ("popular transitions
    are cheap"), so the minimum-cost route prefers well-trodden paths.
    `rounds` synchronous relaxations bound the path length, exactly the
    iterate contract bfs_hops/pagerank use; nodes unreached within the
    bound are absent. Returns (item_id, cost_fp, cost).

    All-integer arithmetic (the ceil is computed with integer div, not
    a double round-trip), so the distributed loop is bit-exact against
    an unrolled-CTE oracle. Scale shape identical to bfs_hops: per
    round one equi-join against the cached weighted edge list + one
    partial-aggregable min-groupBy, dist localCheckpointed per round;
    the edge table never moves."""
    e = plan_capture.checkpoint(
        edges.selectExpr("src", "dst", "div(1000000 + cnt - 1, cnt) AS w"),
        "ckpt:cheapest_edges",
    )
    dist = e.sparkSession.createDataFrame(
        [(source_item, 0)], "item long, cost_fp long"
    )
    for _ in range(rounds):
        step = e.join(dist, e.src == dist.item).select(
            F.col("dst").alias("item"),
            (F.col("cost_fp") + F.col("w")).alias("cost_fp"),
        )
        dist = plan_capture.checkpoint(
            dist.unionByName(step)
            .groupBy("item")
            .agg(F.min("cost_fp").alias("cost_fp")),
            "ckpt:cheapest_dist",
        )
    return dist.select(
        F.col("item").cast("long").alias("item_id"),
        F.col("cost_fp").cast("long").alias("cost_fp"),
        F.round(F.col("cost_fp") / 1000000.0, 6).alias("cost"),
    )
