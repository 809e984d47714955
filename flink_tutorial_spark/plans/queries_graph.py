"""Graph-analytics catalog queries over the clickstream transition
graph (events.props.k as the item/page id — the same id every hot-item
query uses).

The reference's only graph computation is the iterative feedback loop
(IterateDemo.java:22-52) already generalized by dedup's
connected-components; these queries add the other two whole-graph
operators a production log pipeline runs on the same edges: weighted
PageRank (fixed-point, bit-exact cross-engine) and exact triangle
counting with degree-ordered orientation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_tutorial_spark.operators import graph as G
from flink_tutorial_spark.plans.catalog import query
from flink_tutorial_spark.session import load_table

#: shared oracle CTE: directed transition edges from per-user
#: consecutive-event pairs (self-loops dropped)
_EDGES = """
ev AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item,
         ts, event_id
  FROM events
), seq AS (
  SELECT user_id, item,
         lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM ev
), edges AS (
  SELECT prev AS src, item AS dst, CAST(count(*) AS BIGINT) AS cnt
  FROM seq WHERE prev IS NOT NULL AND prev <> item
  GROUP BY 1, 2
)"""


def _events_with_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    )


@query(
    "graph_transitions",
    oracle=f"""
WITH {_EDGES}
SELECT src, dst, cnt FROM edges
""",
    tags=("graph", "window"),
)
def graph_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream Markov edges: per-user consecutive item transitions
    counted into a directed weighted edge list — the input table for
    every downstream graph op (and a first-class 'path analysis'
    deliverable on its own: P(next page | page) is cnt / out-weight).
    One user-partition window + one partial-aggregable groupBy."""
    return G.transition_edges(_events_with_item(spark, sf_dir))


_PR_ITER = """
c{i} AS (
  SELECT e.dst AS item, sum((r.r * e.cnt) // o.w) AS s
  FROM edges e JOIN r{p} r ON e.src = r.item JOIN outw o ON e.src = o.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT nodes.item,
         CAST((15::BIGINT * 1000000000) // (100 * (SELECT n FROM n))
              + (85 * COALESCE(c{i}.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN c{i} ON nodes.item = c{i}.item
)"""


@query(
    "graph_pagerank",
    oracle=f"""
WITH {_EDGES},
outw AS (SELECT src, sum(cnt) AS w FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT src AS item FROM edges
  UNION SELECT DISTINCT dst FROM edges
),
n AS (SELECT count(*) AS n FROM nodes),
r0 AS (
  SELECT item, CAST(1000000000 // (SELECT n FROM n) AS BIGINT) AS r FROM nodes
),
{",".join(_PR_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))}
SELECT item AS item_id, r AS rank_fp, round(r / 1000000000.0, 6) AS rank
FROM r3
""",
    tags=("graph", "iterate"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, 3 synchronous rounds, FIXED-POINT integer
    arithmetic (scale 1e9, integer div everywhere) so the distributed
    result is bit-exact against the unrolled-CTE oracle — integer sums
    are order-independent, floats are not. Per round: one edge-table
    join on src + one partial-aggregable groupBy(dst); the cached edge
    table never moves, only the rank table does. See
    operators/graph.py:pagerank for the 100-TB shape notes."""
    return G.pagerank(G.transition_edges(_events_with_item(spark, sf_dir)))


@query(
    "graph_triangle_stats",
    oracle=f"""
WITH {_EDGES},
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         CAST(sum(cnt) AS BIGINT) AS w
  FROM edges GROUP BY 1, 2 HAVING sum(cnt) >= 2
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS v FROM und UNION ALL SELECT b FROM und
  ) GROUP BY v
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3
    ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       tri.n_triangles,
       round(3 * tri.n_triangles /
             greatest((SELECT sum(deg * (deg - 1) // 2) FROM deg), 1), 6)
           AS global_clustering
FROM tri
""",
    tags=("graph", "join"),
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient on the
    symmetrized transition graph (undirected weight >= 2). The Spark
    plan uses degree-ordered orientation (out-degree bounded by
    O(sqrt(m)) — the standard distributed-triangle trick for power-law
    hubs); the oracle is the naive ordered 3-way join, which counts
    the identical set. Single-row output."""
    und = G.undirected_edges(
        G.transition_edges(_events_with_item(spark, sf_dir)), min_weight=2
    )
    return G.triangle_stats(und)


_LPA_ITER = """
nb{i} AS (
  SELECT a.node, l.lbl, sum(a.w) AS wt
  FROM adj a JOIN l{p} l ON a.nbr = l.node
  GROUP BY 1, 2
), pick{i} AS (
  SELECT node, lbl,
         row_number() OVER (PARTITION BY node ORDER BY wt DESC, lbl) AS rk
  FROM nb{i}
), l{i} AS (
  SELECT n.node, COALESCE(p.lbl, n.node) AS lbl
  FROM nodes n LEFT JOIN (SELECT node, lbl FROM pick{i} WHERE rk = 1) p
    ON n.node = p.node
)"""


@query(
    "graph_communities",
    oracle=f"""
WITH {_EDGES},
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         CAST(sum(cnt) AS BIGINT) AS w
  FROM edges GROUP BY 1, 2 HAVING sum(cnt) >= 2
),
adj AS (
  SELECT a AS node, b AS nbr, w FROM und
  UNION ALL SELECT b, a, w FROM und
),
nodes AS (SELECT DISTINCT node FROM adj),
l0 AS (SELECT node, node AS lbl FROM nodes),
{",".join(_LPA_ITER.format(i=i, p=i - 1) for i in (1, 2))}
SELECT CAST(node AS BIGINT) AS item_id, CAST(lbl AS BIGINT) AS community
FROM l2
""",
    tags=("graph", "iterate"),
)
def graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via DETERMINISTIC synchronous label
    propagation (2 rounds) on the symmetrized transition graph: each
    node adopts its neighbors' weight-heaviest label, ties to the
    smallest label — the tie-break that makes LPA oracle-checkable
    (classic random-LPA is not). Same join-aggregate round shape as
    graph_pagerank; see operators/graph.py:label_propagation."""
    und = G.undirected_edges(
        G.transition_edges(_events_with_item(spark, sf_dir)), min_weight=2
    )
    return G.label_propagation(und, iterations=2)


_BFS_ITER = """
d{i} AS (
  SELECT item, min(hops) AS hops FROM (
    SELECT item, hops FROM d{p}
    UNION ALL
    SELECT e.dst AS item, d.hops + 1 AS hops
    FROM edges e JOIN d{p} d ON e.src = d.item
  ) GROUP BY item
)"""


@query(
    "graph_bfs_hops",
    oracle=f"""
WITH {_EDGES},
d0 AS (SELECT 0 AS item, 0 AS hops),
{",".join(_BFS_ITER.format(i=i, p=i - 1) for i in (1, 2, 3, 4))}
SELECT CAST(item AS BIGINT) AS item_id, CAST(hops AS BIGINT) AS hops
FROM d4
""",
    tags=("graph", "iterate"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source hop distances (BFS, 4 synchronous frontier rounds
    from item 0) over the directed transition graph — the remaining
    classic Pregel op next to PageRank / connected components / label
    propagation / triangles: 'how many clicks from the landing page'.
    Integer hops, so the distributed loop is bit-exact against the
    unrolled-CTE oracle. See operators/graph.py:bfs_hops for the
    frontier-loop scale shape."""
    return G.bfs_hops(
        G.transition_edges(_events_with_item(spark, sf_dir)),
        source_item=0,
        max_hops=4,
    )


_SSSP_ITER = """
c{i} AS (
  SELECT item, min(cost_fp) AS cost_fp FROM (
    SELECT item, cost_fp FROM c{p}
    UNION ALL
    SELECT e.dst AS item, d.cost_fp + (1000000 + e.cnt - 1) // e.cnt
        AS cost_fp
    FROM edges e JOIN c{p} d ON e.src = d.item
  ) GROUP BY item
)"""


@query(
    "graph_cheapest_path",
    oracle=f"""
WITH {_EDGES},
c0 AS (SELECT 0 AS item, CAST(0 AS BIGINT) AS cost_fp),
{",".join(_SSSP_ITER.format(i=i, p=i - 1) for i in (1, 2, 3, 4))}
SELECT CAST(item AS BIGINT) AS item_id, CAST(cost_fp AS BIGINT) AS cost_fp,
       round(cost_fp / 1000000.0, 6) AS cost
FROM c4
""",
    tags=("graph", "iterate"),
)
def graph_cheapest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source cheapest paths (4 Bellman-Ford relaxations from
    item 0) over the transition graph with integer fixed-point edge
    costs ceil(1e6 / cnt) — the weighted sibling of graph_bfs_hops:
    'the most-likely click route to each page', since popular
    transitions cost least. Pure integer relaxation, bit-exact against
    the unrolled-CTE oracle. See operators/graph.py:cheapest_paths."""
    return G.cheapest_paths(
        G.transition_edges(_events_with_item(spark, sf_dir)),
        source_item=0,
        rounds=4,
    )
