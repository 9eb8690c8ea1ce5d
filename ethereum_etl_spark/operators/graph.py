"""Iterative graph traversal — the J5 analog.

Reference analog (SURVEY.md J5): the Memgraph Cypher BFS that walks the
token-swap graph ≤5 hops for price discovery
(src/tasks/extract/pool.py:183-290, BFS query at :202-213). The property
graph itself is out of CDC scope; the *computational pattern* — bounded
breadth-first expansion as an iterative self-join — is reproduced here
Spark-first: each hop is one equi-join + anti-join against the visited
set, and the driver loop is bounded by ``max_hops`` (the reference uses
5), so the lazy plan stays shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_min_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, hops) of minimum hop counts from `source` within max_hops.

    BFS order guarantees first-discovery == min-hops, so no re-ranking
    pass is needed. Each frontier is small (bounded by node count); the
    per-hop anti-join against visited keeps work monotonically shrinking.
    """
    spark = edges.sparkSession
    start = spark.createDataFrame([(source, 0)], "node: long, hops: long")
    visited = start
    frontier = start
    cached: list = []  # every persisted frontier; all released before return
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src_col])
            .select(F.col(dst_col).cast("long").alias("node"), F.lit(h).cast("long").alias("hops"))
            .distinct()
            .join(visited.select("node"), on="node", how="left_anti")
        )
        nxt = nxt.persist()
        cached.append(nxt)
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    # cut lineage before releasing the cached frontiers: returning a lazy
    # plan over unpersisted parents would either leak executor memory (no
    # unpersist) or recompute the whole BFS on first use (eager
    # unpersist). localCheckpoint materializes the result executor-side
    # (never through the driver), then every frontier cache is released.
    out = visited.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def bfs_path_product(
    edges: DataFrame,
    source: int,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """(node, hops, product): minimum hop count from `source` and the MAX
    product of edge weights over the minimal-hop paths.

    This closes the J5 semantics: the reference folds balance ratios
    along its ≤5-hop Cypher path and keeps a best price
    (src/tasks/extract/pool.py:225-274 — per-edge ratio fold at
    :225-238). Weights must be POSITIVE: then the best h-hop product to a
    node is max over predecessors of (their best (h-1)-hop product ×
    edge weight), so each frontier carries one (node, best product) row
    and the loop stays O(frontier ⋈ edges) per hop — never enumerating
    paths. Every intermediate node of a minimal path is itself at its
    minimal hop count, so first-discovery products are exact.
    """
    spark = edges.sparkSession
    start = spark.createDataFrame(
        [(source, 0, 1.0)], "node: long, hops: long, product: double"
    )
    visited = start
    frontier = start
    cached: list = []
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src_col])
            .select(
                F.col(dst_col).cast("long").alias("node"),
                (F.col("product") * F.col(weight_col)).alias("__p"),
            )
            .groupBy("node")
            .agg(F.max("__p").alias("product"))
            .join(visited.select("node"), on="node", how="left_anti")
            .select("node", F.lit(h).cast("long").alias("hops"), "product")
        )
        nxt = nxt.persist()
        cached.append(nxt)
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    out = visited.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out
