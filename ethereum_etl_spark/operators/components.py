"""Connected components over near-duplicate pairs — dup-cluster closure.

Pairwise dedup candidates (MinHash/SimHash/embedding pairs) are only
half the job: "A≈B, B≈C" must collapse into ONE cluster {A,B,C} before
a canonical doc can be chosen, i.e. connected components over the
similarity graph. The reference's analog is entity grouping on the
Cypher side (SURVEY.md §2 J5 context: MATCH paths group related nodes);
at training-corpus scale this is the RefinedWeb/SlimPajama "dedup
cluster" stage.

Spark-first implementation: the alternating **large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature): each round is two self-join-free
groupBy passes over the edge list, and the edge list contracts toward a
star per component in O(log n) expected rounds. No vertex ever holds
its whole component in memory, every step is a plain shuffle the AQE
sizes — this scales to billions of edges where a naive transitive
closure (iterated self-join) explodes.

    large_star: for each node u, connect every STRICTLY LARGER neighbor
                v > u to m(u) = min(neighbors(u) ∪ {u})
    small_star: connect every neighbor v ≤ u (and u itself) to m(u)

Convergence: when a round changes no edges, every node points at its
component's minimum id. Output: (doc_id, component_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_undirected(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Edge list as (u,v) with u<v, self-loops dropped, deduped."""
    u = F.least(F.col(a), F.col(b)).alias("u")
    v = F.greatest(F.col(a), F.col(b)).alias("v")
    return pairs.select(u, v).filter(F.col("u") != F.col("v")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """u -> min(N(u) ∪ {u}) for all neighbors > u."""
    nbrs = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = nbrs.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    big = nbrs.filter(F.col("v") > F.col("u"))
    out = big.join(m, "u").select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    return _canonical_undirected(out, "a", "b")


def _small_star(edges: DataFrame) -> DataFrame:
    """u -> min(N≤(u) ∪ {u}) for all neighbors ≤ u (edges point down)."""
    down = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    m = down.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    out = down.join(m, "u").select(
        F.col("v").alias("a"), F.col("m").alias("b")
    ).unionByName(
        m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    )
    return _canonical_undirected(out, "a", "b")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(doc_id, component_id) for every node in the pair list.

    component_id is the MINIMUM doc id in the component (deterministic
    canonical representative — the same convention the exact-dedup
    groups use). Isolated docs (no pair) are not emitted; callers union
    them back as their own components if needed.

    Each round materializes the contracted edge list via localCheckpoint
    (truncates lineage — iterative algorithms otherwise re-execute the
    whole chain every round) and stops when the edge count stops
    changing twice in a row, checked by a cheap count on the
    checkpointed frame.
    """
    edges = _canonical_undirected(pairs, id_a, id_b).localCheckpoint()
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        # signature: (n_edges, sum(v)) — cheap change detector; stable
        # signature means every edge already points at the component min
        sig = tuple(
            edges.agg(F.count("*"), F.sum("u"), F.sum("v")).collect()[0]
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # large-star/small-star contracts in O(log n) expected rounds;
        # exhausting the budget means the ids below would be WRONG
        # (unconverged stars), which a dedup keep-policy would then act
        # on silently. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds; raise max_rounds (components need ~log2(n) rounds)"
        )
    members = edges.select(F.col("v").alias("doc_id"), F.col("u").alias("component_id"))
    roots = edges.select(F.col("u").alias("doc_id"), F.col("u").alias("component_id"))
    return members.unionByName(roots).groupBy("doc_id").agg(
        F.min("component_id").alias("component_id")
    )


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment for EVERY doc: component id for paired docs,
    self id for isolated ones, plus the cluster's canonical flag
    (is_canonical = this doc is the cluster minimum — the survivor a
    dedup keep-policy retains)."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("cluster_id"),
        )
    )
    return out.withColumn(
        "is_canonical", (F.col("doc_id") == F.col("cluster_id"))
    )
