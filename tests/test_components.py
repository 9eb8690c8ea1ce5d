"""Connected-components dup clustering (operators/components.py)."""

import pytest
import random

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.components import connected_components, dup_clusters


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find oracle: node -> component min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )


def test_two_triangles_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)]
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == {n: 1 for n in (1, 2, 3, 10, 11, 12)}


def test_long_chain_converges(spark):
    """A 64-node path is the worst case for naive min-propagation
    (needs O(n) rounds); large-star/small-star must close it within
    the O(log n) budget."""
    edges = [(i, i + 1) for i in range(64)]
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(_pairs_df(spark, edges), max_rounds=12).collect()
    }
    assert got == {n: 0 for n in range(65)}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(180)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _py_components(edges)
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == expected


def test_dup_clusters_isolated_docs_are_canonical(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = _pairs_df(spark, [(1, 4), (4, 7)])
    rows = {r["doc_id"]: r for r in dup_clusters(docs, pairs).collect()}
    assert len(rows) == 10
    for d in (1, 4, 7):
        assert rows[d]["cluster_id"] == 1
    assert rows[1]["is_canonical"] and not rows[4]["is_canonical"]
    for d in (0, 2, 3, 5, 6, 8, 9):
        assert rows[d]["cluster_id"] == d and rows[d]["is_canonical"]


def test_nonconvergence_raises(spark):
    """Exhausting max_rounds without a stable signature must raise, not
    silently return unconverged (wrong) component ids."""
    from ethereum_etl_spark.operators.components import connected_components

    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        # stability detection needs ≥2 rounds; 1 round can never prove it
        connected_components(pairs, max_rounds=1)
