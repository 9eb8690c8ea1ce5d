"""Iterative graph operators (J5 analog: bounded BFS + path-ratio fold)."""

from ethereum_etl_spark.operators.graph import bfs_min_hops, bfs_path_product


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src: long, dst: long, weight: double")


def test_bfs_min_hops_first_discovery(spark):
    e = _edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)])
    got = {r["node"]: r["hops"] for r in bfs_min_hops(e, source=0, max_hops=4).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_path_product_max_over_min_hop_paths(spark):
    # two 2-hop paths to node 3: 0→1→3 (2*4=8) and 0→2→3 (3*5=15) → 15;
    # the direct 3-hop detour 0→1→4→3 (2*10*10=200) must NOT win (longer)
    e = _edges(
        spark,
        [
            (0, 1, 2.0),
            (0, 2, 3.0),
            (1, 3, 4.0),
            (2, 3, 5.0),
            (1, 4, 10.0),
            (4, 3, 10.0),
        ],
    )
    got = {r["node"]: (r["hops"], r["product"]) for r in bfs_path_product(e, 0, 3).collect()}
    assert got[0] == (0, 1.0)
    assert got[1] == (1, 2.0)
    assert got[2] == (1, 3.0)
    assert got[3] == (2, 15.0)
    assert got[4] == (2, 20.0)
