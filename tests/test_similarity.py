"""ANN operators over the driver's embeddings table."""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.similarity import (
    brute_force_topk,
    build_ivf,
    ivf_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(embs):
    return (
        embs.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .cache()
    )


def test_brute_force_topk_self_is_best(embs, queries):
    res = brute_force_topk(embs, queries, k=5)
    rows = {(r["query_id"], r["rank"]): r for r in res.collect()}
    for q in range(5):
        best = rows[(q, 1)]
        assert best["vec_id"] == q  # self-similarity = 1.0 is rank 1
        assert best["cosine"] > 0.9999
    # exactly k per query, ranks contiguous
    assert len(rows) == 25


def test_lsh_recall_vs_brute_force(embs, queries):
    k = 10
    exact = brute_force_topk(embs, queries, k=k)
    approx = lsh_topk(embs, queries, k=k, dim=64, n_planes=10, n_tables=6)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_recall_and_structure(embs, queries):
    assigned, centroids = build_ivf(embs, n_lists=8)
    assert assigned.count() == embs.count()
    assert centroids.count() == 8
    # every vector in exactly one list
    assert assigned.select("vec_id").distinct().count() == embs.count()
    k = 10
    exact = brute_force_topk(embs, queries, k=k)
    approx = ivf_topk(assigned, centroids, queries, k=k, n_probe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
