"""Dedup operator family over the driver's documents table."""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.dedupe import (
    embedding_near_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_keeps_min_id_per_content(spark, docs):
    out = exact_dedup(docs)
    n_hashes = docs.select(F.xxhash64("text")).distinct().count()
    assert out.count() == n_hashes
    # canonical = min doc_id of its content group
    groups = exact_dup_groups(docs)
    if groups.count() > 0:
        joined = out.withColumn("h", F.xxhash64("text")).join(
            groups, F.col("h") == groups.content_hash
        )
        bad = joined.filter(F.col("doc_id") != F.col("canonical_id")).count()
        assert bad == 0


def test_minhash_candidates_superset_check(spark, docs):
    """LSH-verified pairs must agree with brute-force exact Jaccard on
    high-similarity pairs (recall at 0.8 with 16 bands of 4 is ~1)."""
    small = docs.limit(120).cache()
    brute = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(small, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(small, threshold=0.8, n_hashes=64, n_bands=16).collect()
    }
    # every LSH pair is exact-verified → subset; recall should be high
    assert lsh.issubset(brute)
    if brute:
        assert len(lsh) / len(brute) >= 0.9


def test_minhash_dedup_drops_near_dups(spark, docs):
    # bucket-collision mode (default) drops a superset of what the
    # exact-verified mode drops: every verified pair shares a bucket
    kept_fast = {r["doc_id"] for r in minhash_dedup(docs).select("doc_id").collect()}
    kept_ver = {
        r["doc_id"]
        for r in minhash_dedup(docs, threshold=0.9, verify=True)
        .select("doc_id").collect()
    }
    assert 0 < len(kept_fast) <= docs.count()
    assert kept_fast.issubset(kept_ver)


def test_simhash_deterministic_and_close_for_dups(spark, docs):
    h1 = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash64("text").alias("sh")).collect()}
    h2 = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash64("text").alias("sh")).collect()}
    assert h1 == h2
    # identical texts → identical simhash (hamming 0 pairs exist iff dups exist)
    dups = exact_dup_groups(docs).count()
    pairs = simhash_pairs(docs, max_hamming=0)
    if dups > 0:
        assert pairs.count() > 0


def test_embedding_near_dup_symmetric_bounds(spark, embs):
    pairs = embedding_near_dup_pairs(embs.limit(200), threshold=0.99)
    rows = pairs.collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert -1.0001 <= r["cosine"] <= 1.0001
