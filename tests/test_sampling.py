"""Deterministic hash sampling: stability, salt independence, fractions."""

from pyspark.sql import functions as F

from ethereum_etl_spark.functions.sampling import (
    deterministic_sample,
    hash_split,
    stable_uniform,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc-"), F.col("id")).alias("text")
    )


def test_split_deterministic_and_partition_invariant(spark):
    d = _docs(spark)
    s1 = hash_split(d, "text", {"train": 0.8, "val": 0.1, "test": 0.1})
    s2 = hash_split(d.repartition(7), "text", {"train": 0.8, "val": 0.1, "test": 0.1})
    a = dict((r["doc_id"], r["split"]) for r in s1.collect())
    b = dict((r["doc_id"], r["split"]) for r in s2.collect())
    assert a == b
    counts = {k: sum(1 for v in a.values() if v == k) for k in ("train", "val", "test")}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert counts["train"] + counts["val"] + counts["test"] == 2000


def test_salt_draws_independent_assignment(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in hash_split(d, "text", {"a": 0.5, "b": 0.5}, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d, "text", {"a": 0.5, "b": 0.5}, salt="s2").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert 0.3 < moved / 2000 < 0.7  # ~half move under an independent draw


def test_sample_fraction_and_subset_property(spark):
    d = _docs(spark)
    s10 = {r["doc_id"] for r in deterministic_sample(d, "text", 0.10).collect()}
    s20 = {r["doc_id"] for r in deterministic_sample(d, "text", 0.20).collect()}
    assert abs(len(s10) / 2000 - 0.10) < 0.03
    assert s10 <= s20  # nested samples: thresholds on one uniform


def test_uniform_range(spark):
    d = _docs(spark, 500)
    us = [r["u"] for r in d.select(stable_uniform("text").alias("u")).collect()]
    assert all(0.0 <= u < 1.0 for u in us)
    assert len(set(us)) == 500


def test_stratified_sample_per_stratum_rates(spark):
    from ethereum_etl_spark.functions.sampling import stratified_sample

    d = _docs(spark, 3000).withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, "en")
        .when(F.col("doc_id") % 3 == 1, "fr")
        .otherwise("de"),
    )
    out = stratified_sample(d, "text", "lang", {"en": 0.2, "fr": 1.0}, 0.5)
    rates = {
        r["lang"]: r["n"] / 1000
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert abs(rates["en"] - 0.2) < 0.05
    assert rates["fr"] == 1.0  # keep-all stratum keeps every row
    assert abs(rates["de"] - 0.5) < 0.05  # default fraction
    # deterministic: same call yields the identical row set
    again = {r["doc_id"] for r in stratified_sample(
        d, "text", "lang", {"en": 0.2, "fr": 1.0}, 0.5).collect()}
    assert again == {r["doc_id"] for r in out.collect()}


def test_stratified_sample_stays_in_codegen(spark):
    from ethereum_etl_spark.functions.sampling import stratified_sample

    d = _docs(spark, 10).withColumn("lang", F.lit("en"))
    plan = (
        stratified_sample(d, "text", "lang", {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
