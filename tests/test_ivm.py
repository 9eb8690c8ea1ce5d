"""Incremental view maintenance: preimage feed shape + the delta rule
(maintained aggregate == from-scratch GROUP BY of the final state)."""

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.changes import state_diff
from ethereum_etl_spark.operators.ivm import agg_delta, apply_agg_delta


def _state(spark, rows):
    # (key, version, val)
    return spark.createDataFrame(rows, ["k", "v", "val"])


def test_preimage_feed_shape(spark):
    a = _state(spark, [(1, 1, 10), (2, 1, 20), (3, 1, 30)])
    b = _state(spark, [(1, 1, 10), (2, 2, 25), (4, 1, 40)])  # 2 updated, 3 deleted, 4 inserted
    feed = state_diff(a, b, ["k"], ["v"], ["val"], preimage=True).collect()
    got = {(r["k"], r["change_type"]): r["val"] for r in feed}
    assert got == {
        (2, "update_preimage"): 20,
        (2, "update_postimage"): 25,
        (3, "delete"): 30,  # delete carries the DELETED payload, not null
        (4, "insert"): 40,
    }


def test_maintained_agg_equals_scratch(spark):
    a = _state(
        spark,
        [(k, 1, k * 10) for k in range(40)],
    )
    # final state: evens updated (+5), multiples of 5 deleted, 40..49 inserted
    b_rows = [
        (k, 2 if k % 2 == 0 else 1, k * 10 + (5 if k % 2 == 0 else 0))
        for k in range(40)
        if k % 5 != 0
    ] + [(k, 1, k * 10) for k in range(40, 50)]
    b = _state(spark, b_rows)

    cohort = (F.col("k") % 4).alias("g")
    agg_a = a.select(cohort, "val").groupBy("g").agg(
        F.count("*").alias("n"), F.sum("val").alias("val")
    )
    feed = state_diff(a, b, ["k"], ["v"], ["val"], preimage=True)
    delta = agg_delta(feed.select(cohort, "change_type", "val"), ["g"], ["val"])
    maintained = {
        r["g"]: (r["n"], r["val"])
        for r in apply_agg_delta(agg_a, delta, ["g"], ["val"]).collect()
    }
    scratch = {
        r["g"]: (r["n"], r["val"])
        for r in b.select(cohort, "val")
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("val").alias("val"))
        .collect()
    }
    assert maintained == scratch


def test_emptied_group_dropped_and_initial_build(spark):
    a = _state(spark, [(1, 1, 10), (2, 1, 20)])  # both in cohort g=1 (odd/even)
    b = _state(spark, [(2, 1, 20)])  # key 1 deleted
    feed = state_diff(a, b, ["k"], ["v"], ["val"], preimage=True)
    g1 = (F.col("k") % 2).alias("g")
    agg_a = a.select(g1, "val").groupBy("g").agg(
        F.count("*").alias("n"), F.sum("val").alias("val")
    )
    out = apply_agg_delta(
        agg_a, agg_delta(feed.select(g1, "change_type", "val"), ["g"], ["val"]),
        ["g"], ["val"],
    ).collect()
    assert {r["g"]: (r["n"], r["val"]) for r in out} == {0: (1, 20)}
    # initial build: agg=None means the delta IS the aggregate
    init = apply_agg_delta(
        None,
        agg_delta(
            state_diff(None, b, ["k"], ["v"], ["val"]).select(
                g1, "change_type", "val"
            ),
            ["g"], ["val"],
        ),
        ["g"], ["val"],
    ).collect()
    assert {r["g"]: (r["n"], r["val"]) for r in init} == {0: (1, 20)}


def test_postimage_default_unchanged(spark):
    """preimage=False keeps the original contract: one row per change,
    null payload on deletes."""
    a = _state(spark, [(1, 1, 10), (2, 1, 20)])
    b = _state(spark, [(1, 2, 15)])
    feed = state_diff(a, b, ["k"], ["v"], ["val"]).collect()
    got = {(r["k"], r["change_type"]): r["val"] for r in feed}
    assert got == {(1, "update_postimage"): 15, (2, "delete"): None}
