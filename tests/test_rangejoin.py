"""Bucketed interval join: equivalence with the naive range join and
the plan-shape guarantee (no BroadcastNestedLoopJoin / cartesian)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.rangejoin import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=37 * i + (i % 3) * 0.25)) for i in range(400)],
        ["point_id", "ts"],
    )
    # overlapping, irregular intervals; some cover nothing
    iv = spark.createDataFrame(
        [
            (
                j,
                t0 + dt.timedelta(seconds=300 * j - 100),
                t0 + dt.timedelta(seconds=300 * j + 450),
            )
            for j in range(60)
        ],
        ["interval_id", "w_start", "w_end"],
    )
    return pts, iv


def _naive(pts, iv):
    return (
        pts.crossJoin(iv)
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end")))
        .select("point_id", "interval_id")
    )


@pytest.mark.parametrize("width", [60, 300, 900])
def test_matches_naive_at_any_bucket_width(spark, frames, width):
    pts, iv = frames
    got = interval_join(pts, iv, "ts", "w_start", "w_end", bucket_width_s=width)
    exp = set(map(tuple, _naive(pts, iv).collect()))
    assert set(map(tuple, got.select("point_id", "interval_id").collect())) == exp
    assert len(exp) > 400  # overlap: more matches than points


def test_left_join_keeps_unmatched(spark, frames):
    pts, iv = frames
    # shift intervals so early points are uncovered
    iv_late = iv.filter(F.col("interval_id") >= 30)
    got = interval_join(pts, iv_late, "ts", "w_start", "w_end", how="left")
    assert got.count() >= pts.count()
    unmatched = got.filter(F.col("interval_id").isNull())
    assert unmatched.count() > 0
    matched_ids = {r["point_id"] for r in _naive(pts, iv_late).collect()}
    assert {r["point_id"] for r in unmatched.collect()} == (
        {r["point_id"] for r in pts.collect()} - matched_ids
    )


def test_plan_has_no_nested_loop(spark, frames):
    pts, iv = frames
    plan = interval_join(
        pts, iv, "ts", "w_start", "w_end", bucket_width_s=300
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_overlapping_columns_rejected(spark, frames):
    pts, iv = frames
    bad = iv.withColumnRenamed("interval_id", "point_id")  # collides
    with pytest.raises(ValueError, match="share column names"):
        interval_join(pts, bad, "ts", "w_start", "w_end")


def test_left_join_null_left_columns(spark):
    """A left row with a NULL in a non-join column must not appear both
    matched and null-filled (the anti side must use null-safe equality)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(None, t0 + dt.timedelta(seconds=10)),  # matches, null tag
         (7, t0 + dt.timedelta(seconds=10)),     # matches
         (None, t0 + dt.timedelta(days=30))],    # no match, null tag
        "tag int, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(seconds=60))],
        "interval_id int, w_start timestamp, w_end timestamp",
    )
    out = interval_join(pts, iv, "ts", "w_start", "w_end", how="left").collect()
    assert len(out) == 3
    matched = [r for r in out if r["interval_id"] is not None]
    unmatched = [r for r in out if r["interval_id"] is None]
    assert len(matched) == 2 and len(unmatched) == 1
