"""Bucketed interval (range) join.

``left.ts BETWEEN right.start AND right.end`` with no equality key is a
plan Spark can only execute as BroadcastNestedLoopJoin (small right) or
a cartesian product — O(|L|·|R|) comparisons, hopeless at 10^10 rows.
The standard scale path (the same trick behind Databricks' range-join
bin hints and PostGIS grid joins) turns the range predicate into an
equi-join on overlapping TIME BUCKETS:

- each right interval explodes to the buckets it covers
  (ceil(len/width) rows — bounded when interval length is bounded);
- each left row computes its single bucket;
- hash equi-join on the bucket id (shuffle or broadcast — Catalyst's
  choice), then the exact BETWEEN predicate filters within the bucket.

Every comparison now happens only between rows whose buckets collide,
so total work is ∝ matches + bucket collisions, and the join
parallelizes across buckets like any hash join. Correct for any
interval/point pair: a point matches an interval iff they share the
point's bucket AND the predicate holds (the interval covers the
point's bucket by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_width_s: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (point ``left_ts``) to right rows (interval
    ``[right_start, right_end]``, inclusive both ends) on containment.

    ``bucket_width_s`` tunes the explode factor: each right interval
    emits ``len/width + 1`` bucket rows. Pick it near the typical
    interval length — too small explodes the right side, too large
    collides unrelated rows into one bucket. ``how='inner'`` (matches
    only) or ``'left'`` (keep unmatched left rows with null right
    columns — implemented as inner ∪ null-safe anti on all left
    columns, so the exact predicate never leaves the bucket-collided
    pairs; identical duplicate left rows match identically, so the
    reconstruction is exact for bags too). Overlapping column names
    between left and right are rejected up front — the left join would
    otherwise silently null-overwrite the left side's values.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        # an inner join would make these ambiguous, and the left-join
        # null-fill below would OVERWRITE the left side's values —
        # silently wrong output. Refuse; callers rename first.
        raise ValueError(
            f"left and right share column names {sorted(overlap)}; "
            "rename one side before interval_join"
        )
    w = F.lit(bucket_width_s)
    l_bucket = (F.unix_timestamp(F.col(left_ts)) / w).cast("long")
    r_lo = (F.unix_timestamp(F.col(right_start)) / w).cast("long")
    r_hi = (F.unix_timestamp(F.col(right_end)) / w).cast("long")

    r_exploded = right.withColumn(
        _BUCKET, F.explode(F.sequence(r_lo, r_hi))
    )
    l_bucketed = left.withColumn(_BUCKET, l_bucket)
    matched = (
        l_bucketed.join(r_exploded, on=_BUCKET, how="inner")
        .filter(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) <= F.col(right_end))
        )
        .drop(_BUCKET)
    )
    if how == "inner":
        return matched
    # null-SAFE anti join: plain `on=left.columns` uses null-unsafe
    # equality, so a left row with a null in any column would never
    # match the anti side and appear BOTH matched and null-filled.
    l_side = left.alias("__rj_l")
    m_side = matched.select(*left.columns).alias("__rj_m")
    cond = None
    for c in left.columns:
        eq = F.col(f"__rj_l.{c}").eqNullSafe(F.col(f"__rj_m.{c}"))
        cond = eq if cond is None else cond & eq
    unmatched = l_side.join(m_side, on=cond, how="left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(right.dtypes)[c])
        )
    return matched.unionByName(unmatched)
