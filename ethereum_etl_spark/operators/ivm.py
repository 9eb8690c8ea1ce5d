"""Incremental view maintenance (IVM) for SUM/COUNT aggregates over a
pre-image change feed.

The reference maintains its event aggregate with a ClickHouse
MATERIALIZED VIEW fed by inserts only (NATS table → MV → RMT,
src/repositories/clickhouse/event.py:83-88) — correct there because its
stream is append-only per key version. A CDC table has updates and
deletes, so the general construction is the classic delta rule for
distributive aggregates:

    Δcount(g) = Σ sign(row),  Δsum_c(g) = Σ sign(row)·c

over the Delta-CDF feed (``state_diff(..., preimage=True)``) with
sign = +1 for insert / update_postimage and −1 for update_preimage /
delete. An update's pre/post pair cancels in the count and contributes
exactly (post − pre) to each sum — no rescan of either state, ever.

At scale this is one hash aggregation over rows ∝ the CHANGE (the feed
is already ∝ change via the manifest-diff path), followed by one
agg-sized join — the cost profile that makes a 10^10-row base table's
derived aggregates maintainable per epoch.

Groups whose maintained count reaches 0 are dropped (a group exists
iff it has live rows — matching a from-scratch GROUP BY).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.changes import CHANGE_TYPE_COL

def _sign():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.when(F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin("update_preimage", "delete"), F.lit(-1))
        .otherwise(F.lit(0))
    )


def agg_delta(
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Per-group (Δcount, Δsums) from a preimage change feed."""
    g = list(group_cols)
    sign = _sign()
    return changes.groupBy(*g).agg(
        F.sum(sign).alias(count_col),
        *[F.sum(sign * F.col(c)).alias(c) for c in sum_cols],
    )


def apply_agg_delta(
    agg: DataFrame | None,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Merge a delta into the maintained aggregate (full-outer on the
    group key, null-as-zero addition, empty groups dropped). ``agg``
    may be None for the initial build."""
    g = list(group_cols)
    vals = [count_col, *sum_cols]
    if agg is None:
        merged = delta
    else:
        a = agg.select(*g, *[F.col(c).alias(f"__old_{c}") for c in vals])
        d = delta.select(*g, *[F.col(c).alias(f"__d_{c}") for c in vals])
        merged = a.join(d, on=g, how="full_outer").select(
            *g,
            *[
                (
                    F.coalesce(F.col(f"__old_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                ).alias(c)
                for c in vals
            ],
        )
    return merged.filter(F.col(count_col) > 0)
