"""Snapshot-to-snapshot change feed (incremental reads / CDF).

The reference's consumers poll whole tables and re-diff in the sink
(the SQLite repos re-upsert every batch — src/repositories/sqlite/
base.py:159-171, and the NATS sink re-publishes full rows per block
range — src/clis/historical.py:67-91). At web scale a downstream
(index builder, training-data refresher) must instead ask "what
changed between snapshot A and snapshot B" and receive rows
proportional to the CHANGE, not to the table. This module provides
that as two layers:

- ``state_diff`` — the logical operator: given two keyed states,
  emit per-key net changes (insert / update_postimage / delete).
  Pure DataFrame composition; the full-outer join shuffles both
  sides on the key, which is the honest lower bound when the inputs
  are arbitrary states.
- ``CDCEngine.changes`` (plans/engine.py) — the incremental physical
  path: candidate keys come from the MANIFEST DIFF (files added
  between the two snapshots), so the work is ∝ rows written in the
  window, not ∝ table size. The A-side is probed only for candidate
  keys. This is the Iceberg/Delta "changelog between versions" shape.

Change semantics are NET (state-compare), not event-replay: a key
that was upserted five times in the window emits ONE update with the
winning post-image; a key that was inserted and then deleted inside
the window emits NOTHING (it is absent from both states). Late data
that LOSES the LWW race to a pre-existing row emits nothing — state
B equals state A for that key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_TYPE_COL = "change_type"


def state_diff(
    a: DataFrame | None,
    b: DataFrame,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Net changes turning keyed state ``a`` into keyed state ``b``.

    Inputs are one-row-per-key (already LWW-collapsed, tombstones
    dropped). Output: key_cols + change_type + payload_cols, where the
    payload is the POST-image from ``b`` (null on deletes):

    - key only in ``b``                      → insert
    - key in both, version columns differ    → update_postimage
    - key in both, version columns equal     → (no row — unchanged)
    - key only in ``a``                      → delete

    ``a`` may be None (empty initial state): every ``b`` row is an
    insert — no join is planned at all in that case.
    """
    keys = list(key_cols)
    if a is None:
        return b.select(
            *keys,
            F.lit("insert").alias(CHANGE_TYPE_COL),
            *payload_cols,
        )
    a_side = a.select(
        *keys, *[F.col(c).alias(f"__a_{c}") for c in version_cols]
    )
    b_side = b.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in version_cols], *payload_cols
    )
    joined = b_side.join(a_side, on=keys, how="full_outer")
    in_a = F.col(f"__a_{version_cols[0]}").isNotNull()
    in_b = F.col(f"__b_{version_cols[0]}").isNotNull()
    # identical field aliases on both sides: Spark struct comparison
    # requires matching struct types, field names included
    same_version = F.struct(
        *[F.col(f"__a_{c}").alias(c) for c in version_cols]
    ) == F.struct(*[F.col(f"__b_{c}").alias(c) for c in version_cols])
    return (
        joined.withColumn(
            CHANGE_TYPE_COL,
            F.when(~in_a & in_b, F.lit("insert"))
            .when(in_a & in_b & ~same_version, F.lit("update_postimage"))
            .when(in_a & ~in_b, F.lit("delete")),
        )
        .filter(F.col(CHANGE_TYPE_COL).isNotNull())
        .select(*keys, CHANGE_TYPE_COL, *payload_cols)
    )
