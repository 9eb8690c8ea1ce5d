"""MERGE INTO semantics against a SnapshotTable.

Reference analog (SURVEY.md S6/S8/J6): the sink-side key match of
``INSERT OR REPLACE`` (src/repositories/sqlite/base.py:152-175) and the
ReplacingMergeTree version collapse (src/repositories/clickhouse/
event.py:58-80). Expressed relationally:

    MERGE INTO pages t USING batch s ON t.url = s.url
    WHEN MATCHED AND s.version > t.version THEN UPDATE SET *   -- incl. tombstone
    WHEN NOT MATCHED THEN INSERT *

**Deletes are tombstones, not physical removals.** A delete is an upsert
of a row with ``__deleted = true`` carrying its LWW version; the read path
filters tombstones out. This is required for correctness across epochs: if
a delete physically removed the row, a later epoch delivering an *older*
out-of-order event for the same url would see "not matched" and resurrect
the key. With the tombstone's version in the table, the old event loses
the version comparison — LWW by rule (SURVEY.md §2.9). Iceberg/Delta
solve the same problem the same way (delete files / tombstones retained
until compaction past the replay window).

The version guard (``s.version > t.version``) also makes replay and
redelivery idempotent: a late or duplicate event with an older
``(warc_ts, seq)`` can never overwrite newer table state.

Physical strategy: the source batch is already deduped (unique urls), so
the join is target-bucket-rows ⋈ source on url, a plain equi-join that
AQE turns into a broadcast join when the batch is small (we also hint it
below the configured row bound). Only buckets whose keys appear in the
source are read at all (copy-on-write file pruning in SnapshotTable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOMBSTONE_COL = "__deleted"
_PRIO = "__src_prio"


def merge_union_lww(
    target: DataFrame | None,
    source: DataFrame,
    key_col: str,
    version_cols: Sequence[str],
    data_cols: Sequence[str],
    broadcast_winners: bool = False,
) -> DataFrame:
    """MERGE as LWW over (target ∪ batch) — the payload-light plan.

    ``broadcast_winners`` defaults to False (winners = one row per key =
    a driver OOM at real key counts if force-broadcast; AQE decides from
    runtime stats). Opt in only with a known-bounded key count.

    Upsert-with-version-guard is exactly "latest version per key wins"
    over the union of current rows and batch rows. Physical win: the
    winner computation is a partial-aggregated ``max(struct(version))``
    over tiny (key, version) tuples, and payloads are fetched back by a
    (broadcast) join of winners — so html bytes cross the wire at most
    once (for the bucket rewrite), never through the merge join itself.
    A source-priority tiebreak makes an exact (key, version) collision
    (event redelivery) resolve deterministically to the batch row.
    """
    src = source.select(*data_cols).withColumn(_PRIO, F.lit(1))
    if target is None:
        return src.drop(_PRIO)
    both = target.select(*data_cols).withColumn(_PRIO, F.lit(0)).unionByName(src)
    ver_cols = [*version_cols, _PRIO]
    winners = (
        both.groupBy(key_col)
        .agg(F.max(F.struct(*[F.col(c).alias(c) for c in ver_cols])).alias("__v"))
        .select(key_col, *[F.col(f"__v.{c}").alias(c) for c in ver_cols])
    )
    if broadcast_winners:
        winners = F.broadcast(winners)
    # payload-light winner fetch: the winner computation above reads only
    # (key, version) — Catalyst prunes columns through the union — and
    # the full rows are then fetched by PER-SIDE semi-joins, so the
    # payload columns are only ever the probe side of a (broadcastable)
    # join and never shuffle on the composite merge key. (The previous
    # formulation joined the unioned FULL rows against winners, which
    # hashed every payload byte through the merge shuffle.) The _PRIO
    # component keeps exact (key, version) redelivery collisions
    # resolving to the batch row: each side only claims winners carrying
    # its own priority.
    tgt_w = target.select(*data_cols).join(
        winners.filter(F.col(_PRIO) == 0).drop(_PRIO),
        on=[key_col, *version_cols],
        how="left_semi",
    )
    src_w = source.select(*data_cols).join(
        winners.filter(F.col(_PRIO) == 1).drop(_PRIO),
        on=[key_col, *version_cols],
        how="left_semi",
    )
    return tgt_w.unionByName(src_w)


def merge_resolve(
    target: DataFrame | None,
    source: DataFrame,
    key_col: str,
    version_cols: Sequence[str],
    data_cols: Sequence[str],
    broadcast_source: bool = False,
) -> DataFrame:
    """Return post-merge rows (data_cols, tombstones included) for the
    affected key space.

    `target`: current rows (data_cols), unique per key, or None (empty).
    `source`: deduped batch (data_cols), unique per key; tombstones carry
              ``__deleted = true`` inside data_cols.
    """
    source = source.select(*[F.col(c).alias(f"__s_{c}") for c in data_cols])
    if broadcast_source:
        source = F.broadcast(source)
    if target is None:
        return source.select(*[F.col(f"__s_{c}").alias(c) for c in data_cols])

    target = target.select(*[F.col(c).alias(f"__t_{c}") for c in data_cols])
    joined = target.join(
        source, F.col(f"__t_{key_col}") == F.col(f"__s_{key_col}"), "full_outer"
    )

    s_ver = F.struct(*[F.col(f"__s_{c}") for c in version_cols])
    t_ver = F.struct(*[F.col(f"__t_{c}") for c in version_cols])
    s_present = F.col(f"__s_{key_col}").isNotNull()
    t_present = F.col(f"__t_{key_col}").isNotNull()
    source_wins = s_present & (~t_present | (s_ver > t_ver))

    picked = F.when(
        source_wins, F.struct(*[F.col(f"__s_{c}").alias(c) for c in data_cols])
    ).otherwise(F.struct(*[F.col(f"__t_{c}").alias(c) for c in data_cols]))
    return joined.select(picked.alias("__row")).select(
        *[F.col(f"__row.{c}").alias(c) for c in data_cols]
    )
