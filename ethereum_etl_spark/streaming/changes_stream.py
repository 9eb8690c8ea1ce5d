"""Change-feed tail — the table as a streaming SOURCE.

The tailer (streaming/tailer.py) closes the ingest side: WAL → table.
This module closes the egress side: a downstream consumer (index
builder, training-data refresher, derived aggregate) tails the TABLE's
committed snapshots and receives, per poll, the net change feed between
the snapshot it last consumed and the current one — rows ∝ change via
the manifest-diff path (operators/changes.py), never a table rescan.
This is the Delta/Iceberg "streaming read of a table" shape; the
reference's consumers instead re-read whole tables per block range
(src/clis/historical.py:67-91, src/repositories/sqlite/base.py:159-171).

Delivery contract: AT-LEAST-ONCE windows with exactly-once EFFECT when
the consumer's sink commits its state together with the window's
``to_snapshot`` (the same write-ahead discipline the engine's own
ledger uses — see ``drain``). ``ChangesStream`` keeps a tiny consumer
checkpoint (atomic tmp+rename JSON) recording the last snapshot id it
committed; a crash between processing and ``commit`` re-delivers the
SAME window on the next poll, which is harmless iff the sink is
transactional or idempotent per (from, to) pair.

Windows are snapshot-aligned, not epoch-aligned: one poll may cover
many epochs (a slow consumer gets one NET window, not a backlog of
per-epoch feeds — late-churned keys collapse, which is exactly the
semantics IVM wants). Each ``commit`` also registers the consumer's
snapshot with the table (``SnapshotTable.register_consumer``), and
``expire_snapshots`` keeps registered snapshots alive by default — so
a lagging consumer's next window stays incremental. If expiry is
forced past the checkpoint anyway (``respect_consumers=False``),
``poll`` detects the missing manifest and falls back LOUDLY to a full
feed with ``from_snapshot=None`` instead of raising.
"""

from __future__ import annotations

import json
import os
import uuid
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame

from ethereum_etl_spark.plans.engine import CDCEngine


class ChangesStream:
    def __init__(
        self,
        engine: CDCEngine,
        checkpoint_path: str,
        preimage: bool = True,
        consumer_id: str | None = None,
    ):
        self.engine = engine
        self.checkpoint_path = checkpoint_path
        self.preimage = preimage
        # registered with the TABLE on every commit so expire_snapshots
        # keeps this consumer's pinned snapshot (its next window's
        # A-side manifest) alive; derived from the checkpoint filename
        # by default so one checkpoint == one registration
        self.consumer_id = consumer_id or (
            "cs-" + os.path.basename(checkpoint_path).replace(".", "_")
        )

    # -- consumer checkpoint (atomic tmp+rename; single consumer) -------

    def last_committed(self) -> str | None:
        if not os.path.exists(self.checkpoint_path):
            return None
        with open(self.checkpoint_path) as f:
            return json.load(f)["snapshot_id"]

    def commit(self, to_snapshot: str) -> None:
        tmp = f"{self.checkpoint_path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": to_snapshot}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.checkpoint_path)
        # checkpoint first, registration second: a crash in between
        # leaves the registration one snapshot behind, which only
        # over-protects (expiry keeps one extra snapshot), never under-
        self.engine.table.register_consumer(self.consumer_id, to_snapshot)

    # -- polling ---------------------------------------------------------

    def poll(self) -> tuple[str | None, str, DataFrame] | None:
        """One micro-batch: (from_snapshot, to_snapshot, change feed),
        or None when the table has no new committed snapshot. The feed
        DataFrame is lazy; it plans against the PINNED manifests of the
        two snapshots, so concurrent engine commits can't shift the
        window under the consumer.

        If the consumer's pinned snapshot was expired out from under it
        (``expire_snapshots(respect_consumers=False)``, or a checkpoint
        written before registration existed), the incremental plan is
        impossible — the A-side manifest is gone. Rather than raising
        FileNotFoundError mid-plan, this falls back LOUDLY to a full
        feed: warns, and returns ``from_snapshot=None`` so ``apply_fn``
        sees the whole current state as inserts and knows to rebuild
        derived state from scratch (the same contract as a consumer's
        very first window)."""
        cur = self.engine.table.current_snapshot()
        if cur is None:
            return None
        last = self.last_committed()
        if last == cur.snapshot_id:
            return None
        if last is not None:
            try:
                self.engine.table.read_snapshot_meta(last)
            except FileNotFoundError:
                warnings.warn(
                    f"ChangesStream[{self.consumer_id}]: checkpointed snapshot "
                    f"{last} was expired; falling back to a FULL feed "
                    f"(from_snapshot=None) — downstream state must be rebuilt. "
                    f"Keep retention longer than consumer lag, or rely on the "
                    f"default expire_snapshots(respect_consumers=True).",
                    stacklevel=2,
                )
                last = None
        feed = self.engine.changes(last, cur.snapshot_id, preimage=self.preimage)
        return last, cur.snapshot_id, feed

    def drain(
        self,
        apply_fn: Callable[[DataFrame, str | None, str], None],
        max_windows: int | None = None,
    ) -> int:
        """Process pending windows until caught up: for each window call
        ``apply_fn(feed, from_snapshot, to_snapshot)`` then commit the
        consumer checkpoint. For exactly-once EFFECT the apply_fn's sink
        should persist ``to_snapshot`` transactionally with its own
        state and skip windows it already holds — a redelivered window
        (crash between apply and commit) is then a no-op, exactly the
        engine's skip-committed-epoch discipline. Returns the number of
        windows processed."""
        n = 0
        while max_windows is None or n < max_windows:
            batch = self.poll()
            if batch is None:
                return n
            last, cur, feed = batch
            apply_fn(feed, last, cur)
            self.commit(cur)
            n += 1
        return n
