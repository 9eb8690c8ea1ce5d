"""End-to-end incremental pipeline: WAL → tailer → table → change-feed
stream → incrementally-maintained aggregate.

The full CDC loop: events land in epochs via the tailer, a downstream
consumer tails the TABLE's snapshots via ChangesStream and maintains a
per-cohort (count, sum) aggregate from the pre-image feed alone (IVM
delta rule) — the maintained aggregate must equal the from-scratch
GROUP BY of the final table at every drain point, and a crash between
apply and checkpoint-commit must re-deliver the identical window.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.ivm import agg_delta, apply_agg_delta
from ethereum_etl_spark.plans.engine import CDCEngine, EngineConfig
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal
from ethereum_etl_spark.streaming.changes_stream import ChangesStream

GROUP = ["cohort"]
SUMS = ["n_chars"]


def _with_cohort(df):
    keep = ["change_type"] if "change_type" in df.columns else []
    return df.select(
        *keep,
        (F.xxhash64("url") % 8).alias("cohort"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
    )


def _from_scratch(engine) -> pd.DataFrame:
    return (
        _with_cohort(engine.read_table())
        .groupBy(*GROUP)
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("n_chars"))
        .toPandas()
        .sort_values(GROUP)
        .reset_index(drop=True)
    )


def test_stream_maintains_aggregate_across_growing_wal(spark, tmp_path, tmp_table):
    wal = str(tmp_path / "wal")
    cfg = WalConfig(n_events=3_000, n_urls=500, ooo_frac=0.2)
    write_wal(gen_wal(spark, cfg), wal, n_files=2)
    eng = CDCEngine(
        spark, wal, tmp_table, config=EngineConfig(epoch_size=1_000, n_buckets=8)
    )
    stream = ChangesStream(eng, str(tmp_path / "consumer.ckpt"), preimage=True)

    maintained = {"agg": None}

    def apply_window(feed, _from_sid, _to_sid):
        delta = agg_delta(_with_cohort(feed), GROUP, SUMS)
        maintained["agg"] = apply_agg_delta(
            maintained["agg"], delta, GROUP, SUMS
        ).localCheckpoint()

    # stage 1: two epochs, one net window
    eng.run(up_to_seq=2_000)
    assert stream.drain(apply_window) == 1
    # stage 2: remaining epoch
    eng.run()
    assert stream.drain(apply_window) == 1
    # stage 3: WAL grows (append) and the tailer applies — feed follows
    extra = gen_wal(spark, WalConfig(n_events=4_000, n_urls=500, ooo_frac=0.2)).filter(
        F.col("seq") >= 3_000
    )
    extra.write.mode("append").parquet(wal)
    eng._wal(refresh=True)
    eng.run()
    assert stream.drain(apply_window) == 1

    got = (
        maintained["agg"].toPandas().sort_values(GROUP).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _from_scratch(eng), check_dtype=False)
    # caught up: no further windows
    assert stream.poll() is None and stream.drain(apply_window) == 0


def test_crash_before_commit_redelivers_same_window(spark, tmp_path, tmp_table):
    wal = str(tmp_path / "wal2")
    write_wal(gen_wal(spark, WalConfig(n_events=2_000, n_urls=300)), wal, n_files=2)
    eng = CDCEngine(
        spark, wal, tmp_table, config=EngineConfig(epoch_size=1_000, n_buckets=8)
    )
    eng.run(up_to_seq=1_000)
    stream = ChangesStream(eng, str(tmp_path / "c.ckpt"))
    first = stream.poll()
    assert first is not None
    # consumer "crashes" before commit: the next poll is the SAME window
    again = stream.poll()
    assert (first[0], first[1]) == (again[0], again[1])
    rows = {(r["url"], r["change_type"]) for r in first[2].collect()}
    assert rows == {(r["url"], r["change_type"]) for r in again[2].collect()}
    stream.commit(first[1])
    assert stream.poll() is None
    # new commits resume the feed from the checkpoint
    eng.run()
    nxt = stream.poll()
    assert nxt is not None and nxt[0] == first[1]


def test_window_pins_snapshots_against_concurrent_commits(spark, tmp_path, tmp_table):
    """A polled window plans against pinned manifests: an engine commit
    AFTER poll() must not shift the already-returned window."""
    wal = str(tmp_path / "wal3")
    write_wal(gen_wal(spark, WalConfig(n_events=2_000, n_urls=300)), wal, n_files=2)
    eng = CDCEngine(
        spark, wal, tmp_table, config=EngineConfig(epoch_size=1_000, n_buckets=8)
    )
    eng.run(up_to_seq=1_000)
    stream = ChangesStream(eng, str(tmp_path / "c3.ckpt"))
    batch = stream.poll()
    n_before = batch[2].count()
    eng.run()  # concurrent writer advances the table mid-window
    assert batch[2].count() == n_before
    stream.commit(batch[1])
    follow = stream.poll()
    assert follow is not None and follow[0] == batch[1]


def test_expire_keeps_consumer_snapshot_and_poll_stays_incremental(
    spark, tmp_path, tmp_table
):
    """VERDICT r4 #6: aggressive expire_snapshots must not delete the
    snapshot a registered consumer's checkpoint pins. With the default
    respect_consumers=True the lagging consumer's next poll() is still
    INCREMENTAL (from == its checkpoint); with respect_consumers=False
    the poll falls back loudly (warning + from_snapshot=None) instead
    of raising on the missing manifest."""
    wal = str(tmp_path / "wal4")
    write_wal(gen_wal(spark, WalConfig(n_events=3_000, n_urls=300)), wal, n_files=2)
    eng = CDCEngine(
        spark, wal, tmp_table, config=EngineConfig(epoch_size=1_000, n_buckets=8)
    )
    eng.run(up_to_seq=1_000)
    stream = ChangesStream(eng, str(tmp_path / "c4.ckpt"))
    assert stream.drain(lambda feed, a, b: feed.count()) == 1
    pinned = stream.last_committed()
    assert eng.table.consumer_snapshots() == {stream.consumer_id: pinned}

    eng.run()  # consumer now lags two epochs behind
    eng.table.expire_snapshots(keep_last=1)  # default: respect consumers
    # pinned manifest survived; next poll is incremental from it
    eng.table.read_snapshot_meta(pinned)
    batch = stream.poll()
    assert batch is not None and batch[0] == pinned
    inc_rows = batch[2].count()
    full_rows = eng.read_table().count()  # live rows (tombstones excluded)
    assert 0 < inc_rows  # and the window is a real (non-full) feed
    stream_state_before = stream.last_committed()

    # force-expire past the consumer: loud full-feed fallback, no raise
    eng.table.expire_snapshots(keep_last=1, respect_consumers=False)
    with pytest.raises(FileNotFoundError):
        eng.table.read_snapshot_meta(pinned)
    with pytest.warns(UserWarning, match="expired; falling back to a FULL feed"):
        batch = stream.poll()
    assert batch is not None and batch[0] is None
    assert batch[2].filter(F.col("change_type") == "insert").count() == full_rows
    assert stream.last_committed() == stream_state_before  # poll never commits
