"""applyInPandasWithState LWW operator: the compacted change-stream's
final winner per url equals batch LWW over the whole WAL, emission is
suppressed for late arrivals that lose to state, and arrival order
does not matter."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ethereum_etl_spark.operators.lww import lww_window
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal
from ethereum_etl_spark.streaming.stateful import streaming_lww_latest


def _write_events(path: str, rows: list[tuple], mtime: float) -> None:
    """One parquet WAL file with CHANGE_EVENT_SCHEMA-compatible types."""
    seqs, ops, urls, tss = zip(*rows)
    table = pa.table(
        {
            "seq": pa.array(seqs, pa.int64()),
            "op": pa.array(ops, pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [pd.Timestamp(t, unit="s") for t in tss], pa.timestamp("us")
            ),
            "html": pa.array([b"x"] * len(rows), pa.binary()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def _run_stream(spark, wal_dir, name, ttl_ms=None, max_files=1):
    from ethereum_etl_spark.schemas import CHANGE_EVENT_SCHEMA

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(wal_dir)
    )
    q = (
        streaming_lww_latest(stream, state_ttl_ms=ttl_ms)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_late_arrival_suppressed_two_batches(spark, tmp_path):
    wal = tmp_path / "wal"
    wal.mkdir()
    now = time.time()
    # batch 1: u1 winner (ts=100), u2 early version (ts=50)
    _write_events(
        str(wal / "f1.parquet"),
        [(1, "insert", "u1", 100), (2, "insert", "u2", 50)],
        now - 60,
    )
    # batch 2: u1 LATE (ts=90 < state) -> suppressed; u2 newer -> emitted
    _write_events(
        str(wal / "f2.parquet"),
        [(3, "update", "u1", 90), (4, "update", "u2", 60)],
        now - 30,
    )
    emitted = _run_stream(spark, str(wal), "lww_two_batches")
    per_url = emitted.groupby("url").size().to_dict()
    assert per_url == {"u1": 1, "u2": 2}
    final = emitted.sort_values(["url", "seq"]).groupby("url").last()
    assert int(final.loc["u1", "seq"]) == 1  # late seq=3 never surfaced
    assert int(final.loc["u2", "seq"]) == 4


def test_final_state_matches_batch_lww_any_order(spark, tmp_path):
    """Randomized WAL, one file per micro-batch in arbitrary order: the
    max-version emitted row per url equals lww_window over the full WAL
    (arrival order is irrelevant by construction of LWW)."""
    wal = str(tmp_path / "wal")
    write_wal(gen_wal(spark, WalConfig(n_events=3_000, n_urls=400)), wal, n_files=4)
    emitted = _run_stream(spark, wal, "lww_random", max_files=1)
    assert not emitted.empty

    got = (
        spark.createDataFrame(emitted)
        .transform(lww_window)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = (
        lww_window(spark.read.parquet(wal).select("url", "warc_ts", "seq", "op"))
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "warc_ts", "seq", "op"]],
        exp[["url", "warc_ts", "seq", "op"]],
        check_dtype=False,
    )
    # compaction property: per url at most one emission per batch, and
    # emitted versions are distinct (a losing batch emits nothing)
    assert emitted.groupby("url").size().max() <= 4
    assert not emitted.duplicated(["url", "seq"]).any()


def test_ttl_variant_smoke(spark, tmp_path):
    """ProcessingTimeTimeout path: with a long TTL no eviction happens
    mid-run, so emitted rows match the no-TTL semantics. NOTE the query
    must run continuously — with group timeouts registered Spark keeps
    scheduling state-cleanup batches, so an availableNow trigger never
    terminates (documented in streaming/stateful.py docstring)."""
    from ethereum_etl_spark.schemas import CHANGE_EVENT_SCHEMA

    wal = tmp_path / "wal"
    wal.mkdir()
    now = time.time()
    _write_events(str(wal / "f1.parquet"), [(1, "insert", "u1", 10)], now - 10)
    _write_events(str(wal / "f2.parquet"), [(2, "update", "u1", 20)], now - 5)
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(wal))
    )
    q = (
        streaming_lww_latest(stream, state_ttl_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("lww_ttl")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            emitted = spark.sql("SELECT * FROM lww_ttl").toPandas()
            if len(emitted) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert list(emitted.sort_values("seq")["seq"]) == [1, 2]


def test_compacted_stream_materializes_to_batch_final_state(spark, tmp_path):
    """The documented composition for the stateful operator: append its
    emissions to a change-log, LWW-collapse that log, drop delete
    winners, re-join payload from the WAL by seq — the result equals the
    batch oracle's final table state. Proves the compacted change-stream
    is a usable apply path, not just a monitor."""
    import pandas as pd

    from ethereum_etl_spark.oracle import expected_final_state
    from ethereum_etl_spark.schemas import CHANGE_EVENT_SCHEMA

    wal = str(tmp_path / "wal")
    write_wal(gen_wal(spark, WalConfig(n_events=2_500, n_urls=350)), wal, n_files=4)
    changes = str(tmp_path / "changes")

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(wal)
    )
    q = (
        streaming_lww_latest(stream, output_mode="append")
        .writeStream.format("parquet")
        .option("path", changes)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")  # parquet sink is append-only; the log
        .trigger(availableNow=True)  # carries every winner transition
        .start()
    )
    q.awaitTermination()

    log = spark.read.parquet(changes)
    final_keys = lww_window(log)  # per-key max transition = final winner
    from pyspark.sql import functions as F

    live = final_keys.filter(F.col("op") != "delete").select("seq")
    got = (
        spark.read.parquet(wal)
        .join(live, on="seq", how="inner")
        .select("url", "warc_ts", "seq", "html")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got["html"] = got["html"].map(lambda b: bytes(b) if b is not None else None)
    exp = expected_final_state(spark.read.parquet(wal).toPandas()).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["url", "warc_ts", "seq", "html"]],
        exp[["url", "warc_ts", "seq", "html"]],
        check_dtype=False,
    )
