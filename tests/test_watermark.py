"""Watermarked streaming aggregation (§2.9 late data): append-mode
windows finalize exactly once when the watermark passes them, and a
late event arriving AFTER its window's state was evicted is dropped
(emitting the window twice would violate append semantics). Note the
one-directional guarantee: a late row whose window state still exists
IS still aggregated — so the drop scenario needs the late row to land
batches after the watermark advance."""

import time

from ethereum_etl_spark.streaming.windows import streaming_host_window_counts
from tests.test_stateful import _write_events

T0 = 1_700_000_000  # fixed epoch base


def test_windows_finalize_once_and_evicted_late_event_dropped(spark, tmp_path):
    wal = tmp_path / "wal"
    wal.mkdir()
    now = time.time()
    # batch 0: two on-time a.com events in early windows + a far-ahead
    # event that moves max event time (watermark = max - 5min) past both
    _write_events(
        str(wal / "f1.parquet"),
        [
            (1, "insert", "http://a.com/x", T0 + 60),
            (2, "insert", "http://a.com/y", T0 + 720),
            (3, "insert", "http://b.com/z", T0 + 3600),
        ],
        now - 90,
    )
    # batch 1: innocuous fresh event; the watermark advance takes effect
    # and the two early windows are finalized + evicted
    _write_events(
        str(wal / "f2.parquet"),
        [(4, "insert", "http://b.com/z2", T0 + 3660)],
        now - 60,
    )
    # batch 2: late event for the FIRST (already-evicted) window — must
    # be dropped, else append mode would emit that window a second time
    _write_events(
        str(wal / "f3.parquet"),
        [(5, "update", "http://a.com/x2", T0 + 120)],
        now - 30,
    )
    from ethereum_etl_spark.schemas import CHANGE_EVENT_SCHEMA

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(wal))
    )
    q = (
        streaming_host_window_counts(stream)
        .writeStream.format("memory")
        .queryName("host_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM host_windows").collect()
    keyed = [(r["host"], int(r["window_start"].timestamp()), int(r["n"])) for r in out]
    assert len(keyed) == len({(h, w) for h, w, _ in keyed})  # finalize ONCE
    w0 = T0 - (T0 % 600)  # tumbling windows align to the epoch, not T0
    counts = {(h, w): n for h, w, n in keyed}
    assert counts[("a.com", w0)] == 1  # late seq=5 dropped post-eviction
    assert counts[("a.com", w0 + 600)] == 1
    # b.com windows sit at/above the watermark: never finalized
    assert all(h != "b.com" for h, _, _ in keyed)
