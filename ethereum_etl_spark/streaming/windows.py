"""Watermarked event-time aggregation over the streaming WAL.

§2.9 late-data posture, streaming side. The batch engine handles late
(out-of-order) events by LWW version comparison — arrival order never
matters because version order is total. For *aggregations* over the
stream that is not enough: state would grow forever waiting for
arbitrarily late rows. Spark's answer is the watermark: windows are
finalized (emitted once, append mode) when the watermark passes their
end, and rows later than the watermark are dropped from the
aggregation. This module packages that as the engine's streaming
ingest-rate monitor: per-host tumbling-window event counts.

Reference analog (SURVEY.md §2.9): the reference's throttler window —
a fixed-size in-memory rate meter over the request stream
(src/utils/throttler.py:9-31) — re-expressed as an event-time windowed
count with bounded state instead of an unbounded in-memory deque.

Scale posture: groupBy(host, window) is a keyed shuffle of (host,
window, partial count) tuples only — map-side partial aggregation
applies, payload columns are pruned before the shuffle, and watermark
expiry bounds state by (hosts × windows-in-watermark-horizon), not by
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_host_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling event-time counts per url host over a streaming WAL.

    ``events`` is a streaming DataFrame with (url, warc_ts). Returns a
    streaming DataFrame for append-mode output: one finalized row per
    (host, window) once the watermark (max seen event time minus
    ``watermark``) passes the window end. Late-data contract (the
    one-directional guarantee Spark actually provides, pinned by
    tests/test_watermark.py): a late event whose window state is still
    live is aggregated; once the window is finalized and its state
    evicted, later events for it are dropped — each window is emitted
    exactly once.
    """
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host")
    return (
        events.withWatermark("warc_ts", watermark)
        .select(host, "warc_ts")
        .groupBy("host", F.window("warc_ts", window).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "host",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("n").cast("long").alias("n"),
        )
    )
