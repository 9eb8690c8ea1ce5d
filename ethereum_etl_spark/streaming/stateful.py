"""Custom stateful streaming operator: live LWW latest-version state.

The batch engine collapses each epoch with ``lww_agg`` and merges into
the snapshot table; this module is the *continuous* analog — a
changelog-compaction operator that keeps, in Spark's streaming state
store, the winning ``(warc_ts, seq, op)`` per url across micro-batches
and emits a row only when a batch actually changes a key's winner.
Downstream (a foreachBatch MERGE, a dashboard) sees a compacted
change-stream instead of the raw WAL firehose.

Reference analog (SURVEY.md §2.9/S2 + A6): the realtime WS loop feeds
ClickHouse ReplacingMergeTree, whose background merge keeps the
max-version row per key (src/repositories/clickhouse/event.py:76-78);
here the state store plays the RMT role and emission is the "merge
happened" signal.

Scale posture: state per key is 3 scalars (~40 bytes) — 10^10 urls is
state-store-sharded across executors by the groupBy(url) shuffle, and
an optional processing-time TTL evicts idle keys so state is bounded by
the active set, not the key universe. Payload (``html``) must NOT enter
the operator: callers pass the projected (url, warc_ts, seq, op)
stream and re-join payload by (url, seq) downstream — same
payload-light discipline as ``lww_agg``.

Arrow note: ``applyInPandasWithState`` is the Arrow-vectorized stateful
API (input_hint: pandas/Arrow UDFs only); per-group work below is
vectorized pandas over the batch, not per-row Python. Spark 4's newer
``transformWithStateInPandas`` (state API v2) would express the TTL as
a registered timer, but it requires protobuf, which this environment
does not ship — the v1 API below is the one that runs everywhere.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Emitted compacted change-stream: the new winner per changed key.
LWW_STATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
    ]
)

#: Per-key state: winning version as (ts_micros, seq) + its op.
_LWW_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_micros", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
    ]
)


def _make_lww_update(ttl_ms: int | None):
    """Build the per-group state function as a closure so the TTL knob
    is pickled by value into the Arrow worker."""

    def _lww_update(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: drop idle-key state, emit nothing. A key
            # seen again later restarts from its next event (same
            # effect as RMT parts being merged away and re-created).
            state.remove()
            return
        # Batch-local winner first (vectorized): max by (warc_ts, seq).
        best_ts, best_seq, best_op = -1, -1, ""
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            ts = pdf["warc_ts"].astype("datetime64[us]").astype("int64")
            seq = pdf["seq"].astype("int64")
            order = pd.DataFrame({"ts": ts, "seq": seq}).sort_values(["ts", "seq"])
            i = order.index[-1]
            if (int(ts.loc[i]), int(seq.loc[i])) > (best_ts, best_seq):
                best_ts, best_seq = int(ts.loc[i]), int(seq.loc[i])
                best_op = str(pdf["op"].loc[i])
        if best_seq < 0:
            return
        if state.exists:
            cur_ts, cur_seq, _cur_op = state.get
            if (best_ts, best_seq) <= (cur_ts, cur_seq):
                # Late arrival loses to state: no emission, no state
                # change — but refresh the TTL clock (the key is hot).
                if ttl_ms is not None:
                    state.setTimeoutDuration(ttl_ms)
                return
        state.update((best_ts, best_seq, best_op))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "url": [key[0]],
                "warc_ts": pd.to_datetime([best_ts], unit="us"),
                "seq": [best_seq],
                "op": [best_op],
            }
        )

    return _lww_update


def streaming_lww_latest(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    output_mode: str = "update",
) -> DataFrame:
    """Compacted LWW change-stream over a streaming WAL.

    ``events`` must be a *streaming* DataFrame with at least
    (url, warc_ts, seq, op) — pass the projection, never the payload.
    Returns a streaming DataFrame (outputMode ``update``) that emits one
    row per (batch, key) whose winner changed. With ``state_ttl_ms`` the
    state store evicts keys idle longer than the TTL (bounded state at
    10^10-key scale).

    Caveat: with a TTL, run the query with a continuous trigger — once
    group timeouts are registered, Spark schedules state-cleanup batches
    indefinitely, so ``trigger(availableNow=True)`` never terminates.

    ``output_mode`` must match the sink's: "update" for memory/foreach
    sinks, "append" for append-only sinks (parquet change-log). The
    emissions are identical either way — the operator only ever yields
    winner *transitions*, which are append-safe by construction.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    proj = events.select("url", "warc_ts", "seq", "op")
    return proj.groupBy(F.col("url")).applyInPandasWithState(
        _make_lww_update(state_ttl_ms),
        outputStructType=LWW_STATE_OUTPUT_SCHEMA,
        stateStructType=_LWW_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=timeout,
    )
