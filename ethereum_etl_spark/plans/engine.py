"""The epoch loop — the engine's query lifecycle.

Reference analog (SURVEY.md §3.1): the per-block-range micro-batch loop of
``python -m src.clis.historical`` (src/clis/historical.py:67-91) — plan a
batch, fetch, extract, enrich, export, commit, advance. Here the hand-
rolled DAG scheduler (src/tasks/dag.py, src/tasks/graph.py) is replaced by
lazy DataFrame lineage (Catalyst owns the task DAG) and the batch loop
survives as the epoch loop:

    for each epoch (lo, hi] above the ledger high-watermark:
        slice   = WAL WHERE seq > lo AND seq <= hi      (file-pruned scan)
        winners = LWW dedup per url                     (op rides along)
        text    = vectorized html→text UDF              (winners ONLY —
                                                         UDF cost ∝ keys,
                                                         not ∝ events)
        merged  = MERGE resolve vs affected buckets     (copy-on-write)
        stage data files → write lineage → ATOMIC ledger append

Exactly-once: the ledger append is the single commit point. An epoch whose
epoch_id is already in the ledger is skipped verbatim on resume; a crash
anywhere before the append leaves only unreferenced files, so re-running
the epoch converges to the identical state (the reference gets the same
property from PK upserts — src/repositories/sqlite/base.py:159-171).

Skew: when an epoch's key histogram is degenerate (hot url prefixes), the
LWW stage switches to the salted two-phase plan (operators/lww.py), chosen
per-epoch by a cheap sampled heaviness probe or forced via config.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.extract import extract_text_udf
from ethereum_etl_spark.operators.lww import lww_agg, lww_salted, lww_winner_seqs
from ethereum_etl_spark.operators.merge import merge_union_lww
from ethereum_etl_spark.operators.snapshot_table import (
    BUCKET_COL,
    TOMBSTONE_COL,
    SnapshotTable,
    bucket_expr,
)
from ethereum_etl_spark.schemas import (
    PAGES_SCHEMA_V1,
    SchemaRegistry,
    conform_to_schema,
)


class AuditError(RuntimeError):
    """Write-audit-publish rejection: the staged epoch violated a
    declared data-quality constraint, so NOTHING was committed — the
    staged files exist but no manifest or ledger entry references them
    (invisible, same posture as a crash between stage and commit).
    Re-running after fixing the feed re-stages the epoch from the WAL."""

    def __init__(self, epoch_id: int, failures: list[dict]):
        self.epoch_id = epoch_id
        self.failures = failures
        super().__init__(f"epoch {epoch_id} failed audits: {failures}")


class InjectedCrash(RuntimeError):
    """Raised by test-configured crash points (fault injection)."""


_TIMING = os.environ.get("ETL_SPARK_TIMING", "") != ""


class _PhaseTimer:
    """Opt-in per-phase wall clock (ETL_SPARK_TIMING=1) for plan tuning."""

    def __init__(self, epoch_id: int):
        import time as _time

        self._time = _time
        self.epoch_id = epoch_id
        self.t0 = _time.time()

    def mark(self, label: str) -> None:
        if _TIMING:
            now = self._time.time()
            print(f"[epoch {self.epoch_id}] {label}: {now - self.t0:.2f}s", flush=True)
            self.t0 = now


@dataclass
class EngineConfig:
    epoch_size: int = 50_000  # events per epoch (maxOffsetsPerTrigger analog)
    n_buckets: int = 32
    #: "cow" rewrites touched buckets per epoch (read-optimized);
    #: "mor" appends delta files and collapses at read (write-optimized —
    #: the 10^10-events/day shape: apply cost ∝ batch, not ∝ table).
    table_mode: str = "mor"
    #: mor deltas are fanned map-side into this many compaction groups,
    #: so one compaction job rewrites ≈ table/n_delta_groups, not the
    #: whole table (persisted per-table; the table's value wins)
    n_delta_groups: int = 8
    #: in mor mode, compact a group once this many delta layers stack on it
    compact_max_deltas: int = 8
    #: cap compaction work per epoch: at most this many groups collapse
    #: after one epoch (deepest first) — keeps per-epoch maintenance
    #: latency bounded; remaining deep groups drain on later epochs
    compact_groups_per_epoch: int = 2
    #: replay window for tombstone expiry during compaction: a tombstone
    #: whose winning seq is ≤ high_watermark − this many seqs can no
    #: longer lose to ANY late event the stream might redeliver, so
    #: compaction drops it (deleted keys stop accumulating forever).
    #: None = retain tombstones indefinitely (the conservative default).
    tombstone_retention_seqs: int | None = None
    lww_method: str = "auto"  # auto | agg | salted | window
    n_salt: int = 16
    skew_threshold: float = 0.2  # key share above which 'auto' salts
    skew_sample_frac: float = 0.05
    skew_min_events: int = 10_000  # don't bother probing tiny epochs
    skew_reprobe_every: int = 8  # epochs between fresh skew probes
    #: cache the payload-free (seq,url,warc_ts,op) projection across the
    #: 2-3 jobs that read it. False (default) re-runs the pruned parquet
    #: scan per job: an interleaved pinned A/B at 6M events measured the
    #: re-scan CHEAPER than the cache round-trip at both 1 and 4 cores
    #: (n1 111.6s vs 122.1s, n4 29.8s vs 39.7s) — materializing ~100
    #: B/event into storage memory costs more memory bandwidth than
    #: decoding 4 narrow snappy columns again, and memory bandwidth is
    #: the apply pipeline's binding resource. Set True only when the WAL
    #: scan itself is expensive (e.g. remote object storage, where a
    #: re-scan pays network instead of local decode).
    persist_light: bool = False
    broadcast_merge_max_rows: int = 2_000_000  # winners = (key, version) only
    #: write-audit-publish gates, evaluated over the STAGED files (what
    #: would be published, after extract/merge) between stage and commit.
    #: Declarative dicts so the CLI can load them from JSON:
    #:   {"check": "max_rows"|"min_rows", "limit": n}
    #:   {"check": "max_null_frac", "column": c, "limit": f}   (live rows)
    #:   {"check": "not_null", "column": c}                    (shorthand)
    #:   {"check": "max_tombstone_frac", "limit": f}
    #: Any violation raises AuditError and the epoch publishes nothing —
    #: the Iceberg WAP workflow. Row counts come from footers (zero IO);
    #: null/tombstone fractions cost ONE pruned scan of the staged files
    #: over just the audited columns.
    audits: list = field(default_factory=list)
    crash_points: set = field(default_factory=set)  # {"after_stage", "after_lineage"}


@dataclass
class EpochResult:
    epoch_id: int
    start_seq: int  # exclusive
    end_seq: int  # inclusive
    n_events: int
    n_keys: int
    snapshot_id: str
    skipped: bool = False


class CDCEngine:
    def __init__(
        self,
        spark: SparkSession,
        wal_path: str,
        table_root: str,
        registry: SchemaRegistry | None = None,
        config: EngineConfig | None = None,
    ):
        self.spark = spark
        self.wal_path = wal_path
        self.config = config or EngineConfig()
        self.registry = registry or SchemaRegistry(base_schema=PAGES_SCHEMA_V1)
        self.table = SnapshotTable(
            spark,
            table_root,
            registry=self.registry,
            key_col="url",
            n_buckets=self.config.n_buckets,
            n_delta_groups=self.config.n_delta_groups,
        )
        self.lineage_root = os.path.join(table_root, "lineage")
        os.makedirs(self.lineage_root, exist_ok=True)
        #: sticky skew decision: the key distribution of a WAL drifts
        #: slowly, so 'auto' probes the first epoch and re-probes only
        #: every `skew_reprobe_every` epochs instead of paying a probe
        #: job per epoch.
        self._skew_memo: bool | None = None
        self._epochs_since_probe = 0

    # ------------------------------------------------------------------

    def _wal(self, refresh: bool = False) -> DataFrame:
        """WAL scan, cached per engine instance: re-creating the reader
        re-lists files and re-plans per epoch (~0.5s driver latency each);
        a tail/run refreshes once per poll, not once per epoch."""
        from ethereum_etl_spark.schemas import CHANGE_EVENT_SCHEMA

        if refresh or getattr(self, "_wal_df", None) is None:
            self._wal_df = self.spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(self.wal_path)
            self._wal_footers = None  # file set may have changed
        return self._wal_df

    def _wal_file_stats(self) -> list[dict]:
        """Per-file WAL stats from parquet footers, cached per listing:
        (path, rows, seq min/max from column stats, html uncompressed
        bytes). WAL files are immutable, so footers are read once per
        refresh — per-epoch lineage needs NO payload scan at all (the
        Iceberg-manifest trick: file-level stats are metadata)."""
        if getattr(self, "_wal_footers", None) is not None:
            return self._wal_footers
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        paths = sorted(
            os.path.join(self.wal_path, fn)
            for fn in os.listdir(self.wal_path)
            if fn.endswith(".parquet")
        )

        def _one(path: str) -> dict:
            md = pq.read_metadata(path)
            names = md.schema.names
            seq_i, html_i = names.index("seq"), names.index("html")
            smin, smax, hbytes = None, None, 0
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                st = g.column(seq_i).statistics
                if st is not None and st.has_min_max:
                    smin = st.min if smin is None else min(smin, st.min)
                    smax = st.max if smax is None else max(smax, st.max)
                hbytes += g.column(html_i).total_uncompressed_size
            return {
                "path": path,
                "rows": md.num_rows,
                "seq_min": smin,
                "seq_max": smax,
                "bytes": hbytes,
            }

        with ThreadPoolExecutor(max_workers=32) as ex:
            self._wal_footers = [f for f in ex.map(_one, paths) if f["rows"] > 0]
        return self._wal_footers

    def wal_max_seq(self) -> int:
        row = self._wal(refresh=True).agg(F.max("seq").alias("m")).collect()[0]
        return -1 if row["m"] is None else int(row["m"])

    def plan_epochs(self, up_to_seq: int | None = None) -> list[tuple[int, int, int]]:
        """(epoch_id, start_seq_exclusive, end_seq_inclusive) above the
        ledger high-watermark. epoch_id = first seq in the epoch, so a
        resumed run re-plans IDENTICAL epochs (determinism under crash)
        and a later, longer WAL can never collide with a committed id."""
        hw = self.table.high_watermark()
        top = self.wal_max_seq() if up_to_seq is None else up_to_seq
        size = self.config.epoch_size
        out = []
        lo = hw
        while lo < top:
            hi = min(lo + size, top)
            out.append((lo + 1, lo, hi))
            lo = hi
        return out

    # ------------------------------------------------------------------

    def _maybe_crash(self, point: str) -> None:
        if point in self.config.crash_points:
            raise InjectedCrash(point)

    def run_epoch(self, epoch_id: int, lo: int, hi: int) -> EpochResult:
        """One epoch in 2 Spark jobs (MoR; CoW adds a winner-count job),
        none of which shuffles html bytes:

        job 1 (light scan): exact event count + approximate key count
               over a cached payload-FREE projection (seq/url/warc_ts/
               op); per-file lineage stats come from cached parquet
               footers — pure metadata, zero payload IO.
        job 2 (the write): winner seqs ⋈ WAL slice fetches payloads once,
               Arrow text-extract on winners only, then MoR grouped delta
               write (shuffle-free) or CoW merge vs touched buckets.

        The WAL's html column is read exactly once (the write job's scan)
        and never crosses a shuffle: dedup/merge decisions travel as
        (url, warc_ts, seq) tuples, and in CoW mode the stage write's
        bucket repartition moves only the winning rows plus
        touched-bucket rows — the CoW minimum.
        """
        cfg = self.config
        committed = self.table.committed_epochs()
        if epoch_id in committed:  # exactly-once resume: skip verbatim
            e = committed[epoch_id]
            return EpochResult(
                epoch_id, e["start_seq"], e["end_seq"], 0, 0, e["snapshot_id"], skipped=True
            )

        timer = _PhaseTimer(epoch_id)
        wal = self._wal()
        slice_df = wal.filter((F.col("seq") > lo) & (F.col("seq") <= hi))

        # -- job 1: payload-FREE projection (seq/url/warc_ts/op — html is
        #    read exactly once per epoch, in the write job): one global
        #    agg gives the exact event count plus the approximate key
        #    count that feeds the broadcast decision. Per-file lineage
        #    stats (offsets, rows, payload bytes) come from the cached
        #    parquet FOOTERS — metadata, not a payload scan; previously
        #    length(html) here forced a second full-payload decompress
        #    per epoch.
        light = slice_df.select("seq", "url", "warc_ts", "op")
        if cfg.persist_light:
            light = light.persist()
        total = light.agg(
            F.count("*").alias("row_count"),
            F.approx_count_distinct("url").alias("n_keys_est"),
        ).collect()[0]
        timer.mark("lineage scan")
        n_events = int(total["row_count"])
        n_keys_est = int(total["n_keys_est"])
        # a WAL file belongs to the epoch that covers its first seq
        # (boundary files are attributed whole, so lineage rows+bytes
        # tile the WAL exactly across epochs; Iceberg manifests carry
        # file-granular stats the same way)
        lineage = [
            f
            for f in self._wal_file_stats()
            if f["seq_min"] is not None and lo < f["seq_min"] <= hi
        ]
        version = self.registry.version_at(hi)
        if n_events == 0:
            light.unpersist()
            snapshot_id = self.table.write_snapshot(
                None, self.table.current_snapshot().files if self.table.current_snapshot() else [],
                version,
                {"epoch_id": epoch_id, "start_seq": lo, "end_seq": hi, "n_events": 0},
                [],
            )
            return EpochResult(epoch_id, lo, hi, 0, 0, snapshot_id)

        winner_persisted = False
        try:
            # -- choose LWW plan (skew probe over the cached projection) --
            method = cfg.lww_method
            if method == "auto":
                if n_events < cfg.skew_min_events:
                    method = "agg"
                else:
                    if (
                        self._skew_memo is None
                        or self._epochs_since_probe >= cfg.skew_reprobe_every
                    ):
                        top = (
                            light.select("url")
                            .sample(cfg.skew_sample_frac, seed=7)
                            .groupBy("url")
                            .count()
                            .agg(F.max("count").alias("m"))
                            .collect()[0]["m"]
                        )
                        sample_n = max(int(n_events * cfg.skew_sample_frac), 1)
                        self._skew_memo = bool(top) and top / sample_n > cfg.skew_threshold
                        self._epochs_since_probe = 0
                    self._epochs_since_probe += 1
                    method = "salted" if self._skew_memo else "agg"
            timer.mark("skew probe")

            # -- winner keys ----------------------------------------------
            # broadcast_winners=False everywhere: winner sets are ~the
            # epoch's key count (100k-1M rows) — forcing them into driver
            # broadcasts degrades the session; AQE broadcasts from runtime
            # size stats when a side is genuinely small.
            keyed = light
            if cfg.table_mode == "mor":
                # MoR needs ONLY the winning seqs (payload comes back via
                # the seq equi-join below), so the LWW plan skips the
                # general operators' winner→event join-back entirely and
                # shuffles 128-bit key fingerprints instead of url bytes
                # (operators/lww.py lww_winner_seqs) — one partial-agg
                # shuffle of ~32 B tuples is the whole dedup. No affected-
                # bucket set and no exact key count up front either (delta
                # file footers give n_keys for free after the write).
                winner_keys = lww_winner_seqs(
                    keyed,
                    method=method if method in ("salted",) else "agg",
                    n_salt=cfg.n_salt,
                )
                affected = set()
                n_keys = n_keys_est
            elif method == "salted":
                winner_keys = lww_salted(keyed, n_salt=cfg.n_salt, broadcast_winners=False)
            elif method == "window":
                from ethereum_etl_spark.operators.lww import lww_window

                winner_keys = lww_window(keyed)
            else:
                winner_keys = lww_agg(keyed, broadcast_winners=False)
            if cfg.table_mode != "mor":
                winner_keys = winner_keys.withColumn(
                    BUCKET_COL, bucket_expr("url", self.table.n_buckets)
                ).persist()
                winner_persisted = True
                bucket_counts = (
                    winner_keys.groupBy(BUCKET_COL).agg(F.count("*").alias("n")).collect()
                )
                timer.mark("winner keys")
                affected = {r[BUCKET_COL] for r in bucket_counts}
                n_keys = sum(r["n"] for r in bucket_counts)

            # -- the write job: payload fetch (seq is unique → equi-join),
            #    extract, merge, stage write ------------------------------
            # payload fetch: the seq list is ~8 bytes/key — force the
            # broadcast while it fits comfortably so the WAL slice (with
            # html) never shuffles; past that, a shuffle join on seq moves
            # the payload exactly once (the unavoidable cost at that size)
            seqs = winner_keys.select("seq")
            if n_keys <= cfg.broadcast_merge_max_rows:
                seqs = F.broadcast(seqs)
            winners = slice_df.join(seqs, on="seq", how="inner")
            schema = self.registry.schema_at(hi)
            data_cols = [f.name for f in schema.fields]
            winners = winners.withColumn(
                "text",
                F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(
                    extract_text_udf(F.col("html"))
                ),
            )
            # rename-aware ingestion + null-fill tolerance (the reference
            # .get() posture) — shared helper, same for multi-table
            winners = conform_to_schema(winners, self.registry, version)
            physical_cols = data_cols + [TOMBSTONE_COL]
            winners = winners.withColumn(
                TOMBSTONE_COL, F.col("op") == "delete"
            ).select(*physical_cols)

            if cfg.table_mode == "mor":
                # -- merge-on-read: append winners as GROUPED delta files
                #    (Hudi-log-file shape, fanned map-side into compaction
                #    groups). The whole epoch write is shuffle-free: scan →
                #    broadcast-join → Arrow UDF → files. LWW collapse is
                #    deferred to read/compaction, so the epoch writes
                #    ~n_keys rows no matter how big the table is; each
                #    compaction then rewrites one group, not the table. ---
                cur = self.table.current_snapshot()
                untouched = list(cur.files) if cur else []
            else:
                # -- copy-on-write: merge vs affected buckets -------------
                target_df, untouched, touched_rows = self.table.read_buckets(affected, version)
                if target_df is not None:
                    target_df = target_df.drop(BUCKET_COL)
                merged = merge_union_lww(
                    target_df,
                    winners,
                    key_col="url",
                    version_cols=("warc_ts", "seq"),
                    data_cols=physical_cols,
                    broadcast_winners=False,  # AQE decides from runtime stats
                ).withColumn(BUCKET_COL, bucket_expr("url", self.table.n_buckets))
                file_kind = "base"

            # -- stage files, write lineage, THEN atomically commit -------
            snapshot_id = self.table.new_snapshot_id()
            if cfg.table_mode == "mor":
                new_files = self.table.stage_delta_grouped(
                    winners, snapshot_id, version, physical_cols
                )
                n_keys = sum(f.rows for f in new_files)  # exact, from footers
            else:
                new_files = self.table.stage(
                    merged, snapshot_id, version, physical_cols, kind=file_kind
                )
            timer.mark("merge+stage write")
            self._maybe_crash("after_stage")
            if cfg.audits:
                failures = self._run_audits(new_files, version, cfg.audits)
                timer.mark("audit")
                if failures:
                    raise AuditError(epoch_id, failures)
            self._write_lineage(epoch_id, lineage, snapshot_id, n_events)
            timer.mark("lineage write")
            self._maybe_crash("after_lineage")
            self.table.commit(
                snapshot_id,
                new_files,
                untouched,
                version,
                {
                    "epoch_id": epoch_id,
                    "start_seq": lo,
                    "end_seq": hi,
                    "n_events": n_events,
                    "n_keys": n_keys,
                    "lww_method": method,
                },
            )
        finally:
            light.unpersist()
            if winner_persisted:
                winner_keys.unpersist()
        # -- amortized compaction: collapse the deepest delta groups, at
        #    most compact_groups_per_epoch per epoch, so maintenance
        #    latency per epoch is bounded by ≈ table/n_delta_groups each
        #    (its own atomic snapshot; crash-safe, idempotent) -----------
        if cfg.table_mode == "mor" and cfg.compact_max_deltas:
            depth = self.table.delta_depth()
            deep = sorted(
                (g for g, d in depth.items() if d >= cfg.compact_max_deltas),
                key=lambda g: -depth[g],
            )[: max(cfg.compact_groups_per_epoch, 1)]
            if deep:
                self.table.compact_groups(
                    set(deep),
                    tombstone_retention_seqs=cfg.tombstone_retention_seqs,
                )
                timer.mark(f"compaction ({len(deep)} groups)")
        return EpochResult(epoch_id, lo, hi, n_events, n_keys, snapshot_id)

    def _run_audits(self, new_files: list, version: int, audits: list) -> list[dict]:
        """Evaluate WAP constraints over the staged (not yet published)
        files. Count checks read manifests only; all column checks share
        ONE aggregation job over a column-pruned scan of the staged
        files (Catalyst pushes the ReadSchema down, so the audit reads
        the audited columns, not the payload)."""
        failures: list[dict] = []
        n_rows = sum(f.rows for f in new_files)
        col_checks: list[dict] = []
        for a in audits:
            check = a["check"]
            if check == "max_rows":
                if n_rows > a["limit"]:
                    failures.append({**a, "actual": n_rows})
            elif check == "min_rows":
                if n_rows < a["limit"]:
                    failures.append({**a, "actual": n_rows})
            elif check in ("max_null_frac", "not_null", "max_tombstone_frac"):
                col_checks.append(a)
            else:
                raise ValueError(f"unknown audit check: {check!r}")
        if not col_checks or n_rows == 0:
            return failures
        from ethereum_etl_spark.operators.snapshot_table import TOMBSTONE_COL

        live = ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
        aggs, metas = [], []
        for i, a in enumerate(col_checks):
            if a["check"] == "max_tombstone_frac":
                expr = F.avg((~live).cast("double"))
                limit = float(a["limit"])
            else:
                # null fraction among LIVE rows only: deletes carry null
                # payload by design and must not trip the gate
                expr = F.avg(
                    F.when(live, F.col(a["column"]).isNull().cast("double"))
                )
                limit = 0.0 if a["check"] == "not_null" else float(a["limit"])
            aggs.append(expr.alias(f"a{i}"))
            metas.append((a, limit))
        staged = self.table._read_files(new_files, version)
        row = staged.agg(*aggs).collect()[0]
        for i, (a, limit) in enumerate(metas):
            actual = row[f"a{i}"]
            if actual is not None and actual > limit:
                failures.append({**a, "actual": round(actual, 6)})
        return failures

    def _write_lineage(
        self, epoch_id: int, files: list, snapshot_id: str, n_events: int
    ) -> None:
        """Idempotent per-epoch lineage parquet (overwrite on re-run).

        One row per WAL file the epoch owns: (file, seq offsets, rows,
        payload bytes, commit snapshot). Files are attributed WHOLE to
        the epoch covering their first seq — rows/bytes tile the WAL
        exactly across epochs, but a boundary epoch's file rows can
        exceed the events it processed, so ``epoch_n_events`` (the exact
        processed count, same value as the ledger) rides on every row
        for consumers that need per-epoch event counts. Written
        driver-side with pyarrow: pushing ~100 metadata rows through a
        Spark job costs ~1s of scheduler latency per epoch for zero
        parallelism benefit.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {
                "epoch_id": pa.array([epoch_id] * len(files), pa.int64()),
                "file": pa.array([os.path.basename(f["path"]) for f in files], pa.string()),
                "start_seq": pa.array([f["seq_min"] for f in files], pa.int64()),
                "end_seq": pa.array([f["seq_max"] for f in files], pa.int64()),
                "row_count": pa.array([f["rows"] for f in files], pa.int64()),
                "bytes": pa.array([f["bytes"] for f in files], pa.int64()),
                "snapshot_id": pa.array([snapshot_id] * len(files), pa.string()),
                "epoch_n_events": pa.array([n_events] * len(files), pa.int64()),
            }
        )
        out = os.path.join(self.lineage_root, f"epoch={epoch_id}")
        os.makedirs(out, exist_ok=True)
        pq.write_table(table, os.path.join(out, "lineage.parquet"))

    # ------------------------------------------------------------------

    def run(self, up_to_seq: int | None = None) -> list[EpochResult]:
        """Process all pending epochs (resume-safe)."""
        results = []
        for epoch_id, lo, hi in self.plan_epochs(up_to_seq):
            results.append(self.run_epoch(epoch_id, lo, hi))
        return results

    def read_table(
        self, include_tombstones: bool = False, snapshot_id: str | None = None
    ) -> DataFrame | None:
        df = self.table.read(snapshot_id=snapshot_id)
        if df is None:
            return None
        if not include_tombstones:
            df = df.filter(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        return df.drop(BUCKET_COL, TOMBSTONE_COL)

    def backfill(self, transform, note: str = "backfill") -> str | None:
        """Reprocess every committed row through ``transform`` and commit
        the result as one new snapshot — the extractor-upgrade workflow
        (new html→text logic must reach rows ingested under the old
        one; the reference's answer is re-running the whole ETL —
        src/clis/historical.py — ours rewrites in place).

        WAL bookkeeping is untouched: the ledger entry carries no
        epoch_id / end_seq, so exactly-once replay skips nothing it
        shouldn't, the high watermark is unchanged, and a subsequent
        ``apply`` is still a 0-epoch no-op. Time travel to the
        pre-backfill snapshot serves the OLD text — backfill is a new
        version, not a mutation.

        ``transform`` takes and returns a DataFrame over the physical
        columns (user columns + tombstone/bucket) and must preserve the
        column set — keys, versions, and bucketing are layout
        invariants. Tombstone rows pass through it; guard with
        ``~col('__deleted')`` when the transform should skip deletes.

        MoR delta overlays are compacted first (bounded per group, all
        groups) so the rewrite reads one layer. The rewrite itself is
        the honest full-table cost of a backfill — one bucket-
        partitioned CoW pass, shuffle bounded by the bucket layout.

        Returns the new snapshot id, or None on an empty table.
        """
        snap = self.table.current_snapshot()
        if snap is None:
            return None
        if any(f.kind == "delta" for f in snap.files):
            self.table.compact_groups(
                tombstone_retention_seqs=self.config.tombstone_retention_seqs
            )
            snap = self.table.current_snapshot()
        version = snap.schema_version
        df = self.table.read()
        out = transform(df)
        if set(out.columns) != set(df.columns):
            raise ValueError(
                f"backfill transform must preserve the column set; "
                f"got {sorted(out.columns)} vs {sorted(df.columns)}"
            )
        physical_cols = [c for c in df.columns if c != BUCKET_COL]
        snapshot_id = self.table.new_snapshot_id()
        new_files = self.table.stage(out, snapshot_id, version, physical_cols)
        return self.table.commit(
            snapshot_id, new_files, [], version, {"op": "backfill", "note": note}
        )

    def changes(
        self,
        from_snapshot: str | None,
        to_snapshot: str | None = None,
        preimage: bool = False,
    ) -> DataFrame | None:
        """Net row changes between two committed snapshots (change feed).

        The incremental physical plan (operators/changes.py has the
        semantics contract): candidate keys come from the MANIFEST DIFF
        — only files added after ``from_snapshot`` are scanned — so
        candidate work is ∝ rows written in the window, not ∝ table
        size. Per candidate key the winner among new rows is compared
        against the key's live row at A; the A-side probe is one
        payload-LIGHT (3-column pruned) scan of snapshot A joined on the
        key. Post-image payloads are fetched by a ``seq`` equi-join
        against the new files only — payload bytes never shuffle and
        never leave the window's files. A compaction inside the window
        only ADDS already-filtered candidates (rewritten rows compare
        version-equal to their A row) — correct, just less pruned.

        ``from_snapshot=None`` = from table creation (all inserts).
        ``to_snapshot=None`` = current snapshot. Like time travel, both
        snapshots must not be expired. Returns None for an empty table.
        ``preimage=True`` = Delta-CDF shape (update pre/post pairs,
        deletes carry the deleted payload) for incremental view
        maintenance — see table_changes.
        """
        from ethereum_etl_spark.operators.changes import table_changes

        return table_changes(
            self.table, self.registry, from_snapshot, to_snapshot, preimage=preimage
        )

    def read_lineage(self) -> DataFrame | None:
        if not os.listdir(self.lineage_root):
            return None
        return self.spark.read.parquet(
            *[
                os.path.join(self.lineage_root, d)
                for d in sorted(os.listdir(self.lineage_root))
            ]
        )
