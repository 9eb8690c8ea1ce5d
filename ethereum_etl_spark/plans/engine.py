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
from ethereum_etl_spark.operators.lww import lww_agg, lww_salted
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
)


class InjectedCrash(RuntimeError):
    """Raised by test-configured crash points (fault injection)."""


@dataclass
class EngineConfig:
    epoch_size: int = 50_000  # events per epoch (maxOffsetsPerTrigger analog)
    n_buckets: int = 32
    lww_method: str = "auto"  # auto | agg | salted | window
    n_salt: int = 16
    skew_threshold: float = 0.2  # key share above which 'auto' salts
    skew_sample_frac: float = 0.05
    skew_min_events: int = 10_000  # don't bother probing tiny epochs
    broadcast_merge_max_rows: int = 2_000_000  # winners = (key, version) only
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
        )
        self.lineage_root = os.path.join(table_root, "lineage")
        os.makedirs(self.lineage_root, exist_ok=True)

    # ------------------------------------------------------------------

    def _wal(self) -> DataFrame:
        from ethereum_etl_spark.schemas import CHANGE_EVENT_SCHEMA

        return self.spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(self.wal_path)

    def wal_max_seq(self) -> int:
        row = self._wal().agg(F.max("seq").alias("m")).collect()[0]
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

    def _detect_skew(self, slice_df: DataFrame, n_events: int) -> bool:
        """Sampled heaviness probe: is any single key > threshold share?"""
        cfg = self.config
        if n_events < cfg.skew_min_events:
            return False
        sample = slice_df.select("url").sample(cfg.skew_sample_frac, seed=7)
        top = (
            sample.groupBy("url").count().agg(F.max("count").alias("m")).collect()[0]["m"]
        )
        total = max(int(n_events * cfg.skew_sample_frac), 1)
        return top is not None and top / total > cfg.skew_threshold

    def run_epoch(self, epoch_id: int, lo: int, hi: int) -> EpochResult:
        cfg = self.config
        committed = self.table.committed_epochs()
        if epoch_id in committed:  # exactly-once resume: skip verbatim
            e = committed[epoch_id]
            return EpochResult(
                epoch_id, e["start_seq"], e["end_seq"], 0, 0, e["snapshot_id"], skipped=True
            )

        wal = self._wal()
        slice_df = wal.filter((F.col("seq") > lo) & (F.col("seq") <= hi))

        # -- lineage pass 1: per-input-partition offsets/counts/bytes ----
        lineage = (
            slice_df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.min("seq").alias("start_seq"),
                F.max("seq").alias("end_seq"),
                F.count("*").alias("row_count"),
                F.coalesce(F.sum(F.length("html")), F.lit(0)).alias("bytes"),
            )
            .collect()
        )
        n_events = sum(r["row_count"] for r in lineage)
        if n_events == 0:
            snapshot_id = self.table.write_snapshot(
                None, self.table.current_snapshot().files if self.table.current_snapshot() else [],
                self.registry.version_at(hi),
                {"epoch_id": epoch_id, "start_seq": lo, "end_seq": hi, "n_events": 0},
                [],
            )
            return EpochResult(epoch_id, lo, hi, 0, 0, snapshot_id)

        # -- dedup: LWW winners per url (op rides along) ------------------
        method = cfg.lww_method
        if method == "auto":
            method = "salted" if self._detect_skew(slice_df, n_events) else "agg"
        if method == "salted":
            winners = lww_salted(slice_df, n_salt=cfg.n_salt)
        elif method == "window":
            from ethereum_etl_spark.operators.lww import lww_window

            winners = lww_window(slice_df)
        else:
            winners = lww_agg(slice_df)

        # -- extract text on winners only (Arrow-vectorized UDF) ---------
        version = self.registry.version_at(hi)
        schema = self.registry.schema_at(hi)
        data_cols = [f.name for f in schema.fields]
        winners = winners.withColumn(
            "text",
            F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(
                extract_text_udf(F.col("html"))
            ),
        )
        # rename-aware ingestion: WAL columns written under an old name
        # follow the registry's rename chain into the current schema
        for ch in self.registry.changes:
            if ch.schema_version <= version and "rename_column" in ch.change:
                spec = ch.change["rename_column"]
                if spec["from"] in winners.columns and spec["to"] not in winners.columns:
                    winners = winners.withColumnRenamed(spec["from"], spec["to"])
        for c in data_cols:  # schema tolerance (reference .get() posture)
            if c not in winners.columns:
                winners = winners.withColumn(c, F.lit(None).cast(dict(
                    (f.name, f.dataType) for f in schema.fields)[c]))
        physical_cols = data_cols + [TOMBSTONE_COL]
        winners = (
            winners.withColumn(TOMBSTONE_COL, F.col("op") == "delete")
            .select(*physical_cols)
            .withColumn(BUCKET_COL, bucket_expr("url", self.table.n_buckets))
        )
        winners = winners.persist()
        try:
            affected = {
                r[BUCKET_COL]
                for r in winners.select(BUCKET_COL).distinct().collect()
            }
            n_keys = winners.count()

            # -- merge vs affected buckets (copy-on-write) ----------------
            target_df, untouched, touched_rows = self.table.read_buckets(affected, version)
            if target_df is not None:
                target_df = target_df.drop(BUCKET_COL)
            merged = merge_union_lww(
                target_df,
                winners.drop(BUCKET_COL),
                key_col="url",
                version_cols=("warc_ts", "seq"),
                data_cols=physical_cols,
                broadcast_winners=(n_keys + touched_rows) <= cfg.broadcast_merge_max_rows,
            ).withColumn(BUCKET_COL, bucket_expr("url", self.table.n_buckets))

            # -- stage files, write lineage, THEN atomically commit -------
            snapshot_id = self.table.new_snapshot_id()
            new_files = self.table.stage(merged, snapshot_id, version, physical_cols)
            self._maybe_crash("after_stage")
            self._write_lineage(epoch_id, lineage, snapshot_id)
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
            winners.unpersist()
        return EpochResult(epoch_id, lo, hi, n_events, n_keys, snapshot_id)

    def _write_lineage(self, epoch_id: int, rows: list, snapshot_id: str) -> None:
        """Idempotent per-epoch lineage parquet (overwrite on re-run)."""
        import pandas as pd

        pdf = pd.DataFrame(
            [
                {
                    "epoch_id": epoch_id,
                    "partition_id": r["partition_id"],
                    "start_seq": r["start_seq"],
                    "end_seq": r["end_seq"],
                    "row_count": r["row_count"],
                    "bytes": r["bytes"],
                    "snapshot_id": snapshot_id,
                }
                for r in rows
            ]
        )
        out = os.path.join(self.lineage_root, f"epoch={epoch_id}")
        self.spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(out)

    # ------------------------------------------------------------------

    def run(self, up_to_seq: int | None = None) -> list[EpochResult]:
        """Process all pending epochs (resume-safe)."""
        results = []
        for epoch_id, lo, hi in self.plan_epochs(up_to_seq):
            results.append(self.run_epoch(epoch_id, lo, hi))
        return results

    def read_table(self, include_tombstones: bool = False) -> DataFrame | None:
        df = self.table.read()
        if df is None:
            return None
        if not include_tombstones:
            df = df.filter(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        return df.drop(BUCKET_COL, TOMBSTONE_COL)

    def read_lineage(self) -> DataFrame | None:
        if not os.listdir(self.lineage_root):
            return None
        return self.spark.read.parquet(
            *[
                os.path.join(self.lineage_root, d)
                for d in sorted(os.listdir(self.lineage_root))
            ]
        )
