"""Backfill (reprocessing): transform committed rows into a new
snapshot without disturbing WAL bookkeeping or history."""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.snapshot_table import TOMBSTONE_COL
from ethereum_etl_spark.plans.engine import CDCEngine, EngineConfig
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("backfill")
    wal = str(root / "wal")
    write_wal(gen_wal(spark, WalConfig(n_events=4_000, n_urls=600)), wal, n_files=4)
    eng = CDCEngine(
        spark, wal, str(root / "pages"),
        config=EngineConfig(epoch_size=2_000, n_buckets=8, n_delta_groups=4),
    )
    eng.run()
    return eng


def _upper_text(df):
    live = ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
    return df.withColumn(
        "text", F.when(live, F.upper(F.col("text"))).otherwise(F.col("text"))
    )


def test_backfill_rewrites_and_preserves_bookkeeping(spark, engine):
    before = {r["url"]: r["text"] for r in engine.read_table().collect()}
    pre_snapshot = engine.table.current_snapshot().snapshot_id
    hw = engine.table.high_watermark()

    sid = engine.backfill(_upper_text, note="upper-v2")
    assert sid is not None

    after = {r["url"]: r["text"] for r in engine.read_table().collect()}
    assert set(after) == set(before)
    assert all(after[u] == before[u].upper() for u in before)

    # WAL bookkeeping untouched: hw unchanged, replay is still a no-op
    assert engine.table.high_watermark() == hw
    assert engine.run() == []

    # history intact: the pre-backfill snapshot still serves OLD text
    old = {
        r["url"]: r["text"]
        for r in engine.read_table(snapshot_id=pre_snapshot).collect()
    }
    assert old == before


def test_backfill_compacts_then_single_layer(spark, engine):
    snap = engine.table.current_snapshot()
    assert all(f.kind == "base" for f in snap.files), (
        "backfill must leave a compacted single-layer table"
    )
    # point lookup still file-skips on the rewritten layout
    url = engine.read_table().select("url").first()["url"]
    df, scanned, total = engine.table.read_key(url)
    assert df.count() == 1 and 0 < scanned < total


def test_backfill_rejects_schema_change(spark, engine):
    with pytest.raises(ValueError, match="column set"):
        engine.backfill(lambda df: df.drop("text"))


def test_backfill_empty_table_is_noop(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(gen_wal(spark, WalConfig(n_events=0, n_urls=1)), wal, n_files=1)
    eng = CDCEngine(spark, wal, str(tmp_path / "t"),
                    config=EngineConfig(epoch_size=100, n_buckets=4))
    assert eng.backfill(_upper_text) is None
