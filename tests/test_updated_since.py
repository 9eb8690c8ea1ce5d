"""Time-addressed incremental read (read_updated_since): manifest
min/max pruning + exactness vs the full MoR read.

The pruned read must return exactly `read().filter(warc_ts >= T)`
(current versions only, tombstones out) while planning only the files
whose footer ts_max reaches T — on an ingest-ordered WAL that is the
recent tail, not the whole table.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.snapshot_table import DataFile
from ethereum_etl_spark.plans.engine import CDCEngine, EngineConfig
from ethereum_etl_spark.sources.walgen import BASE_TS, WalConfig, gen_wal, write_wal

N_EVENTS = 6_000


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("since")
    wal = str(root / "wal")
    write_wal(
        gen_wal(spark, WalConfig(n_events=N_EVENTS, n_urls=900, ooo_frac=0.1)),
        wal, n_files=6,
    )
    eng = CDCEngine(
        spark, wal, str(root / "pages"),
        config=EngineConfig(epoch_size=1_500, n_buckets=8, n_delta_groups=4),
    )
    eng.run()
    return eng


def _expected(engine, ts_lo):
    return {
        r["url"]: (r["seq"], r["warc_ts"])
        for r in engine.read_table().filter(F.col("warc_ts") >= F.lit(ts_lo)).collect()
    }


def test_matches_full_read_and_prunes(engine):
    ts_lo = dt.datetime.utcfromtimestamp(BASE_TS + int(N_EVENTS * 0.8))
    df, scanned, total = engine.table.read_updated_since(ts_lo)
    got = {r["url"]: (r["seq"], r["warc_ts"]) for r in df.collect()}
    assert got == _expected(engine, ts_lo)
    assert 0 < scanned < total, "recent-tail read must skip old files"


def test_epoch_micros_bound_equivalent(engine):
    ts_lo = dt.datetime.utcfromtimestamp(BASE_TS + int(N_EVENTS * 0.8))
    us = int(ts_lo.timestamp() * 1_000_000)
    df_dt, s1, _ = engine.table.read_updated_since(ts_lo)
    df_us, s2, _ = engine.table.read_updated_since(us)
    assert s1 == s2
    assert sorted(r["url"] for r in df_dt.collect()) == sorted(
        r["url"] for r in df_us.collect()
    )


def test_bound_below_everything_scans_all_and_equals_state(engine):
    df, scanned, total = engine.table.read_updated_since(0)
    assert scanned == total
    full = engine.read_table()
    assert df.count() == full.count()


def test_bound_above_everything_reads_nothing(engine):
    ts_lo = dt.datetime.utcfromtimestamp(BASE_TS + 10 * N_EVENTS)
    df, scanned, total = engine.table.read_updated_since(ts_lo)
    assert scanned == 0 and total > 0
    assert df is None


def test_footer_stats_recorded(engine):
    snap = engine.table.current_snapshot()
    with_stats = [f for f in snap.files if f.ts_max is not None]
    assert with_stats, "data files must carry footer ts bounds"
    for f in with_stats:
        assert f.ts_min <= f.ts_max


def test_legacy_manifest_defaults_to_unknown_bounds():
    """Manifests written before ts stats existed load with None bounds
    (never skipped)."""
    f = DataFile.from_json(
        {"path": "p", "bucket": 0, "schema_version": 1, "rows": 1, "bytes": 1}
    )
    assert f.ts_min is None and f.ts_max is None


def test_time_travel_updated_since(engine):
    """updated-since composes with VERSION AS OF: at an earlier
    snapshot, later epochs' rows are invisible even when newer than
    the bound."""
    ledger = [e for e in engine.table.read_ledger() if "epoch_id" in e]
    assert len(ledger) >= 2
    early = ledger[0]["snapshot_id"]
    df, scanned, total = engine.table.read_updated_since(0, snapshot_id=early)
    got = {r["url"] for r in df.collect()}
    full_early = {r["url"] for r in engine.read_table(snapshot_id=early).collect()}
    assert got == full_early
    assert total < len(engine.table.current_snapshot().files)
