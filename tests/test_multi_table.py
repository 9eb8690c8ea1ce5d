"""Multi-table fan-out: one WAL → pages + host_stats under ONE atomic
group-ledger commit (reference: one stream feeds 14 entity tables,
src/tasks/dag.py:32-49). Crash matrix proves all-or-nothing epochs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.oracle import expected_final_state
from ethereum_etl_spark.plans.multi import InjectedCrash, MultiTableEngine
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal


def _mk_wal(spark, tmp_path, n_events=3_000, n_urls=400):
    p = str(tmp_path / "wal")
    write_wal(gen_wal(spark, WalConfig(n_events=n_events, n_urls=n_urls)), p, n_files=4)
    return p


def _expected_hosts(wal_pdf: pd.DataFrame) -> pd.DataFrame:
    d = wal_pdf.copy()
    d["host"] = d["url"].str.extract(r"https?://([^/]+)/")[0]
    g = d.groupby("host")
    out = pd.DataFrame(
        {
            "n_events": g.size(),
            "n_inserts": g.apply(lambda x: (x["op"] == "insert").sum(), include_groups=False),
            "n_updates": g.apply(lambda x: (x["op"] == "update").sum(), include_groups=False),
            "n_deletes": g.apply(lambda x: (x["op"] == "delete").sum(), include_groups=False),
            "last_seq": g["seq"].max(),
        }
    ).reset_index()
    return out.sort_values("host").reset_index(drop=True)


def _hosts_pdf(eng: MultiTableEngine) -> pd.DataFrame:
    return (
        eng.read_hosts()
        .select("host", "n_events", "n_inserts", "n_updates", "n_deletes", "last_seq")
        .toPandas()
        .sort_values("host")
        .reset_index(drop=True)
    )


def _pages_pdf(eng: MultiTableEngine) -> pd.DataFrame:
    pdf = eng.read_pages().toPandas().sort_values("url").reset_index(drop=True)
    pdf["html"] = pdf["html"].map(lambda b: bytes(b) if b is not None else None)
    return pdf


def test_multi_table_final_state_both_tables(spark, tmp_path):
    wal = _mk_wal(spark, tmp_path)
    eng = MultiTableEngine(spark, wal, str(tmp_path / "multi"), epoch_size=1_000)
    results = eng.run()
    assert len(results) == 3 and not any(r.skipped for r in results)
    wal_pdf = spark.read.parquet(wal).toPandas()

    exp_pages = expected_final_state(wal_pdf).reset_index(drop=True)
    got_pages = _pages_pdf(eng)[["url", "warc_ts", "seq", "html", "text"]]
    pd.testing.assert_frame_equal(got_pages, exp_pages, check_dtype=False)

    pd.testing.assert_frame_equal(
        _hosts_pdf(eng), _expected_hosts(wal_pdf), check_dtype=False
    )

    # re-run: every epoch is a group-ledger skip, state unchanged
    eng2 = MultiTableEngine(spark, wal, str(tmp_path / "multi"), epoch_size=1_000)
    assert all(r.skipped for r in eng2.run())
    pd.testing.assert_frame_equal(_hosts_pdf(eng2), _expected_hosts(wal_pdf), check_dtype=False)

    # pages maintenance (compaction) is a member-ledger-only commit the
    # group reconciliation tolerates; logical state is unchanged by it
    eng2.pages.compact_groups()
    assert eng2.pages.delta_depth() == {}
    after = _pages_pdf(eng2)[["url", "warc_ts", "seq", "html", "text"]]
    pd.testing.assert_frame_equal(after, exp_pages, check_dtype=False)
    assert all(r.skipped for r in MultiTableEngine(
        spark, wal, str(tmp_path / "multi"), epoch_size=1_000
    ).run())


def test_multi_table_crash_before_group_commit_is_invisible(spark, tmp_path):
    """Crash after BOTH tables staged but before the group commit: neither
    table may observe anything (all-or-nothing)."""
    wal = _mk_wal(spark, tmp_path)
    root = str(tmp_path / "multi")
    eng = MultiTableEngine(
        spark, wal, root, epoch_size=1_000, crash_points={"after_stage"}
    )
    with pytest.raises(InjectedCrash):
        eng.run()
    assert eng.high_watermark() == -1
    assert eng.pages.current_snapshot() is None
    assert eng.hosts.current_snapshot() is None

    eng2 = MultiTableEngine(spark, wal, root, epoch_size=1_000)
    results = eng2.run()
    assert len(results) == 3 and not any(r.skipped for r in results)
    wal_pdf = spark.read.parquet(wal).toPandas()
    pd.testing.assert_frame_equal(_hosts_pdf(eng2), _expected_hosts(wal_pdf), check_dtype=False)


def test_multi_table_crash_after_group_commit_reconciles(spark, tmp_path):
    """Crash after the group commit but before member-ledger append: the
    group entry is authoritative; a fresh engine reconciles member
    ledgers and the epoch is skipped (no re-apply, no loss)."""
    wal = _mk_wal(spark, tmp_path)
    root = str(tmp_path / "multi")
    eng = MultiTableEngine(
        spark, wal, root, epoch_size=1_000, crash_points={"after_group_commit"}
    )
    with pytest.raises(InjectedCrash):
        eng.run()
    # group ledger has epoch 0; member ledgers were NOT appended
    assert eng.high_watermark() == 999
    assert eng.pages.read_ledger() == [] and eng.hosts.read_ledger() == []

    eng2 = MultiTableEngine(spark, wal, root, epoch_size=1_000)  # reconciles on init
    assert len(eng2.pages.read_ledger()) == 1 and len(eng2.hosts.read_ledger()) == 1
    results = eng2.run()
    assert len(results) == 2 and not any(r.skipped for r in results)
    wal_pdf = spark.read.parquet(wal).toPandas()
    pd.testing.assert_frame_equal(_hosts_pdf(eng2), _expected_hosts(wal_pdf), check_dtype=False)
    exp_pages = expected_final_state(wal_pdf).reset_index(drop=True)
    got_pages = _pages_pdf(eng2)[["url", "warc_ts", "seq", "html", "text"]]
    pd.testing.assert_frame_equal(got_pages, exp_pages, check_dtype=False)
