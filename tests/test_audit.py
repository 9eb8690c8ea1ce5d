"""Write-audit-publish: a staged epoch that violates a declared
constraint publishes NOTHING (no manifest, no ledger entry), and the
table recovers by re-running once the gate passes.
"""

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.plans.engine import AuditError, CDCEngine, EngineConfig
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("audit")
    path = str(root / "wal")
    write_wal(
        gen_wal(spark, WalConfig(n_events=4_000, n_urls=600)), path, n_files=4
    )
    return path


def _engine(spark, wal, table, audits):
    return CDCEngine(
        spark, wal, table,
        config=EngineConfig(epoch_size=2_000, n_buckets=8, audits=audits),
    )


def test_passing_audits_commit_normally(spark, wal, tmp_path):
    eng = _engine(spark, wal, str(tmp_path / "t"), audits=[
        {"check": "not_null", "column": "url"},
        {"check": "max_tombstone_frac", "limit": 1.0},
        {"check": "max_rows", "limit": 10**9},
        {"check": "min_rows", "limit": 1},
    ])
    results = eng.run()
    assert len(results) == 2 and all(not r.skipped for r in results)
    assert eng.table.high_watermark() == 3_999


def test_failing_count_audit_publishes_nothing(spark, wal, tmp_path):
    table = str(tmp_path / "t")
    eng = _engine(spark, wal, table, audits=[{"check": "min_rows", "limit": 10**9}])
    with pytest.raises(AuditError) as exc:
        eng.run()
    assert exc.value.failures[0]["check"] == "min_rows"
    assert eng.table.current_snapshot() is None
    assert eng.table.high_watermark() == -1

    # recovery: drop the gate, same table, replay commits cleanly
    eng2 = _engine(spark, wal, table, audits=[])
    results = eng2.run()
    assert len(results) == 2
    assert eng2.table.high_watermark() == 3_999


def test_failing_column_audit_reports_actual(spark, wal, tmp_path):
    """The WAL contains deletes, so a zero-tombstone gate must trip and
    report the observed fraction from the staged-file scan."""
    eng = _engine(
        spark, wal, str(tmp_path / "t"),
        audits=[{"check": "max_tombstone_frac", "limit": 0.0}],
    )
    with pytest.raises(AuditError) as exc:
        eng.run()
    f = exc.value.failures[0]
    assert f["check"] == "max_tombstone_frac"
    assert f["actual"] > 0.0
    assert eng.table.current_snapshot() is None


def test_null_frac_ignores_tombstones(spark, wal, tmp_path):
    """Deletes carry null text by design; the not_null gate on text must
    consider LIVE rows only — live winners always have extracted text,
    so the gate passes even though delete rows exist."""
    eng = _engine(
        spark, wal, str(tmp_path / "t"),
        audits=[{"check": "not_null", "column": "text"}],
    )
    results = eng.run()
    assert len(results) == 2
    # sanity: the final state really has no null text among live rows
    assert eng.read_table().filter(F.col("text").isNull()).count() == 0


def test_unknown_check_rejected(spark, wal, tmp_path):
    eng = _engine(spark, wal, str(tmp_path / "t"),
                  audits=[{"check": "nope", "limit": 1}])
    with pytest.raises(ValueError):
        eng.run()


def test_vacuum_removes_audit_orphans_only(spark, wal, tmp_path):
    """A failed-audit stage leaves unreferenced files; vacuum removes
    exactly those, leaving every committed snapshot's files and the
    table state intact."""
    import glob
    import os

    table = str(tmp_path / "t")
    # commit one clean epoch first
    eng = _engine(spark, wal, table, audits=[])
    eng.config.epoch_size = 4_000
    eng.run()
    before = eng.read_table().count()
    n_files_before = len(glob.glob(os.path.join(table, "data", "**", "*.parquet"),
                                   recursive=True))

    # an audit-rejected apply on a separate table: stage then abort
    aborted = str(tmp_path / "aborted")
    eng2 = _engine(spark, wal, aborted, audits=[{"check": "min_rows", "limit": 10**9}])
    with pytest.raises(AuditError):
        eng2.run()
    orphan_files = glob.glob(os.path.join(aborted, "data", "**", "*.parquet"),
                             recursive=True)
    assert orphan_files, "failed audit must leave staged files behind"

    assert eng.table.vacuum_orphans(older_than_s=0) == 0  # clean table: no-op
    n = eng2.table.vacuum_orphans(older_than_s=0)
    assert n == len(orphan_files)
    assert not glob.glob(os.path.join(aborted, "data", "**", "*.parquet"),
                         recursive=True)

    # grace period protects young files: restage and vacuum with 1h grace
    eng3 = _engine(spark, wal, aborted, audits=[{"check": "min_rows", "limit": 10**9}])
    with pytest.raises(AuditError):
        eng3.run()
    assert eng3.table.vacuum_orphans(older_than_s=3600) == 0

    # committed table unchanged throughout
    assert eng.read_table().count() == before
    n_files_after = len(glob.glob(os.path.join(table, "data", "**", "*.parquet"),
                                  recursive=True))
    assert n_files_after == n_files_before
