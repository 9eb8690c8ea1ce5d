"""CLI-path behavior: tombstone retention defaults (the 10^10-churn
posture must be the default, not an opt-in)."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark import cli
from ethereum_etl_spark.plans.engine import CDCEngine, EngineConfig
from ethereum_etl_spark.schemas import CHANGE_EVENT_SCHEMA


def _ts(s):
    return pd.Timestamp("2024-01-01", tz="UTC").to_pydatetime() + pd.Timedelta(seconds=s)


@pytest.fixture()
def churn_wal(spark, tmp_path):
    """Key deleted early, then enough later traffic that the tombstone
    falls out of any sane replay window."""
    rows = [(1, "insert", "https://a.example.com/x", _ts(100), b"<html>a</html>", None),
            (2, "delete", "https://a.example.com/x", _ts(200), None, None)]
    rows += [
        (3 + i, "insert", f"https://b.example.com/{i}", _ts(300 + i), b"<html>b</html>", None)
        for i in range(300)
    ]
    p = str(tmp_path / "wal_cli")
    spark.createDataFrame(rows, schema=CHANGE_EVENT_SCHEMA).write.parquet(p)
    return p


def _run(argv):
    rc = cli.main(argv)
    assert rc == 0


def test_cli_compact_drops_expired_tombstone_by_default(spark, churn_wal, tmp_path, capsys):
    """`apply` + `compact` with NO retention flag: default window is
    20x epoch size (here 200 seqs < tombstone age 300), so the expired
    tombstone is gone after compaction while live rows are unchanged."""
    table = str(tmp_path / "t_cli")
    _run(["apply", "--wal", churn_wal, "--table", table,
          "--epoch-size", "10", "--n-buckets", "4"])
    _run(["compact", "--wal", churn_wal, "--table", table,
          "--epoch-size", "10", "--n-buckets", "4"])
    capsys.readouterr()
    eng = CDCEngine(spark, churn_wal, table, config=EngineConfig(n_buckets=4))
    assert eng.read_table().count() == 300
    assert eng.read_table(include_tombstones=True).filter(
        F.col("url") == "https://a.example.com/x"
    ).count() == 0, "long-expired tombstone must be dropped via the CLI path"


def test_cli_retain_forever_flag(spark, churn_wal, tmp_path, capsys):
    table = str(tmp_path / "t_cli_keep")
    _run(["apply", "--wal", churn_wal, "--table", table,
          "--epoch-size", "10", "--n-buckets", "4",
          "--tombstone-retention-seqs", "-1"])
    _run(["compact", "--wal", churn_wal, "--table", table,
          "--epoch-size", "10", "--n-buckets", "4",
          "--tombstone-retention-seqs", "-1"])
    out = capsys.readouterr().out
    assert json.loads(out.strip().splitlines()[-1])["snapshot"]
    eng = CDCEngine(spark, churn_wal, table, config=EngineConfig(n_buckets=4))
    assert eng.read_table(include_tombstones=True).filter(
        F.col("url") == "https://a.example.com/x"
    ).count() == 1, "-1 must retain tombstones forever"
