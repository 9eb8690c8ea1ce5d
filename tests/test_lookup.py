"""Point lookup (read_key): file-skipping + correctness vs full read.

The lookup must return exactly the key's row from the full MoR read
(LWW winner, tombstones respected) while planning only the key's hash
bucket's base files and its compaction group's delta files.
"""

import pytest

from ethereum_etl_spark.plans.engine import CDCEngine, EngineConfig
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lookup")
    wal = str(root / "wal")
    write_wal(gen_wal(spark, WalConfig(n_events=6_000, n_urls=900, ooo_frac=0.1)), wal, n_files=6)
    eng = CDCEngine(
        spark, wal, str(root / "pages"),
        config=EngineConfig(epoch_size=1_500, n_buckets=8, n_delta_groups=4),
    )
    eng.run()
    return eng


def test_lookup_matches_full_read(spark, engine):
    full = {r["url"]: r for r in engine.read_table().collect()}
    # live keys: lookup returns the exact winner row with fewer files
    for url in list(full)[:5]:
        df, scanned, total = engine.table.read_key(url)
        rows = df.collect()
        assert len(rows) == 1
        got = rows[0]
        exp = full[url]
        assert (got["seq"], got["warc_ts"], got["text"]) == (
            exp["seq"], exp["warc_ts"], exp["text"]
        )
        assert 0 < scanned < total, "lookup must prune the manifest file list"


def test_lookup_deleted_and_absent_keys(spark, engine):
    live = {r["url"] for r in engine.read_table().collect()}
    dead = {r["url"] for r in engine.read_table(include_tombstones=True).collect()} - live
    assert dead, "fixture must contain deleted keys"
    df, _, _ = engine.table.read_key(next(iter(dead)))
    assert df.count() == 0
    df, _, _ = engine.table.read_key("https://never-seen.example/x")
    assert df.count() == 0


def test_lookup_time_travel(spark, engine):
    entries = [e for e in engine.table.read_ledger() if "snapshot_id" in e and "epoch_id" in e]
    first_snap = entries[0]["snapshot_id"]
    early = {r["url"]: r for r in engine.read_table(snapshot_id=first_snap).collect()}
    url, exp = next(iter(early.items()))
    df, _, _ = engine.table.read_key(url, snapshot_id=first_snap)
    got = df.collect()[0]
    assert (got["seq"], got["warc_ts"]) == (exp["seq"], exp["warc_ts"])


def test_lookup_scan_fraction(engine):
    """Files scanned ≈ bases/n_buckets + deltas/n_delta_groups — the
    manifest prune must beat 1/2 of the table comfortably at 8 buckets."""
    url = engine.read_table().select("url").first()["url"]
    _, scanned, total = engine.table.read_key(url)
    assert scanned <= total // 2
