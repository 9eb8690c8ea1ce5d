"""Change feed (snapshot-to-snapshot incremental reads).

Ground truth: the change feed between snapshots A and B must equal the
brute-force diff of the two time-travel reads — inserts are keys in B
only, deletes keys in A only, updates keys whose winning (warc_ts, seq)
differs, with the post-image payload from B. Net semantics: keys that
churned inside the window but ended where they started emit nothing.
"""

import pandas as pd
import pytest

from ethereum_etl_spark.plans.engine import CDCEngine, EngineConfig
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal


@pytest.fixture()
def wal_path(spark, tmp_path):
    # ooo_frac drives late data (candidates that lose the LWW race) and
    # the generator's delete ops exercise tombstone changes
    cfg = WalConfig(n_events=8_000, n_urls=1_200, ooo_frac=0.2)
    p = str(tmp_path / "wal")
    write_wal(gen_wal(spark, cfg), p, n_files=8)
    return p


def _state(engine: CDCEngine, snapshot_id: str | None) -> pd.DataFrame:
    df = engine.read_table(snapshot_id=snapshot_id)
    assert df is not None
    return df.toPandas().set_index("url")


def _expected_diff(a: pd.DataFrame | None, b: pd.DataFrame) -> pd.DataFrame:
    rows = []
    a_index = set() if a is None else set(a.index)
    for url, row in b.iterrows():
        if url not in a_index:
            rows.append((url, "insert", row["seq"]))
        elif (a.loc[url, "warc_ts"], a.loc[url, "seq"]) != (row["warc_ts"], row["seq"]):
            rows.append((url, "update_postimage", row["seq"]))
    if a is not None:
        for url in a_index - set(b.index):
            rows.append((url, "delete", None))
    return (
        pd.DataFrame(rows, columns=["url", "change_type", "seq"])
        .sort_values("url")
        .reset_index(drop=True)
    )


def _got_changes(engine: CDCEngine, from_snap: str | None, to_snap: str | None = None):
    df = engine.changes(from_snap, to_snap)
    assert df is not None
    pdf = df.toPandas()
    got = pdf[["url", "change_type", "seq"]].copy()
    got.loc[got["change_type"] == "delete", "seq"] = None
    return got.sort_values("url").reset_index(drop=True), pdf


def _assert_feed_matches(engine, from_snap, to_snap=None):
    a = _state(engine, from_snap) if from_snap is not None else None
    b = _state(engine, to_snap)
    exp = _expected_diff(a, b)
    got, _ = _got_changes(engine, from_snap, to_snap)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    return exp


def test_changes_between_snapshots(spark, wal_path, tmp_table):
    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=2_000, n_buckets=8)
    )
    results = eng.run()
    assert len(results) == 4
    snaps = [r.snapshot_id for r in results]
    exp = _assert_feed_matches(eng, snaps[1], snaps[3])
    # non-vacuous: the window must contain every change type
    assert set(exp["change_type"]) == {"insert", "update_postimage", "delete"}


def test_changes_from_creation_is_all_inserts(spark, wal_path, tmp_table):
    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=4_000, n_buckets=8)
    )
    eng.run()
    got, pdf = _got_changes(eng, None)
    assert set(got["change_type"]) == {"insert"}
    b = _state(eng, None)
    assert len(got) == len(b)
    # post-image payload rides along: text present on every insert
    assert pdf["text"].notna().all()


def test_changes_empty_window(spark, wal_path, tmp_table):
    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=4_000, n_buckets=8)
    )
    results = eng.run()
    last = results[-1].snapshot_id
    df = eng.changes(last, last)
    assert df is not None and df.count() == 0


def test_changes_across_compaction(spark, wal_path, tmp_table):
    """A compaction inside the window rewrites old rows into new files;
    those candidates must compare version-equal and emit nothing."""
    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=2_000, n_buckets=8)
    )
    results = eng.run(up_to_seq=4_000)
    snap_a = results[-1].snapshot_id
    eng.table.compact_groups()
    eng.run()
    _assert_feed_matches(eng, snap_a, None)


def test_changes_payload_is_post_image(spark, wal_path, tmp_table):
    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=2_000, n_buckets=8)
    )
    results = eng.run()
    snaps = [r.snapshot_id for r in results]
    _, pdf = _got_changes(eng, snaps[0], snaps[3])
    b = _state(eng, snaps[3])
    ups = pdf[pdf["change_type"] != "delete"]
    assert len(ups) > 0
    for _, row in ups.head(50).iterrows():
        assert b.loc[row["url"], "seq"] == row["seq"]
        assert b.loc[row["url"], "text"] == row["text"]
    dels = pdf[pdf["change_type"] == "delete"]
    assert dels["text"].isna().all() and dels["html"].isna().all()


def test_changes_preimage_feed(spark, wal_path, tmp_table):
    """preimage=True must equal the state-level spec: every update emits
    a pre/post pair (pre payload = A's row), deletes carry the DELETED
    payload, and pre-image rows carry A's version columns."""
    from ethereum_etl_spark.operators.changes import state_diff

    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=2_000, n_buckets=8)
    )
    results = eng.run()
    snaps = [r.snapshot_id for r in results]
    a_df = eng.read_table(snapshot_id=snaps[1])
    b_df = eng.read_table(snapshot_id=snaps[3])

    got = {
        (r["url"], r["change_type"]): (r["text"], r["seq"])
        for r in eng.changes(snaps[1], snaps[3], preimage=True).collect()
    }
    spec = {
        (r["url"], r["change_type"]): r["text"]
        for r in state_diff(
            a_df, b_df, ["url"], ["warc_ts", "seq"],
            ["text"], preimage=True,
        ).collect()
    }
    assert {k: v[0] for k, v in got.items()} == spec
    # every update is a pre/post PAIR; pre rows carry A's version
    a_rows = {r["url"]: (r["text"], r["seq"]) for r in a_df.collect()}
    ups = {u for (u, t) in got if t == "update_postimage"}
    pres = {u for (u, t) in got if t == "update_preimage"}
    assert ups == pres and ups
    for u in pres:
        assert got[(u, "update_preimage")] == a_rows[u]
    # deletes carry the deleted payload, not null
    dels = [(u, t) for (u, t) in got if t == "delete"]
    assert dels
    for u, t in dels:
        assert got[(u, t)] == a_rows[u]


def test_changes_tombstone_expiry_fallback(spark, wal_path, tmp_table):
    """A compaction INSIDE the window that expires tombstones removes the
    only evidence of deletes from the window's files. The ledger-recorded
    cutoff must route the feed to the full-diff fallback, which still
    reports every delete (vs the brute-force time-travel diff)."""
    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=2_000, n_buckets=8)
    )
    results = eng.run(up_to_seq=4_000)
    snap_a = results[-1].snapshot_id
    eng.run()
    # retention 0: cutoff = high watermark — every tombstone expires,
    # including ones for keys that were live at A (cutoff > A's hw)
    eng.table.compact_groups(tombstone_retention_seqs=0)
    ledger = eng.table.read_ledger()
    assert any(
        e.get("compaction") and "tombstone_cutoff" in e for e in ledger
    ), "compaction must record its expiry cutoff"
    _assert_feed_matches(eng, snap_a, None)
    # sanity: the window genuinely contains deletes (non-vacuous)
    got, _ = _got_changes(eng, snap_a, None)
    assert (got["change_type"] == "delete").any()


def test_changes_retention_compliant_compaction_stays_incremental(
    spark, wal_path, tmp_table
):
    """With retention longer than the window (cutoff ≤ A's watermark) the
    incremental manifest-diff path stays active and stays correct."""
    eng = CDCEngine(
        spark, wal_path, tmp_table, config=EngineConfig(epoch_size=2_000, n_buckets=8)
    )
    results = eng.run(up_to_seq=4_000)
    snap_a = results[-1].snapshot_id
    eng.run()
    # cutoff = hw − 8000 < 0 ≤ A's watermark: no tombstone the feed
    # needs can have been dropped — no fallback
    eng.table.compact_groups(tombstone_retention_seqs=8_000)
    from ethereum_etl_spark.operators import changes as changes_mod

    called = []
    orig = changes_mod._full_state_changes

    def spy(*a, **kw):
        called.append(1)
        return orig(*a, **kw)

    changes_mod._full_state_changes = spy
    try:
        _assert_feed_matches(eng, snap_a, None)
    finally:
        changes_mod._full_state_changes = orig
    assert not called, "retention-compliant window must not fall back"
