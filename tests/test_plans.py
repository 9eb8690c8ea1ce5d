"""Physical-plan regression guards for the scale-critical paths.

These assert the *shape* of the plans (column pruning, no payload
window-sort), not results — so a refactor that silently reintroduces a
whole-payload shuffle or un-prunes a scan fails fast.
"""

from pyspark.sql import functions as F

from ethereum_etl_spark.plans.engine import CDCEngine, EngineConfig
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal, write_wal


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mor_read_plan_is_payload_light(spark, tmp_path, tmp_table):
    """The MoR read collapse must (a) compute winners from a scan pruned
    to (url, warc_ts, seq) and (b) contain NO window operator — the
    round-1 review found the read path window-sorting full payload rows
    between compactions."""
    p = str(tmp_path / "wal")
    write_wal(gen_wal(spark, WalConfig(n_events=3_000, n_urls=400)), p, n_files=2)
    eng = CDCEngine(
        spark, p, tmp_table,
        config=EngineConfig(epoch_size=1_000, n_buckets=4, compact_max_deltas=0),
    )
    eng.run()
    assert eng.table.delta_depth()  # deltas present → collapse path active
    plan = _executed_plan(eng.table.read())
    assert "Window" not in plan, "payload rows must not pass through a window sort"
    # the winner subtree scans exactly the 3 dedup columns
    pruned = [
        line for line in plan.splitlines()
        if "ReadSchema" in line and "html" not in line
    ]
    assert any(
        "url" in line and "warc_ts" in line and "seq" in line for line in pruned
    ), f"no 3-column pruned winner scan found:\n{plan}"


def test_lww_agg_winner_scan_prunes_payload(spark, tmp_path):
    """lww_agg's winner aggregation must push a payload-free ReadSchema
    down to parquet (winners travel as ~24-byte tuples)."""
    p = str(tmp_path / "wal_prune")
    write_wal(gen_wal(spark, WalConfig(n_events=2_000, n_urls=300)), p, n_files=2)
    from ethereum_etl_spark.operators.lww import lww_agg

    wal = spark.read.parquet(p)
    winners_only_keys = lww_agg(wal).select("url", "seq")
    plan = _executed_plan(winners_only_keys)
    # at least one scan must carry no html column (the agg side); the
    # payload side is fetched by join, so html appears at most once
    assert plan.count("html") <= 1, plan


def test_grouped_delta_write_plan_has_no_shuffle(spark, tmp_path, tmp_table):
    """The MoR epoch write's PAYLOAD path must stay shuffle-free: winner
    seqs broadcast into the payload scan (never a sort-merge join, which
    would shuffle+sort html bytes), group id computed map-side. The only
    exchanges allowed feed the winner aggregation over ~24-byte
    tuples."""
    p = str(tmp_path / "wal_nosh")
    write_wal(gen_wal(spark, WalConfig(n_events=3_000, n_urls=400)), p, n_files=2)
    eng = CDCEngine(spark, p, tmp_table, config=EngineConfig(epoch_size=3_000, n_buckets=4))

    from ethereum_etl_spark.operators.snapshot_table import SnapshotTable

    captured: list[str] = []
    orig = SnapshotTable.stage_delta_grouped

    def spy(self, new_rows, *a, **kw):
        captured.append(_executed_plan(new_rows))
        return orig(self, new_rows, *a, **kw)

    SnapshotTable.stage_delta_grouped = spy
    try:
        eng.run()
    finally:
        SnapshotTable.stage_delta_grouped = orig
    assert captured
    # winner seqs are force-broadcast below the threshold, so the staged
    # rows' plan must contain a BroadcastHashJoin and no sort-merge join
    assert "BroadcastHashJoin" in captured[0]
    assert "SortMergeJoin" not in captured[0]


def test_multi_table_pages_write_plan_has_no_payload_shuffle(spark, tmp_path):
    """The multi-table pages branch must use the SAME winner-seqs +
    broadcast seq equi-join shape as the single-table MoR path: the
    staged rows' plan joins payload by BroadcastHashJoin on seq (never
    a sort-merge join, which would shuffle+sort html bytes)."""
    from ethereum_etl_spark.operators.snapshot_table import SnapshotTable
    from ethereum_etl_spark.plans.multi import MultiTableEngine

    p = str(tmp_path / "wal_multi_plan")
    write_wal(gen_wal(spark, WalConfig(n_events=3_000, n_urls=400)), p, n_files=2)

    captured: list[str] = []
    orig = SnapshotTable.stage_delta_grouped

    def spy(self, new_rows, *a, **kw):
        captured.append(_executed_plan(new_rows))
        return orig(self, new_rows, *a, **kw)

    SnapshotTable.stage_delta_grouped = spy
    try:
        MultiTableEngine(
            spark, p, str(tmp_path / "multi_plan"), epoch_size=3_000
        ).run()
    finally:
        SnapshotTable.stage_delta_grouped = orig
    assert captured
    assert "BroadcastHashJoin" in captured[0]
    assert "SortMergeJoin" not in captured[0]
