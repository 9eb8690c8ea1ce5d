"""LWW dedup: three physical plans, one logical result (SURVEY.md A6)."""

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.lww import lww_agg, lww_salted, lww_window
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal


def _as_sorted_keys(df):
    return sorted(
        (r["url"], r["warc_ts"], r["seq"], r["op"])
        for r in df.select("url", "warc_ts", "seq", "op").collect()
    )


def test_window_agg_salted_equivalent(spark):
    wal = gen_wal(spark, WalConfig(n_events=5_000, n_urls=400, ooo_frac=0.3))
    w = _as_sorted_keys(lww_window(wal))
    a = _as_sorted_keys(lww_agg(wal))
    s = _as_sorted_keys(lww_salted(wal, n_salt=8))
    assert w == a == s
    assert len(w) == wal.select("url").distinct().count()


def test_salted_equivalent_under_heavy_skew(spark):
    wal = gen_wal(
        spark,
        WalConfig(n_events=20_000, n_urls=500, hot_frac=0.4, n_hot_urls=2, ooo_frac=0.2),
    )
    assert _as_sorted_keys(lww_salted(wal, n_salt=32)) == _as_sorted_keys(lww_agg(wal))


def test_winner_is_max_version(spark):
    wal = gen_wal(spark, WalConfig(n_events=3_000, n_urls=100, ooo_frac=0.5))
    winners = lww_agg(wal).select("url", "warc_ts", "seq")
    expected = (
        wal.groupBy("url")
        .agg(F.max(F.struct("warc_ts", "seq")).alias("v"))
        .select("url", "v.warc_ts", "v.seq")
    )
    assert winners.exceptAll(expected).count() == 0
    assert expected.exceptAll(winners).count() == 0


def test_winners_unique_per_key(spark):
    wal = gen_wal(spark, WalConfig(n_events=5_000, n_urls=300))
    for fn in (lww_window, lww_agg, lww_salted):
        w = fn(wal)
        assert w.groupBy("url").count().filter(F.col("count") > 1).count() == 0


def test_winner_seqs_matches_join_back(spark):
    """The MoR fast path (seq-only, fingerprint-keyed, no join-back)
    must select exactly the seqs that the general lww_agg winners
    carry — for both the agg and the salted physical plans."""
    from ethereum_etl_spark.operators.lww import lww_winner_seqs

    wal = gen_wal(spark, WalConfig(n_events=8_000, n_urls=500, ooo_frac=0.4))
    expected = sorted(r["seq"] for r in lww_agg(wal).select("seq").collect())
    for method in ("agg", "salted"):
        got = sorted(
            r["seq"]
            for r in lww_winner_seqs(wal, method=method, n_salt=8).collect()
        )
        assert got == expected, method
    # fingerprint=False (group on raw key) is the same set too
    got_raw = sorted(
        r["seq"] for r in lww_winner_seqs(wal, fingerprint=False).collect()
    )
    assert got_raw == expected
