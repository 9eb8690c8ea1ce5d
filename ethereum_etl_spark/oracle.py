"""Single-threaded pandas replay oracle (FIXTURES.md F2).

The trivially-correct reducer the engine is checked against (SURVEY.md §5
test 1): group by url, winner = max (warc_ts, seq), drop urls whose winner
is a delete, text = the pure-Python reference extractor. Deliberately the
dumbest possible implementation — no Spark, no vectorization — so a bug in
the engine cannot be mirrored here.
"""

from __future__ import annotations

import pandas as pd

from ethereum_etl_spark.functions.extract import extract_text


def expected_final_state(wal: pd.DataFrame, with_lang: bool = False) -> pd.DataFrame:
    """wal: columns seq, op, url, warc_ts, html[, lang]. Returns the
    expected pages table sorted by url."""
    wal = wal.sort_values(["warc_ts", "seq"])  # LWW order: last row wins
    rows = {}
    for rec in wal.itertuples(index=False):
        rows[rec.url] = rec
    out = []
    for url in sorted(rows):
        rec = rows[url]
        if rec.op == "delete":
            continue
        html = bytes(rec.html) if rec.html is not None else None
        row = {
            "url": url,
            "warc_ts": rec.warc_ts,
            "seq": rec.seq,
            "html": html,
            "text": extract_text(html),
        }
        if with_lang:
            row["lang"] = getattr(rec, "lang", None)
        out.append(row)
    return pd.DataFrame(
        out,
        columns=["url", "warc_ts", "seq", "html", "text"] + (["lang"] if with_lang else []),
    )
