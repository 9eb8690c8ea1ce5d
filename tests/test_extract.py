"""Byte-identical extraction invariant (SURVEY.md §5 test 3)."""

import pandas as pd
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.extract import (
    _extract_series,
    detect_lang,
    detect_lang_udf,
    extract_text,
    extract_text_udf,
)
from ethereum_etl_spark.sources.walgen import WalConfig, gen_wal

CASES = [
    b"<html><body><h1>Hello</h1><p>world &amp; peace</p></body></html>",
    b"<html><script>var x = '<p>not text</p>';</script><b>kept</b></html>",
    b"<html><style>p { color: red }</style>text</html>",
    b"<!-- comment --><div>a&nbsp;b&lt;c&gt;d&quot;e&#39;f&copy;</div>",
    b"  \n\t spaced   <br>   out \n ",
    b"no tags at all",
    b"",
    b"<p>unclosed",
    "<p>café — résumé</p>".encode(),
    b"\xff\xfe invalid utf8 \x80",
    b"<SCRIPT>UPPER</SCRIPT><STYLE>s</STYLE>ok",
    b"&amp;lt; double escaped",
]


def test_pure_vs_vectorized_byte_identical():
    s = pd.Series(CASES, dtype=object)
    vec = _extract_series(s)
    for raw, got in zip(CASES, vec):
        ref = extract_text(raw)
        assert got == ref, (raw, got, ref)
        assert got.encode() == ref.encode()


def test_udf_on_generated_wal_byte_identical(spark):
    wal = gen_wal(spark, WalConfig(n_events=500, n_urls=100)).filter(
        F.col("html").isNotNull()
    )
    got = wal.withColumn("text", extract_text_udf("html")).select("seq", "html", "text").collect()
    assert len(got) > 0
    for row in got:
        assert row["text"] == extract_text(bytes(row["html"]))
        assert row["text"].encode() == extract_text(bytes(row["html"])).encode()


def test_null_html_gives_null_text(spark):
    wal = gen_wal(spark, WalConfig(n_events=300, n_urls=50))
    out = wal.withColumn("text", extract_text_udf("html"))
    bad = out.filter(F.col("html").isNull() & F.col("text").isNotNull()).count()
    assert bad == 0


def test_lang_detect_pure_vs_udf(spark):
    texts = [
        "the quick brown fox and the lazy dog is in the house",
        "der hund und die katze ist nicht mit dem haus",
        "le chat est dans la maison pour les amis",
        "el perro y el gato en la casa es por que",
        "lorem ipsum dolor sit amet",
        None,
    ]
    pdf = pd.DataFrame({"text": texts})
    df = spark.createDataFrame(pdf)
    got = [r["lang"] for r in df.withColumn("lang", detect_lang_udf("text")).collect()]
    ref = [detect_lang(t) for t in texts]
    assert got == ref
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr" and got[3] == "es"
    assert got[4] == "und" and got[5] is None
