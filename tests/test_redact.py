"""PII redaction: kind coverage, replacement order, plan shape."""

from pyspark.sql import functions as F

from ethereum_etl_spark.functions.redact import pii_counts, redact_pii

CASES = [
    ("mail a.b+c@ex-ample.co.uk or x@y.io", "mail <EMAIL> or <EMAIL>"),
    ("call +1-415-555-0199 now", "call <PHONE> now"),
    ("host 8.8.8.8 up", "host <IP> up"),
    # order is load-bearing: the dotted quad must become <IP>, not <PHONE>
    ("ip 192.168.001.1 and phone 415 555 0199", "ip <IP> and phone <PHONE>"),
    # email first: its domain's dots never leak into the IP pass
    ("e u1@mail.example.com x", "e <EMAIL> x"),
    ("nothing sensitive here", "nothing sensitive here"),
    ("", ""),
]


def test_redaction_known_cases(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], ["t"])
    got = [r["r"] for r in df.select(redact_pii("t").alias("r")).collect()]
    assert got == [want for _, want in CASES]


def test_counts_match_redactions(spark):
    df = spark.createDataFrame(
        [("a@b.co c@d.io and 8.8.8.8 call 415-555-0100 or 415-555-0101",)], ["t"]
    )
    row = df.select(
        pii_counts("t", "email").alias("e"),
        pii_counts("t", "ip").alias("i"),
        pii_counts("t", "phone").alias("p"),
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (2, 1, 2)


def test_idempotent_on_redacted_text(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], ["t"])
    once = df.select(redact_pii("t").alias("r"))
    twice = once.select(F.col("r").alias("a"), redact_pii("r").alias("b"))
    assert all(r["a"] == r["b"] for r in twice.collect())


def test_kind_selection(spark):
    df = spark.createDataFrame([("a@b.co and 8.8.8.8",)], ["t"])
    got = df.select(redact_pii("t", kinds=("email",)).alias("r")).collect()[0]["r"]
    assert got == "<EMAIL> and 8.8.8.8"


def test_stays_in_codegen(spark):
    df = spark.range(5).select(F.concat(F.lit("x a@b.co "), F.col("id").cast("string")).alias("t"))
    plan = df.select(redact_pii("t"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
