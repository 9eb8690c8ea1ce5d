"""URL canonicalization: known forms, idempotency, non-URL passthrough."""

from pyspark.sql import functions as F

from ethereum_etl_spark.functions.urlnorm import (
    canonical_url,
    registered_domain,
    url_host,
)

CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM:80/Path", "http://www.example.com/Path"),
    ("https://Example.com:443", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://a.b/p?b=2&a=1&c=3#frag", "http://a.b/p?a=1&b=2&c=3"),
    ("http://a.b/?", "http://a.b/"),
    ("http://a.b#only-frag", "http://a.b/"),
    ("ftp://Host.Example/Dir", "ftp://host.example/Dir"),  # non-http port rule
    ("not a url at all", "not a url at all"),  # total + passthrough
    ("", ""),
]


def test_canonical_known_forms(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_canonical_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for every case."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    once = df.select(canonical_url("url").alias("c"))
    twice = once.select(F.col("c").alias("first"), canonical_url("c").alias("again"))
    assert all(r["first"] == r["again"] for r in twice.collect())


def test_registered_domain(spark):
    rows = [
        ("www.example.com", "example.com"),
        ("a.b.c.example.org", "example.org"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        # public-suffix cases: registrable = one label below the suffix
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("www.shop.example.co.jp", "example.co.jp"),
        ("blog.example.com.au", "example.com.au"),
        ("deep.sub.example.co.za", "example.co.za"),
        # at/below the suffix: pass through (no registrable domain)
        ("co.uk", "co.uk"),
        # 3-label exact suffixes (jp geographic)
        ("www.x.pref.aichi.jp", "x.pref.aichi.jp"),
        ("site.aisai.aichi.jp", "site.aisai.aichi.jp"),
        ("www.site.aisai.aichi.jp", "site.aisai.aichi.jp"),
        ("foo.aichi.jp", "foo.aichi.jp"),  # aichi.jp is itself a suffix
        # wildcard rules: every label directly under the tail is a suffix
        ("a.foo.bar.ck", "foo.bar.ck"),  # *.ck → bar.ck is the suffix
        ("foo.bar.ck", "foo.bar.ck"),
        ("bar.ck", "bar.ck"),  # IS a public suffix: pass through
        ("x.y.example.kawasaki.jp", "y.example.kawasaki.jp"),
        # exception rules beat the wildcard
        ("www.ck", "www.ck"),  # !www.ck → registrable despite *.ck
        ("sub.www.ck", "www.ck"),
        ("city.kawasaki.jp", "city.kawasaki.jp"),
        ("www.city.kawasaki.jp", "city.kawasaki.jp"),
        # deep (4-label) wildcard suffix from the private section
        (
            "ec2-1-2-3-4.us-east-1.compute.amazonaws.com",
            "ec2-1-2-3-4.us-east-1.compute.amazonaws.com",
        ),
        (
            "x.ec2-1-2-3-4.us-east-1.compute.amazonaws.com",
            "ec2-1-2-3-4.us-east-1.compute.amazonaws.com",
        ),
        ("me.github.io", "me.github.io"),
        ("www.me.github.io", "me.github.io"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], ["h"])
    got = [r["d"] for r in df.select(registered_domain("h").alias("d")).collect()]
    assert got == [want for _, want in rows]


def test_registered_domain_full_psl_via_parser(spark):
    """parse_psl loads publicsuffix.org file format (comments, blank
    lines, exceptions, wildcards); the expression honors the parsed
    rules and stays in codegen at full rule depth."""
    from ethereum_etl_spark.functions.urlnorm import parse_psl

    rules = parse_psl(
        """
        // ===BEGIN ICANN DOMAINS===
        com
        uk
        co.uk

        *.custom
        !keep.custom
        deep.three.label
        // ===END ICANN DOMAINS===
        """
    )
    rows = [
        ("www.example.com", "example.com"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.custom", "a.b.custom"),  # *.custom: b.custom is a suffix
        ("x.a.b.custom", "a.b.custom"),
        ("keep.custom", "keep.custom"),  # exception: registrable itself
        ("w.keep.custom", "keep.custom"),
        ("site.deep.three.label", "site.deep.three.label"),
        ("unknowntld", "unknowntld"),
        ("x.unknowntld", "x.unknowntld"),  # default * rule
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], ["h"])
    got = [
        r["d"] for r in df.select(registered_domain("h", rules).alias("d")).collect()
    ]
    assert got == [want for _, want in rows]
    plan = (
        df.select(registered_domain("h", rules))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_host_extraction_strips_default_port_only(spark):
    df = spark.createDataFrame(
        [("http://H.X:80/p",), ("http://H.X:8080/p",), ("https://H.X:443",)], ["url"]
    )
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["h.x", "h.x:8080", "h.x"]


def test_plan_stays_in_codegen(spark):
    """The canonicalization must be pure column expressions: no
    BatchEvalPython / ArrowEvalPython node in the plan."""
    df = spark.range(10).select(
        F.concat(F.lit("http://h/p"), F.col("id").cast("string")).alias("url")
    )
    plan = (
        df.select(canonical_url("url"))._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_canonical_total_and_idempotent_on_fuzz_corpus(spark):
    """500 seeded-random ASCII strings (plus url-ish mutations): the
    canonicalizer must never fail and must be a projection (f∘f = f)."""
    import random
    import string

    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.%- "
    rows = []
    for i in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        if i % 3 == 0:
            s = "http://" + s
        elif i % 3 == 1:
            s = "HTTPS://HOST" + str(i) + ".COM:443/" + s
        rows.append((s,))
    df = spark.createDataFrame(rows, ["url"])
    once = df.select(canonical_url("url").alias("c"))
    twice = once.select(F.col("c").alias("a"), canonical_url("c").alias("b"))
    bad = twice.filter(
        (F.col("a") != F.col("b"))
        | F.col("a").isNull() != F.col("b").isNull()
    ).count()
    assert bad == 0
    assert once.count() == 500
