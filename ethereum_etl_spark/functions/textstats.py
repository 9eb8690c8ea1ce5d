"""Text analysis operators for a web-scale training-data pipeline.

These run over the extracted `text` column of the pages table (or any
document table): language-ID (functions/extract.py), quality scoring,
token counting, and document fingerprinting. All JVM-side built-in
expressions (whole-stage-codegen'd) — no Python in the hot path — so at
100 TB they are pure map-side column work with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English stopword set (fixed; used for quality ratio).
_STOPWORDS = (
    "the of and a to in is was he for it with as his on be at by i this had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will more no if out"
).split()


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(F.trim(c)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(c), r"\s+"))).alias("token_count")


def bpe_ish_token_count(col: str | Column = "text") -> Column:
    """BPE-flavored token proxy: words + digits + punctuation runs.

    Matches the common `\\w+|[^\\w\\s]` pre-tokenizer regex used before
    byte-pair merging; a deterministic, JVM-side estimate of LLM token
    counts (≈0.75 words/token heuristics are not reproducible; this is).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(
            F.split(c, r"(?<=\W)|(?=\W)"),
            lambda t: F.trim(t) != "",
        )
    ).alias("bpe_ish_token_count")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase features + a score.

    The standard web-text quality heuristics (C4/Gopher-style rules):
    mean word length, punctuation density, stopword ratio, alpha ratio.
    All vectorized JVM expressions.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    words = F.split(F.trim(c), r"\s+")
    n_words = F.when(F.length(F.trim(c)) == 0, 0).otherwise(F.size(words))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?\"'()\[\]{}—-]", ""))
    n_alpha = F.length(c) - F.length(F.regexp_replace(c, r"[A-Za-z]", ""))
    n_upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    stop_pat = r"(?i)\b(?:" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(c), F.lit(stop_pat), F.lit(0)))

    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.when(n_words > 0, (n_alpha / n_words)).otherwise(F.lit(0.0)))
        .withColumn("punct_ratio", F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)))
        .withColumn("alpha_ratio", F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0)))
        .withColumn("upper_ratio", F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0)))
        .withColumn("stopword_ratio", F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0)))
    )
    score = (
        F.when((F.col("n_words") >= 10) & (F.col("n_words") <= 100_000), 0.25).otherwise(0.0)
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10), 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.25).otherwise(0.0)
    )
    return out.withColumn("quality_score", score)


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals.

    Per document: the duplicate-line fraction, the fraction of word-
    bigram occurrences claimed by the single most frequent bigram, and
    the fraction of word-trigram occurrences whose trigram appears more
    than once (the Rae et al. 2021 "repetition removal" family — the
    standard filter for boilerplate and template spam in web corpora).

    Physical shape at 100 TB: the line signal is a pure per-row JVM
    expression (zero shuffle). The n-gram signals explode to (doc,
    ngram) and hash-aggregate — map-side partial aggregation combines
    repeated n-grams before the shuffle, so wire bytes are ∝ DISTINCT
    n-grams per doc, and no stage ever holds more than one document's
    grams in one task. Exact counts everywhere; all ratios are
    long/long divisions (IEEE-exact, oracle-stable).
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("long")
    n_dup_lines = (F.size(lines) - F.size(F.array_distinct(lines))).cast("long")
    per_row = df.select(
        id_col,
        n_lines.alias("n_lines"),
        F.when(n_lines > 0, n_dup_lines / n_lines)
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.filter(F.split(F.lower(F.trim(c)), r"\W+"), lambda w: w != "").alias("__ws"),
    )

    def _gram_frac(n: int, agg_expr, out_name: str) -> DataFrame:
        ws = F.col("__ws")
        size = F.size(ws)
        grams = F.when(
            size >= n,
            F.transform(
                F.sequence(F.lit(1), size - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(ws, i + k) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        counts = (
            per_row.select(id_col, F.explode(grams).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"))
        )
        return counts.groupBy(id_col).agg(agg_expr.alias(out_name))

    top_bi = _gram_frac(
        2, F.max("c") / F.sum("c"), "top_bigram_frac"
    )
    dup_tri = _gram_frac(
        3,
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)) / F.sum("c"),
        "dup_trigram_frac",
    )
    return (
        per_row.drop("__ws")
        .join(top_bi, on=id_col, how="left")
        .join(dup_tri, on=id_col, how="left")
        .select(
            id_col,
            "n_lines",
            "dup_line_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias("dup_trigram_frac"),
        )
    )


def fingerprint64(col: str | Column = "text") -> Column:
    """64-bit document fingerprint (content hash for exact dedup joins)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c).alias("fingerprint64")


def rolling_shingle_fingerprints(
    col: str | Column = "text", shingle_len: int = 5
) -> Column:
    """Array of 64-bit fingerprints of word shingles (rolling-hash analog).

    JVM-side: split → sliding windows via transform over index array →
    xxhash64 of each joined shingle. Input to MinHash/Jaccard dedup.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.trim(c)), r"\W+")
    words = F.filter(words, lambda w: w != "")
    n = F.size(words)
    k = F.lit(shingle_len)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.xxhash64(F.concat_ws(" ", words)))).otherwise(
        F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k))))
    ).alias("shingles")


def compression_ratio(col: str | Column = "text", level: int = 6) -> Column:
    """zlib bytes-out / bytes-in per document — the classic repetition /
    boilerplate proxy (CCNet-family quality signal): templated or
    repeated content compresses far below prose (~0.3 vs ~0.5+).

    zlib has no SQL analog, so this is the Arrow path (pandas UDF —
    the module's ONLY non-JVM operator, which is why pandas imports
    live inside this function,
    batch transfer; the per-row zlib call inside the batch IS the work
    — same measured posture as the html extractor,
    functions/extract.py:64-74). DEFLATE output is deterministic for a
    given (input, level, strategy) with the bundled zlib, so the value
    is reproducible and unit-test-oracled against direct zlib calls;
    it is NOT portable across zlib builds, which is why this ships
    without a cross-engine SQL oracle (declared rows-only)."""
    from pyspark.sql.functions import pandas_udf

    def _ratio(s):
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return 0.0
            return len(zlib.compress(b, level)) / len(b)

        return s.map(one)

    # no type hints: `from __future__ import annotations` stringifies
    # them and Spark can't resolve 'pd.Series' without a module-level
    # pandas import; the explicit returnType makes it a scalar pandas UDF
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_ratio, "double")(c)
