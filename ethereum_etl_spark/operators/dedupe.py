"""Document deduplication operators (exact + near-dup families).

The reference's only dedup is key-based (`set()` before RPC —
src/tasks/extract/account.py:23 — and PK upserts at the sink); a
web-scale training-data pipeline additionally needs *content* dedup.
All operators below are Spark-first: JVM-side expressions for hashing
and signatures (whole-stage codegen), shuffles only on small keys
(hashes/bands), payload columns never shuffled.

- exact_dedup          — content-hash groupBy (keep canonical doc)
- ngram_jaccard_pairs  — exact Jaccard over word-shingle sets (the
                         verifier; quadratic within candidate buckets)
- minhash_lsh_pairs    — MinHash signatures + banded LSH bucketing →
                         candidate pairs → exact-Jaccard verify
- simhash64            — 64-bit SimHash + hamming-radius pairing
- embedding_near_dup   — cosine-similarity near-dup over embeddings

Scale notes: LSH bands shuffle (band_id, band_hash, doc_id) — 24 bytes
a row regardless of document size. Candidate verification re-joins
shingle sets only for the (tiny) candidate set. This is the standard
Common-Crawl-dedup shape (cf. Lee et al., "Deduplicating Training Data
Makes Language Models Better").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.textstats import rolling_shingle_fingerprints

# Mersenne prime for the universal-hash family h_i(x) = (a_i*x + b_i) mod p.
_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct content hash; canonical = min id.

    Hash-groupBy on xxhash64(text): the shuffle carries (hash, id) pairs
    only; the winning rows' payloads are fetched by a semi-join — same
    payload-light pattern as the LWW engine.
    """
    hashed = df.withColumn("__h", F.xxhash64(F.col(text_col)))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, on=["__h", id_col], how="inner").drop("__h")


def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(content hash, group size, canonical id) for groups with dups."""
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("content_hash"))
        .agg(F.count("*").alias("group_size"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("group_size") > 1)
    )


# ---------------------------------------------------------------------------
# Shingle/Jaccard machinery
# ---------------------------------------------------------------------------


def with_shingles(
    df: DataFrame, text_col: str = "text", shingle_len: int = 5
) -> DataFrame:
    return df.withColumn(
        "shingles",
        F.array_distinct(rolling_shingle_fingerprints(text_col, shingle_len)),
    )


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs exact Jaccard ≥ threshold (id_a < id_b).

    Quadratic — the *oracle* / verifier path for small corpora; at scale
    use minhash_lsh_pairs which calls this only within LSH buckets.
    """
    s = with_shingles(df, text_col, shingle_len).select(
        F.col(id_col), F.col("shingles")
    )
    a = s.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = s.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def _hash_params(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash params, 31-bit so that
    a*h + b stays inside a 64-bit long (no decimal math in the hot path:
    a < 2^31, h < 2^31 → a*h < 2^62)."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31) | 1, rng.randrange(0, 1 << 31))
        for _ in range(n_hashes)
    ]


def minhash_signature(
    shingles_col, n_hashes: int = 64, seed: int = 7
):
    """Array<long> MinHash signature — all JVM-side long arithmetic
    (whole-stage codegen; no decimal, no Python).

    For each hash fn i: min over 31-bit shingle hashes h of
    (a_i*h + b_i) mod p, p = 2^61-1.

    Formulation chosen by measurement (sf0.1, 32 cores): n_hashes
    independent ``array_min(transform(...))`` passes = 5.9s, vs 10.4s for
    explode+codegen-hash-agg and 12.5s for a fused single-pass
    ``aggregate`` carrying an n_hashes-wide running-min accumulator —
    Catalyst evaluates higher-order-function lambdas without whole-stage
    codegen, so the "one traversal" form loses to n cheap vectorized
    passes over an already-materialized array.
    """
    params = _hash_params(n_hashes, seed)
    cols = [
        F.array_min(
            F.transform(
                shingles_col,
                lambda h: F.pmod(
                    F.lit(a) * F.pmod(h, F.lit(1 << 31)) + F.lit(b), F.lit(_MERSENNE)
                ),
            )
        )
        for a, b in params
    ]
    return F.array(*cols)


def _task_slots(spark) -> int:
    """Number of concurrently runnable tasks (one wave) — executor
    slots on a cluster, worker threads in local mode. Falls back to
    defaultParallelism when the internal API moves."""
    try:
        jsc = spark.sparkContext._jsc.sc()
        rp = jsc.resourceProfileManager().defaultResourceProfile()
        return max(1, jsc.maxNumConcurrentTasks(rp))
    except Exception:
        return max(1, spark.sparkContext.defaultParallelism)


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition a too-narrow input for a CPU-heavy map stage — the
    cheap-scan/expensive-map case: a small compressed parquet file
    arrives as ONE split, which would run the whole shingle+signature
    pipeline on one core. Target = ONE TASK WAVE (executor slots), not
    the session's defaultParallelism: defaultParallelism is tuned high
    (3-6x cores) so Spark's on-disk-bytes split formula survives 30x
    text compression on big scans, but for an explicit repartition it
    just shreds a small corpus into hundreds of ~10ms tasks whose
    scheduling overhead dominates (measured on the 5k-doc bench input:
    3.5s at 192 partitions vs 1.4s at one 32-slot wave; on-disk bytes
    can't size this stage either — they understate shingle/signature
    CPU by the compression ratio). At real corpus sizes the scan is
    already wider than a wave and this is a no-op (no shuffle added)."""
    target = _task_slots(df.sparkSession)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _lsh_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int,
    n_hashes: int,
    n_bands: int,
    seed: int,
    max_bucket_size: int | None,
) -> DataFrame:
    """(id, band, bucket) rows: shingles → signature → banded bucket keys,
    with the degenerate-bucket cap applied. Shared by the verified-pairs
    path and the bucket-collision dedup path."""
    rows_per_band = n_hashes // n_bands
    # NOTE: no array_distinct here — min() is duplicate-insensitive, so
    # the signature over the raw rolling shingles equals the signature
    # over the shingle SET, and the per-doc dedup sort is saved. (The
    # exact-Jaccard verifier computes distinct sets itself.)
    s = _fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col))).select(
        "id",
        rolling_shingle_fingerprints(text_col, shingle_len).alias("shingles"),
    )
    s = s.withColumn("sig", minhash_signature(F.col("shingles"), n_hashes, seed))
    bands = s.drop("shingles").select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            )
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    if max_bucket_size is not None:
        # single-pass cap: a window count shuffles the (id, band, bucket)
        # tuples once and filters in place — a groupBy+semi-join variant
        # would re-run the whole signature pipeline for the second
        # reference to `bands`
        w = Window.partitionBy("band", "bucket")
        bands = (
            bands.withColumn("__n", F.count("*").over(w))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    return bands


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
    seed: int = 7,
    max_bucket_size: int | None = 128,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact Jaccard.

    Pipeline: shingles → signature (n_hashes) → split into n_bands bands
    of n_hashes/n_bands rows → band bucket key = xxhash64(band slice) →
    self-join per (band, bucket) → distinct candidate pairs → exact
    Jaccard over shingle sets ≥ threshold.

    Shuffle profile: explode emits n_bands rows/doc of (band, bucket,
    id) — constant width. Payload (shingle sets) joins back only for
    candidates.

    Defaults are 32 hashes in 8 bands of 4: signature cost is linear in
    n_hashes and rows-per-band (the LSH s-curve's r) stays 4, so recall
    at the dedup thresholds (≥0.8) is still ≈1 while the dominant
    signature stage costs half of the 64-hash configuration. Callers
    wanting the classic 64×16 can pass it explicitly.

    ``max_bucket_size`` is the standard LSH degenerate-bucket guard: a
    bucket shared by b docs contributes b² candidate rows, so one
    boilerplate band hash shared by a million pages is a quadratic
    blowup. Buckets above the cap are dropped from candidate generation
    (their members almost always co-occur in several other, smaller
    buckets; near-dup recall loss is negligible while the worst case
    drops from O(n²) to O(n·cap)). Pass None to disable.
    """
    bands = _lsh_bands(
        df, id_col, text_col, shingle_len, n_hashes, n_bands, seed, max_bucket_size
    )
    left = bands.select(F.col("band"), F.col("bucket"), F.col("id").alias("id_a"))
    right = bands.select(F.col("band"), F.col("bucket"), F.col("id").alias("id_b"))
    # materialize the candidate set (tiny: id pairs) — it is consumed
    # twice below (candidate-doc discovery + the verify join), and a
    # lazy cache is useless here: both consumers land in ONE downstream
    # job, which would re-run the whole signature+band pipeline per
    # subtree. localCheckpoint runs the pipeline once, stores the pairs
    # executor-side, and truncates the lineage.
    candidates = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )

    # shingle sets are the expensive column (full-text tokenize+hash per
    # doc): recompute them ONLY for docs that appear in some candidate
    # pair (pair-sparse corpora → a small semi-joined subset) instead of
    # caching corpus-wide shingles or recomputing them per join side
    cand_ids = (
        candidates.select(F.explode(F.array("id_a", "id_b")).alias(id_col)).distinct()
    )
    sh = with_shingles(
        df.join(cand_ids, on=id_col, how="left_semi"), text_col, shingle_len
    ).select(F.col(id_col).alias("id"), "shingles")
    verified = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float | None = None,
    seed: int = 7,
    max_bucket_size: int | None = 128,
    verify: bool = False,
) -> DataFrame:
    """Drop near-duplicates: keep the min-id representative per group.

    Default (``verify=False``) is bucket-collision dedup — the production
    web-corpus shape (RefinedWeb/SlimPajama-style): a doc is dropped when
    any of its band buckets contains a smaller id. The similarity
    threshold is enforced by the LSH s-curve of (n_hashes, n_bands)
    itself (8 bands of 4 ⇒ ~50% match probability at Jaccard 0.72,
    ≈1 at 0.9), and the whole dedup is ONE pass: signature → bands →
    per-bucket min-id window → anti-join. No pairwise work at all, so
    cost is O(n·n_bands) regardless of duplicate density.

    ``verify=True`` instead drops only pairs whose exact shingle Jaccard
    ≥ ``threshold`` (via :func:`minhash_lsh_pairs`) — exact but pays a
    candidate-verification join; use it when precision matters more than
    throughput. ``threshold`` is required in this mode.
    """
    if verify:
        if threshold is None:
            raise ValueError("verify=True requires an explicit threshold")
        pairs = minhash_lsh_pairs(
            df, id_col, text_col, shingle_len, n_hashes, n_bands,
            threshold, seed, max_bucket_size,
        )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    else:
        # cap filter and min-id survivor share ONE window pass (same
        # partition spec → single shuffle+sort over 24-byte tuples)
        bands = _lsh_bands(
            df, id_col, text_col, shingle_len, n_hashes, n_bands, seed, None
        )
        w = Window.partitionBy("band", "bucket")
        bands = bands.withColumn("__m", F.min("id").over(w))
        if max_bucket_size is not None:
            bands = bands.withColumn("__n", F.count("*").over(w)).filter(
                F.col("__n") <= max_bucket_size
            )
        losers = (
            bands.filter(F.col("id") > F.col("__m"))
            .select(F.col("id").alias(id_col))
            .distinct()
        )
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text_col="text"):
    """64-bit SimHash over word tokens — pure JVM expression.

    bit_j(doc) = sign( Σ_tokens (bit_j(xxhash64(token)) ? +1 : -1) ).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(F.split(F.lower(c), r"\W+"), lambda w: w != "")
    # accumulate per-bit counters: acc[j] += tokenbit_j ? 1 : -1
    # (bit positions are Python-level ints: shiftright needs a literal count)
    acc = F.aggregate(
        words,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda a, w: F.zip_with(
            a,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(w), j).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1).cast("long"),
                    ).otherwise(F.lit(-1).cast("long"))
                    for j in range(64)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    # fold sign bits into one long; bit 63's mask is Long.MIN_VALUE
    masks = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    return F.aggregate(
        F.zip_with(
            acc,
            F.array(*[F.lit(m).cast("long") for m in masks]),
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s.bitwiseXOR(x),
    ).alias("simhash")


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_block_size: int | None = 256,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Blocked self-join: split the 64-bit hash into (max_hamming+1) chunks;
    by pigeonhole two hashes within the radius share ≥1 exact chunk, so
    the join key is (chunk_idx, chunk_value) — no quadratic blowup
    between distinct hashes. ``max_block_size`` guards the remaining
    degenerate case (one chunk value shared by a huge cohort, e.g.
    boilerplate pages hashing near-identically): blocks above the cap are
    dropped, bounding the self-join at O(n·cap). Pass None to disable.
    """
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks

    def _chunk_mask(nbits: int) -> int:
        m = (1 << nbits) - 1
        return m if m < (1 << 63) else m - (1 << 64)  # two's-complement long
    h = _fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col))).select(
        "id", simhash64(text_col).alias("sh")
    )
    chunks = h.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("sh"), i * bits)
                        .bitwiseAND(F.lit(_chunk_mask(bits)))
                        .alias("chunk_val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.chunk_idx", "c.chunk_val")
    if max_block_size is not None:
        # single-pass cap via window count (see minhash_lsh_pairs): no
        # second evaluation of the simhash pipeline
        w = Window.partitionBy("chunk_idx", "chunk_val")
        chunks = (
            chunks.withColumn("__n", F.count("*").over(w))
            .filter(F.col("__n") <= max_block_size)
            .drop("__n")
        )
    a = chunks.select("chunk_idx", "chunk_val", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = chunks.select("chunk_idx", "chunk_val", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, on=["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda s, x: s + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0).cast("double"), lambda s, x: s + x * x))
    return dot / (na * nb)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All-pairs cosine ≥ threshold (brute force; LSH variant in
    operators/similarity.py handles scale)."""
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
