"""Approximate-nearest-neighbor search over an embedding column.

Three tiers over `array<float>` embeddings:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus; per-corpus-row JVM-side dot products
  (`zip_with` + `aggregate`, whole-stage codegen); window top-k per
  query. The baseline and the verifier.
- ``lsh_topk``        — random-hyperplane LSH: sign-bit sketch → bucket
  equi-join → exact rerank within buckets (with multi-probe via sketch
  rotations). Sub-linear candidate sets at scale.
- ``ivf_topk``        — IVF: k-means-lite centroids (deterministic
  seeded sample + one Lloyd step), corpus partitioned by nearest
  centroid, queries probe `n_probe` nearest lists. The classic
  billion-vector layout (cf. FAISS IVF) in pure DataFrame ops.

Scale notes: the corpus never self-joins; every plan is
broadcast-small-side ⋈ corpus with map-side math, then a top-k window
over (query_id) — shuffle carries only (query_id, corpus_id, score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda s, x: s + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return (_dot(a, b) / (_norm(a) * _norm(b))).alias("cosine")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding)."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv")
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("__qv")
    )
    scored = c.join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine_col(F.col("__cv"), F.col("__qv")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _sketch(vec_col, planes: list[list[float]]):
    """Sign-bit sketch as a long (n_planes ≤ 63)."""
    bits = [
        F.when(
            _dot(vec_col, F.array(*[F.lit(x) for x in plane])) > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseXOR(b)
    return out


def _probe_masks(n_planes: int, radius: int) -> list[int]:
    """All bit masks of popcount ≤ radius over n_planes bits (multi-probe)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    probe_radius: int = 2,
    seed: int = 11,
) -> DataFrame:
    """LSH-bucketed ANN: candidates from n_tables independent sketches
    with multi-probe (query probes every bucket within `probe_radius`
    sketch-bit flips — Lv et al., "Multi-Probe LSH"), exact cosine
    rerank, top-k. Recall grows with n_tables × probes; only the tiny
    broadcast query side is exploded, the corpus is sketched once."""
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("__qv"))
    masks = _probe_masks(n_planes, probe_radius)
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 101 * t)
        cb = c.select(id_col, "__cv", _sketch(F.col("__cv"), planes).alias("__b"))
        qb = (
            q.select(query_id_col, "__qv", _sketch(F.col("__qv"), planes).alias("__b0"))
            .select(
                query_id_col,
                "__qv",
                F.explode(
                    F.array(
                        *[F.col("__b0").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
                    )
                ).alias("__b"),
            )
        )
        part = cb.join(F.broadcast(qb), on="__b").select(query_id_col, id_col, "__cv", "__qv")
        cand = part if cand is None else cand.unionByName(part)
    cand = cand.dropDuplicates([query_id_col, id_col])
    scored = cand.select(query_id_col, id_col, cosine_col(F.col("__cv"), F.col("__qv")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) partitioned search
# ---------------------------------------------------------------------------


def build_ivf(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """(assigned corpus with `list_id`, centroids (list_id, centroid)).

    Centroids: deterministic seeded sample of n_lists vectors, refined by
    one Lloyd step (mean of assigned members) — cheap, good enough for
    candidate routing; exactness comes from the rerank.
    """
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    seeds = (
        c.orderBy(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 31)))
        .limit(n_lists)
        .select(F.col(id_col).alias("list_id"), F.col("__v").alias("centroid"))
    )
    seeds = F.broadcast(seeds)

    def assign(df, cents):
        scored = df.join(cents).withColumn("__d", _dot(F.col("__v"), F.col("centroid")) / (_norm(F.col("__v")) * _norm(F.col("centroid"))))
        w = Window.partitionBy(id_col).orderBy(F.col("__d").desc(), F.col("list_id").asc())
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select(id_col, "__v", "list_id")
        )

    assigned0 = assign(c, seeds)
    # one Lloyd refinement: centroid = elementwise mean of members
    # (posexplode → per-(list, dim) mean → regroup in dim order)
    refined = (
        assigned0.select("list_id", F.posexplode("__v").alias("__dim", "__x"))
        .groupBy("list_id", "__dim")
        .agg(F.avg("__x").alias("__m"))
        .groupBy("list_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__dim", "__m"))),
                lambda s: s["__m"],
            ).alias("centroid")
        )
    )
    refined = F.broadcast(refined)
    assigned = assign(c, refined).select(id_col, F.col("__v").alias(vec_col), "list_id")
    return assigned, refined.select("list_id", "centroid")


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe the n_probe nearest lists per query, exact rerank inside."""
    q = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("__qv"))
    qc = q.join(F.broadcast(centroids)).select(
        query_id_col, "__qv", "list_id",
        (_dot(F.col("__qv"), F.col("centroid")) / (_norm(F.col("__qv")) * _norm(F.col("centroid")))).alias("__cd"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("__cd").desc(), F.col("list_id").asc())
    probes = qc.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= n_probe)
    cand = assigned.withColumnRenamed(vec_col, "__cv").join(
        F.broadcast(probes.select(query_id_col, "__qv", "list_id")), on="list_id"
    )
    scored = cand.select(query_id_col, id_col, cosine_col(F.col("__cv"), F.col("__qv")))
    w2 = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
