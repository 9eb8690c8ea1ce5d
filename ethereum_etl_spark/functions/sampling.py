"""Deterministic hash sampling / dataset splitting.

Training-data pipelines need sampling that is (a) reproducible across
runs and engines, (b) stable under repartitioning and retries, and
(c) consistent for the same key everywhere (so a document never leaks
from train into test when the corpus is rebuilt). ``rand()`` gives
none of these; Bernoulli `df.sample` is partition-order-sensitive.

The standard construction: hash the key with a keyed cryptographic-ish
digest, map the top bits to a uniform in [0,1), and threshold. All
JVM-side built-ins (md5 → hex substring → base-16 conv → divide by
2^32) — zero shuffle, zero Python, and bit-identical to the equivalent
ANSI-SQL expression, so splits audit across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO32 = 4294967296.0  # 2^32; division by a power of two is IEEE-exact


def stable_uniform(col: str | Column, salt: str = "") -> Column:
    """Deterministic uniform in [0,1) from a key (+ optional salt).

    Top 32 bits of md5(key||salt) scaled by 2^-32. Changing the salt
    draws an independent uniform for the same key (new experiment,
    same corpus, no correlation with the old split).
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(F.concat(c, F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") / F.lit(_TWO32)).alias("u")


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by cumulative hash thresholds.

    ``splits`` maps label → fraction (must sum to ~1; the last label
    absorbs rounding). Same key + same salt → same label, forever, on
    any engine, at any partitioning.
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = stable_uniform(key_col, salt)
    labels = list(splits.items())
    expr = None
    acc = 0.0
    for label, frac in labels[:-1]:
        # rounded accumulation: 0.8 + 0.1 is 0.9000000000000001 in IEEE,
        # which would disagree with the literal 0.9 an auditing SQL
        # engine compares against
        acc = round(acc + frac, 9)
        cond = u < F.lit(acc)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = (
        F.lit(labels[-1][0]) if expr is None else expr.otherwise(labels[-1][0])
    )
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose stable uniform falls below ``fraction`` —
    a reproducible, engine-portable Bernoulli sample keyed on content."""
    return df.filter(stable_uniform(key_col, salt) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing
    primitive (e.g. keep 100% of low-resource languages, 5% of English).

    ``fractions`` maps stratum value → keep-fraction; strata not listed
    keep ``default_fraction``. Unlike ``df.sampleBy`` this is stable
    under repartitioning/retries and reproducible across engines (pure
    hash threshold, no RNG state), and it never shuffles: the stratum
    fraction is resolved with an inline CASE over broadcast-small
    literals, so the whole operator is one codegen'd filter on the scan.
    """
    u = stable_uniform(key_col, salt)
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        thr = F.when(cond, float(frac)) if thr is None else thr.when(cond, float(frac))
    thr = F.lit(float(default_fraction)) if thr is None else thr.otherwise(
        float(default_fraction)
    )
    return df.filter(u < thr)
