"""Deterministic sampling / dataset splitting for training-data pipelines.

Real corpus pipelines need *reproducible* selections: the same document
must land in the same split on every run, on any cluster, at any
parallelism — which rules out ``df.sample`` / ``randomSplit`` (seeded per
partition: the assignment changes whenever partitioning does). The
standard trick is content-keyed hashing: ``bucket = pmod(xxhash64(key),
denominator)`` and range predicates over the bucket.

Everything here is one JVM-side projection + filter — no shuffle, no
Python, fully pushdown-friendly (the bucket predicate sits right above
the scan), so the plan is identical at 100 TB. Exact-oracle-able because
Spark's ``xxhash64`` is spec XXH64(seed=42), replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_split", "deterministic_sample"]


def hash_bucket(key: Column, denominator: int = 100) -> Column:
    """Stable bucket in [0, denominator) from a key column. Keys are cast
    to string first so integer and string ids bucket identically across
    engines (xxhash64 over a long hashes its 8 little-endian bytes, which
    no other engine reproduces as easily as utf-8 text)."""
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(denominator)).cast("int")


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int],
    denominator: int = 100,
    split_col: str = "split",
) -> DataFrame:
    """Append a deterministic split label: ``splits`` maps label → weight
    (in ``denominator`` units, consumed in insertion order). E.g.
    ``{"train": 80, "valid": 10, "test": 10}``. Weights must sum to
    ``denominator`` so every row is labeled."""
    if sum(splits.values()) != denominator:
        raise ValueError(
            f"split weights {splits} must sum to denominator={denominator}"
        )
    b = hash_bucket(F.col(key_col), denominator)
    expr = None
    lo = 0
    for label, w in splits.items():
        hi = lo + w
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo = hi
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction_pct: int, denominator: int = 100
) -> DataFrame:
    """Keep rows whose key hash-buckets below ``fraction_pct`` — a
    reproducible ~fraction_pct% sample, stable under repartitioning,
    re-runs and engine changes (unlike ``df.sample``). Selection composes:
    a 10% sample is a subset of the 20% sample with the same key."""
    return df.filter(hash_bucket(F.col(key_col), denominator) < fraction_pct)
