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

__all__ = [
    "hash_bucket",
    "hash_split",
    "deterministic_sample",
    "stratified_sample",
    "pack_sequences",
]


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


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_pct: dict[str, int],
    default_pct: int = 0,
    denominator: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    ("keep 100% of wiki, 30% of web, 5% of logs"). Same hash-bucket
    selection as :func:`deterministic_sample`, with the threshold chosen
    by the stratum value; unlisted strata keep ``default_pct``. Still a
    pure projection + filter: no shuffle at any scale, and per-stratum
    selections nest across runs with different mixes."""
    b = hash_bucket(F.col(key_col), denominator)
    thr = None
    for stratum, pct in fractions_pct.items():
        cond = F.col(strata_col) == stratum
        thr = F.when(cond, pct) if thr is None else thr.when(cond, pct)
    thr = F.lit(default_pct) if thr is None else thr.otherwise(default_pct)
    return df.filter(b < thr)


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 256,
) -> DataFrame:
    """Assign documents to training-sequence bins of ~``budget`` tokens:
    documents are hash-sharded (deterministic, parallel), ordered by key
    within the shard, and binned by the running token total —
    ``bin = floor(prev_cumulative / budget)`` — i.e. contiguous fill, the
    standard pack-then-split layout (a document may straddle a boundary;
    the trainer's loader splits it). Output adds ``shard``, ``bin`` and
    ``offset_in_bin`` (token offset of the doc within its bin).

    Scale shape: one shuffle by shard + a within-shard sort window —
    never a global sort. ``n_shards`` bounds each sort's size at
    rows/n_shards; bins are deterministic at any parallelism because both
    the shard and the order-by key are content-derived."""
    shard = hash_bucket(F.col(key_col), n_shards)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("shard", shard).withColumn(
        "__prev_tokens", F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    )
    return (
        out.withColumn(
            # long integer division (Spark's `div`), NOT floor(float /):
            # float division loses integer precision once a shard's
            # cumulative token total exceeds 2^53, and the oracle (DuckDB
            # `//`) divides exactly — `div` keeps the plans identical at
            # any cumulative total
            "bin", F.expr(f"__prev_tokens div {int(budget)}").cast("long")
        )
        .withColumn(
            "offset_in_bin",
            (F.col("__prev_tokens") % F.lit(budget)).cast("long"),
        )
        .drop("__prev_tokens")
    )
