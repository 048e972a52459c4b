"""Seed sources (SURVEY.md §2.1 S1/S2, §2.4 F4).

Reference: positional CLI urls (``src/cfg.rs:200-204``) + optional
url-per-line seed file (``src/cfg.rs:185-198``), then
``clean_urls`` = sort + dedup + filter (``src/cfg.rs:338-342``). The sort
also pins the initial LIFO order: the lexicographically-last seed is
popped (dispatched) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doonop_spark.functions.canonical import host_expr, url_hash_col
from doonop_spark.operators.filters import Filter, clean_seeds

__all__ = ["seeds_from_list", "seeds_from_file", "seed_frontier"]


def seeds_from_list(urls: list[str], filters: list[Filter]) -> list[str]:
    """S1 — canonicalize + clean (invalid URL ⇒ hard error, as in the
    reference's parse_urls)."""
    return clean_seeds(urls, filters)


def seeds_from_file(path: str, filters: list[Filter], extra: list[str] = ()) -> list[str]:
    """S2 — url-per-line file, combined with CLI seeds then cleaned once."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    return clean_seeds(list(extra) + lines, filters)


def seed_frontier(
    spark: SparkSession, cleaned: list[str], url_key: str = "parity"
) -> DataFrame:
    """Cleaned (sorted) seeds → initial frontier rows. ``seq`` follows the
    sorted order, so LIFO pop (max seq first) dispatches the
    lexicographically-last seed first, exactly like ``urls_pool.pop()``
    over the sorted seed vector (``src/cfg.rs:339``, ``src/workload.rs:230``).

    ``ukey`` is the seen-set key: the canonical URL itself in parity mode,
    the SURT key in surt mode.
    """
    from doonop_spark.functions.canonical import surt_key

    rows = [
        (u, surt_key(u) if url_key == "surt" else u, i)
        for i, u in enumerate(cleaned)
    ]
    df = spark.createDataFrame(rows, "url string, ukey string, seq long")
    return df.select(
        "url",
        "ukey",
        url_hash_col(F.col("ukey")).alias("url_hash"),
        host_expr(F.col("url")).alias("host"),
        F.lit(0).alias("depth"),
        "seq",
        F.lit(False).alias("is_retry"),
        F.lit(0).alias("retry_count"),
        F.lit(0.0).alias("retry_at"),
    )
