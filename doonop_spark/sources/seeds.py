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

__all__ = [
    "seeds_from_list",
    "seeds_from_file",
    "seed_frontier",
    "seed_frontier_distributed",
]


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


def seed_frontier_distributed(
    spark: SparkSession,
    cleaned: list[str],
    extra_urls: DataFrame,
    url_key: str = "parity",
    filters: list[Filter] = (),
    n_partitions: int | None = None,
) -> DataFrame:
    """Wave-0 frontier from CLI seeds PLUS a *DataFrame* of extra seed URLs
    (column ``url``) — the scale path for sitemap expansion (S6): millions
    of ``<loc>`` entries never round-trip through a driver list.

    Semantics match ``seed_frontier(clean_seeds(cli + extra))`` exactly:
    canonicalize, filter, dedup, and ``seq`` = rank in the merged sorted
    order (the sort pins the initial LIFO order, ``src/cfg.rs:338-342``).
    One difference by design: invalid URLs in ``extra_urls`` are *dropped*
    (they are discovered content, like links — F5), while invalid CLI
    seeds still raise in ``seeds_from_list`` upstream.

    Scale shape: the sorted rank is range-repartition + within-partition
    sort + the monotonically_increasing_id (partition, offset)
    decomposition with per-partition cumulative offsets from one tiny agg
    (the same pattern as the crawl loop's scale-mode ``seq``,
    plans/loop.py) — never a single-partition window, never a driver
    materialization of the seed set.
    """
    from doonop_spark.functions.canonical import canonicalize_udf, surt_key_udf
    from doonop_spark.operators.filters import apply_link_filters

    cli = spark.createDataFrame([(u,) for u in cleaned], "url string")
    extra = extra_urls.select(
        canonicalize_udf(F.col("url").cast("string")).alias("url")
    ).filter(F.col("url").isNotNull())
    urls = apply_link_filters(cli.unionByName(extra), list(filters))
    urls = urls.dropDuplicates(["url"])

    n = n_partitions or spark.sparkContext.defaultParallelism
    # range-partitioned sort: partition i of the checkpointed frame holds
    # the i-th url range, sorted within — so (partition index, row offset)
    # IS the global sorted rank once per-partition offsets are added
    ordered = (
        urls.repartitionByRange(n, F.asc("url"))
        .sortWithinPartitions("url")
        .localCheckpoint(eager=True)
    )
    mid = F.monotonically_increasing_id()
    pid = F.shiftright(mid, 33).cast("int")
    pcounts = sorted(
        (r["pid"], r["n"])
        for r in ordered.groupBy(pid.alias("pid")).agg(F.count("*").alias("n")).collect()
    )
    offs, acc = {}, 0
    for p_, n_ in pcounts:
        offs[p_] = acc
        acc += n_
    off_expr = (
        F.element_at(F.create_map(*[F.lit(v) for kv in offs.items() for v in kv]), pid)
        if offs
        else F.lit(0)
    )
    seq = (off_expr + mid.bitwiseAND(F.lit((1 << 33) - 1))).cast("long")
    ukey = surt_key_udf(F.col("url")) if url_key == "surt" else F.col("url")
    return ordered.select(
        "url",
        ukey.alias("ukey"),
        seq.alias("seq"),
    ).select(
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
