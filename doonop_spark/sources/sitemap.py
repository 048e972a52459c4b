"""Sitemap seed expansion (SURVEY.md §2.1 S6; reference
``scripts/sitemap.sh:12-23``: curl robots.txt → ``Sitemap:`` lines →
xpath ``/urlset/url/loc/text()``).

Spark shape: both steps are table transforms —

1. :func:`sitemap_urls_from_robots` — pull ``Sitemap:`` declarations out
   of the robots table (JVM regexp, one pass).
2. :func:`expand_sitemaps` — join those sitemap URLs against the corpus
   and extract ``<loc>`` entries from the XML bodies (JVM
   ``regexp_extract_all``; sitemap XML is flat enough that a full parser
   buys nothing), yielding seed URLs to union into the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sitemap_urls_from_robots", "expand_sitemaps", "seeds_with_sitemaps"]


def sitemap_urls_from_robots(robots: DataFrame) -> DataFrame:
    """robots(host, robots_txt) → (host, sitemap_url) per Sitemap: line."""
    return (
        robots.select(
            "host",
            F.explode(
                F.regexp_extract_all(
                    F.col("robots_txt"), F.lit(r"(?i)sitemap:\s*(\S+)"), F.lit(1)
                )
            ).alias("sitemap_url"),
        )
    )


def expand_sitemaps(sitemap_urls: DataFrame, corpus: DataFrame) -> DataFrame:
    """(host, sitemap_url) ⋈ corpus on url → exploded <loc> seed URLs.
    Sitemaps missing from the corpus are skipped silently (fetch-miss
    semantics, same as robots F6)."""
    # broadcast the tiny robots-derived sitemap-URL set so the corpus —
    # including html:binary — streams through a BroadcastHashJoin probe
    # instead of shuffling in a sort-merge join (100 TB: one corpus scan,
    # zero corpus shuffle)
    xml = corpus.select(F.col("url").alias("sitemap_url"), "html").join(
        F.broadcast(sitemap_urls.select("host", "sitemap_url")), "sitemap_url"
    )
    locs = xml.select(
        "host",
        F.explode(
            F.regexp_extract_all(
                F.decode(F.col("html"), "utf-8"),
                F.lit(r"<loc>\s*([^<\s]+)\s*</loc>"),
                F.lit(1),
            )
        ).alias("url"),
    )
    return locs.select("url").distinct()


def seeds_with_sitemaps(
    seeds: list[str], robots: DataFrame | None, corpus: DataFrame, filters
) -> list[str]:
    """S6 end-to-end: CLI seeds + every sitemap-declared URL, cleaned once
    (sort/dedup/filter — F4).

    .. deprecated:: round 5
        Returning ``list[str]`` inherently materializes the seed set on
        the driver — fine for test fixtures, wrong for a 100 TB sitemap
        expansion. The CLI path uses
        :func:`doonop_spark.sources.seeds.seed_frontier_distributed`
        instead (seeds stay a DataFrame into the wave-0 frontier); this
        helper now delegates to it so the cleaning/ordering semantics
        live in exactly one place, and warns.
    """
    import warnings

    warnings.warn(
        "seeds_with_sitemaps materializes the seed set on the driver; "
        "use seed_frontier_distributed (sources/seeds.py) for the scale path",
        DeprecationWarning,
        stacklevel=2,
    )
    from doonop_spark.operators.filters import clean_seeds
    from doonop_spark.sources.seeds import seed_frontier_distributed

    spark = corpus.sparkSession
    if robots is not None:
        extra = expand_sitemaps(sitemap_urls_from_robots(robots), corpus)
    else:
        extra = spark.createDataFrame([], "url string")
    frontier = seed_frontier_distributed(
        spark, clean_seeds(list(seeds), filters), extra, filters=filters
    )
    return [r.url for r in frontier.orderBy("seq").select("url").collect()]
