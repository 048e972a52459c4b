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
    xml = sitemap_urls.join(
        corpus.select(F.col("url").alias("sitemap_url"), "html"), "sitemap_url"
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
    (sort/dedup/filter — F4)."""
    from doonop_spark.operators.filters import clean_seeds

    extra: list[str] = []
    if robots is not None:
        sm = expand_sitemaps(sitemap_urls_from_robots(robots), corpus)
        extra = [r.url for r in sm.collect()]
    return clean_seeds(list(seeds) + extra, filters)
