"""Host-level corpus statistics — the crawl-reporting rollup a web-scale
corpus ships alongside the archives (Common Crawl publishes exactly this
as its host-level stats tables: pages, bytes, languages per host).

Extends the reference's per-run stats line (SURVEY.md §2.12,
``src/stats.rs``) from one global row to a per-host table. Spark shape:
ONE hash aggregation keyed on the JVM-extracted host — partial
aggregation (map-side combine) collapses each input partition to its
distinct hosts before the exchange, so the shuffle carries O(#hosts)
rows per partition, not O(#pages); at 100 TB the exchange moves a few
million host rows, never the corpus. The distinct-language count rides
the same agg as an Expand (two-phase partial distinct), still
map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["host_stats"]


def host_stats(
    corpus: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """``(host, n_pages, sum_chars, n_langs, n_quality)`` per host:
    page count, total extracted-text characters, distinct languages seen,
    and pages passing the heuristic quality score
    (``functions.text.quality_score_expr`` — all JVM codegen, no UDF)."""
    from doonop_spark.functions.canonical import host_expr
    from doonop_spark.functions.text import quality_score_expr

    text = F.col(text_col)
    return (
        corpus.groupBy(host_expr(F.col(url_col)).alias("host"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length(text)).alias("sum_chars"),
            F.countDistinct(F.col(lang_col)).alias("n_langs"),
            F.sum(quality_score_expr(text).cast("long")).alias("n_quality"),
        )
    )
