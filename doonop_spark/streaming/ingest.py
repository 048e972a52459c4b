"""Structured Streaming surfaces (SURVEY.md §2.9).

The reference's crawl loop is iterative-batch, not a stream — a page's
links schedule only after its parent lands, a cyclic dependency Structured
Streaming forbids (SURVEY §3.4) — so `run_crawl` stays a driver loop.
What IS stream-shaped, and provided here:

- :func:`stream_pages` / :func:`stream_extract` — continuous ingest of
  newly-landed corpus files (e.g. a WARC-conversion job appending parquet)
  through the fused extract kernel into a results sink, exactly-once via
  checkpointing + ``availableNow`` batches.
- :func:`stream_metrics_rollup` — watermarked tumbling-window rollup of
  the crawl metrics table (late metric rows tolerated up to the
  watermark), the streaming analog of §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["PAGES_SCHEMA", "stream_pages", "stream_extract", "stream_metrics_rollup"]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream over an append-only corpus directory."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
    )


def stream_extract(pages: DataFrame) -> DataFrame:
    """Streaming projection through the fused Arrow extract kernel:
    (url, out_links, text, n_links). Stateless ⇒ append mode."""
    from doonop_spark.functions.extract import extract_page_udf

    return (
        pages.withColumn("__page", extract_page_udf("url", "html"))
        .select(
            "url",
            "warc_ts",
            F.col("__page.links").alias("out_links"),
            F.col("__page.text").alias("text"),
        )
        .withColumn("n_links", F.size("out_links"))
    )


def stream_metrics_rollup(
    pages: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked per-window, per-lang ingest rollup (late rows beyond the
    watermark dropped deterministically)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("bytes_html"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "bytes_html",
        )
    )


def run_ingest_once(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """One exactly-once availableNow pass: extract every not-yet-processed
    corpus file into the results sink. Re-running after a crash resumes
    from the checkpoint without duplicating output."""
    q = (
        stream_extract(stream_pages(spark, pages_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
