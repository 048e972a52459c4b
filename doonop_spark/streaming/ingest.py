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
- :func:`stream_discovered_links` + :func:`stream_first_sightings` — a
  CUSTOM STATEFUL operator via ``applyInPandasWithState``: per-host
  first-occurrence dedup of the discovered-link stream (state = the set of
  ``xxhash64`` keys the host has already emitted), the streaming analog of
  the seen-set anti-join (D1) for near-real-time link feeds. The batch
  anti-join + bloom sidecar remain the 10^10-scale path; this is the
  low-latency micro-path, and its per-host state partitioning matches the
  politeness scheduler's grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "PAGES_SCHEMA",
    "stream_pages",
    "stream_extract",
    "stream_metrics_rollup",
    "stream_discovered_links",
    "stream_first_sightings",
]

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


def stream_discovered_links(pages: DataFrame) -> DataFrame:
    """Streaming link expansion: pages → (url, host, url_hash) rows of the
    ABSOLUTIZED out-links (stateless: explode + JVM host/hash exprs)."""
    from doonop_spark.functions.canonical import host_expr, url_hash_col

    return (
        stream_extract(pages)
        # warc_ts rides along as the sighting's EVENT time (the page's
        # capture stamp) so downstream state can expire on event time
        .select("warc_ts", F.explode("out_links").alias("url"))
        .withColumn("host", host_expr(F.col("url")))
        .withColumn("url_hash", url_hash_col(F.col("url")))
    )


_SIGHTING_OUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
    ]
)
_SIGHTING_STATE = T.StructType(
    [T.StructField("hashes", T.ArrayType(T.LongType()))]
)


def stream_first_sightings(
    links: DataFrame,
    state_ttl_ms: int | None = None,
    max_hashes_per_host: int | None = None,
    event_time_col: str | None = None,
    event_time_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): emit each
    link the FIRST time its host group ever sees it, across micro-batches.
    State per host = the array of emitted ``xxhash64`` keys; duplicates
    inside one batch collapse too (first occurrence kept). Exactly-once
    with a checkpointed query: re-processing a batch replays the same
    state transition.

    State is BOUNDED two ways (unbounded NoTimeout state would grow
    forever on hot hosts and pay O(n) serialization every batch):

    - ``state_ttl_ms``: processing-time timeout — a host idle that long
      has its state dropped (a later re-sighting re-emits: the TTL is the
      recall/boundedness trade, standard for dedup-feed state). None
      (default) = never expire. Set it for CONTINUOUS deployments only:
      with ProcessingTimeTimeout, Spark keeps scheduling micro-batches to
      fire pending timeouts, so an ``availableNow`` batch-style query
      would never terminate (measured: 200+ empty batches) — TTL and
      availableNow are mutually exclusive by construction here.
    - ``max_hashes_per_host``: hard cap with oldest-first eviction (None =
      uncapped). An evicted hash may re-emit; the cap bounds worst-case
      state for one pathological host.
    - ``event_time_ttl_ms`` (+ ``event_time_col``, e.g. ``warc_ts`` from
      :func:`stream_discovered_links`): EVENT-time expiry — a host whose
      last sighting's event time falls ``event_time_ttl_ms`` behind the
      stream's watermark (``withWatermark(event_time_col,
      watermark_delay)`` is applied here) has its state dropped. Unlike
      the processing-time TTL this is replay-safe AND terminates under
      ``availableNow``: the watermark advances with the replayed data
      itself, so bounded state works for batch-style re-processing too.
      Mutually exclusive with ``state_ttl_ms``.

    The state array is appended in arrival order — never re-sorted — so an
    unchanged batch rewrites nothing and a changed one pays O(new keys).

    Scale note: per-host state is proportional to that host's distinct
    URLs inside the TTL — apt for the near-real-time feed this serves
    (fresh-crawl discovery streams); the 10^10 historical seen-set stays
    in the batch anti-join + bloom sidecar, not in streaming state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if state_ttl_ms is not None and event_time_ttl_ms is not None:
        raise ValueError("state_ttl_ms and event_time_ttl_ms are mutually exclusive")
    if event_time_ttl_ms is not None and not event_time_col:
        raise ValueError("event_time_ttl_ms needs event_time_col")

    def dedup(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        kept = list(state.get[0]) if state.exists else []
        seen = set(kept)
        host = key[0]
        changed = False
        last_event_ms = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            if event_time_ttl_ms is not None:
                m = pdf[event_time_col].max()
                ms = int(m.value // 1_000_000)  # pandas Timestamp → epoch ms
                last_event_ms = ms if last_event_ms is None else max(last_event_ms, ms)
            fresh = pdf[~pdf["url_hash"].isin(list(seen))].drop_duplicates(
                subset=["url_hash"]
            )
            if len(fresh):
                new = [int(h) for h in fresh["url_hash"]]
                seen.update(new)
                kept.extend(new)  # arrival order: no re-sort per batch
                changed = True
                yield fresh.assign(host=host)[["host", "url", "url_hash"]]
        if max_hashes_per_host is not None and len(kept) > max_hashes_per_host:
            kept = kept[-max_hashes_per_host:]  # oldest-first eviction
            changed = True
        if changed or not state.exists:
            state.update((kept,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        elif event_time_ttl_ms is not None and last_event_ms is not None:
            # expire when the watermark passes last sighting + TTL; Spark
            # requires the stamp to sit beyond the current watermark
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_event_ms + event_time_ttl_ms, wm + 1))

    if event_time_ttl_ms is not None:
        links = links.withWatermark(event_time_col, watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    elif state_ttl_ms is not None:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout

    return links.groupBy("host").applyInPandasWithState(
        dedup,
        outputStructType=_SIGHTING_OUT,
        stateStructType=_SIGHTING_STATE,
        outputMode="append",
        timeoutConf=timeout,
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
