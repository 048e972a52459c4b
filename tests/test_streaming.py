"""Streaming ingest: exactly-once availableNow extraction, the watermarked
metrics rollup, and the applyInPandasWithState first-sighting dedup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doonop_spark.sources.corpus import synthetic_corpus
from doonop_spark.streaming.ingest import (
    PAGES_SCHEMA,
    run_ingest_once,
    stream_discovered_links,
    stream_first_sightings,
    stream_metrics_rollup,
    stream_pages,
)


def test_ingest_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=50)
    corpus.write.mode("overwrite").parquet(pages_dir)

    run_ingest_once(spark, pages_dir, out_dir, ckpt)
    first = spark.read.parquet(out_dir)
    assert first.count() == 50
    # text byte-identical through the streaming path too
    joined = first.join(corpus.select("url", F.col("text").alias("t")), "url")
    assert joined.filter(F.col("text") != F.col("t")).count() == 0

    # re-run with NO new files: checkpoint prevents duplicates
    run_ingest_once(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 50

    # append new files: only the delta lands
    synthetic_corpus(spark, n_hosts=2, n_pages=50).selectExpr(
        "concat(url, '?v=2') as url", "warc_ts", "html", "text", "lang"
    ).write.mode("append").parquet(pages_dir)
    run_ingest_once(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 100


def test_metrics_rollup_batch_semantics(spark, tmp_path):
    """Run the rollup on a memory-sink availableNow stream."""
    pages_dir = str(tmp_path / "pages2")
    synthetic_corpus(spark, n_hosts=2, n_pages=40).write.parquet(pages_dir)
    # complete mode: append-mode windows only emit once the watermark
    # passes them, which never happens in a finite availableNow batch
    q = (
        stream_metrics_rollup(stream_pages(spark, pages_dir), window="1 hour")
        .writeStream.format("memory")
        .queryName("rollup_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from rollup_out")
    assert out.count() > 0
    total = out.agg(F.sum("n_pages")).collect()[0][0]
    assert total == 40


def test_first_sightings_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState: first-occurrence-per-host dedup ACROSS
    micro-batches. Two corpus files land with heavily overlapping link
    sets; maxFilesPerTrigger=1 forces ≥2 micro-batches, so the second
    batch's duplicates are rejected by carried state, not by a
    within-batch distinct."""
    pages_dir = str(tmp_path / "pages3")
    # same 30-page site written twice (distinct file sets, identical urls)
    # ⇒ identical discovered-link sets in different micro-batches
    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=30)
    corpus.write.mode("overwrite").parquet(pages_dir)
    corpus.write.mode("append").parquet(pages_dir)

    pages = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    q = (
        stream_first_sightings(stream_discovered_links(pages))
        .writeStream.format("memory")
        .queryName("sightings_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from sightings_out")
    # every discovered link appears EXACTLY once despite arriving twice
    assert out.count() == out.select("url_hash").distinct().count()
    # ground truth: the distinct link set of the batch extraction
    from doonop_spark.functions.extract import extract_page_udf

    truth = (
        corpus.withColumn("__p", extract_page_udf("url", "html"))
        .select(F.explode("__p.links").alias("url"))
        .distinct()
        .count()
    )
    assert out.count() == truth
    assert out.groupBy("host").count().count() == 2  # per-host state groups


def test_first_sightings_state_cap_bounds_and_reemits(spark, tmp_path):
    """max_hashes_per_host: state is hard-capped with oldest-first
    eviction — an evicted key may re-emit (documented trade), but state
    never exceeds the cap; dedup within the cap window still holds."""
    pages_dir = str(tmp_path / "pages_cap")
    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=30)
    corpus.write.mode("overwrite").parquet(pages_dir)
    corpus.write.mode("append").parquet(pages_dir)

    pages = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    q = (
        stream_first_sightings(
            stream_discovered_links(pages), state_ttl_ms=None, max_hashes_per_host=4
        )
        .writeStream.format("memory")
        .queryName("sightings_cap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM sightings_cap")
    # duplicates CAN re-emit past the cap window, but never within a batch,
    # and total output stays far below the raw duplicated link volume
    per_url = out.groupBy("url").count()
    raw = stream_discovered_links_batch_count(spark, corpus)
    assert out.count() < raw
    assert per_url.agg(F.max("count")).collect()[0][0] <= 4


def stream_discovered_links_batch_count(spark, corpus):
    """Raw (pre-dedup) discovered-link volume of the doubled corpus."""
    from doonop_spark.functions.extract import extract_page_udf

    links = (
        corpus.withColumn("__page", extract_page_udf("url", "html"))
        .select(F.explode("__page.links"))
    )
    return links.count() * 2


def test_first_sightings_ttl_expires_and_reemits(spark, tmp_path):
    """state_ttl_ms (continuous deployments): an idle host's state expires
    via processing-time timeout, so the same link re-emits after the TTL —
    bounded state, documented recall trade. Uses a processingTime trigger
    (TTL + availableNow would never terminate: Spark keeps scheduling
    batches to fire pending timeouts)."""
    import time

    pages_dir = str(tmp_path / "pages_ttl")
    corpus = synthetic_corpus(spark, n_hosts=1, n_pages=4, hot_share=1.0)
    corpus.write.mode("overwrite").parquet(pages_dir)

    pages = spark.readStream.schema(corpus.schema).parquet(pages_dir)
    q = (
        stream_first_sightings(
            stream_discovered_links(pages), state_ttl_ms=500
        )
        .writeStream.format("memory")
        .queryName("sightings_ttl")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        first = None
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM sightings_ttl").collect()[0].c
            if first is None and n > 0:
                first = n
                # same files re-land AFTER the TTL has expired the state
                time.sleep(3)
                corpus.write.mode("append").parquet(pages_dir)
            elif first is not None and n > first:
                break
            time.sleep(1)
        assert first is not None and n > first, (first, n)
    finally:
        q.stop()


def _pages_with_ts(spark, rows):
    """rows: (url, links, ts_str) → PAGES_SCHEMA frame with controlled
    event times (warc_ts) for watermark-driven tests."""
    df = spark.createDataFrame(rows, "url string, links array<string>, ts string")
    anchors = F.array_join(
        F.transform("links", lambda l: F.concat(F.lit('<a href="'), l, F.lit('">x</a>'))),
        "",
    )
    return df.select(
        "url",
        F.to_timestamp("ts").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), anchors, F.lit("<main>t</main></body></html>")),
            "utf-8",
        ).alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )


def test_first_sightings_event_time_ttl_availablenow_replay(spark, tmp_path):
    """EVENT-time TTL: state expires when the watermark (carried by the
    replayed data itself) passes last-sighting + TTL — so bounded state
    works under availableNow batch replays, where the processing-time TTL
    would never terminate. Four sequential availableNow runs over one
    checkpoint: emit → watermark advances → host expires → same link
    re-emits; every run TERMINATES."""
    pages_dir = str(tmp_path / "pages_evttl")
    out_dir = str(tmp_path / "out_evttl")
    ckpt = str(tmp_path / "ckpt_evttl")
    link = "http://a.example/dup"

    def run_once():
        pages = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        q = (
            stream_first_sightings(
                stream_discovered_links(pages),
                event_time_col="warc_ts",
                event_time_ttl_ms=10 * 60 * 1000,  # 10 min of event time
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        assert q.awaitTermination(180), "availableNow run did not terminate"

    def emits():
        import glob

        if not glob.glob(out_dir + "/*.parquet"):
            return []
        return [r.url for r in spark.read.parquet(out_dir).collect()]

    # run 1: host a sights the link at T0
    _pages_with_ts(
        spark, [("http://a.example/p1", [link], "2024-01-01 00:00:00")]
    ).write.mode("append").parquet(pages_dir)
    run_once()
    assert emits().count(link) == 1

    # run 2: unrelated host advances the watermark past T0 + TTL
    _pages_with_ts(
        spark, [("http://b.example/p1", ["http://b.example/l1"], "2024-01-01 01:00:00")]
    ).write.mode("append").parquet(pages_dir)
    run_once()
    # run 3: next batch fires host a's event-time timeout (a has no data)
    _pages_with_ts(
        spark, [("http://b.example/p2", ["http://b.example/l2"], "2024-01-01 02:00:00")]
    ).write.mode("append").parquet(pages_dir)
    run_once()
    assert emits().count(link) == 1  # still deduped so far

    # run 4: the SAME link re-lands after expiry → re-emits (recall trade)
    _pages_with_ts(
        spark, [("http://a.example/p2", [link], "2024-01-01 02:30:00")]
    ).write.mode("append").parquet(pages_dir)
    run_once()
    assert emits().count(link) == 2


def test_first_sightings_ttl_modes_mutually_exclusive(spark):
    import pytest as _pytest

    links = spark.createDataFrame(
        [], "warc_ts timestamp, url string, host string, url_hash long"
    )
    with _pytest.raises(ValueError, match="mutually exclusive"):
        stream_first_sightings(links, state_ttl_ms=1, event_time_ttl_ms=1,
                               event_time_col="warc_ts")
    with _pytest.raises(ValueError, match="needs event_time_col"):
        stream_first_sightings(links, event_time_ttl_ms=1)
