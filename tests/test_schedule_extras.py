"""Scheduler extras: sitemap expansion (S6), graceful-shutdown cancel
(X3), applyInPandas politeness parity with the window implementation."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from doonop_spark.operators.schedule import select_wave
from doonop_spark.plans.job import CrawlJob, RetryPolicy
from doonop_spark.plans.loop import run_crawl
from doonop_spark.sources.corpus import synthetic_corpus
from doonop_spark.sources.sitemap import (
    expand_sitemaps,
    seeds_with_sitemaps,
    sitemap_urls_from_robots,
)


def test_sitemap_expansion(spark):
    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nSitemap: http://a.example/sitemap.xml\n"),
            ("b.example", "User-agent: *\nDisallow: /x\n"),  # no sitemap
        ],
        "host string, robots_txt string",
    )
    sm_xml = (
        "<?xml version='1.0'?><urlset>"
        "<url><loc>http://a.example/p1</loc></url>"
        "<url><loc> http://a.example/p2 </loc></url>"
        "</urlset>"
    )
    corpus = spark.createDataFrame(
        [("http://a.example/sitemap.xml", sm_xml.encode())], "url string, html binary"
    )
    sm = sitemap_urls_from_robots(robots)
    assert [r.sitemap_url for r in sm.collect()] == ["http://a.example/sitemap.xml"]
    urls = sorted(r.url for r in expand_sitemaps(sm, corpus).collect())
    assert urls == ["http://a.example/p1", "http://a.example/p2"]
    seeds = seeds_with_sitemaps(["http://z.example/"], robots, corpus, [])
    assert seeds == [
        "http://a.example/p1",
        "http://a.example/p2",
        "http://z.example/",
    ]


def test_cancel_drains_and_resumes(spark, tmp_path):
    """X3: cancel after the first wave ≈ ctrl-c — partial results kept,
    checkpoint resumable to the identical final state."""
    from doonop_spark.sources.tables import SnapshotTableIO

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=30)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    job = CrawlJob(seeds=seeds, engines=4)

    class AfterOneWave:
        def __init__(self):
            self.n = 0

        def is_set(self):
            self.n += 1
            return self.n > 2

    io = SnapshotTableIO(str(tmp_path / "c"))
    partial = run_crawl(spark, job, corpus, io=io, cancel=AfterOneWave())
    assert 0 < partial.stats.count_visited < 30
    resumed = run_crawl(spark, job, corpus, io=io, resume=True)
    full = run_crawl(spark, job, corpus)
    assert sorted(r.url for r in resumed.results.collect()) == sorted(
        r.url for r in full.results.collect()
    )
    # a real threading.Event set up-front stops before any wave
    ev = threading.Event()
    ev.set()
    stopped = run_crawl(spark, job, corpus, cancel=ev)
    assert stopped.stats.count_visited == 0


def test_politeness_pandas_matches_window(spark):
    rows = [
        (f"http://h{h}.example/p{i}", f"http://h{h}.example/p{i}", 0, 10 * h + i,
         False, 0, 0.0, f"h{h}.example")
        for h in range(3)
        for i in range(6)
    ]
    frontier = spark.createDataFrame(
        rows,
        "url string, ukey string, depth int, seq long, is_retry boolean,"
        " retry_count int, retry_at double, host string",
    ).withColumn("url_hash", F.xxhash64("ukey"))
    budgets = spark.createDataFrame(
        [("h0.example", 2), ("h1.example", 4)], "host string, budget int"
    )
    kw = dict(
        policy=RetryPolicy.FIRST,
        wave_size=None,
        now=0.0,
        fresh_empty=False,
        per_host_budget=budgets,
        default_budget=3,
    )
    w = select_wave(frontier, impl="window", **kw)
    p = select_wave(frontier, impl="pandas", **kw)
    ws = sorted((r.host, r.seq) for r in w.collect())
    ps = sorted((r.host, r.seq) for r in p.collect())
    assert ws == ps
    per_host = {}
    for h, _ in ws:
        per_host[h] = per_host.get(h, 0) + 1
    assert per_host == {"h0.example": 2, "h1.example": 4, "h2.example": 3}
    # budget takes the LIFO-latest per host
    assert ("h0.example", 5) in ws and ("h0.example", 0) not in ws


def test_check_url_program(spark):
    """§2.10: the reference's default program collects the page URL."""
    corpus = synthetic_corpus(spark, n_hosts=1, n_pages=3)
    job = CrawlJob(seeds=["http://h0000.example/p0"], engines=1, check="url")
    res = run_crawl(spark, job, corpus)
    assert all(r.data == r.url for r in res.results.collect())
