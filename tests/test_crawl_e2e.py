"""End-to-end crawl loop tests — mirrors the reference's three test levels
(SURVEY.md §5): mock-backend loop tests (``src/lib.rs:101-245``) and the
fixture-site integration goldens (``tests/crawling.rs:4-53``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doonop_spark.plans.job import CrawlJob, RetryPolicy
from doonop_spark.plans.loop import run_crawl
from doonop_spark.sources.corpus import fixture_site_corpus, synthetic_corpus


def mock_corpus(spark, pages: dict[str, list[str]], data: dict[str, str] | None = None):
    """Corpus analog of the reference MockBackend (src/lib.rs:209-226):
    each url yields (links, data)."""
    rows = [
        (
            url,
            "".join(f'<a href="{l}">x</a>' for l in links)
            + f"<main>{(data or {}).get(url, url)}</main>",
        )
        for url, links in pages.items()
    ]
    df = spark.createDataFrame(rows, "url string, body string")
    return df.select(
        "url",
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("body"), F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )


def collected_data(res):
    """Results in collection order — the reference's Vec<Value>."""
    return [
        r.data
        for r in res.results.orderBy("iteration", "dispatch_rank").collect()
    ]


def test_crawl_with_single_engine_order(spark):
    """Port of crawl_with_single_engine (src/lib.rs:117-134): seed example1
    → finds example2, example3 → LIFO visits example3 first; example1
    re-discovered is NOT re-crawled; data collected in exact order."""
    corpus = mock_corpus(
        spark,
        {
            "http://example1.com/": ["http://example2.com", "http://example3.com"],
            "http://example2.com/": [],
            "http://example3.com/": ["http://example1.com"],
        },
        data={
            "http://example1.com/": "d1",
            "http://example3.com/": "d2",  # visited 2nd (LIFO pop)
            "http://example2.com/": "d3",
        },
    )
    job = CrawlJob(seeds=["http://example1.com"], engines=1)
    res = run_crawl(spark, job, corpus)
    # reference golden: order d1 (seed), then last-enqueued link first
    assert collected_data(res) == ["d1", "d2", "d3"]
    assert res.stats.count_visited == 3
    assert res.stats.count_collected == 3
    assert res.stats.count_errors == 0
    assert res.stats.count_retries == 0
    # seen = everything ever enqueued
    assert res.seen.count() == 3
    assert res.frontier.count() == 0


def test_fixture_site_golden(spark):
    """tests/crawling.rs:20-22: visited=2, collected=2, errors=0, retries=0
    on the 2-page fixture site; text byte-identical to corpus ground truth."""
    corpus = fixture_site_corpus(spark)
    job = CrawlJob(seeds=["http://localhost:8000/basic/index.html"], engines=1)
    res = run_crawl(spark, job, corpus)
    s = res.stats
    assert (s.count_visited, s.count_collected, s.count_errors, s.count_retries) == (
        2,
        2,
        0,
        0,
    )
    got = {r.url: r.data for r in res.results.collect()}
    truth = {r.url: r.text for r in corpus.collect()}
    assert got == truth  # byte-identical extracted text per URL


def test_empty_seed_zero_stats(spark):
    # tests/crawling.rs:4-11 — empty seed degrades to zero-stats success
    res = run_crawl(spark, CrawlJob(seeds=[]), fixture_site_corpus(spark))
    assert vars(res.stats) == dict(
        count_errors=0, count_retries=0, count_visited=0, count_collected=0
    )
    assert res.results.count() == 0


def test_missing_page_is_terminal_error(spark):
    """E3: URL absent from corpus = fetch error → visited++, errors++, no
    result row, never revisited."""
    corpus = mock_corpus(
        spark, {"http://a.com/": ["http://gone.com/404", "http://b.com"], "http://b.com/": []}
    )
    res = run_crawl(spark, CrawlJob(seeds=["http://a.com"], engines=1), corpus)
    assert res.stats.count_visited == 3
    assert res.stats.count_collected == 2
    assert res.stats.count_errors == 1
    assert res.results.filter(F.col("url") == "http://gone.com/404").count() == 0


def test_limit_overshoot_by_at_most_wave(spark):
    """O5: stop scheduling once N collected; in-flight (same wave) results
    still land (src/workload.rs:127-131)."""
    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=40)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    job = CrawlJob(seeds=seeds, engines=4, limit=5)
    res = run_crawl(spark, job, corpus)
    assert res.stats.count_collected >= 5
    assert res.stats.count_collected <= 5 + 4  # overshoot ≤ wave size
    assert res.frontier.count() > 0  # un-dispatched URLs remain


def test_retry_policy_first_with_fault_injection(spark):
    """E1/E2 + O2/O3/O4: a timeout is retried (RetryFirst) and succeeds on
    attempt 2; retry budget exhaustion gives up terminally (D2)."""
    corpus = mock_corpus(
        spark,
        {
            "http://a.com/": ["http://flaky.com", "http://dead.com"],
            "http://flaky.com/": [],
            "http://dead.com/": [],
        },
        data={"http://a.com/": "a", "http://flaky.com/": "f", "http://dead.com/": "d"},
    )
    faults = spark.createDataFrame(
        [
            ("http://flaky.com/", 1, "timeout"),  # attempt 1 times out
            ("http://dead.com/", 1, "timeout"),  # always times out
            ("http://dead.com/", 2, "timeout"),
            ("http://dead.com/", 3, "timeout"),
        ],
        "url string, attempt int, fault string",
    )
    job = CrawlJob(
        seeds=["http://a.com"],
        engines=1,
        retry_policy=RetryPolicy.FIRST,
        retry_count=2,  # keep_retry: count>=2 ⇒ give up
        retry_threshold=0.0,
    )
    res = run_crawl(spark, job, corpus, fault_schedule=faults)
    data = collected_data(res)
    assert "a" in data and "f" in data
    assert "d" not in data  # budget exhausted before success
    # visited counts every engine result incl. timeouts
    # a ok, dead t, flaky t, dead t(exhaust), flaky ok → depends on order;
    # assert the invariants instead of the exact interleaving:
    assert res.stats.count_collected == 2
    assert res.stats.count_retries == 3  # flaky×1 + dead×2 (budget 2)
    assert res.stats.count_errors == 0
    assert res.frontier.count() == 0


def test_retry_policy_no_timeouts_are_errors(spark):
    corpus = mock_corpus(spark, {"http://a.com/": []})
    faults = spark.createDataFrame(
        [("http://a.com/", 1, "timeout")], "url string, attempt int, fault string"
    )
    res = run_crawl(
        spark,
        CrawlJob(seeds=["http://a.com"], engines=1, retry_policy=RetryPolicy.NO),
        corpus,
        fault_schedule=faults,
    )
    assert res.stats.count_errors == 1
    assert res.stats.count_retries == 0
    assert res.stats.count_collected == 0


def test_robots_silent_skip(spark):
    """F6: disallowed URLs are silently skipped — not visited, not counted,
    but consumed from the frontier and left in seen (never revisited).
    Hosts missing from the robots table are skipped entirely."""
    corpus = mock_corpus(
        spark,
        {
            "http://a.example/": ["http://a.example/private/x", "http://a.example/ok"],
            "http://a.example/ok": [],
            "http://a.example/private/x": [],
        },
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    job = CrawlJob(seeds=["http://a.example"], engines=1, use_robots=True)
    res = run_crawl(spark, job, corpus, robots=robots)
    urls = {r.url for r in res.results.collect()}
    assert urls == {"http://a.example/", "http://a.example/ok"}
    assert res.stats.count_visited == 2  # the disallowed one never counted
    assert res.stats.count_errors == 0
    assert res.seen.count() == 3  # ...but it is in seen
    assert res.frontier.count() == 0


def test_dedup_across_hosts_and_duplicate_links(spark):
    """D1/D3 on the synthetic graph (duplicate links built in): every page
    visited exactly once; visited == number of reachable pages."""
    corpus = synthetic_corpus(spark, n_hosts=3, n_pages=60)
    seeds = [
        "http://h0000.example/p0",
        "http://h0001.example/p0",
        "http://h0002.example/p0",
    ]
    res = run_crawl(spark, CrawlJob(seeds=seeds, engines=16), corpus)
    n = corpus.count()
    assert res.stats.count_visited == n
    assert res.stats.count_collected == n
    assert res.results.select("url").distinct().count() == n
    assert res.results.count() == n  # no double-visits


def test_parallelism_invariance_of_final_state(spark):
    """north_rule: identical final seen-set and result set at any
    parallelism; only interleaving differs (reference analog:
    src/lib.rs:136-155 is timing-dependent with 2 engines)."""
    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=30)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    r1 = run_crawl(spark, CrawlJob(seeds=seeds, engines=1), corpus)
    r8 = run_crawl(spark, CrawlJob(seeds=seeds, engines=None, per_host_budget=64), corpus)
    urls1 = sorted(r.url for r in r1.results.collect())
    urls8 = sorted(r.url for r in r8.results.collect())
    assert urls1 == urls8
    seen1 = sorted(r.ukey for r in r1.seen.collect())
    seen8 = sorted(r.ukey for r in r8.seen.collect())
    assert seen1 == seen8


def test_checkpoint_resume_identical(spark, tmp_path):
    """north_rule exact resumability: kill after wave k, resume ⇒ identical
    final results/seen to an uninterrupted run."""
    from doonop_spark.sources.tables import SnapshotTableIO

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=24)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    job = CrawlJob(seeds=seeds, engines=4, max_iterations=10_000)

    full = run_crawl(spark, job, corpus, io=SnapshotTableIO(str(tmp_path / "full")))

    # interrupted run: stop after 3 waves (max_iterations as the kill)
    part_io = SnapshotTableIO(str(tmp_path / "part"))
    job_k = CrawlJob(seeds=seeds, engines=4, max_iterations=3)
    run_crawl(spark, job_k, corpus, io=part_io)
    resumed = run_crawl(spark, job, corpus, io=part_io, resume=True)

    a = sorted((r.url, r.data) for r in full.results.collect())
    b = sorted((r.url, r.data) for r in resumed.results.collect())
    assert a == b
    assert sorted(r.ukey for r in full.seen.collect()) == sorted(
        r.ukey for r in resumed.seen.collect()
    )
    assert (
        full.stats.count_visited
        == resumed.stats.count_visited
        == corpus.count()
    )


def test_bloom_sidecar_crawl_identical(spark):
    """north_rule bloom sidecar wired into the loop: a crawl with the bloom
    pre-filter on reproduces byte-identical results, seen-set and stats vs
    the exact-only path (FPs only cost a probe, never a drop)."""
    corpus = synthetic_corpus(spark, n_hosts=3, n_pages=90)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    base = run_crawl(
        spark, CrawlJob(seeds=seeds, engines=None, per_host_budget=64), corpus
    )
    bloomed = run_crawl(
        spark,
        CrawlJob(
            seeds=seeds,
            engines=None,
            per_host_budget=64,
            bloom_partitions=8,
            bloom_expected_per_partition=256,
        ),
        corpus,
    )
    assert sorted((r.url, r.data) for r in base.results.collect()) == sorted(
        (r.url, r.data) for r in bloomed.results.collect()
    )
    assert sorted(r.ukey for r in base.seen.collect()) == sorted(
        r.ukey for r in bloomed.seen.collect()
    )
    assert vars(base.stats) == vars(bloomed.stats)


def test_bloom_copartitioned_crawl_identical(spark):
    """The 10^10 probe path (cogroup on pid, bank never driver-resident)
    reproduces the exact-path crawl byte-identically — results, seen set,
    stats — including across bank folds (fold_every=2)."""
    corpus = synthetic_corpus(spark, n_hosts=3, n_pages=90)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    base = run_crawl(
        spark, CrawlJob(seeds=seeds, engines=None, per_host_budget=64), corpus
    )
    coparted = run_crawl(
        spark,
        CrawlJob(
            seeds=seeds,
            engines=None,
            per_host_budget=64,
            bloom_partitions=8,
            bloom_expected_per_partition=256,
            bloom_fold_every=2,
            bloom_probe_mode="copartition",
        ),
        corpus,
    )
    assert sorted((r.url, r.data) for r in base.results.collect()) == sorted(
        (r.url, r.data) for r in coparted.results.collect()
    )
    assert sorted(r.ukey for r in base.seen.collect()) == sorted(
        r.ukey for r in coparted.seen.collect()
    )
    assert vars(base.stats) == vars(coparted.stats)


def test_bucketed_corpus_crawl_identical(spark, tmp_path):
    """Storage-partitioned fetch: crawling a bucket-partitioned corpus
    yields byte-identical results to the plain url join, and each wave's
    corpus scan is pruned to the wave's buckets (PartitionFilters)."""
    from doonop_spark.sources.corpus import (
        bucket_expr,
        read_bucketed_corpus,
        write_bucketed_corpus,
    )

    corpus = synthetic_corpus(spark, n_hosts=3, n_pages=80)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    base = run_crawl(spark, CrawlJob(seeds=seeds, engines=8), corpus)

    path = str(tmp_path / "bucketed")
    write_bucketed_corpus(corpus, path, n_buckets=16)
    bcorpus = read_bucketed_corpus(spark, path)
    assert "bucket" in bcorpus.columns
    res = run_crawl(
        spark, CrawlJob(seeds=seeds, engines=8, corpus_buckets=16), bcorpus
    )
    assert sorted((r.url, r.data) for r in base.results.collect()) == sorted(
        (r.url, r.data) for r in res.results.collect()
    )
    assert vars(base.stats) == vars(res.stats)

    # the pruning predicate reaches the scan as a PARTITION filter (not a
    # post-scan data filter): a 1-bucket wave reads only that bucket's
    # directory, not the whole corpus
    one = bcorpus.filter(F.col("bucket").isin([3]))
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan
    assert "bucket" in pf[1].split("]", 1)[0]


def test_bucketed_corpus_wrong_b_fails_loudly(spark, tmp_path):
    """pmod(xxhash64(url), B') with B' ≠ layout B maps urls to partition
    values that don't exist — every fetch silently misses. The loop must
    read the layout's own bucket count (sidecar → column metadata) and
    refuse a mismatched flag instead."""
    from doonop_spark.sources.corpus import (
        read_bucketed_corpus,
        write_bucketed_corpus,
    )

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=20)
    path = str(tmp_path / "b16")
    write_bucketed_corpus(corpus, path, n_buckets=16)
    bcorpus = read_bucketed_corpus(spark, path)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]

    with pytest.raises(ValueError, match="written with n_buckets=16"):
        run_crawl(spark, CrawlJob(seeds=seeds, engines=8, corpus_buckets=8), bcorpus)

    # ...and with no flag at all, B derives from the layout: the crawl
    # prunes correctly and matches the plain-corpus run
    base = run_crawl(spark, CrawlJob(seeds=seeds, engines=8), corpus)
    derived = run_crawl(spark, CrawlJob(seeds=seeds, engines=8), bcorpus)
    assert sorted((r.url, r.data) for r in base.results.collect()) == sorted(
        (r.url, r.data) for r in derived.results.collect()
    )
    assert vars(base.stats) == vars(derived.stats)


def test_seen_compaction_identical_and_bounded(spark, tmp_path):
    """Seen-delta compaction: aggressive compaction (every 2 waves) yields
    byte-identical crawl output, and the durable backend holds O(K) seen
    parts at the end instead of one per wave."""
    import os

    from doonop_spark.sources.tables import SnapshotTableIO

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=64)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    base = run_crawl(
        spark, CrawlJob(seeds=seeds, engines=4, seen_compact_every=0), corpus
    )
    io = SnapshotTableIO(str(tmp_path / "c"))
    res = run_crawl(
        spark, CrawlJob(seeds=seeds, engines=4, seen_compact_every=2), corpus, io=io
    )
    assert sorted((r.url, r.data) for r in base.results.collect()) == sorted(
        (r.url, r.data) for r in res.results.collect()
    )
    assert vars(base.stats) == vars(res.stats)
    parts = [
        d for d in os.listdir(tmp_path / "c" / "seen") if d.startswith("part_iter=")
    ]
    # 32 waves (engines=4, 64 pages); without compaction there would be
    # ~33 parts; with K=2 at most K+1 survive past the last compaction
    assert len(parts) <= 3


def test_resume_with_compaction(spark, tmp_path):
    """Kill-and-resume still reproduces the uninterrupted run when
    compaction rewrote the seen chain before the kill."""
    from doonop_spark.sources.tables import SnapshotTableIO

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=24)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    job = CrawlJob(seeds=seeds, engines=4, seen_compact_every=2)

    full = run_crawl(spark, job, corpus, io=SnapshotTableIO(str(tmp_path / "full")))
    part_io = SnapshotTableIO(str(tmp_path / "part"))
    job_k = CrawlJob(seeds=seeds, engines=4, seen_compact_every=2, max_iterations=3)
    run_crawl(spark, job_k, corpus, io=part_io)
    resumed = run_crawl(spark, job, corpus, io=part_io, resume=True)
    assert sorted((r.url, r.data) for r in full.results.collect()) == sorted(
        (r.url, r.data) for r in resumed.results.collect()
    )
    assert sorted(r.ukey for r in full.seen.collect()) == sorted(
        r.ukey for r in resumed.seen.collect()
    )


@pytest.mark.parametrize("probe_mode", ["auto", "broadcast", "copartition"])
def test_resume_with_bloom(spark, tmp_path, probe_mode):
    """Kill-and-resume with the bloom sidecar on (both probe modes): the
    bank is rebuilt from the checkpointed seen set at resume, so the
    resumed run reproduces the uninterrupted run exactly (never-drop
    invariant survives the restart)."""
    from doonop_spark.sources.tables import SnapshotTableIO

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=16)
    seeds = ["http://h0000.example/p0", "http://h0001.example/p0"]
    kw = dict(
        seeds=seeds, engines=4, bloom_partitions=4,
        bloom_expected_per_partition=64, bloom_fold_every=2,
        bloom_probe_mode=probe_mode,
    )
    job = CrawlJob(**kw)

    full = run_crawl(spark, job, corpus, io=SnapshotTableIO(str(tmp_path / "full")))
    part_io = SnapshotTableIO(str(tmp_path / "part"))
    run_crawl(spark, CrawlJob(**kw, max_iterations=2), corpus, io=part_io)
    resumed = run_crawl(spark, job, corpus, io=part_io, resume=True)

    assert sorted((r.url, r.data) for r in full.results.collect()) == sorted(
        (r.url, r.data) for r in resumed.results.collect()
    )
    assert sorted(r.ukey for r in full.seen.collect()) == sorted(
        r.ukey for r in resumed.seen.collect()
    )
    assert vars(full.stats) == vars(resumed.stats)


def test_crawl_delay_budget_enforced_per_wave(spark):
    """north_star politeness: a host whose robots.txt sets Crawl-delay gets
    at most floor(wave_seconds/delay) dispatches per wave — observable in
    the metrics table lineage — while the crawl still completes."""
    from doonop_spark.sources.corpus import synthetic_robots

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=40, hot_share=0.5)
    # host0: 1 req / 10 s ⇒ budget = floor(30/10) = 3 per wave; host1: free
    robots = synthetic_robots(spark, n_hosts=2, crawl_delay={0: 10.0})
    job = CrawlJob(
        seeds=["http://h0000.example/p0", "http://h0001.example/p0"],
        engines=None,
        per_host_budget=1000,
        use_robots=True,
        wave_seconds=30.0,
    )
    res = run_crawl(spark, job, corpus, robots=robots)
    assert res.stats.count_visited == 40  # budget throttles, never starves
    per_wave = {
        (r.iteration, r.host): r.n
        for r in res.metrics.groupBy("iteration", "host")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    hot = [n for (it, h), n in per_wave.items() if h == "h0000.example"]
    free = [n for (it, h), n in per_wave.items() if h == "h0001.example"]
    assert max(hot) <= 3  # Crawl-delay budget respected every wave
    assert max(free) > 3  # the unconstrained host is NOT throttled
    assert len(hot) >= 6  # the throttled host needed many more waves


def test_politeness_impl_pandas_crawl_identical(spark):
    """north_star: budgets 'enforced as grouped priority queues via
    applyInPandas' — the pandas scheduler produces the same crawl as the
    default window implementation under a binding Crawl-delay budget."""
    from doonop_spark.sources.corpus import synthetic_robots

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=20, hot_share=0.5)
    robots = synthetic_robots(spark, n_hosts=2, crawl_delay={0: 10.0})
    kw = dict(
        seeds=["http://h0000.example/p0", "http://h0001.example/p0"],
        engines=None,
        per_host_budget=1000,
        use_robots=True,
        wave_seconds=30.0,
    )
    w = run_crawl(spark, CrawlJob(**kw, politeness_impl="window"), corpus, robots=robots)
    p = run_crawl(spark, CrawlJob(**kw, politeness_impl="pandas"), corpus, robots=robots)
    w2 = run_crawl(
        spark, CrawlJob(**kw, politeness_impl="window2"), corpus, robots=robots
    )
    assert sorted((r.url, r.data) for r in w.results.collect()) == sorted(
        (r.url, r.data) for r in p.results.collect()
    )
    assert vars(w.stats) == vars(p.stats)
    assert w.iterations == p.iterations
    # the skew-proof two-phase scheduler crawls identically too
    assert sorted((r.url, r.data) for r in w.results.collect()) == sorted(
        (r.url, r.data) for r in w2.results.collect()
    )
    assert vars(w.stats) == vars(w2.stats)
    assert w.iterations == w2.iterations
    # 'auto' at threshold 0: every wave resolves to window2 (the observed
    # frontier count is always > 0 here) — still identical
    a = run_crawl(
        spark,
        CrawlJob(**kw, politeness_impl="auto", politeness_auto_threshold=0),
        corpus,
        robots=robots,
    )
    assert sorted((r.url, r.data) for r in w.results.collect()) == sorted(
        (r.url, r.data) for r in a.results.collect()
    )
    assert vars(w.stats) == vars(a.stats)
    assert w.iterations == a.iterations


def test_opaque_url_enters_seen_never_collected(spark):
    """Frontier policy for opaque non-special URLs (``mailto:``, ``a:``):
    ``url::Url::parse`` accepts them, so in the reference they ENTER the
    frontier/seen set — but they have no host and can never resolve in the
    page corpus, so they surface as a terminal fetch error (E3) and never a
    result row. Pinned e2e after the round-2 property-test dispute."""
    corpus = mock_corpus(
        spark, {"http://a.com/": ["mailto:x@y.z", "http://b.com"], "http://b.com/": []}
    )
    res = run_crawl(spark, CrawlJob(seeds=["http://a.com"], engines=2), corpus)
    assert sorted(r.ukey for r in res.seen.collect()) == [
        "http://a.com/",
        "http://b.com/",
        "mailto:x@y.z",
    ]
    assert sorted(r.url for r in res.results.collect()) == [
        "http://a.com/",
        "http://b.com/",
    ]
    assert res.stats.count_visited == 3  # the opaque URL was dispatched once
    assert res.stats.count_errors == 1  # ...and failed terminally
    assert res.frontier.count() == 0  # ...and is never retried


def test_metrics_lineage(spark):
    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=20)
    res = run_crawl(
        spark,
        CrawlJob(seeds=["http://h0000.example/p0"], engines=8),
        corpus,
    )
    m = res.metrics
    assert set(m.columns) == {"iteration", "partition_id", "host", "status", "n"}
    total = m.agg(F.sum("n")).collect()[0][0]
    assert total == res.stats.count_visited
    assert m.filter(F.col("partition_id").isNull()).count() == 0


def test_broadcast_wave_crawl_identical(spark):
    """broadcast_wave_max: small waves broadcast INTO the corpus join
    (hits + reconstructed misses as two materializes). Results AND stats
    must equal the plain path — stats now ride per-branch Observations
    summed across the hit/miss frames, so a missing-page error in a
    broadcast wave must still count."""
    corpus = mock_corpus(
        spark,
        {
            "http://a.com/": ["http://gone.com/404", "http://b.com"],
            "http://b.com/": ["http://c.com"],
            "http://c.com/": [],
        },
    )
    base = run_crawl(spark, CrawlJob(seeds=["http://a.com"], engines=2), corpus)
    bcast = run_crawl(
        spark,
        CrawlJob(seeds=["http://a.com"], engines=2, broadcast_wave_max=1_000),
        corpus,
    )
    assert sorted((r.url, r.data) for r in base.results.collect()) == sorted(
        (r.url, r.data) for r in bcast.results.collect()
    )
    assert vars(base.stats) == vars(bcast.stats)
    assert bcast.stats.count_errors == 1  # the miss was counted via observe
