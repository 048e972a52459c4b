"""Retry-pool goldens ported to the wave scheduler (reference
``src/retry.rs:62-128`` tests: get, get_with_fire, get_count_retries,
get_force), expressed against select_wave's ordering/ripeness semantics
and the loop's budget accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from doonop_spark.operators.schedule import select_wave
from doonop_spark.plans.job import CrawlJob, RetryPolicy
from doonop_spark.plans.loop import run_crawl


def frontier_of(spark, rows):
    """rows: (url, seq, is_retry, retry_count, retry_at)"""
    df = spark.createDataFrame(
        [(u, u, s, r, c, a) for u, s, r, c, a in rows],
        "url string, ukey string, seq long, is_retry boolean,"
        " retry_count int, retry_at double",
    )
    return df.select(
        "url", "ukey", F.xxhash64("ukey").alias("url_hash"),
        F.lit("h.example").alias("host"), F.lit(0).alias("depth"),
        "seq", "is_retry", "retry_count", "retry_at",
    )


def picked(df):
    return [r.url for r in df.collect()]


def test_get_drains_in_order(spark):
    # retry.rs get(): three retries, drained ripest-first
    f = frontier_of(
        spark,
        [("u1", 1, True, 1, 0.0), ("u2", 2, True, 1, 1.0), ("u3", 3, True, 1, 2.0)],
    )
    # one wave of 3: drained ripest-first (retry_at asc)
    wave = select_wave(f, RetryPolicy.FIRST, 3, now=5.0, fresh_empty=True)
    assert picked(wave.orderBy("retry_at")) == ["u1", "u2", "u3"]


def test_get_with_fire_time_gates(spark):
    # retry.rs get_with_fire(): unripe retry not returned until threshold
    f = frontier_of(spark, [("u1", 1, True, 1, 10.0)])
    assert picked(select_wave(f, RetryPolicy.FIRST, 1, now=5.0, fresh_empty=False)) == []
    assert picked(select_wave(f, RetryPolicy.FIRST, 1, now=10.0, fresh_empty=False)) == ["u1"]


def test_get_force_overrides_time(spark):
    # retry.rs get_force(): empty fresh pool forces unripe retries out
    f = frontier_of(spark, [("u1", 1, True, 1, 99.0)])
    assert picked(select_wave(f, RetryPolicy.FIRST, 1, now=0.0, fresh_empty=True)) == ["u1"]


def test_retry_first_vs_last_priority(spark):
    f = frontier_of(
        spark,
        [("fresh", 10, False, 0, 0.0), ("retry", 1, True, 1, 0.0)],
    )
    first = select_wave(f, RetryPolicy.FIRST, 1, now=1.0, fresh_empty=False)
    last = select_wave(f, RetryPolicy.LAST, 1, now=1.0, fresh_empty=False)
    assert picked(first) == ["retry"]
    assert picked(last) == ["fresh"]
    # policy NO never schedules retries at all
    no = select_wave(f, RetryPolicy.NO, 2, now=99.0, fresh_empty=True)
    assert picked(no) == ["fresh"]


def test_get_count_retries_budget_exhaustion(spark):
    """retry.rs get_count_retries(): count >= budget ⇒ keep_retry False ⇒
    terminal (never dispatched again), via the full loop."""
    from tests.test_crawl_e2e import mock_corpus

    corpus = mock_corpus(spark, {"http://a.com/": []}, data={"http://a.com/": "a"})
    faults = spark.createDataFrame(
        [("http://a.com/", i, "timeout") for i in range(1, 10)],
        "url string, attempt int, fault string",
    )
    job = CrawlJob(
        seeds=["http://a.com"], engines=1,
        retry_policy=RetryPolicy.FIRST, retry_count=3,
    )
    res = run_crawl(spark, job, corpus, fault_schedule=faults)
    # attempts: 1 (timeout, count->1), 2 (timeout, count->2), 3 (timeout,
    # count->3 >= budget ⇒ terminal). visited counts every attempt.
    assert res.stats.count_visited == 3
    assert res.stats.count_retries == 3
    assert res.stats.count_collected == 0
    assert res.frontier.count() == 0


def _chain_corpus_with_slow_z(spark, chain_len=8):
    """z.com times out once; b.com hosts a fresh chain that keeps the
    frontier non-empty for chain_len waves (no forced drain)."""
    from tests.test_crawl_e2e import mock_corpus

    pages = {"http://z.com/": []}
    for i in range(chain_len):
        nxt = [f"http://b.com/{i + 1}"] if i + 1 < chain_len else []
        pages[f"http://b.com/{i}"] = nxt
    return mock_corpus(spark, pages)


def _retry_success_wave(spark, corpus, job, clock=None):
    faults = spark.createDataFrame(
        [("http://z.com/", 1, "timeout")], "url string, attempt int, fault string"
    )
    res = run_crawl(spark, job, corpus, fault_schedule=faults, clock=clock)
    assert res.stats.count_retries == 1
    row = [
        r for r in res.results.collect() if r.url == "http://z.com/"
    ]
    assert len(row) == 1  # the retry eventually succeeded exactly once
    return row[0].iteration, res


def test_wall_clock_ripeness_parity(spark):
    """O3 parity mode (src/retry.rs:38-46): with deliberately SLOW waves
    (10 s per clock tick) a 15-second threshold ripens the retry within a
    couple of waves, while the wave-unit mode with an equivalent
    15-"wave" threshold only drains it when the fresh frontier empties —
    i.e. wall-clock ripening happens EARLIER in wave count, which is
    exactly the semantics the logical-wave mode cannot express."""
    import itertools

    corpus = _chain_corpus_with_slow_z(spark)

    # wave clock: threshold 15 waves; chain keeps frontier fresh for 8
    # waves, so the retry only ripens via forced drain after the chain
    job_wave = CrawlJob(
        seeds=["http://z.com/", "http://b.com/0"], engines=1,
        retry_policy=RetryPolicy.FIRST, retry_count=3, retry_threshold=15.0,
    )
    wave_iter, res_wave = _retry_success_wave(spark, corpus, job_wave)

    # wall clock, same 15 but in SECONDS, waves take ~10 s each (fake
    # deterministic clock: +10 s per reading)
    ticker = itertools.count(start=0, step=10)
    job_wall = CrawlJob(
        seeds=["http://z.com/", "http://b.com/0"], engines=1,
        retry_policy=RetryPolicy.FIRST, retry_count=3, retry_threshold=15.0,
        retry_clock="wall",
    )
    wall_iter, res_wall = _retry_success_wave(
        spark, corpus, job_wall, clock=lambda: float(next(ticker))
    )

    assert wall_iter < wave_iter, (wall_iter, wave_iter)
    # both modes end with identical coverage — only the schedule differs
    assert sorted(r.url for r in res_wave.results.collect()) == sorted(
        r.url for r in res_wall.results.collect()
    )


def test_wall_clock_unripe_waits_real_time(spark):
    """Wall mode with a huge threshold and a frozen clock: the retry can
    only come back via forced drain (fresh frontier empty) — time alone
    never ripens it, matching get_with_fire."""
    corpus = _chain_corpus_with_slow_z(spark, chain_len=3)
    job = CrawlJob(
        seeds=["http://z.com/", "http://b.com/0"], engines=1,
        retry_policy=RetryPolicy.FIRST, retry_count=3,
        retry_threshold=1e9, retry_clock="wall",
    )
    it, res = _retry_success_wave(spark, corpus, job, clock=lambda: 0.0)
    # chain of 3 drains first (waves 1..3), then the forced drain
    assert it >= 3
