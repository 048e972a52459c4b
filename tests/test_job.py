"""CrawlJob config parsers — goldens ported from the reference
(``src/cfg.rs:352-397`` proxy, ``:228-239`` retry policy, ``:216-226``
browser, ``:162-183`` check-file sniffing)."""

from __future__ import annotations

import pytest

from doonop_spark.plans.job import (
    CrawlJob,
    RetryPolicy,
    job_from_argv,
    open_code_file,
    parse_browser,
    parse_proxy,
    parse_retry_policy,
)


def test_parse_proxy_reference_goldens():
    # src/cfg.rs:352-397, verbatim cases
    assert parse_proxy("auto-detect") == {"kind": "auto-detect"}
    assert parse_proxy("direct") == {"kind": "direct"}
    assert parse_proxy("system") == {"kind": "system"}
    assert parse_proxy("auto-config;address=https://example.net") == {
        "kind": "auto-config",
        "address": "https://example.net",
    }
    assert parse_proxy("auto-config;address=https://example.net;") == {
        "kind": "auto-config",
        "address": "https://example.net",
    }
    assert parse_proxy("http;address=https://example.net") == {
        "kind": "http",
        "address": "https://example.net",
    }
    assert parse_proxy("sock;address=https://example.net;version=5") == {
        "kind": "sock",
        "address": "https://example.net",
        "version": 5,
        "username": None,
        "password": None,
    }
    assert parse_proxy(
        "sock;address=https://example.net;version=5;password=123;username=qwe"
    ) == {
        "kind": "sock",
        "address": "https://example.net",
        "version": 5,
        "username": "qwe",
        "password": "123",
    }
    assert parse_proxy("sock;address=https://example.net") is None  # no version
    assert parse_proxy("http;") is None
    assert parse_proxy("http") is None


def test_parse_retry_policy():
    for s in ("no", "No", "off", "Off"):
        assert parse_retry_policy(s) == RetryPolicy.NO
    for s in ("first", "First"):
        assert parse_retry_policy(s) == RetryPolicy.FIRST
    for s in ("last", "Last"):
        assert parse_retry_policy(s) == RetryPolicy.LAST
    with pytest.raises(ValueError):
        parse_retry_policy("FIRST")


def test_parse_browser():
    assert parse_browser("geckodriver") == "firefox"
    assert parse_browser("chromedriver") == "chrome"
    with pytest.raises(ValueError):
        parse_browser("safari")


def test_open_code_file_sniffing(tmp_path):
    js = tmp_path / "check.js"
    js.write_text("return 1;")
    side = tmp_path / "prog.side"
    side.write_text("{}")
    noext = tmp_path / "prog"
    noext.write_text("x")
    assert open_code_file(None) == ("return window.location.href", "js")
    assert open_code_file(str(js)) == ("return 1;", "js")
    assert open_code_file(str(side)) == ("{}", "side")
    # explicit format beats extension (src/cfg.rs:170-175)
    assert open_code_file(str(js), "side")[1] == "side"
    assert open_code_file(str(noext), "js")[1] == "js"
    with pytest.raises(ValueError):
        open_code_file(str(noext))


def test_job_from_argv_full():
    job = job_from_argv(
        [
            "http://a.com",
            "http://b.com",
            "-j", "4",
            "--limit", "10",
            "-i", r"\.jpg$",
            "-f", "domain=a.com",
            "-f", "domain=b.com",
            "--retry-policy", "first",
            "--retry-count", "5",
            "--use-robots-txt",
            "--proxy", "direct",
        ]
    )
    assert job.engines == 4 and job.limit == 10
    assert job.retry_policy == RetryPolicy.FIRST and job.retry_count == 5
    assert job.use_robots and job.proxy == {"kind": "direct"}
    # squash: one RegexFilter + ONE union DomainFilter
    from doonop_spark.operators.filters import DomainFilter, RegexFilter

    assert [type(f) for f in job.filters] == [RegexFilter, DomainFilter]
    assert job.filters[1].domains == ("a.com", "b.com")
    assert job.check == "url"  # default program ≡ identity on url


def test_job_from_argv_bad_filter():
    with pytest.raises(ValueError):
        job_from_argv(["http://a.com", "-f", "bogus"])
    with pytest.raises(ValueError):
        job_from_argv(["http://a.com", "--proxy", "sock;address=x"])


def test_job_from_argv_reference_spellings():
    """A command line copied verbatim from the reference's clap schema
    (src/cfg.rs:25-98) parses identically: underscore flags
    (--retry_threshold, --use_robots_txt, --robot), its short options, and
    the --webdriver-url no-op."""
    job = job_from_argv(
        [
            "http://a.com",
            "-j", "2",
            "-l", "7",
            "-b", "chrome",
            "-p", "5000",
            "-w", "http://localhost:9999",
            "--retry_threshold", "60000",
            "--retry-count", "2",
            "--use_robots_txt",
            "--robot", "MyBot",
        ]
    )
    assert job.engines == 2 and job.limit == 7
    assert job.browser == "chrome" and job.page_load_timeout_ms == 5000
    assert job.use_robots and job.robot == "MyBot"
    assert job.retry_count == 2
    # 60000 ms / 1000 / wave_seconds(30) = 2 logical waves
    assert job.retry_threshold == pytest.approx(2.0)


def test_job_from_argv_defaults_match_reference():
    """Default config parity (src/cfg.rs): retry_policy=first,
    retry_threshold=10000ms, retry_count=3, browser=firefox, robots off."""
    job = job_from_argv(["http://a.com"])
    assert job.retry_policy == RetryPolicy.FIRST
    assert job.retry_count == 3
    assert job.retry_threshold == pytest.approx(10.0 / 30.0)
    assert job.browser == "firefox"
    assert not job.use_robots
    assert job.robot == "DoonopRobot"
