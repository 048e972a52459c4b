"""robots.txt gate semantics (reference ``src/robots.rs``,
``src/workload.rs:100-109``)."""

from __future__ import annotations

from doonop_spark.operators.robots import (
    DEFAULT_ROBOT,
    crawl_delay_of,
    is_allowed,
    robots_gate,
)

ROBOTS = """# example
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Crawl-delay: 2

User-agent: DoonopRobot
Disallow: /secret/
Crawl-delay: 0.5
"""


def test_longest_match_and_allow_tie():
    assert is_allowed(ROBOTS, "/public/x", "OtherBot")
    assert not is_allowed(ROBOTS, "/private/x", "OtherBot")
    # longest-match: Allow /private/ok.html beats Disallow /private/
    assert is_allowed(ROBOTS, "/private/ok.html", "OtherBot")


def test_specific_agent_group_wins():
    # DoonopRobot group overrides *: /private/ allowed, /secret/ not
    assert is_allowed(ROBOTS, "/private/x", DEFAULT_ROBOT)
    assert not is_allowed(ROBOTS, "/secret/x", DEFAULT_ROBOT)
    assert crawl_delay_of(ROBOTS, DEFAULT_ROBOT) == 0.5
    assert crawl_delay_of(ROBOTS, "OtherBot") == 2


def test_fetch_miss_skips():
    # host with no robots row → silently skipped (src/workload.rs:100-109)
    assert not is_allowed(None, "/anything")


def test_wildcards():
    txt = "User-agent: *\nDisallow: /*.pdf$\n"
    assert not is_allowed(txt, "/a/b/file.pdf")
    assert is_allowed(txt, "/a/b/file.pdf.html")


def test_empty_disallow_allows_all():
    txt = "User-agent: *\nDisallow:\n"
    assert is_allowed(txt, "/anything")


def test_robots_gate_spark(spark):
    frontier = spark.createDataFrame(
        [
            ("http://a.example/ok", "a.example"),
            ("http://a.example/secret/x", "a.example"),
            ("http://missing.example/x", "missing.example"),
            ("javascript:void(0)", None),  # hostless → always allowed (F7)
        ],
        "url string, host string",
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /secret/\n")],
        "host string, robots_txt string",
    )
    got = sorted(
        r.url for r in robots_gate(frontier, robots, use_robots=True).collect()
    )
    assert got == ["http://a.example/ok", "javascript:void(0)"]
    # gate off → passthrough
    assert robots_gate(frontier, robots, use_robots=False).count() == 4
