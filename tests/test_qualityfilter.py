"""Unit battery for the C4 + Gopher quality-filter chain
(operators/qualityfilter.py) — every rule exercised in both directions
on hand-built documents, plus a plan assertion that the chain is a pure
shuffle-free JVM projection (no Exchange, no Python eval)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from doonop_spark.operators.qualityfilter import (
    GOPHER_STOPWORDS,
    c4_clean_lines_expr,
    quality_filter_chain,
)

# A document that passes EVERYTHING: >= 5 terminal-punctuated sentences
# on lines of >= 3 words, >= 50 words of mean length 3-10 with alpha
# chars and >= 2 stopwords, no bullets/ellipses/braces/lorem.
GOOD = "\n".join(
    ["the quick brown fox jumps over that lazy dog today."] * 6
)  # 60 words, 6 lines/sentences


def _flags(spark, text):
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    return quality_filter_chain(df, "text").collect()[0].asDict()


def test_good_doc_passes_everything(spark):
    r = _flags(spark, GOOD)
    assert r["c4_keep"] and r["g_keep"] and r["keep"]
    assert r["c4_n_kept_lines"] == 6
    assert r["c4_n_sentences"] == 6
    assert r["g_n_words"] == 60


# --- C4 line-level rules ----------------------------------------------------

def test_c4_drops_line_without_terminal_punct(spark):
    df = spark.range(1).select(
        c4_clean_lines_expr(
            F.lit("keep this line here.\nno terminal punct\nalso kept one!")
        ).alias("c")
    )
    assert df.collect()[0].c == "keep this line here.\nalso kept one!"


def test_c4_drops_short_and_javascript_lines(spark):
    df = spark.range(1).select(
        c4_clean_lines_expr(
            F.lit('two words.\nenable JavaScript to continue.\n"quoted line stays."')
        ).alias("c")
    )
    # < 3 words dropped; 'javascript' (case-insensitive) dropped; a line
    # ending in '"' is terminal.
    assert df.collect()[0].c == '"quoted line stays."'


def test_c4_page_kills(spark):
    assert not _flags(spark, GOOD + "\nlorem ipsum filler text here.")["c4_keep"]
    assert not _flags(spark, GOOD + "\nvar x = { a: 1 }.")["c4_keep"]
    # 4 sentences < 5 minimum
    four = "\n".join(["the quick brown fox jumps over that lazy dog today."] * 4)
    r = _flags(spark, four)
    assert r["c4_n_sentences"] == 4 and not r["c4_keep"]


def test_c4_sentences_counted_in_cleaned_text(spark):
    # the lorem line itself has terminal punct + >= 3 words, so it stays
    # in the CLEANED text, but the page-level flag kills the doc
    r = _flags(spark, GOOD + "\nlorem ipsum dolor sit.")
    assert r["c4_n_kept_lines"] == 7
    assert r["c4_has_lorem_ipsum"] and not r["c4_keep"]


# --- Gopher document-level rules --------------------------------------------

def test_gopher_word_count_bounds(spark):
    assert not _flags(spark, "too few words here.")["g_word_count_ok"]
    assert _flags(spark, GOOD)["g_word_count_ok"]


def test_gopher_mean_word_length(spark):
    # 60 single-char words -> mean 1 < 3
    r = _flags(spark, " ".join(["a"] * 60) + ".")
    assert not r["g_mean_word_len_ok"]
    # 60 x 12-char words -> mean > 10
    r = _flags(spark, " ".join(["abcdefghijkl"] * 60) + ".")
    assert not r["g_mean_word_len_ok"]


def test_gopher_symbol_ratio(spark):
    # 7 hashes on 60 words -> 10*7 > 60 -> fail
    r = _flags(spark, GOOD + "\n####### the end of it all.")
    assert not r["g_symbol_ratio_ok"]
    # '...' counts as ONE symbol occurrence, not 3
    r = _flags(spark, GOOD + "\nwell that trails off...")
    assert r["g_symbol_ratio_ok"]


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["* the quick brown fox jumps today."] * 10)
    assert not _flags(spark, bullets)["g_bullet_ok"]
    # 2 of 6 lines ellipsis-ended -> 10*2 > 3*6 -> fail
    ell = GOOD.replace("today.", "today...", 2)
    assert not _flags(spark, ell)["g_ellipsis_ok"]
    # unicode ellipsis counts too
    ell2 = GOOD.replace("today.", "today…", 2)
    assert not _flags(spark, ell2)["g_ellipsis_ok"]


def test_gopher_alpha_and_stopwords(spark):
    # 60 numeric words -> 0% alpha
    r = _flags(spark, " ".join(["123"] * 60) + ".")
    assert not r["g_alpha_ok"]
    # real words but zero stopwords
    nostop = " ".join(["quick brown fox jumps high"] * 12) + "."
    r = _flags(spark, nostop)
    assert r["g_alpha_ok"] and not r["g_stopword_ok"]
    assert len(GOPHER_STOPWORDS) == 8


def test_empty_and_whitespace_text(spark):
    for t in ["", "   ", "\n\n"]:
        r = _flags(spark, t)
        assert r["g_n_words"] == 0
        assert not r["g_keep"] and not r["c4_keep"] and not r["keep"]


def test_chain_adds_columns_never_drops_rows(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate([GOOD, "", "short."])]
    )
    out = quality_filter_chain(df)
    assert out.count() == 3
    assert {"keep", "c4_keep", "g_keep"} <= set(out.columns)


def test_plan_is_pure_projection(spark):
    """The chain must compose with the scan: no shuffle, no Python."""
    df = spark.createDataFrame([Row(doc_id=0, text=GOOD)])
    plan = (
        quality_filter_chain(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
