"""Composite document-quality filter chain — the published C4 and
Gopher rule sets over the ``documents`` table (training-data suite;
extends SURVEY.md §2's text-analysis operators with the two rule
families production web-text pipelines actually run).

Sources (public papers):

- **C4** (Raffel et al., "Exploring the Limits of Transfer Learning
  with a Unified Text-to-Text Transformer", JMLR 2020, §2.2) —
  line-level cleaning: keep only lines that end in a terminal
  punctuation mark and contain ≥ 3 words, drop lines containing the
  word "javascript"; document-level: drop pages containing "lorem
  ipsum" or a curly brace, require ≥ 5 sentences.
- **Gopher** (Rae et al., "Scaling Language Models: Methods, Analysis
  & Insights from Training Gopher", 2021, §A.1.1) — document-level
  quality heuristics: 50..100k words, mean word length 3..10,
  symbol-to-word ratio (``#`` and ellipsis) < 0.1, < 90% of lines
  bullet-started, < 30% of lines ellipsis-ended, ≥ 80% of words with
  an alphabetic character, ≥ 2 distinct Gopher stop words.

Everything is built-in ``pyspark.sql.functions`` over arrays — JVM-side
higher-order functions, no Python anywhere, so the chain whole-stage
codegens and runs at scan speed. Every ratio threshold is evaluated in
INTEGER arithmetic (``10 * n_ellipsis_lines < 3 * n_lines`` instead of
``n_ellipsis_lines / n_lines < 0.3``) so the flags are exactly
reproducible in any SQL engine — the driver oracle replays them
bit-for-bit in DuckDB.

At 100 TB: a pure per-row projection — no shuffle, no state; filters
compose with the scan and AQE coalesces the survivors. The chain is the
map stage of a cleaning pipeline; pair with the dedup operators for the
reduce stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "c4_clean_lines_expr",
    "c4_flags",
    "gopher_flags",
    "quality_filter_chain",
]

# Gopher's stop-word set (Rae et al. 2021, §A.1.1): a document must
# contain at least 2 distinct of these to pass.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_TERMINAL_RE = r'[.!?"]$'
_BULLET_RE = r"^\s*[-*•]"
_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def _words(text: Column) -> Column:
    # strip ALL leading/trailing whitespace (F.trim is spaces-only, so a
    # "\n\n" document would otherwise split into two phantom words)
    t = F.regexp_replace(text, r"^\s+|\s+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def c4_clean_lines_expr(text: Column) -> Column:
    """C4 line-level cleaning → the retained lines re-joined with
    ``\\n``: a line survives iff it ends in terminal punctuation
    (``. ! ? "``), has ≥ 3 whitespace words, and does not contain the
    word "javascript" (case-insensitive)."""
    kept = F.filter(
        _lines(text),
        lambda ln: F.trim(ln).rlike(_TERMINAL_RE)
        & (F.size(F.split(F.trim(ln), r"\s+")) >= 3)
        & ~F.lower(ln).contains("javascript"),
    )
    return F.array_join(F.transform(kept, F.trim), "\n")


def c4_flags(text: Column) -> dict[str, Column]:
    """C4 document-level fields over the RAW text: the page-kill
    predicates plus the line-cleaning summary. ``c4_n_sentences``
    approximates sentences as terminal-punctuation runs in the cleaned
    text (C4 requires ≥ 5)."""
    clean = c4_clean_lines_expr(text)
    n_sentences = F.size(
        F.filter(
            F.split(clean, r"[.!?]"),
            lambda s: F.trim(s) != "",
        )
    )
    low = F.lower(text)
    return {
        "c4_clean_text": clean,
        "c4_n_kept_lines": F.when(clean == "", F.lit(0)).otherwise(
            F.size(F.split(clean, "\n"))
        ),
        "c4_n_sentences": n_sentences,
        "c4_has_lorem_ipsum": low.contains("lorem ipsum"),
        "c4_has_brace": text.contains("{"),
        "c4_keep": (~low.contains("lorem ipsum"))
        & (~text.contains("{"))
        & (n_sentences >= 5),
    }


def gopher_flags(text: Column) -> dict[str, Column]:
    """Gopher document-quality flags (integer-arithmetic thresholds, so
    every flag is exactly SQL-replayable)."""
    words = _words(text)
    n_words = F.size(words)
    lines = _lines(text)
    n_lines = F.size(lines)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_bullet = F.size(F.filter(lines, lambda ln: ln.rlike(_BULLET_RE)))
    n_ellipsis_lines = F.size(F.filter(lines, lambda ln: ln.rlike(_ELLIPSIS_RE)))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    # non-overlapping "..." occurrences + one-char ellipsis characters
    n_ellipsis_sym = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3) + (
        F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit("")))
    )
    n_symbols = (n_hash + n_ellipsis_sym).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "g_n_words": n_words,
        "g_word_count_ok": (n_words >= 50) & (n_words <= 100_000),
        # mean word length in [3, 10]  ⇔  3·n ≤ chars ≤ 10·n
        "g_mean_word_len_ok": (n_words > 0)
        & (total_chars >= 3 * n_words)
        & (total_chars <= 10 * n_words),
        # symbol-to-word ratio < 0.1  ⇔  10·symbols < words
        "g_symbol_ratio_ok": (n_words > 0) & (10 * n_symbols < n_words),
        # < 90% of lines bullet-started  ⇔  10·bullets < 9·lines
        "g_bullet_ok": 10 * n_bullet < 9 * n_lines,
        # < 30% of lines ellipsis-ended  ⇔  10·ell < 3·lines
        "g_ellipsis_ok": 10 * n_ellipsis_lines < 3 * n_lines,
        # ≥ 80% of words contain an alphabetic char  ⇔  5·alpha ≥ 4·words
        "g_alpha_ok": (n_words > 0) & (5 * n_alpha_words >= 4 * n_words),
        "g_stopword_ok": n_stop >= 2,
    }
    flags["g_keep"] = (
        flags["g_word_count_ok"]
        & flags["g_mean_word_len_ok"]
        & flags["g_symbol_ratio_ok"]
        & flags["g_bullet_ok"]
        & flags["g_ellipsis_ok"]
        & flags["g_alpha_ok"]
        & flags["g_stopword_ok"]
    )
    return flags


def quality_filter_chain(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The full published-rule cleaning chain as one projection: C4
    line-level cleaning + page predicates, then the Gopher quality
    flags over the raw text, and the combined ``keep`` verdict. Adds
    columns; never drops rows — callers ``filter(F.col('keep'))`` for
    the cleaned corpus, or aggregate the flags for corpus diagnostics."""
    t = F.col(text_col)
    cols = {**c4_flags(t), **gopher_flags(t)}
    out = df
    for name, expr in cols.items():
        out = out.withColumn(name, expr)
    return out.withColumn("keep", F.col("c4_keep") & F.col("g_keep"))
