"""Text-analysis functions for large-scale training-data pipelines over a
crawled corpus: language-ID, quality scoring, token counting, document
fingerprinting, shingling.

These extend the reference crawler (which stops at link/text extraction,
``src/backend.rs:89-123``) with the post-crawl operators a 100 TB
web-text pipeline needs. Design rule: everything countable stays in JVM
whole-stage codegen (``F.*`` expressions over the ``documents`` table);
Python appears only in Arrow-batched UDFs for the genuinely
non-expressible kernels (language-ID scoring, winnowing fingerprints),
vectorized with numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "token_count_expr",
    "bpe_token_count_expr",
    "word_shingles_expr",
    "quality_features",
    "quality_score_expr",
    "repetition_stats",
    "PII_PATTERNS",
    "pii_counts",
    "scrub_pii_expr",
    "lang_id_udf",
    "winnow_fingerprint_udf",
    "content_hash_expr",
    "nfc_normalize_udf",
    "normalize_text_expr",
]

_WS = r"\s+"


def token_count_expr(text: Column) -> Column:
    """Whitespace token count, JVM-side. Empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, _WS))
    )


# BPE-style pre-tokenizer classes (the GPT-2 pattern's portable ASCII
# core): letter runs, digit runs, and single non-alnum-non-space marks.
# Counting these approximates subword-token budgets far better than
# whitespace splitting on code/punctuation-heavy web text, and the pattern
# uses only character classes both Spark (Java regex) and DuckDB (RE2)
# interpret identically — so it is exactly oracle-checkable.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_expr(text: Column) -> Column:
    """BPE-ish token count, JVM-side: number of BPE_TOKEN_PATTERN matches
    (letter runs + digit runs + individual punctuation marks)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def word_shingles_expr(text: Column, k: int = 5) -> Column:
    """Word k-gram shingles (array<string>), JVM-side: the input to MinHash
    / Jaccard dedup. A document with fewer than k words yields a single
    shingle of all its words (so short docs still dedup exactly)."""
    words = F.split(F.trim(text), _WS)
    n = F.size(words)
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.when(
            n <= k, F.array(F.array_join(words, " "))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.array_join(F.slice(words, i, k), " "),
            )
        )
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic quality features (Gopher/C4-style), all JVM expressions:
    lengths, punctuation density, stopword hits, alpha ratio, mean word
    length. Integers/exact where possible so a SQL oracle can reproduce
    them bit-for-bit."""
    n_chars = F.length(text)
    n_words = token_count_expr(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.lower(F.trim(text)), _WS),
            lambda w: w.isin("the", "and", "of", "to", "a", "in", "is", "that"),
        )
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "n_alpha": n_alpha,
        "n_digit": n_digit,
        "n_stop": F.when(F.trim(text) == "", F.lit(0)).otherwise(n_stop),
    }


def repetition_stats(text: Column) -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1), all JVM
    expressions returning INTEGER numerators/denominators — fractions are
    left to the caller so a SQL oracle reproduces the values bit-for-bit:

    - ``n_lines`` / ``n_distinct_lines``: duplicate-line repetition
      (lines = '\\n' splits with surrounding whitespace trimmed; blank
      lines dropped);
    - ``n_2grams`` / ``top_2gram_n``: fraction of the text covered by the
      most frequent word 2-gram (whitespace words, case-sensitive).

    The per-row top-2-gram count is sort + longest-equal-run fold —
    O(n log n) per row, no shuffle; the scale cost is identical to any
    other per-row projection (the first all-pairs formulation measured
    60 ms/doc — higher-order filters inside transform don't codegen)."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    words = F.split(F.trim(text), _WS)
    n_words = token_count_expr(text)
    grams = F.when(n_words < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_words - 1),
            lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
        )
    )

    def _run_step(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc.best, run).alias("best")
        )

    top = F.when(F.size(grams) == 0, F.lit(0)).otherwise(
        F.aggregate(
            F.array_sort(grams),
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            _run_step,
            lambda acc: acc.best,
        )
    )
    return {
        "n_lines": F.size(lines),
        "n_distinct_lines": F.size(F.array_distinct(lines)),
        "n_2grams": F.size(grams),
        "top_2gram_n": top,
    }


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) interpret identically — character classes, +/{m,}, \d, \b; no
# lookaround — so scrubbing is exactly oracle-checkable.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Match count per PII class (JVM ``regexp_count``)."""
    return {
        name: F.regexp_count(text, F.lit(pat))
        for name, (pat, _) in PII_PATTERNS.items()
    }


def scrub_pii_expr(text: Column) -> Column:
    """Replace every PII match with its class token — chained JVM
    ``regexp_replace``, applied in ``PII_PATTERNS`` order (emails first so
    their host parts are never half-eaten by the IP pattern)."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def quality_score_expr(text: Column) -> Column:
    """Boolean keep/drop verdict from integer comparisons only (oracle-
    reproducible): 10..100000 chars, ≥3 words, mean word length 1..20,
    digits under a third of letters, some punctuation or stopwords."""
    q = quality_features(text)
    mean_wl_ok = (q["n_alpha"] <= q["n_words"] * 20) & (q["n_alpha"] >= q["n_words"])
    return (
        (q["n_chars"] >= 10)
        & (q["n_chars"] <= 100_000)
        & (q["n_words"] >= 3)
        & mean_wl_ok
        & (q["n_digit"] * 3 <= q["n_alpha"])
        & ((q["n_punct"] > 0) | (q["n_stop"] > 0))
    )


# --- language ID (heuristic n-gram/stopword scorer; Arrow-batched) ---------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"),
    "es": ("el", "la", "los", "y", "es", "que", "una", "por", "con", "para"),
    "it": ("il", "la", "che", "e", "di", "un", "per", "sono", "una", "del"),
}


def lang_id_py(text: str | None) -> str | None:
    """Stopword-vote language ID; 'und' (undetermined) when nothing hits."""
    if text is None:
        return None
    words = text.lower().split()
    if not words:
        return "und"
    best, best_n = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        m = set(markers)
        n = sum(1 for w in words if w in m)
        if n > best_n:
            best, best_n = lang, n
    return best


@F.pandas_udf(T.StringType())
def lang_id_udf(text: pd.Series) -> pd.Series:
    return pd.Series([lang_id_py(t) for t in text], dtype="object")


# --- document fingerprinting (winnowing over a rolling hash) ----------------

def _rolling_hashes(s: str, k: int) -> np.ndarray:
    """Karp-Rabin rolling hash of every k-gram of ``s`` (uint64)."""
    if len(s) < k:
        s = s.ljust(k)
    b = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    base = 1000003
    powers = np.array(
        [pow(base, k - 1 - i, 1 << 64) for i in range(k)], dtype=np.uint64
    )
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
        return (windows * powers).sum(axis=1)


def winnow_fingerprint_py(text: str | None, k: int = 8, window: int = 4) -> list[int] | None:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): min rolling hash
    per window of k-gram hashes → a compact, position-robust fingerprint
    set. Deterministic; sorted unique values returned."""
    if text is None:
        return None
    if not text:
        return []
    h = _rolling_hashes(text, k)
    if len(h) <= window:
        sel = np.array([h.min()], dtype=np.uint64)
    else:
        w = np.lib.stride_tricks.sliding_window_view(h, window)
        sel = w.min(axis=1)
    out = np.unique(sel).astype(np.int64)  # two's-complement into BIGINT
    return out.tolist()


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprint_udf(text: pd.Series) -> pd.Series:
    return pd.Series([winnow_fingerprint_py(t) for t in text], dtype="object")


def content_hash_expr(text: Column) -> Column:
    """Exact-dup key: xxhash64 of the raw text (JVM)."""
    return F.xxhash64(text)


# ASCII control characters a training corpus never wants (C0 minus
# \t\n\r, plus DEL). \x0B/\x0C are stripped here so the whitespace
# collapse below never depends on whether a regex engine's \s includes
# vertical tab (Java's does, RE2's does not — keeping them out of \s is
# what makes the pipeline exactly oracle-checkable).
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


@F.pandas_udf(T.StringType())
def nfc_normalize_udf(text: pd.Series) -> pd.Series:
    """Unicode NFC composition, Arrow-batched (no JVM builtin exists).
    NULL in → NULL out, so callers can gate the UDF's INPUT on an
    ASCII-ness test and pass-through rows cost nothing here."""
    import unicodedata

    return text.map(
        lambda s: unicodedata.normalize("NFC", s) if s is not None else None
    )


def normalize_text_expr(text: Column) -> Column:
    """Training-data text normalization: strip ASCII control characters,
    compose to Unicode NFC, collapse whitespace runs to single spaces,
    trim. Everything but NFC is JVM whole-stage codegen; NFC is identity
    on ASCII, so the Arrow round-trip is gated on a JVM ``rlike`` and the
    (typically ~95% on web text) pure-ASCII rows never enter the UDF
    input — the same input-gating shape as
    ``functions.encoding.transcode_corpus``."""
    stripped = F.regexp_replace(text, CONTROL_CLASS, "")
    needs_nfc = stripped.rlike(r"[^\x00-\x7F]")
    # a When AROUND a pandas UDF still evaluates it over the whole batch;
    # the skip must happen in the UDF's input (NULL for pass-through rows)
    composed = F.when(needs_nfc, nfc_normalize_udf(F.when(needs_nfc, stripped))).otherwise(
        stripped
    )
    return F.trim(F.regexp_replace(composed, r"\s+", " "))
