"""Property-based hostile-input tests (hypothesis) for the pure kernels.

The reference crashes on nothing a page can contain — its extractor skips
malformed anchors and its URL layer drops unparseable hrefs silently
(``src/engine.rs:51-68``, ``src/backend.rs:97-106``). These properties pin
the same total-function behavior for our kernels over arbitrary bytes and
strings: never raise, and the algebraic invariants (canonicalization
idempotence, absolutize producing canonical-absolute-or-None) hold for all
inputs, not just the golden cases.
"""

from __future__ import annotations

import json
import re

from hypothesis import given, settings
from hypothesis import strategies as st

# Deterministic battery: the suite is a correctness gate, so Hypothesis must
# draw the same examples every run (no flaky reds from a fresh random draw).
# Counterexamples found ad hoc are promoted to regression tests instead.
settings.register_profile("gate", derandomize=True)
settings.load_profile("gate")

# RFC 3986 scheme, lowercased by canonicalize()
_SCHEME_PREFIX = re.compile(r"^[a-z][a-z0-9+.\-]*:")
# WHATWG special schemes render an authority — only these must carry "://"
_SPECIAL_PREFIX = re.compile(r"^(http|https|ws|wss|ftp|file):")

from doonop_spark.functions.canonical import (
    absolutize,
    canonicalize,
    host_of,
    surt_key,
)
from doonop_spark.functions.extract import extract_links_py, extract_text_py
from doonop_spark.functions.side import parse_side_program, run_side_program
from doonop_spark.functions.text import lang_id_py, winnow_fingerprint_py

# printable-ish URL soup plus separators and schemes that often break parsers
_url_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_extractors_total_on_bytes(blob):
    """Arbitrary bytes (including invalid UTF-8): extract never raises,
    links is a list of strings, text is a string."""
    links = extract_links_py(blob)
    text = extract_text_py(blob)
    assert links is None or all(isinstance(x, str) for x in links)
    assert text is None or isinstance(text, str)


@settings(max_examples=300, deadline=None)
@given(_url_text)
def test_canonicalize_total_and_idempotent(s):
    c = canonicalize(s)
    if c is not None:
        assert canonicalize(c) == c  # idempotence: the seen-set key is stable
        assert host_of(c) is None or host_of(c) == host_of(canonicalize(c))


@settings(max_examples=300, deadline=None)
@given(_url_text, _url_text)
def test_absolutize_total_and_canonical(base, href):
    """absolutize never raises; its output is absolute AND already in
    canonical form (it defines frontier membership).

    Absolute means "carries a scheme", NOT "contains ://": the reference's
    ``url::Url::parse("a:")`` succeeds as an opaque non-special URL and such
    URLs enter the frontier (``src/engine.rs:59-68``). Only WHATWG special
    schemes are guaranteed an authority."""
    out = absolutize(base, href)
    if out is not None:
        assert _SCHEME_PREFIX.match(out), out
        if _SPECIAL_PREFIX.match(out):
            assert "://" in out
        assert canonicalize(out) == out


@settings(max_examples=200, deadline=None)
@given(_url_text)
def test_surt_key_total_and_deterministic(s):
    a, b = surt_key(s), surt_key(s)
    assert a == b
    assert a is None or isinstance(a, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_text_kernels_total(s):
    assert isinstance(lang_id_py(s), str)
    fp = winnow_fingerprint_py(s)
    assert all(isinstance(x, int) for x in fp)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=1000))
def test_side_runner_total_on_any_page(page):
    """The golden Side program runs against any page text without raising
    and always stores its literal RESULT."""
    cmds = parse_side_program(
        json.dumps(
            {
                "tests": [
                    {
                        "id": "t",
                        "commands": [
                            {"command": "storeTitle", "target": "", "value": "ttl"},
                            {"command": "storeText", "target": "css=main", "value": "txt"},
                            {"command": "store", "target": "THE RESULT", "value": "RESULT"},
                        ],
                    }
                ]
            }
        )
    )
    assert run_side_program(cmds, "http://x/", page) == "THE RESULT"
