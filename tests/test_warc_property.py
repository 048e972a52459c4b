"""Property-based battery for the WARC framing/HTTP layers
(sources/warc.py): round-trips hold for ARBITRARY bodies (CRLF runs,
embedded ``WARC/`` markers, NULs, invalid UTF-8), chunked
transfer-framing decodes for any chunk split, the streaming parser is
invariant to read-chunk size, and garbage between records never costs
more than the garbage. Derandomized like the rest of the suite
(gate profile in tests/test_property.py's module docstring)."""

from __future__ import annotations

import gzip
import io

from hypothesis import given, settings
from hypothesis import strategies as st

settings.register_profile("gate", derandomize=True)
settings.load_profile("gate")

from doonop_spark.sources.warc import (
    _dechunk,
    _http_body,
    iter_warc_stream,
    parse_warc_bytes,
    write_warc,
)

# bodies that stress the framing: CRLFs, record markers, NULs, high bytes
_body = st.binary(max_size=400).flatmap(
    lambda b: st.sampled_from(
        [
            b,
            b"\r\n\r\n" + b,
            b + b"\r\nWARC/1.0\r\n",  # marker INSIDE a body must not resync
            b"WARC/" + b,
            b.replace(b"\n", b"\r\n") if b else b,
        ]
    )
)
_url = st.from_regex(r"http://[a-z]{1,10}\.example/[a-zA-Z0-9_/\-]{0,30}", fullmatch=True)
_ts = st.integers(min_value=0, max_value=10**9).map(
    lambda s: f"2024-01-01T{s % 24:02d}:{s % 60:02d}:{s % 60:02d}Z"
)
_records = st.lists(st.tuples(_url, _ts, _body), min_size=0, max_size=6)


@given(recs=_records, compress=st.booleans())
@settings(max_examples=60, deadline=None)
def test_roundtrip_arbitrary_bodies(tmp_path_factory, recs, compress):
    p = str(
        tmp_path_factory.mktemp("warcprop")
        / ("t.warc" + (".gz" if compress else ""))
    )
    write_warc(p, recs, compress=compress)
    got = list(parse_warc_bytes(open(p, "rb").read()))
    assert got == recs


@given(recs=_records, chunk=st.integers(min_value=1, max_value=97))
@settings(max_examples=40, deadline=None)
def test_stream_invariant_to_read_chunk_size(tmp_path_factory, recs, chunk):
    """The rolling-buffer parser must produce identical records whether it
    reads the stream 1 byte or 1 MB at a time (boundary-spanning headers,
    markers, and closing CRLFs)."""
    p = str(tmp_path_factory.mktemp("warcprop") / "t.warc")
    write_warc(p, recs, compress=False)
    data = open(p, "rb").read()
    tiny = list(iter_warc_stream(io.BytesIO(data), chunk_size=chunk))
    assert tiny == recs


@given(body=st.binary(max_size=300), cuts=st.lists(st.integers(0, 300), max_size=8))
@settings(max_examples=60, deadline=None)
def test_dechunk_any_split(body, cuts):
    """Chunked transfer framing decodes the original body for EVERY way of
    splitting it into chunks."""
    bounds = sorted({c for c in cuts if c < len(body)} | {0, len(body)})
    parts = [body[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
    wire = b"".join(
        b"%x\r\n" % len(part) + part + b"\r\n" for part in parts
    ) + b"0\r\n\r\n"
    assert _dechunk(wire) == body
    # and through the HTTP layer
    msg = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + wire
    )
    assert _http_body(msg) == body


@given(body=st.binary(max_size=300), gz=st.booleans())
@settings(max_examples=40, deadline=None)
def test_content_encoding_roundtrip(body, gz):
    enc = gzip.compress(body) if gz else __import__("zlib").compress(body)
    label = b"gzip" if gz else b"deflate"
    msg = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: " + label + b"\r\n\r\n" + enc
    )
    assert _http_body(msg) == body


@given(
    recs=st.lists(st.tuples(_url, _ts, st.binary(max_size=100)), min_size=1, max_size=4),
    junk=st.binary(min_size=1, max_size=120),
)
@settings(max_examples=40, deadline=None)
def test_resync_past_leading_garbage(tmp_path_factory, recs, junk):
    """Garbage BEFORE the records (that does not itself start a parseable
    record) loses at most the garbage — every real record still parses.
    Leading junk that happens to contain a full valid record prefix is
    excluded by construction (no 'WARC/' marker in the junk)."""
    if b"WARC/" in junk:
        junk = junk.replace(b"WARC/", b"WARCX")
    p = str(tmp_path_factory.mktemp("warcprop") / "t.warc")
    write_warc(p, recs, compress=False)
    data = junk + b"\r\n" + open(p, "rb").read()
    skipped = [0]
    got = list(iter_warc_stream(io.BytesIO(data), skipped=skipped))
    assert got == recs
    assert skipped[0] >= len(junk)


@given(data=st.binary(max_size=600))
@settings(max_examples=80, deadline=None)
def test_parser_total_on_arbitrary_bytes(data):
    """The framing loop is a total function: arbitrary bytes (including
    truncated gzip) never raise and never loop forever."""
    list(parse_warc_bytes(data))
    list(parse_warc_bytes(gzip.compress(data)[:-3] if data else b""))
