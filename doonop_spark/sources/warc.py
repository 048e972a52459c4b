"""WARC source — read Common-Crawl-style ``.warc.gz`` archives into the
engine's corpus table shape (SURVEY.md §2.1 extension; the north star's
frontier is "Common-Crawl-style", and WARC is that corpus's native
format).

Format (ISO 28500, the subset Common Crawl emits): a WARC file is a
sequence of records, each ``WARC/1.0\\r\\n`` + header lines +
``\\r\\n\\r\\n`` + exactly ``Content-Length`` bytes of block +
``\\r\\n\\r\\n``. In ``.warc.gz`` every record is its own gzip member
(members concatenate; Python's :func:`gzip.decompress` inflates all
members in one call). A ``response`` record's block is an HTTP/1.1
message — status line, headers, blank line, body; the page bytes are the
body.

Spark shape: ``spark.read.format("binaryFile")`` lists the archive files
(each file one row: path + whole-file bytes) and a ``mapInPandas``
parser emits one corpus row per response record. The FILE is the
parallelism unit — exactly how Common Crawl ships (10^5 × ~1 GB
segments for a crawl), so a 100 TB read is a 10^5-task scan with
per-task linear streaming and no shuffle. Parsing is stdlib-only
(``gzip``) and runs on Arrow batches.

``write_warc`` is the deterministic fixture generator (exact inverse of
the reader for the emitted subset), so round-trips are byte-asserted in
tests without any external archive.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_warc",
    "parse_warc_bytes",
    "read_warc",
    "warc_corpus",
    "write_wet",
    "read_wet",
    "write_warc_dir",
]

_CRLF = b"\r\n"


def write_warc(
    path: str,
    records: list[tuple[str, str, bytes]],
    compress: bool = True,
) -> None:
    """Write ``records`` = [(url, iso_ts, html_bytes), ...] as a WARC file
    of ``response`` records (one gzip member per record when
    ``compress``, the ``.warc.gz`` convention)."""
    out = io.BytesIO()
    for url, ts, body in records:
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF + body
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + ts.encode() + _CRLF
            + b"Content-Type: application/http;msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF
        )
        rec = hdr + http + _CRLF + _CRLF
        out.write(gzip.compress(rec, mtime=0) if compress else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def parse_warc_bytes(
    data: bytes, types: tuple[str, ...] = ("response",)
) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, body_bytes) per record whose WARC-Type is
    in ``types``. ``response`` blocks are HTTP messages (body unwrapped);
    ``conversion`` blocks (WET extracted text) ARE the body. Pure
    function of the bytes — usable driver-side and inside the Arrow
    parser. Records with other WARC-Types (request, metadata, warcinfo)
    are skipped; truncated trailing garbage stops parsing (Common Crawl
    segments end cleanly; a hard error would poison a whole file for one
    bad tail)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # inflates ALL concatenated members
    pos = 0
    n = len(data)
    while pos < n:
        end_hdr = data.find(_CRLF + _CRLF, pos)
        if end_hdr < 0 or not data.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        for line in data[pos:end_hdr].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            break
        block = data[end_hdr + 4 : end_hdr + 4 + clen]
        pos = end_hdr + 4 + clen + 4  # block + closing CRLFCRLF
        rtype = headers.get("warc-type")
        if rtype not in types:
            continue
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date", "")
        if not url:
            continue
        if rtype == "response":
            # HTTP message: body follows the first blank line
            body_at = block.find(_CRLF + _CRLF)
            body = block[body_at + 4 :] if body_at >= 0 else block
        else:  # conversion (WET): the block IS the extracted text
            body = block
        yield url, ts, body


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """``.warc`` / ``.warc.gz`` files → rows ``(url, warc_ts, html)``.
    One task per archive file (binaryFile source), Arrow-batched parse,
    no shuffle."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, ts, body in parse_warc_bytes(bytes(content)):
                    rows.append((url, ts, body))
            yield pd.DataFrame(rows, columns=["url", "__ts", "html"])

    raw = spark.read.format("binaryFile").load(path_glob).select("content")
    parsed = raw.mapInPandas(parse, schema="url string, __ts string, html binary")
    return parsed.select(
        "url", F.to_timestamp(F.col("__ts")).alias("warc_ts"), "html"
    )


def warc_corpus(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC archives → the engine's full corpus shape (BASELINE.json
    input_hint): ``text`` via the flagship byte-exact extraction kernel,
    ``lang`` via the n-gram language heuristic — both Arrow-batched, so a
    WARC-backed crawl (`run_crawl(spark, job, warc_corpus(...))`) is
    plan-identical to a parquet-backed one."""
    from doonop_spark.functions.extract import extract_page_udf
    from doonop_spark.functions.text import lang_id_udf

    pages = read_warc(spark, path_glob)
    return pages.withColumn("__page", extract_page_udf("url", "html")).select(
        "url",
        "warc_ts",
        "html",
        F.col("__page.text").alias("text"),
        lang_id_udf(F.col("__page.text")).alias("lang"),
    )


def write_wet(
    corpus: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> int:
    """Distributed WET sink: ``(url, warc_ts, text)`` → one
    ``part-NNNNN.warc.wet.gz`` of ``conversion`` records per partition
    (Common Crawl's extracted-text interchange format — the standard
    hand-off from a crawl to a training-data pipeline). Each task writes
    its own gzip file directly under ``out_dir`` (local FS here; a DFS
    mount on a cluster), so the write is shuffle-free and scales with
    partition count. Returns the number of part files written."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = io.BytesIO()
        n = 0
        for pdf in batches:
            for url, ts, text in zip(pdf["__u"], pdf["__t"], pdf["__x"]):
                body = (text or "").encode("utf-8")
                ts_s = (
                    ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                    if ts is not None and hasattr(ts, "strftime")
                    else "1970-01-01T00:00:00Z"
                )
                hdr = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: conversion\r\n"
                    b"WARC-Target-URI: " + str(url).encode() + _CRLF
                    + b"WARC-Date: " + ts_s.encode() + _CRLF
                    + b"Content-Type: text/plain\r\n"
                    + b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
                )
                out.write(gzip.compress(hdr + body + _CRLF + _CRLF, mtime=0))
                n += 1
        if n:
            with open(os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz"), "wb") as f:
                f.write(out.getvalue())
        yield pd.DataFrame({"part": [pid], "n_records": [n]})

    parts = (
        corpus.select(
            F.col(url_col).alias("__u"),
            F.col(ts_col).alias("__t"),
            F.col(text_col).alias("__x"),
        )
        .mapInPandas(dump, schema="part int, n_records long")
        .collect()  # bounded: one row per partition
    )
    return sum(1 for r in parts if r.n_records > 0)


def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET archives → ``(url, warc_ts, text)`` (conversion records; same
    scan shape as :func:`read_warc`)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, ts, body in parse_warc_bytes(
                    bytes(content), types=("conversion",)
                ):
                    rows.append((url, ts, body.decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=["url", "__ts", "text"])

    raw = spark.read.format("binaryFile").load(path_glob).select("content")
    parsed = raw.mapInPandas(parse, schema="url string, __ts string, text string")
    return parsed.select(
        "url", F.to_timestamp(F.col("__ts")).alias("warc_ts"), "text"
    )


def write_warc_dir(
    corpus: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> int:
    """Distributed WARC sink: one ``part-NNNNN.warc.gz`` of ``response``
    records per partition (same task-local shuffle-free shape as
    :func:`write_wet`). Inverse of :func:`read_warc` — used to emit
    re-shardable archives and to build archive fixtures at scale.
    Returns the number of part files written."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = io.BytesIO()
        n = 0
        for pdf in batches:
            for url, ts, html in zip(pdf["__u"], pdf["__t"], pdf["__h"]):
                body = bytes(html) if html is not None else b""
                ts_s = (
                    ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                    if ts is not None and hasattr(ts, "strftime")
                    else "1970-01-01T00:00:00Z"
                )
                http = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
                    + body
                )
                hdr = (
                    b"WARC/1.0\r\nWARC-Type: response\r\n"
                    b"WARC-Target-URI: " + str(url).encode() + _CRLF
                    + b"WARC-Date: " + ts_s.encode() + _CRLF
                    + b"Content-Type: application/http;msgtype=response\r\n"
                    + b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF
                )
                out.write(gzip.compress(hdr + http + _CRLF + _CRLF, mtime=0))
                n += 1
        if n:
            with open(os.path.join(out_dir, f"part-{pid:05d}.warc.gz"), "wb") as f:
                f.write(out.getvalue())
        yield pd.DataFrame({"part": [pid], "n_records": [n]})

    parts = (
        corpus.select(
            F.col(url_col).alias("__u"),
            F.col(ts_col).alias("__t"),
            F.col(html_col).alias("__h"),
        )
        .mapInPandas(dump, schema="part int, n_records long")
        .collect()  # bounded: one row per partition
    )
    return sum(1 for r in parts if r.n_records > 0)
