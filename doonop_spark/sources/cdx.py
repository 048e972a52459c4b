"""CDX capture index over WARC archives — the Common Crawl access
pattern the corpus format implies (SURVEY.md §2.1 extension, companion
to :mod:`doonop_spark.sources.warc`).

Common Crawl ships three artifacts per crawl: the ``.warc.gz`` segments,
the WET extracts, and a **CDX index** — one line per capture, keyed by
SURT, carrying ``(timestamp, url, mime, status, digest, length, offset,
filename)`` where ``offset``/``length`` locate the capture's own gzip
member inside its archive so a client fetches ONE page with an HTTP
range request instead of scanning a segment. This module produces and
consumes that index:

- :func:`cdx_index` — distributed index build: one task per archive
  (the same shuffle-free scan shape as ``read_warc``), streaming
  member-by-member so task memory is O(record). Offsets come from
  counting *compressed* bytes per gzip member (``.warc.gz``) or record
  spans in the raw byte stream (plain ``.warc``).
- :func:`read_warc_record` / :func:`fetch_cdx` — random access: seek to
  ``offset``, read ``length`` bytes, inflate one member, parse one
  record. ``fetch_cdx`` is the distributed form (an indexed subset →
  pages) — it repartitions by filename and seeks ascending offsets so
  each task streams forward through one archive.
- :func:`write_cdxj` / :func:`read_cdxj` — the CDXJ text interchange
  form, written as globally SURT-ordered shards (range partition +
  in-partition sort, Common Crawl's ``cdx-NNNNN.gz`` layout) so a
  lookup range-probes one shard.

Deviation from Common Crawl's field conventions, chosen for
oracle-ability: ``digest`` is lowercase-hex SHA-256 of the *decoded*
page bytes (CC uses base32 SHA-1 of the raw payload). Everything else —
SURT key, ts14 timestamp, member-exact offsets — matches.

At 100 TB: the index build is a single 10^5-task scan emitting ~100
bytes per capture (3-4 orders of magnitude smaller than the corpus —
index rows shuffle freely); the CDXJ sort is one range-shuffle of that
small table; random access reads exactly the bytes a capture occupies.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import logging
import zlib
from collections.abc import Iterator
from typing import BinaryIO

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doonop_spark.sources.warc import (
    _glob_paths,
    _http_body,
    _http_status_mime,
    _iter_warc_raw,
    _local_path,
)

__all__ = [
    "iter_gzip_members",
    "cdx_index",
    "read_warc_record",
    "fetch_cdx",
    "write_cdxj",
    "read_cdxj",
    "lookup_cdxj",
    "closest_capture",
    "latest_capture",
    "recrawl_due",
    "write_cdx_parquet",
    "read_cdx_parquet",
    "lookup_cdx_parquet",
]

_log = logging.getLogger(__name__)

_CDX_SCHEMA = (
    "url string, __ts string, status int, mime string, digest string, "
    "length long, offset long, filename string"
)


def iter_gzip_members(
    fh: BinaryIO, chunk_size: int = 1 << 20
) -> Iterator[tuple[int, int, bytes]]:
    """Yield ``(offset, compressed_length, inflated_bytes)`` per gzip
    member of a multi-member stream — the member boundaries ARE the CDX
    coordinates for a ``.warc.gz`` (one record per member, the Common
    Crawl convention). Memory is O(member) = O(record); a corrupt member
    stops the scan (the caller logs how many bytes of the archive were
    indexed)."""
    next_off = 0  # absolute offset of the next compressed byte to consume
    tail = b""
    d: zlib._Decompress | None = None
    member_start = 0
    out = bytearray()
    while True:
        chunk = tail if tail else fh.read(chunk_size)
        tail = b""
        if not chunk:
            return  # clean EOF, or a truncated trailing member (not indexable)
        if d is None:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            member_start = next_off
            out = bytearray()
        try:
            out += d.decompress(chunk)
        except zlib.error:
            _log.warning(
                "gzip member at offset %d is corrupt; stopping index scan",
                member_start,
            )
            return
        next_off += len(chunk)
        if d.eof:
            unused = d.unused_data
            comp_len = (next_off - len(unused)) - member_start
            yield member_start, comp_len, bytes(out)
            next_off -= len(unused)
            tail = unused
            d = None


def _cdx_row(
    headers: dict[str, str], block: bytes, offset: int, length: int, filename: str
) -> tuple | None:
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri")
    if not url:
        return None
    status, mime = _http_status_mime(block)
    digest = hashlib.sha256(_http_body(block)).hexdigest()
    return (url, headers.get("warc-date", ""), status, mime, digest, length, offset, filename)


def _cdx_rows_for_file(path: str) -> Iterator[tuple]:
    """Index one archive: (url, ts, status, mime, digest, length, offset,
    filename) per ``response`` capture. Offsets are compressed member
    coordinates for ``.warc.gz``, raw record spans for plain ``.warc``."""
    local = _local_path(path)
    with open(local, "rb") as fh:
        magic = fh.read(2)
        fh.seek(0)
        if magic == b"\x1f\x8b":
            for off, clen, data in iter_gzip_members(fh):
                recs = list(_iter_warc_raw(io.BytesIO(data)))
                if len(recs) > 1:
                    # non-CC layout: several records share one member; they
                    # share its coordinates (random access re-parses all)
                    _log.warning(
                        "%s: gzip member at %d holds %d records",
                        path, off, len(recs),
                    )
                for _o, _s, headers, block in recs:
                    row = _cdx_row(headers, block, off, clen, path)
                    if row:
                        yield row
        else:
            for off, span, headers, block in _iter_warc_raw(fh):
                row = _cdx_row(headers, block, off, span, path)
                if row:
                    yield row


def cdx_index(
    spark: SparkSession, path_glob: str, records_per_batch: int = 10_000
) -> DataFrame:
    """``.warc``/``.warc.gz`` archives → capture index
    ``(url, surt, warc_ts, ts14, status, mime, digest, length, offset,
    filename)``. One task per archive, streaming, shuffle-free — the
    output is ~100 bytes/capture, so the index of a 100 TB crawl is a
    few GB and joins broadcast-side downstream. ``surt`` is computed
    JVM→Arrow-batched from ``url`` (same key as ``CrawlJob.url_key=
    'surt'``), ``ts14`` is the CDX timestamp form of ``WARC-Date``."""
    from doonop_spark.functions.canonical import surt_key_udf

    paths = _glob_paths(spark, path_glob)
    if not paths:
        raise FileNotFoundError(f"no archive files match {path_glob}")
    pdfp = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths], len(paths)),
        "path string",
    )
    cols = ["url", "__ts", "status", "mime", "digest", "length", "offset", "filename"]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                rows: list[tuple] = []
                for row in _cdx_rows_for_file(str(p)):
                    rows.append(row)
                    if len(rows) >= records_per_batch:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    parsed = pdfp.mapInPandas(parse, schema=_CDX_SCHEMA)
    ts = F.to_timestamp(F.col("__ts"))
    # ts14 comes straight from the WARC-Date digits (UTC by spec) — not
    # from the parsed timestamp — so it is session-timezone-independent
    ts14 = F.substring(F.regexp_replace(F.col("__ts"), "[^0-9]", ""), 1, 14)
    return parsed.select(
        "url",
        surt_key_udf(F.col("url")).alias("surt"),
        ts.alias("warc_ts"),
        ts14.alias("ts14"),
        "status",
        "mime",
        "digest",
        "length",
        "offset",
        "filename",
    )


def _record_at(data: bytes) -> tuple[str, str, bytes]:
    """First WARC record in ``data`` (inflating a leading gzip member
    chain first) → (url, warc_date, decoded_body)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    for _o, _s, headers, block in _iter_warc_raw(io.BytesIO(data)):
        body = (
            _http_body(block)
            if headers.get("warc-type") == "response"
            else block
        )
        return headers.get("warc-target-uri", ""), headers.get("warc-date", ""), body
    raise ValueError("no WARC record at the given offset")


def read_warc_record(
    path: str, offset: int, length: int | None = None
) -> tuple[str, str, bytes]:
    """Random access — the CDX client pattern (Common Crawl serves this
    as an HTTP range request): seek to ``offset``, read ``length``
    bytes, inflate the single gzip member (or parse the raw record for a
    plain ``.warc``), return ``(url, warc_date, page_bytes)``."""
    with open(_local_path(path), "rb") as fh:
        fh.seek(offset)
        data = fh.read(length) if length is not None else fh.read()
    return _record_at(data)


def fetch_cdx(cdx: DataFrame) -> DataFrame:
    """Distributed random access: an indexed subset (any filter over a
    :func:`cdx_index` frame) → ``(url, warc_ts, html)`` pages, WITHOUT
    scanning the archives. Repartitions by ``filename`` so one task
    handles one archive's selected members, seeking in ascending offset
    order (forward-only disk reads). The fetch cost is proportional to
    the *selected* bytes — at 100 TB this is the difference between
    re-reading a crawl and plucking 10^3 pages out of it."""
    sel = cdx.select("filename", "offset", "length", "url").repartition("filename")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fn, grp in pdf.groupby("filename", sort=True):
                rows: list[tuple[str, str, bytes]] = []
                with open(_local_path(str(fn)), "rb") as fh:
                    for off, ln in sorted(zip(grp["offset"], grp["length"])):
                        fh.seek(int(off))
                        rows.append(_record_at(fh.read(int(ln))))
                yield pd.DataFrame(rows, columns=["url", "__ts", "html"])

    pages = sel.mapInPandas(fetch, schema="url string, __ts string, html binary")
    return pages.select(
        "url", F.to_timestamp(F.col("__ts")).alias("warc_ts"), "html"
    )


_CDXJ_META = "url string, digest string, mime string, status int, length long, offset long, filename string"


def write_cdxj(cdx: DataFrame, out_dir: str, n_shards: int | None = None) -> None:
    """CDXJ sink: ``<surt> <ts14> {json}`` lines, gzip text shards that
    are **globally SURT-ordered** — ``repartitionByRange(surt, ts14)``
    makes the shard order the global order and ``sortWithinPartitions``
    orders lines inside each (Common Crawl's ``cdx-NNNNN.gz`` layout), so
    a lookup binary-searches one shard. One range-shuffle of the small
    index table; the corpus is never touched.

    Alongside the shards a **secondary index** ``_cluster.idx`` is
    written (Common Crawl's ``cluster.idx`` pattern): one line
    ``<first_surt> <first_ts14> <shard_filename>`` per non-empty shard,
    in shard order. :func:`lookup_cdxj` bisects it so a point lookup
    opens only the hit shard(s) — O(1) shards per key instead of a scan
    of all of them. The leading underscore (a deviation from CC's
    ``cluster.idx`` name) keeps the file invisible to Spark's file
    index, so ``read_cdxj(out_dir)`` full scans are unaffected.
    Building it reads one line per shard driver-side — O(#shards) work
    on a table that is already ~4 orders of magnitude smaller than the
    corpus."""
    import os

    ranged = (
        cdx.repartitionByRange(n_shards, "surt", "ts14")
        if n_shards
        else cdx.repartitionByRange("surt", "ts14")
    )
    line = F.concat_ws(
        " ",
        F.col("surt"),
        F.col("ts14"),
        F.to_json(
            F.struct("url", "digest", "mime", "status", "length", "offset", "filename")
        ),
    )
    (
        ranged.sortWithinPartitions("surt", "ts14")
        .select(line.alias("value"))
        .write.option("compression", "gzip")
        .mode("overwrite")
        .text(out_dir)
    )
    spark = cdx.sparkSession
    idx_lines: list[str] = []
    for p in _glob_paths(spark, out_dir):
        name = os.path.basename(p)
        if not name.startswith("part-"):
            continue
        first = _first_line(_local_path(p))
        if first is None:
            continue  # empty shard (range partitioner gave it no rows)
        surt, ts14 = first.split(" ", 2)[:2]
        idx_lines.append(f"{surt} {ts14} {name}")
    with open(os.path.join(_local_path(out_dir), "_cluster.idx"), "w") as f:
        f.write("\n".join(idx_lines) + ("\n" if idx_lines else ""))


def _first_line(path: str) -> str | None:
    """First text line of a (possibly gzip) shard — reads one gzip block,
    not the file."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:  # type: ignore[call-overload]
        line = f.readline()
    return line.rstrip("\n") or None


def _cdxj_hit_shards(
    idx: list[tuple[str, str, str]], surts: list[str]
) -> list[str]:
    """Shard filenames that can hold any of ``surts``, by bisection over
    the (first_surt, first_ts14) shard boundaries. A key's captures live
    in the last shard whose first key is ≤ (key, "") — plus any later
    shards whose first key still equals the key (captures straddling a
    shard boundary). Pure function so the boundary logic is unit-testable
    without a filesystem."""
    import bisect

    if not idx:
        return []
    firsts = [(s, t) for s, t, _ in idx]
    hits: set[int] = set()
    for k in surts:
        lo = max(bisect.bisect_right(firsts, (k, "")) - 1, 0)
        hi = max(bisect.bisect_right(firsts, (k, "￿")) - 1, lo)
        hits.update(range(lo, hi + 1))
    return [idx[i][2] for i in sorted(hits)]


def lookup_cdxj(spark: SparkSession, out_dir: str, surts: list[str]) -> DataFrame:
    """Point lookup over a :func:`write_cdxj` directory: bisect
    ``_cluster.idx`` (tiny, driver-side) to the shard(s) whose SURT range
    covers each key, scan ONLY those files, filter to the keys. At 100 TB
    this reads O(keys) shards of an index that is itself ~10^-4 of the
    corpus — the cost a CDX server pays per query, never a full-index
    scan. Result shape = :func:`read_cdxj`."""
    import os

    base = _local_path(out_dir)
    idx: list[tuple[str, str, str]] = []
    with open(os.path.join(base, "_cluster.idx"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                s, t, name = line.split(" ", 2)
                idx.append((s, t, name))
    files = _cdxj_hit_shards(idx, surts)
    if not files:
        raw = spark.createDataFrame([], "value string")
    else:
        raw = spark.read.text([os.path.join(out_dir, name) for name in files])
    return _parse_cdxj(raw).filter(F.col("surt").isin(list(surts)))


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ shards → the :func:`cdx_index` frame shape (``warc_ts``
    reconstructed from ``ts14``). Plain distributed text scan."""
    return _parse_cdxj(spark.read.text(path))


def _parse_cdxj(raw: DataFrame) -> DataFrame:
    """``value: string`` CDXJ lines → the :func:`cdx_index` frame shape."""
    surt = F.substring_index(F.col("value"), " ", 1)
    ts14 = F.element_at(F.split(F.col("value"), " ", 3), 2)
    meta = F.from_json(
        F.expr("substring(value, length(substring_index(value, ' ', 2)) + 2)"),
        _CDXJ_META,
    )
    return raw.select(
        meta["url"].alias("url"),
        surt.alias("surt"),
        F.to_timestamp(ts14, "yyyyMMddHHmmss").alias("warc_ts"),
        ts14.alias("ts14"),
        meta["status"].alias("status"),
        meta["mime"].alias("mime"),
        meta["digest"].alias("digest"),
        meta["length"].alias("length"),
        meta["offset"].alias("offset"),
        meta["filename"].alias("filename"),
    )


def closest_capture(cdx: DataFrame, target_ts: str) -> DataFrame:
    """Wayback-style temporal lookup: for every SURT, the capture nearest
    in time to ``target_ts`` (any Spark-parseable timestamp string); ties
    break to the EARLIER capture, then ``(offset, filename)`` so the pick
    is total-ordered and deterministic. One window over the small index
    frame partitioned by ``surt`` — the corpus is never touched, and at
    100 TB the per-SURT capture lists are tiny (revisit counts), so the
    window never sees a skewed partition."""
    from pyspark.sql import Window

    diff = F.abs(
        F.unix_timestamp(F.col("warc_ts"))
        - F.unix_timestamp(F.lit(target_ts).cast("timestamp"))
    )
    w = Window.partitionBy("surt").orderBy(
        diff.asc(), F.col("warc_ts").asc(), F.col("offset").asc(),
        F.col("filename").asc(),
    )
    return (
        cdx.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def write_cdx_parquet(cdx: DataFrame, out_dir: str, n_buckets: int = 64) -> None:
    """Columnar capture index — the Common Crawl *cc-index* analog, and
    the form a Spark shop should actually serve lookups from. Hive-
    partitioned parquet on ``surt_bucket = pmod(xxhash64(surt), n)`` with
    SURT-sorted files inside each bucket, so:

    - an exact-SURT probe prunes to ONE directory (partition pruning in
      the scan, no file listing of the rest), and
    - inside the bucket, parquet min/max stats on the sorted ``surt``
      column skip row groups (predicate pushdown),

    i.e. a lookup against the index of a 100 TB crawl touches a few MB.
    ``repartition(n_buckets, surt_bucket)`` makes one file per directory
    (the writer would otherwise emit one file per input task per bucket).
    """
    (
        cdx.withColumn(
            "surt_bucket", F.pmod(F.xxhash64("surt"), F.lit(n_buckets)).cast("int")
        )
        .repartition(n_buckets, "surt_bucket")
        .sortWithinPartitions("surt", "ts14")
        .write.partitionBy("surt_bucket")
        .mode("overwrite")
        .parquet(out_dir)
    )


def read_cdx_parquet(spark: SparkSession, path: str) -> DataFrame:
    """The columnar index back as the :func:`cdx_index` frame shape
    (plus ``surt_bucket``)."""
    return spark.read.parquet(path)


def lookup_cdx_parquet(
    spark: SparkSession, path: str, surts: list[str], n_buckets: int = 64
) -> DataFrame:
    """Point-lookup captures for a small set of SURTs out of the columnar
    index. Recomputes each probe's bucket driver-side (cheap: len(surts)
    hashes via one tiny local DataFrame) and pushes BOTH predicates —
    ``surt_bucket IN (...)`` prunes directories, ``surt IN (...)`` skips
    row groups within them. The plan's PartitionFilters line is the
    receipt; tests assert only the probed buckets' files are read."""
    probe = spark.createDataFrame([(s,) for s in surts], "surt string").select(
        F.col("surt"), F.pmod(F.xxhash64("surt"), F.lit(n_buckets)).cast("int").alias("b")
    )
    pairs = probe.collect()  # bounded: one row per probed SURT
    buckets = sorted({r["b"] for r in pairs})
    keys = sorted({r["surt"] for r in pairs})
    df = spark.read.parquet(path)
    return df.filter(
        F.col("surt_bucket").isin(buckets) & F.col("surt").isin(keys)
    )


def latest_capture(cdx: DataFrame) -> DataFrame:
    """The newest capture per SURT — the index's "current state of the
    web" view (revisits collapse to the freshest copy). Same bounded
    window shape as :func:`closest_capture`; ties (same ``warc_ts``)
    break to the LAST ``(offset, filename)`` so the pick is total-ordered.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("surt").orderBy(
        F.col("warc_ts").desc(), F.col("offset").desc(), F.col("filename").desc()
    )
    return (
        cdx.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def recrawl_due(cdx: DataFrame, cutoff_ts: str) -> DataFrame:
    """Refresh scheduling: URLs whose NEWEST capture is older than
    ``cutoff_ts`` — the frontier feed for an incremental crawl (the
    operational loop behind a rolling archive: index the last crawl,
    re-seed what has gone stale). Pure index-side computation — one
    window + one filter over ~100-byte rows; the corpus is never read.
    The result plugs straight into ``CrawlJob.seeds``/the distributed
    seed frontier as a ``(url)`` column."""
    return latest_capture(cdx).filter(
        F.col("warc_ts") < F.lit(cutoff_ts).cast("timestamp")
    )
