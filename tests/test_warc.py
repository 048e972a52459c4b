"""WARC source: byte-exact round-trip through write_warc/parse_warc_bytes,
distributed read via binaryFile + mapInPandas, and e2e crawl parity — a
WARC-backed corpus must crawl identically to the parquet fixture."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from doonop_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_corpus,
    write_warc,
)


def test_warc_roundtrip_bytes(tmp_path):
    recs = [
        ("http://a.example/p1", "2024-01-01T00:00:00Z", b"<html><main>one</main></html>"),
        ("http://a.example/p2", "2024-01-01T00:00:01Z", b"\x00\xffbinary<main>\xfe</main>"),
        ("http://b.example/", "2024-01-02T12:34:56Z", b""),
    ]
    for compress in (True, False):
        p = str(tmp_path / (f"t{compress}.warc" + (".gz" if compress else "")))
        write_warc(p, recs, compress=compress)
        got = list(parse_warc_bytes(open(p, "rb").read()))
        assert got == recs  # byte-exact bodies, urls and dates preserved


def test_warc_skips_non_response_records():
    # hand-build a warcinfo record followed by a response record
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    body = b"<html>x</html>"
    http = b"HTTP/1.1 200 OK\r\n\r\n" + body
    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    got = list(parse_warc_bytes(info + resp))
    assert got == [("http://x.example/", "2024-01-01T00:00:00Z", body)]
    # gzip multi-member concatenation inflates fully
    gz = gzip.compress(info, mtime=0) + gzip.compress(resp, mtime=0)
    assert list(parse_warc_bytes(gz)) == got


def test_read_warc_multiple_files(spark, tmp_path):
    for i in range(3):
        write_warc(
            str(tmp_path / f"seg{i}.warc.gz"),
            [
                (
                    f"http://h{i}.example/p{j}",
                    f"2024-01-0{i + 1}T00:00:0{j}Z",
                    f"<main>d{i}.{j}</main>".encode(),
                )
                for j in range(4)
            ],
        )
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = df.collect()
    assert len(rows) == 12
    assert {r.url for r in rows} == {
        f"http://h{i}.example/p{j}" for i in range(3) for j in range(4)
    }
    # timestamps parsed to real timestamps
    assert all(r.warc_ts is not None for r in rows)
    # one task per archive file (binaryFile is the parallelism unit)
    assert df.rdd.getNumPartitions() >= 1


def test_warc_backed_crawl_matches_parquet(spark, tmp_path):
    """The reference golden (visited=2, collected=2) through a WARC
    archive: warc_corpus must be a drop-in for the parquet fixture."""
    from doonop_spark.plans.job import CrawlJob
    from doonop_spark.plans.loop import run_crawl
    from doonop_spark.sources.corpus import fixture_site_corpus

    fixture = fixture_site_corpus(spark)
    recs = [
        (r.url, "2024-01-01T00:00:00Z", bytes(r.html))
        for r in fixture.orderBy("url").collect()
    ]
    wpath = str(tmp_path / "site.warc.gz")
    write_warc(wpath, recs)
    corpus = warc_corpus(spark, wpath)
    # corpus shape matches input_hint and text is the flagship extraction
    assert [f.name for f in corpus.schema] == ["url", "warc_ts", "html", "text", "lang"]

    job = CrawlJob(seeds=["http://localhost:8000/basic/index.html"], engines=1)
    res_warc = run_crawl(spark, job, corpus)
    res_parq = run_crawl(spark, job, fixture)
    assert res_warc.stats.count_visited == 2 and res_warc.stats.count_collected == 2
    assert sorted((r.url, r.data) for r in res_warc.results.collect()) == sorted(
        (r.url, r.data) for r in res_parq.results.collect()
    )


def test_cli_warc_corpus_golden(spark, tmp_path):
    """The reference CLI golden through a .warc.gz corpus: --corpus
    pointed at an archive sniffs the format and crawls identically."""
    from tests.test_cli import run_cli
    from doonop_spark.sources.corpus import fixture_site_corpus

    recs = [
        (r.url, "2024-01-01T00:00:00Z", bytes(r.html))
        for r in fixture_site_corpus(spark).orderBy("url").collect()
    ]
    wpath = str(tmp_path / "site.warc.gz")
    write_warc(wpath, recs)
    p = run_cli(["--corpus", wpath, "http://localhost:8000/basic/index.html"])
    assert p.returncode == 0
    assert p.stderr.endswith(
        "Statistics: visited 2, collected 2, errors 0, retries 0\n"
    ), p.stderr[-500:]
    import json as _json

    assert [_json.loads(l) for l in p.stdout.splitlines()] == [
        "http://localhost:8000/basic/index.html",
        "http://localhost:8000/basic/about.html",
    ]


def test_wet_roundtrip_distributed(spark, tmp_path):
    """corpus → write_wet (one gzip per partition, shuffle-free) →
    read_wet reproduces (url, warc_ts, text) exactly; multiple part
    files prove the write was distributed."""
    from doonop_spark.sources.corpus import synthetic_corpus
    from doonop_spark.sources.warc import read_wet, write_wet

    corpus = synthetic_corpus(spark, n_hosts=3, n_pages=60).repartition(5)
    out = str(tmp_path / "wet_out")
    n_parts = write_wet(corpus, out)
    assert n_parts >= 2  # distributed: several tasks wrote files

    back = read_wet(spark, out + "/*.warc.wet.gz")
    a = sorted((r.url, r.warc_ts, r.text) for r in corpus.select("url", "warc_ts", "text").collect())
    b = sorted((r.url, r.warc_ts, r.text) for r in back.collect())
    assert a == b


def test_warc_dir_roundtrip_distributed(spark, tmp_path):
    """corpus → write_warc_dir (per-partition archives) → read_warc
    reproduces (url, warc_ts, html) byte-exactly."""
    from doonop_spark.sources.corpus import synthetic_corpus
    from doonop_spark.sources.warc import read_warc, write_warc_dir

    corpus = synthetic_corpus(spark, n_hosts=2, n_pages=40).repartition(4)
    out = str(tmp_path / "warc_out")
    n = write_warc_dir(corpus, out)
    assert n >= 2
    back = read_warc(spark, out + "/*.warc.gz")
    a = sorted((r.url, r.warc_ts, bytes(r.html)) for r in corpus.select("url", "warc_ts", "html").collect())
    b = sorted((r.url, r.warc_ts, bytes(r.html)) for r in back.collect())
    assert a == b


def test_cli_wet_out_sink(spark, tmp_path):
    """--wet-out: collected results also land as WET conversion records
    (url + collected data + the page's capture time), readable back with
    read_wet; stdout golden unchanged."""
    from tests.test_cli import run_cli
    from doonop_spark.sources.corpus import fixture_site_corpus
    from doonop_spark.sources.warc import read_wet

    cpath = str(tmp_path / "fixture.parquet")
    fixture_site_corpus(spark).write.parquet(cpath)
    wet_dir = str(tmp_path / "wet")
    p = run_cli(
        [
            "--corpus", cpath, "--wet-out", wet_dir,
            "http://localhost:8000/basic/index.html",
        ]
    )
    assert p.returncode == 0
    assert p.stderr.endswith(
        "Statistics: visited 2, collected 2, errors 0, retries 0\n"
    ), p.stderr[-500:]
    back = read_wet(spark, wet_dir + "/*.warc.wet.gz")
    rows = {r.url: r.text for r in back.collect()}
    # default check program collects the page URL as the data value
    assert rows == {
        "http://localhost:8000/basic/index.html": "http://localhost:8000/basic/index.html",
        "http://localhost:8000/basic/about.html": "http://localhost:8000/basic/about.html",
    }
    assert all(r.warc_ts is not None for r in back.collect())
