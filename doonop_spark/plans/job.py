"""CrawlJob — the logical plan (SURVEY.md §2.11 C1-C4; reference
``CrawlConfig`` at ``src/lib.rs:28-41``, CLI schema ``src/cfg.rs:25-98``).

Also carries the reference's CLI-fidelity pure parsers (proxy spec, retry
policy, browser) — the proxy/browser settings are physical no-ops for a
corpus-join fetch but are parsed and validated exactly as the reference
does (golden tests ported from ``src/cfg.rs:352-397``).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from enum import Enum

from doonop_spark.operators.filters import (
    Filter,
    RegexFilter,
    parse_filter_spec,
    squash_filters,
)
from doonop_spark.operators.robots import DEFAULT_ROBOT

__all__ = [
    "RetryPolicy",
    "CrawlJob",
    "parse_retry_policy",
    "parse_proxy",
    "parse_browser",
    "open_code_file",
    "job_from_argv",
]

# the reference's default check program (src/cfg.rs:344-346): identity on
# the page URL. Our flagship program is 'text' (input_hint: byte-identical
# extracted text per url).
DEFAULT_CODE = "return window.location.href"


def open_code_file(path: str | None, fmt: str | None = None) -> tuple[str, str]:
    """S3 — check-file scan with the reference's format sniffing
    (src/cfg.rs:162-183): explicit ``--check-file-format`` first
    ('side'/'json' ⇒ side, 'js' ⇒ js), then the extension; neither ⇒ hard
    error. Returns (program_text, 'js'|'side'). The program text selects a
    registered extraction; 'js' text equal to the default program maps to
    the identity-on-url Column (see plans/loop.py data_expr)."""
    if path is None:
        return DEFAULT_CODE, "js"
    with open(path) as f:
        content = f.read()
    if fmt in ("side", "json"):
        t = "side"
    elif fmt == "js":
        t = "js"
    elif path.endswith(".js"):
        t = "js"
    elif path.endswith(".side") or path.endswith(".json"):
        t = "side"
    else:
        raise ValueError("Failed to determine a format of a check file")
    return content, t


class RetryPolicy(str, Enum):
    FIRST = "first"
    LAST = "last"
    NO = "no"


def parse_retry_policy(s: str) -> RetryPolicy:
    """src/cfg.rs:228-239 — accepted spellings."""
    if s in ("no", "No", "off", "Off"):
        return RetryPolicy.NO
    if s in ("first", "First"):
        return RetryPolicy.FIRST
    if s in ("last", "Last"):
        return RetryPolicy.LAST
    raise ValueError(f"invalid retry policy: {s!r}")


def parse_browser(s: str) -> str:
    """src/cfg.rs:216-226 — kept for CLI fidelity; a config no-op here."""
    if s in ("Firefox", "firefox", "geckodriver"):
        return "firefox"
    if s in ("Chrome", "chrome", "chromedriver"):
        return "chrome"
    raise ValueError(f"invalid browser: {s!r}")


def parse_proxy(s: str) -> dict | None:
    """Proxy spec parser (src/cfg.rs:300-328), pure-function port with the
    reference's golden semantics: ``kind;k=v;k=v``; returns None on any
    missing required key (the reference's Option::None)."""
    parts = [p for p in s.split(";") if p != ""] if ";" in s else [s]
    if not parts:
        return None
    kind = parts[0]
    kv: dict[str, str] = {}
    for item in parts[1:]:
        if "=" not in item:
            return None
        k, _, v = item.partition("=")
        kv[k] = v
    if kind == "sock":
        if "address" not in kv or "version" not in kv:
            return None
        try:
            version = int(kv["version"])
        except ValueError:
            return None
        return {
            "kind": "sock",
            "address": kv["address"],
            "version": version,
            "username": kv.get("username"),
            "password": kv.get("password"),
        }
    if kind == "http":
        if "address" not in kv:
            return None
        return {"kind": "http", "address": kv["address"]}
    if kind == "auto-config":
        if "address" not in kv:
            return None
        return {"kind": "auto-config", "address": kv["address"]}
    if kind in ("auto-detect", "direct", "system"):
        return {"kind": kind}
    return None


@dataclass
class CrawlJob:
    """The validated logical plan (reference CrawlConfig analog).

    ``engines`` maps to the max in-flight URLs per wave: the reference
    never dispatches more URLs than engines (``src/workload.rs:93-98``), so
    wave size = engines. ``engines=None`` lifts the cap (scale mode: the
    per-host politeness budget bounds the wave instead).
    """

    seeds: list[str] = field(default_factory=list)
    # extra seed URLs as a DataFrame(url: string) — cleaned and unioned
    # into the wave-0 frontier Spark-side, never driver-materialized (the
    # scale path for --sitemap-seeds; sources/seeds.py
    # seed_frontier_distributed). None = CLI/file seeds only.
    seed_frame: object | None = None
    filters: list[Filter] = field(default_factory=list)
    limit: int | None = None  # O5: stop enqueueing once N results collected
    engines: int | None = 1  # reference default: 1 (src/cfg.rs:23,249)
    # reference default: RetryFirst (src/cfg.rs:73); without fault
    # injection FIRST and NO are behaviorally identical (nothing to retry)
    retry_policy: RetryPolicy = RetryPolicy.FIRST
    retry_count: int = 3  # budget: count >= retry_count ⇒ give up
    # ripeness threshold: in 'wave' clock units (logical waves) or 'wall'
    # clock units (seconds) depending on retry_clock
    retry_threshold: float = 0.0
    # retry ripeness clock (O3). 'wave': deterministic logical time — a
    # retry ripens retry_threshold WAVES after requeue (test/repro mode).
    # 'wall': reference parity — requeue stamps real time.time() and the
    # retry ripens once now >= stamp + retry_threshold SECONDS, exactly
    # like src/retry.rs:31-46 comparing elapsed wall-clock against
    # --retry-threshold-milis. Don't mix clocks across a resume: retry_at
    # values in the checkpointed frontier are in the writing run's units.
    retry_clock: str = "wave"
    use_robots: bool = False
    robot: str = DEFAULT_ROBOT
    url_key: str = "parity"  # 'parity' (url::Url equality) | 'surt'
    # --- scale knobs (north_star extensions; no reference analog) ---
    per_host_budget: int | None = None  # max URLs per host per wave
    wave_seconds: float = 30.0  # politeness: budget = wave_seconds/crawl_delay
    # X1 hot-host salting: repartition the gated wave by (host, salt)
    # before the fetch when a wave exceeds this row count; 0 (default) =
    # OFF. Measured OFF-by-default for a reason: every fetch path already
    # balances the extract stage itself (the plain and bucketed joins
    # shuffle by url hash; the broadcast path streams corpus partitions),
    # so the salt shuffle adds cost without balancing anything — an
    # 80%-hot-host corpus at sf0.1 crawled 26% FASTER unsalted (bench
    # --skew: 40.8 s vs 51.4 s). This is the Spark analog of the
    # reference's shared-URL-channel load balance (src/workload.rs:85-86)
    # coming for free from the url-keyed shuffle. Set >0 only for custom
    # data_expr pipelines that group by host downstream of the fetch.
    salt_target_rows: int = 0
    # waves at or below this row count broadcast into the corpus join
    # (corpus probed in place, no shuffle). DISABLED by default: A/B runs
    # showed AQE's runtime SortMergeJoin→BroadcastHashJoin conversion
    # already covers small waves without this path's extra miss-branch
    # materialization (70s vs 130s on a 400k-page crawl). Worth enabling
    # only where the corpus scan itself must be avoided — i.e. a corpus
    # bucketed/partitioned by xxhash64(url) where the broadcast join can
    # prune storage partitions.
    broadcast_wave_max: int = 0
    # bucket count of a corpus written by sources.corpus.write_bucketed_corpus
    # (partition column bucket = pmod(xxhash64(url), corpus_buckets)). When
    # >0 and the corpus carries a 'bucket' column, each wave's fetch join
    # prunes the corpus scan to the wave's buckets (storage-partitioned
    # join): at 100 TB a wave touching k of B buckets reads k/B of the
    # corpus instead of all of it, every wave. 0 = plain url join.
    corpus_buckets: int = 0
    # partitioned bloom seen-sidecar (north_rule): >0 wires operators.bloom
    # into the per-wave anti-join — candidates the bloom clears as
    # definitely-new skip the exact anti-join shuffle. 0 = exact-only.
    bloom_partitions: int = 0
    bloom_expected_per_partition: int = 1_000_000
    bloom_fp_rate: float = 0.01
    # 'broadcast': bank collects to the driver and broadcasts (fast at
    # sandbox scale; ~12 GB driver-resident at 10^10 keys). 'copartition':
    # links cogroup with bank rows on pid — the 10^10 path, no driver
    # materialization of the bank ever (operators/bloom.py). 'auto'
    # (default): the engine computes the bank size from its parameters and
    # picks broadcast ≤ 256 MB, copartition above.
    bloom_probe_mode: str = "auto"
    # fold accumulated seen deltas into the bloom bank every K waves; in
    # between, bloom-cleared rows are exact-checked against the ≤K-frame
    # uncovered tail (correct AND amortizes the bank update)
    bloom_fold_every: int = 4
    # compact the seen-delta chain every K waves: the anti-join otherwise
    # scans one delta frame per past wave (O(waves²) over a long crawl)
    seen_compact_every: int = 8
    # fetch-side corpus cache budget (bytes): when the optimizer's size
    # estimate for the corpus is at or below this, run_crawl persists the
    # fetch projection (url, html[, warc_ts]) once — hash-partitioned and
    # sorted by url — so every wave's fetch join reads cached partitions
    # with no corpus-side Exchange/Sort instead of re-scanning the corpus
    # per wave (measured ~40% of plain-crawl wall time at bench scale).
    # MEMORY_AND_DISK, unpersisted on loop exit. At 100 TB the estimate
    # exceeds any sane budget and the scan-per-wave plans (bucketed
    # pruning / broadcast waves) stay in effect — this knob only changes
    # the physical fetch plan, never results. 0 disables.
    corpus_cache_max_bytes: int = 8 << 30
    max_iterations: int = 10_000
    # extraction program surface (§2.10): 'text' = flagship byte-exact
    # extraction; 'url' = the reference's default JS program
    # (return window.location.href ≡ F.col("url")); 'side' = run the
    # Selenium-IDE subset program in side_program against each fetched page
    # (P3, src/backend.rs:173-184); run_crawl's data_expr argument
    # overrides with an arbitrary Column
    check: str = "text"
    # revisit semantics: a WARC corpus may hold several captures of one
    # URL; True = the fetch keeps only the LATEST capture per URL
    # (wave-sized window in the fetch join — plans/loop.py
    # latest_capture). Default False: the parquet corpus contract has
    # unique urls, and the dedup window is not free on the broadcast
    # path. The CLI turns this on automatically for .warc corpora.
    dedup_captures: bool = False
    side_program: str | None = None
    # politeness implementation: 'window' (JVM row_number, default),
    # 'window2' (two-phase per-(host,salt)→per-host top-k — skew-proof:
    # a hot host's frontier never sorts in one task; identical output),
    # 'pandas' (applyInPandas grouped priority queue, for custom rules),
    # or 'auto' (window below politeness_auto_threshold frontier rows,
    # window2 above — operators/schedule.py:resolve_politeness_impl)
    politeness_impl: str = "window"
    # 'auto' switchover point: a frontier of R rows bounds any per-host
    # candidate count by R, so below this the single-window form cannot
    # meet a sort big enough to matter; 2M rows ≈ a few seconds of one
    # task's window-sort, the cost the two-phase form amortizes away
    politeness_auto_threshold: int = 2_000_000
    # CLI-fidelity no-ops (browser fetch does not exist here)
    browser: str = "firefox"
    proxy: dict | None = None
    page_load_timeout_ms: int = 10_000

    def __post_init__(self) -> None:
        self.filters = squash_filters(list(self.filters))


def job_from_argv(argv: list[str]) -> CrawlJob:
    """C1 — the reference's 16-option CLI schema (src/cfg.rs:25-98) mapped
    onto the spark-submit entry."""
    # Option spellings mirror the reference's clap schema exactly
    # (src/cfg.rs:25-98): kebab-case longs except the three it spells with
    # underscores (--retry_threshold, --use_robots_txt, --robot), plus its
    # short options, so reference command lines run unmodified. Kebab-case
    # variants of the underscore flags are kept as aliases.
    p = argparse.ArgumentParser(prog="doonop-spark")
    p.add_argument("urls", nargs="*")
    p.add_argument("-s", "--seed-file")
    p.add_argument("-j", "--count-searchers", type=int, default=1)
    p.add_argument("-l", "--limit", type=int)
    p.add_argument("-i", "--ignore", action="append", default=[])
    p.add_argument("-f", "--filter", action="append", default=[])
    # reference default: RetryFirst (src/cfg.rs:73)
    p.add_argument("--retry-policy", default="first")
    p.add_argument("--retry-count", type=int, default=3)
    # reference spelling --retry_threshold, default 10000 ms
    # (src/cfg.rs:76-77); converted below into the loop's logical-wave unit
    p.add_argument(
        "--retry_threshold",
        "--retry-threshold-milis",
        dest="retry_threshold_milis",
        type=float,
        default=10_000.0,
    )
    p.add_argument(
        "--use_robots_txt",
        "--use-robots-txt",
        dest="use_robots_txt",
        action="store_true",
    )
    p.add_argument("--robot", "--robot-name", dest="robot_name", default=DEFAULT_ROBOT)
    p.add_argument("-b", "--browser", default="firefox")
    p.add_argument("--proxy")
    p.add_argument("-p", "--page-load-timeout", type=int, default=10_000)
    # accepted for command-line fidelity; a corpus-join fetch has no driver
    p.add_argument("-w", "--webdriver-url", default="http://localhost:4444")
    p.add_argument("--url-key", default="parity", choices=["parity", "surt"])
    p.add_argument("-c", "--check-file")
    p.add_argument("--check-file-format")
    a = p.parse_args(argv)

    filters: list[Filter] = [RegexFilter(rx) for rx in a.ignore]
    for spec in a.filter:
        f = parse_filter_spec(spec)
        if f is None:
            raise ValueError(f"Failed to parse a filter: {spec!r}")
        filters.append(f)

    proxy = None
    if a.proxy is not None:
        proxy = parse_proxy(a.proxy)
        if proxy is None:
            raise ValueError("Failed to parse proxy setting")

    seeds = list(a.urls)
    if a.seed_file:
        with open(a.seed_file) as f:
            seeds += [ln.strip() for ln in f if ln.strip()]

    code, code_type = open_code_file(a.check_file, a.check_file_format)
    side_program = None
    stripped = code.strip().rstrip(";")
    if code_type == "side":
        check = "side"  # P3: run the program, collect its RESULT variable
        side_program = code
    elif stripped == DEFAULT_CODE:
        check = "url"
    # recognized one-liner JS programs (the reference executes arbitrary JS
    # in a live browser, src/backend.rs:113-123; a corpus-join engine can
    # honestly evaluate the document-shaped subset): title and raw html
    elif stripped in ("return document.title", "return window.document.title"):
        check = "title"
    elif stripped in (
        "return document.documentElement.outerHTML",
        "return document.documentElement.innerHTML",
    ):
        check = "html"
    else:
        # any other program maps to the registered-extraction surface
        # (§2.10): the flagship byte-exact text extraction by default,
        # overridable with an arbitrary Column via run_crawl(data_expr=...)
        check = "text"

    # --retry-threshold-milis is wall-clock in the reference; the loop's
    # retry_threshold is in logical waves (one wave ≈ wave_seconds of
    # dispatch work), so convert ms → waves against the default cadence.
    wave_seconds = CrawlJob.__dataclass_fields__["wave_seconds"].default
    return CrawlJob(
        check=check,
        side_program=side_program,
        seeds=seeds,
        filters=filters,
        limit=a.limit,
        engines=a.count_searchers,
        retry_policy=parse_retry_policy(a.retry_policy),
        retry_count=a.retry_count,
        retry_threshold=a.retry_threshold_milis / 1000.0 / wave_seconds,
        use_robots=a.use_robots_txt,
        robot=a.robot_name,
        url_key=a.url_key,
        browser=parse_browser(a.browser),
        proxy=proxy,
        page_load_timeout_ms=a.page_load_timeout,
    )
