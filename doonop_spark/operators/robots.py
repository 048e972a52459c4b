"""robots.txt admission gate (SURVEY.md §2.4 F6/F7, §2.1 S5; reference
``src/robots.rs``, gate applied at dispatch in ``src/workload.rs:100-109``).

Reference semantics reproduced exactly:

- robots.txt is fetched **once per (domain, robot)** and the compiled
  verifier cached (``src/robots.rs:23-33``). Spark shape: the corpus ships
  a small ``robots`` table ``(host, robots_txt)`` that is broadcast-joined
  onto the wave; rule compilation is cached per (robots_txt, robot) inside
  the Arrow UDF (compile-once ≈ the reference's verifier cache).
- a URL **without a domain is always allowed** (F7, ``src/robots.rs:16-19``).
- a robots **fetch error ⇒ the URL is silently skipped** — never
  dispatched, never counted (``src/workload.rs:100-109`` ``if let Ok(true)``
  swallows Err). Table shape: a host absent from the robots table models
  the fetch error ⇒ its URLs are dropped silently. Hosts whose robots.txt
  is empty/permissive admit everything.
- UA-group matching is RFC 9309 / Google-REP (the reference's ``cylon``
  crate): exact case-insensitive product-token equality, never substring
  ("Doonop" matches neither group "doonopbot" nor "doo"); ``*`` is the
  fallback; all groups at the winning level merge. Per-path longest-match
  wins; tie ⇒ Allow; no rule ⇒ allowed. ``*`` and ``$`` wildcards.

``Crawl-delay`` is parsed as well — not used by the reference, but it
feeds the per-host politeness budgeter (north_star extension, see
``operators/schedule.py``).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "parse_robots",
    "is_allowed",
    "crawl_delay_of",
    "robots_gate",
    "DEFAULT_ROBOT",
]

# reference default user-agent token: src/cfg.rs:94-95
DEFAULT_ROBOT = "DoonopRobot"


def _rule_regex(pattern: str) -> re.Pattern:
    """Compile a robots path pattern (* and $ wildcards) to an anchored regex."""
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = "^" + ".*".join(parts)
    if anchored_end:
        rx += "$"
    return re.compile(rx)


def _parse_groups(robots_txt: str) -> list[tuple[list[str], list[tuple[bool, str]], float | None]]:
    """robots.txt -> [(agents, [(is_allow, path)...], crawl_delay)]."""
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    agents_open = True  # consecutive UA lines accumulate into one group

    def flush():
        nonlocal agents, rules, delay
        if agents:
            groups.append((agents, rules, delay))
        agents, rules, delay = [], [], None

    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not agents_open:
                flush()
                agents_open = True
            agents.append(value.lower())
        elif key in ("allow", "disallow"):
            agents_open = False
            if key == "disallow" and value == "":
                continue  # empty Disallow = allow everything (no rule)
            if value:
                rules.append((key == "allow", value))
        elif key == "crawl-delay":
            agents_open = False
            try:
                delay = float(value)
            except ValueError:
                pass
    flush()
    return groups


_TOKEN_RE = re.compile(r"[a-zA-Z_-]+")


def _product_token(name: str) -> str:
    """Leading product token of a crawler/UA-line name, lowercased —
    Google-REP ExtractUserAgent semantics ("FooBot/2.1 (+http://…)" ⇒
    "foobot"). Empty string when the name starts with a non-token char."""
    m = _TOKEN_RE.match(name.strip())
    return m.group(0).lower() if m else ""


class RobotsRules:
    """Compiled per-(robots_txt, robot) verifier — the reference's
    ``RobotsVerifier`` analog (src/robots.rs:60-81)."""

    __slots__ = ("rules", "crawl_delay")

    def __init__(self, robots_txt: str, robot: str):
        # UA-group matching is RFC 9309 §2.2.1 / cylon 0.2: EXACT
        # case-insensitive product-token equality ("Doonop" does NOT match
        # group "doonopbot" and vice versa — substring matching is too
        # loose), '*' the fallback, and rules of ALL groups at the winning
        # level merged. The product token is the leading [a-zA-Z_-] run
        # (Google's ExtractUserAgent: "DoonopRobot/1.0" ⇒ "doonoprobot").
        robot_tok = _product_token(robot)
        exact: list[tuple[list, float | None]] = []
        star: list[tuple[list, float | None]] = []
        for agents, rules, delay in _parse_groups(robots_txt):
            toks = {_product_token(a) for a in agents}
            if robot_tok and robot_tok in toks:
                exact.append((rules, delay))
            elif "*" in agents:
                star.append((rules, delay))
        chosen = exact or star
        self.rules: list[tuple[bool, int, re.Pattern]] = [
            (allow, len(p), _rule_regex(p))
            for rules, _ in chosen
            for allow, p in rules
        ]
        self.crawl_delay: float | None = next(
            (d for _, d in chosen if d is not None), None
        )

    def is_allowed(self, path: str) -> bool:
        if not path:
            path = "/"
        verdict, best_len = True, -1
        for allow, plen, rx in self.rules:
            if rx.match(path) and (plen > best_len or (plen == best_len and allow)):
                verdict, best_len = allow, plen
        return verdict


@lru_cache(maxsize=4096)
def parse_robots(robots_txt: str, robot: str = DEFAULT_ROBOT) -> RobotsRules:
    return RobotsRules(robots_txt, robot)


def is_allowed(robots_txt: str | None, url_path: str, robot: str = DEFAULT_ROBOT) -> bool:
    if robots_txt is None:
        return False  # fetch-miss ⇒ silently skipped (src/workload.rs:100-109)
    return parse_robots(robots_txt, robot).is_allowed(url_path)


def crawl_delay_of(robots_txt: str | None, robot: str = DEFAULT_ROBOT) -> float | None:
    if robots_txt is None:
        return None
    return parse_robots(robots_txt, robot).crawl_delay


def _path_expr(url):
    """JVM-side PATH of a canonical URL — path only, query excluded: the
    reference matches ``url.path()`` (cylon ``allow(url.path())``,
    src/robots.rs:79-81), so 'Disallow: /a$' disallows '/a' but NOT
    '/a?x=1'. Empty path ⇒ '/'."""
    return F.coalesce(
        F.nullif(F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://[^/?#]+(/[^?#]*)", 1), F.lit("")),
        F.lit("/"),
    )


def _n_rules_udf(robot: str):
    @F.pandas_udf(T.IntegerType())
    def _n_rules(robots_txt: pd.Series) -> pd.Series:
        return pd.Series(
            [
                len(parse_robots(t, robot).rules) if t is not None else 0
                for t in robots_txt
            ],
            dtype="int32",
        )

    return _n_rules


def robots_have_path_rules(robots: DataFrame, robot: str = DEFAULT_ROBOT) -> bool:
    """True iff ANY host's robots.txt carries a path rule for ``robot`` —
    ONE scalar aggregate over the (distributed) robots table, computed
    once per crawl so :func:`robots_gate` can drop the per-row Python
    verdict from every wave's plan when the whole table is rule-free
    (the common pure-Crawl-delay politeness setup). Never materializes
    per-host data on the driver."""
    row = robots.select(
        F.max(_n_rules_udf(robot)(F.col("robots_txt"))).alias("m")
    ).first()
    return bool(row["m"] or 0)


def robots_gate(
    wave: DataFrame,
    robots: DataFrame | None,
    robot: str = DEFAULT_ROBOT,
    use_robots: bool = False,
    host_col: str = "host",
    url_col: str = "url",
    has_path_rules: bool | None = None,
) -> DataFrame:
    """F6/F7 — admission gate over a scheduled wave.

    ``robots`` is a tiny per-host table ``(host, robots_txt)`` →
    broadcast hash join (no shuffle of the wave). Disallowed and
    fetch-missed rows are dropped *silently* (reference semantics);
    hostless URLs always pass (F7).

    ``has_path_rules``: pass False (from :func:`robots_have_path_rules`,
    computed once per crawl) when NO host carries a path rule for this
    robot — the gate then stays entirely in whole-stage codegen (host
    known + robots row present ⇒ allowed); None/True keeps the per-row
    verdict, with rule-free hosts' rows crossing the Arrow boundary as
    NULLs only.
    """
    if not use_robots or robots is None:
        return wave

    if has_path_rules is False:
        # rule-free table: admission = "a robots row exists" (fetch-miss
        # rows drop, hostless rows pass) — pure JVM, no Arrow stage.
        r = F.broadcast(
            robots.select(F.col("host").alias("__rhost"), "robots_txt")
        )
        joined = wave.join(r, wave[host_col] == r["__rhost"], "left")
        gate = F.col(host_col).isNull() | F.col("robots_txt").isNotNull()
        return joined.filter(gate).drop("__rhost", "robots_txt")

    # Pre-classify each host ONCE on the tiny broadcast side: the number
    # of path rules the winning UA group carries for THIS robot. A host
    # with zero rules (empty robots.txt, or only Crawl-delay) admits every
    # path, so its wave rows never need the per-row Python verdict — the
    # gate stays whole-stage-codegen for them (guide §4.1: built-ins over
    # UDFs). Rows that DO need path matching reach the pandas UDF with
    # real inputs; everything else crosses the Arrow boundary as NULLs
    # (a When AROUND a pandas UDF still evaluates it over the whole
    # batch, so the skip must happen in the UDF's INPUT — same gating
    # shape as functions/text.normalize_text_expr).
    _n_rules = _n_rules_udf(robot)
    r = F.broadcast(
        robots.select(
            F.col("host").alias("__rhost"),
            "robots_txt",
            _n_rules(F.col("robots_txt")).alias("__nrules"),
        )
    )
    joined = wave.join(r, wave[host_col] == r["__rhost"], "left")

    @F.pandas_udf(T.BooleanType())
    def _allowed(robots_txt: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [is_allowed(t, p, robot) for t, p in zip(robots_txt, path)],
            dtype="boolean",
        )

    needs_py = F.col("robots_txt").isNotNull() & (F.col("__nrules") > 0)
    gate = (
        F.when(F.col(host_col).isNull(), F.lit(True))
        .when(F.col("robots_txt").isNull(), F.lit(False))  # fetch-miss: skip
        .when(F.col("__nrules") == 0, F.lit(True))  # no rules: all allowed
        .otherwise(
            _allowed(
                F.when(needs_py, F.col("robots_txt")),
                F.when(needs_py, _path_expr(F.col(url_col))),
            )
        )
    )
    return joined.filter(gate).drop("__rhost", "robots_txt", "__nrules")
