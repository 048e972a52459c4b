"""Selenium-IDE ``.side`` program execution — the reference's second
check-program backend (SURVEY.md §2.3 P3; reference ``src/backend.rs:173-184``,
parse at ``src/engine_builder.rs:205-207``).

Reference semantics: the ``.side`` JSON is parsed once per engine, its
command sequence runs against every fetched page, and the collected value
is the runner's stored variable ``RESULT`` — or JSON ``null`` when the
program never stored one (``runner.get_value("RESULT").cloned()
.unwrap_or(Value::Null)``, src/backend.rs:182). Null is still *collected*
and counts toward the limit (``src/lib.rs:125-133`` asserts ``json!(null)``
appears in the output — the code wins over the README here, per SURVEY §1.2).

This is a browser-free subset interpreter: commands that only need the
fetched document run against the html bytes; anything that would need a
live browser raises at PARSE time with the command name, so an unsupported
program fails the job up front instead of producing silently-wrong rows.

Supported commands (the golden program ``tests/resources/default.side.json``
uses only ``store``):

- ``open``            — no-op (the page is already fetched)
- ``store``           — ``vars[value] = target`` (literal, ``${var}``
                        interpolation applied)
- ``storeTitle``      — ``vars[value]`` = the page ``<title>`` text
- ``storeText``       — ``vars[value]`` = inner text of the first element
                        matching ``target`` ``css=<tag>`` (tag-name
                        selectors only — documented subset)
- ``echo`` / ``pause``— no-ops

Execution is an Arrow-batched pandas UDF over ``(url, html)`` — the same
UDF surface as the flagship extraction (§2.10), never per-row Spark UDFs.
"""

from __future__ import annotations

import html as _html
import json
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["parse_side_program", "run_side_program", "side_data_udf"]

_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_VAR_RE = re.compile(r"\$\{([^}]+)\}")
_SUPPORTED = {"open", "store", "storeTitle", "storeText", "echo", "pause"}


def parse_side_program(text: str) -> list[dict]:
    """Parse a ``.side`` JSON into the flat command list of the tests the
    default suite references (all tests when there is no suite) — mirroring
    ``siderunner::parse`` (src/engine_builder.rs:205-207). Raises
    ``ValueError`` for malformed JSON or a command outside the documented
    subset."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"invalid .side file: {e}") from e
    tests = {t.get("id"): t for t in doc.get("tests", [])}
    suites = doc.get("suites") or []
    if suites:
        ordered = [tests[tid] for tid in suites[0].get("tests", []) if tid in tests]
    else:
        ordered = list(tests.values())
    commands: list[dict] = []
    for t in ordered:
        for c in t.get("commands", []):
            cmd = c.get("command", "")
            if cmd.startswith("//") or not cmd:  # Selenium-IDE disabled command
                continue
            if cmd not in _SUPPORTED:
                raise ValueError(
                    f"unsupported .side command {cmd!r}: this engine runs a "
                    f"browser-free subset ({sorted(_SUPPORTED)})"
                )
            commands.append({"command": cmd, "target": c.get("target", ""), "value": c.get("value", "")})
    return commands


def _interp(s: str, variables: dict[str, str]) -> str:
    return _VAR_RE.sub(lambda m: str(variables.get(m.group(1), "")), s)


def _tag_text(html_text: str, tag: str) -> str:
    m = re.search(
        rf"<{re.escape(tag)}\b[^>]*>(.*?)</{re.escape(tag)}\s*>",
        html_text,
        re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return ""
    inner = re.sub(r"<[^>]+>", " ", m.group(1))
    return re.sub(r"\s+", " ", _html.unescape(inner)).strip()


def run_side_program(
    commands: list[dict], url: str, html_text: str | None
) -> str | None:
    """Run the parsed command list against one fetched page; return the
    stored ``RESULT`` variable, else None (⇒ JSON null downstream)."""
    variables: dict[str, str] = {}
    page = html_text or ""
    for c in commands:
        cmd, target, value = c["command"], c["target"], c["value"]
        if cmd == "store":
            variables[value] = _interp(target, variables)
        elif cmd == "storeTitle":
            m = _TITLE_RE.search(page)
            variables[value] = (
                re.sub(r"\s+", " ", _html.unescape(m.group(1))).strip() if m else ""
            )
        elif cmd == "storeText":
            sel = _interp(target, variables)
            tag = sel[4:].strip() if sel.startswith("css=") else sel.strip()
            variables[value] = _tag_text(page, tag)
        # open/echo/pause: no-ops
    return variables.get("RESULT")


def side_data_udf(program_text: str):
    """Arrow UDF factory: ``f(url, html) -> string`` running the parsed
    program per page (parse once on the driver, interpret per batch row —
    the reference parses once per engine and runs per page too). The
    returned value is the RAW stored string; plans/loop.py leaves nulls as
    SQL NULL so the results sink can print JSON ``null`` (collected-null
    semantics, src/lib.rs:125-133)."""
    commands = parse_side_program(program_text)  # fail fast on bad programs

    @F.pandas_udf(T.StringType())
    def _side(url: pd.Series, html: pd.Series) -> pd.Series:
        out = []
        for u, h in zip(url, html):
            text = None
            if h is not None:
                text = bytes(h).decode("utf-8", errors="replace") if isinstance(
                    h, (bytes, bytearray, memoryview)
                ) else h
            out.append(run_side_program(commands, u, text))
        return pd.Series(out, dtype="object")

    return _side
