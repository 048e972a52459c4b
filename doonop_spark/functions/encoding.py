"""Charset detection + transcoding for fetched page bytes.

The extraction kernel (``functions/extract.py``) decodes ``html`` as
UTF-8 with replacement — correct for the fixtures and most of the
modern web, but a real Common-Crawl-scale corpus is several percent
legacy-encoded (windows-1252, iso-8859-*, shift_jis, gb2312, …); fed
raw to a UTF-8 decoder those pages come back as mojibake and poison
downstream text quality/dedup signals. The reference engine never hits
this (its WebDriver fetch hands it already-decoded DOM text,
``src/backend.rs:84-88``); a corpus-join engine must do the browser's
charset sniff itself.

Detection (``charset_of``) is **pure JVM expression** — no UDF, stays
inside whole-stage codegen — implementing the WHATWG-encoding-spec
priority a browser uses:

1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE),
2. ``charset=`` parameter of a ``Content-Type`` header column (when the
   source carries one, e.g. the WARC HTTP headers),
3. ``<meta charset=…>`` / ``<meta http-equiv="Content-Type" …>`` inside
   the first ``sniff_bytes`` of the document (the spec's 1024-byte
   prescan, widened — scanned via a byte-preserving ISO-8859-1 view),
4. NULL (caller's default — UTF-8).

Transcoding (``decode_html``) is the slow path and is Arrow-batched:
one pandas UDF decoding with the sniffed codec (``errors="replace"``,
BOM stripped, unknown labels fall back to UTF-8). ``transcode_corpus``
wires both into a corpus frame so only the detection expression runs
for every row; the scan stays one pass.
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "charset_of",
    "decode_html",
    "normalize_charset_label",
    "transcode_corpus",
]

# WHATWG encoding labels → python codec names for the aliases regexes
# can't fold (lowercasing handles the rest).  Kept deliberately small:
# codecs.lookup already understands most labels.
_LABEL_ALIASES = {
    "iso-8859-1": "windows-1252",  # WHATWG: latin-1 label means cp1252
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "shift-jis": "shift_jis",
    "x-sjis": "shift_jis",
    "gb2312": "gb18030",  # WHATWG maps the gb2312 label to gb18030
    "unicode": "utf-16",
}

_META_CHARSET_RE = r'(?i)<meta[^>]{0,200}?charset\s*=\s*["\']?\s*([A-Za-z0-9._:\-]+)'
_CT_CHARSET_RE = r"(?i);\s*charset\s*=\s*[\"']?\s*([A-Za-z0-9._:\-]+)"


def normalize_charset_label(label: str | None) -> str:
    """WHATWG-ish label → python codec name; unknown/empty → utf-8."""
    if not label:
        return "utf-8"
    lab = label.strip().lower()
    lab = _LABEL_ALIASES.get(lab, lab)
    try:
        return codecs.lookup(lab).name
    except LookupError:
        return "utf-8"


def charset_of(
    html: Column | str,
    content_type: Column | str | None = None,
    sniff_bytes: int = 4096,
) -> Column:
    """Detected charset label (lowercase) for a ``binary`` html column, or
    NULL when nothing declares one (treat as UTF-8). Pure JVM expression:
    BOM check = hex-prefix comparison; header/meta sniff = regex over a
    byte-preserving ISO-8859-1 view of the prescan window."""
    h = F.col(html) if isinstance(html, str) else html
    bom3 = F.hex(F.substring(h, 1, 3))
    bom2 = F.substring(bom3, 1, 4)
    prescan = F.decode(F.substring(h, 1, sniff_bytes), "ISO-8859-1")
    meta = F.lower(F.regexp_extract(prescan, _META_CHARSET_RE, 1))
    out = F.when(bom3 == "EFBBBF", F.lit("utf-8"))
    out = out.when(bom2 == "FFFE", F.lit("utf-16-le"))
    out = out.when(bom2 == "FEFF", F.lit("utf-16-be"))
    if content_type is not None:
        ct = F.col(content_type) if isinstance(content_type, str) else content_type
        hdr = F.lower(F.regexp_extract(F.coalesce(ct, F.lit("")), _CT_CHARSET_RE, 1))
        out = out.when(hdr != "", hdr)
    return out.when(meta != "", meta).otherwise(F.lit(None).cast("string"))


@F.pandas_udf(T.StringType())
def _decode_udf(html: pd.Series, charset: pd.Series) -> pd.Series:
    out: list[str | None] = []
    for raw, lab in zip(html, charset):
        if raw is None:
            out.append(None)
            continue
        codec = normalize_charset_label(lab)
        try:
            text = bytes(raw).decode(codec, errors="replace")
        except (LookupError, ValueError):
            text = bytes(raw).decode("utf-8", errors="replace")
        out.append(text.lstrip("\ufeff"))
    return pd.Series(out, dtype="object")


def decode_html(html: Column | str, charset: Column | str) -> Column:
    """``binary`` html + detected charset label → decoded string
    (Arrow-batched; ``errors="replace"``, BOM stripped, unknown labels
    fall back to UTF-8)."""
    h = F.col(html) if isinstance(html, str) else html
    c = F.col(charset) if isinstance(charset, str) else charset
    return _decode_udf(h, c)


def transcode_corpus(
    corpus: DataFrame,
    html_col: str = "html",
    content_type_col: str | None = None,
) -> DataFrame:
    """Re-encode every page's ``html`` to UTF-8 bytes using the sniffed
    charset, so every downstream UTF-8 consumer (the extract kernel, the
    WET sink, quality signals) sees correctly-decoded text. UTF-8 /
    undeclared pages pass through untouched (no Python touched for them —
    the common case stays JVM-only); only rows with a detected non-UTF-8
    charset pay the Arrow decode+encode."""
    cs = charset_of(html_col, content_type_col)
    needs = cs.isNotNull() & ~cs.isin("utf-8", "utf8")
    # feed the UDF NULL for pass-through rows: a When around a pandas UDF
    # still evaluates the UDF over the whole batch, so the skip has to
    # happen in the UDF's INPUT, not around its output
    gated = F.when(needs, F.col(html_col))
    recoded = F.encode(decode_html(gated, cs), "utf-8")
    return corpus.withColumn(
        html_col, F.when(needs, recoded).otherwise(F.col(html_col))
    )
