"""Seen-set deduplication — the crawl engine's "aggregation"
(SURVEY.md §2.5 D1-D3; reference ``src/workload.rs:202-226``).

Reference semantics:

- D1: a URL enters the frontier iff ``seen_list.insert(url)`` is fresh —
  dedup happens at *enqueue* time for both seeds and discovered links, so
  the seen set is "everything ever enqueued", not "everything visited".
- D3: ``filter_urls`` checks incrementally, so duplicates *within one
  batch of links* also collapse, first occurrence kept.
- D2: a URL whose retries are exhausted is (re)inserted into seen — a
  terminal state; it is never revisited.

Spark shape: partial dedup inside the batch (window first-occurrence) then
a left-anti join against the seen table on ``url_hash`` *and* ``url`` (the
hash is the shuffle/join key; the string comparison keeps 64-bit
collisions harmless — at 10^10 URLs a few xxhash64 collisions are
expected). An optional partitioned bloom sidecar (operators/bloom.py)
pre-filters candidates so cold partitions of the seen table are never
probed; a bloom false positive only costs an exact probe, never a drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dedup_within_batch", "anti_join_seen", "SEEN_COLS"]

# ukey is the seen-set key string: the canonical URL in parity mode, the
# SURT key in surt mode (plans/loop.py sets it); url_hash = xxhash64(ukey).
SEEN_COLS = ["url_hash", "ukey"]


def dedup_within_batch(links: DataFrame, order_cols: list) -> DataFrame:
    """D3 — collapse duplicates inside one wave's discovered links, keeping
    the first occurrence in enqueue order (``order_cols``: Columns or
    column-name strings, ascending when given as strings)."""
    order = [F.col(c).asc() if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(*SEEN_COLS).orderBy(*order)
    return (
        links.withColumn("__occ", F.row_number().over(w))
        .filter(F.col("__occ") == 1)
        .drop("__occ")
    )


def anti_join_seen(
    links: DataFrame, seen: DataFrame, bloom_probe=None, materializer=None
) -> DataFrame:
    """D1 — keep links whose canonical URL was never enqueued.

    ``bloom_probe``: optional ``Column``-producing callable
    ``f(url_hash_col) -> BooleanColumn`` ("maybe seen"); rows it clears as
    definitely-new bypass the exact anti-join shuffle entirely and are
    unioned back in (see operators/bloom.py).

    ``materializer``: optional ``f(df) -> df`` that pins the flagged frame
    so the probe runs once per row (the crawl loop passes its TableIO
    materialize). The default is ``localCheckpoint(eager=True)`` — note
    that leaves cached blocks resident until the returned frame is
    garbage-collected and is not recomputable on executor loss; library
    callers that care should supply their own materializer (e.g. a
    persist they later unpersist, or a durable write+read).
    """
    if bloom_probe is not None:
        # Flag ONCE over a materialized frame, then split on the flag
        # column. Filtering an unmaterialized ``links`` pipeline on
        # probe/~probe would re-run its whole upstream plan (and the probe
        # UDF) twice — measured at 4.4× wave cost in the crawl loop, which
        # uses the same pattern via its durable materializer
        # (plans/loop.py, "links_flagged").
        if materializer is None:
            materializer = lambda df: df.localCheckpoint(eager=True)
        flagged = materializer(
            links.withColumn("__maybe", bloom_probe(F.col("url_hash")))
        )
        maybe = flagged.filter(F.col("__maybe")).drop("__maybe")
        fresh = flagged.filter(~F.col("__maybe")).drop("__maybe")
        checked = maybe.join(seen.select(*SEEN_COLS), on=SEEN_COLS, how="left_anti")
        return fresh.unionByName(checked)
    return links.join(seen.select(*SEEN_COLS), on=SEEN_COLS, how="left_anti")
