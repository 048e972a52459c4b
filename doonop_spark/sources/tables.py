"""Snapshot table I/O — the engine's state store (SURVEY.md §2.9; north_rule
checkpoint/resume).

The reference keeps all crawl state in driver RAM and loses it on exit
(``src/workload.rs:25-35``); graceful shutdown merely drains in-flight work
(``src/main.rs:41-48``). Our engine's cross-wave state (frontier, seen,
results, metrics) lives in *tables* so a crawl is resumable at wave
granularity.

Two interchangeable backends behind one interface:

- :class:`MemoryTableIO` — state is held as eagerly local-checkpointed
  DataFrames (lineage cut per wave so iterative plans don't snowball).
  Used by tests and the throughput bench.
- :class:`SnapshotTableIO` — every wave writes parquet snapshot
  directories ``{root}/{name}/iter={i}`` plus a JSON manifest of scalar
  state (seq counter, collected count, iteration). ``resume()`` restores
  the exact pre-wave state — kill the driver at any point and the next
  run continues from the last complete wave. This is the
  parquet-directory stand-in for an Iceberg snapshot chain: no Iceberg
  catalog/jars ship in this sandbox, so Iceberg support is a config
  switch (``table_format="iceberg"``) that raises until the runtime has
  ``spark.sql.catalog.*`` configured for Iceberg.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TableIO", "MemoryTableIO", "SnapshotTableIO", "open_table_io"]


class TableIO:
    """Interface: materialize per-wave state, append event tables, persist
    scalar state."""

    def materialize(self, df: DataFrame, name: str, iteration: int) -> DataFrame:
        raise NotImplementedError

    def append(self, df: DataFrame, name: str, iteration: int, eager: bool = True) -> None:
        """``eager=False`` permits a lazy append for tables only read after
        the loop ends (results/metrics) — the in-memory backend then skips
        the per-wave checkpoint job; durable backends always write."""
        raise NotImplementedError

    def read_appended(self, spark: SparkSession, name: str) -> DataFrame | None:
        raise NotImplementedError

    def save_state(self, state: dict[str, Any]) -> None:
        raise NotImplementedError

    def load_state(self) -> dict[str, Any] | None:
        raise NotImplementedError

    def load_table(self, spark: SparkSession, name: str, iteration: int) -> DataFrame:
        raise NotImplementedError

    def prune_appends(self, name: str, max_iteration: int) -> None:
        """Drop appended parts with iteration >= max_iteration — orphans
        from a wave that died between append and state commit. No-op for
        in-memory state (no resume there)."""

    def drop_appends_before(self, name: str, iteration: int) -> None:
        """Drop appended parts with iteration < iteration — used after a
        compaction wave wrote a consolidated part at ``iteration`` that
        supersedes all earlier parts. Called AFTER the state commit, so a
        crash in between leaves stale parts alongside the consolidated one:
        harmless for the seen set (duplicate rows on the anti-join/bloom
        build side never change the result) and swept by the next
        compaction."""


class MemoryTableIO(TableIO):
    """In-memory backend: localCheckpoint cuts lineage; appends accumulate
    as a list of checkpointed frames unioned on read."""

    def __init__(self) -> None:
        self._appended: dict[str, list[tuple[int, DataFrame]]] = {}
        self._state: dict[str, Any] | None = None
        self._live: dict[str, DataFrame] = {}

    def materialize(self, df: DataFrame, name: str, iteration: int) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        self._live[name] = out
        return out

    def append(self, df: DataFrame, name: str, iteration: int, eager: bool = True) -> None:
        # a lazy append must still be valid after its upstream _live entry
        # is replaced: it holds its own reference to the checkpointed RDDs
        # it derives from, which keeps their blocks alive
        self._appended.setdefault(name, []).append(
            (iteration, df.localCheckpoint(eager=True) if eager else df)
        )

    def read_appended(self, spark: SparkSession, name: str) -> DataFrame | None:
        frames = [f for _, f in self._appended.get(name, [])]
        if not frames:
            return None
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def drop_appends_before(self, name: str, iteration: int) -> None:
        self._appended[name] = [
            (i, f) for i, f in self._appended.get(name, []) if i >= iteration
        ]

    def save_state(self, state: dict[str, Any]) -> None:
        self._state = dict(state)

    def load_state(self) -> dict[str, Any] | None:
        return self._state

    def load_table(self, spark: SparkSession, name: str, iteration: int) -> DataFrame:
        return self._live[name]


class SnapshotTableIO(TableIO):
    """Parquet snapshot-directory backend with exact resume."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str, iteration: int) -> str:
        return os.path.join(self.root, name, f"iter={iteration}")

    def materialize(self, df: DataFrame, name: str, iteration: int) -> DataFrame:
        path = self._dir(name, iteration)
        if os.path.exists(path):
            shutil.rmtree(path)  # partial write from a killed run
        df.write.mode("overwrite").parquet(path)
        out = df.sparkSession.read.parquet(path)
        # snapshots older than the previous wave are dead weight; keep two
        # (current + previous) so a crash mid-write never loses state.
        base = os.path.join(self.root, name)
        snaps = sorted(
            (d for d in os.listdir(base) if d.startswith("iter=")),
            key=lambda d: int(d.split("=")[1]),
        )
        for stale in snaps[:-2]:
            shutil.rmtree(os.path.join(base, stale), ignore_errors=True)
        return out

    def append(self, df: DataFrame, name: str, iteration: int, eager: bool = True) -> None:
        path = os.path.join(self.root, name, f"part_iter={iteration}")
        df.write.mode("overwrite").parquet(path)  # durable: always written

    def read_appended(self, spark: SparkSession, name: str) -> DataFrame | None:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return None
        parts = [os.path.join(base, d) for d in os.listdir(base) if d.startswith("part_iter=")]
        if not parts:
            return None
        return spark.read.parquet(*parts)

    def save_state(self, state: dict[str, Any]) -> None:
        tmp = os.path.join(self.root, "_state.json.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, os.path.join(self.root, "state.json"))  # atomic

    def load_state(self) -> dict[str, Any] | None:
        path = os.path.join(self.root, "state.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def load_table(self, spark: SparkSession, name: str, iteration: int) -> DataFrame:
        return spark.read.parquet(self._dir(name, iteration))

    def prune_appends(self, name: str, max_iteration: int) -> None:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return
        for d in os.listdir(base):
            if d.startswith("part_iter=") and int(d.split("=")[1]) >= max_iteration:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    def drop_appends_before(self, name: str, iteration: int) -> None:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return
        for d in os.listdir(base):
            if d.startswith("part_iter=") and int(d.split("=")[1]) < iteration:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def open_table_io(kind: str = "memory", root: str | None = None) -> TableIO:
    if kind == "memory":
        return MemoryTableIO()
    if kind == "snapshot":
        if root is None:
            raise ValueError("snapshot TableIO needs a root directory")
        return SnapshotTableIO(root)
    if kind == "iceberg":
        raise NotImplementedError(
            "Iceberg catalog jars are not on this runtime's classpath; "
            "configure spark.sql.catalog.* for Iceberg and add an "
            "IcebergTableIO (same interface: snapshot per wave = Iceberg "
            "snapshot, resume = time-travel to last committed snapshot)."
        )
    raise ValueError(f"unknown TableIO kind: {kind}")
