"""Atomic per-round state checkpointing (Iceberg-shaped, parquet-manifest backed).

Semantics required by the north rule: every crawl round commits frontier /
seen-delta / fetch_log / metrics ATOMICALLY, and a killed run resumes from the
last committed round reproducing identical state (reference analog: the
filename seen-set makes re-runs idempotent, dags/common/base_source_dag.py:96,
107-114 + mode='failed').

The sandbox image has no Iceberg jars (guide §Sources), so the store is a thin
abstraction with the same commit semantics implemented on plain parquet:

    root/<table>/round=NNNNNN/*.parquet     # data, written FIRST
    root/_manifests/NNNNNN.json             # commit marker, renamed into place LAST

A round is committed iff its manifest exists; data directories without a
manifest are garbage from a killed run and are ignored (and cleaned on the next
commit attempt). `os.rename` within a directory is atomic on POSIX — the same
single-atomic-swap trick Iceberg uses with its metadata pointer. On a real
cluster, swap this class for Iceberg `writeTo(...).append()` + snapshot tags;
every caller goes through this interface, nothing else changes.

Tables are partitioned by round (directory) and data files are laid out by the
seen-set bucket column where applicable, so reads prune by round and joins can
reuse the bucket layout.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # --- manifest plumbing ---

    def _manifest_path(self, round_id: int) -> str:
        return os.path.join(self.root, "_manifests", f"{round_id:06d}.json")

    def committed_rounds(self) -> list[int]:
        d = os.path.join(self.root, "_manifests")
        return sorted(
            int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
        )

    def last_committed_round(self) -> int | None:
        r = self.committed_rounds()
        return r[-1] if r else None

    def manifest(self, round_id: int) -> dict[str, Any]:
        with open(self._manifest_path(round_id)) as f:
            return json.load(f)

    # --- write path ---

    def _table_round_dir(self, table: str, round_id: int) -> str:
        return os.path.join(self.root, table, f"round={round_id:06d}")

    def commit_round(
        self,
        round_id: int,
        tables: dict[str, DataFrame],
        extra_meta: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Write all tables for a round, then atomically publish the manifest.

        If the process dies mid-write, no manifest exists → the round never
        happened; rerunning the round overwrites the orphan directories.
        """
        if os.path.exists(self._manifest_path(round_id)):
            raise ValueError(f"round {round_id} already committed")
        for name, df in tables.items():
            path = self._table_round_dir(name, round_id)
            if os.path.exists(path):
                shutil.rmtree(path)  # orphan from a killed run
            df.write.mode("overwrite").parquet(path)
        meta = {"round_id": round_id, "tables": sorted(tables), **(extra_meta or {})}
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_manifests"), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, self._manifest_path(round_id))  # the atomic commit point
        return meta

    # --- sketch sidecars (Iceberg-style puffin analog: bloom bytes per round) ---

    def save_bloom(self, round_id: int, data: bytes) -> None:
        """Persist the cumulative seen-set bloom alongside the round. Written
        after the manifest; a round whose bloom is missing (kill in between)
        falls back to a one-time rebuild from the seen-set — never wrong,
        because the bloom is an optimization tier only."""
        path = os.path.join(self.root, "_manifests", f"{round_id:06d}.bloom")
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_manifests"), suffix=".btmp")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.rename(tmp, path)

    def load_bloom(self, round_id: int) -> bytes | None:
        path = os.path.join(self.root, "_manifests", f"{round_id:06d}.bloom")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    # --- read path (only committed rounds are visible) ---

    def has_table(self, table: str, round_id: int) -> bool:
        """True iff `round_id` is committed AND wrote this table (older stores
        may predate a table's existence)."""
        return os.path.exists(self._manifest_path(round_id)) and os.path.exists(
            self._table_round_dir(table, round_id)
        )

    def read_round(self, spark: SparkSession, table: str, round_id: int) -> DataFrame:
        if not os.path.exists(self._manifest_path(round_id)):
            raise ValueError(f"round {round_id} is not committed")
        return spark.read.parquet(self._table_round_dir(table, round_id))

    def read_all(self, spark: SparkSession, table: str, up_to: int | None = None) -> DataFrame | None:
        """Union of a table across all committed rounds (e.g. the full seen-set).

        Reads go through one multi-path parquet scan → a single job with
        partition pruning by directory, not N sequential reads.
        """
        rounds = self.committed_rounds()
        if up_to is not None:
            rounds = [r for r in rounds if r <= up_to]
        paths = [
            self._table_round_dir(table, r)
            for r in rounds
            if os.path.exists(self._table_round_dir(table, r))
        ]
        if not paths:
            return None
        return spark.read.option("basePath", os.path.join(self.root, table)).parquet(*paths)
