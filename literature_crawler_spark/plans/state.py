"""Snapshot-committed state tables over Parquet (Iceberg-shaped fallback).

The reference checkpoints progress in Redis (frozen ``crawl_list_{task}``
lists reloaded on restart, ``nature_protocol_crawl.py:67-88``; counters in
``task_count_{task}`` hashes). The engine's state tables are instead
snapshot-committed: every wave produces an atomic, immutable snapshot with a
manifest, and restart = read the latest manifest and continue.

This module is the catalog abstraction (SURVEY.md §7.3 hard part 5): in this
sandbox there are no Iceberg jars, so snapshots are Parquet directories plus
JSON manifests with an atomically renamed ``_LATEST`` pointer — the same
commit protocol shape (write files -> write manifest -> swing pointer) that
Iceberg implements. On a cluster, replace SnapshotStore with an Iceberg
catalog: ``commit(mode='append')`` becomes an append snapshot,
``mode='replace'`` an overwrite, and readers use time travel.

Two table modes:
* append — read(id) unions every delta up to id (the ``seen`` set: written
  once, never rewritten; 16 B/row at 10^10 scale).
* replace — read(id) sees only snapshot id (the ``frontier``: status flips
  per wave; at cluster scale this is a MERGE, not a rewrite).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ paths ----
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _sdir(self, table: str, sid: int) -> str:
        return os.path.join(self._tdir(table), f"s{sid:06d}")

    def _manifest_path(self, table: str, sid: int) -> str:
        return os.path.join(self._tdir(table), f"s{sid:06d}.json")

    # ---------------------------------------------------------- catalog ----
    def snapshots(self, table: str) -> list[dict]:
        tdir = self._tdir(table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for name in sorted(os.listdir(tdir)):
            if name.endswith(".json") and name.startswith("s"):
                with open(os.path.join(tdir, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["id"])

    def latest(self, table: str) -> dict | None:
        ptr = os.path.join(self._tdir(table), "_LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            sid = int(f.read().strip())
        with open(self._manifest_path(table, sid)) as f:
            return json.load(f)

    # ----------------------------------------------------------- commit ----
    def commit(
        self,
        table: str,
        df: DataFrame,
        mode: str = "append",
        wave: int | None = None,
        meta: dict | None = None,
    ) -> int:
        """Atomic snapshot commit: data dir -> manifest -> pointer rename."""
        assert mode in ("append", "replace")
        prev = self.latest(table)
        sid = (prev["id"] + 1) if prev else 0
        data_dir = self._sdir(table, sid)
        df.write.mode("overwrite").parquet(data_dir)
        manifest = {
            "id": sid,
            "table": table,
            "mode": mode,
            "wave": wave,
            "parent": prev["id"] if prev else None,
            "meta": meta or {},
        }
        with open(self._manifest_path(table, sid), "w") as f:
            json.dump(manifest, f)
        tmp = os.path.join(self._tdir(table), "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, os.path.join(self._tdir(table), "_LATEST"))
        return sid

    # ------------------------------------------------------------- read ----
    def read(self, spark: SparkSession, table: str, snapshot_id: int | None = None) -> DataFrame | None:
        """Read table state as of a snapshot (default: latest).

        append tables: union of all delta dirs with id <= snapshot_id.
        replace tables: the single snapshot dir.
        """
        manifests = self.snapshots(table)
        if not manifests:
            return None
        if snapshot_id is None:
            latest = self.latest(table)
            if latest is None:
                return None
            snapshot_id = latest["id"]
        upto = [m for m in manifests if m["id"] <= snapshot_id]
        if not upto:
            return None
        head = upto[-1]
        if head["mode"] == "replace":
            return spark.read.parquet(self._sdir(table, head["id"]))
        dirs = [self._sdir(table, m["id"]) for m in upto if m["mode"] == "append"]
        return spark.read.parquet(*dirs)

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)

    def truncate_after(self, table: str, snapshot_id: int) -> None:
        """Roll back to ``snapshot_id`` (crash-recovery / testing aid)."""
        for m in self.snapshots(table):
            if m["id"] > snapshot_id:
                shutil.rmtree(self._sdir(table, m["id"]), ignore_errors=True)
                os.remove(self._manifest_path(table, m["id"]))
        tmp = os.path.join(self._tdir(table), "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp, os.path.join(self._tdir(table), "_LATEST"))
