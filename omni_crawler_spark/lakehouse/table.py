"""SnapshotTable: append-only parquet table with atomic JSON-manifest
snapshots (Iceberg stand-in; see package docstring).

Layout:

    <root>/data/<uuid>/part-*.parquet     one dir per committed write
    <root>/snapshots/00000001.json        manifest: list of data dirs
    <root>/snapshots/00000002.json        + commit metadata

A snapshot manifest lists the data directories visible at that
version. Commits are atomic via write-temp + ``os.rename``. Readers
resolve the latest manifest (or an explicit ``version``) and read
exactly those files — a partially-written data dir that never got a
manifest is invisible, which is what makes kill-anywhere resume safe.

Idempotent commits: a write tagged with ``op_id`` is skipped if any
existing snapshot already carries that op_id — replaying a crawl
cycle after a crash cannot double-append (mirrors Iceberg's
idempotent MERGE pattern, SURVEY §4.2 checkpoint-resume row).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str, name: str = "table"):
        self.root = root
        self.name = name
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------

    def _snapshot_files(self) -> list[str]:
        d = os.path.join(self.root, "snapshots")
        return sorted(f for f in os.listdir(d) if f.endswith(".json"))

    def current_version(self) -> int:
        files = self._snapshot_files()
        return int(files[-1].split(".")[0]) if files else 0

    def _read_manifest(self, version: int) -> dict:
        path = os.path.join(self.root, "snapshots", f"{version:08d}.json")
        with open(path) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        return [self._read_manifest(int(f.split(".")[0]))
                for f in self._snapshot_files()]

    def committed_op_ids(self) -> set[str]:
        return {
            m.get("op_id")
            for m in self.history()
            if m.get("op_id") is not None
        }

    # -- writes --------------------------------------------------------------

    def _commit(self, data_dirs: list[str], op: str, op_id: str | None) -> int:
        version = self.current_version() + 1
        manifest = {
            "version": version,
            "op": op,
            "op_id": op_id,
            "data_dirs": data_dirs,
        }
        final = os.path.join(self.root, "snapshots", f"{version:08d}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, final)  # atomic publish
        return version

    def append(self, df: DataFrame, op_id: str | None = None) -> int:
        """Append df as a new snapshot. No-op if op_id already committed."""
        if op_id is not None and op_id in self.committed_op_ids():
            return self.current_version()
        new_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(new_dir)
        prev = (
            self._read_manifest(self.current_version())["data_dirs"]
            if self.current_version()
            else []
        )
        return self._commit(prev + [new_dir], "append", op_id)

    def overwrite(self, df: DataFrame, op_id: str | None = None) -> int:
        if op_id is not None and op_id in self.committed_op_ids():
            return self.current_version()
        new_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(new_dir)
        return self._commit([new_dir], "overwrite", op_id)

    # -- reads ---------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the table at ``version`` (time travel) or latest."""
        version = version if version is not None else self.current_version()
        if version == 0:
            raise ValueError(f"table {self.name} has no snapshots yet")
        dirs = self._read_manifest(version)["data_dirs"]
        return spark.read.parquet(*dirs)

    def is_empty(self) -> bool:
        return self.current_version() == 0
