"""Snapshot-committed parquet tables — the sandbox stand-in for Iceberg.

No Iceberg runtime jar ships in this environment, so this package
provides the subset of table-format behavior the engine needs:
atomic snapshot commits, append/overwrite, time travel by snapshot id,
and idempotent commits keyed by (cycle_id, phase) for checkpoint
resume. On a real cluster the same call sites map 1:1 onto Iceberg
(``writeTo(...).append()`` / ``MERGE INTO`` / ``VERSION AS OF``).
"""

from omni_crawler_spark.lakehouse.table import SnapshotTable  # noqa: F401
