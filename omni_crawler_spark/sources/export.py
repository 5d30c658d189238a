"""Export sinks (SURVEY §2.1 S9/S10/S11).

Mirrors the reference's exporter semantics
(src/api/data_exporter.py): CSV with list columns joined by ';'
(:61-64), JSON articles array with a metadata envelope (:78-106), and
a multi-table dump prefix replacing the in-memory ZIP (:156-194).
Distributed writes — each is a single ``df.write`` job; the
``single_file`` option coalesces for small result exports (the
reference's use case is a download endpoint)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _flatten_arrays(df: DataFrame, sep: str = ";") -> DataFrame:
    """Join every array<string> column with ``sep`` (S9 semantics,
    data_exporter.py:61-64)."""
    for f in df.schema.fields:
        if f.dataType.typeName() == "array":
            df = df.withColumn(f.name, F.concat_ws(sep, F.col(f.name)))
    return df


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    out = _flatten_arrays(df)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


def export_json(
    df: DataFrame, path: str, metadata: dict | None = None,
    single_file: bool = True,
) -> None:
    """JSON-lines articles + a metadata.json envelope next to them
    (the reference's single-document envelope, data_exporter.py:78-106,
    split so the article stream stays line-delimited/splittable)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
    meta = {"export_format": "json", "record_count": df.count()}
    meta.update(metadata or {})
    with open(os.path.join(path, "metadata.json"), "w") as fh:
        json.dump(meta, fh)


def export_dump(tables: dict[str, DataFrame], prefix: str) -> None:
    """S11 — multi-table dump: one JSON dir per table under prefix
    (replaces the in-memory ZIP, data_exporter.py:156-194)."""
    for name, df in tables.items():
        df.write.mode("overwrite").json(os.path.join(prefix, name))
