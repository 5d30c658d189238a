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


def select_export_columns(
    df: DataFrame,
    required: list[str],
    optional: list[str] | None = None,
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Schema-drift-tolerant projection, mirroring the reference's
    information_schema column probing (data_exporter.py:259-293):
    ``required`` columns must exist (loud KeyError otherwise — the
    export contract), ``optional`` columns are included only when the
    table actually has them, and ``defaults`` maps a column name to a
    typed literal SQL expression used when the column is absent (the
    reference's ``0 as content_length`` fallback). Catalyst prunes
    the scan to exactly the selected columns."""
    have = set(df.columns)
    missing = [c for c in required if c not in have]
    if missing:
        raise KeyError(
            f"export requires columns {missing} absent from schema "
            f"{sorted(have)}"
        )
    cols = [F.col(c) for c in required]
    for c in optional or []:
        if c in have:
            cols.append(F.col(c))
    for c, expr in (defaults or {}).items():
        if c not in have:
            cols.append(F.expr(expr).alias(c))
        elif c not in (optional or []) and c not in required:
            cols.append(F.col(c))
    return df.select(*cols)


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
