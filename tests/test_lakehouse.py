"""SnapshotTable (Iceberg stand-in) semantics: atomic commits, time
travel, idempotent op_ids, append vs overwrite."""

from __future__ import annotations

import pytest

from omni_crawler_spark.lakehouse import SnapshotTable


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df1 = spark.range(0, 5)
    df2 = spark.range(5, 8)
    v1 = t.append(df1)
    v2 = t.append(df2)
    assert (v1, v2) == (1, 2)
    assert t.read(spark).count() == 8
    assert t.read(spark, version=v1).count() == 5  # VERSION AS OF analog


def test_overwrite_replaces(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(0, 10))
    t.overwrite(spark.range(0, 3))
    assert t.read(spark).count() == 3
    assert t.read(spark, version=1).count() == 10


def test_idempotent_op_ids(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(0, 5), op_id="op-a")
    v = t.append(spark.range(0, 5), op_id="op-a")  # replay → no-op
    assert v == 1
    assert t.read(spark).count() == 5


def test_read_empty_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    assert t.is_empty()
    with pytest.raises(ValueError):
        t.read(spark)
