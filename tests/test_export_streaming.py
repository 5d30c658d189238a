"""Export sinks (S9-S11) + Structured Streaming pipeline tests."""

from __future__ import annotations

import csv
import glob
import json
import os
import time

from pyspark.sql import functions as F

from omni_crawler_spark.sources.export import export_csv, export_dump, export_json
from omni_crawler_spark.streaming import stream_demo as SD


def test_export_csv_joins_arrays(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["a", "b"], "x"), (2, ["c"], "y")],
        "id long, authors array<string>, t string",
    )
    out = str(tmp_path / "csv")
    export_csv(df, out)
    f = glob.glob(out + "/*.csv")[0]
    rows = list(csv.DictReader(open(f)))
    assert {r["authors"] for r in rows} == {"a;b", "c"}


def test_export_json_envelope(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id long, t string")
    out = str(tmp_path / "json")
    export_json(df, out, metadata={"source": "test"})
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["record_count"] == 1 and meta["source"] == "test"
    lines = []
    for f in glob.glob(out + "/part-*"):
        lines += [json.loads(line) for line in open(f) if line.strip()]
    assert lines == [{"id": 1, "t": "x"}]


def test_export_dump_multi_table(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(5)
    prefix = str(tmp_path / "dump")
    export_dump({"documents": docs, "events": ev}, prefix)
    assert glob.glob(prefix + "/documents/part-*")
    assert glob.glob(prefix + "/events/part-*")




def test_select_export_columns_schema_drift(spark):
    """The reference's exporter survives missing columns
    (data_exporter.py:259-293): optional columns appear only when the
    table has them, absent default columns get their typed fallback,
    and a missing REQUIRED column fails loudly."""
    import pytest

    from omni_crawler_spark.sources.export import select_export_columns

    full = spark.createDataFrame(
        [(1, "t", "pos", 42)],
        "article_id long, title string, sentiment_label string, "
        "content_length long",
    )
    migrated = spark.createDataFrame(
        [(2, "u")], "article_id long, title string"
    )
    kw = dict(
        required=["article_id", "title"],
        optional=["sentiment_label"],
        defaults={"content_length": "CAST(0 AS BIGINT) AS content_length"},
    )
    a = select_export_columns(full, **kw)
    assert a.columns == [
        "article_id", "title", "sentiment_label", "content_length"
    ]
    assert a.collect()[0].content_length == 42
    b = select_export_columns(migrated, **kw)
    assert b.columns == ["article_id", "title", "content_length"]
    assert b.collect()[0].content_length == 0
    with pytest.raises(KeyError, match="export requires"):
        select_export_columns(migrated, required=["article_id", "url"])



def test_streaming_windowed_counts(spark, tmp_path, sf_dir):
    """File-stream the events table, drain with availableNow, and
    check the windowed result equals the batch equivalent."""
    events_dir = str(tmp_path / "events_in")
    os.makedirs(events_dir)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch.write.mode("overwrite").parquet(events_dir)

    stream_df = SD.windowed_event_counts(spark, events_dir)
    q = SD.run_available_now(
        stream_df, "win_counts", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_type, SUM(cnt) AS n FROM win_counts GROUP BY event_type"
    ).collect()
    expected = {
        r.event_type: r.n
        for r in batch.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {r.event_type: r.n for r in got} == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    events_dir = str(tmp_path / "dups_in")
    os.makedirs(events_dir)
    df = spark.createDataFrame(
        [
            (1, "2025-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (1, "2025-01-01 10:30:00", 1, "click", 1.0, "{}"),  # dup id in window
            (2, "2025-01-01 11:00:00", 2, "view", 2.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(events_dir)
    dedup = SD.dedup_within_watermark(spark, events_dir, ["event_id"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    assert sorted(r.event_id for r in got) == [1, 2]
