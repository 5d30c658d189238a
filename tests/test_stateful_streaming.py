"""applyInPandasWithState cooldown ≡ the batch greedy cooldown."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from omni_crawler_spark.streaming import alerts as A
from omni_crawler_spark.streaming.stateful import streaming_alert_cooldown


def test_streaming_cooldown_matches_batch_greedy(spark, tmp_path, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    metrics = events.select(
        "ts", F.col("event_type").alias("metric"), "value"
    )
    fired = A.evaluate(metrics, A.default_rules(spark)).select(
        "rule_id", "ts", "value", "metric", "cooldown_minutes"
    )
    # one file → one micro-batch → in-batch ordering == batch replay
    src = str(tmp_path / "fired")
    fired.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "rule_id string, ts timestamp, value double, metric string, "
        "cooldown_minutes int"
    ).parquet(src)
    q = (
        streaming_alert_cooldown(stream)
        .writeStream.format("memory")
        .queryName("cooldown_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.rule_id, r.ts, r.value)
        for r in spark.sql("SELECT * FROM cooldown_stream").collect()
    )

    expected = sorted(
        (r.rule_id, r.ts, r.value)
        for r in A.cooldown_greedy(
            A.evaluate(metrics, A.default_rules(spark))
        ).collect()
    )
    assert got == expected and len(got) > 0
