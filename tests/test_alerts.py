"""Alert engine tests: rule evaluation + both cooldown flavors; the
greedy cooldown is replayed in pure Python (reference semantics,
alert_engine.py:120-124) and must match exactly."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from omni_crawler_spark.streaming import alerts as A


@pytest.fixture(scope="module")
def metrics(spark):
    base = datetime(2025, 3, 1)
    rows = []
    for i in range(500):
        rows.append(
            (base + timedelta(minutes=7 * i), "error", float((i * 37) % 100))
        )
        rows.append(
            (base + timedelta(minutes=11 * i), "signup", float((i * 13) % 100))
        )
    return spark.createDataFrame(
        rows, "ts timestamp, metric string, value double"
    ).cache()


def test_evaluate_thresholds(spark, metrics):
    fired = A.evaluate(metrics, A.default_rules(spark))
    rows = fired.collect()
    assert rows
    for r in rows:
        if r.rule_id == "r1":
            assert r.value > 90.0
        if r.rule_id == "r3":
            assert r.value < 5.0


def test_cooldown_greedy_matches_python_replay(spark, metrics):
    fired = A.evaluate(metrics, A.default_rules(spark))
    engine = sorted(
        (r.rule_id, r.ts, r.value)
        for r in A.cooldown_greedy(fired).collect()
    )
    # pure-Python replay of last_triggered + cooldown semantics
    by_rule: dict[str, list] = {}
    for r in fired.collect():
        by_rule.setdefault(r.rule_id, []).append(r)
    expected = []
    for rule_id, rows in by_rule.items():
        rows.sort(key=lambda r: (r.ts, r.value))
        last = None
        cd = timedelta(minutes=rows[0].cooldown_minutes)
        for r in rows:
            if last is None or r.ts >= last + cd:
                expected.append((rule_id, r.ts, r.value))
                last = r.ts
    assert engine == sorted(expected)


def test_cooldown_bucket_suppresses(spark, metrics):
    fired = A.evaluate(metrics, A.default_rules(spark))
    bucketed = A.cooldown_bucket(fired)
    assert bucketed.count() <= fired.count()
    # dense case: two fires in the same cooldown bucket → one survives
    dense = spark.createDataFrame(
        [
            ("rX", "n", "crit", "2025-01-01 10:01:00", 99.0, 90.0, 30, "error"),
            ("rX", "n", "crit", "2025-01-01 10:05:00", 98.0, 90.0, 30, "error"),
        ],
        "rule_id string, name string, severity string, ts string, "
        "value double, threshold double, cooldown_minutes int, metric string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert A.cooldown_bucket(dense).count() == 1
    # at most one alert per rule per aligned bucket
    dupes = (
        bucketed.groupBy(
            "rule_id",
            F.floor(
                F.unix_timestamp("ts") / (F.col("cooldown_minutes") * 60)
            ).alias("b"),
        )
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0
