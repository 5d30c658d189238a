"""Custom stateful streaming operator: alert cooldown with
``applyInPandasWithState`` (SURVEY T3; the prompt's 'custom stateful
operators' path).

State = last_fired timestamp per rule_id, kept in the streaming state
store across micro-batches; an alert fires iff
``ts >= last_fired + cooldown`` — exactly the reference's gate
(src/alerts/alert_engine.py:120-124), but exactly-once across
restarts via the checkpoint instead of an in-memory dict.

Batch twin: streaming/alerts.py::cooldown_greedy (same semantics,
verified equal in tests/test_stateful_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("rule_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("metric", StringType()),
    ]
)

# state: last_fired epoch micros (long survives the state store cleanly)
STATE_SCHEMA = StructType([StructField("last_fired_us", LongType())])


def _cooldown_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs))
    if rows.empty:
        return
    rows = rows.sort_values(["ts", "value"]).reset_index(drop=True)
    cooldown_us = int(rows["cooldown_minutes"].iloc[0]) * 60_000_000
    (last_us,) = state.get if state.exists else (None,)
    fired = []
    for r in rows.itertuples(index=False):
        ts_us = int(pd.Timestamp(r.ts).value // 1000)
        if last_us is None or ts_us >= last_us + cooldown_us:
            fired.append(
                {"rule_id": r.rule_id, "ts": r.ts, "value": r.value,
                 "metric": r.metric}
            )
            last_us = ts_us
    if last_us is not None:
        state.update((last_us,))
    if fired:
        yield pd.DataFrame(fired)


def streaming_alert_cooldown(fired_stream: DataFrame) -> DataFrame:
    """fired_stream: streaming DF of triggered alerts with columns
    (rule_id, ts, value, metric, cooldown_minutes) → cooldown-gated
    alerts, state kept per rule across micro-batches."""
    return fired_stream.groupBy("rule_id").applyInPandasWithState(
        _cooldown_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
