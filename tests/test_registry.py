"""Smoke + shape tests for the analytics query registry (SURVEY §2).

Full value-level verification against DuckDB runs in
tools/check_correctness.py (and in the driver's sf0.01 gate); here we
assert structural invariants at sf0.001 so pytest stays fast.
"""

from __future__ import annotations

import duckdb
import pytest

from omni_crawler_spark.analytics import REGISTRY
from omni_crawler_spark.analytics.tables import TABLE_NAMES


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_and_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    # physical-plan lint (north rule, tools/plan_lint.py): Python only
    # Arrow-batched, cross joins only with a broadcast bounded side
    from tools.plan_lint import lint

    assert lint(sdf) == [], f"{name}: forbidden physical nodes"
    pdf = sdf.toPandas()
    assert pdf is not None
    if q.oracle is None:
        return
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    odf = con.execute(q.oracle).fetchdf()
    assert len(pdf) == len(odf), f"{name}: row count mismatch"
    assert sorted(c.lower() for c in pdf.columns) == sorted(
        c.lower() for c in odf.columns
    ), f"{name}: schema mismatch"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_driver_window_covers_unchecked_queries():
    """The correctness driver checks the FIRST 50 queries() entries
    per round. Every name in the rotation priority list (this round's
    changed queries + the stalest prior driver greens) must sit
    inside that window."""
    from omni_crawler_spark.analytics import _DRIVER_WINDOW_PRIORITY

    names = list(REGISTRY)
    window = set(names[:50])
    expected = [n for n in _DRIVER_WINDOW_PRIORITY if n in REGISTRY]
    missing = [n for n in expected if n not in window]
    assert not missing, f"outside the driver window: {missing}"
    # and the priority prefix is exactly the head of the registry
    assert names[: len(expected)] == expected


def test_budget_allocate_waterfill_invariants(spark, sf_dir):
    """Exact integer max-min fairness: the quotas must exhaust the
    budget, never exceed pending, and differ by at most 1 across
    throttled hosts (the water level)."""
    rows = (
        REGISTRY["crawl_budget_allocate"].build(spark, sf_dir).collect()
    )
    assert rows, "allocation produced no hosts"
    total = sum(r.pending for r in rows)
    b = total * 6 // 10
    assert sum(r.quota for r in rows) == b, "budget not exhausted exactly"
    for r in rows:
        assert 0 <= r.quota <= r.pending
        if r.status == "full":
            assert r.quota == r.pending
    throttled = [r.quota for r in rows if r.status == "throttled"]
    assert throttled, "60% budget must throttle someone"
    assert max(throttled) - min(throttled) <= 1, "water level not flat"
    # max-min: every fully-served host's demand sits at or below the
    # throttled water level (else serving it fully would be unfair)
    if throttled:
        for r in rows:
            if r.status == "full":
                assert r.pending <= max(throttled) + 1
