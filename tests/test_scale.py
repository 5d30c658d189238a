"""Scale-technique queries (analytics/registry_scale.py): the oracle
verifies the ANSWER is unchanged by each technique; these tests pin
the PHYSICAL PLAN — the part the technique exists to change."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from omni_crawler_spark.analytics import REGISTRY
from omni_crawler_spark.analytics.registry_scale import _bucketed_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark):
    """The core claim: both sides bucketed by the join key => the
    sort-merge join runs with ZERO Exchange — no shuffle anywhere in
    the join subtree (the registry query's later 5-row groupBy/orderBy
    exchanges are not part of this claim, so the bare join is planned
    here)."""
    li = _bucketed_table(spark, SF, "lineitem", "l_orderkey")
    o = _bucketed_table(spark, SF, "orders", "o_orderkey")
    j = (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "o_orderpriority")
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # and the join result itself matches the unbucketed plain join
    plain = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "o_orderpriority")
    )
    assert j.count() == plain.count()
    assert j.exceptAll(plain).isEmpty()


def test_bucketed_join_registry_query_exchanges_are_post_agg_only(spark):
    """In the full registry query the only Exchanges are for the
    5-row group-by/order-by AFTER the join — never a
    hashpartitioning on the join key."""
    plan = _plan(REGISTRY["join_bucketed_colocated"].build(spark, SF))
    assert "SortMergeJoin" in plan
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan


def test_partition_prune_plan(spark):
    """The one-day filter must land in PartitionFilters (directory
    pruning before I/O), and the pruned scan must read exactly one of
    the ~30 day-partitions."""
    df = REGISTRY["layout_partition_prune"].build(spark, SF)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "event_date" in plan
    # count partition dirs actually selected: scan node reports it
    import re

    m = re.search(r"partition count: (\d+)", plan) or re.search(
        r"PartitionCount: (\d+)", plan
    )
    if m:  # format varies by version; the filter assertions above
        assert int(m.group(1)) == 1  # are the load-bearing check
    assert df.count() > 0


def test_salted_topk_matches_unsalted(spark):
    """Salting must not change the answer: two-phase salted top-k ==
    single-window top-k, row for row."""
    got = {
        (r.event_type, r.event_id, r.rk)
        for r in REGISTRY["window_topk_salted"].build(spark, SF).collect()
    }
    e = spark.read.parquet(f"{SF}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    want = {
        (r.event_type, r.event_id, r.rk)
        for r in e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == want


def test_salted_topk_plan_has_two_phases(spark):
    plan = _plan(REGISTRY["window_topk_salted"].build(spark, SF))
    assert plan.count("Window") >= 2
    assert "_salt" in plan


def test_q3_pushes_date_filters_to_scan(spark):
    """Both date predicates must reach the parquet scans as
    PushedFilters — at 100 TB the lineitem scan skips every pre-cutoff
    row group via footer min/max."""
    plan = _plan(REGISTRY["tpch_q3_shipping"].build(spark, SF))
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "IsNotNull(c_mktsegment" in plan or "EqualTo(c_mktsegment" in plan


def test_bucketed_layout_spec_mismatch_triggers_rewrite(spark):
    """Existing files under a DIFFERENT bucket spec must be rewritten,
    not re-registered (a wrong declared spec silently mis-joins)."""
    import json
    import os

    from omni_crawler_spark.analytics import registry_scale as RS

    from omni_crawler_spark.analytics.registry import cache_tag

    li_count = RS._bucketed_table(spark, SF, "lineitem", "l_orderkey").count()
    tag = cache_tag(SF)
    path = f"{RS._BUCKET_ROOT}/{tag}/lineitem"
    marker = f"{path}/_layout_spec.json"
    assert json.load(open(marker)) == {
        "n_buckets": RS._N_BUCKETS,
        "key": "l_orderkey",
    }
    # corrupt the spec -> next call must rewrite (marker restored)
    json.dump({"n_buckets": 99, "key": "x"}, open(marker, "w"))
    spark.sql(f"DROP TABLE IF EXISTS ocs_b_{tag}_lineitem")
    li2 = RS._bucketed_table(spark, SF, "lineitem", "l_orderkey")
    assert json.load(open(marker))["n_buckets"] == RS._N_BUCKETS
    assert li2.count() == li_count


def test_aqe_splits_skewed_join(spark):
    """The engine's AQE config must actually split a skewed join at
    runtime: 90%-hot-key join planned as SMJ shows skew=true in the
    final adaptive plan (this is the safety net behind every shuffled
    join in the registry when a key goes Zipf at 100 TB)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        big = spark.range(400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias(
                "payload"
            ),
        )
        right = spark.range(50_000).select(
            F.col("id").alias("k"),
            F.col("id").cast("string").alias("tag"),
        )
        j = big.join(right, "k").groupBy().count()
        j.collect()  # finalize the adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)
