"""Scale-technique queries: the named 100 TB execution patterns as
oracle-paired, plan-asserted operators.

The brief's scale toolbox — salting for skewed keys, bucketing for
co-located (shuffle-free) joins, partition layout for pruning — each
expressed as a registry query whose RESULT is verified against DuckDB
(the technique must not change the answer) and whose PHYSICAL PLAN is
pinned by tests/test_scale.py (the technique must actually remove the
shuffle / prune the partitions it claims to).

Reference parity: the reference has no distributed execution layer at
all — its "scale technique" is a single asyncio semaphore
(src/orchestrator/omni_orchestrator.py). These queries are the Spark
answers to the problems it would hit at 10^10 rows.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from omni_crawler_spark.analytics.registry import (
    _ORACLE_SUM_DBL,
    _t,
    cache_root,
    dsum,
    register,
)

# ---------------------------------------------------------------------------
# Salted two-phase per-hot-key top-k
# ---------------------------------------------------------------------------

_SALTS = 16
_TOPK = 5


@register(
    "window_topk_salted",
    f"""
    SELECT event_type, event_id, value, rk FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rk
      FROM events
    ) WHERE rk <= {_TOPK}
    ORDER BY event_type, rk
    """,
    doc="per-hot-key top-k via two-phase SALTING: events has only 5 "
    "event_type values, so a plain per-key window sends 1/5 of the "
    "whole table through one task — the canonical skew straggler at "
    "10^10 rows. Phase 1 partitions by (key, xxhash64(id) % 16): 16x "
    "the parallelism, each sub-partition keeps its local top-k; phase "
    "2 ranks the <= 16*k survivors per key (tiny). The salt is "
    "deterministic (hash of the row id, no RNG) so the result is "
    "partitioning-independent, and the oracle is the UNSALTED "
    "single-window SQL — proving the technique changes the plan, not "
    "the answer. Same salting pattern as the frontier's host lanes "
    "(frontier/politeness.py)",
)
def window_topk_salted(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    salted = e.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALTS))
    )
    w1 = Window.partitionBy("event_type", "_salt").orderBy(
        F.desc("value"), "event_id"
    )
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= _TOPK)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _TOPK)
        .orderBy("event_type", "rk")
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join (shuffle-free sort-merge)
# ---------------------------------------------------------------------------

_N_BUCKETS = 8
_BUCKET_ROOT = "/tmp/ocs_bucketed"


def _bucketed_table(spark, sf_dir, name: str, key: str):
    """Materialize ``name`` bucketed+sorted by ``key`` (idempotent per
    (sf_dir, table): re-registers from the existing parquet when the
    catalog entry and files are already there).

    This is the sandbox stand-in for maintaining the big fact tables
    bucket-partitioned in the lakehouse: pay ONE layout shuffle at
    ingest, then every orderkey-equi-join for the table's lifetime is
    exchange-free. At 100 TB the ingest shuffle amortizes across every
    downstream join/agg on the same key.
    """
    import json

    root = cache_root(_BUCKET_ROOT, sf_dir)
    tag = os.path.basename(root)
    tbl = f"ocs_b_{tag}_{name}"
    path = f"{root}/{name}"
    # layout-spec marker: files written under a different bucket spec
    # must NOT be re-registered under this one — Spark trusts the
    # declared bucketing, so a mismatch silently mis-joins
    spec = {"n_buckets": _N_BUCKETS, "key": key}
    marker = f"{path}/_layout_spec.json"
    have_files = (
        os.path.isdir(path)
        and any(f.endswith(".parquet") for f in os.listdir(path))
        and os.path.isfile(marker)
        and json.load(open(marker)) == spec
    )
    if spark.catalog.tableExists(tbl) and have_files:
        return spark.table(tbl)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    if have_files:
        # files survive from an earlier session but the in-memory
        # catalog forgot the table — re-register the existing layout
        # instead of re-paying the ingest shuffle (Spark's bucketed
        # file names carry the bucket id, so the metadata is sound)
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in _t(spark, sf_dir, name).schema.fields
        )
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {_N_BUCKETS} BUCKETS LOCATION '{path}'"
        )
    else:
        (
            _t(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", path)
            .bucketBy(_N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
        # atomic publish: a concurrent session probing have_files must
        # never read a half-written spec (lakehouse marker contract)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(spec, fh)
        os.replace(tmp, marker)
    return spark.table(tbl)


@register(
    "join_bucketed_colocated",
    f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {_ORACLE_SUM_DBL.format(c="l.l_extendedprice")} AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    doc="the co-located big-big join: lineitem and orders are stored "
    f"bucketed by orderkey ({_N_BUCKETS} buckets, sorted within "
    "bucket), so the sort-merge join needs NO Exchange on either side "
    "— both children already satisfy the join's required "
    "distribution, and the physical plan is scan->join with zero "
    "shuffle (pinned by tests/test_scale.py::test_bucketed_join_has_"
    "no_shuffle). At 100 TB this is THE difference between a join "
    "that moves 100 TB across the network per query and one that "
    "moves nothing: the layout shuffle is paid once at ingest. The "
    "oracle is the plain unbucketed join — same answer, different "
    "plan. Iceberg analog: storage-partitioned joins over "
    "bucket-partitioned tables",
)
def join_bucketed_colocated(spark, sf_dir):
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Partition-pruned date layout
# ---------------------------------------------------------------------------

_PRUNE_ROOT = "/tmp/ocs_partitioned"
_PRUNE_DAY = "2024-01-15"


@register(
    "layout_partition_prune",
    f"""
    SELECT event_type, COUNT(*) AS n,
           {_ORACLE_SUM_DBL.format(c="value")} AS sum_value
    FROM events WHERE CAST(ts AS DATE) = DATE '{_PRUNE_DAY}'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="partition layout + pruning: events re-laid-out partitioned "
    "by event_date (the hive-style dt= layout every 100 TB event "
    "store uses); the one-day query then reads ONLY that day's "
    "directory — the scan's PartitionFilters prune 29/30 of the data "
    "before any I/O (pinned by tests/test_scale.py::test_partition_"
    "prune_plan). The oracle computes the same answer from the "
    "unpartitioned table. At a year of 100 TB/day this is the "
    "difference between scanning 36 PB and 100 TB. Iceberg analog: "
    "partition-spec day(ts) + manifest min/max pruning",
)
def layout_partition_prune(spark, sf_dir):
    root = cache_root(_PRUNE_ROOT, sf_dir)
    tag = os.path.basename(root)
    tbl = f"ocs_p_{tag}_events"
    path = f"{root}/events"
    have_files = os.path.isdir(path) and any(
        d.startswith("event_date=") for d in os.listdir(path)
    )
    if not spark.catalog.tableExists(tbl):
        if have_files:
            # re-register the surviving hive layout (see
            # _bucketed_table) and recover its partition entries
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in _t(spark, sf_dir, "events").schema.fields
            )
            spark.sql(
                f"CREATE TABLE {tbl} ({cols}, event_date date) "
                f"USING parquet PARTITIONED BY (event_date) "
                f"LOCATION '{path}'"
            )
            spark.catalog.recoverPartitions(tbl)
        else:
            (
                _t(spark, sf_dir, "events")
                .withColumn("event_date", F.to_date("ts"))
                .write.mode("overwrite")
                .option("path", path)
                .partitionBy("event_date")
                .saveAsTable(tbl)
            )
    return (
        spark.table(tbl)
        .filter(F.col("event_date") == F.lit(_PRUNE_DAY).cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: unshipped-order revenue top-10
# ---------------------------------------------------------------------------

_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1998-06-01"


@register(
    "tpch_q3_shipping",
    f"""
    SELECT l.l_orderkey,
           {_ORACLE_SUM_DBL.format(c="l.l_extendedprice * (1 - l.l_discount)")}
             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3 shape (unshipped-order revenue): selective dim "
    "filter (1/5 of customers) broadcast into orders, the surviving "
    "orders shuffled against lineitem on orderkey, group-by-orderkey "
    "revenue, top-10 via TakeOrderedAndProject (no global sort). "
    "Both date predicates push into the parquet scans "
    "(PushedFilters), so lineitem reads only post-cutoff row groups. "
    "Revenue uses the decimal(27,6) order-independent sum discipline "
    "shared with tpch_q1/q5",
)
def tpch_q3_shipping(spark, sf_dir):
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    return (
        li.join(
            o.join(F.broadcast(c), o.o_custkey == F.col("c_custkey")),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )
