"""PageRank kernel + host-rank frontier priorities (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omni_crawler_spark.operators.graph import (
    pagerank,
    priority_from_rank,
    rank_hosts,
)


def test_pagerank_mass_and_hub(spark):
    """Star graph: every node links to the hub; hub outranks all, and
    with no dangling nodes total mass stays ~1."""
    n = 20
    nodes = spark.range(n).select(F.col("id"))
    spokes = spark.range(1, n).select(
        F.col("id").alias("src"), F.lit(0).alias("dst")
    )
    back = spark.range(1, n).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    ranks = pagerank(nodes, spokes.unionByName(back), iters=10).collect()
    by_id = {r.id: r.rank for r in ranks}
    assert by_id[0] > max(v for k, v in by_id.items() if k != 0) * 5
    assert abs(sum(by_id.values()) - 1.0) < 1e-6


def test_rank_hosts_orders_hubs_first(spark):
    links = spark.createDataFrame(
        [("a.com", "hub.com"), ("b.com", "hub.com"), ("c.com", "hub.com"),
         ("hub.com", "a.com"), ("hub.com", "b.com"), ("hub.com", "c.com"),
         ("c.com", "c.com")],  # self-link dropped
        "src_host string, dst_host string",
    )
    ranks = {r.host: r.rank for r in rank_hosts(links, iters=8).collect()}
    assert ranks["hub.com"] == max(ranks.values())
    assert ranks["hub.com"] > 2 * ranks["a.com"]
    assert "c.com" in ranks  # self-link dropped but node kept via out-edge


def test_priority_from_rank_preserves_schema_and_defaults(spark):
    frontier = spark.createDataFrame(
        [
            (1, "http://hub.com/x", "hub.com", 3),
            (2, "http://a.com/y", "a.com", 3),
            (3, "http://new.com/z", "new.com", 3),  # never ranked
        ],
        "url_hash long, url_canonical string, host string, priority int",
    )
    links = spark.createDataFrame(
        [("a.com", "hub.com"), ("b.com", "hub.com"),
         ("hub.com", "a.com"), ("hub.com", "b.com")],
        "src_host string, dst_host string",
    )
    out = priority_from_rank(frontier, rank_hosts(links, iters=8), levels=3)
    # drop-in for the scheduler: same columns and types (the coalesce
    # tightens priority's nullability, which is fine)
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in frontier.schema
    ]
    rows = {r.host: r.priority for r in out.collect()}
    assert rows["hub.com"] == 3  # top band of 3
    assert rows["new.com"] == 3  # unranked -> default, unchanged
    assert rows["a.com"] < rows["hub.com"]
