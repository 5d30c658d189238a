"""Distributed PageRank and its crawl-priority application.

``pagerank`` is the generic fixed-iteration kernel (used by the
oracle-paired ``graph_pagerank`` registry query); ``rank_hosts`` +
``priority_from_rank`` turn the link structure a crawl has already
discovered into frontier priorities — the OPIC/PageRank-ordered
frontier every production crawler runs, where the reference's static
``priority`` field (crawler_engine.py queue ordering) never changes
with observed link structure.

The integration is OPT-IN at the crawl engine: the north rule pins
crawl ordering byte-identical to the reference under the same seed
list, so rank-derived priorities are a separate scheduling mode, not
a silent default.

Scale shape: each iteration is one join-shuffle (ranks->edges on src)
plus one agg-shuffle (sum contributions on dst); the loop-invariant
(src, dst, outdeg) set is localCheckpointed once, ranks per iteration
(plan depth stays O(1) — Catalyst planning blows up superlinearly on
unboundedly nested plans). Host graphs are tiny relative to page
graphs (10^7 hosts vs 10^10 pages), so host-level ranking is cheap
even at full crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank.

    ``nodes``: one column ``id``; ``edges``: columns ``src, dst``
    (must be subsets of ``id``). Returns (id, rank). Dangling nodes
    (no out-links) leak their mass to the damping term — the standard
    simple variant; contributions are summed as decimal(27,18) so the
    reduction is order-independent across partitionings/engines.
    """
    n_scalar = nodes.agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    contrib_src = edges.join(outdeg, "src").localCheckpoint()
    ranks = nodes.crossJoin(F.broadcast(n_scalar)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            contrib_src.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(
                F.sum(
                    (F.col("rank") / F.col("outdeg")).cast("decimal(27,18)")
                )
                .cast("double")
                .alias("inflow")
            )
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(n_scalar))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping)
                    * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def rank_hosts(page_links: DataFrame, iters: int = 5) -> DataFrame:
    """PageRank over the HOST graph induced by page-level links.

    ``page_links``: columns ``src_host, dst_host`` (one row per
    discovered link; self-links dropped, multi-edges collapsed with
    their counts as weights folded into outdeg). Returns
    (host, rank).
    """
    edges = (
        page_links.filter(F.col("src_host") != F.col("dst_host"))
        .select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return pagerank(nodes, edges, iters=iters).withColumnRenamed(
        "id", "host"
    )


def priority_from_rank(
    frontier: DataFrame,
    host_ranks: DataFrame,
    levels: int = 5,
    default_priority: int = 3,
) -> DataFrame:
    """Replace the frontier's static ``priority`` with a rank-derived
    one: hosts are bucketed into ``levels`` quantile bands (ntile over
    rank), top band -> highest priority. Unranked hosts (never seen a
    link yet) keep ``default_priority``. Schema is preserved, so the
    result drops into the politeness scheduler unchanged — ordering
    within a host is still (priority desc, discovery_ts, url).

    The ntile window runs over the HOST rank table (tiny), never the
    frontier; the frontier only broadcast-joins the (host, priority)
    map.
    """
    from pyspark.sql import Window

    banded = host_ranks.withColumn(
        "_band",
        # host tie-break makes equal-rank banding deterministic
        F.ntile(levels).over(Window.orderBy(F.asc("rank"), F.asc("host"))),
    ).select("host", F.col("_band").alias("_rank_priority"))
    return (
        frontier.join(F.broadcast(banded), "host", "left")
        .withColumn(
            "priority",
            F.coalesce(
                F.col("_rank_priority"), F.lit(default_priority)
            ).cast(frontier.schema["priority"].dataType),
        )
        .drop("_rank_priority")
        # the host equi-join moved the key column first; restore the
        # caller's column order so the result is schema-stable
        .select(*frontier.columns)
    )
