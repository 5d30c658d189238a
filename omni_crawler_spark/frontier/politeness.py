"""Per-host politeness-aware priority scheduler.

Replaces the reference's global asyncio.Semaphore(3) + priority sort
(src/orchestrator/omni_orchestrator.py:119-139;
src/discovery/url_discovery_engine.py:102-103) with the north rule's
host-hash-partitioned queue:

- **robots**: URLs whose path matches a host disallow prefix are
  dropped before scheduling (reference has only the config flag,
  config/master_config.yaml:10 — this is new code).
- **priority queue**: within a host, strict order
  (priority desc, discovery_ts, url) — the reference's stable
  priority sort made total and deterministic (SURVEY §4.2).
- **skew lanes**: a host's queue is split into ``max_parallel`` lanes
  by url-hash (explicit salting of skewed hosts per the north rule);
  each lane spaces fetches ``crawl_delay_ms`` apart, so aggregate
  host rate = max_parallel / crawl_delay — the semantics of "N
  polite connections". Hot hosts therefore parallelize across
  executors without violating their delay budget, and the Zipf head
  no longer straggles one task.
- **budget**: fetches whose computed start offset exceeds the cycle
  budget stay in the frontier for the next cycle (deferred), exactly
  like the reference's next polling cycle.

All per-host sequencing happens inside one window partition =
(host, lane) — executor-local by construction, nothing shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_txt(robots_txt: "F.Column") -> "F.Column":
    """robots.txt text → array of Disallow path prefixes (the subset
    of the spec the scheduler enforces; reference has only the config
    flag config/master_config.yaml:10 — this is new code per the
    north rule). Pure column expression: one regexp_extract_all over
    the raw file text, empty-prefix rules (allow-all) dropped."""
    rules = F.regexp_extract_all(
        robots_txt, F.lit(r"(?im)^\s*Disallow:\s*(\S+)\s*$"), F.lit(1)
    )
    return F.filter(rules, lambda p: (p != "") & (p != "/$"))


def hosts_with_parsed_robots(hosts: DataFrame) -> DataFrame:
    """If the hosts table carries raw ``robots_txt`` instead of a
    pre-parsed ``robots_disallow`` array, derive the array."""
    if "robots_disallow" in hosts.columns:
        return hosts
    return hosts.withColumn(
        "robots_disallow", parse_robots_txt(F.col("robots_txt"))
    )


def robots_filter(frontier: DataFrame, hosts: DataFrame) -> DataFrame:
    """Drop URLs matching a disallow prefix of their host. Hosts is a
    small dim → broadcast join, no shuffle on the frontier side."""
    path = F.regexp_replace(
        F.col("url_canonical"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""
    )
    hosts = hosts_with_parsed_robots(hosts)
    joined = frontier.join(
        F.broadcast(hosts.select("host", "robots_disallow")), "host", "left"
    )
    blocked = F.exists(
        F.coalesce(F.col("robots_disallow"), F.array()),
        lambda p: F.startswith(path, p),
    )
    return joined.filter(~blocked).drop("robots_disallow")


def schedule(
    frontier: DataFrame,
    hosts: DataFrame,
    cycle_budget_ms: int = 60_000,
) -> DataFrame:
    """Assign each frontier row a lane, in-lane sequence and start
    offset; rows beyond the cycle budget are marked deferred.

    Output adds: lane:int, crawl_seq:long (1-based within host+lane),
    start_ms:long, scheduled:boolean(start_ms < budget).
    """
    f = frontier.join(
        F.broadcast(hosts.select("host", "crawl_delay_ms", "max_parallel")),
        "host",
        "left",
    ).withColumns(
        {
            "crawl_delay_ms": F.coalesce(F.col("crawl_delay_ms"), F.lit(500)),
            "max_parallel": F.coalesce(F.col("max_parallel"), F.lit(1)),
            "lane": F.pmod(F.xxhash64("url_canonical"), F.col("max_parallel")).cast(
                "int"
            ),
        }
    )

    # in-lane sequencing is a plain window function — one shuffle on
    # (host, lane), codegen'd sort + running count. (Round 1 used an
    # applyInPandas group-map here; profiled at 100k URLs the Arrow
    # round-trip made it the most expensive plan step at ~4 s — the
    # window form computes identical crawl_seq/start_ms for ~1/4 the
    # cost, and per-lane state stays executor-local the same way.)
    w = Window.partitionBy("host", "lane").orderBy(
        F.desc("priority"), "discovery_ts", "url_canonical"
    )
    return f.withColumns(
        {
            "crawl_seq": F.row_number().over(w).cast("long"),
        }
    ).withColumns(
        {
            "start_ms": (
                (F.col("crawl_seq") - 1)
                * F.greatest(F.lit(1), F.col("crawl_delay_ms"))
            ).cast("long"),
        }
    ).withColumn("scheduled", F.col("start_ms") < F.lit(cycle_budget_ms))
