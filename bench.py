"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query is materialized with a count-collect (``df.count()`` after
the full plan, or ``collect()`` for small results) so the measured
time covers scan → shuffle → agg, not lazy plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omni_crawler_spark.analytics import REGISTRY  # noqa: E402
from omni_crawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1_pricing",
    "agg_domain_topn",
    "agg_pivot_daily_type",
    "agg_word_topk",
    "agg_daily_counts",
    "join_fact_dim",
    "join_lineitem_part",
    "window_per_group_topk",
    "window_recent_100",
    "dedup_exact_hash",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"bench: sf_dir does not exist: {sf_dir}")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")
    # warm the JVM + parquet footers so q1 doesn't pay session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        t0 = time.time()
        rows = q.build(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
        del rows

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
