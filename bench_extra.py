"""Extra benchmarks for optimization work (guide §1.4) — NOT the
driver-timed bench (bench.py is frozen; this file exists so per-query
isolation / noop-sink numbers can be cited in OPTIMIZATION_r06.md
without touching the frozen harness).

Usage:
    python bench_extra.py [--sf-dir DIR] [--mode collect|noop]
                          [--repeat N] [query ...]

- default mode `collect` matches bench.py methodology exactly;
- `noop` materializes every column of every row through the no-op
  sink (guide §1.4) so the computation is timed without driver
  collection;
- each query run is labeled with setJobDescription for UI readability.

Prints one JSON line: {"mode": ..., "sf_dir": ..., "queries":
{name: [run1_sec, run2_sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omni_crawler_spark.analytics import REGISTRY  # noqa: E402
from omni_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mode", choices=["collect", "noop"], default="collect")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("bench-extra")
    # same warmup as bench.py: parquet footers + Python worker pool
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 32).select(_warm("id")).count()

    names = args.queries or list(REGISTRY)
    out: dict[str, list[float]] = {}
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"warn: unknown query {name}", file=sys.stderr)
            continue
        runs = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.time()
            df = q.build(spark, args.sf_dir)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps({"mode": args.mode, "sf_dir": args.sf_dir,
                      "queries": out}))


if __name__ == "__main__":
    main()
