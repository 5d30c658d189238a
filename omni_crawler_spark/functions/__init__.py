"""Pure-column scalar & enrichment expressions.

Everything in this package is built from ``pyspark.sql.functions`` so
it stays inside whole-stage codegen on the JVM — no Python in the hot
path. Pandas/Arrow UDFs live in ``omni_crawler_spark.operators`` and
``omni_crawler_spark.frontier`` where Python is genuinely required
(image decode, stateful politeness).
"""

from omni_crawler_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    url_host,
    url_hash64,
    url_seen_md5,
)
