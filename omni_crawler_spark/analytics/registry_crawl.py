"""Crawl-primitive queries with oracles (SURVEY §2.2-2.3, §2.7 F1-F4).

The frontier inputs are derived *deterministically from doc_id* so the
DuckDB oracle can re-derive the expected outputs independently — the
oracle constructs the expected canonical URL from components rather
than re-running our regex pipeline, which makes it a true semantic
check of canonicalization, the seen anti-join, and the per-host
priority queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omni_crawler_spark.analytics.registry import _t, register
from omni_crawler_spark.functions import text as T
from omni_crawler_spark.functions import urls as U

# messy raw URL built from doc_id: exercises uppercase scheme, www.
# prefix, default port, trailing slash, unsorted query, fragment
_RAW_URL_SQL = """
  (CASE WHEN doc_id % 3 = 1 THEN 'HTTPS' ELSE 'https' END) || '://'
  || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
  || 'host' || (doc_id % 20) || '.example.com'
  || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
  || '/sec' || (doc_id % 7) || '/article-' || doc_id
  || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' ELSE '' END)
  || (CASE WHEN doc_id % 2 = 1 THEN '#frag' ELSE '' END)
"""

# what canonicalization must produce for that raw URL
_CANON_URL_SQL = """
  'https://host' || (doc_id % 20) || '.example.com'
  || '/sec' || (doc_id % 7) || '/article-' || doc_id
  || (CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' ELSE '' END)
"""


def _raw_url(doc_id):
    return F.concat(
        F.when(doc_id % 3 == 1, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(doc_id % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("host"), (doc_id % 20).cast("string"), F.lit(".example.com"),
        F.when(doc_id % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/sec"), (doc_id % 7).cast("string"),
        F.lit("/article-"), doc_id.cast("string"),
        F.when(doc_id % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(doc_id % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        F.when(doc_id % 2 == 1, F.lit("#frag")).otherwise(F.lit("")),
    )


def synthetic_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frontier derived from `documents`: raw URL variants,
    host, priority (rss=10/sitemap=5, url_discovery_engine.py:47,81)."""
    d = _t(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    return d.select(
        "doc_id",
        _raw_url(doc_id).alias("url"),
        F.when(doc_id % 2 == 0, 10).otherwise(5).alias("priority"),
        F.when(doc_id % 2 == 0, "rss").otherwise("sitemap").alias("source"),
    )


@register(
    "url_canonicalize",
    f"""
    SELECT doc_id, {_RAW_URL_SQL} AS url_raw, {_CANON_URL_SQL} AS url_canonical
    FROM documents ORDER BY doc_id
    """,
    doc="F1 — full URL canonicalization (scheme/host lower, www. strip, "
    "default-port strip, fragment drop, query sort, trailing-slash strip); "
    "reference only lowercases host (simple_crawler.py:122-132). The oracle "
    "constructs the expected canonical form independently.",
)
def url_canonicalize(spark, sf_dir):
    f = synthetic_frontier(spark, sf_dir)
    return f.select(
        "doc_id",
        F.col("url").alias("url_raw"),
        U.canonicalize_url(F.col("url")).alias("url_canonical"),
    ).orderBy("doc_id")


@register(
    "frontier_seen_antijoin",
    f"""
    WITH frontier AS (
      SELECT doc_id, {_CANON_URL_SQL} AS url FROM documents
    ), seen AS (
      SELECT md5({_CANON_URL_SQL}) AS url_md5 FROM documents WHERE doc_id % 7 = 0
    )
    SELECT f.doc_id, f.url FROM frontier f
    WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url_md5 = md5(f.url))
    ORDER BY f.doc_id
    """,
    doc="P1/J2 — seen-set anti-join: the reference's Redis SISMEMBER on "
    "md5(url) (url_discovery_engine.py:108-115) as a left_anti join; at "
    "10^10 scale the exact join is pre-screened by the partitioned bloom "
    "filter (omni_crawler_spark/frontier/bloom.py)",
)
def frontier_seen_antijoin(spark, sf_dir):
    f = synthetic_frontier(spark, sf_dir).select(
        "doc_id", U.canonicalize_url(F.col("url")).alias("url")
    )
    seen = (
        f.filter(F.col("doc_id") % 7 == 0)
        .select(U.url_seen_md5(F.col("url")).alias("url_md5"))
    )
    return (
        f.withColumn("url_md5", U.url_seen_md5(F.col("url")))
        .join(seen, "url_md5", "left_anti")
        .select("doc_id", "url")
        .orderBy("doc_id")
    )


@register(
    "frontier_priority_order",
    f"""
    SELECT host, doc_id, priority, crawl_seq FROM (
      SELECT host, doc_id, priority,
             ROW_NUMBER() OVER (PARTITION BY host
                                ORDER BY priority DESC, doc_id) AS crawl_seq
      FROM (SELECT doc_id, 'host' || (doc_id % 20) || '.example.com' AS host,
                   CASE WHEN doc_id % 2 = 0 THEN 10 ELSE 5 END AS priority
            FROM documents)
    ) ORDER BY host, crawl_seq
    """,
    doc="W4 — the per-host politeness priority queue: frontier sorted by "
    "priority desc within host (url_discovery_engine.py:102-103), total "
    "order via (priority desc, doc_id) → crawl_seq",
)
def frontier_priority_order(spark, sf_dir):
    f = synthetic_frontier(spark, sf_dir).withColumn(
        "host", U.url_host(F.col("url"))
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), "doc_id")
    return (
        f.select("host", "doc_id", "priority")
        .withColumn("crawl_seq", F.row_number().over(w))
        .orderBy("host", "crawl_seq")
    )


@register(
    "filter_content_quality",
    """
    SELECT doc_id, n_chars, n_words FROM (
      SELECT doc_id, n_chars,
             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                 w -> w <> '')) AS n_words,
             lower(text) AS lt
      FROM documents
    ) WHERE n_chars >= 200 AND n_words >= 50
      AND NOT (lt LIKE '%page not found%' OR lt LIKE '%404 error%'
               OR lt LIKE '%access denied%' OR lt LIKE '%forbidden%'
               OR lt LIKE '%server error%' OR lt LIKE '%service unavailable%')
    ORDER BY doc_id
    """,
    doc="P3/P9 — content-quality gate: >=200 chars, >=50 words "
    "(simple_crawler.py:187-213) + error-page indicator drop "
    "(content_cleaner.py:246-258)",
)
def filter_content_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_words = T.word_count(F.col("text"))
    return (
        d.select("doc_id", "n_chars", n_words.alias("n_words"), "text")
        .filter(
            (F.col("n_chars") >= 200)
            & (F.col("n_words") >= 50)
            & ~T.is_error_page(F.col("text"))
        )
        .drop("text")
        .orderBy("doc_id")
    )


@register(
    "scalar_hash_ids",
    """
    SELECT doc_id,
           'article_' || substr(md5('https://h.example.com/a-' || doc_id), 1, 8)
             || '_' || substr(md5(text), 1, 8) AS article_id,
           sha256('t' || text || 'https://h.example.com/a-' || doc_id)
             AS content_hash
    FROM documents ORDER BY doc_id
    """,
    doc="F2/D2 — article_{md5(url)[:8]}_{md5(content)[:8]} id "
    "(simple_crawler.py:134-143) + sha256 content hash "
    "(enhanced_article.py:84-87)",
)
def scalar_hash_ids(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://h.example.com/a-"), F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        T.article_id(url.cast("binary"), F.col("text").cast("binary")).alias(
            "article_id"
        ),
        T.content_hash(F.lit("t"), F.col("text"), url).alias("content_hash"),
    ).orderBy("doc_id")
