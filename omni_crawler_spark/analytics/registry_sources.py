"""Coverage batch 4: source parsing + scalar extraction + lookup
semantics (SURVEY §2.1 S1, §2.3 J3, §2.7 F5-F7/F14)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omni_crawler_spark.analytics.registry import _t, register


def _rss_xml_sql() -> str:
    return (
        "'<rss><channel>"
        "<item><title>Story A-' || doc_id || '</title>"
        "<link>https://feed' || (doc_id % 10) || '.example.com/a-' || doc_id"
        " || '</link><pubDate>2025-02-0' || (doc_id % 9 + 1) || '</pubDate></item>"
        "<item><title>Story B-' || doc_id || '</title>"
        "<link>https://feed' || (doc_id % 10) || '.example.com/b-' || doc_id"
        " || '</link><pubDate>2025-03-0' || (doc_id % 9 + 1) || '</pubDate></item>"
        "</channel></rss>'"
    )


def _rss_xml_col():
    d = F.col("doc_id").cast("string")
    m10 = F.pmod(F.col("doc_id"), 10).cast("string")
    m9 = (F.pmod(F.col("doc_id"), 9) + 1).cast("string")
    return F.concat(
        F.lit("<rss><channel><item><title>Story A-"), d,
        F.lit("</title><link>https://feed"), m10,
        F.lit(".example.com/a-"), d,
        F.lit("</link><pubDate>2025-02-0"), m9,
        F.lit("</pubDate></item><item><title>Story B-"), d,
        F.lit("</title><link>https://feed"), m10,
        F.lit(".example.com/b-"), d,
        F.lit("</link><pubDate>2025-03-0"), m9,
        F.lit("</pubDate></item></channel></rss>"),
    )


@register(
    "source_rss_parse",
    f"""
    SELECT doc_id,
           regexp_extract(item, '<link>([^<]*)</link>', 1) AS url,
           regexp_extract(item, '<title>([^<]*)</title>', 1) AS title,
           regexp_extract(item, '<pubDate>([^<]*)</pubDate>', 1) AS published
    FROM (
      SELECT doc_id,
             unnest(regexp_extract_all(xml, '<item>([\\s\\S]*?)</item>', 1))
               AS item
      FROM (SELECT doc_id, {_rss_xml_sql()} AS xml FROM documents)
    ) ORDER BY doc_id, url
    """,
    doc="S1 — RSS feed scan: per-item link/title/pubDate extraction + "
    "explode (url_discovery_engine.py:31-56, feedparser entries → "
    "frontier dicts)",
)
def source_rss_parse(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", _rss_xml_col().alias("xml"))
    item = F.explode(
        F.regexp_extract_all(F.col("xml"), F.lit(r"<item>([\s\S]*?)</item>"), F.lit(1))
    ).alias("item")
    return (
        d.select("doc_id", item)
        .select(
            "doc_id",
            F.regexp_extract("item", "<link>([^<]*)</link>", 1).alias("url"),
            F.regexp_extract("item", "<title>([^<]*)</title>", 1).alias("title"),
            F.regexp_extract("item", "<pubDate>([^<]*)</pubDate>", 1).alias(
                "published"
            ),
        )
        .orderBy("doc_id", "url")
    )


@register(
    "scalar_html_extract",
    """
    SELECT doc_id,
           substr(trim(regexp_replace(
             regexp_extract(html, '<title[^>]*>([\\s\\S]*?)</title>', 1),
             '\\s+', ' ', 'g')), 1, 500) AS title,
           regexp_extract(html, '<meta name="author" content="([^"]*)"', 1)
             AS author,
           regexp_extract(html,
             '<meta property="article:published_time" content="([^"]*)"', 1)
             AS published
    FROM (
      SELECT doc_id,
             '<html><head><title>  Doc ' || doc_id || '
  extended  title  </title>'
             || '<meta name="author" content="Author ' || (doc_id % 7) || '">'
             || '<meta property="article:published_time" content="2025-01-'
             || CASE WHEN doc_id % 28 + 1 < 10 THEN '0' ELSE '' END
             || (doc_id % 28 + 1) || '">'
             || '</head><body>x</body></html>' AS html
      FROM documents
    ) ORDER BY doc_id
    """,
    doc="F5/F6/F7 — title extraction with whitespace collapse + 500-char "
    "cap (simple_crawler.py:103-120), author meta (:145-165), "
    "publish-date meta (:167-185)",
)
def scalar_html_extract(spark, sf_dir):
    did = F.col("doc_id")
    day = F.lpad((F.pmod(did, 28) + 1).cast("string"), 2, "0")
    html = F.concat(
        F.lit("<html><head><title>  Doc "), did.cast("string"),
        F.lit("\n  extended  title  </title>"),
        F.lit('<meta name="author" content="Author '),
        F.pmod(did, 7).cast("string"), F.lit('">'),
        F.lit('<meta property="article:published_time" content="2025-01-'),
        day, F.lit('">'),
        F.lit("</head><body>x</body></html>"),
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", html.alias("html"))
    title = F.substring(
        F.trim(
            F.regexp_replace(
                F.regexp_extract("html", r"<title[^>]*>([\s\S]*?)</title>", 1),
                r"\s+",
                " ",
            )
        ),
        1,
        500,
    )
    return d.select(
        "doc_id",
        title.alias("title"),
        F.regexp_extract("html", '<meta name="author" content="([^"]*)"', 1).alias(
            "author"
        ),
        F.regexp_extract(
            "html", '<meta property="article:published_time" content="([^"]*)"', 1
        ).alias("published"),
    ).orderBy("doc_id")


@register(
    "scalar_datetime_parse",
    """
    SELECT doc_id, raw_ts,
           strftime(CAST(raw_ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
             AS parsed_utc
    FROM (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN '2025-03-01T1' || (doc_id % 10) || ':30:00Z'
               WHEN 1 THEN '2025-03-01T1' || (doc_id % 10) || ':30:00+02:00'
               ELSE '2025-03-01 1' || (doc_id % 10) || ':30:00'
             END AS raw_ts
      FROM documents
    ) ORDER BY doc_id
    """,
    doc="F14 — mixed naive/'Z'/offset datetime normalization to UTC "
    "(article_validator.py:153-166; the reference's dedicated "
    "regression test test_datetime_fix.py:9-48)",
)
def scalar_datetime_parse(spark, sf_dir):
    did = F.col("doc_id")
    h = F.pmod(did, 10).cast("string")
    raw = (
        F.when(did % 3 == 0, F.concat(F.lit("2025-03-01T1"), h, F.lit(":30:00Z")))
        .when(did % 3 == 1, F.concat(F.lit("2025-03-01T1"), h, F.lit(":30:00+02:00")))
        .otherwise(F.concat(F.lit("2025-03-01 1"), h, F.lit(":30:00")))
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", raw.alias("raw_ts"))
    return d.select(
        "doc_id",
        "raw_ts",
        F.date_format(F.to_timestamp("raw_ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "parsed_utc"
        ),
    ).orderBy("doc_id")


@register(
    "join_semi_recent",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM (
        SELECT user_id FROM events ORDER BY ts DESC, event_id DESC LIMIT 50
      ) r WHERE r.user_id = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="J3 — recent-ids semi-join lookup (Redis recent-100 id list → "
    "per-id GET, omni_storage.py:308-320)",
)
def join_semi_recent(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    recent = (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select("user_id")
    )
    return (
        c.join(recent, c.c_custkey == recent.user_id, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "agg_approx_distinct",
    None,
    doc="A2 at 10^10 scale — approx_count_distinct (HLL) where exact "
    "distinct would shuffle every key (SURVEY §2.4 A2 note); "
    "approximate by design → rows-only",
)
def agg_approx_distinct(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@register(
    "agg_approx_distinct_check",
    """
    SELECT COUNT(DISTINCT user_id) AS exact_users,
           CAST(TRUE AS BOOLEAN) AS hll_within_bound
    FROM events
    """,
    doc="the oracle-PAIRABLE half of agg_approx_distinct: the HLL "
    "estimate itself is engine-specific (sketch layouts differ), but "
    "the EXACT count and the error-bound VERDICT are not — the Spark "
    "side computes both the HLL (rsd 0.02) and the exact distinct in "
    "one aggregate and reports whether the estimate landed within "
    "3*rsd of truth; the DuckDB twin pins the exact count and the "
    "expected-true verdict. HLL on a fixed dataset is deterministic, "
    "so this cannot flake — it turns red only if the sketch's error "
    "contract is actually violated. 100 TB shape: one partial-"
    "aggregated pass, the HLL sketch merges map-side",
)
def agg_approx_distinct_check(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("_hll"),
    ).select(
        "exact_users",
        (
            F.abs(F.col("_hll") - F.col("exact_users"))
            <= 3 * 0.02 * F.col("exact_users")
        ).alias("hll_within_bound"),
    )


@register(
    "clean_main_content",
    """
    WITH h AS (
      SELECT doc_id,
             '<html><body><nav>Home Sections Topics</nav>'
             || '<div class="advertisement">ADVERTISEMENT Sign up for our'
             || ' newsletter</div><article><p>' || text
             || '</p></article><footer>Follow us on networks</footer>'
             || '</body></html>' AS html
      FROM documents
    ), c AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                  '\\s+', ' ', 'g')) AS basic,
             trim(regexp_replace(regexp_replace(
                  regexp_extract(html, '(?s)<article[^>]*>([\\s\\S]*?)</article>', 1),
                  '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) AS main
      FROM h
    )
    SELECT doc_id, length(basic) AS len_basic, length(main) AS len_main,
           length(basic) - length(main) AS junk_removed,
           CASE WHEN main LIKE '%ADVERTISEMENT%' THEN 1 ELSE 0 END AS ad_leaked
    FROM c ORDER BY doc_id
    """,
    doc="F8 boilerplate/main-content extraction delta — the tag-strip-only "
    "clean (content_cleaner.py:276-288 _basic_clean) leaks nav/ad/footer "
    "text; 'article p' main-content extraction (:152-195) removes it. "
    "Emits per-doc lengths of both paths + the junk delta; the full "
    "cascade (ad-class removal, domain selectors) runs in the Arrow "
    "fetch stage (frontier/fetch.py::extract_main_content_py) with "
    "per-row parity vs tests/reference_sim.py",
)
def clean_main_content(spark, sf_dir):
    html = F.concat(
        F.lit("<html><body><nav>Home Sections Topics</nav>"),
        F.lit('<div class="advertisement">ADVERTISEMENT Sign up for our'),
        F.lit(" newsletter</div><article><p>"),
        F.col("text"),
        F.lit("</p></article><footer>Follow us on networks</footer>"),
        F.lit("</body></html>"),
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", html.alias("html"))

    def strip_norm(c):
        return F.trim(
            F.regexp_replace(F.regexp_replace(c, "<[^>]+>", " "), r"\s+", " ")
        )

    basic = strip_norm(F.col("html"))
    main = strip_norm(
        F.regexp_extract("html", r"(?s)<article[^>]*>([\s\S]*?)</article>", 1)
    )
    return (
        d.select(
            "doc_id",
            F.length(basic).alias("len_basic"),
            F.length(main).alias("len_main"),
            (F.length(basic) - F.length(main)).alias("junk_removed"),
            F.when(main.contains("ADVERTISEMENT"), 1).otherwise(0).alias(
                "ad_leaked"
            ),
        )
        .orderBy("doc_id")
    )
