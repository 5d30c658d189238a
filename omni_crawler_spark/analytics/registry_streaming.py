"""Alerting, time-window, search-ranking, validator and XML-source
queries (SURVEY §2.1 S2, §2.2 P5/P6, §2.5 W6, §2.9 T3-T5, §3.3) with
DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from omni_crawler_spark.analytics.registry import _t, ordered_small, register
from omni_crawler_spark.streaming import alerts as A

_RULES_VALUES = ", ".join(
    f"('{r[0]}', '{r[1]}', '{r[2]}', '{r[3]}', {r[4]}, '{r[5]}', {r[6]})"
    for r in A.DEFAULT_RULES
)
_RULES_CTE = (
    "rules(rule_id, name, metric, condition, threshold, severity, "
    f"cooldown_minutes) AS (VALUES {_RULES_VALUES})"
)
_COND_SQL = """(
      (condition = '>'  AND value >  threshold) OR
      (condition = '>=' AND value >= threshold) OR
      (condition = '<'  AND value <  threshold) OR
      (condition = '<=' AND value <= threshold) OR
      (condition = '==' AND value =  threshold) OR
      (condition = '!=' AND value <> threshold))"""


def _metrics(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select("ts", F.col("event_type").alias("metric"), "value")
    )


@register(
    "alerts_eval",
    f"""
    WITH {_RULES_CTE}
    SELECT rule_id, name, severity,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value, threshold, metric
    FROM events e JOIN rules r ON e.event_type = r.metric
    WHERE {_COND_SQL}
    ORDER BY rule_id, ts_s, value
    """,
    doc="J4 — rule×metric evaluation: rules broadcast-joined on metric "
    "name, condition as a when() chain (alert_engine.py:112-140)",
)
def alerts_eval(spark, sf_dir):
    fired = A.evaluate(_metrics(spark, sf_dir), A.default_rules(spark))
    return fired.select(
        "rule_id", "name", "severity",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value", "threshold", "metric",
    ).orderBy("rule_id", "ts_s", "value")


@register(
    "alerts_cooldown_bucket",
    f"""
    WITH {_RULES_CTE},
    fired AS (
      SELECT rule_id, name, severity, ts, value, threshold, metric,
             cooldown_minutes
      FROM events e JOIN rules r ON e.event_type = r.metric
      WHERE {_COND_SQL}
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY rule_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // (cooldown_minutes * 60)
        ORDER BY ts, value) AS rn
      FROM fired
    )
    SELECT rule_id, name, severity,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value, metric
    FROM ranked WHERE rn = 1 ORDER BY rule_id, ts_s
    """,
    doc="T3 — cooldown suppression as first-alert-per-aligned-bucket "
    "(pure window fn; the reference-exact greedy replay is "
    "alerts_cooldown_greedy, pytest-verified)",
)
def alerts_cooldown_bucket(spark, sf_dir):
    fired = A.evaluate(_metrics(spark, sf_dir), A.default_rules(spark))
    return (
        A.cooldown_bucket(fired)
        .select(
            "rule_id", "name", "severity",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value", "metric",
        )
        .orderBy("rule_id", "ts_s")
    )


@register(
    "alerts_cooldown_greedy",
    f"""
    WITH RECURSIVE {_RULES_CTE},
    fired AS (
      SELECT DISTINCT rule_id, name, severity, ts, value, metric,
             cooldown_minutes
      FROM events e JOIN rules r ON e.event_type = r.metric
      WHERE {_COND_SQL}
    ),
    sel AS (
      SELECT rule_id, name, severity, ts, value, metric,
             cooldown_minutes
      FROM fired f
      WHERE NOT EXISTS (
        SELECT 1 FROM fired f2 WHERE f2.rule_id = f.rule_id
          AND (f2.ts < f.ts OR (f2.ts = f.ts AND f2.value < f.value)))
      UNION ALL
      SELECT f.rule_id, f.name, f.severity, f.ts, f.value, f.metric,
             f.cooldown_minutes
      FROM sel s
      JOIN fired f ON f.rule_id = s.rule_id
        AND f.ts >= s.ts + to_minutes(CAST(s.cooldown_minutes AS BIGINT))
      WHERE NOT EXISTS (
        SELECT 1 FROM fired f2 WHERE f2.rule_id = s.rule_id
          AND f2.ts >= s.ts + to_minutes(CAST(s.cooldown_minutes AS BIGINT))
          AND (f2.ts < f.ts OR (f2.ts = f.ts AND f2.value < f.value)))
    )
    SELECT rule_id, name, severity,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value, metric
    FROM sel ORDER BY rule_id, ts_s, value
    """,
    doc="T3 — reference-exact cooldown (fire iff ts >= last_triggered "
    "+ cooldown, alert_engine.py:120-124): the inherently sequential "
    "per-rule replay runs via applyInPandas keyed by rule_id (state "
    "is executor-local; #rules is tiny). Oracle-paired via a DuckDB "
    "RECURSIVE CTE that walks the same greedy chain — anchor = the "
    "(ts,value)-minimal fired event per rule, step = the minimal "
    "fired event past the previous fire's cooldown horizon (NOT "
    "EXISTS argmin, no aggregates in the recursive term) — the same "
    "trick dedup_cluster_cc uses for transitive closure. DISTINCT on "
    "the fired set keeps duplicate (rule,ts,value) rows from forking "
    "the chain (the replay fires such a pair once). Also verified "
    "against a pure-Python replay in tests/test_alerts.py",
)
def alerts_cooldown_greedy(spark, sf_dir):
    fired = A.evaluate(
        _metrics(spark, sf_dir), A.default_rules(spark)
    ).dropDuplicates(["rule_id", "ts", "value"])
    # ordered_small instead of a global orderBy: the result is tiny
    # but its lineage (rule join → applyInPandas greedy replay) is
    # expensive, and a range-exchange orderBy re-executes that
    # lineage for the RangePartitioner's sampling job
    return ordered_small(
        A.cooldown_greedy(fired).select(
            "rule_id", "name", "severity",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value", "metric",
        ),
        "rule_id", "ts_s", "value",
    )


@register(
    "window_tumbling_hourly",
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, "
    "event_type, COUNT(*) AS cnt, "
    "ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)/COUNT(*), 4) "
    "AS avg_value FROM events GROUP BY hour_start, event_type "
    "ORDER BY hour_start, event_type",
    doc="T4 — tumbling event-time window aggregation "
    "(window(ts, '1 hour'); dashboard.py:620-624 trailing windows)",
)
def window_tumbling_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(
                F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type", "cnt", "avg_value",
        )
        .orderBy("hour_start", "event_type")
    )


@register(
    "window_trailing_recent",
    "SELECT COUNT(*) AS n_recent, COUNT(DISTINCT user_id) AS n_users "
    "FROM events WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 24 HOURS",
    doc="T4/A6 — trailing-window count relative to stream head "
    "(dashboard.py:620-624 'last hour'; 24h here so sf0.01 has data)",
)
def window_trailing_recent(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    head = e.agg(F.max("ts").alias("max_ts"))
    return (
        e.crossJoin(F.broadcast(head))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .agg(
            F.count("*").alias("n_recent"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "source_sitemap_parse",
    """
    SELECT doc_id,
           unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS url
    FROM (
      SELECT doc_id,
             '<urlset><url><loc>https://s' || (doc_id % 20)
             || '.example.com/a-' || doc_id || '</loc></url>'
             || '<url><loc>https://s' || (doc_id % 20)
             || '.example.com/b-' || doc_id || '</loc></url></urlset>' AS xml
      FROM documents
    ) ORDER BY doc_id, url
    """,
    doc="S2 — sitemap XML scan: <loc> extraction + explode "
    "(url_discovery_engine.py:58-89), here over a synthesized XML col",
)
def source_sitemap_parse(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<urlset><url><loc>https://s"),
        F.pmod(F.col("doc_id"), 20).cast("string"),
        F.lit(".example.com/a-"), F.col("doc_id").cast("string"),
        F.lit("</loc></url><url><loc>https://s"),
        F.pmod(F.col("doc_id"), 20).cast("string"),
        F.lit(".example.com/b-"), F.col("doc_id").cast("string"),
        F.lit("</loc></url></urlset>"),
    )
    return (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(xml, F.lit("<loc>([^<]*)</loc>"), F.lit(1))
            ).alias("url"),
        )
        .orderBy("doc_id", "url")
    )


@register(
    "search_rank",
    """
    SELECT doc_id, score FROM (
      SELECT doc_id,
             ROUND((CASE WHEN lower(title) LIKE '%market%' THEN 3.0 ELSE 0 END)
             + (CASE WHEN lower(text) LIKE '%market%' THEN 2.0 ELSE 0 END)
             + (CASE WHEN lower(text) LIKE '%economy%' THEN 1.5 ELSE 0 END)
             + (CASE WHEN source = 'src1' THEN 1.2 ELSE 0 END), 4) AS score
      FROM (SELECT doc_id, text, source,
                   'Document ' || doc_id ||
                   (CASE WHEN doc_id % 4 = 0 THEN ' market report'
                         ELSE ' notes' END) AS title
            FROM documents)
    ) WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20
    """,
    doc="W6/§3.3 — weighted multi-field relevance scoring "
    "(title^3/content^2 multi_match, advanced_search.py:48-63) with "
    "deterministic top-k",
)
def search_rank(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    title = F.concat(
        F.lit("Document "), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" market report")).otherwise(
            F.lit(" notes")
        ),
    )
    score = F.round(
        F.when(F.lower(title).contains("market"), 3.0).otherwise(0.0)
        + F.when(F.lower(F.col("text")).contains("market"), 2.0).otherwise(0.0)
        + F.when(F.lower(F.col("text")).contains("economy"), 1.5).otherwise(0.0)
        + F.when(F.col("source") == "src1", 1.2).otherwise(0.0),
        4,
    )
    return (
        d.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@register(
    "validator_score",
    """
    SELECT doc_id, n_errors, n_warnings,
           ROUND(GREATEST(0.0,
                 CAST(8 - n_errors - n_warnings AS DOUBLE)/8
                 - 0.3*n_errors - 0.1*n_warnings), 4) AS validation_score
    FROM (
      SELECT doc_id,
        (CASE WHEN n_chars < 50 THEN 1 ELSE 0 END)
        + (CASE WHEN lang = 'unknown' THEN 1 ELSE 0 END) AS n_errors,
        (CASE WHEN n_chars > 450 THEN 1 ELSE 0 END)
        + (CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END) AS n_warnings
      FROM documents
    ) ORDER BY doc_id
    """,
    doc="P5/P6 — validator predicate set emitting error/warning counts "
    "and score passed/8 - 0.3·err - 0.1·warn clamped at 0 "
    "(article_validator.py:36-234)",
)
def validator_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_errors = (
        F.when(F.col("n_chars") < 50, 1).otherwise(0)
        + F.when(F.col("lang") == "unknown", 1).otherwise(0)
    )
    n_warnings = (
        F.when(F.col("n_chars") > 450, 1).otherwise(0)
        + F.when(F.col("doc_id") % 13 == 0, 1).otherwise(0)
    )
    score = F.round(
        F.greatest(
            F.lit(0.0),
            (8 - n_errors - n_warnings).cast("double") / 8
            - 0.3 * n_errors
            - 0.1 * n_warnings,
        ),
        4,
    )
    return d.select(
        "doc_id",
        n_errors.alias("n_errors"),
        n_warnings.alias("n_warnings"),
        score.alias("validation_score"),
    ).orderBy("doc_id")


@register(
    "enrich_entities_regex",
    """
    SELECT doc_id,
           array_to_string(regexp_extract_all(byline, '([A-Z][a-z]+ [A-Z][a-z]+)', 1), ';') AS persons,
           len(regexp_extract_all(byline, '([A-Z][a-z]+ [A-Z][a-z]+)', 1))
             AS n_persons
    FROM (
      SELECT doc_id,
             'Reported by ' ||
             (['Alice Johnson','Bob Smith','Carol White','David Brown'])
               [(doc_id % 4) + 1]
             || ' with ' ||
             (['Eve Davis','Frank Miller','Grace Wilson'])[(doc_id % 3) + 1]
             AS byline
      FROM documents
    ) ORDER BY doc_id
    """,
    doc="N2 — regex entity extraction: title-case person heuristic "
    "(content_enricher.py:112-132) over a derived byline column",
)
def enrich_entities_regex(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    first = F.element_at(
        F.array(*[F.lit(x) for x in
                  ["Alice Johnson", "Bob Smith", "Carol White", "David Brown"]]),
        (F.pmod(F.col("doc_id"), 4) + 1).cast("int"),
    )
    second = F.element_at(
        F.array(*[F.lit(x) for x in ["Eve Davis", "Frank Miller", "Grace Wilson"]]),
        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
    )
    byline = F.concat(F.lit("Reported by "), first, F.lit(" with "), second)
    persons = F.regexp_extract_all(
        byline, F.lit("([A-Z][a-z]+ [A-Z][a-z]+)"), F.lit(1)
    )
    return d.select(
        "doc_id",
        F.array_join(persons, ";").alias("persons"),
        F.size(persons).alias("n_persons"),
    ).orderBy("doc_id")


@register(
    "window_history_trim",
    """
    SELECT event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 40
    ORDER BY event_type, ts_s DESC, event_id DESC
    """,
    doc="W5 — monitoring-history retention: keep the newest N snapshots "
    "per scope, delete older (system_monitor.py:282-288, 1440-minute "
    "retention) — per-group ranked trim, the delete expressed as the "
    "kept view",
)
def window_history_trim(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .select(
            "event_type", "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
        .orderBy("event_type", F.desc("ts_s"), F.desc("event_id"))
    )
