"""Coverage batch 5: key-phrase extraction (deterministic N5 twin) and
a join+agg+top-k pipeline query (TPC-H Q3 shape)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from omni_crawler_spark.analytics.registry import _ORACLE_SUM_DBL, _t, register
from omni_crawler_spark.functions.text import words


@register(
    "enrich_key_phrases",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                         x -> x <> '') AS ws
      FROM documents
    ), bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i+1])) AS phrase
      FROM w WHERE len(ws) >= 2
    ), counted AS (
      SELECT doc_id, phrase, COUNT(*) AS cnt FROM bi
      GROUP BY doc_id, phrase
    ), ranked AS (
      SELECT doc_id, phrase, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, phrase) AS rn
      FROM counted
    )
    SELECT doc_id, phrase, cnt FROM ranked WHERE rn <= 3
    ORDER BY doc_id, cnt DESC, phrase
    """,
    doc="N5 twin — deterministic key phrases: top-3 bigrams per document "
    "(stand-in for spaCy noun_chunks, content_enhancement.py:132-153; "
    "SURVEY §5 mandates deterministic twins for model-based enrichment)",
)
def enrich_key_phrases(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ws_col = F.col("ws")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(ws_col) - 1),
        lambda i: F.concat(
            F.element_at(ws_col, i), F.lit(" "), F.element_at(ws_col, i + 1)
        ),
    )
    counted = (
        d.select("doc_id", words(F.col("text")).alias("ws"))
        .filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(bigrams).alias("phrase"))
        .groupBy("doc_id", "phrase")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), "phrase")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("doc_id", F.desc("cnt"), "phrase")
    )


@register(
    "tpch_q3_shipping",
    """
    SELECT l.l_orderkey AS orderkey,
           """
    + _ORACLE_SUM_DBL.format(c="l.l_extendedprice * (1 - l.l_discount)")
    + """ AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey LIMIT 10
    """,
    doc="bench depth — TPC-H Q3 shape: selective dim filter → 3-way join "
    "→ agg → top-k (exercises predicate pushdown + broadcast + "
    "TakeOrderedAndProject)",
)
def tpch_q3_shipping(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )
