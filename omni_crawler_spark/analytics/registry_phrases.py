"""Coverage batch 5: key-phrase extraction (deterministic N5 twin).

(The TPC-H Q3 query that used to live here was superseded by the
plan-asserted version in registry_scale.py; register() now rejects
duplicate names, so this module holds only the phrases query.)"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from omni_crawler_spark.analytics.registry import _t, register
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
