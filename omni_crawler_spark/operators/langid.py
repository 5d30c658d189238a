"""Character-n-gram language identification — distributed fit AND
predict, both pure DataFrame plans.

Upgrades the reference's 10-common-English-words heuristic
(src/processing/content_enricher.py:180-193, kept as F13's exact
behavioral twin in functions/text.py) to a real rank-profile
classifier (Cavnar & Trenkle '94 shape): the model is the top-k
character trigrams PER LANGUAGE ranked by corpus frequency, and a
document scores each candidate language by the summed weights of the
profile trigrams it contains.

Spark-first shape:
- fit  = explode(trigrams) → groupBy(lang, tri).count →
         per-lang row_number top-k — two shuffles over the TRAINING
         corpus, executed once; the fitted model IS a DataFrame
         (lang, tri, weight), small enough to broadcast (k × #langs
         rows) at any corpus size.
- predict = explode(distinct doc trigrams) → broadcast-join the
         profile → groupBy(doc, lang).sum(weight) → max_by — the
         corpus-sized side only ever does equi-joins and partial
         aggregations; no Python anywhere.

Determinism: every ordering carries a total tie-break
(count desc, tri asc for profiles; score desc, lang asc for argmax),
so Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def char_trigrams(text: Column) -> Column:
    """All character trigrams of lower(text), positions 1..n-2
    (duplicates kept for fit; callers distinct() for predict)."""
    t = F.lower(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(t) - 2)),
        lambda i: t.substr(i, F.lit(3)),
    )


def fit_profiles(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    k: int = 64,
) -> DataFrame:
    """(lang, tri, weight) — the top-``k`` trigrams per language by
    frequency, weight = k+1-rank (rank 1 = most frequent). Two
    shuffles; output is k rows per language."""
    tris = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_trigrams(F.col(text_col))).alias("tri"),
    )
    counts = tris.groupBy("lang", "tri").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tri"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "lang", "tri", (F.lit(k + 1) - F.col("rank")).alias("weight")
        )
    )


def predict(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, lang_pred, score) per document: summed profile weights of
    the document's DISTINCT trigrams per candidate language, argmax
    with a lang-name tie-break. Documents matching no profile trigram
    at all are dropped (no evidence — callers may fill 'unknown')."""
    doc_tris = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(char_trigrams(F.col(text_col)))
        ).alias("tri"),
    )
    scored = (
        doc_tris.join(
            F.broadcast(profiles.withColumnRenamed("lang", "cand")), "tri"
        )
        .groupBy(id_col, "cand")
        .agg(F.sum("weight").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("cand"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("cand").alias("lang_pred"), "score")
    )
