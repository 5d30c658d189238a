"""Full-text search API (reference entry point 3, SURVEY §3.3).

``multi_match`` re-expresses the reference's ES bool query
(src/search/advanced_search.py:41-132): tokenized multi-field scoring
with per-field boosts and a ``fuzziness: AUTO`` analog; ``highlight``
produces the <mark>-tagged fragments + content preview
(:118-128, 222-233); ``apply_filters`` covers the filter conditions
(:66-105, P7); faceting is the A9 aggregation family in the registry.

The registry queries search_fulltext / search_highlight are
oracle-paired instances of these functions over derived columns.

Scale shape: tokenization is a codegen'd split+explode; the fuzzy
match is a broadcast join of the tiny term table; one per-doc
aggregation ends the plan. At 100 TB put a bucketed inverted-index
table (token → doc) in front and probe only rare terms fuzzily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from omni_crawler_spark.functions.text import WORD_SPLIT_RE

# ES multi_match boosts ×10 (advanced_search.py:52-58) — integer-exact sums
DEFAULT_FIELDS: dict[str, int] = {
    "title": 30,
    "content": 20,
    "key_phrases": 20,
    "authors": 15,
    "domain": 12,
}


def auto_max_edits(term: str) -> int:
    """ES ``fuzziness: AUTO``: 0 edits for length 1-2, 1 for 3-5,
    2 for 6+."""
    n = len(term)
    return 0 if n < 3 else 1 if n < 6 else 2


def multi_match(
    docs: DataFrame,
    query: str,
    fields: dict[str, int] | None = None,
    id_col: str = "doc_id",
    fuzziness: str | None = "AUTO",
    size: int = 20,
) -> DataFrame:
    """(id, score) for documents matching ``query`` over the boosted
    ``fields`` ({column: boost×10}), operator-OR semantics: a field
    scores its boost once per query term it (fuzzy-)matches."""
    fields = fields or {
        k: v for k, v in DEFAULT_FIELDS.items() if k in docs.columns
    }
    terms = [
        (t, auto_max_edits(t) if fuzziness == "AUTO" else 0)
        for t in query.lower().split()
        if t
    ]
    if not terms:
        raise ValueError("empty query")
    spark = docs.sparkSession
    term_df = spark.createDataFrame(terms, "term string, maxed int")
    long = docs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(fld).alias("fld"),
                    F.lit(b10).alias("boost10"),
                    F.col(fld).cast("string").alias("val"),
                )
                for fld, b10 in fields.items()
            ])
        ).alias("f"),
    ).select(id_col, "f.fld", "f.boost10", "f.val")
    toks = long.select(
        id_col, "fld", "boost10",
        F.explode(
            F.array_distinct(F.split(F.lower("val"), WORD_SPLIT_RE))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    matched = (
        toks.join(
            F.broadcast(term_df),
            F.levenshtein(F.col("tok"), F.col("term")) <= F.col("maxed"),
        )
        .select(id_col, "fld", "boost10", "term")
        .distinct()
    )
    return (
        matched.groupBy(id_col)
        .agg(F.round(F.sum("boost10").cast("double") / 10.0, 4).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), id_col)
        .limit(size)
    )


def _fragment(text_col, term: str, fragment_size: int = 150):
    """One fragment centred on the first occurrence of ``term``
    (advanced_search.py:122-123: fragment_size 150), every occurrence
    <mark>-tagged; NULL when the term is absent."""
    lt = F.lower(text_col)
    pos = F.instr(lt, term)
    half = fragment_size // 2 - 15
    frag = F.substring(
        lt, F.greatest(F.lit(1), pos - half).cast("int"), fragment_size
    )
    return F.when(
        pos > 0, F.replace(frag, F.lit(term), F.lit(f"<mark>{term}</mark>"))
    )


def highlight(
    docs: DataFrame,
    terms: list[str],
    content_col: str = "content",
    title_col: str | None = "title",
    preview_len: int = 300,
) -> DataFrame:
    """Adds ``title_hl`` (whole-field highlight, number_of_fragments 0)
    and ``content_preview`` ('...'.join(fragments)[:N] + '...',
    advanced_search.py:222-233) for docs containing any exact term."""
    terms = [t.lower() for t in terms]
    lt = F.lower(F.col(content_col))
    hit = F.lit(False)
    for t in terms:
        hit = hit | (F.instr(lt, t) > 0)
    out = docs.filter(hit)
    if title_col is not None:
        title_hl = F.lower(F.col(title_col))
        for t in terms:
            title_hl = F.replace(
                title_hl, F.lit(t), F.lit(f"<mark>{t}</mark>")
            )
        out = out.withColumn("title_hl", title_hl)
    preview = F.concat(
        F.substring(
            F.concat_ws(
                "...", *[_fragment(F.col(content_col), t) for t in terms]
            ),
            1,
            preview_len,
        ),
        F.lit("..."),
    )
    return out.withColumn("content_preview", preview)


def apply_filters(
    docs: DataFrame,
    domains: list[str] | None = None,
    categories: list[str] | None = None,
    date_from=None,
    date_to=None,
    min_quality: float | None = None,
    sentiment: str | None = None,
    min_length: int | None = None,
    ts_col: str = "processing_ts",
) -> DataFrame:
    """The bool-query filter conditions (advanced_search.py:66-105):
    terms / range / term filters as chained Catalyst predicates."""
    if domains:
        docs = docs.filter(F.col("domain").isin(domains))
    if categories:
        docs = docs.filter(F.col("category").isin(categories))
    if date_from is not None:
        docs = docs.filter(F.col(ts_col) >= F.lit(date_from))
    if date_to is not None:
        docs = docs.filter(F.col(ts_col) <= F.lit(date_to))
    if min_quality is not None:
        docs = docs.filter(F.col("quality_score") >= min_quality)
    if sentiment is not None:
        docs = docs.filter(F.col("sentiment_label") == sentiment)
    if min_length is not None:
        docs = docs.filter(F.col("content_length") >= min_length)
    return docs
