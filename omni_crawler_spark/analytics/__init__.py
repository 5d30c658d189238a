"""Named analytics queries (the reference's dashboard/search/export
surface re-expressed as DataFrame builders) plus DuckDB oracle twins.

Importing this package populates the full REGISTRY (core + enrich +
crawl + similarity modules register themselves on import).
"""

from omni_crawler_spark.analytics import registry as _core  # noqa: F401
from omni_crawler_spark.analytics import registry_corpus as _corpus  # noqa: F401
from omni_crawler_spark.analytics import registry_crawl as _crawl  # noqa: F401
from omni_crawler_spark.analytics import registry_enrich as _enrich  # noqa: F401
from omni_crawler_spark.analytics import registry_extra as _extra  # noqa: F401
from omni_crawler_spark.analytics import registry_multimodal as _mm  # noqa: F401
from omni_crawler_spark.analytics import registry_phrases as _ph  # noqa: F401
from omni_crawler_spark.analytics import registry_scale as _scale  # noqa: F401
from omni_crawler_spark.analytics import registry_search as _search  # noqa: F401
from omni_crawler_spark.analytics import registry_sim as _sim  # noqa: F401
from omni_crawler_spark.analytics import registry_sources as _src  # noqa: F401
from omni_crawler_spark.analytics import registry_streaming as _stream  # noqa: F401
from omni_crawler_spark.analytics.registry import REGISTRY  # noqa: F401

# ---------------------------------------------------------------------------
# Driver-window priority order.
#
# The correctness driver checks the FIRST 50 entries of queries() per
# round (insertion order of REGISTRY). Round-4 rotation policy: lead
# with the queries whose code/plan/persisted-state changed THIS round
# (the driver must re-verify them), then the oracle-paired queries
# whose newest driver green is oldest (the round-2 set — round 3
# re-checked everything else). After this round no oracle-paired
# query's newest driver green predates r03. Absent names are skipped,
# so the list is safe against renames.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_PRIORITY = [
    # changed in round 4: persisted search index, hashed+capped
    # passage dedup, PageRank oracle constant, new verify query,
    # fingerprint-keyed cache roots (fresh persisted state)
    "search_fulltext",
    "dedup_passage",
    "graph_pagerank",
    "dedup_minhash_verify",
    "filter_gopher_quality",
    "corpus_mix_weights",
    "dedup_incremental_batch",
    "sim_ivf_incremental",
    "join_bucketed_colocated",
    "layout_partition_prune",
    "sample_stratified",
    # newest driver green is round 2 — oracle-paired, oldest first
    "text_token_count",
    "search_highlight",
    "search_facets",
    "agg_count_distinct",
    "agg_multi_stat",
    "agg_by_category",
    "agg_domain_topn",
    "agg_daily_counts",
    "agg_pivot_daily_type",
    "agg_word_topk",
    "agg_quality_buckets",
    "agg_success_rate",
    "agg_search_analytics",
    "window_recent_100",
    "window_topk",
    "window_pagination",
    "window_per_group_topk",
    "join_fact_dim",
    "join_lineitem_part",
    "dedup_exact_hash",
    "set_union",
    "tpch_q1_pricing",
    "url_canonicalize",
    "frontier_seen_antijoin",
    "frontier_priority_order",
    "filter_content_quality",
    "scalar_hash_ids",
    "enrich_doc_profile",
    "enrich_sentiment",
    "enrich_categorize",
    "enrich_quality_rubric",
    "enrich_confidence",
    "text_fingerprint",
    "json_extract_props",
    "window_moving_avg",
    "agg_cube",
    "set_intersect_except",
    "join_range_bucket",
    "dedup_ngram_jaccard",
]


def _apply_priority_order() -> None:
    ordered = {
        name: REGISTRY[name]
        for name in _DRIVER_WINDOW_PRIORITY
        if name in REGISTRY
    }
    for name, q in list(REGISTRY.items()):
        ordered.setdefault(name, q)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_priority_order()
