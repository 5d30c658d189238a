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
# round (insertion order of REGISTRY). Rounds 1-2 hard-verified the
# long-standing core queries; the entries below had only local-mimic
# evidence through round 2, so they are pulled to the front of the
# window for round 3 (never-driver-checked oracle-paired queries
# first, then never-checked rows-only ones, then this round's new
# queries). Everything else keeps its registration order behind them
# — the driver re-checks ~20 of the prior greens each round.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_PRIORITY = [
    # never driver-checked through r2, oracle-paired
    "sim_topk_cosine",
    "dedup_embedding_cosine",
    "dedup_cluster_cc",
    "source_rss_parse",
    "source_sitemap_parse",
    "scalar_html_extract",
    "scalar_datetime_parse",
    "join_semi_recent",
    "clean_main_content",
    "alerts_eval",
    "alerts_cooldown_bucket",
    "window_tumbling_hourly",
    "window_trailing_recent",
    "search_rank",
    "validator_score",
    "enrich_entities_regex",
    "window_history_trim",
    # never driver-checked through r2, rows-only by design
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_pq_topk",
    "dedup_embedding_pipeline",
    "agg_approx_distinct",
    "alerts_cooldown_greedy",
    # new in round 3 (registered by the modules above; absent names
    # are skipped, so this list is safe against renames)
    "search_sorted_quality",
    "search_sorted_date",
    "dedup_cluster_cc_star",
    "pipeline_training_data",
    "pipeline_multimodal",
    "text_langid_ngram",
    "tpch_q5_local_supplier",
    "text_embed_ann",
    "dedup_passage",
    "search_bm25",
    "sample_stratified",
    "graph_pagerank",
    "corpus_quantiles",
    "window_topk_salted",
    "join_bucketed_colocated",
    "dedup_incremental_batch",
    "corpus_chunk_windows",
    "sim_ivf_incremental",
    "filter_decontaminate",
    "pipeline_pretrain_corpus",
    "layout_partition_prune",
    "tpch_q3_shipping",
    # plan changed in round 3 (multi_match now probes the inverted
    # index) — keep inside the window so the driver re-verifies it
    "search_fulltext",
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
