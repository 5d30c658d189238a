"""Named analytics queries (the reference's dashboard/search/export
surface re-expressed as DataFrame builders) plus DuckDB oracle twins.

Importing this package populates the full REGISTRY (core + enrich +
crawl + similarity modules register themselves on import).
"""

from omni_crawler_spark.analytics import registry as _core  # noqa: F401
from omni_crawler_spark.analytics import registry_crawl as _crawl  # noqa: F401
from omni_crawler_spark.analytics import registry_enrich as _enrich  # noqa: F401
from omni_crawler_spark.analytics import registry_extra as _extra  # noqa: F401
from omni_crawler_spark.analytics import registry_multimodal as _mm  # noqa: F401
from omni_crawler_spark.analytics import registry_phrases as _ph  # noqa: F401
from omni_crawler_spark.analytics import registry_search as _search  # noqa: F401
from omni_crawler_spark.analytics import registry_sim as _sim  # noqa: F401
from omni_crawler_spark.analytics import registry_sources as _src  # noqa: F401
from omni_crawler_spark.analytics import registry_streaming as _stream  # noqa: F401
from omni_crawler_spark.analytics.registry import REGISTRY  # noqa: F401
