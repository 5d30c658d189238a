"""Deterministic synthetic crawl universe (seed list, hosts, pages).

Everything is a pure function of the row id / URL via column
expressions or stable per-key RNG — identical output for any
partitioning, any parallelism, any run. That determinism is what
makes the byte-identical-ordering and resume tests meaningful
(SURVEY §5.2 items 2/5/6).

Mirrors the discovery dicts of the reference
(src/discovery/url_discovery_engine.py:42-49,78-83) and the FIXTURES.md
§2/§4 schemas: Zipf-skewed hosts (exercises salting), raw-URL variants
that canonicalize to the same page (exercises dedup), robots-disallowed
paths, and per-host crawl-delay budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 50
BASE_TS = "2025-01-01 00:00:00"


def _host_idx(id_col):
    """Zipf-ish skewed host index in [0, N_HOSTS): exponential decay —
    host0 gets ~20x the tail's traffic (exercises skew lanes)."""
    u = (F.pmod(F.xxhash64(id_col, F.lit(7)), 100000) / 100000.0)
    idx = F.floor(-F.log(1.0 - u * 0.9999) * (N_HOSTS / 5.0))
    return F.least(F.lit(N_HOSTS - 1), idx).cast("int")


def generate_seeds(
    spark: SparkSession, n_urls: int, partitions: int = 8
) -> DataFrame:
    """Seed frontier entries. ~10% raw-duplicate pairs (ids with
    id%10==1 are a messy re-spelling of id-1's URL), ~8% robots-
    disallowed paths ('/private/...'), mixed rss/sitemap priorities."""
    ids = spark.range(0, n_urls, 1, partitions)
    id_col = F.col("id")
    # the page identity: duplicates point at the previous id's page
    page_id = F.when(id_col % 10 == 1, id_col - 1).otherwise(id_col)
    host_idx = _host_idx(page_id)
    host = F.concat(F.lit("host"), host_idx.cast("string"), F.lit(".example.com"))
    section = F.when(
        F.pmod(F.xxhash64(page_id, F.lit(11)), 100) < 8, F.lit("private")
    ).otherwise(
        F.concat(F.lit("sec"), F.pmod(page_id, 7).cast("string"))
    )
    path = F.concat(
        F.lit("/"), section, F.lit("/article-"), page_id.cast("string")
    )
    # raw variants: the duplicate spelling adds www., :443, fragment,
    # permuted query params
    # pages with page_id%3==0 carry a query string; the messy duplicate
    # spelling permutes it so canonicalization must re-collide them
    clean_url = F.concat(
        F.lit("https://"), host, path,
        F.when(page_id % 3 == 0, F.lit("?a=1&b=2")).otherwise(F.lit("")),
    )
    messy_url = F.concat(
        F.lit("https://www."), host, F.lit(":443"), path,
        F.when(page_id % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        F.lit("#ref"),
    )
    url = F.when(id_col % 10 == 1, messy_url).otherwise(clean_url)
    return ids.select(
        url.alias("url"),
        F.when(id_col % 2 == 0, "rss").otherwise("sitemap").alias("source"),
        F.when(id_col % 2 == 0, 10).otherwise(5).alias("priority"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(secs=id_col.cast("double"))
        ).alias("discovery_ts"),
        F.concat(F.lit("Seed title "), page_id.cast("string")).alias("title"),
    )


def generate_hosts(spark: SparkSession) -> DataFrame:
    """Per-host politeness config (FIXTURES.md §4): crawl delay,
    parallelism cap, robots disallow prefixes."""
    h = spark.range(0, N_HOSTS)
    idx = F.col("id").cast("int")
    return h.select(
        F.concat(F.lit("host"), idx.cast("string"), F.lit(".example.com")).alias(
            "host"
        ),
        F.element_at(
            F.array(F.lit(0), F.lit(100), F.lit(500), F.lit(1000)),
            (F.pmod(idx, 4) + 1).cast("int"),
        ).alias("crawl_delay_ms"),
        F.element_at(
            F.array(F.lit(1), F.lit(2), F.lit(4)), (F.pmod(idx, 3) + 1).cast("int")
        ).alias("max_parallel"),
        F.array(F.lit("/private")).alias("robots_disallow"),
    )


# --------------------------------------------------------------------------
# Synthetic page server (stands in for the HTTP fetch, S3 in SURVEY §2.1;
# deterministic per-URL so fetch results are reproducible anywhere)
# --------------------------------------------------------------------------

PAGE_WORDS = [
    "market", "economy", "company", "growth", "election", "government",
    "policy", "technology", "software", "startup", "health", "hospital",
    "game", "team", "player", "music", "film", "success", "crisis",
    "the", "and", "is", "in", "to", "of", "a", "that", "it", "for",
]


def synth_page_html(url_hash: int, article_no: int) -> tuple[int, str]:
    """(status, html) for a URL — pure function of its 64-bit hash.
    ~5% 404s, ~3% error-pages, ~4% thin content (trips the quality
    gate), else a full article with title/meta-description/body.

    Pages carry realistic BOILERPLATE (nav, ad div with an
    ad-indicator class, newsletter prompt, footer) and one of three
    body structures, so the main-content extractor's cascade
    (frontier/fetch.py::extract_main_content_py, mirroring
    content_cleaner.py:113-195) is exercised end-to-end:

    - variant 0: ``<article><p>…</p></article>`` (generic 'article p')
    - variant 1: ``<main>`` with per-sentence ``<p>`` ('main p')
    - variant 2: ``<div class="storytext">`` with per-sentence ``<p>``
      (domain-selector path on selector hosts; all-<p> last resort
      elsewhere — same extracted text either way)
    """
    import numpy as np

    rng = np.random.default_rng(url_hash & 0xFFFFFFFFFFFF)
    roll = rng.integers(0, 100)
    if roll < 5:
        return 404, "<html><title>404</title><body>Not here</body></html>"
    if roll < 8:
        return 200, (
            "<html><title>Error</title><body>Page not found — the "
            "requested resource is gone.</body></html>"
        )
    title = f"Article {article_no}: " + " ".join(
        PAGE_WORDS[i] for i in rng.integers(0, len(PAGE_WORDS), 4)
    )
    n_words = 30 if roll < 12 else int(rng.integers(120, 400))
    body_words = [PAGE_WORDS[i] for i in rng.integers(0, len(PAGE_WORDS), n_words)]
    # sprinkle sentence ends so sentence-structure sanity passes
    sents = []
    i = 0
    while i < len(body_words):
        j = min(len(body_words), i + int(rng.integers(8, 15)))
        sents.append(" ".join(body_words[i:j]) + ".")
        i = j
    body = " ".join(sents)
    caption = f"A photo of the {PAGE_WORDS[int(rng.integers(0, 19))]} scene."
    image_id = f"img_{int(rng.integers(0, 10**8)):08d}"
    # ~25% of pages link onward (same host, relative hrefs) — the
    # discovery source that grows the frontier across cycles
    links = ""
    if rng.integers(0, 100) < 25:
        n_links = int(rng.integers(1, 3))
        for _ in range(n_links):
            links += (
                f'<a href="/sec{int(rng.integers(0, 7))}'
                f'/article-{int(rng.integers(0, 10**6))}">more</a>'
            )
    variant = int(rng.integers(0, 3))
    if variant == 0:
        main_block = f"<article><p>{body}</p></article>"
    else:
        paras = "".join(f"<p>{s}</p>" for s in sents)
        if variant == 1:
            main_block = f"<main>{paras}</main>"
        else:
            main_block = f'<div class="storytext">{paras}</div>'
    html = (
        f"<html><head><title> {title} </title>"
        f'<meta name="description" content="{caption}">'
        f"</head><body><script>var x=1;</script>"
        f'<nav><a href="#top">Home</a> Sections Topics Trending Now</nav>'
        f'<div class="advertisement">ADVERTISEMENT Sign up for our '
        f"newsletter today</div>"
        f"{main_block}"
        f'<img src="/{image_id}.png">{links}'
        f"<footer>Follow us on the usual networks. © Example Media.</footer>"
        f"</body></html>"
    )
    return 200, html


_SITEMAP_SALT = 0x51745


def synth_sitemap_xml(host: str, url_hash: int) -> str:
    """Deterministic sitemap XML served for a host's ``/sitemap.xml``
    URL — the synthetic-web analog of the reference's sitemap source
    (url_discovery_engine.py:58-89 parses exactly this shape). 3-6
    ``<loc>`` entries pointing at same-host article pages; pure
    function of (host, url hash) like every other synthetic fetch."""
    import numpy as np

    rng = np.random.default_rng((url_hash & 0xFFFFFFFFFFFF) ^ _SITEMAP_SALT)
    n = int(rng.integers(3, 7))
    locs = "".join(
        f"<url><loc>https://{host}/sec{int(rng.integers(0, 7))}"
        f"/article-{int(rng.integers(0, 10**6))}</loc></url>"
        for _ in range(n)
    )
    return f'<?xml version="1.0" encoding="UTF-8"?><urlset>{locs}</urlset>'
