"""Batched fetch + clean + extract + validate — ONE Arrow stage.

The north rule's words, taken literally: "a batched fetch+clean+
validate stage expressed entirely as DataFrame ops and vectorized
pandas/Arrow UDFs — no per-row Python [dispatch]". One ``mapInPandas``
takes an Arrow batch of scheduled URLs and emits finished article
records: fetch, HTML clean, title/caption/image extraction, token
counts, validity gates, article id, quality score, category.

Why not JVM column expressions for the clean/validate part? Measured
in round 1 (PLANS.md): downstream of a Python eval node Spark runs
expressions *interpreted* (no whole-stage codegen, no subexpression
elimination), so the regex cascade + higher-order-function token
filters cost ~2-7 ms/row and inflated with thread count (GC-bound in
one local-mode heap) — the fetch stage pinned 32 cores at 93% for
~73 s on 331k rows. The same logic inside the already-running Python
batch costs ~0.08 ms/row and scales with worker processes, which is
also the production shape (independent executor heaps). The JVM-
column twins of these functions live in functions/text.py + enrich.py
and serve the (codegen'd, oracle-verified) analytics registry.

Reference parity (regexes identical to tests/reference_sim.py):
title F5 (simple_crawler.py:103-120), HTML clean F8
(content_cleaner.py:221-244,276-288), meta-description caption
(multi_engine_crawler.py:201-212), gates P2-P4/P9
(simple_crawler.py:187-213; content_cleaner.py:246-274), id F2
(simple_crawler.py:134-143), quality N7
(content_enhancement.py:155-200), category N8 (:202-219).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from omni_crawler_spark.frontier.synthetic import synth_page_html

_RE_HEAD = re.compile(r"(?is)<head[^>]*>.*?</head>")
_RE_BLOCKS = re.compile(r"(?is)<(script|style|noscript|template)[^>]*>.*?</\1>")
_RE_COMMENTS = re.compile(r"(?s)<!--.*?-->")
_RE_TAGS = re.compile(r"(?s)<[^>]+>")
_RE_WS = re.compile(r"\s+")
_RE_TITLE = re.compile(r"(?is)<title[^>]*>(.*?)</title>")
_RE_META_DESC = re.compile(r'(?i)<meta name="description" content="([^"]*)"')
_RE_IMG = re.compile(r'(?i)<img src="/([^"]+)\.png"')
_RE_LINK = re.compile(r'(?i)<a href="(/[^"]*)"')
_RE_WORDS = re.compile(r"[^a-z0-9']+")
_RE_SENTS = re.compile(r"(?<=[.!?])\s+")
_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
]
ERROR_PAGE_PATTERNS = [
    "page not found", "404 error", "access denied", "forbidden",
    "server error", "service unavailable",
]
CATEGORY_KEYWORDS = [
    ("politics", ["election", "government", "president", "congress", "policy"]),
    ("sports", ["game", "team", "player", "championship", "league"]),
    ("technology", ["tech", "software", "ai", "computer", "startup"]),
    ("business", ["market", "economy", "company", "stock", "trade"]),
    ("health", ["health", "medical", "disease", "treatment", "hospital"]),
    ("entertainment", ["movie", "music", "celebrity", "film", "show"]),
]


def clean_html_py(html: str) -> str:
    """Python twin of functions/text.py::clean_html (same regexes)."""
    s = _RE_BLOCKS.sub(" ", html)
    s = _RE_COMMENTS.sub(" ", s)
    s = _RE_TAGS.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _RE_WS.sub(" ", s).strip()


def extract_title_py(html: str, domain: str) -> str:
    m = _RE_TITLE.search(html)
    t = _RE_WS.sub(" ", m.group(1)).strip()[:500] if m else ""
    return t if t else f"Article from {domain}"


def process_page(
    url: str, host: str, url_hash: int, crawl_seq: int
) -> dict:
    """Fetch one page (synthetic server) and produce the article
    record — the per-row codec invoked from the Arrow batch loop."""
    status, html = synth_page_html(int(url_hash), int(crawl_seq))
    content = clean_html_py(_RE_HEAD.sub(" ", html))
    lower = content.lower()
    title = extract_title_py(html, host)
    m = _RE_META_DESC.search(html)
    mi = _RE_IMG.search(html)
    image_id = mi.group(1) if mi else None
    # S-discovery: outgoing same-host links (relative hrefs -> absolute)
    links = [f"https://{host}{p}" for p in _RE_LINK.findall(html)]
    words = [w for w in _RE_WORDS.split(lower) if w]
    n_words = len(words)
    n_chars = len(content)
    sents = [s for s in _RE_SENTS.split(content) if s.strip()]
    n_sents = len(sents)
    avg_words = n_words / n_sents if n_sents else 0.0
    valid = (
        status == 200
        and n_chars >= 200
        and n_words >= 50
        and not any(p in lower for p in ERROR_PAGE_PATTERNS)
        and n_sents >= 2
        and 3 < avg_words < 50
        and len(title) >= 10
    )
    # F2: article_{md5(url)[:8]}_{md5(content)[:8]}
    article_id = (
        "article_"
        + hashlib.md5(url.encode()).hexdigest()[:8]
        + "_"
        + hashlib.md5(content.encode()).hexdigest()[:8]
    )
    # N7 quality rubric
    n_entities = min(12, n_words // 30)
    q = 0
    q += 30 if n_chars >= 2000 else 20 if n_chars >= 1000 else \
         15 if n_chars >= 500 else 10 if n_chars >= 200 else 0
    tl = len(title)
    q += 20 if 10 <= tl <= 100 else 10 if tl > 0 else 0
    q += 30 if n_entities >= 10 else 20 if n_entities >= 5 else \
         10 if n_entities >= 1 else 0
    q += 10  # authors (synthetic pages always carry one)
    q += 10 if image_id is not None else 0
    q = min(100, q)
    # N8 category: first keyword-list hit wins
    category = "general"
    for cat, kws in CATEGORY_KEYWORDS:
        if any(kw in lower for kw in kws):
            category = cat
            break
    return {
        "status": status,
        "links": links,
        "title": title,
        "content": content,
        "caption": m.group(1) if m else "",
        "image_id": image_id,
        "word_count": n_words,
        "content_length": n_chars,
        "valid": valid,
        "article_id": article_id,
        "quality_score": q,
        "category": category,
    }


ARTICLE_FIELDS = [
    StructField("status", IntegerType()),
    StructField("links", ArrayType(StringType())),
    StructField("title", StringType()),
    StructField("content", StringType()),
    StructField("caption", StringType()),
    StructField("image_id", StringType()),
    StructField("word_count", IntegerType()),
    StructField("content_length", IntegerType()),
    StructField("valid", BooleanType()),
    StructField("article_id", StringType()),
    StructField("quality_score", IntegerType()),
    StructField("category", StringType()),
]


def fetch_extract_validate(scheduled: DataFrame) -> DataFrame:
    """scheduled rows → finished article records (one Arrow stage).
    The raw html never crosses back to the JVM — only extracted
    columns do (at 100 TB: shuffle articles, not pages)."""
    out_schema = StructType(scheduled.schema.fields + ARTICLE_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                process_page(u, h, uh, cs)
                for u, h, uh, cs in zip(
                    pdf["url_canonical"], pdf["host"],
                    pdf["url_hash"], pdf["crawl_seq"],
                )
            ]
            cols = pd.DataFrame(recs, index=pdf.index)
            yield pd.concat([pdf, cols], axis=1)

    return scheduled.mapInPandas(run, out_schema)
