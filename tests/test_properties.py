"""Property-based tests (hypothesis, derandomized): the fast-path
clean kernels must be byte-equivalent to their plain-regex forms over
arbitrary inputs, and URL canonicalization must be idempotent."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from omni_crawler_spark.frontier import fetch as FX
from tests import reference_sim as SIM

SETTINGS = settings(max_examples=300, derandomize=True, deadline=None)

# text with the interesting ingredients: entities, whitespace runs,
# tags, the unwanted patterns
_ingredient = st.sampled_from(
    [
        "&amp;", "&lt;", "&nbsp;", "&unknown;", "&", ";",
        " ", "  ", "\t", "\n", " ",
        "<b>", "</b>", "<p class='x'>", "<", ">",
        "ADVERTISEMENT", "advertisement", "Sign up for our newsletter",
        "Sign up for", "Follow us on", "Transcript", "Listen · 3:45",
        "word", "W0rd'", "τεστ", ".", "!",
    ]
)
texts = st.lists(_ingredient, min_size=0, max_size=40).map("".join)


def naive_clean_text(text: str) -> str:
    """The unguarded reference cascade (content_cleaner.py:221-244)."""
    for ent, ch in FX._ENTITIES:
        text = text.replace(ent, ch)
    for pat in FX._UNWANTED_TEXT:
        text = pat.sub("", text)
    return re.sub(r"\s+", " ", text).strip()


@SETTINGS
@given(texts)
def test_clean_text_fastpath_equivalent(t):
    assert FX.clean_text_py(t) == naive_clean_text(t)


@SETTINGS
@given(texts)
def test_element_text_fastpath_equivalent(t):
    naive = re.sub(r"\s+", " ", re.sub(r"(?s)<[^>]+>", " ", t)).strip()
    assert FX._element_text(t) == naive


# URL canonicalization: build structurally valid URLs from parts
_urls = st.builds(
    lambda scheme, www, host, port, path, q, frag: (
        f"{scheme}://{'www.' if www else ''}{host}"
        f"{port}{path}{q}{frag}"
    ),
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.booleans(),
    st.sampled_from(["Example.com", "h1.test.org", "a.b.c.d"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/x", "/x/y/", "/x%20y"]),
    st.sampled_from(["", "?a=1", "?b=2&a=1", "?z=", "?"]),
    st.sampled_from(["", "#f", "#a/b"]),
)


@SETTINGS
@given(_urls)
def test_canonicalize_idempotent_and_matches_sim(url):
    c1 = SIM.canonicalize(url)
    assert SIM.canonicalize(c1) == c1  # idempotence
    # canonical form invariants
    assert c1.split("://")[0] in ("http", "https")
    host = SIM.host_of(c1)
    assert not host.startswith("www.")
    assert host == host.lower()
    assert "#" not in c1
