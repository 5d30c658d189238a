"""Gopher-style corpus quality signals (Rae et al. 2021 §A1.1).

One Arrow-vectorized kernel computes ALL per-doc shape/repetition
signals in a single pass — the full published battery: word-count
bounds, mean word length, alphabetic-word fraction, symbol-to-word
ratio (# and ellipsis), bullet/ellipsis line fractions, the
required-stop-word rule, duplicate word-bigram fraction, duplicate
3/4-gram character fractions and top-2/3/4-gram character fractions.
The pure-column alternative (aggregate / transform / filter HOFs +
gram-building transforms) is semantically identical but Spark never
codegens HOF lambdas — six nested interpreted HOFs per row measured
18.5 s at sf0.1 vs ~1 s for this kernel (the round-1
"interpreted-after-UDF" lesson: string-heavy per-row work belongs
inside the Arrow batch).

Cross-engine contract (the DuckDB twin in registry_corpus.py):

- words = lower(text) split on single spaces — empty tokens from
  repeated separators are KEPT, exactly like ``string_split`` /
  ``F.split``; total_chars = Σ len(word) (separators excluded);
- mean_raw = total_chars / n_words (raw double; int/int division is
  IEEE-exact so Python == Spark == DuckDB);
- alpha_raw = |{words containing an ASCII letter a-z}| / n_words
  (equals ``regexp_matches(w, '[a-z]')`` on the lowered word);
- dup_raw = (n_bigrams − n_distinct_bigrams) / n_bigrams, 0.0 for
  single-word docs; bigram identity via word tuples, which is
  injective to the ``w1 || ' ' || w2`` strings the SQL twin builds
  (words cannot contain the separator);
- symbol_raw = (#'#' + #'…' + #'...') / n_words, where '...' is the
  LEFT-TO-RIGHT NON-OVERLAPPING count (Python ``str.count`` ==
  DuckDB ``(len − len(replace(t,'...','')))/3``);
- lines = lower(text) split on '\\n'; a bullet line's space-trimmed
  form starts with '•', '- ' or '* '; an ellipsis line's ends with
  '...' or '…'; fractions are over n_lines (≥1 always);
- stop_hits = how many of the 8 Gopher stop words {the, be, to, of,
  and, that, have, with} occur as a whole word
  (``list_intersect(list_distinct(ws), [...])``);
- for k-grams (k=2,3,4): gram identity is the word tuple,
  chars(gram) = Σ len(word) over its words; with cnt(g) the gram's
  occurrence count and mc = max cnt,
  top_k_raw  = mc · max{chars(g): cnt(g)=mc} / total_chars
  (the max-chars tie-break makes the VALUE deterministic when
  several grams share the top count),
  dup_k_raw  = Σ_{cnt(g)≥2} cnt(g)·chars(g) / total_chars (k=3,4;
  overlapping occurrences are counted per occurrence, so the raw
  value may exceed 1 on degenerate text — it is a repetition
  signal, not a probability). Both are 0.0 when n_words < k or
  total_chars = 0;
- rounding is NOT done here: callers apply ``F.round`` JVM-side so
  half-up semantics match DuckDB ``ROUND`` (Python ``round`` is
  banker's — the one way this kernel could silently diverge).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

_SIG_TYPE = (
    "struct<n_words:bigint, mean_raw:double, alpha_raw:double, "
    "dup_raw:double, symbol_raw:double, bullet_raw:double, "
    "ellip_raw:double, stop_hits:bigint, dup3_raw:double, "
    "dup4_raw:double, top2_raw:double, top3_raw:double, "
    "top4_raw:double>"
)

_ALPHA = set("abcdefghijklmnopqrstuvwxyz")

# the Gopher required-stop-word list (Rae et al. 2021 §A1.1)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

_COLS = [
    "n_words", "mean_raw", "alpha_raw", "dup_raw", "symbol_raw",
    "bullet_raw", "ellip_raw", "stop_hits", "dup3_raw", "dup4_raw",
    "top2_raw", "top3_raw", "top4_raw",
]


def _gram_stats(ws, k: int, tc: int) -> tuple[float, float]:
    """(top_k_raw, dup_k_raw) per the module contract — the readable
    reference implementation (Counter over word tuples); the kernel
    uses the numpy-encoded :func:`_gram_stats_ids` twin (identical
    integer math, ~5-10x faster per Arrow batch), equality pinned by
    tests/test_corpus.py."""
    n = len(ws)
    if n < k or tc == 0:
        return 0.0, 0.0
    cnt = Counter(zip(*[ws[i:] for i in range(k)]))
    mc = max(cnt.values())
    top_chars = 0
    dup_chars = 0
    for g, c in cnt.items():
        chars = sum(map(len, g))
        if c == mc and chars > top_chars:
            top_chars = chars
        if c >= 2:
            dup_chars += c * chars
    return mc * top_chars / tc, dup_chars / tc


def _gram_stats_ids(ids, csum, k: int, tc: int) -> tuple[float, float]:
    """Vectorized twin of :func:`_gram_stats`: ``ids`` is the doc's
    word sequence as vocabulary indices (injective per doc, so a
    base-V positional encoding of a k-gram is injective to the word
    tuple), ``csum`` the word-length prefix sums. One np.unique per k
    replaces the per-gram Python Counter loop."""
    import numpy as np

    n = len(ids)
    if n < k or tc == 0:
        return 0.0, 0.0
    v = int(ids.max()) + 1 if n else 1
    keys = ids[: n - k + 1].astype(np.int64)
    for j in range(1, k):
        keys = keys * v + ids[j : n - k + 1 + j]
    _, first_idx, counts = np.unique(
        keys, return_index=True, return_counts=True
    )
    gchars = csum[first_idx + k] - csum[first_idx]
    mc = int(counts.max())
    top_chars = int(gchars[counts == mc].max())
    dup = counts >= 2
    dup_chars = int((counts[dup] * gchars[dup]).sum())
    return mc * top_chars / tc, dup_chars / tc


def gopher_signals_udf():
    @pandas_udf(_SIG_TYPE)
    def signals(texts: pd.Series) -> pd.DataFrame:
        out: dict[str, list] = {c: [] for c in _COLS}
        alpha_chars = _ALPHA
        stops = GOPHER_STOPS
        for t in texts:
            if t is None:
                for c in _COLS:
                    out[c].append(None)
                continue
            lt = t.lower()
            ws = lt.split(" ")
            n = len(ws)
            lens = [len(w) for w in ws]
            tc = sum(lens)
            alpha = sum(1 for w in ws if not alpha_chars.isdisjoint(w))
            if n >= 2:
                n_bi = n - 1
                dup = (n_bi - len(set(zip(ws, ws[1:])))) / n_bi
            else:
                dup = 0.0
            n_sym = lt.count("#") + lt.count("…") + lt.count("...")
            lines = lt.split("\n")
            n_bullet = n_ellip = 0
            for line in lines:
                s = line.strip(" ")
                if (
                    s.startswith("•")
                    or s.startswith("- ")
                    or s.startswith("* ")
                ):
                    n_bullet += 1
                if s.endswith("...") or s.endswith("…"):
                    n_ellip += 1
            wset = set(ws)
            stop_hits = sum(1 for s in stops if s in wset)
            # vocabulary-encode once (dict lookup beats a string-dtype
            # np.unique by ~10x on short docs); base-V positional gram
            # keys are injective while V^4 fits int64 (any real
            # document); the Counter twin covers the pathological
            # fallback
            vocab: dict[str, int] = {}
            ids = np.fromiter(
                (vocab.setdefault(w, len(vocab)) for w in ws),
                dtype=np.int64,
                count=n,
            )
            v = len(vocab)
            if v**4 < 2**62:
                wl = np.fromiter(map(len, ws), dtype=np.int64, count=n)
                csum = np.concatenate(([0], np.cumsum(wl)))
                top2, _d2 = _gram_stats_ids(ids, csum, 2, tc)
                top3, dup3 = _gram_stats_ids(ids, csum, 3, tc)
                top4, dup4 = _gram_stats_ids(ids, csum, 4, tc)
            else:
                top2, _d2 = _gram_stats(ws, 2, tc)
                top3, dup3 = _gram_stats(ws, 3, tc)
                top4, dup4 = _gram_stats(ws, 4, tc)
            out["n_words"].append(n)
            out["mean_raw"].append(tc / n)
            out["alpha_raw"].append(alpha / n)
            out["dup_raw"].append(dup)
            out["symbol_raw"].append(n_sym / n)
            out["bullet_raw"].append(n_bullet / len(lines))
            out["ellip_raw"].append(n_ellip / len(lines))
            out["stop_hits"].append(stop_hits)
            out["dup3_raw"].append(dup3)
            out["dup4_raw"].append(dup4)
            out["top2_raw"].append(top2)
            out["top3_raw"].append(top3)
            out["top4_raw"].append(top4)
        df = pd.DataFrame(out)
        df["n_words"] = df["n_words"].astype("Int64")
        df["stop_hits"] = df["stop_hits"].astype("Int64")
        return df

    return signals
