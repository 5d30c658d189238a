"""Corpus-level training-data operators (analytics/registry_corpus.py):
invariants the DuckDB oracle cannot express — planted-duplicate recall,
BM25 ordering semantics, PageRank mass conservation, sampling
determinism across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from omni_crawler_spark.analytics import REGISTRY

SF = "/root/testdata/sf0.001"


def test_dedup_passage_finds_planted_copies(spark):
    """Every planted full copy (doc_id+100000, doc_id<10) must pair
    with its original, sharing all of the original's full chunks."""
    got = REGISTRY["dedup_passage"].build(spark, SF).collect()
    pairs = {(r.id_a, r.id_b): r.n_shared_passages for r in got}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 10)
        .select("doc_id", F.size(F.split("text", " ")).alias("n_words"))
        .collect()
    )
    for d in docs:
        want = d.n_words // 20
        if want >= 1:
            assert pairs[(d.doc_id, d.doc_id + 100000)] == want


def test_passage_dedup_hot_bucket_capped(spark):
    """A boilerplate passage shared by 300 docs must contribute ZERO
    join rows when it exceeds the bucket cap (uncapped it would be
    300·299/2 ≈ 45k pairs from one passage — the 10^10-row blowup
    shape at web scale); organically-duplicated passages under the
    cap are still found."""
    from omni_crawler_spark.operators.dedup import passage_dup_pairs

    boiler = " ".join(f"w{i}" for i in range(20))
    uniq = " ".join(f"u{i}" for i in range(20))
    rows = [(i, boiler) for i in range(300)]
    rows += [(1000, uniq), (1001, uniq)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = passage_dup_pairs(df, max_bucket_size=100).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(1000, 1001)}
    # sanity: the cap (not the chunker) is what bounded the blowup
    n_uncapped = passage_dup_pairs(df, max_bucket_size=None).count()
    assert n_uncapped == 300 * 299 // 2 + 1


def test_bm25_orders_by_term_density(spark):
    """A doc stuffed with the query terms must outrank every real doc,
    and scores must be non-increasing down the result."""
    rows = REGISTRY["search_bm25"].build(spark, SF).collect()
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)  # every hit matched >=1 term


def test_sample_stratified_is_partition_invariant(spark):
    """Identical sample regardless of input partitioning — the whole
    point of hash-keyed sampling (no RNG, no partition order). The
    second run executes the SAME query under a different input-split
    size and shuffle-partition count, so the rows genuinely flow
    through a different partitioning of the same plan."""
    q = REGISTRY["sample_stratified"].build
    a = {(r.doc_id, r.lang, r.strat_rank) for r in q(spark, SF).collect()}
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        b = {(r.doc_id, r.lang, r.strat_rank) for r in q(spark, SF).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
    assert a == b
    # exactly N per stratum (or the whole stratum when smaller)
    per = {}
    for _, lang, _ in a:
        per[lang] = per.get(lang, 0) + 1
    total = dict(
        spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .count()
        .collect()
    )
    for lang, n in per.items():
        assert n == min(30, total[lang])


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    """Full rank vector sums to ~1.0 (stochastic with no dangling
    nodes) and the top-25 query returns the true global top-25."""
    from omni_crawler_spark.analytics.registry_corpus import (
        _PR_D,
        _PR_ITERS,
    )

    assert _PR_D == 0.85 and _PR_ITERS >= 3
    top = REGISTRY["graph_pagerank"].build(spark, SF).collect()
    assert len(top) == 25
    ranks = [r.pagerank for r in top]
    assert ranks == sorted(ranks, reverse=True)
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    # uniform-start mass bound: every rank in (0.15/n, 1)
    assert all(0.15 / n <= r < 1.0 for r in ranks)
    # hubs (more in-links by construction) beat the uniform rank
    assert ranks[0] > 1.0 / n


def test_corpus_quantiles_match_numpy(spark):
    import numpy as np

    got = {
        r.lang: (r.n_docs, r.p25, r.p50, r.p75)
        for r in REGISTRY["corpus_quantiles"].build(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_lang = {}
    by_lang_setdefault = by_lang.setdefault
    for d in docs:
        by_lang_setdefault(d.lang, []).append(d.n_chars)
    for lang, vals in by_lang.items():
        n, p25, p50, p75 = got[lang]
        assert n == len(vals)
        for p, want in zip(
            (p25, p50, p75),
            np.percentile(np.array(vals, dtype="float64"), [25, 50, 75]),
        ):
            assert abs(p - round(float(want), 4)) < 1e-9


def test_chunk_windows_cover_every_word_with_fixed_overlap(spark):
    """Every word index of every doc falls in >=1 window; consecutive
    windows overlap by exactly width-stride except the tail; chunk_len
    is exact for the tail."""
    from omni_crawler_spark.analytics.registry_corpus import (
        _CHUNK_STRIDE,
        _CHUNK_W,
    )

    rows = REGISTRY["corpus_chunk_windows"].build(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_len))
    n_words = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    assert set(by_doc) == set(n_words)
    for doc, chunks in by_doc.items():
        chunks.sort()
        ids = [c for c, _ in chunks]
        assert ids == list(range(len(ids)))  # contiguous chunk ids
        n = n_words[doc]
        last_id, last_len = chunks[-1]
        # full coverage: the last window reaches the last word
        assert last_id * _CHUNK_STRIDE + last_len == n
        for cid, clen in chunks[:-1]:
            assert clen == min(_CHUNK_W, n - cid * _CHUNK_STRIDE)


def test_decontaminate_flags_known_cliques(spark):
    """The eval docs' planted near-dups share long substrings and
    must be flagged; eval docs themselves never appear."""
    rows = REGISTRY["filter_decontaminate"].build(spark, SF).collect()
    flagged = {r.doc_id for r in rows}
    assert {50, 82, 12, 114} <= flagged  # cliques of eval docs 0/8/89
    assert flagged.isdisjoint({0, 8, 89})
    assert all(r.n_hit_grams > 0 for r in rows)


def test_gopher_rules_verdict_semantics(spark):
    """Verdict must be exactly the conjunction of the rounded-signal
    thresholds (full battery), and short docs (<50 words) must drop."""
    rows = REGISTRY["filter_gopher_quality"].build(spark, SF).collect()
    assert len(rows) > 0
    seen = {r.verdict for r in rows}
    assert seen == {"keep", "drop"}  # corpus genuinely splits
    for r in rows:
        want = (
            50 <= r.n_words <= 100000
            and 3 <= r.mean_word_len <= 10
            and r.alpha_frac >= 0.8
            and r.dup_bigram_frac <= 0.6
            and r.symbol_ratio <= 0.1
            and r.bullet_line_frac <= 0.9
            and r.ellipsis_line_frac <= 0.3
            and r.stop_hits >= 1
            and r.dup_3gram_frac <= 0.5
            and r.dup_4gram_frac <= 0.4
            and r.top_2gram_frac <= 0.20
            and r.top_3gram_frac <= 0.18
            and r.top_4gram_frac <= 0.16
        )
        assert (r.verdict == "keep") == want, r
        assert 0.0 <= r.dup_bigram_frac < 1.0


def test_gopher_kernel_crafted_signals(spark):
    """The signals the parquet corpus can't exercise (no newlines, no
    symbols): hand-computed values for crafted bullet/ellipsis/symbol
    /repetition docs, straight through the Arrow kernel."""
    from omni_crawler_spark.operators.quality import gopher_signals_udf

    docs = [
        # 0: bullets + ellipsis lines + symbols
        ("• first item\n- second thing\nplain line\nwait for it...\n"
         "more # and # plus … and ..."),
        # 1: heavy 3-gram repetition ("a b c" ×3 in 9 words)
        ("a b c a b c a b c"),
        # 2: all-distinct words, no repetition
        ("the quick brown fox jumps over lazy dogs"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i long, text string"
    )
    got = {
        r.i: r.g
        for r in df.select(
            "i", gopher_signals_udf()(F.col("text")).alias("g")
        ).collect()
    }
    g0 = got[0]
    n0 = len(docs[0].split(" "))  # split on spaces only — '\n' stays
    assert g0.n_words == n0
    # 5 lines: 2 bullet-led ('• ', '- '); 2 end in '...'
    assert g0.bullet_raw == 2 / 5
    assert g0.ellip_raw == 2 / 5
    # symbols: '#'x2 + '…'x1 + '...'x2 ("it..." and the final "...")
    assert g0.symbol_raw == 5 / n0
    # space-split words include 'and' (twice) but no other whole-word
    # Gopher stop ('for' is not in the list; 'it...' carries dots)
    assert g0.stop_hits == 1
    g1 = got[1]
    # ws = 9 words, tc = 9 chars. 3-grams (7 with overlap): (a,b,c)x3,
    # (b,c,a)x2, (c,a,b)x2 — ALL duplicated:
    # dup3 = (3*3 + 2*3 + 2*3)/9 = 21/9; top3 = 3*3/9 = 1.0
    assert abs(g1.dup3_raw - 21 / 9) < 1e-12
    assert g1.top3_raw == 1.0
    assert g1.stop_hits == 0
    g2 = got[2]
    assert g2.dup3_raw == 0.0 and g2.dup4_raw == 0.0
    assert g2.stop_hits == 1  # only 'the' of the 8 stop words
    # all bigrams distinct: top2 = 1 * max-bigram-chars / tc
    ws2 = docs[2].split(" ")
    tc2 = sum(len(w) for w in ws2)
    best = max(len(a) + len(b) for a, b in zip(ws2, ws2[1:]))
    assert abs(g2.top2_raw - best / tc2) < 1e-12


def test_mix_weights_recover_target_mixture(spark):
    """sample_weight × actual tokens must equal the uniform target
    share of the total for every source (that is the definition of a
    reweighting), and weights must upsample scarce sources."""
    rows = REGISTRY["corpus_mix_weights"].build(spark, SF).collect()
    total = sum(r.n_tokens for r in rows)
    k = len(rows)
    for r in rows:
        assert abs(r.sample_weight * r.n_tokens - total / k) / (total / k) < 1e-3
    scarcest = min(rows, key=lambda r: r.n_tokens)
    richest = max(rows, key=lambda r: r.n_tokens)
    assert scarcest.sample_weight >= richest.sample_weight


def test_gram_stats_numpy_twin_equals_counter():
    """The vectorized base-V gram encoder must compute bit-identical
    (top, dup) fractions to the readable Counter reference across
    random small-vocab word lists (the collision-heavy worst case)."""
    import random

    import numpy as np

    from omni_crawler_spark.operators.quality import (
        _gram_stats,
        _gram_stats_ids,
    )

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "dd", "e", "ffff", "g", ""]
    for trial in range(200):
        n = rng.randint(1, 40)
        ws = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        tc = sum(map(len, ws))
        _, ids = np.unique(np.asarray(ws), return_inverse=True)
        wl = np.fromiter(map(len, ws), dtype=np.int64, count=n)
        csum = np.concatenate(([0], np.cumsum(wl)))
        for k in (2, 3, 4):
            ref = _gram_stats(ws, k, tc)
            got = _gram_stats_ids(ids, csum, k, tc)
            assert got == ref, (trial, k, ws)
