"""Planted-duplicate tests for the approximate dedup family — the
correctness evidence for the rows-only registry entries
(dedup_minhash_lsh, dedup_simhash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omni_crawler_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the market economy "
    "shows strong growth and the technology sector reports record results "
    "for the quarter with companies announcing new products and services"
)


@pytest.fixture(scope="module")
def corpus(spark):
    import random

    rng = random.Random(42)
    vocab = [f"word{k}" for k in range(400)]
    rows = []
    for i in range(40):
        # genuinely distinct docs: disjoint-ish random vocabulary draws
        words = rng.sample(vocab, 60)
        rows.append((i, " ".join(words)))
    # planted near-dups: 100/101 differ by one word; 102 exact copy of 100
    rows.append((100, BASE + " tail one two three four five"))
    rows.append((101, BASE + " tail one two three four six"))
    rows.append((102, BASE + " tail one two three four five"))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_minhash_lsh_finds_planted_pairs(corpus):
    cand = D.minhash_lsh_candidates(corpus, "doc_id", "text", num_perm=32, bands=8)
    verified = D.jaccard_verify(corpus, cand, "doc_id", "text", threshold=0.8)
    pairs = {(r.id_a, r.id_b) for r in verified.collect()}
    assert (100, 101) in pairs
    assert (100, 102) in pairs


def test_minhash_dedup_keeps_min_id(corpus):
    kept = D.minhash_dedup(corpus, "doc_id", "text", threshold=0.8,
                           num_perm=32, bands=8)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 100 in ids and 101 not in ids and 102 not in ids


def test_exact_dedup(corpus):
    kept = D.exact_dedup(corpus, "text", "doc_id")
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 100 in ids and 102 not in ids and 101 in ids  # 101 differs


def test_simhash_finds_planted_pairs(corpus):
    pairs = {
        (r.id_a, r.id_b)
        for r in D.simhash_candidates(corpus, "doc_id", "text", max_hamming=3).collect()
    }
    assert (100, 102) in pairs  # exact copy → hamming 0
    assert (100, 101) in pairs  # one word changed → tiny hamming


def test_jaccard_kernel_matches_hof_twin(corpus):
    """The vectorized pandas Jaccard kernel must produce exactly the
    values of the interpreted array_intersect/array_union HOF plan it
    replaced (same shingle semantics, same rounding)."""
    a, b = corpus.alias("a"), corpus.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.text").alias("ta"),
        F.col("b.text").alias("tb"),
    )
    kernel = pairs.withColumn(
        "j", F.round(D.jaccard_pair_udf(5)("ta", "tb"), 4)
    )
    hof = pairs.withColumn(
        "j",
        F.round(
            F.size(
                F.array_intersect(
                    D.char_shingles(F.col("ta"), 5),
                    D.char_shingles(F.col("tb"), 5),
                )
            ).cast("double")
            / F.size(
                F.array_union(
                    D.char_shingles(F.col("ta"), 5),
                    D.char_shingles(F.col("tb"), 5),
                )
            ),
            4,
        ),
    )
    k = {(r.id_a, r.id_b): r.j for r in kernel.collect()}
    h = {(r.id_a, r.id_b): r.j for r in hof.collect()}
    assert k == h


def test_simhash_deterministic(corpus):
    a = {r.doc_id: r.sig for r in corpus.select(
        "doc_id", D.simhash64(F.col("text")).alias("sig")).collect()}
    b = {r.doc_id: r.sig for r in corpus.select(
        "doc_id", D.simhash64(F.col("text")).alias("sig")).collect()}
    assert a == b


def test_duplicate_clusters_min_label(spark):
    # two cliques sharing a bridge + an isolated pair + a 6-chain
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1),          # triangle {1,2,3}
         (3, 10), (10, 11),               # bridge -> {1,2,3,10,11}
         (20, 21),                        # pair {20,21}
         (30, 31), (31, 32), (32, 33), (33, 34), (34, 35)],  # chain
        "id_a long, id_b long",
    )
    got = {r.node: r.cluster_id
           for r in D.duplicate_clusters(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 10: 1, 11: 1,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30, 34: 30, 35: 30,
    }


def test_duplicate_clusters_with_minhash_pipeline(corpus):
    cand = D.minhash_lsh_candidates(corpus, "doc_id", "text", num_perm=32, bands=8)
    dups = D.jaccard_verify(corpus, cand, "doc_id", "text", threshold=0.8)
    clusters = {r.node: r.cluster_id
                for r in D.duplicate_clusters(dups).collect()}
    # the planted trio 100/101/102 forms one cluster rooted at 100
    assert clusters.get(100) == 100
    assert clusters.get(101) == 100
    assert clusters.get(102) == 100
