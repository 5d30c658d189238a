"""Similarity-search tests: exact top-k sanity + LSH-ANN recall."""

from __future__ import annotations

import numpy as np
import pytest

from omni_crawler_spark.operators import similarity as S


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        v = rng.standard_normal(16).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    # planted: 900 ≈ 901 (same direction), far from everything else
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows.append((900, [float(x) for x in 10 * base]))
    rows.append((901, [float(x) for x in 10.1 * base + 0.001]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def test_bruteforce_topk_finds_planted_neighbor(embeddings):
    res = S.cosine_topk(embeddings, query_ids=[900], k=3)
    rows = res.collect()
    assert rows[0].neighbor_id == 901
    assert rows[0].sim > 0.999


def test_ann_lsh_recall_vs_exact(embeddings):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embeddings, query_ids=[0, 1, 2], k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_lsh_topk(
            embeddings, query_ids=[0, 1, 2], k=5, dim=16, n_planes=2
        ).collect()
    }
    # with 4 buckets recall should be decent but is approximate
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall


def test_embedding_near_dups_finds_planted(embeddings):
    pairs = {
        (r.id_a, r.id_b)
        for r in S.embedding_near_dups(
            embeddings, threshold=0.99, dim=16, n_planes=4
        ).collect()
    }
    assert (900, 901) in pairs


def test_embedding_lsh_matches_exact_on_planted(spark):
    """The banded-LSH scale path must recover the pairs the exact
    O(n²) oracle twin finds at >=0.95 (planted near-identical pairs
    collide in some table with overwhelming probability)."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(200):
        rows.append((i, [float(x) for x in rng.standard_normal(16)]))
    for j in range(5):  # five planted near-dup pairs
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        rows.append((1000 + 2 * j, [float(x) for x in base]))
        rows.append(
            (1001 + 2 * j, [float(x) for x in base + 0.01 * rng.standard_normal(16)])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    # exact >=0.95 pairs via brute force in numpy (the oracle twin's math)
    m = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    exact = set()
    ids = sorted(m)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = m[ids[x]], m[ids[y]]
            s = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            if round(s, 4) >= 0.95:
                exact.add((ids[x], ids[y]))
    got = {
        (r.id_a, r.id_b)
        for r in S.embedding_near_dups(
            df, threshold=0.95, dim=16, n_planes=8, n_tables=8
        ).collect()
    }
    assert exact <= got  # every exact pair found (no false negatives)
    assert got <= exact or not (got - exact)  # cosine verify kills false positives


def test_embedding_near_dups_bucket_cap_bounds_degenerate(spark):
    """A degenerate corpus (500 identical vectors → one bucket in every
    table) must be SKIPPED by the cap, not expanded quadratically —
    the same guarantee as the MinHash max_bucket_size."""
    v = [float(x) for x in np.ones(16)]
    rows = [(i, v) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = S.embedding_near_dups(
        df, threshold=0.95, dim=16, n_planes=8, n_tables=4, max_bucket_size=100
    )
    # capped: the 500-member buckets are dropped → no pairs, bounded cost
    assert got.count() == 0


def test_hash_embed_retrieves_planted_copy(spark):
    """Hashing-trick embeddings (operators/embed.py): a near-copy
    ('+ tiny tail') must retrieve its original as the top-1 cosine
    neighbor; embeddings are deterministic and unit-norm."""
    from pyspark.sql import functions as F

    from omni_crawler_spark.operators import similarity as S
    from omni_crawler_spark.operators.embed import hash_embed_udf

    import random

    rng = random.Random(3)
    vocab = [f"tok{k}" for k in range(300)]
    rows = [(i, " ".join(rng.sample(vocab, 50))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hash_embed_udf(dim=64)
    base = docs.select(
        F.col("doc_id").alias("vec_id"), emb(F.col("text")).alias("embedding")
    )
    planted = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 1000).alias("vec_id"),
        emb(F.concat("text", F.lit(" tiny tail"))).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    top = S.cosine_topk(corpus, query_ids=[1000, 1001, 1002], k=1)
    got = {r.query_id: (r.neighbor_id, r.sim) for r in top.collect()}
    for q in (1000, 1001, 1002):
        nid, sim = got[q]
        assert nid == q - 1000 and sim > 0.9
    # determinism + unit norm
    a = {r.vec_id: tuple(r.embedding) for r in base.collect()}
    b = {r.vec_id: tuple(r.embedding) for r in base.collect()}
    assert a == b
    import math

    for v in a.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
