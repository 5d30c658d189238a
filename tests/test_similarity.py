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
