"""IVF ANN: determinism + recall vs exact brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from omni_crawler_spark.operators import ivf as I
from omni_crawler_spark.operators import similarity as S


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(11)
    # 4 well-separated clusters + noise → IVF cells align with clusters
    centers = rng.standard_normal((4, 16)) * 5
    rows = []
    for i in range(400):
        c = centers[i % 4]
        v = c + rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def test_centroids_deterministic(embeddings):
    c1 = I.train_centroids(embeddings, n_cells=8, dim=16)
    c2 = I.train_centroids(embeddings, n_cells=8, dim=16)
    assert np.array_equal(c1, c2)


def test_index_covers_all(embeddings):
    cent = I.train_centroids(embeddings, n_cells=8, dim=16)
    idx = I.ivf_index(embeddings, cent)
    assert idx.filter(F.col("cell").isNull()).count() == 0
    assert idx.select("cell").distinct().count() <= 8


def test_ivf_recall_vs_exact(embeddings):
    cent = I.train_centroids(embeddings, n_cells=8, dim=16)
    qids = [0, 1, 2, 3]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embeddings, qids, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in I.ivf_topk(embeddings, qids, cent, k=5, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall  # clustered data → high recall at nprobe=2
