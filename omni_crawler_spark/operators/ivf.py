"""IVF (inverted-file) approximate nearest neighbor — the second
scale path for similarity search (prompt: "an IVF or LSH-bucketed
variant"), complementing the random-hyperplane LSH in similarity.py.

Train: deterministic numpy k-means (seeded init, fixed iterations) on
a driver-side sample — the centroid table is tiny and broadcast.
Index: one pandas-UDF pass assigns every vector to its nearest
centroid (one matmul per Arrow batch).
Search: queries probe their ``nprobe`` nearest centroid cells only —
at 10^10 vectors with 4096 cells and nprobe=8, each query scores
~0.2% of the corpus instead of all of it, and the cell id is the
natural partition key for the index table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from omni_crawler_spark.operators.similarity import cosine_pair_udf


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic k-means (fixed seed/iters) on a bounded sample.
    The sample is tiny relative to the corpus — training cost is O(1)
    in corpus size; only assignment is distributed.

    Sampling: the ``sample`` rows with the smallest ``xxhash64(id)`` —
    a deterministic hash-shuffled draw executed as a distributed
    TakeOrderedAndProject (per-partition top-k, then merge). A plain
    ``limit(sample)`` would read a partition PREFIX — on a partitioned
    100 TB table that is a biased sample (whatever was ingested first)
    and degrades cell balance."""
    rows = (
        embeddings.select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    x = np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _assign_udf(centroids: np.ndarray):
    @pandas_udf(LongType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if m.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ centroids.T).argmax(axis=1).astype(np.int64))

    return assign


def ivf_index(
    embeddings: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Adds the ``cell`` column — at scale this is the partition /
    cluster key of the index table."""
    return embeddings.withColumn("cell", _assign_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in each query's nprobe
    nearest cells. The candidate join is an equi-join on cell —
    shuffle bounded by probed cells, never the whole corpus."""
    indexed = ivf_index(embeddings, centroids, vec_col)
    q_rows = indexed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
    ).collect()
    probes = []
    for r in q_rows:
        qv = np.asarray(r.qe, dtype=np.float64)
        qv /= max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(centroids @ qv))[:nprobe]
        probes += [(int(r.query_id), int(c)) for c in order]
    probe_df = F.broadcast(
        indexed.sparkSession.createDataFrame(probes, "query_id long, cell long")
    )
    q = indexed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
    )
    cand = (
        indexed.join(probe_df, "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ne"))
        .join(F.broadcast(q), "query_id")
    )
    scored = cand.withColumn(
        "sim", F.round(cosine_pair_udf()(F.col("qe"), F.col("ne")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").alias("rank"), "sim")
    )
