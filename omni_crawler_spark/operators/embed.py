"""Deterministic text embeddings via the hashing trick — the bridge
from the documents table to the embedding operator family (ANN,
embedding near-dup, clustering) when no model-served vectors exist.

Bag of character trigrams → each trigram hashed to one of ``dim``
buckets with a ±1 sign (universal hashing over byte-window codes, the
minhash_signature_udf construction) → counts accumulated per bucket →
L2 normalization. Classic feature hashing (Weinberger et al. '09):
cosine similarity concentrates around trigram-profile similarity, so
near-duplicate texts land near each other — good enough to drive the
LSH/IVF/PQ paths end-to-end from raw text, and fully deterministic
(no model weights, bit-reproducible across runs/partitionings).

One Arrow batch in → one numpy pass per doc (byte-stride trigram
codes, two fused universal hashes, bincount) — no per-row Python
dispatch, same kernel discipline as operators/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


def hash_embed_udf(dim: int = 64, seed: int = 42, max_bytes: int = 20000):
    """array<double> embedding column builder: L2-normalized
    ``dim``-bucket signed trigram counts. Empty/NULL text → the zero
    vector (callers filter if zero-norm rows are unwanted)."""
    rng = np.random.default_rng(seed)
    A1 = (rng.integers(1, 2**63, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B1 = rng.integers(0, 2**63, dtype=np.uint64)
    A2 = (rng.integers(1, 2**63, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B2 = rng.integers(0, 2**63, dtype=np.uint64)

    @pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        zero = [0.0] * dim
        with np.errstate(over="ignore"):
            for t in texts:
                b = (t or "").lower().encode("utf-8")[:max_bytes]
                if len(b) < 3:
                    out.append(zero)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                n = len(arr) - 2
                codes = (
                    (arr[:n] << np.uint64(16))
                    | (arr[1 : n + 1] << np.uint64(8))
                    | arr[2 : n + 2]
                )
                h1 = A1 * codes + B1  # bucket hash
                h2 = A2 * codes + B2  # sign hash
                buckets = (h1 >> np.uint64(32)) % np.uint64(dim)
                signs = np.where(h2 >> np.uint64(63), 1.0, -1.0)
                v = np.bincount(
                    buckets.astype(np.int64), weights=signs, minlength=dim
                )
                norm = np.sqrt((v * v).sum())
                out.append((v / norm if norm > 0 else v).tolist())
        return pd.Series(out)

    return embed
