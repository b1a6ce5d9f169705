"""Distributed K-Means (Lloyd's algorithm) over an embedding column.

The canonical "learn structure over the whole corpus" op a training-data
pipeline needs (quantizer training for IVF, semantic bucketing for
curriculum mixes). Built as the textbook Ray-Data mergeable-state shape:

  assign+partial-sum: each ``map_batches`` task assigns its vectors to the
    nearest centroid (one (n,k) distance matmul per batch — vectorized,
    no Python loop) and emits k partial rows (cluster, count, per-dim
    sums). The shuffle therefore moves k·num_batches tiny rows per
    iteration — never the vectors.
  combine: the partials are summed on the driver (k rows × dim doubles —
    bytes, not data). New centroid = sum/count; an empty cluster keeps
    its previous centroid.

Initial centroids come from ops/similarity.ivf_centroids (seeded unit
directions), which keeps the whole fit deterministic and lets the DuckDB
oracle embed them as literals and replay the same iterations in SQL
(__ray_entry__._sql_kmeans).

Distance is Euclidean; ties break to the lowest cluster id (np.argmin
first-min == SQL ``ORDER BY dist, cid`` row_number), matching the IVF
assignment convention in ops/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from etl_ray.ops.similarity import _matrix, ivf_centroids


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row; ties → lowest centroid id.
    ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant per row, so
    argmin over (-2x·c + ||c||²) — one matmul, no (n,k,d) temporary."""
    d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    return np.argmin(d, axis=1)


class _PartialSums:
    def __init__(self, centroids_ref, vec_col: str):
        import ray

        self.C = ray.get(centroids_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k, dim = self.C.shape
        if len(batch) == 0:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                "count": pa.array([], pa.int64()),
                "sums": pa.array([], pa.list_(pa.float64())),
            })
        X = _matrix(batch[self.vec_col])
        a = _assign(X, self.C)
        counts = np.bincount(a, minlength=k)
        sums = np.zeros((k, dim))
        np.add.at(sums, a, X)
        return pa.table({
            "cluster": pa.array(np.arange(k), pa.int64()),
            "count": pa.array(counts.astype(np.int64)),
            "sums": pa.array(list(sums), pa.list_(pa.float64())),
        })


def kmeans_fit(ds, *, k: int = 8, dim: int = 64, iters: int = 2,
               seed: int = 11, vec_col: str = "embedding",
               concurrency: int = 4) -> np.ndarray:
    """``iters`` Lloyd iterations from the seeded init; returns the final
    (k, dim) float64 centroid matrix. ``ds`` is streamed once per
    iteration; nothing larger than k×dim ever reaches the driver."""
    import ray

    C = ivf_centroids(dim, k, seed).astype(np.float64)
    for _ in range(iters):
        ref = ray.put(C)
        parts = ds.map_batches(
            _PartialSums, fn_constructor_args=(ref, vec_col),
            batch_format="pyarrow", concurrency=concurrency,
        ).to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim))
        np.add.at(counts, parts["cluster"].to_numpy(),
                  parts["count"].to_numpy())
        np.add.at(sums, parts["cluster"].to_numpy(),
                  np.stack(parts["sums"].to_numpy()))
        nonzero = counts > 0
        C = C.copy()
        C[nonzero] = sums[nonzero] / counts[nonzero, None]
    return C


def kmeans_assign(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding", concurrency: int = 4):
    """Final per-vector assignment under fixed ``centroids``: Dataset of
    (id, cluster, dist) — dist is the true Euclidean distance."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    class Assigner:
        def __init__(self):
            self.C = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                })
            X = _matrix(batch[vec_col])
            a = _assign(X, self.C)
            diff = X - self.C[a]
            dist = np.sqrt((diff * diff).sum(axis=1))
            return pa.table({
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(dist),
            })

    return ds.map_batches(Assigner, batch_format="pyarrow",
                          concurrency=concurrency)


def kmeans(ds, *, k: int = 8, dim: int = 64, iters: int = 2, seed: int = 11,
           id_col: str = "vec_id", vec_col: str = "embedding",
           concurrency: int = 4):
    """Fit + assign; returns (assignments Dataset, centroids ndarray)."""
    C = kmeans_fit(ds, k=k, dim=dim, iters=iters, seed=seed,
                   vec_col=vec_col, concurrency=concurrency)
    return kmeans_assign(ds, C, id_col=id_col, vec_col=vec_col,
                         concurrency=concurrency), C
