"""Distributed K-Means (etl_ray/ops/clustering.py)."""

import numpy as np
import ray.data as rd

from etl_ray.ops.clustering import _assign, kmeans, kmeans_fit


def _toy_ds(n_per: int = 30, dim: int = 4, seed: int = 7):
    rng = np.random.default_rng(seed)
    centers = np.array([[10.0] + [0] * (dim - 1),
                        [-10.0] + [0] * (dim - 1)])
    rows = []
    for i in range(2 * n_per):
        c = centers[i % 2]
        rows.append({"vec_id": i,
                     "embedding": (c + rng.normal(0, .5, dim)).tolist()})
    return rd.from_items(rows), centers


def test_assign_tie_breaks_lowest_id():
    X = np.zeros((1, 2))
    C = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
    assert _assign(X, C)[0] == 0


def test_kmeans_separates_two_blobs(ray_session):
    ds, centers = _toy_ds()
    assigned, C = kmeans(ds, k=2, dim=4, iters=3, seed=3, concurrency=2)
    out = assigned.to_pandas()
    # each blob lands wholly in one cluster
    lab0 = set(out[out["vec_id"] % 2 == 0]["cluster"])
    lab1 = set(out[out["vec_id"] % 2 == 1]["cluster"])
    assert len(lab0) == 1 and len(lab1) == 1 and lab0 != lab1
    # learned centroids converge to the true centers
    got = C[sorted(lab0 | lab1)]
    err = min(np.abs(got[:, 0] - np.array([10, -10])).max(),
              np.abs(got[:, 0] - np.array([-10, 10])).max())
    assert err < 1.0


def test_kmeans_empty_cluster_keeps_previous_centroid(ray_session):
    ds, _ = _toy_ds(n_per=5)
    # k=4 over 2 blobs: at least 2 clusters can end up empty; fit must not
    # divide by zero and must return finite centroids
    C = kmeans_fit(ds, k=4, dim=4, iters=2, seed=5, concurrency=2)
    assert np.isfinite(C).all() and C.shape == (4, 4)
