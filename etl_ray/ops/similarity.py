"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` and each batch does one numpy matmul against it (never re-shipped
per batch). Scale path: LSH (random hyperplane) bucketing so only same-bucket
vectors are compared; bucket width trades recall for cost.

Also: embedding-cosine near-duplicate pairs (all-pairs ≥ threshold), with the
index side broadcast (valid while it fits worker memory; at 100 TB the LSH
variant is the path).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(batch_embeddings, dtype=np.float64) -> np.ndarray:
    """list<float> column → (n, d) matrix via the flat values buffer (no
    per-row Python). float64 for bit-parity with SQL oracles; switch to
    float32 for production memory savings."""
    col = batch_embeddings.combine_chunks() if isinstance(
        batch_embeddings, pa.ChunkedArray) else batch_embeddings
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class CosineTopK:
    """Actor-pool stage: the normalized query matrix is fetched from the
    object store once per actor in __init__ (broadcast join pattern)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        q = ray.get(queries_ref)
        self.query_ids = q["ids"]
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = self.Q @ X.T  # (nq, nb)
        k = min(self.k, scores.shape[1])
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows = {"query_id": [], "vec_id": [], "score": []}
        for qi in range(scores.shape[0]):
            for j in top[qi]:
                rows["query_id"].append(self.query_ids[qi])
                rows["vec_id"].append(ids[j])
                rows["score"].append(float(scores[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )


def cosine_topk(ds, query_ids, query_matrix, *, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                concurrency: int = 4) -> pd.DataFrame:
    """Exact brute-force cosine top-k: per-batch partial top-k (distributed)
    → tiny driver-side reduce over ≤ k·num_batches candidate rows."""
    import ray

    ref = ray.put({"ids": np.asarray(query_ids), "matrix": query_matrix})
    partials = ds.map_batches(
        CosineTopK,
        fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "score", "vec_id"],
                             ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def ivf_centroids(dim: int, nlist: int, seed: int = 11) -> np.ndarray:
    """Deterministic data-independent coarse quantizer: seeded random unit
    directions. (A trained k-means quantizer slots in here unchanged — the
    data-independent variant keeps the op reproducible byte-for-byte across
    corpora, which is also what lets the SQL oracle embed the centroids as
    literals.)"""
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((nlist, dim)))


class IVFTopK:
    """IVF-style ANN stage: vectors are assigned to their nearest coarse
    centroid; a query scores ONLY vectors whose cell is among its ``nprobe``
    closest cells — the classic inverted-file pruning, here evaluated
    batch-wise with a mask (no index materialization; at cluster scale the
    assignment doubles as a partition key so each cell is co-located)."""

    def __init__(self, payload_ref, k: int, nprobe: int, id_col: str,
                 vec_col: str):
        import ray

        p = ray.get(payload_ref)
        self.query_ids = p["ids"]
        self.Q = _normalize(np.asarray(p["matrix"], dtype=np.float64))
        self.C = np.asarray(p["centroids"], dtype=np.float64)
        # top-nprobe cells per query (nq, nprobe)
        qc = self.Q @ self.C.T
        self.probe = np.argsort(-qc, axis=1, kind="stable")[:, :nprobe]
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(X @ self.C.T, axis=1)  # (nb,)
        scores = self.Q @ X.T  # (nq, nb)
        eligible = (assign[None, :, None] == self.probe[:, None, :]).any(-1)
        scores = np.where(eligible, scores, -np.inf)
        k = min(self.k, scores.shape[1])
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        qi_idx = np.repeat(np.arange(scores.shape[0]), k)
        vj_idx = top.reshape(-1)
        sc = scores[qi_idx, vj_idx]
        keep = np.isfinite(sc)
        return pa.table({
            "query_id": pa.array(
                np.asarray(self.query_ids)[qi_idx[keep]], pa.int64()),
            "vec_id": pa.array(np.asarray(ids)[vj_idx[keep]], pa.int64()),
            "score": pa.array(sc[keep], pa.float64()),
        })


def ivf_topk(ds, query_ids, query_matrix, *, k: int = 10, nlist: int = 8,
             nprobe: int = 3, seed: int = 11, id_col: str = "vec_id",
             vec_col: str = "embedding", concurrency: int = 4) -> pd.DataFrame:
    """IVF ANN top-k: centroids + queries broadcast once via ray.put;
    per-batch masked scoring + partial top-k; tiny driver reduce."""
    import ray

    Q = np.asarray(query_matrix, dtype=np.float64)
    C = ivf_centroids(Q.shape[1], nlist, seed)
    ref = ray.put({"ids": np.asarray(query_ids), "matrix": Q,
                   "centroids": C})
    partials = ds.map_batches(
        IVFTopK,
        fn_constructor_args=(ref, k, nprobe, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "score", "vec_id"],
                             ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


class NearDupPairs:
    """All-pairs cosine ≥ threshold against a broadcast index; emits each
    pair once (id_a < id_b)."""

    def __init__(self, index_ref, threshold: float, id_col: str, vec_col: str):
        import ray

        idx = ray.get(index_ref)
        self.index_ids = np.asarray(idx["ids"])
        self.M = _normalize(np.asarray(idx["matrix"], dtype=np.float64))
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = X @ self.M.T
        bi, mj = np.nonzero(scores >= self.threshold)
        a = ids[bi]
        b = self.index_ids[mj]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(scores[bi, mj][keep].astype(np.float64)),
            }
        )


def embedding_near_dups(ds, index_ids, index_matrix, *, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        concurrency: int = 4):
    import ray

    ref = ray.put({"ids": np.asarray(index_ids), "matrix": index_matrix})
    return ds.map_batches(
        NearDupPairs,
        fn_constructor_args=(ref, threshold, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


# ------------------------------------------------------------- LSH scale path
class HyperplaneLSH:
    """Random-hyperplane signatures: bucket = sign-bit string of ``n_planes``
    projections. Same-bucket vectors are near in angle with high probability;
    downstream exact compare runs per bucket (groupby, no broadcast needed) —
    the unbounded-scale variant."""

    def __init__(self, n_planes: int = 12, dim: int = 64, seed: int = 7,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _matrix(batch[self.vec_col])
        bits = (X @ self.planes) > 0
        bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        return batch.append_column("lsh_bucket", pa.array(bucket.astype(np.int64)))


def lsh_bucketed_pairs(ds, *, threshold: float = 0.95, n_planes: int = 10,
                       dim: int = 64, id_col: str = "vec_id",
                       vec_col: str = "embedding", concurrency: int = 4):
    """Approximate near-dup pairs: bucket by hyperplane signature, exact
    cosine within buckets only (shuffle moves vectors once; no broadcast)."""

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        dtype = df[id_col].dtype
        if len(df) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=dtype),
                                 "id_b": pd.Series([], dtype=dtype),
                                 "cosine": pd.Series([], dtype="float64")})
        df = df.sort_values(id_col)
        M = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        ids = df[id_col].to_numpy()
        s = M @ M.T
        i, j = np.nonzero(np.triu(s >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[i], "id_b": ids[j], "cosine": s[i, j].astype(np.float64)}
        )

    sigs = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs=dict(n_planes=n_planes, dim=dim, vec_col=vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    return sigs.groupby("lsh_bucket").map_groups(
        bucket_pairs, batch_format="pandas")
