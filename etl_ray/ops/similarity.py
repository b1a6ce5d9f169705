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


def _blob_matrix(col) -> np.ndarray:
    """Fixed-width binary column of packed little-endian float64 rows →
    (n, d) matrix straight from the Arrow buffers — no ``to_pylist`` /
    per-row Python on the pair stream. Join/take outputs keep a single
    contiguous values buffer with monotone offsets, so the common case is
    one slice + view; ragged offsets (sliced arrays) fall back to one
    vectorized gather."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    w = int(offs[1] - offs[0])
    if np.all(np.diff(offs) == w):
        flat = data[int(offs[0]): int(offs[-1])]
    else:  # packed blobs are fixed-width by construction
        raise ValueError("_blob_matrix: rows are not fixed-width")
    return np.ascontiguousarray(flat).view("<f8").reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


_EMPTY_TOPK = pa.schema([
    ("query_id", pa.int64()), ("vec_id", pa.int64()),
    ("score", pa.float64()),
]).empty_table()


class CosineTopK:
    """Scoring stage against a broadcast query matrix. LAZY state: __init__
    stores only the ``ray.put`` ref, the matrix is fetched (zero-copy from
    the local object store) on first __call__ in the executing process.
    That makes the same class work both ways: as a constructed INSTANCE it
    pickles small and runs as a task pool on Ray's already-warm workers
    (no actor-spawn cliff — measured ~1 s/actor, i.e. ~15 s of dead wall
    for a 30-wide pool on a 2 s job); passed as a CLASS with concurrency=
    it is an actor pool that pays the fetch once per actor (the right
    trade when the query matrix is large)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        self._ref = queries_ref
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.query_ids = None
        self.Q = None

    def _setup(self):
        import ray

        q = ray.get(self._ref)
        self.query_ids = q["ids"]
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))

    def __getstate__(self):
        # never ship materialized state through task specs — only the ref
        d = dict(self.__dict__)
        d["query_ids"] = None
        d["Q"] = None
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.Q is None:
            self._setup()
        if len(batch) == 0:
            return _EMPTY_TOPK
        X = _normalize(_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = self.Q @ X.T  # (nq, nb)
        k = min(self.k, scores.shape[1])
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        qi_idx = np.repeat(np.arange(scores.shape[0]), k)
        vj_idx = top.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(
                    np.asarray(self.query_ids)[qi_idx], pa.int64()),
                "vec_id": pa.array(np.asarray(ids)[vj_idx], pa.int64()),
                "score": pa.array(scores[qi_idx, vj_idx].astype(np.float64)),
            }
        )


def cosine_topk(ds, query_ids, query_matrix, *, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                concurrency: int = 4,
                use_actor_pool: bool = False) -> pd.DataFrame:
    """Exact brute-force cosine top-k: per-batch partial top-k (distributed)
    → tiny driver-side reduce over ≤ k·num_batches candidate rows. Default
    is a task pool (the stage state is just the broadcast ref — warm
    workers, no actor spawn); ``use_actor_pool=True`` pays the spawn to
    fetch a LARGE query matrix once per actor instead of once per task."""
    import ray

    ref = ray.put({"ids": np.asarray(query_ids), "matrix": query_matrix})
    if use_actor_pool:
        scored = ds.map_batches(
            CosineTopK,
            fn_constructor_args=(ref, k, id_col, vec_col),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        scored = ds.map_batches(
            CosineTopK(ref, k, id_col, vec_col),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
    partials = scored.to_pandas()
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
    closest cells — the classic inverted-file PRUNING: the batch is grouped
    by assigned cell and each probed cell runs one gathered matmul of (the
    queries probing it) × (the cell's members). Cells no query probes cost
    zero FLOPs beyond the (nb × nlist) assignment. At cluster scale the
    assignment doubles as a partition key so each cell is co-located and
    unprobed cells are never even read."""

    def __init__(self, payload_ref, k: int, nprobe: int, id_col: str,
                 vec_col: str):
        self._ref = payload_ref
        self._nprobe = nprobe
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.Q = None
        self.query_ids = None
        self.C = None
        self.cell_queries = None

    def _setup(self):
        import ray

        p = ray.get(self._ref)
        self.query_ids = p["ids"]
        self.Q = _normalize(np.asarray(p["matrix"], dtype=np.float64))
        self.C = np.asarray(p["centroids"], dtype=np.float64)
        # top-nprobe cells per query (nq, nprobe) → inverted: per cell, the
        # query indices probing it (built once per actor / per task — the
        # rebuild is O(nq·nlist), trivial next to one batch matmul)
        qc = self.Q @ self.C.T
        probe = np.argsort(-qc, axis=1, kind="stable")[:, :self._nprobe]
        nlist = self.C.shape[0]
        self.cell_queries = [
            np.flatnonzero((probe == c).any(axis=1)) for c in range(nlist)
        ]

    def __getstate__(self):
        d = dict(self.__dict__)
        d["Q"] = d["query_ids"] = d["C"] = d["cell_queries"] = None
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.Q is None:
            self._setup()
        if len(batch) == 0:
            return _EMPTY_TOPK
        X = _normalize(_matrix(batch[self.vec_col]))
        ids = np.asarray(batch[self.id_col].to_numpy(zero_copy_only=False))
        if "cell_id" in batch.column_names:
            # pre-built index (ivf_build): the (nb x nlist) assignment
            # matmul — the dominant cost at small query counts — was paid
            # ONCE at build time, not per query batch
            assign = batch["cell_id"].to_numpy(zero_copy_only=False)
        else:
            assign = np.argmax(X @ self.C.T, axis=1)  # (nb,)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        cells, starts = np.unique(sorted_assign, return_index=True)
        ends = np.append(starts[1:], len(order))
        q_parts, v_parts, s_parts = [], [], []
        for c, s, e in zip(cells, starts, ends):
            probers = self.cell_queries[int(c)]
            if len(probers) == 0:
                continue  # unprobed cell: zero scoring FLOPs
            members = order[s:e]
            sub = self.Q[probers] @ X[members].T  # (np_c, nb_c)
            q_parts.append(np.repeat(probers, len(members)))
            v_parts.append(np.tile(members, len(probers)))
            s_parts.append(sub.reshape(-1))
        if not q_parts:
            return _EMPTY_TOPK
        qi = np.concatenate(q_parts)
        vj = np.concatenate(v_parts)
        sc = np.concatenate(s_parts)
        # per-query partial top-k within the batch (bounds rows shipped to
        # the driver reduce at k per query per batch)
        sel = np.lexsort((ids[vj], -sc, qi))
        qi, vj, sc = qi[sel], vj[sel], sc[sel]
        first = np.concatenate([[0], np.flatnonzero(np.diff(qi)) + 1])
        rank = np.arange(len(qi)) - np.repeat(first, np.diff(
            np.append(first, len(qi))))
        keep = rank < self.k
        return pa.table({
            "query_id": pa.array(
                np.asarray(self.query_ids)[qi[keep]], pa.int64()),
            "vec_id": pa.array(ids[vj[keep]], pa.int64()),
            "score": pa.array(sc[keep].astype(np.float64)),
        })


class CellAssigner:
    """Index-build stage: append ``cell_id`` (nearest coarse centroid) to
    every vector row. One pass over the corpus; at cluster scale cell_id
    doubles as the partition key so a query only READS probed cells."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        self._ref = centroids_ref
        self.vec_col = vec_col
        self.C = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["C"] = None
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.C is None:
            import ray

            self.C = np.asarray(ray.get(self._ref), dtype=np.float64)
        if len(batch) == 0:
            return batch.append_column("cell_id", pa.array([], pa.int64()))
        X = _normalize(_matrix(batch[self.vec_col]))
        cell = np.argmax(X @ self.C.T, axis=1)
        return batch.append_column(
            "cell_id", pa.array(cell.astype(np.int64)))


def ivf_build(ds, *, dim: int, nlist: int = 64, seed: int = 11,
              vec_col: str = "embedding", concurrency: int = 4):
    """Build the IVF index: one assignment pass, result materialized with
    ``cell_id`` attached. Returns (indexed_ds, centroids). Pass the SAME
    centroids to ivf_topk so its probe lists match the assignment."""
    import ray

    C = ivf_centroids(dim, nlist, seed)
    ref = ray.put(C)
    # constructed instance → TASK pool on warm workers (state is one lazy
    # object-store fetch), not an actor pool paying ~1 s spawn per worker
    indexed = ds.map_batches(
        CellAssigner(ref, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()
    return indexed, C


def probed_cells(query_matrix, centroids, nprobe: int) -> np.ndarray:
    """Union over queries of each query's ``nprobe`` nearest cells — the
    set of partitions a batched IVF query must READ."""
    Q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    C = np.asarray(centroids, dtype=np.float64)
    qc = Q @ C.T
    probe = np.argsort(-qc, axis=1, kind="stable")[:, :nprobe]
    return np.unique(probe)


def ivf_persist(indexed, root: str) -> None:
    """Persist an ivf_build corpus partitioned BY CELL — one directory per
    cell_id, so a query's storage reads are limited to its probed cells
    (scan bytes ∝ nprobe/nlist instead of the whole corpus). ``cell_id``
    is duplicated into a partition column (hive layout drops the
    partition column from the data files, and the pruned reader wants the
    real column so IVFTopK skips the re-assignment matmul)."""

    def dup(t: pa.Table) -> pa.Table:
        return t.append_column("cell_part", t["cell_id"])

    indexed.map_batches(dup, batch_format="pyarrow").write_parquet(
        root, partition_cols=["cell_part"])


def ivf_topk_partitioned(root: str, query_ids, query_matrix, *,
                         centroids, k: int = 10, nprobe: int = 3,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         concurrency: int = 4):
    """IVF ANN over an ivf_persist lake: ONLY the probed cells' directories
    are listed and read — unprobed cells cost zero scan bytes, not just
    zero FLOPs. URI-transparent: ``root`` may be a plain path or any
    pyarrow.fs URI (file://, s3://, gs://) — at 100 TB the lake lives in
    object storage and the pruned-read path must still run there.
    Returns (topk_df, scan_stats) where scan_stats reports bytes read vs
    total corpus bytes for the pruning audit."""
    import ray.data as rd
    from pyarrow import fs as pafs

    from etl_ray.util import resolve_fs

    cells = probed_cells(query_matrix, centroids, nprobe)
    probe_dirs = {f"cell_part={int(c)}" for c in cells}
    fsys, local_root = resolve_fs(root)
    # ONE recursive listing of the lake root (one object-store LIST call
    # per 1000 keys, not one RPC per cell directory)
    infos = fsys.get_file_info(pafs.FileSelector(local_root, recursive=True))
    by_cell: dict = {}
    for i in infos:
        if i.type != pafs.FileType.File:
            continue
        rel = i.path[len(local_root):].lstrip("/")
        part = rel.split("/", 1)[0]
        if part.startswith("cell_part="):
            by_cell.setdefault(part, []).append((i.path, i.size))
    read_paths, read_bytes, total_bytes = [], 0, 0
    for part in sorted(by_cell):
        size = sum(s for _, s in by_cell[part])
        total_bytes += size
        if part in probe_dirs:
            read_paths.extend(sorted(p for p, _ in by_cell[part]))
            read_bytes += size
    stats = {"cells_probed": len(probe_dirs & set(by_cell)),
             "cells_total": len(by_cell),
             "bytes_read": read_bytes, "bytes_total": total_bytes}
    if not read_paths:
        # every probed centroid maps to an empty cell: nothing to scan
        empty = _EMPTY_TOPK.to_pandas()
        empty["rank"] = pd.Series([], dtype=np.int64)
        return empty, stats
    ds = rd.read_parquet(read_paths, filesystem=fsys,
                         columns=[id_col, vec_col, "cell_id"])
    out = ivf_topk(ds, query_ids, query_matrix, k=k, nprobe=nprobe,
                   concurrency=concurrency, centroids=centroids)
    return out, stats


def ivf_topk(ds, query_ids, query_matrix, *, k: int = 10, nlist: int = 8,
             nprobe: int = 3, seed: int = 11, id_col: str = "vec_id",
             vec_col: str = "embedding", concurrency: int = 4,
             centroids=None) -> pd.DataFrame:
    """IVF ANN top-k: centroids + queries broadcast once via ray.put;
    per-batch per-cell pruned scoring + partial top-k; tiny driver reduce.
    When ``ds`` carries a ``cell_id`` column from ivf_build, pass that
    build's ``centroids`` — the per-batch assignment matmul is skipped."""
    import ray

    Q = np.asarray(query_matrix, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64) if centroids is not None \
        else ivf_centroids(Q.shape[1], nlist, seed)
    ref = ray.put({"ids": np.asarray(query_ids), "matrix": Q,
                   "centroids": C})
    partials = ds.map_batches(
        IVFTopK(ref, k, nprobe, id_col, vec_col),
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
        self._ref = index_ref
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col
        self.index_ids = None
        self.M = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["index_ids"] = d["M"] = None
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.M is None:
            import ray

            idx = ray.get(self._ref)
            self.index_ids = np.asarray(idx["ids"])
            self.M = _normalize(np.asarray(idx["matrix"], dtype=np.float64))
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
        NearDupPairs(ref, threshold, id_col, vec_col),
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
                       vec_col: str = "embedding", concurrency: int = 4,
                       max_bucket_ids: Optional[int] = None):
    """Approximate near-dup pairs: bucket by hyperplane signature, exact
    cosine within buckets only (shuffle moves each vector once; no
    broadcast). Pair generation is the capped hash SELF-JOIN from
    ops.dedup — no per-bucket Python lambda (the many-tiny-groups
    map_groups shape BASELINE.md measured pathological), and degenerate
    buckets past ``max_bucket_ids`` are dropped with a printed count
    instead of going O(b²). Normalized vectors ride through the join as
    packed float64 blobs (Acero joins reject list columns); cosine is then
    one vectorized row-wise dot per pair batch."""
    from etl_ray.ops.dedup import DEFAULT_MAX_BUCKET_IDS, _bucket_self_pairs

    if max_bucket_ids is None:
        max_bucket_ids = DEFAULT_MAX_BUCKET_IDS

    lsh = HyperplaneLSH(n_planes=n_planes, dim=dim, vec_col=vec_col)

    def sig_pack(batch: pa.Table) -> pa.Table:
        batch = lsh(batch)
        M = _normalize(_matrix(batch[vec_col]))
        blob = M.astype("<f8").tobytes()
        w = M.shape[1] * 8
        offs = np.arange(0, (len(batch) + 1) * w, w, dtype=np.int32)
        emb = pa.BinaryArray.from_buffers(
            pa.binary(), len(batch),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)])
        return pa.table({
            "lsh_bucket": batch["lsh_bucket"],
            id_col: batch[id_col],
            "emb": emb,
        })

    sigs = ds.map_batches(sig_pack, batch_format="pyarrow")
    pairs = _bucket_self_pairs(sigs, ["lsh_bucket"], id_col,
                               max_bucket_ids, payload_col="emb")

    def cosine_filter(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([
                ("id_a", pa.int64()), ("id_b", pa.int64()),
                ("cosine", pa.float64()),
            ]).empty_table()
        A = _blob_matrix(t["emb"])
        B = _blob_matrix(t["emb_b"])
        cos = np.einsum("ij,ij->i", A, B)
        keep = cos >= threshold
        return pa.table({
            "id_a": pc_take(t["id_a"], keep),
            "id_b": pc_take(t["id_b"], keep),
            "cosine": pa.array(cos[keep].astype(np.float64)),
        })

    def pc_take(col, mask):
        arr = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        return arr.filter(pa.array(mask))

    # each vector lives in exactly ONE bucket (single signature), so the
    # join emits every pair at most once — no cross-band dedup needed
    return pairs.map_batches(cosine_filter, batch_format="pyarrow")
