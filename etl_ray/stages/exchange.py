"""Storage-backed exchange: the engine's hash partitioner.

Ray Data's generic all-to-all operators (sort shuffle / repartition) move
every row through the object store and, measured on this workload
(1 GB of list<int32>-heavy rows), run 5-30x slower than a disk exchange
(sort-based groupby: 174 s; repartition(shuffle=True): 406 s; this: ~25 s).
Production lakehouse ingest does the same thing — partition by key into
bucket files on shared storage, then per-bucket reducers — so the exchange
doubles as the natural multi-node path (the exchange dir lives next to the
lake on the shared filesystem / object store).

  Stage 1 (task pool, stateless): validate each batch, split rows by
    bucket = shard % n_buckets, append one fragment file per (task, bucket)
    under ``<lake>/_exchange/<commit_id>/b<bucket>/`` (tmp+rename atomic).
  Stage 2 (actor pool, stateful): one task per bucket reads that bucket's
    fragments and runs the per-shard LWW apply (ApplyShards).

Crash safety: a failed attempt's fragments are wiped at the start of the
retry (the exchange dir is keyed by the deterministic commit_id), and even
stale duplicate fragments would be collapsed by the LWW dedup — the final
delta files are deterministic regardless of fragment boundaries.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from etl_ray.config import QUARANTINE_SHARD, EngineConfig
from etl_ray.stages.validate import Validator

EXCHANGE_DIR = "_exchange"
QUARANTINE_BUCKET = "bq"


def exchange_path(lake_dir: str, commit_id: str, root: str = None) -> str:
    if root:
        tag = os.path.basename(os.path.normpath(lake_dir)) or "lake"
        return os.path.join(root, tag, commit_id)
    return os.path.join(lake_dir, EXCHANGE_DIR, commit_id)


class FragmentWriter:
    """Stage 1: validate + bucket-split + fragment write. A plain callable
    class usable as a task- or actor-pool map_batches stage; the Validator
    (compiled schema, hash fns) is built once per worker."""

    def __init__(self, config: EngineConfig, target_schema, salted_parts,
                 exchange_dir: str, n_buckets: int):
        self.validator = Validator(config, target_schema, salted_parts)
        self.exchange_dir = exchange_dir
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self.validator(batch)
        shard = batch["__shard"].to_numpy(zero_copy_only=False)
        bucket = shard % self.n_buckets
        bucket = np.where(shard == QUARANTINE_SHARD, self.n_buckets, bucket)
        order = np.argsort(bucket, kind="stable")
        sb = batch.take(pa.array(order))
        bs = bucket[order]
        bounds = np.flatnonzero(np.diff(bs)) + 1
        starts = np.concatenate([[0], bounds]).astype(np.int64)
        ends = np.concatenate([bounds, [len(bs)]]).astype(np.int64)
        out = {"bucket": [], "rows": [], "quarantined": []}
        for s, e in zip(starts, ends):
            b = int(bs[s])
            name = QUARANTINE_BUCKET if b == self.n_buckets else f"b{b:05d}"
            d = os.path.join(self.exchange_dir, name)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"frag-{uuid.uuid4().hex}.parquet")
            piece = sb.slice(int(s), int(e - s))
            pq.write_table(piece, path + ".tmp", compression="lz4")
            os.replace(path + ".tmp", path)
            out["bucket"].append(b)
            out["rows"].append(len(piece))
            out["quarantined"].append(
                len(piece) if b == self.n_buckets else 0)
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "rows": pa.array(out["rows"], pa.int64()),
                "quarantined": pa.array(out["quarantined"], pa.int64()),
            }
        )


def bucket_descriptors(exchange_dir: str) -> List[dict]:
    """Driver-side scout of the exchange layout (tiny work-list)."""
    items = []
    if not os.path.isdir(exchange_dir):
        return items
    for name in sorted(os.listdir(exchange_dir)):
        d = os.path.join(exchange_dir, name)
        frags = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        if frags:
            items.append({"bucket": name, "paths": frags})
    return items


class ApplyBucket:
    """Stage 2: read one bucket's fragments, apply per shard (LWW delta
    write / quarantine write via ApplyShards)."""

    def __init__(self, lake_dir: str, commit_id: str, config: EngineConfig):
        from etl_ray.stages.apply import ApplyShards

        self.inner = ApplyShards(lake_dir, commit_id, config)

    def __call__(self, desc: pa.Table) -> pa.Table:
        from etl_ray.stages.apply import STATS_SCHEMA

        outs = []
        for row in desc.to_pylist():
            tabs = [pq.read_table(p) for p in row["paths"]]
            block = pa.concat_tables(tabs, promote_options="default")
            outs.append(self.inner(block))
        if not outs:
            return STATS_SCHEMA.empty_table()
        return pa.concat_tables(outs)


def cleanup_exchange(lake_dir: str, commit_id: str = None,
                     root: str = None) -> None:
    if root:
        tag = os.path.basename(os.path.normpath(lake_dir)) or "lake"
        base = os.path.join(root, tag)
    else:
        base = os.path.join(lake_dir, EXCHANGE_DIR)
    target = os.path.join(base, commit_id) if commit_id else base
    shutil.rmtree(target, ignore_errors=True)
