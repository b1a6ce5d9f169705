"""Storage-backed exchange: the engine's hash partitioner.

Ray Data's generic all-to-all operators (sort shuffle / repartition) move
every row through the object store and, measured on this workload
(1 GB of list<int32>-heavy rows), run 5-30x slower than a disk exchange
(sort-based groupby: 174 s; repartition(shuffle=True): 406 s; this: ~7 s).
Production lakehouse ingest does the same thing — partition by key into
bucket files on shared storage, then per-bucket reducers — so the exchange
doubles as the natural multi-node path (the exchange dir lives next to the
lake on the shared filesystem / object store).

  Stage 1 (task pool, stateless): validate each batch, sort rows by
    bucket = shard % n_buckets, write ONE fragment file per batch with ONE
    ROW GROUP (parquet) or RECORD BATCH (Arrow IPC) per bucket under
    ``<exchange>/frag-*`` (tmp+rename atomic). The returned stats table
    carries the (file, row_group) -> bucket index, so no per-bucket
    directories and no small-file storm: fragment file count == batch
    count, not batch x bucket (the round-1 layout peaked at ~15k tiny
    files per commit at sf0.1; this writes ~60). Container format per
    ``EngineConfig.exchange_format``: parquet for disk/shared-fs (half the
    bytes), IPC for RAM-backed exchange roots (near-zero encode/decode).
  Stage 2 (task/actor pool, stateful): one task per bucket reads exactly its
    row groups / record batches (row-group-granular parquet reads;
    memory-mapped zero-copy IPC) and runs the per-shard LWW apply
    (ApplyShards), pre-collapsing accumulated chunks per (__shard, doc_id)
    whenever they exceed ``apply_chunk_rows`` so a backlog bucket never
    materializes unbounded (max-by-seq is associative).

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
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_ray.config import QUARANTINE_SHARD, EngineConfig
from etl_ray.stages.validate import Validator

EXCHANGE_DIR = "_exchange"

FRAG_STATS_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int64()),
        pa.field("rows", pa.int64()),
        pa.field("quarantined", pa.int64()),
        pa.field("file", pa.string()),
        pa.field("row_group", pa.int64()),
    ]
)


def exchange_path(lake_dir: str, commit_id: str, root: str = None) -> str:
    if root:
        tag = os.path.basename(os.path.normpath(lake_dir)) or "lake"
        return os.path.join(root, tag, commit_id)
    return os.path.join(lake_dir, EXCHANGE_DIR, commit_id)


class FragmentWriter:
    """Stage 1: validate + bucket-sort + one-file-per-batch fragment write.
    A plain callable class usable as a task- or actor-pool map_batches stage;
    the Validator (compiled schema, hash fns) is built once per worker."""

    def __init__(self, config: EngineConfig, target_schema, salted_parts,
                 exchange_dir: str, n_buckets: int):
        self.validator = Validator(config, target_schema, salted_parts)
        self.exchange_dir = exchange_dir
        self.n_buckets = n_buckets
        self.compression = config.exchange_compression
        self.fmt = config.exchange_format

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return FRAG_STATS_SCHEMA.empty_table()
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
        os.makedirs(self.exchange_dir, exist_ok=True)
        ext = "arrow" if self.fmt == "ipc" else "parquet"
        rel = f"frag-{uuid.uuid4().hex}.{ext}"
        path = os.path.join(self.exchange_dir, rel)
        out = {"bucket": [], "rows": [], "quarantined": [], "row_group": []}

        def record(rg, b, piece):
            out["bucket"].append(b)
            out["rows"].append(len(piece))
            out["quarantined"].append(len(piece) if b == self.n_buckets else 0)
            out["row_group"].append(rg)

        if self.fmt == "ipc":
            # one IPC record batch per bucket: ~free encode/decode — right
            # for a RAM-backed exchange (see EngineConfig.exchange_format)
            with pa.OSFile(path + ".tmp", "wb") as sink:
                with pa.ipc.new_file(sink, sb.schema) as w:
                    for rg, (s, e) in enumerate(zip(starts, ends)):
                        piece = sb.slice(int(s), int(e - s)).combine_chunks()
                        batches = piece.to_batches()
                        if len(batches) != 1:  # defensive: batch idx == rg
                            one = pa.Table.from_batches(
                                batches).combine_chunks()
                            batches = one.to_batches(max_chunksize=len(one))
                        w.write_batch(batches[0])
                        record(rg, int(bs[s]), piece)
        else:
            with pq.ParquetWriter(path + ".tmp", sb.schema,
                                  compression=self.compression) as w:
                for rg, (s, e) in enumerate(zip(starts, ends)):
                    piece = sb.slice(int(s), int(e - s))
                    w.write_table(piece, row_group_size=len(piece))
                    record(rg, int(bs[s]), piece)
        os.replace(path + ".tmp", path)
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "rows": pa.array(out["rows"], pa.int64()),
                "quarantined": pa.array(out["quarantined"], pa.int64()),
                "file": pa.array([rel] * len(out["bucket"]), pa.string()),
                "row_group": pa.array(out["row_group"], pa.int64()),
            },
            schema=FRAG_STATS_SCHEMA,
        )


def bucket_descriptors(frag_stats, n_buckets: int) -> List[dict]:
    """Stage-2 work-list from stage-1 stats (tiny, driver-side): one
    descriptor per bucket listing its (fragment file, row group) pairs."""
    by_bucket: dict = {}
    for row in frag_stats.itertuples(index=False):
        d = by_bucket.setdefault(
            int(row.bucket), {"bucket": int(row.bucket), "files": [],
                              "rgs": [], "rows": 0})
        d["files"].append(row.file)
        d["rgs"].append(int(row.row_group))
        d["rows"] += int(row.rows)
    return [by_bucket[k] for k in sorted(by_bucket)]


class ApplyBucket:
    """Stage 2: read one bucket's row groups, apply per shard (LWW delta
    write / quarantine write via ApplyShards). Accumulated chunks are
    pre-collapsed per (__shard, doc_id) at ``apply_chunk_rows`` so peak
    memory is bounded by the collapsed state + one chunk, not by the
    bucket's total backlog."""

    def __init__(self, lake_dir: str, commit_id: str, config: EngineConfig,
                 exchange_dir: str, n_buckets: int):
        from etl_ray.stages.apply import ApplyShards

        self.inner = ApplyShards(lake_dir, commit_id, config)
        self.exchange_dir = exchange_dir
        self.chunk_rows = config.apply_chunk_rows
        self.n_buckets = n_buckets
        self._mmaps: List = []

    def _bucket_table(self, row: dict):
        from etl_ray.stages.merge import lww_last_per_keys

        # the quarantine bucket keeps EVERY poison event (never collapsed)
        collapsible = int(row["bucket"]) != self.n_buckets
        acc: List[pa.Table] = []
        acc_rows = 0
        # TRUE pre-collapse event count per shard: the LWW pre-collapse
        # below drops duplicate (shard, doc) rows before ApplyShards ever
        # counts them, so lineage/failure-ratio/salt stats must be taken
        # from these counts, not from len(group) downstream.
        true_counts: dict = {}
        for f, rg in zip(row["files"], row["rgs"]):
            path = os.path.join(self.exchange_dir, f)
            if f.endswith(".arrow"):
                # memory-mapped IPC: the bucket's record batch is a
                # zero-copy view (no decode). The map handle is kept for
                # the instance's lifetime so the view stays valid.
                mm = pa.memory_map(path, "r")
                self._mmaps.append(mm)
                t = pa.Table.from_batches(
                    [pa.ipc.open_file(mm).get_batch(rg)])
            else:
                t = pq.ParquetFile(path).read_row_group(rg)
            for vc in pc.value_counts(t["__shard"]).to_pylist():
                true_counts[vc["values"]] = (
                    true_counts.get(vc["values"], 0) + vc["counts"])
            acc.append(t)
            acc_rows += len(t)
            if collapsible and acc_rows > self.chunk_rows and len(acc) > 1:
                merged = pa.concat_tables(acc, promote_options="default")
                merged = lww_last_per_keys(merged, ["__shard", "doc_id"])
                acc = [merged]
                acc_rows = len(merged)
        return pa.concat_tables(acc, promote_options="default"), true_counts

    def __call__(self, desc: pa.Table) -> pa.Table:
        from etl_ray.stages.apply import STATS_SCHEMA

        outs = []
        for row in desc.to_pylist():
            table, true_counts = self._bucket_table(row)
            stats = self.inner(table)
            # restore pre-collapse rows_in per shard (ADVICE r02: the
            # failure-ratio denominator and hot-partition detection must
            # see real event counts, not collapsed ones)
            if len(stats):
                fixed = [true_counts.get(s, r) for s, r in zip(
                    stats["shard"].to_pylist(), stats["rows_in"].to_pylist())]
                stats = stats.set_column(
                    stats.schema.get_field_index("rows_in"), "rows_in",
                    pa.array(fixed, type=pa.int64()))
            outs.append(stats)
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
