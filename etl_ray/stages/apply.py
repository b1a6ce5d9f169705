"""Apply stage: per-shard delta writer (the stateful actor-pool stage).

Used as ``ds.groupby("__shard").map_groups(ApplyGroup, ...)`` — the groupby
is the ONE genuine all-to-all shuffle in the engine (hash-partition events by
doc_id). Each group call receives every event routed to one shard
(= partition × salt) for the current commit and:

  1. sorts by sequence_number and collapses to the last event per doc_id
     (LWW *within* the commit — the delta file is already deduped),
  2. writes a sorted delta run to a DETERMINISTIC path
     ``part=<k>/delta-<commit>-p<k>-s<salt>.parquet`` (idempotent overwrite
     on replay — the reference's deterministic output path,
     /root/reference/storage/rowwriter.go:180-187),
  3. returns a one-row stats table (lineage + per-partition rows/sec).

The quarantine shard instead writes ``_quarantine/<commit>.parquet`` keeping
the ``__reason`` column (poison events preserved, never applied).

Apply never reads the base — pure LSM delta write; merge cost is deferred to
read/compaction. This keeps the hot path O(events) regardless of lake size.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_ray.config import QUARANTINE_SHARD, EngineConfig
from etl_ray.stages.merge import lww_last_per_doc

STATS_SCHEMA = pa.schema(
    [
        pa.field("shard", pa.int64()),
        pa.field("part", pa.int64()),
        pa.field("salt", pa.int64()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("deletes", pa.int64()),
        pa.field("max_seq", pa.int64()),
        pa.field("file", pa.string()),
        pa.field("wall_sec", pa.float64()),
    ]
)


def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


class ApplyShards:
    """Callable class → Ray actor pool; construction (path roots, config)
    happens once per actor, not once per block (reference: per-process init
    state, SURVEY.md §2.6).

    Input blocks come from a HASH-partitioned exchange on ``__shard``
    (``repartition(keys=["__shard"])``): every shard's events land wholly in
    exactly one block, but one block may carry several shards. The block is
    locally sorted by shard and split at run boundaries — cheaper than a
    global sort-based groupby (no range sampling, single exchange pass)."""

    def __init__(self, lake_dir: str, commit_id: str, config: EngineConfig):
        self.lake_dir = lake_dir
        self.commit_id = commit_id
        self.config = config

    def __call__(self, block: pa.Table) -> pa.Table:
        if len(block) == 0:
            return STATS_SCHEMA.empty_table()
        # sort by shard only, then per-shard (doc, seq) sorts inside lww: a
        # single 3-key sort with a string key was MEASURED SLOWER (~10s vs
        # ~6.5s stage-2 wall at sf0.1/32cpus) than this two-level shape —
        # Arrow's multi-key string sort beats two cheap sorts only when the
        # shard split is skewed
        block = block.sort_by([("__shard", "ascending")])
        shards = block["__shard"].combine_chunks()
        import numpy as np

        vals = shards.to_numpy(zero_copy_only=False)
        boundaries = np.flatnonzero(np.diff(vals)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(vals)]])
        outs = [
            self._apply_one(block.slice(int(s), int(e - s)))
            for s, e in zip(starts, ends)
        ]
        return pa.concat_tables(outs)

    def _apply_one(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        shard = group["__shard"][0].as_py()
        rows_in = len(group)

        if shard == QUARANTINE_SHARD:
            rel = os.path.join("_quarantine", f"{self.commit_id}.parquet")
            out = group.drop_columns(["__shard"]).sort_by(
                [("sequence_number", "ascending")])
            _atomic_write(out, os.path.join(self.lake_dir, rel))
            return pa.table(
                {
                    "shard": [shard], "part": [-1], "salt": [0],
                    "rows_in": [rows_in], "rows_out": [len(out)],
                    "deletes": [0], "max_seq": [-1], "file": [rel],
                    "wall_sec": [time.monotonic() - t0],
                },
                schema=STATS_SCHEMA,
            )

        part = shard // self.config.max_salt
        salt = shard % self.config.max_salt
        # valid-row exchange fragments drop the all-null __reason column
        # up front (bytes-per-event); the sort-exchange path still carries it
        delta = group.drop_columns(
            [c for c in ("__reason", "__shard") if c in group.column_names])
        delta = lww_last_per_doc(delta)
        deletes = int(
            pc.sum(pc.equal(delta["op"], "delete").fill_null(False)).as_py() or 0
        )
        max_seq = int(pc.max(delta["sequence_number"]).as_py())
        rel = os.path.join(
            f"part={part}", f"delta-{self.commit_id}-p{part}-s{salt}.parquet"
        )
        _atomic_write(delta, os.path.join(self.lake_dir, rel))
        return pa.table(
            {
                "shard": [shard], "part": [part], "salt": [salt],
                "rows_in": [rows_in], "rows_out": [len(delta)],
                "deletes": [deletes], "max_seq": [max_seq], "file": [rel],
                "wall_sec": [time.monotonic() - t0],
            },
            schema=STATS_SCHEMA,
        )


# map_groups-compatible alias: a single-shard group is just a one-run block
ApplyGroup = ApplyShards
