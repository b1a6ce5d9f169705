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
        import numpy as np

        # split shards by INDEX (argsort of the int64 shard column) and let
        # each shard take only its LWW winners from the original block —
        # the payload (multi-KB token arrays) is copied ONCE, winners only.
        # The previous shape (sort_by shard → slice → lww sort_by → filter)
        # moved every payload byte ~2.5×; stage 2 is DRAM-bound, so payload
        # copies are the wall-clock (BASELINE.md).
        vals = block["__shard"].combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.argsort(vals, kind="stable")
        sv = vals[order]
        boundaries = np.flatnonzero(np.diff(sv)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(sv)]])
        outs = [
            self._apply_one(block, order[int(s):int(e)], int(sv[int(s)]))
            for s, e in zip(starts, ends)
        ]
        return pa.concat_tables(outs)

    def _apply_one(self, block: pa.Table, idx, shard: int) -> pa.Table:
        import numpy as np

        from etl_ray.stages.merge import lww_winner_indices

        t0 = time.monotonic()
        rows_in = len(idx)

        if shard == QUARANTINE_SHARD:
            rel = os.path.join("_quarantine", f"{self.commit_id}.parquet")
            seq = block["sequence_number"].combine_chunks().to_numpy(
                zero_copy_only=False)[idx]
            out = block.drop_columns(["__shard"]).take(
                pa.array(idx[np.argsort(seq, kind="stable")]))
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
        slim = block.drop_columns(
            [c for c in ("__reason", "__shard") if c in block.column_names])
        # winner selection over the shard's KEY columns only, then ONE
        # payload take of the winners (ordered by doc_id ascending — the
        # on-disk delta order contract)
        group_keys = slim.select(["doc_id", "sequence_number"]).take(
            pa.array(idx))
        local = lww_winner_indices(group_keys, ["doc_id"])
        delta = slim.take(pa.array(idx[local]))
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
