"""Vectorized last-writer-wins merge kernels (pure Arrow, no Python rows).

The LWW contract (SURVEY.md §2.9): among all events/rows for a doc_id, the
one with the max sequence_number wins; a winning ``delete`` removes the row.
The reference's analog is downstream UUID dedup plus idempotent re-parse
(/root/reference/parser/parser.go:157-176, storage/rowwriter.go:180-187).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lww_winner_indices(table: pa.Table, key_cols: list,
                       seq_col: str = "sequence_number") -> np.ndarray:
    """Row indices of the per-key LWW winners, ordered by key ascending.

    The sort runs over the KEY COLUMNS ONLY (``select`` is zero-copy); the
    caller then does a single ``take`` of the winners. The naive shape —
    ``sort_by`` the whole table, then ``filter`` — moves every payload byte
    twice (full-table take + survivor copy, ~2.5× table bytes for a ~50%
    survivor rate); this shape moves ~0.5× (winners once). The payload here
    is multi-KB token arrays per row, so this is THE memory-bandwidth lever
    of the apply/merge stages (BASELINE.md: stage 2 is DRAM-bound)."""
    keys = table.select(list(key_cols) + [seq_col])
    order = pc.sort_indices(
        keys, sort_keys=[(k, "ascending") for k in key_cols]
        + [(seq_col, "ascending")])
    n = len(order)
    # row i (in sort order) ends a run iff ANY key changes between i, i+1
    last = np.zeros(n, dtype=bool)
    last[n - 1] = True
    for k in key_cols:
        col = pc.take(keys[k], order).combine_chunks()
        neq = pc.not_equal(col.slice(0, n - 1), col.slice(1, n - 1))
        last[: n - 1] |= neq.fill_null(True).to_numpy(zero_copy_only=False)
    return order.to_numpy(zero_copy_only=False)[last]


def lww_last_per_doc(table: pa.Table, *, id_col: str = "doc_id",
                     seq_col: str = "sequence_number",
                     presorted: bool = False) -> pa.Table:
    """Keep, per doc_id, the row with the largest sequence_number.

    Key-only sort → single winners ``take`` (see lww_winner_indices); no
    per-row Python. Output is sorted by doc_id (the on-disk order of
    delta/base files, enabling streaming sort-merge compaction).
    ``presorted=True`` skips the sort when the caller already ordered the
    rows by (doc, seq) — a run-boundary filter is then the only copy.
    """
    if len(table) == 0:
        return table
    if presorted:
        ids = table[id_col].combine_chunks()
        n = len(ids)
        # run-boundary mask: row i is last of its doc iff ids[i] != ids[i+1]
        neq = pc.not_equal(ids.slice(0, n - 1), ids.slice(1, n - 1))
        mask = pa.chunked_array([neq.fill_null(True), pa.array([True])])
        return table.filter(mask)
    winners = lww_winner_indices(table, [id_col], seq_col)
    return table.take(pa.array(winners))


def lww_last_per_keys(table: pa.Table, key_cols: list,
                      seq_col: str = "sequence_number") -> pa.Table:
    """Keep, per composite key, the row with the largest sequence_number.

    Used by the bounded-memory apply path to pre-collapse accumulated
    exchange chunks per (__shard, doc_id): max-by-seq is associative, so
    collapsing partial runs then collapsing the concatenation of the
    partials equals one global collapse."""
    if len(table) == 0:
        return table
    winners = lww_winner_indices(table, list(key_cols), seq_col)
    return table.take(pa.array(winners))


def drop_tombstones(table: pa.Table, *, op_col: str = "op") -> pa.Table:
    if op_col not in table.column_names or len(table) == 0:
        return table
    keep = pc.invert(pc.equal(table[op_col], "delete").fill_null(False))
    return table.filter(keep)


def merge_runs(tables: list, *, drop_deletes: bool,
               id_col: str = "doc_id", seq_col: str = "sequence_number",
               target_schema: pa.Schema = None) -> pa.Table:
    """Merge base+delta runs for one partition: concat → LWW → (optionally)
    drop tombstones. Inputs may be under older schema versions; they are
    conformed to ``target_schema`` first (schema evolution on read)."""
    from etl_ray.schema import conform

    if target_schema is not None:
        tables = [conform(t, target_schema) for t in tables]
    merged = pa.concat_tables(tables, promote_options="default")
    merged = lww_last_per_doc(merged, id_col=id_col, seq_col=seq_col)
    if drop_deletes:
        merged = drop_tombstones(merged)
    return merged
