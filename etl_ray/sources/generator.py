"""Deterministic synthetic changelog / base-table generator (FIXTURES.md).

Seeded, byte-deterministic. Zipf-ish skewed doc_id draw for update/delete
targets models the reference's wildly varying archive sizes
(/root/reference/worker/worker.go:102-115). Token arrays are generated as one
flat int32 buffer + offsets → ``pa.ListArray`` (vectorized; no Python loop
over rows).

Schema (FIXTURES.md F2):
  op: string  insert|update|delete
  doc_id: string
  sequence_number: int64   globally unique, monotone in (segment, row) order
  tokens: list<int32>      null for delete
  n_tok: int32             null for delete
  source: string           null for delete
Evolution variant (F3): from ``evolve_at_segment`` onward adds nullable
``lang: string`` and widens ``n_tok`` to int64.
Corruption variant (F4): ``corrupt_frac`` of rows get an injected defect
(unknown op / null doc_id / n_tok mismatch / token out of vocab / oversize).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = np.array(["web", "books", "code"], dtype=object)


def _list_array(lengths: np.ndarray, rng: np.random.Generator,
                vocab: int, null_mask: Optional[np.ndarray] = None) -> pa.ListArray:
    lengths = lengths.astype(np.int64).copy()
    if null_mask is not None:
        lengths[null_mask] = 0
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    values = rng.integers(0, vocab, int(offsets[-1]), dtype=np.int32)
    arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
    if null_mask is not None and null_mask.any():
        import pyarrow.compute as pc
        arr = pc.if_else(pa.array(~null_mask), arr, pa.nulls(len(lengths), arr.type))
    return arr


def generate_base(
    out_path: str,
    *,
    n_docs: int,
    seed: int = 42,
    vocab: int = 50257,
    min_tok: int = 16,
    max_tok: int = 256,
) -> pa.Table:
    """Initial lake content as a plain insert-only table (doc-0 .. doc-N-1)."""
    rng = np.random.default_rng([seed, 0xBA5E])
    doc_ids = pa.array([f"doc-{i:010d}" for i in range(n_docs)])
    lengths = rng.integers(min_tok, max_tok + 1, n_docs)
    tokens = _list_array(lengths, rng, vocab)
    table = pa.table(
        {
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": pa.array(SOURCES[rng.integers(0, len(SOURCES), n_docs)]),
        }
    )
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        pq.write_table(table, out_path)
    return table


def generate_changelog(
    wal_dir: str,
    *,
    n_events: int,
    n_segments: int,
    n_base_docs: int = 0,
    seed: int = 42,
    vocab: int = 50257,
    min_tok: int = 16,
    max_tok: int = 256,
    insert_frac: float = 0.50,
    update_frac: float = 0.35,
    zipf_a: float = 1.4,
    evolve_at_segment: Optional[int] = None,
    corrupt_frac: float = 0.0,
    start_sequence: int = 0,
    start_segment: int = 0,
) -> List[str]:
    """Write ``seg-<n>.parquet`` files; returns the file paths.

    Single seeded pass carrying the doc-id counter across segments, so the
    full changelog is deterministic for a given parameter set. Updates and
    deletes target existing doc_ids via a Zipf draw over "recency rank"
    (hot keys exist by design). ~2% of updates target never-inserted ids
    (upsert-as-insert semantics per FIXTURES.md F2).
    """
    os.makedirs(wal_dir, exist_ok=True)
    per_seg = [n_events // n_segments] * n_segments
    per_seg[-1] += n_events - sum(per_seg)
    next_doc = n_base_docs
    seq = start_sequence
    paths = []
    for si, n in enumerate(per_seg):
        seg_no = start_segment + si
        rng = np.random.default_rng([seed, 0xC0DE, seg_no])
        u = rng.random(n)
        is_ins = u < insert_frac
        is_upd = (~is_ins) & (u < insert_frac + update_frac)
        is_del = ~(is_ins | is_upd)

        doc_num = np.empty(n, dtype=np.int64)
        n_ins = int(is_ins.sum())
        doc_num[is_ins] = next_doc + np.arange(n_ins)
        next_doc += n_ins
        n_exist = max(next_doc, 1)
        # Zipf over recency rank: rank r → doc (next_doc - 1 - r)
        n_old = n - n_ins
        ranks = (rng.zipf(zipf_a, n_old).astype(np.int64) - 1) % n_exist
        targets = next_doc - 1 - ranks
        old_mask = ~is_ins
        doc_num[old_mask] = targets
        # a few updates hit never-inserted ids (upsert-as-insert, FIXTURES F2)
        upd_idx = np.flatnonzero(is_upd)
        if len(upd_idx):
            phantom = rng.random(n_old) < 0.02
            upd_pos_in_old = np.searchsorted(np.flatnonzero(old_mask), upd_idx)
            ph = upd_idx[phantom[upd_pos_in_old]]
            doc_num[ph] = next_doc + 10_000_000 + rng.integers(0, 1000, len(ph))

        op = np.where(is_ins, "insert", np.where(is_upd, "update", "delete"))
        doc_id = np.array([f"doc-{d:010d}" for d in doc_num], dtype=object)
        seqs = seq + np.arange(n, dtype=np.int64)
        seq += n
        lengths = rng.integers(min_tok, max_tok + 1, n)
        tokens = _list_array(lengths, rng, vocab, null_mask=is_del)
        n_tok = lengths.astype(np.int64 if (
            evolve_at_segment is not None and seg_no >= evolve_at_segment
        ) else np.int32)
        n_tok_arr = pa.array(n_tok, mask=is_del)
        source = SOURCES[rng.integers(0, len(SOURCES), n)]
        source[is_del] = None

        cols = {
            "op": pa.array(op),
            "doc_id": pa.array(doc_id),
            "sequence_number": pa.array(seqs),
            "tokens": tokens,
            "n_tok": n_tok_arr,
            "source": pa.array(source),
        }
        if evolve_at_segment is not None and seg_no >= evolve_at_segment:
            langs = np.array(["en", "de", "fr", "zh"], dtype=object)[
                rng.integers(0, 4, n)]
            langs[is_del] = None
            cols["lang"] = pa.array(langs)

        if corrupt_frac > 0:
            m = rng.random(n) < corrupt_frac
            idx = np.flatnonzero(m)
            kinds = rng.integers(0, 4, len(idx))
            op2 = op.copy().astype(object)
            op2[idx[kinds == 0]] = "truncate"  # unknown op
            did2 = doc_id.copy()
            did2[idx[kinds == 1]] = None  # null doc_id
            ntv = np.asarray(n_tok, dtype=np.int64).copy()
            ntv[idx[kinds == 2]] += 7  # n_tok != len(tokens)
            cols["op"] = pa.array(op2)
            cols["doc_id"] = pa.array(did2)
            cols["n_tok"] = pa.array(ntv.astype(n_tok.dtype), mask=is_del)
            # token-out-of-vocab injected via n_tok trick is enough; kind 3:
            neg = idx[kinds == 3]
            if len(neg):
                sq = seqs.copy()
                sq[neg] = -1 - sq[neg]  # negative sequence_number
                cols["sequence_number"] = pa.array(sq)

        path = os.path.join(wal_dir, f"seg-{seg_no:05d}.parquet")
        pq.write_table(pa.table(cols), path)
        paths.append(path)
    return paths
