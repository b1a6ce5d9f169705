"""Fuzzy string matching: all pairs within Levenshtein distance ≤ 1 via
deletion-neighborhood blocking (the FastSS / SymSpell signature scheme —
public algorithm, Bocek et al. 2007).

Exactness: ``lev(a, b) <= 1`` iff a and b share at least one member of
their 1-deletion neighborhoods (the string itself plus every single-
character deletion). The blocking is therefore LOSSLESS — unlike LSH,
no candidate within distance 1 is ever missed — and every candidate is
verified exactly, so the output equals the O(n²) oracle.

Scale shape (the entity-resolution analog of the MinHash pipeline in
ops/dedup.py):
- signature generation is vectorized over a fixed-width char matrix —
  the loop is over CHAR POSITIONS (~string length), never over rows;
- candidates come from a capped hash SELF-JOIN on the signature
  (hot signatures are dropped with a printed count, like LSH buckets);
- verification is a vectorized hamming / one-gap alignment on char
  matrices — no per-pair Python Levenshtein;
- cross-signature pair dedup is a hash-combinable Min aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _char_matrix(strs: np.ndarray, width: int) -> np.ndarray:
    """(n, width) matrix of unicode chars, NUL-padded."""
    m = strs.astype(f"U{width}")
    return m.view("U1").reshape(len(strs), width)


def _deletion_signatures(strs: np.ndarray):
    """(row_idx, signature) for every string and every 1-deletion of it.
    Vectorized: one concatenate+view per char position."""
    n = len(strs)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, dtype="U1")
    lens = np.char.str_len(strs)
    # all-empty batch: lens.max()==0 and .view('U1').reshape(n, 0) would
    # raise; width>=1 keeps the matrix well-formed (empty strings simply
    # produce their sole signature, the empty string itself)
    width = max(int(lens.max()), 1) if n else 1
    chars = _char_matrix(strs, width)
    rows = [np.arange(n)]
    sigs = [strs.astype(f"U{width}")]
    for i in range(width):
        has = lens > i
        if not has.any():
            break
        sub = np.ascontiguousarray(
            np.concatenate([chars[has, :i], chars[has, i + 1:]], axis=1))
        s = sub.view(f"U{max(width - 1, 1)}").ravel()
        rows.append(np.flatnonzero(has))
        sigs.append(s)
    row_idx = np.concatenate(rows)
    out = np.concatenate(sigs)
    # views keep NUL padding; a padded signature must equal its unpadded
    # twin from a shorter string, so strip the padding
    return row_idx, np.char.rstrip(out, "\x00")


def _lev_le1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact distance in {0, 1, 2+} per pair, vectorized; returns the
    distance array with 2 meaning "greater than 1"."""
    n = len(a)
    dist = np.full(n, 2, dtype=np.int8)
    if n == 0:
        return dist
    la, lb = np.char.str_len(a), np.char.str_len(b)
    dist[a == b] = 0
    width = int(max(la.max(), lb.max())) + 1
    ca, cb = _char_matrix(a, width), _char_matrix(b, width)
    # same length: hamming distance exactly 1
    same = (la == lb) & (dist != 0)
    if same.any():
        diffs = (ca[same] != cb[same]).sum(axis=1)
        idx = np.flatnonzero(same)
        dist[idx[diffs == 1]] = 1
    # length differs by 1: one-gap alignment — delete the first
    # mismatching char of the longer string and require equality
    d1 = np.abs(la - lb) == 1
    if d1.any():
        idx = np.flatnonzero(d1)
        lng = np.where(la[idx] >= lb[idx], 0, 1)
        cl = np.where(lng[:, None] == 0, ca[idx], cb[idx])
        cs = np.where(lng[:, None] == 0, cb[idx], ca[idx])
        mism = cl != cs
        p = mism.argmax(axis=1)
        cols = np.arange(width - 1)
        take = cols[None, :] + (cols[None, :] >= p[:, None])
        deleted = np.take_along_axis(cl, take, axis=1)
        ok = (deleted == cs[:, : width - 1]).all(axis=1)
        dist[idx[ok]] = 1
    return dist


class _SigGen:
    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # nulls would become the literal string 'None' under np dtype='U'
        # (silently pairing all nulls at distance 0) and empty strings are
        # not meaningful entities — drop both before signature generation
        # (a null mask entry is dropped by Table.filter by default)
        t = t.filter(pc.greater(pc.utf8_length(t[self.text_col]), 0))
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        strs = t[self.text_col].to_numpy(zero_copy_only=False).astype("U")
        rows, sigs = _deletion_signatures(strs)
        return pa.table({
            "sig": pa.array(sigs.tolist(), pa.string()),
            self.id_col: pa.array(ids[rows]),
            self.text_col: pa.array(strs[rows].tolist(), pa.string()),
        })


def edit1_pairs(ds, *, id_col: str, text_col: str,
                max_bucket_ids: int = 4096):
    """All unordered id pairs whose strings are within Levenshtein
    distance 1 (0 = identical strings under distinct ids). Returns a
    Dataset (id_a, id_b, dist)."""
    from ray.data.aggregate import Min

    from etl_ray.ops.dedup import _bucket_self_pairs

    sig = ds.map_batches(_SigGen(id_col, text_col), batch_format="pyarrow")
    cand = _bucket_self_pairs(sig, ["sig"], id_col, max_bucket_ids,
                              payload_col=text_col)

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        if len(t) == 0 or text_col not in t.column_names:
            return empty
        a = t[text_col].to_numpy(zero_copy_only=False).astype("U")
        b = t[f"{text_col}_b"].to_numpy(zero_copy_only=False).astype("U")
        dist = _lev_le1_mask(a, b)
        keep = dist <= 1
        if not keep.any():
            return empty
        return pa.table({
            "id_a": t["id_a"].filter(pa.array(keep)),
            "id_b": t["id_b"].filter(pa.array(keep)),
            "dist": pa.array(dist[keep].astype(np.int64)),
        })

    verified = cand.map_batches(verify, batch_format="pyarrow")
    # a pair may be found via several shared signatures: hash-agg dedup
    return verified.groupby(["id_a", "id_b"]).aggregate(
        Min("dist", alias_name="dist"))
