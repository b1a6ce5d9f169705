"""Pollution-buffer retraction: cross-record retraction of earlier data by
later-arriving evidence.

The reference's PT parser keeps a small buffer of "incomplete" traceroute
tests (those that did not reach their expected destination); when a later
test's destination IP shows up as the final hop of a buffered test, the
buffered test was POLLUTED by route interleaving and is discarded instead of
inserted (/root/reference/parser/pt.go:627-669, buffer size pt.go:49).

Engine analog, made deterministic so a SQL oracle can reproduce it exactly:
a record R that is NOT complete is retracted iff any of the next ``window``
records S in the same key group (the buffer depth) has
``S.dest == R.last_hop`` and ``R.dest != S.dest``. Complete records are
never buffered (pt.go:650-659's fast path) and thus never retracted.

Two surfaces:
  * ``detect_pollution(ds, ...)`` — flags every record
    (polluted, retracted_by) via one groupby(key) + vectorized shifts;
  * ``retraction_events(flags)`` — turns polluted rows into DELETE change
    events so a CDC replay applies the retraction to the lake (the stage
    that *generates* retractions from later-arriving data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def flag_pollution(g: pd.DataFrame, *, order_col: str, dest_col: str,
                   last_hop_col: str, complete_col: str,
                   window: int) -> pd.DataFrame:
    """One key group, vectorized: forward-window pollution flags."""
    g = g.sort_values(order_col).reset_index(drop=True)
    dest = g[dest_col].to_numpy()
    last_hop = g[last_hop_col].to_numpy()
    complete = g[complete_col].to_numpy(dtype=bool)
    order = g[order_col].to_numpy()
    n = len(g)
    polluted = np.zeros(n, dtype=bool)
    retracted_by = np.full(n, -1, dtype=np.int64)
    # nearest polluter wins: scan the window nearest-first, keep first match
    for k in range(window, 0, -1):
        if k >= n:
            continue
        s_dest = np.empty_like(dest)
        s_dest[:n - k] = dest[k:]
        s_dest[n - k:] = -1 if np.issubdtype(dest.dtype, np.integer) else None
        s_ord = np.empty_like(order)
        s_ord[:n - k] = order[k:]
        s_ord[n - k:] = -1
        hit = np.zeros(n, dtype=bool)
        hit[:n - k] = (~complete[:n - k]) & (s_dest[:n - k] == last_hop[:n - k]) \
            & (dest[:n - k] != s_dest[:n - k])
        polluted |= hit
        retracted_by[hit] = s_ord[hit]
    g = g.copy()
    g["polluted"] = polluted
    g["retracted_by"] = pd.array(
        np.where(polluted, retracted_by, -1), dtype="int64")
    g.loc[~polluted, "retracted_by"] = pd.NA
    g["retracted_by"] = g["retracted_by"].astype("Int64")
    return g


def detect_pollution(ds, *, key_col: str, order_col: str, dest_col: str,
                     last_hop_col: str, complete_col: str, window: int = 2,
                     concurrency: int = 4, num_buckets: int = 256):
    """Dataset → Dataset with (polluted, retracted_by) per record. The ONE
    shuffle is a groupby on ``hash(key) % num_buckets`` — never one group
    per distinct key (the many-tiny-groups map_groups trap). Each bucket
    sorts once by (key, order) and runs the forward-window shifts across
    ALL its keys at once, masking cross-key comparisons (a shift of k only
    hits when row i and row i+k share the key)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(
            [key_col, order_col], kind="stable").reset_index(drop=True)
        keyv = g[key_col].to_numpy()
        dest = g[dest_col].to_numpy()
        last_hop = g[last_hop_col].to_numpy()
        complete = g[complete_col].to_numpy(dtype=bool)
        order = g[order_col].to_numpy()
        n = len(g)
        polluted = np.zeros(n, dtype=bool)
        retracted_by = np.full(n, -1, dtype=np.int64)
        # nearest polluter wins: scan the window nearest-first (larger k
        # first so a smaller k overwrites), keep first match
        for k in range(window, 0, -1):
            if k >= n:
                continue
            hit = np.zeros(n, dtype=bool)
            hit[:n - k] = ((keyv[:n - k] == keyv[k:])
                           & ~complete[:n - k]
                           & (dest[k:] == last_hop[:n - k])
                           & (dest[:n - k] != dest[k:]))
            polluted |= hit
            idx = np.flatnonzero(hit)
            retracted_by[idx] = order[idx + k]
        g = g.copy()
        g["polluted"] = polluted
        g["retracted_by"] = pd.array(
            np.where(polluted, retracted_by, -1), dtype="int64")
        g.loc[~polluted, "retracted_by"] = pd.NA
        g["retracted_by"] = g["retracted_by"].astype("Int64")
        return g

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_array(df[key_col].to_numpy())
        df["__bucket"] = (h % num_buckets).astype(np.int64)
        return df

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pandas"))


def retraction_events(flags: pd.DataFrame, *, id_col: str,
                      order_col: str, seq_base: int) -> pd.DataFrame:
    """Polluted rows → DELETE change events (op/doc_id/sequence_number).
    Sequence numbers start above ``seq_base`` so every retraction wins LWW
    against the record it retracts."""
    p = flags[flags["polluted"]].sort_values(order_col)
    return pd.DataFrame({
        "op": "delete",
        "doc_id": p[id_col].astype(str),
        "sequence_number": seq_base + np.arange(len(p), dtype=np.int64),
    })
