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
                     concurrency: int = 4):
    """Dataset → Dataset with (polluted, retracted_by) per record. The ONE
    shuffle is the groupby on the key; within a group everything is numpy
    shifts (the buffer is a forward window, not a Python deque)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return flag_pollution(
            g, order_col=order_col, dest_col=dest_col,
            last_hop_col=last_hop_col, complete_col=complete_col,
            window=window)

    return ds.groupby(key_col).map_groups(per_group, batch_format="pandas")


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
