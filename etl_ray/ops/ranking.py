"""Per-key top-k: grouped ranking without the tiny-groups trap.

Semantics: for each key keep the k rows with the highest ``value``, ties
broken deterministically by the lowest ``order_col`` (so results are
stable and SQL-reproducible: row_number() OVER (PARTITION BY key ORDER BY
value DESC, order_col) <= k).

Scale shape (two stages, ONE shuffle):
1. batch-local partial top-k inside map_batches — a batch contributes at
   most k rows per key it contains, so the shuffle moves <= k rows per
   (key, batch), independent of batch size;
2. keys are hashed into COARSE buckets (hundreds, never one group per
   key — BASELINE.md measured the many-tiny-groups map_groups shape
   pathological) and each bucket resolves its keys' final top-k with one
   vectorized sort + groupby-cumcount.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _local_topk(df: pd.DataFrame, key_col: str, value_col: str,
                order_col: str, k: int) -> pd.DataFrame:
    df = df.sort_values([key_col, value_col, order_col],
                        ascending=[True, False, True], kind="stable")
    rank = df.groupby(key_col, sort=False).cumcount()
    return df[rank < k]


def top_k_per_key(ds, *, key_col: str, value_col: str, order_col: str,
                  k: int, num_buckets: int = 256, with_rank: bool = True):
    """Highest-``k`` rows per key. Returns the input columns (plus
    ``rank`` 0..k-1 when ``with_rank``)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = _local_topk(df, key_col, value_col, order_col, k).copy()
        out["__bucket"] = pd.util.hash_array(
            out[key_col].to_numpy()).astype(np.int64) % num_buckets
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        g = g.sort_values([key_col, value_col, order_col],
                          ascending=[True, False, True], kind="stable")
        rank = g.groupby(key_col, sort=False).cumcount()
        out = g[rank < k].copy()
        if with_rank:
            out["rank"] = rank[rank < k].to_numpy()
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
