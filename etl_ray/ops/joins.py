"""Broadcast lookup joins: the small-side dimension-join pattern.

The reference's analog is its per-process annotation/metadata lookups
(site/geo dictionaries loaded once per worker and probed per row,
/root/reference/web100/web100.go:92-105, parser/annotation2.go). At engine
scale this is THE way to join a small side: `ray.put` the lookup table once,
fetch it once per worker in the stage constructor, probe it vectorized per
batch — zero shuffle, vs. an all-to-all join that moves the big side.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


class BroadcastLookup:
    """Stateful map_batches stage: the lookup frame is resolved once per
    worker (constructor), then every batch is a vectorized pandas merge
    against the in-memory side. ``lookup`` may be an object-store ref (big
    side: fetched once per ACTOR) or a plain frame (small side: shipped
    inside the instance to a task pool — no per-execution actor spawn)."""

    def __init__(self, lookup, left_on: str, right_on: str,
                 columns: Optional[List[str]]):
        import ray

        lk = ray.get(lookup) if isinstance(lookup, ray.ObjectRef) else lookup
        if columns:
            lk = lk[[right_on] + [c for c in columns if c != right_on]]
        self.lookup = lk.set_index(right_on)
        self.left_on = left_on

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        joined = df.join(self.lookup, on=self.left_on)
        return pa.Table.from_pandas(joined, preserve_index=False)


# ship-inside-the-task threshold: below this the serialized lookup rides
# along with each task (cheap); above it, ray.put once + actor pool
SMALL_LOOKUP_BYTES = 8 << 20


def broadcast_join(ds, lookup: pd.DataFrame, *, left_on: str, right_on: str,
                   columns: Optional[List[str]] = None,
                   concurrency: Optional[int] = None):
    """Dataset ⟕ small pandas frame (left join), broadcast once. The small
    side must fit worker memory — the same bound as the reference's
    per-process dictionaries; shuffle joins (`Dataset.join`) remain the
    path for two big sides."""
    import ray

    if lookup.memory_usage(deep=True).sum() <= SMALL_LOOKUP_BYTES:
        # constructed instance → task pool (actor spawn ~1 s/actor per
        # execution is pure overhead for a tiny dim table)
        return ds.map_batches(
            BroadcastLookup(lookup, left_on, right_on, columns),
            batch_format="pyarrow",
        )
    ref = ray.put(lookup)
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(2, cpus - 2)
    return ds.map_batches(
        BroadcastLookup,
        fn_constructor_args=(ref, left_on, right_on, columns),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


# ------------------------------------------------------------- as-of joins
class BroadcastAsof:
    """Stateful map_batches stage for the small-right-side AS-OF join:
    per key, each left row gets the LATEST right row whose time is <= the
    left time (direction='backward'). The right side is indexed ONCE per
    worker (sorted arrays per key); each batch is one vectorized
    np.searchsorted per key present — zero shuffle."""

    def __init__(self, right_ref, by: str, on: str, right_on: str,
                 value_cols: List[str]):
        import ray

        right = ray.get(right_ref) if not isinstance(
            right_ref, pd.DataFrame) else right_ref
        self.by, self.on = by, on
        self.value_cols = value_cols
        self.index: Dict = {}
        for key, g in right.groupby(by, sort=False):
            g = g.sort_values(right_on, kind="stable")
            self.index[key] = (
                g[right_on].to_numpy(),
                {c: g[c].to_numpy() for c in value_cols},
            )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        out = {c: np.full(n, None, dtype=object) for c in self.value_cols}
        keys = df[self.by].to_numpy()
        times = df[self.on].to_numpy()
        for key, idx in pd.Series(range(n)).groupby(keys):
            entry = self.index.get(key)
            if entry is None:
                continue
            t_right, vals = entry
            pos = np.searchsorted(t_right, times[idx.to_numpy()],
                                  side="right") - 1
            ok = pos >= 0
            rows = idx.to_numpy()[ok]
            for c in self.value_cols:
                out[c][rows] = vals[c][pos[ok]]
        res = df.copy()
        for c in self.value_cols:
            res[c] = out[c]
        return res


def asof_join_broadcast(left, right: pd.DataFrame, *, by: str, on: str,
                        right_on: str, value_cols: List[str],
                        concurrency: int = 4):
    """AS-OF join with a broadcast right side (`ray.put` once, indexed once
    per worker). Right side must fit worker memory — the dim-state shape."""
    import ray

    ref = ray.put(right)
    return left.map_batches(
        BroadcastAsof,
        fn_constructor_args=(ref, by, on, right_on, value_cols),
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )


def asof_join(left, right, *, by: str, on: str, right_on: str,
              value_cols: List[str], num_buckets: Optional[int] = None):
    """Scalable AS-OF join: both sides hash-bucket on the key (ONE shuffle,
    bounded group count — never a group per key, which is the many-tiny-
    groups map_groups shape measured pathological), then each bucket runs
    one vectorized ``pd.merge_asof``. Partitioning assumption: a bucket's
    rows (both sides) fit one worker — size num_buckets accordingly."""
    import ray

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_buckets = max(4, cpus)

    base = left.schema().base_schema
    if isinstance(base, pa.Schema):
        lschema = base
    else:  # PandasBlockSchema: parallel .names / .types (numpy dtypes)
        lschema = pa.schema([
            (n, pa.from_numpy_dtype(np.dtype(t)))
            for n, t in zip(base.names, base.types)
        ])
    left_cols = list(lschema.names)
    all_cols = left_cols + [c for c in [right_on] + value_cols
                            if c not in left_cols]
    # NaN-padding the union upcasts ints to float; remember the left-side
    # dtypes so per_bucket can restore them after the side split
    left_dtypes = {f.name: f.type.to_pandas_dtype() for f in lschema
                   if pa.types.is_integer(f.type)
                   or pa.types.is_floating(f.type)}

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in all_cols:
                if c not in df.columns:
                    df[c] = np.nan
            df = df[all_cols]
            df["__side"] = np.int64(side)
            df["__bucket"] = pd.util.hash_array(
                df[by].to_numpy()).astype(np.int64) % num_buckets
            return df

        return f

    lt = left.map_batches(tag(0), batch_format="pandas")
    rt = right.map_batches(tag(1), batch_format="pandas")
    both = lt.union(rt)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0][left_cols].copy()
        for c, dt in left_dtypes.items():
            lf[c] = lf[c].astype(dt)
        lf = lf.sort_values(on, kind="stable")
        rf = g[g["__side"] == 1][[by, right_on] + value_cols]
        rf = rf.dropna(subset=[right_on]).sort_values(
            right_on, kind="stable").copy()
        rf[right_on] = rf[right_on].astype(lf[on].dtype)
        rf[by] = rf[by].astype(lf[by].dtype)
        merged = pd.merge_asof(lf, rf, left_on=on, right_on=right_on,
                               by=by, direction="backward")
        return merged.drop(columns=[right_on])

    return both.groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")
