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
