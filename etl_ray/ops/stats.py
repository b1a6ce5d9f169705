"""Distribution statistics over a numeric column: mergeable fixed-bin
histograms and exact distributed quantiles.

Reference analog: the row-stats counters the reference keeps per buffer
(SURVEY.md §2.8, row stats / metrics histograms in metrics/metrics.go) —
here generalized to corpus-scale data profiling.

Histogram: the canonical mergeable-state shape — each batch folds to at
most ``n_bins`` partial rows (np.bincount), the combine is a Sum
aggregate; data rows never shuffle.

Exact quantiles: distributed sort, then a METADATA walk — block row
counts give each target rank's block without fetching anything; only the
few blocks actually holding a requested rank are pulled (one small
``ray.get`` each). percentile_disc semantics (element at 1-based rank
``ceil(q·n)``), so results are exact corpus elements, bit-equal to the
DuckDB oracle.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def histogram(ds, *, col: str, lo: float, hi: float, n_bins: int = 20):
    """Fixed-width histogram of ``col`` over [lo, hi); values outside are
    clamped into the edge bins. Returns a Dataset of (bin, lo, hi, n),
    one row per non-empty bin."""
    from ray.data.aggregate import Sum

    width = (hi - lo) / n_bins

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / width).astype(np.int64),
                    0, n_bins - 1)
        counts = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(counts)
        return pa.table({
            "bin": pa.array(nz, pa.int64()),
            "n": pa.array(counts[nz], pa.int64()),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin").aggregate(Sum("n", alias_name="n"))
    )

    def edges(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": t["bin"],
            "bin_lo": pa.array(lo + b * width),
            "bin_hi": pa.array(lo + (b + 1) * width),
            "n": t["n"],
        })

    return out.map_batches(edges, batch_format="pyarrow")


def exact_quantiles(ds, *, col: str, qs: Sequence[float]) -> pd.DataFrame:
    """Exact quantiles via distributed sort + targeted block fetch.
    Returns a DataFrame (q, value) with percentile_disc semantics."""
    import ray
    import pyarrow.compute as pc

    # percentile_disc ignores nulls; drop them before the sort
    ds = ds.map_batches(lambda t: t.filter(pc.is_valid(t[col])),
                        batch_format="pyarrow")
    s = ds.sort(col).materialize()
    blocks = [(ref, meta.num_rows)
              for b in s.iter_internal_ref_bundles()
              for ref, meta in b.blocks]
    n = sum(c for _, c in blocks)
    if n == 0:
        return pd.DataFrame({"q": list(qs), "value": [None] * len(qs)})
    # 0-based global rank per q: ceil(q*n) - 1, clamped (q=0 → rank 0)
    ranks = [max(0, min(n - 1, math.ceil(q * n) - 1)) for q in qs]
    values = {}
    cum = 0
    wanted = sorted(set(ranks))
    wi = 0
    for ref, cnt in blocks:
        while wi < len(wanted) and wanted[wi] < cum + cnt:
            blk = ray.get(ref)  # fetched once; consecutive ranks reuse it
            local = wanted[wi] - cum
            values[wanted[wi]] = blk[col][local].as_py()
            wi += 1
        if wi == len(wanted):
            break
        cum += cnt
    return pd.DataFrame({"q": list(qs),
                         "value": [values[r] for r in ranks]})
