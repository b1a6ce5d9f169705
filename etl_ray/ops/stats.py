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


def kmv_quantiles(ds, *, key_col: str, col: str, qs: Sequence[float],
                  m: int = 4096, seed: str = "") -> pd.DataFrame:
    """Approximate quantiles via a deterministic KMV (bottom-k) sample:
    keep the ``m`` rows with the SMALLEST ``md5le64(seed + key)`` — a
    uniform hash-rank sample — then take exact percentile_disc over the
    sample. Error is O(1/sqrt(m)) in rank, yet the result is EXACTLY
    reproducible (same rows every run, any partitioning), so it is
    SQL-oracle-checkable, unlike randomized sketches.

    This is the 100 TB path where exact_quantiles' full distributed sort
    is too expensive: each batch keeps its local bottom-m (argpartition),
    the combine is a bottom-m of at most m x n_blocks candidate rows —
    mergeable, no shuffle of data rows."""
    from etl_ray.ops.dedup import md5le64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        df, v = df[ok], v[ok]
        if len(df) == 0:
            return pd.DataFrame({"h": pd.Series([], dtype=np.uint64),
                                 col: pd.Series([], dtype=float)})
        keys = df[key_col].astype(str)
        if seed:
            keys = seed + keys
        h = md5le64(keys.to_numpy())
        if len(df) > m:
            idx = np.argpartition(h, m)[:m]
            h, v = h[idx], v[idx]
        return pd.DataFrame({"h": h, col: v})

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cand = cand.nsmallest(m, "h") if len(cand) > m else cand
    v = np.sort(cand[col].to_numpy(np.float64))
    n = len(v)
    vals = [v[max(0, min(n - 1, math.ceil(q * n) - 1))] if n else None
            for q in qs]
    return pd.DataFrame({"q": list(qs), "value": vals})


def group_moments_cents(ds, *, col: str, by: str):
    """Per-group (n, Σcents, Σcents²) where cents = round(col·100) as
    int64. Integer partial sums make the downstream mean/variance doubles
    BIT-EQUAL to any oracle doing the same arithmetic — no float-summation
    order sensitivity. Returns a small pandas DataFrame (one row/group)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        c = np.round(v[ok] * 100).astype(np.int64)
        g = df[by].to_numpy()[ok]
        out = pd.DataFrame({by: g, "_n": 1, "_s": c, "_s2": c * c})
        return out.groupby(by, as_index=False).sum()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_s", alias_name="s"),
                   Sum("_s2", alias_name="s2"))
    ).to_pandas()


def group_zscore(ds, *, col: str, by: str, id_col: str,
                 round_to: int = 6):
    """Population z-score of ``col`` within each ``by`` group:
    one small aggregate (group_moments_cents), stats broadcast once via
    ``ray.put``, then a stateless vectorized normalize — no row shuffle.
    Returns a Dataset (id_col, by, z)."""
    import ray

    m = group_moments_cents(ds, col=col, by=by)
    mean_c = m["s"].to_numpy(np.float64) / m["n"].to_numpy(np.float64)
    var_c = (m["s2"].to_numpy(np.float64) / m["n"].to_numpy(np.float64)
             - mean_c * mean_c)
    stats = {k: (mu, math.sqrt(v))
             for k, mu, v in zip(m[by], mean_c, var_c)}
    ref = ray.put(stats)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        v = df[col].to_numpy(np.float64)
        df = df[~np.isnan(v)]  # null value = no z-score row
        keys = df[by].to_numpy()
        mu = np.array([st[k][0] for k in keys])
        sd = np.array([st[k][1] for k in keys])
        c = np.round(df[col].to_numpy(np.float64) * 100)
        z = np.round((c - mu) / sd, round_to)
        return pd.DataFrame({id_col: df[id_col], by: df[by], "z": z})

    return ds.map_batches(norm, batch_format="pandas")


def grouped_quantiles(ds, *, col: str, by: str, qs: Sequence[float],
                      num_buckets: int = 64):
    """percentile_disc per group — high-cardinality safe. Keys hash into
    ≤ ``num_buckets`` coarse buckets (the ops/ranking.py shape: one
    vectorized pandas pass per BUCKET, never one lambda per distinct
    group); inside a bucket every key's quantiles come from ONE sort by
    (key, value) plus a gather at start + ceil(q·n) − 1 per (key, q).
    Each bucket must fit one task (~rows/num_buckets) — the only
    partitioning assumption; raise num_buckets for skewless giants.
    Groups whose values are all NULL emit NULL, matching percentile_disc.
    Returns a Dataset (by, q, value)."""
    from etl_ray.ops.windows import _bucket_groups

    qa = np.asarray(list(qs), dtype=np.float64)
    nq = len(qa)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        codes, uniques = pd.factorize(g[by], sort=True)
        # NULL group keys factorize to code -1, which would wrap around to
        # uniques[-1] below — route them to a dedicated trailing code so
        # they form their own group (SQL GROUP BY semantics: NULL is a
        # group), emitted with a NULL key.
        null_code = len(uniques)
        codes = np.where(codes < 0, null_code, codes)
        key_vals = np.append(np.asarray(uniques, dtype=object), None)
        v = g[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        ck, vk = codes[ok], v[ok]
        order = np.lexsort((vk, ck))
        ck, vk = ck[order], vk[order]
        ucodes, starts, counts = np.unique(
            ck, return_index=True, return_counts=True)
        st = np.repeat(starts, nq)
        n = np.repeat(counts, nq)
        qq = np.tile(qa, len(ucodes))
        idx = st + np.minimum(n - 1, np.maximum(
            0, np.ceil(qq * n).astype(np.int64) - 1))
        out = pd.DataFrame({
            by: key_vals[np.repeat(ucodes, nq)],
            "q": qq, "value": vk[idx],
        })
        # keys present only with NULL values: percentile_disc emits NULL
        n_codes = null_code + 1 if (codes == null_code).any() else null_code
        allnull = np.setdiff1d(np.arange(n_codes), ucodes)
        if len(allnull):
            out = pd.concat([out, pd.DataFrame({
                by: key_vals[np.repeat(allnull, nq)],
                "q": np.tile(qa, len(allnull)),
                "value": np.nan,
            })], ignore_index=True)
        return out

    return _bucket_groups(ds, [by], per_bucket, num_buckets)


def distinct_count_by(ds, *, by: str, key_col: str, alias: str = "n"):
    """Exact COUNT(DISTINCT key) per group — combiner-first: every batch
    collapses to its distinct (by, key) pairs BEFORE the shuffle, so the
    exchange moves at most one row per distinct pair per batch, never data
    rows; a pair-level groupby then a tiny per-group count finish it.
    The approximate sibling for unbounded key domains is
    ``sketches.grouped_hll_estimates``. Returns Dataset (by, alias)."""
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        return t.select([by, key_col]).group_by([by, key_col]).aggregate([])

    d = ds.map_batches(pairs, batch_format="pyarrow")
    # global pair distinct (one shuffle over distinct pairs) ...
    d = d.groupby([by, key_col]).aggregate(Count(alias_name="__dup"))
    # ... then a second, tiny shuffle counts pairs per group
    return d.groupby(by).aggregate(Count(alias_name=alias))


def bucketize_by_quantile(ds, *, col: str, qs: Sequence[float],
                          keep_cols: Sequence[str]):
    """Assign every row the quantile bucket of its ``col`` value — the
    standard feature-bucketization / length-stratification op. Boundaries
    come from ``exact_quantiles`` (percentile_disc elements) and are
    broadcast; the per-batch assignment is one ``np.searchsorted``
    (bucket i ⇔ value ≤ i-th boundary, last bucket = above all). NULL
    values are dropped (no bucket to assign). Returns a Dataset
    (keep_cols..., bucket int64)."""
    import ray

    # np.searchsorted requires ascending boundaries; a caller passing
    # unsorted qs would otherwise get silently wrong bucket assignments
    # (bucket i must mean "≤ i-th smallest boundary")
    bounds = exact_quantiles(
        ds, col=col, qs=sorted(qs))["value"].to_numpy(dtype=np.float64)
    bounds = np.sort(bounds)
    ref = ray.put(bounds)
    keep_cols = list(keep_cols)

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = ray.get(ref)
        t = t.filter(pc.is_valid(t[col]))
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bucket = np.searchsorted(b, v, side="left").astype(np.int64)
        out = t.select(keep_cols)
        return out.append_column("bucket", pa.array(bucket))

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_mad(ds, *, col: str, by: str) -> pd.DataFrame:
    """Robust per-group location + dispersion: median and MAD (median
    absolute deviation) — the outlier-resistant alternative to
    mean/stddev for telemetry strata. Two small passes over the same
    grouped-percentile machinery: (1) per-group median (percentile_disc
    element), broadcast as a tiny map; (2) per-group median of the
    integer-cent absolute deviations — exact, no float summation
    anywhere. Inherits ``grouped_quantiles``' high-cardinality-safe
    bucketed machinery; the only extra bound is the broadcast median
    map (one float per distinct group — the small-side-lookup
    pattern). Returns pandas (by, median, mad)."""
    import ray

    med_df = grouped_quantiles(ds, col=col, by=by, qs=[0.5]).to_pandas()
    med_map = dict(zip(med_df[by], med_df["value"]))
    ref = ray.put(med_map)

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        med = df[by].map(m).to_numpy(dtype=np.float64)
        ad = np.abs(np.round(df[col].to_numpy(np.float64) * 100)
                    - np.round(med * 100))
        out = pd.DataFrame({by: df[by], "ad": ad})
        return out[~np.isnan(ad)]

    mad_df = grouped_quantiles(
        ds.map_batches(derive, batch_format="pandas"),
        col="ad", by=by, qs=[0.5]).to_pandas()
    out = (
        med_df.rename(columns={"value": "median"})[[by, "median"]]
        .merge(mad_df.rename(columns={"value": "mad_c"})[[by, "mad_c"]],
               on=by)
    )
    out["mad"] = out["mad_c"] / 100.0
    return out.drop(columns=["mad_c"]).sort_values(by).reset_index(drop=True)


def rollup_counts(ds, *, cols: Sequence[str], agg_col: str):
    """GROUP BY ROLLUP(cols): one aggregate per prefix level
    (c0..ck), (c0..ck-1), ..., () — coarser levels use NULL for the
    rolled-up columns. Each level is its own small shuffle over already
    pre-aggregated rows. Returns a pandas DataFrame
    (cols..., n, <agg_col>_sum)."""
    from ray.data.aggregate import Count, Sum

    cols = list(cols)
    frames = []
    for k in range(len(cols), -1, -1):
        keys = cols[:k]
        if keys:
            part = ds.groupby(keys).aggregate(
                Count(alias_name="n"),
                Sum(agg_col, alias_name=f"{agg_col}_sum")).to_pandas()
        else:
            row = ds.aggregate(Count(alias_name="n"),
                               Sum(agg_col, alias_name=f"{agg_col}_sum"))
            part = pd.DataFrame([row])
        for c in cols[k:]:
            part[c] = None
        frames.append(part[cols + ["n", f"{agg_col}_sum"]])
    return pd.concat(frames, ignore_index=True)


def pivot_avg_cents(ds, *, index: str, pivot_col: str, value_col: str,
                    values: Sequence[str]):
    """Wide aggregation: one output row per ``index`` key with an
    ``avg_<v>`` column per pivot value. Partial per batch: integer cent
    sums + counts per (index, pivot) — the shuffle moves at most
    |values|·2 numeric columns per distinct index key per batch; the
    combine is Sum. Averages are finalized as
    ``(Σcents / 100) / n`` so they're bit-equal to a SQL oracle using the
    same expression. Returns a Dataset (index, avg_<v>...)."""
    from ray.data.aggregate import Sum

    values = list(values)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df[value_col].to_numpy(np.float64) * 100)
        out = pd.DataFrame({index: df[index]})
        pv = df[pivot_col].to_numpy()
        for v in values:
            m = pv == v
            out[f"_s_{v}"] = np.where(m, c, 0).astype(np.int64)
            out[f"_n_{v}"] = m.astype(np.int64)
        return out.groupby(index, as_index=False).sum()

    aggs = []
    for v in values:
        aggs += [Sum(f"_s_{v}", alias_name=f"_s_{v}"),
                 Sum(f"_n_{v}", alias_name=f"_n_{v}")]
    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(index).aggregate(*aggs)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({index: df[index]})
        for v in values:
            n = df[f"_n_{v}"].to_numpy(np.float64)
            s = df[f"_s_{v}"].to_numpy(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                a = (s / 100.0) / n
            out[f"avg_{v}"] = np.where(n > 0, a, np.nan)
        return out

    return agg.map_batches(finalize, batch_format="pandas")
