"""Deterministic sampling for training-data mixing.

Sampling at 100 TB must be (a) a pure per-row predicate — no global state,
no RNG stream that depends on partitioning or visit order — and (b)
reproducible, so a re-run (or the correctness oracle) selects the SAME
rows. Both come from hashing a stable row key: keep a row iff
``md5le64(key) % denom < num``. That is exactly the reference's
task-sampling shape (archive skip-count sampling,
/root/reference/storage/storage.go fileListerFunc analog in
sources/archive.py:46-61) lifted from files to rows, and it is
SQL-reproducible via the same md5 fold the sketch oracles use.

Stratified variant: a per-stratum rate table (small, broadcast inside the
stage instance) — the standard way to rebalance a source mix.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from etl_ray.ops.dedup import md5le64

DENOM = 1 << 16


def _keep_mask(keys: np.ndarray, num: np.ndarray) -> np.ndarray:
    """keys: string array; num: per-row numerator against DENOM."""
    h = md5le64(keys.astype(str)) % np.uint64(DENOM)
    return h.astype(np.int64) < num


def hash_sample(ds, *, key_col: str, rate: float, seed: str = ""):
    """Uniform deterministic sample: keep ~``rate`` of rows, selected by
    key hash (stable across runs/partitionings). ``seed`` perturbs the
    hash domain so independent samples don't nest."""
    num = int(round(rate * DENOM))

    def f(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(str)
        if seed:
            keys = np.char.add(keys, seed)
        mask = _keep_mask(keys, np.int64(num))
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, *, key_col: str, stratum_col: str,
                      rates: Dict[str, float], default_rate: float = 0.0,
                      seed: str = ""):
    """Per-stratum deterministic sampling (source-mix rebalancing): each
    stratum keeps its own fraction. The rate table is tiny and ships inside
    the stage; rows of unlisted strata keep ``default_rate``."""
    nums = {k: int(round(v * DENOM)) for k, v in rates.items()}
    dflt = int(round(default_rate * DENOM))

    def f(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(str)
        if seed:
            keys = np.char.add(keys, seed)
        strata = batch[stratum_col].to_numpy(zero_copy_only=False)
        num = pd.Series(strata).map(nums).fillna(dflt).to_numpy(np.int64)
        mask = _keep_mask(keys, num)
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def split_train_holdout(ds, *, key_col: str, holdout_rate: float,
                        seed: str = "") -> Tuple:
    """Deterministic disjoint train/holdout split by key hash: the SAME
    key always lands on the same side (leakage-safe across reruns and
    across derived datasets keyed the same way)."""
    num = int(round(holdout_rate * DENOM))

    def side(want_holdout: bool):
        def f(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].to_numpy(zero_copy_only=False).astype(str)
            if seed:
                keys = np.char.add(keys, seed)
            mask = _keep_mask(keys, np.int64(num))
            return batch.filter(pa.array(mask if want_holdout else ~mask))

        return f

    return (ds.map_batches(side(False), batch_format="pyarrow"),
            ds.map_batches(side(True), batch_format="pyarrow"))


def weighted_sample(ds, *, key_col: str, weight_col: str, k: int,
                    seed: str = "", round_to: int = 6) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each row scores
    ``u ** (1 / w)`` with ``u = md5le64(seed + key) / 2**64``; the sample
    is the global top-k by score. Hash-derived u makes the draw a pure
    per-row function — reproducible, partition-independent, and
    SQL-reproducible (pow + the md5 fold).

    Scale shape: each batch keeps only its local top-k candidates
    (argpartition, no sort), so the driver-side merge sees at most
    k × n_blocks small rows. Rows with non-positive weight are excluded
    (their inclusion probability is 0)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy(np.float64)
        ok = w > 0
        df, w = df[ok], w[ok]
        if len(df) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 weight_col: pd.Series([], dtype=float),
                                 "score": pd.Series([], dtype=float)})
        keys = df[key_col].astype(str)
        if seed:
            keys = seed + keys
        u = md5le64(keys.to_numpy()).astype(np.float64) / float(1 << 64)
        score = u ** (1.0 / w)
        if len(df) > k:
            idx = np.argpartition(score, -k)[-k:]
        else:
            idx = np.arange(len(df))
        return pd.DataFrame({key_col: df[key_col].to_numpy()[idx],
                             weight_col: w[idx], "score": score[idx]})

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = cand.sort_values(["score", key_col],
                           ascending=[False, True]).head(k)
    out["score"] = out["score"].round(round_to)
    return out.reset_index(drop=True)


def mixture_expand(ds, *, key_col: str, source_col: str,
                   weights: Dict[str, float], default_weight: float = 1.0,
                   seed: str = ""):
    """Deterministic data-mixture expansion: each source's docs appear
    ``weight`` times per epoch — whole copies for the integer part plus a
    hash-sampled extra copy with probability frac(weight). weight 2.3 ⇒
    every doc twice and ~30% of docs a third time; weight 0.3 ⇒ ~30% of
    docs once. The standard way pretraining runs up/down-weight sources
    without materializing shuffled epochs.

    Pure per-row arithmetic (1→N inside map_batches, zero shuffle,
    reproducible): n_copies(doc) = floor(w) + [md5(key+seed) % D <
    frac(w)·D], emitted as (…, copy_idx) rows. The trainer interleaves by
    hashing (key, copy_idx) into its shuffle buffer."""
    fw = {k: float(v) for k, v in weights.items()}

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.append_column("copy_idx",
                                       pa.array([], pa.int64()))
        src = batch[source_col].to_numpy(zero_copy_only=False)
        w = pd.Series(src).map(fw).fillna(default_weight).to_numpy(
            np.float64)
        whole = np.floor(w).astype(np.int64)
        # half-AWAY-from-zero like SQL round(); np.round's banker's
        # rounding would diverge on exact .5 numerators
        frac_num = np.floor((w - whole) * DENOM + 0.5).astype(np.int64)
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(str)
        if seed:
            keys = np.char.add(keys, seed)
        extra = _keep_mask(keys, frac_num).astype(np.int64)
        copies = whole + extra
        idx = np.repeat(np.arange(n), copies)
        out = batch.take(pa.array(idx))
        starts = np.concatenate([[0], np.cumsum(copies)[:-1]])
        copy_idx = np.arange(len(idx), dtype=np.int64) - starts[idx]
        return out.append_column("copy_idx", pa.array(copy_idx))

    return ds.map_batches(f, batch_format="pyarrow")


def epoch_order(ds, *, key_col: str, epoch: int = 0, seed: str = ""):
    """Deterministic per-epoch global shuffle order: rank docs by
    ``md5(key + epoch + seed)`` — every epoch is a different but fully
    reproducible permutation, and any worker can recompute any doc's
    position without coordination (the property RNG-stream shuffles lose
    the moment partitioning changes).

    Scale shape: the hash is per-row; the global rank is ONE distributed
    sort on it (Ray's range-partitioned sort — the honest cost of a true
    global permutation). When only approximate mixing is needed, skip the
    sort and hash-bucket locally instead; this op is for the exact,
    resumable training order. Returns (key, epoch_rank)."""

    def add_hash(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(str)
        salted = np.char.add(keys, f"|e{epoch}|{seed}")
        # UNSIGNED on purpose: the SQL oracle's md5 fold is a UBIGINT and
        # an int64 view would order the >=2^63 half first
        h = md5le64(salted.astype(object))
        return pa.table({key_col: t[key_col], "__h": pa.array(h)})

    # materialize the sorted set ONCE: count() and zip() each execute the
    # lazy plan, so without it the upstream pipeline and the global sort
    # would run twice
    ranked = ds.map_batches(add_hash, batch_format="pyarrow") \
        .sort(["__h", key_col]).materialize()

    # ranks are assigned per sorted block using the block's global offset
    # (map_batches over the sorted dataset preserves block order but not
    # offsets, so enumerate via a monotonic zip)
    import ray.data as rd

    total = ranked.count()
    idx = rd.range(total)
    return ranked.zip(idx).map_batches(
        lambda t: pa.table({key_col: t[key_col],
                            "epoch_rank": t["id"]}),
        batch_format="pyarrow")
