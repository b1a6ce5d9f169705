"""Event-time windowing: sessionization, tumbling and sliding windows.

Ray Data has no event-time/watermark runtime; stream-shaped semantics are
expressed as group-then-window over a keyed, time-sorted log
(ray_guide.md "Streaming-shaped workloads"). The reference's analogs:
NDT's timestamp-grouped test sessions (/root/reference/parser/ndt.go:210-309
— the group cache keyed by timestamp prefix) and SwitchParser's
group-samples-by-timestamp rows (parser/switch.go:121-182).

Ordering contract: windows are computed per key AFTER an explicit in-group
sort by (ts, event_id) — never from block arrival order (the reference's
out-of-order panic, parser/ndt.go:230-238, is the cautionary tale).

Scale shape: keys are hashed into COARSE buckets (hundreds, never one
group per key — ``groupby(key).map_groups`` pays one Python call + one
DataFrame per DISTINCT key, the many-tiny-groups trap BASELINE.md measured
at ~9 s for 76k groups). Each bucket sorts ONCE by (key, ts, order) and
computes every key's windows with vectorized cross-key transforms
(key-boundary-aware shift / cumsum / maximum.accumulate), so the work per
bucket is O(rows log rows) with zero per-key dispatch. One shuffle by
bucket; a key's history must fit one worker (bound it upstream with date
partitioning when keys are long-lived).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_NUM_BUCKETS = 256


def _bucket_tagger(key_cols, num_buckets: int):
    """The shared key-hash bucket tag: every collect/rank family stage must
    bucket IDENTICALLY or the same key lands in different groups.

    Arrow-native on purpose: a pandas tag stage silently promotes int64
    key columns to float64 in batches that contain nulls, so the SAME key
    hashes differently depending on which batch it rode in (misgrouping)
    and the shuffle sees mixed int64/double block schemas. Hashing a
    canonical string cast via the portable md5 kernel sidesteps both."""
    key_cols = list(key_cols)

    def tag(t: pa.Table) -> pa.Table:
        from etl_ray.ops.dedup import _SHINGLE_C, md5le64

        n = len(t)
        acc = np.zeros(n, np.uint64)
        for c in key_cols:
            s = pc.cast(t[c], pa.string())
            arr = s.to_numpy(zero_copy_only=False)
            arr = np.where(pd.isna(arr), "\x00__null__", arr).astype(object)
            acc = acc * _SHINGLE_C + md5le64(arr)
        return t.append_column("__bucket", pa.array(
            (acc % np.uint64(num_buckets)).astype(np.int64)))

    return tag


def _bucket_groups(ds, key_cols, per_bucket, num_buckets: int):
    """groupby(hash(keys) % num_buckets) + one vectorized map_groups per
    bucket — the ops/ranking.py shape. ``per_bucket`` sees the bucket's
    rows WITHOUT the helper column and must handle multiple keys."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return per_bucket(g.drop(columns="__bucket"))

    return (ds.map_batches(_bucket_tagger(key_cols, num_buckets),
                           batch_format="pyarrow")
            .groupby("__bucket").map_groups(run, batch_format="pandas"))


def _key_firsts(keys: pd.Series) -> np.ndarray:
    """Boolean mask: row starts a new key run (input sorted by key)."""
    first = keys.ne(keys.shift()).to_numpy(dtype=bool)
    if len(first):
        first[0] = True
    return first


def sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", gap_minutes: float = 30.0,
               order_col: str = "event_id",
               num_buckets: int = DEFAULT_NUM_BUCKETS):
    """Session windows: a session ends after ``gap_minutes`` of inactivity.

    Returns one row per (key, session_id): start/end, n_events, sum_value
    (sum in integer cents → exact, order-independent).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, order_col],
                          kind="stable").reset_index(drop=True)
        new_key = _key_firsts(g[key_col])
        brk = new_key | (g[ts_col].diff() > gap).to_numpy(dtype=bool)
        sid = np.cumsum(brk)  # globally unique session id within bucket
        # per-key session_id starts at 0: subtract the key's first sid
        key_first_sid = np.maximum.accumulate(np.where(new_key, sid, 0))
        cents = np.round(g[value_col].to_numpy() * 100).astype(np.int64)
        out = (
            g.assign(__sid=sid, session_id=(sid - key_first_sid),
                     __cents=cents)
            .groupby("__sid", as_index=False, sort=True)
            .agg(
                **{key_col: (key_col, "first")},
                session_id=("session_id", "first"),
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(order_col, "size"),
                __sum_cents=("__cents", "sum"),
            )
        ).drop(columns="__sid")
        out["sum_value"] = out.pop("__sum_cents") / 100.0
        return out

    return _bucket_groups(ds, [key_col], per_bucket, num_buckets)


def rolling_stats(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value", window: int = 3,
                  order_col: str = "event_id",
                  num_buckets: int = DEFAULT_NUM_BUCKETS):
    """Sliding window over each key's ordered events: moving average of the
    last ``window`` events (exact integer-cents arithmetic). Cross-key
    vectorized: one bucket-wide cumsum; each row's window start is
    max(row - window + 1, first row of its key)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, order_col],
                          kind="stable").reset_index(drop=True)
        n = len(g)
        cents = np.round(g[value_col].to_numpy() * 100).astype(np.int64)
        pos = np.arange(n, dtype=np.int64)
        new_key = _key_firsts(g[key_col])
        key_first = np.maximum.accumulate(np.where(new_key, pos, 0))
        start = np.maximum(pos - window + 1, key_first)
        csum = np.concatenate([[0], np.cumsum(cents)])
        wsum = csum[pos + 1] - csum[start]
        cnt = pos + 1 - start
        return pd.DataFrame(
            {
                key_col: g[key_col],
                order_col: g[order_col],
                "moving_avg": wsum / (100.0 * cnt),
            }
        )

    return _bucket_groups(ds, [key_col], per_bucket, num_buckets)


def lag_delta(ds, *, key_col: str = "user_id", ts_col: str = "ts",
              value_col: str = "value", order_col: str = "event_id",
              num_buckets: int = DEFAULT_NUM_BUCKETS):
    """Per-key successive difference (SQL ``value - lag(value) OVER
    (PARTITION BY key ORDER BY ts, order)``): the first event of each key
    gets a null delta. Integer-cents subtraction keeps the doubles
    bit-equal to the oracle's."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, order_col],
                          kind="stable").reset_index(drop=True)
        c = np.round(g[value_col].to_numpy(np.float64) * 100)
        prev = np.empty_like(c)
        prev[:1] = np.nan
        prev[1:] = c[:-1]
        delta = (c - prev) / 100.0
        delta[_key_firsts(g[key_col])] = np.nan  # first event of each key
        return pd.DataFrame({
            key_col: g[key_col],
            order_col: g[order_col],
            "delta": delta,
        })

    return _bucket_groups(ds, [key_col], per_bucket, num_buckets)


def window_dedup(ds, *, key_cols=("user_id", "event_type"),
                 ts_col: str = "ts", order_col: str = "event_id",
                 window_s: int = 3600,
                 num_buckets: int = DEFAULT_NUM_BUCKETS):
    """Event-time windowed deduplication: an event is dropped when the
    PREVIOUS event with the same key tuple is less than ``window_s``
    seconds older (SQL ``lag(ts) OVER (PARTITION BY keys ORDER BY ts,
    order)`` then a threshold filter) — the duplicate-beacon /
    retransmitted-measurement collapse, and the standard "same user+action
    within the hour is one event" rule for training-log hygiene.

    Deterministic: in-group order is (ts, order_col), never arrival order.
    Scale: one shuffle by key tuple; comparison is against the previous
    RAW event (pure window function, embarrassingly per-key), not the
    previous SURVIVOR — the survivor variant needs a sequential in-group
    scan and is what ``sessionize`` covers. Returns (keys..., order_col)
    of surviving events."""
    key_cols = list(key_cols)
    win_us = int(window_s) * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + [ts_col, order_col],
                          kind="stable").reset_index(drop=True)
        # resolution-explicit: pandas preserves the parquet unit (us vs ns),
        # so a bare .astype(int64) would be unit-dependent
        us = g[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        prev = np.empty_like(us)
        prev[:1] = 0
        prev[1:] = us[:-1]
        new_key = np.zeros(len(g), dtype=bool)
        if len(g):
            new_key[0] = True
        for kc in key_cols:
            new_key |= g[kc].ne(g[kc].shift()).to_numpy(dtype=bool)
        keep = new_key | ((us - prev) >= win_us)
        return g.loc[keep, key_cols + [order_col]]

    return _bucket_groups(ds, key_cols, per_bucket, num_buckets)


def collect_series(ds, *, key_col: str = "user_id",
                   value_col: str = "value",
                   order_cols=("ts", "event_id"),
                   num_buckets: int = DEFAULT_NUM_BUCKETS,
                   as_list: bool = False):
    """Per-key ordered value series (SQL ``list(value ORDER BY ...)`` /
    array_agg): one row per key with the key's values concatenated in
    event-time order — the input layout for per-entity sequence models.
    ``as_list=True`` emits the honest layout, an Arrow ``list<int64>``
    column of integer cents named ``series`` (built from offsets, no
    per-row Python); default emits the integer-cent CSV string the SQL
    oracle hashes deterministically. NULL values are dropped. One shuffle
    by key; a key's history must fit one task (same assumption as
    sessionize). Returns (key, n, series_csv | series)."""
    order_cols = list(order_cols)

    if as_list:
        def per_bucket_arrow(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["__bucket"])
            # null keys get their own (null, 0, []) row, mirroring the CSV
            # path — left in the main pass they poison to_numpy with NaN
            # (every NaN looks 'unique', searchsorted misroutes, and the
            # int64 key cast throws)
            key_type = t.schema.field(key_col).type
            had_null = t[key_col].null_count > 0
            if had_null:
                t = t.filter(pc.is_valid(t[key_col]))
            idx = pc.sort_indices(
                t, sort_keys=[(c, "ascending")
                              for c in [key_col] + order_cols])
            t = t.take(idx)
            keys = t[key_col].to_numpy(zero_copy_only=False)
            v = t[value_col].to_pandas().to_numpy(dtype=np.float64)
            keep = ~np.isnan(v)
            cents = np.round(v[keep] * 100).astype(np.int64)
            kept_keys = keys[keep]
            # unique keys in sorted order (keys are pre-sorted)
            if len(keys):
                first = np.concatenate(
                    [[True], keys[1:] != keys[:-1]])
            else:
                first = np.zeros(0, dtype=bool)
            uk = keys[first]
            pos = np.searchsorted(uk, kept_keys)
            counts = np.bincount(pos, minlength=len(uk))
            offsets = np.concatenate(
                [[0], np.cumsum(counts)]).astype(np.int32)
            series = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(cents, pa.int64()))
            out = pa.table({
                key_col: pa.array(uk, key_type),
                "n": pa.array(counts.astype(np.int64)),
                "series": series,
            })
            if had_null:
                out = pa.concat_tables([out, pa.table({
                    key_col: pa.array([None], key_type),
                    "n": pa.array([0], pa.int64()),
                    "series": pa.array([[]], pa.list_(pa.int64())),
                })])
            return out

        return (ds.map_batches(_bucket_tagger([key_col], num_buckets),
                               batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(per_bucket_arrow, batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="stable")
        v = g[value_col].to_numpy(dtype=np.float64)
        keep = ~np.isnan(v)
        cents = np.round(v[keep] * 100).astype(np.int64)
        f = pd.DataFrame({key_col: g[key_col].to_numpy()[keep],
                          "__s": cents.astype(str)})
        # ','.join per KEY on pre-sorted string values: one tiny Python
        # call per distinct key — no per-key DataFrame/map_groups dispatch
        agg = f.groupby(key_col, as_index=False, sort=True).agg(
            n=("__s", "size"), series_csv=("__s", ",".join))
        # keys whose values are ALL null still get a (key, 0, "") row,
        # like the per-key shape produced
        out = pd.DataFrame(
            {key_col: np.sort(pd.unique(g[key_col]))}).merge(
            agg, on=key_col, how="left")
        out["n"] = out["n"].fillna(0).astype(np.int64)
        out["series_csv"] = out["series_csv"].fillna("")
        return out

    return _bucket_groups(ds, [key_col], per_bucket, num_buckets)


def tumbling_window(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value", freq: str = "h"):
    """Tumbling event-time window (partial agg inside map_batches before the
    groupby — see pipelines/analogs.switch_group_agg for the wired variant)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            window=df[ts_col].dt.floor(freq),
            cents=np.round(df[value_col].to_numpy() * 100).astype(np.int64),
        )
        return df.groupby([key_col, "window"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum"))

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key_col, "window"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_cents", alias_name="sum_cents"))
    )
    return out


def hopping_window(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value", width_s: int = 3 * 3600,
                   step_s: int = 3600):
    """Hopping (sliding) event-time window: width ``width_s``, advancing by
    ``step_s`` (width must be a multiple of step). Window ``w`` covers
    ``[w*step, w*step + width)``; every event lands in ``width/step``
    windows.

    Scale shape: the 1->N replication AND a (key, window) partial aggregate
    happen inside map_batches, so the shuffle moves at most one row per
    (key, window) per batch — never the replicated events. Output rows:
    key, window (epoch-seconds // step id), n, sum_value.
    """
    from ray.data.aggregate import Sum

    if width_s % step_s:
        raise ValueError("width_s must be a multiple of step_s")
    n_win = width_s // step_s

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame({key_col: pd.Series(dtype=np.int64),
                                 "window": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64),
                                 "sum_cents": pd.Series(dtype=np.int64)})
        # unit-safe floor to epoch seconds (parquet ts may be us or ns)
        epoch = df[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        w_last = epoch // step_s
        # replicate: windows w_last-j for j in [0, n_win); all satisfy
        # t in [w*step, w*step+width) since t - w*step < (j+1)*step <= width
        wins = (w_last[:, None] - np.arange(n_win)[None, :]).ravel()
        keys = np.repeat(df[key_col].to_numpy(), n_win)
        cents = np.repeat(
            np.round(df[value_col].to_numpy() * 100).astype(np.int64), n_win)
        local = pd.DataFrame({key_col: keys, "window": wins, "cents": cents})
        return local.groupby([key_col, "window"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum"))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key_col, "window"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_cents", alias_name="sum_cents"))
    )
