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

Scale: ``groupby(key).map_groups`` shuffles once by key; a key's history must
fit one worker (bound it upstream with date partitioning when keys are
long-lived).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", gap_minutes: float = 30.0,
               order_col: str = "event_id"):
    """Session windows: a session ends after ``gap_minutes`` of inactivity.

    Returns one row per (key, session_id): start/end, n_events, sum_value
    (sum in integer cents → exact, order-independent).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col])
        brk = (g[ts_col].diff() > gap).astype(np.int64)
        session = brk.cumsum()
        cents = np.round(g[value_col].to_numpy() * 100).astype(np.int64)
        out = (
            g.assign(session_id=session.to_numpy(), __cents=cents)
            .groupby("session_id", as_index=False)
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(order_col, "size"),
                __sum_cents=("__cents", "sum"),
            )
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        out["sum_value"] = out.pop("__sum_cents") / 100.0
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def rolling_stats(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value", window: int = 3,
                  order_col: str = "event_id"):
    """Sliding window over each key's ordered events: moving average of the
    last ``window`` events (exact integer-cents arithmetic)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col]).reset_index(drop=True)
        cents = pd.Series(
            np.round(g[value_col].to_numpy() * 100).astype(np.int64))
        roll = cents.rolling(window, min_periods=1)
        return pd.DataFrame(
            {
                key_col: g[key_col],
                order_col: g[order_col],
                "moving_avg": roll.sum().to_numpy()
                / (100.0 * roll.count().to_numpy()),
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def lag_delta(ds, *, key_col: str = "user_id", ts_col: str = "ts",
              value_col: str = "value", order_col: str = "event_id"):
    """Per-key successive difference (SQL ``value - lag(value) OVER
    (PARTITION BY key ORDER BY ts, order)``): the first event of each key
    gets a null delta. Integer-cents subtraction keeps the doubles
    bit-equal to the oracle's."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col]).reset_index(drop=True)
        c = pd.Series(np.round(g[value_col].to_numpy(np.float64) * 100))
        return pd.DataFrame({
            key_col: g[key_col],
            order_col: g[order_col],
            "delta": (c - c.shift(1)) / 100.0,
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def window_dedup(ds, *, key_cols=("user_id", "event_type"),
                 ts_col: str = "ts", order_col: str = "event_id",
                 window_s: int = 3600):
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

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col]).reset_index(drop=True)
        # resolution-explicit: pandas preserves the parquet unit (us vs ns),
        # so a bare .astype(int64) would be unit-dependent
        us = pd.Series(
            g[ts_col].to_numpy(dtype="datetime64[us]").astype("int64"))
        prev = us.shift(1)
        keep = prev.isna() | ((us - prev) >= win_us)
        return g.loc[keep.to_numpy(), key_cols + [order_col]]

    return ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def collect_series(ds, *, key_col: str = "user_id",
                   value_col: str = "value",
                   order_cols=("ts", "event_id")):
    """Per-key ordered value series (SQL ``list(value ORDER BY ...)`` /
    array_agg): one row per key with the key's values concatenated in
    event-time order — the input layout for per-entity sequence models.
    Values are emitted as an integer-cent CSV string (deterministic,
    hashable; the repo's list-output convention, see pack_sequences).
    NULL values are dropped. One shuffle by key; a key's history must fit
    one task (same assumption as sessionize). Returns
    (key, n, series_csv)."""
    order_cols = list(order_cols)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols)
        v = g[value_col].to_numpy(dtype=np.float64)
        keep = ~np.isnan(v)
        cents = np.round(v[keep] * 100).astype(np.int64)
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "n": np.array([len(cents)], dtype="int64"),
            "series_csv": [",".join(map(str, cents))],
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


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
