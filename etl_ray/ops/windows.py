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
