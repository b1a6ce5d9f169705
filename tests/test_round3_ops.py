"""Round-3 additions: windowed dedup, EXCEPT set op, robust grouped MAD,
per-document token entropy."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.mark.usefixtures("ray_session")
def test_window_dedup_keeps_first_of_burst():
    from etl_ray.ops.windows import window_dedup

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:10:00",  # burst: 2nd dropped
         "2024-01-01 01:10:00",   # ≥1h after previous RAW event → kept
         "2024-01-01 01:30:00",   # 20min after previous → dropped
         "2024-01-01 00:05:00"])  # other key → kept
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "event_type": ["click"] * 5,
        "ts": ts,
        "event_id": [10, 11, 12, 13, 14],
    })
    out = window_dedup(rd.from_pandas(df), key_cols=("user_id", "event_type"),
                       window_s=3600).to_pandas()
    assert sorted(out["event_id"]) == [10, 12, 14]


@pytest.mark.usefixtures("ray_session")
def test_window_dedup_order_is_event_time_not_arrival():
    from etl_ray.ops.windows import window_dedup

    # arrival order reversed vs event time: survivor must be the EARLIEST
    df = pd.DataFrame({
        "user_id": [7, 7],
        "event_type": ["x", "x"],
        "ts": pd.to_datetime(["2024-01-01 00:30:00", "2024-01-01 00:00:00"]),
        "event_id": [1, 2],
    })
    out = window_dedup(rd.from_pandas(df), key_cols=("user_id", "event_type"),
                       window_s=3600).to_pandas()
    assert list(out["event_id"]) == [2]


@pytest.mark.usefixtures("ray_session")
def test_except_keys():
    from etl_ray.ops.joins import except_keys

    left = rd.from_pandas(pd.DataFrame({"k": [1, 1, 2, 3, 4, 4]}))
    right = rd.from_pandas(pd.DataFrame({"k": [2, 4, 9]}))
    # num_partitions=4 → 4 aggregators × 0.5 CPU fit the 4-CPU test session
    out = except_keys(left, right, on="k", num_partitions=4).to_pandas()
    assert sorted(out["k"]) == [1, 3]


@pytest.mark.usefixtures("ray_session")
def test_grouped_mad_exact():
    from etl_ray.ops.stats import grouped_mad

    # group a: values 1..5 → median 3, |x-3| = [2,1,0,1,2] → MAD 1
    # group b: 10,10,40 → median 10, |x-10| = [0,0,30] → MAD 0
    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 3,
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 10.0, 40.0],
    })
    out = grouped_mad(rd.from_pandas(df), col="v", by="g")
    got = {r.g: (r.median, r.mad) for r in out.itertuples()}
    assert got == {"a": (3.0, 1.0), "b": (10.0, 0.0)}


@pytest.mark.usefixtures("ray_session")
def test_grouped_mad_nulls_dropped():
    from etl_ray.ops.stats import grouped_mad

    df = pd.DataFrame({"g": ["a", "a", "a", "z"],
                       "v": [1.0, 3.0, np.nan, np.nan]})
    out = grouped_mad(rd.from_pandas(df), col="v", by="g")
    # all-null group z vanishes; percentile_disc of [1,3] picks 1.0
    assert list(out["g"]) == ["a"]
    assert out["median"].iloc[0] == 1.0 and out["mad"].iloc[0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_doc_entropy():
    from etl_ray.ops.textops import doc_entropy

    df = pd.DataFrame({
        "doc_id": ["d1", "d2", "d3", "d4"],
        "text": ["a a a a",          # single token → entropy 0 (not -0.0)
                 "a b",              # uniform 2 → ln 2
                 "a a b b c c d d",  # uniform 4 → ln 4
                 "   "],             # whitespace-only → dropped
    })
    out = doc_entropy(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == ["d1", "d2", "d3"]
    assert list(out["n_tok"]) == [4, 2, 8]
    assert out["entropy"].iloc[0] == 0.0
    assert not np.signbit(out["entropy"].iloc[0])
    assert out["entropy"].iloc[1] == round(math.log(2), 4)
    assert out["entropy"].iloc[2] == round(math.log(4), 4)
