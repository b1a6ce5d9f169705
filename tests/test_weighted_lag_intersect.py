"""Weighted A-Res sampling (ops/sampling.py), per-key lag deltas
(ops/windows.py), distinct-key intersect (ops/joins.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds_from(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df))


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_deterministic_and_partition_independent():
    from etl_ray.ops.sampling import weighted_sample

    df = pd.DataFrame({"k": np.arange(500), "w": np.arange(1, 501) * 1.0})
    a = weighted_sample(_ds_from(df), key_col="k", weight_col="w", k=20)
    b = weighted_sample(_ds_from(df).repartition(7), key_col="k",
                        weight_col="w", k=20)
    pd.testing.assert_frame_equal(
        a.sort_values("k").reset_index(drop=True),
        b.sort_values("k").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_favors_heavy_rows():
    from etl_ray.ops.sampling import weighted_sample

    # weights 1000:1 — the heavy half should dominate the sample
    df = pd.DataFrame({"k": np.arange(400),
                       "w": [1000.0] * 200 + [1.0] * 200})
    out = weighted_sample(_ds_from(df), key_col="k", weight_col="w", k=40)
    heavy = (out["k"] < 200).sum()
    assert heavy >= 35
    assert len(out) == 40


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_excludes_nonpositive_weights():
    from etl_ray.ops.sampling import weighted_sample

    df = pd.DataFrame({"k": [1, 2, 3], "w": [0.0, -1.0, 5.0]})
    out = weighted_sample(_ds_from(df), key_col="k", weight_col="w", k=10)
    assert out["k"].tolist() == [3]


@pytest.mark.usefixtures("ray_session")
def test_lag_delta_first_event_null_and_order():
    from etl_ray.ops.windows import lag_delta

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2024-01-03", "2024-01-01", "2024-01-02",
                              "2024-01-01"]),
        "event_id": [30, 10, 20, 40],
        "value": [5.5, 1.0, 3.25, 7.0],
    })
    out = lag_delta(_ds_from(df)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # user 1 ordered by ts: 1.0 -> 3.25 -> 5.5
    d = dict(zip(out["event_id"], out["delta"]))
    assert np.isnan(d[10]) and np.isnan(d[40])
    assert d[20] == 2.25 and d[30] == 2.25


@pytest.mark.usefixtures("ray_session")
def test_intersect_keys_distinct_and_correct():
    from etl_ray.ops.joins import intersect_keys

    left = _ds_from(pd.DataFrame({"k": [1, 1, 2, 3, 3, 3]}))
    right = _ds_from(pd.DataFrame({"k": [3, 3, 4, 1]}))
    out = intersect_keys(left, right, on="k", num_partitions=4).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 3]  # distinct, both sides only
