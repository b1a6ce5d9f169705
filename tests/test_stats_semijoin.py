"""Distribution stats (mergeable histogram, exact quantiles) and the
semi / anti join family (ops/stats.py, ops/joins.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds_from(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df))


# ------------------------------------------------------------- histogram
@pytest.mark.usefixtures("ray_session")
def test_histogram_matches_numpy_and_clamps_edges():
    from etl_ray.ops.stats import histogram

    rng = np.random.default_rng(3)
    v = rng.normal(50, 30, size=5000)  # some values < 0 and > 100
    ds = _ds_from(pd.DataFrame({"value": v}))
    out = histogram(ds, col="value", lo=0.0, hi=100.0, n_bins=10) \
        .to_pandas().sort_values("bin").reset_index(drop=True)
    # reference: clamp into edge bins, then bincount
    b = np.clip(np.floor(v / 10.0).astype(int), 0, 9)
    exp = np.bincount(b, minlength=10)
    got = np.zeros(10, dtype=int)
    got[out["bin"].to_numpy()] = out["n"].to_numpy()
    assert (got == exp).all()
    assert out["n"].sum() == len(v)
    assert np.allclose(out["bin_hi"] - out["bin_lo"], 10.0)


@pytest.mark.usefixtures("ray_session")
def test_histogram_skips_nulls():
    from etl_ray.ops.stats import histogram

    df = pd.DataFrame({"value": [1.0, None, 5.0, np.nan, 9.0]})
    out = histogram(_ds_from(df), col="value", lo=0.0, hi=10.0,
                    n_bins=2).to_pandas()
    assert out["n"].sum() == 3


# ------------------------------------------------------------- quantiles
@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_percentile_disc_semantics():
    from etl_ray.ops.stats import exact_quantiles

    rng = np.random.default_rng(7)
    v = rng.permutation(np.arange(1, 1001)).astype(np.float64)
    ds = _ds_from(pd.DataFrame({"value": v}))
    qs = [0.01, 0.5, 0.99, 1.0]
    out = exact_quantiles(ds, col="value", qs=qs)
    # percentile_disc: element at 1-based rank ceil(q*n)
    assert out["value"].tolist() == [10.0, 500.0, 990.0, 1000.0]


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_all_null_and_empty():
    from etl_ray.ops.stats import exact_quantiles

    ds = _ds_from(pd.DataFrame({"value": pd.array(
        [None, None], dtype="float64")}))
    out = exact_quantiles(ds, col="value", qs=[0.5])
    assert out["value"].tolist() == [None]


@pytest.mark.usefixtures("ray_session")
def test_kmv_quantiles_accurate_and_partition_independent():
    from etl_ray.ops.stats import kmv_quantiles

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": np.arange(20000),
                       "v": rng.normal(100, 15, 20000)})
    qs = [0.25, 0.5, 0.9]
    a = kmv_quantiles(_ds_from(df), key_col="k", col="v", qs=qs, m=2048)
    b = kmv_quantiles(_ds_from(df).repartition(9), key_col="k", col="v",
                      qs=qs, m=2048)
    pd.testing.assert_frame_equal(a, b)  # deterministic under partitioning
    exact = np.quantile(df["v"], qs)
    # rank error O(1/sqrt(m)); with m=2048 value error stays small here
    assert np.allclose(a["value"], exact, atol=1.5)


@pytest.mark.usefixtures("ray_session")
def test_kmv_quantiles_small_input_is_exact():
    from etl_ray.ops.stats import kmv_quantiles

    df = pd.DataFrame({"k": np.arange(100),
                       "v": np.arange(1, 101, dtype=float)})
    out = kmv_quantiles(_ds_from(df), key_col="k", col="v",
                        qs=[0.5, 1.0], m=4096)
    assert out["value"].tolist() == [50.0, 100.0]  # sample == population


# ------------------------------------------------------------ semi / anti
@pytest.mark.usefixtures("ray_session")
def test_semi_join_no_duplication():
    from etl_ray.ops.joins import semi_join

    left = _ds_from(pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")}))
    right = _ds_from(pd.DataFrame({"rk": [2, 2, 2, 4, 9]}))
    out = semi_join(left, right, on="k", right_on="rk",
                    num_partitions=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [2, 4]       # no duplication from dup keys
    assert sorted(out.columns) == ["k", "v"]  # no right columns leak


@pytest.mark.usefixtures("ray_session")
def test_anti_join_complements_semi():
    from etl_ray.ops.joins import anti_join, semi_join

    left = _ds_from(pd.DataFrame({"k": np.arange(50), "v": np.arange(50)}))
    right = _ds_from(pd.DataFrame({"k": np.arange(0, 50, 3)}))
    s = semi_join(left, right, on="k", num_partitions=4).to_pandas()
    a = anti_join(left, right, on="k", num_partitions=4).to_pandas()
    assert len(s) + len(a) == 50
    assert set(s["k"]) | set(a["k"]) == set(range(50))
    assert set(s["k"]) & set(a["k"]) == set()


@pytest.mark.usefixtures("ray_session")
def test_anti_join_empty_result():
    from etl_ray.ops.joins import anti_join

    left = _ds_from(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    right = _ds_from(pd.DataFrame({"k": [1, 2, 3]}))
    out = anti_join(left, right, on="k", num_partitions=2).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_broadcast_semi_and_anti():
    from etl_ray.ops.joins import broadcast_semi_join

    left = _ds_from(pd.DataFrame({"k": [1, 2, 3, 4, 5]}))
    keep = broadcast_semi_join(left, [2, 4], on="k").to_pandas()
    drop = broadcast_semi_join(left, [2, 4], on="k", keep=False).to_pandas()
    assert sorted(keep["k"]) == [2, 4]
    assert sorted(drop["k"]) == [1, 3, 5]
