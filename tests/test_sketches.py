"""Mergeable sketches: HLL distinct-count and Count-Min frequency."""

import numpy as np
import pandas as pd
import pytest

from etl_ray.ops.sketches import (
    _bit_length64,
    cms_query,
    hll_estimate,
    hll_partial,
)


def test_bit_length_exact_no_float_edges():
    xs = np.array([0, 1, 2, 3, 4, (1 << 53) - 1, 1 << 53, (1 << 56) - 1,
                   (1 << 56), (1 << 63)], dtype=np.uint64)
    got = _bit_length64(xs)
    exp = [int(x).bit_length() for x in xs]
    assert got.tolist() == exp


def test_hll_partial_merge_associative():
    rng = np.random.default_rng(4)
    vals = np.array([f"u{v}" for v in rng.integers(0, 5000, 20000)],
                    dtype=object)
    whole = hll_partial(vals, p=8)
    halves = pd.concat([hll_partial(vals[:9000], p=8),
                        hll_partial(vals[9000:], p=8)])
    merged = halves.groupby("bucket", as_index=False)["rho"].max()
    a = whole.sort_values("bucket").reset_index(drop=True)
    b = merged.sort_values("bucket").reset_index(drop=True)
    assert a.equals(b)


def test_hll_estimate_accuracy():
    rng = np.random.default_rng(5)
    true = 3000
    vals = np.array([f"item-{v}" for v in range(true)], dtype=object)
    # duplicates must not change the estimate
    dup = np.concatenate([vals, vals[rng.integers(0, true, 5000)]])
    regs = hll_partial(dup, p=10)
    est = hll_estimate(regs, p=10)
    assert abs(est - true) / true < 0.1  # ~3% typical at p=10


@pytest.mark.usefixtures("ray_session")
def test_cms_point_queries_bound_true_counts(tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from etl_ray.ops.sketches import cms_counts

    rng = np.random.default_rng(6)
    types = rng.choice(["a", "b", "c", "d"], p=[0.5, 0.3, 0.15, 0.05],
                       size=4000)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(__import__("pyarrow").table({"event_type": types}), path)
    cells = cms_counts(rd.read_parquet(path), "event_type",
                       depth=4, width=64).to_pandas()
    truth = pd.Series(types).value_counts()
    for t, n in truth.items():
        est = cms_query(cells, t, depth=4, width=64)
        assert est >= n  # CMS never under-counts
        assert est <= n + 4000 // 16  # loose collision bound at width 64


@pytest.mark.usefixtures("ray_session")
def test_bloom_bits_membership():
    import ray.data as rd

    from etl_ray.ops.sketches import bloom_bits, bloom_contains

    vals = [f"user-{i}" for i in range(200)]
    ds = rd.from_items([{"v": v} for v in vals])
    bits = bloom_bits(ds, "v", m=4096, k=4).to_pandas()["bit"]
    # no false negatives, ever
    assert all(bloom_contains(bits, v, m=4096, k=4) for v in vals)
    # false-positive rate is small at this fill factor
    fp = sum(bloom_contains(bits, f"absent-{i}", m=4096, k=4)
             for i in range(500))
    assert fp < 25


@pytest.mark.usefixtures("ray_session")
def test_token_histogram_matches_collections_counter():
    import collections

    import ray.data as rd

    from etl_ray.ops.textops import token_histogram

    texts = ["a b b c", "  c  a ", "", "d d d"]
    ds = rd.from_items([{"text": t} for t in texts]).repartition(3)
    out = token_histogram(ds).to_pandas().set_index("token")["n"].to_dict()
    exp = collections.Counter(" ".join(texts).split())
    assert out == dict(exp)


@pytest.mark.usefixtures("ray_session")
def test_grouped_hll_registers_match_per_group_hll():
    """Grouped registers must equal running plain hll_registers on each
    group separately; estimates land within HLL's error envelope."""
    import ray.data as rd

    from etl_ray.ops.sketches import (grouped_hll_estimates,
                                      grouped_hll_registers, hll_partial)

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 5000),
        "v": rng.integers(0, 800, 5000),
    })
    import pyarrow as _pa
    ds = rd.from_arrow(_pa.Table.from_pandas(df))
    regs = grouped_hll_registers(ds, "v", by="g", p=8).to_pandas()
    for g, sub in df.groupby("g"):
        exp = hll_partial(sub["v"].astype(str).to_numpy(dtype=object), 8)
        got = regs[regs["g"] == g][["bucket", "rho"]] \
            .sort_values("bucket").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, exp.sort_values("bucket").reset_index(drop=True),
            check_dtype=False)
    est = grouped_hll_estimates(regs, by="g", p=8)
    for g, sub in df.groupby("g"):
        truth = sub["v"].nunique()
        e = float(est[est["g"] == g]["estimate"].iloc[0])
        assert abs(e - truth) / truth < 0.15
