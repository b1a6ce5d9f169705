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


@pytest.mark.usefixtures("ray_session")
def test_distinct_count_by():
    from etl_ray.ops.stats import distinct_count_by

    df = pd.DataFrame({"g": ["a", "a", "a", "b", "b"],
                       "k": [1, 1, 2, 7, 7]})
    out = distinct_count_by(rd.from_pandas(df), by="g", key_col="k",
                            alias="n").to_pandas()
    got = dict(zip(out["g"], out["n"]))
    assert got == {"a": 2, "b": 1}


@pytest.mark.usefixtures("ray_session")
def test_collect_series_orders_and_drops_nulls():
    from etl_ray.ops.windows import collect_series

    ts = pd.to_datetime(["2024-01-01 02:00", "2024-01-01 01:00",
                         "2024-01-01 03:00", "2024-01-01 00:30"])
    df = pd.DataFrame({"user_id": [1, 1, 1, 2],
                       "value": [2.5, 1.25, np.nan, 9.0],
                       "ts": ts, "event_id": [1, 2, 3, 4]})
    out = collect_series(rd.from_pandas(df)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert list(out["series_csv"]) == ["125,250", "900"]
    assert list(out["n"]) == [2, 1]


@pytest.mark.usefixtures("ray_session")
def test_top_tokens_tie_break():
    from etl_ray.ops.textops import top_tokens

    df = pd.DataFrame({"text": ["b a", "a c b", "d"]})
    out = top_tokens(rd.from_pandas(df), k=2)
    # a and b both occur twice; token-ascending breaks the tie
    assert list(out["token"]) == ["a", "b"]
    assert list(out["n"]) == [2, 2]


@pytest.mark.usefixtures("ray_session")
def test_bucketize_by_quantile():
    from etl_ray.ops.stats import bucketize_by_quantile

    df = pd.DataFrame({"id": list(range(8)),
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]})
    out = bucketize_by_quantile(rd.from_pandas(df), col="v",
                                qs=(0.25, 0.5, 0.75),
                                keep_cols=["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # percentile_disc boundaries of 1..8 at (.25,.5,.75) = (2,4,6);
    # bucket i iff v <= boundary_i
    assert list(out["bucket"]) == [0, 0, 1, 1, 2, 2, 3, 3]


@pytest.mark.usefixtures("ray_session")
def test_collect_series_as_list_matches_csv():
    """as_list=True emits a true Arrow list<int64> column whose values
    equal the CSV parse (VERDICT r4 next-step #8)."""
    import pyarrow as pa

    from etl_ray.ops.windows import collect_series

    ts = pd.to_datetime(["2024-01-01 02:00", "2024-01-01 01:00",
                         "2024-01-01 03:00", "2024-01-01 00:30",
                         "2024-01-01 00:45"])
    df = pd.DataFrame({"user_id": [1, 1, 1, 2, 3],
                       "value": [2.5, 1.25, np.nan, 9.0, np.nan],
                       "ts": ts, "event_id": [1, 2, 3, 4, 5]})
    ds = rd.from_pandas(df)
    lst = collect_series(ds, as_list=True)
    schema = lst.schema()
    s_type = dict(zip(schema.names, schema.types))["series"]
    assert pa.types.is_list(s_type) and pa.types.is_int64(s_type.value_type)
    got = {r["user_id"]: list(r["series"]) for r in lst.take_all()}
    csv = collect_series(ds).to_pandas()
    exp = {int(r.user_id): ([int(x) for x in r.series_csv.split(",")]
                            if r.series_csv else [])
           for r in csv.itertuples()}
    assert got == exp
    assert got[1] == [125, 250] and got[3] == []


@pytest.mark.usefixtures("ray_session")
def test_mixture_expand_weights():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from etl_ray.ops.sampling import mixture_expand

    t = pa.table({
        "doc_id": pa.array([str(i) for i in range(2000)], pa.string()),
        "source": pa.array((["a"] * 1000) + (["b"] * 600) + (["c"] * 400)),
    })
    out = mixture_expand(
        rd.from_arrow(t), key_col="doc_id", source_col="source",
        weights={"a": 0.5, "b": 2.25},  # c falls to default 1.0
    ).to_pandas()
    by = out.groupby("source").size()
    assert abs(by["a"] / 1000 - 0.5) < 0.08   # hash-sampled fraction
    assert abs(by["b"] / 600 - 2.25) < 0.08
    assert by["c"] == 400                     # whole weight: exact
    # copy_idx is dense 0..n-1 per doc
    b2 = out[out.source == "b"].groupby("doc_id")["copy_idx"].agg(
        ["min", "max", "size"])
    assert (b2["min"] == 0).all()
    assert (b2["max"] == b2["size"] - 1).all()
    # deterministic: a re-run selects the same rows
    again = mixture_expand(
        rd.from_arrow(t), key_col="doc_id", source_col="source",
        weights={"a": 0.5, "b": 2.25}).to_pandas()
    lhs = out.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    rhs = again.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    assert lhs.equals(rhs)


@pytest.mark.usefixtures("ray_session")
def test_epoch_order_permutations():
    import pyarrow as pa
    import ray.data as rd

    from etl_ray.ops.sampling import epoch_order

    t = pa.table({"doc_id": pa.array([str(i) for i in range(100)],
                                     pa.string())})
    ds = rd.from_arrow(t).repartition(4)
    o0 = epoch_order(ds, key_col="doc_id", epoch=0).to_pandas()
    o1 = epoch_order(ds, key_col="doc_id", epoch=1).to_pandas()
    # dense ranks, every doc exactly once
    assert sorted(o0["epoch_rank"]) == list(range(100))
    assert sorted(o1["epoch_rank"]) == list(range(100))
    # different epochs give different permutations; same epoch reproduces
    p0 = o0.sort_values("epoch_rank")["doc_id"].tolist()
    p1 = o1.sort_values("epoch_rank")["doc_id"].tolist()
    assert p0 != p1
    again = epoch_order(ds, key_col="doc_id", epoch=0).to_pandas()
    assert again.sort_values("epoch_rank")["doc_id"].tolist() == p0
