"""Property-based tests (hypothesis) for round-2 kernels: multi-key LWW,
sequence packing, pollution flags, sidestream round-trip."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_ray.ops.packing import _pack_group
from etl_ray.ops.pollution import flag_pollution
from etl_ray.sidestream import SidestreamParser
from etl_ray.stages.merge import lww_last_per_keys

SMALL = settings(max_examples=30, deadline=None)


@SMALL
@given(
    n=st.integers(1, 120),
    n_shards=st.integers(1, 5),
    n_docs=st.integers(1, 20),
    seed=st.integers(0, 10_000),
)
def test_lww_last_per_keys_property(n, n_shards, n_docs, seed):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "__shard": pa.array(rng.integers(0, n_shards, n), pa.int64()),
        "doc_id": pa.array([f"d{v}" for v in rng.integers(0, n_docs, n)]),
        "sequence_number": pa.array(
            rng.permutation(10 * n)[:n].astype(np.int64)),
    })
    got = lww_last_per_keys(t, ["__shard", "doc_id"]).to_pandas()
    exp = (t.to_pandas().sort_values("sequence_number")
           .groupby(["__shard", "doc_id"], as_index=False).last())
    got = got.sort_values(["__shard", "doc_id"]).reset_index(drop=True)
    exp = exp.sort_values(["__shard", "doc_id"]).reset_index(drop=True)
    assert got.equals(exp[got.columns.tolist()])


@SMALL
@given(
    docs=st.lists(
        st.lists(st.integers(0, 1000), max_size=30), min_size=1, max_size=15),
    seq_len=st.integers(1, 16),
    eos=st.one_of(st.none(), st.just(0)),
)
def test_pack_group_preserves_token_stream(docs, seq_len, eos):
    g = pd.DataFrame({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "bucket": 0,
        "tokens": docs,
    })
    out = _pack_group(g, seq_len=seq_len, id_col="doc_id",
                      tokens_col="tokens", eos_token=eos)
    stream = []
    for d in docs:
        stream.extend(d)
        if eos is not None:
            stream.append(eos)
    packed = [int(x) for csv in out["tokens_csv"] for x in
              (csv.split(",") if csv else [])]
    assert packed == stream
    assert (out["n_tok"] <= seq_len).all()
    if len(out):  # only the last chunk may be short
        assert (out["n_tok"].iloc[:-1] == seq_len).all()
        assert out["seq_id"].is_monotonic_increasing


@SMALL
@given(
    n=st.integers(1, 60),
    space=st.integers(2, 6),
    window=st.integers(1, 4),
    seed=st.integers(0, 10_000),
)
def test_pollution_flags_match_bruteforce(n, space, window, seed):
    rng = np.random.default_rng(seed)
    g = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "dest": rng.integers(0, space, n),
        "last_hop": rng.integers(0, space, n),
        "complete": rng.random(n) < 0.5,
    })
    out = flag_pollution(g, order_col="event_id", dest_col="dest",
                         last_hop_col="last_hop", complete_col="complete",
                         window=window)
    for i in range(n):
        expect = None
        if not g.loc[i, "complete"]:
            for k in range(1, window + 1):  # nearest polluter wins
                j = i + k
                if j < n and g.loc[j, "dest"] == g.loc[i, "last_hop"] \
                        and g.loc[i, "dest"] != g.loc[j, "dest"]:
                    expect = j
                    break
        assert bool(out.loc[i, "polluted"]) == (expect is not None)
        if expect is not None:
            assert out.loc[i, "retracted_by"] == expect


@SMALL
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 10**6),
                  st.integers(0, 10**9), st.integers(0, 999_999)),
        min_size=1, max_size=25),
)
def test_sidestream_roundtrip(rows):
    header = ("K: cid PollTime LocalAddress LocalPort RemAddress RemPort "
              "StartTimeStamp StartTimeUsec DataBytesOut PktsOut")
    lines = [header]
    for cid, poll, ts, usec in rows:
        lines.append(f"C: {cid} {poll} 10.0.0.1 80 192.0.2.7 5501 "
                     f"{ts} {usec} 100 7")
    data = "\n".join(lines).encode()
    parsed = SidestreamParser().parse(
        {}, "20170315T01:00:00Z_10.0.0.1_0.web100", data)
    assert len(parsed) == len(rows)
    for r, (cid, poll, ts, usec) in zip(parsed, rows):
        assert r["cid"] == cid
        assert r["PollTime"] == poll
        assert r["StartTimeStamp"] == ts * 1_000_000 + usec
