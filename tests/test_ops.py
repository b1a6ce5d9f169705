"""Training-data ops: dedup family, similarity search, multimodal plumbing —
verified on small in-memory corpora with planted duplicates/neighbors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_ray.ops.dedup import (
    MinHasher,
    SimHasher,
    exact_dedup,
    jaccard_of_texts,
    minhash_lsh_candidates,
    simhash_candidates,
)
from etl_ray.ops.multimodal import (
    FakeImageDecoder,
    RealImageDecoder,
    decode_images,
    frame_sample,
    to_binary_payload,
)
from etl_ray.ops.similarity import (
    cosine_topk,
    embedding_near_dups,
    lsh_bucketed_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup of 0
    (3, "completely different content about ray data pipelines at scale"),
    (4, "yet another unrelated document mentioning parquet and arrow"),
]


def docs_ds():
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_keeps_min_id():
    out = exact_dedup(docs_ds()).to_pandas()
    assert len(out) == 4  # 0/1 collapse
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_finds_near_dups():
    cand = minhash_lsh_candidates(docs_ds(), concurrency=2).to_pandas()
    pairs = set(map(tuple, cand[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in pairs  # exact dup always a candidate
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught by banding
    assert (3, 4) not in pairs
    j = jaccard_of_texts(DOCS[0][1], DOCS[2][1])
    assert 0.5 < j < 1.0
    assert jaccard_of_texts(DOCS[0][1], DOCS[1][1]) == 1.0


def test_minhash_signature_similarity():
    mh = MinHasher()
    s0 = mh.signature(DOCS[0][1])
    s2 = mh.signature(DOCS[2][1])
    s3 = mh.signature(DOCS[3][1])
    sim02 = (s0 == s2).mean()
    sim03 = (s0 == s3).mean()
    assert sim02 > 0.4 > sim03


def test_simhash_hamming_orders_similarity():
    h0 = SimHasher.simhash64(DOCS[0][1])
    h2 = SimHasher.simhash64(DOCS[2][1])
    h3 = SimHasher.simhash64(DOCS[3][1])
    d02 = bin(h0 ^ h2).count("1")
    d03 = bin(h0 ^ h3).count("1")
    assert d02 < d03


@pytest.mark.usefixtures("ray_session")
def test_simhash_candidates_pipeline():
    cand = simhash_candidates(docs_ds(), max_hamming=12,
                              concurrency=2).to_pandas()
    pairs = set(map(tuple, cand[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in pairs


def _emb_table(n=40, d=16, seed=3):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, d))
    M[1] = M[0] + 0.01 * rng.standard_normal(d)  # planted near-dup of 0
    return M, pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float32())),
    })


@pytest.mark.usefixtures("ray_session")
def test_cosine_topk_matches_bruteforce():
    import ray.data as rd

    M, tbl = _emb_table()
    ds = rd.from_arrow(tbl)
    Q = M[:2]
    out = cosine_topk(ds, [0, 1], Q, k=5, concurrency=2)
    # exact check vs numpy (float32 storage roundtrip on the batch side)
    Mn = M.astype(np.float32).astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Mn.T
    for qid in (0, 1):
        got = out[out["query_id"] == qid]["vec_id"].tolist()
        exp = np.argsort(-S[qid])[:5].tolist()
        assert got == exp
    assert out[out["query_id"] == 0].iloc[0]["vec_id"] == 0  # self best


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dups_and_lsh():
    import ray.data as rd

    M, tbl = _emb_table()
    ds = rd.from_arrow(tbl)
    out = embedding_near_dups(ds, np.arange(len(M)), M, threshold=0.97,
                              concurrency=2).to_pandas()
    assert {(0, 1)} == set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    lsh = lsh_bucketed_pairs(rd.from_arrow(tbl), threshold=0.97, n_planes=4,
                             dim=16, concurrency=2).to_pandas()
    assert (0, 1) in set(map(tuple, lsh[["id_a", "id_b"]].to_numpy()))


@pytest.mark.usefixtures("ray_session")
def test_multimodal_plumbing():
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    payloads = ds.map_batches(to_binary_payload, batch_format="pyarrow")
    out = decode_images(payloads, concurrency=2).to_pandas()
    assert len(out) == len(DOCS)
    assert (out["payload_bytes"] > 0).all()
    assert out["width"].between(1, 64).all()
    # deterministic: same payload → same feature
    f = out.sort_values("doc_id")["feature"].tolist()
    assert f[0] == f[1]  # docs 0 and 1 identical text
    # the live slot is now a REAL pure-numpy PPM/PGM/BMP decoder
    dec = RealImageDecoder()
    ppm = b"P5\n2 2\n255\n" + bytes([10, 20, 30, 40])
    got = dec(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([ppm], pa.binary()),
        "payload_bytes": pa.array([len(ppm)], pa.int64()),
    })).to_pylist()[0]
    assert (got["width"], got["height"], got["channels"]) == (2, 2, 1)
    assert got["mean_luma"] == 25.0
    assert got["decode_error"] is None


@pytest.mark.usefixtures("ray_session")
def test_frame_sample_thinning():
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(25), pa.int64())})
    out = frame_sample(rd.from_arrow(t), every_nth=10).to_pandas()
    assert set(out["doc_id"]) == {0, 10, 20, 24}


@pytest.mark.usefixtures("ray_session")
def test_minhash_near_dups_verified():
    from etl_ray.ops.dedup import minhash_near_dups

    out = minhash_near_dups(docs_ds(), threshold=0.5, concurrency=2)
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in pairs  # exact dup, jaccard 1.0
    assert out[(out["id_a"] == 0) & (out["id_b"] == 1)].iloc[0][
        "jaccard"] == 1.0
    # near dup 0-2 survives the 0.5 threshold; unrelated pairs do not
    assert (0, 2) in pairs or (1, 2) in pairs
    assert (3, 4) not in pairs


@pytest.mark.usefixtures("ray_session")
def test_asof_join_broadcast_matches_shuffle():
    """Both as-of variants (broadcast index vs bucketed merge_asof) must
    agree, incl. left rows with no match (state stays null)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from etl_ray.ops.joins import asof_join, asof_join_broadcast

    rng = np.random.default_rng(4)
    left_df = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "t": rng.integers(0, 1000, 200),
        "v": rng.random(200),
    })
    right_df = pd.DataFrame({
        "k": [0, 0, 1, 1, 2, 3],
        "since": [10, 500, 0, 900, 50, 1001],
        "state": [1, 2, 3, 4, 5, 6],
    })
    left = rd.from_pandas(left_df).repartition(4)
    right = rd.from_pandas(right_df)

    a = asof_join(left, right, by="k", on="t", right_on="since",
                  value_cols=["state"], num_buckets=4).to_pandas()
    b = asof_join_broadcast(left, right_df, by="k", on="t",
                            right_on="since", value_cols=["state"],
                            concurrency=2).to_pandas()
    key = ["k", "t", "v"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == 200
    av = a["state"].astype("float64").fillna(-1).tolist()
    bv = b["state"].astype("float64").fillna(-1).tolist()
    assert av == bv
    # spot-check semantics: k=4 and t<10 on k=0 have no match
    assert a.loc[a["k"] == 4, "state"].isna().all()
    # k=3's only change is at 1001 > any t
    assert a.loc[a["k"] == 3, "state"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_range_join_variants_agree():
    """Broadcast vs domain-bucketed range join: identical (row, interval)
    pair sets, incl. 1->N fan-out and intervals spanning bucket borders."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from etl_ray.ops.joins import range_join, range_join_broadcast

    rng = np.random.default_rng(7)
    left_df = pd.DataFrame({
        "t": rng.integers(0, 1000, 300),
        "v": rng.random(300),
    })
    iv = pd.DataFrame({
        "lo": [0, 90, 100, 500, 995, 2000],
        "hi": [50, 210, 120, 980, 1000, 2100],  # overlapping + empty
        "label": [1, 2, 3, 4, 5, 6],
    })
    left = rd.from_pandas(left_df).repartition(4)

    a = range_join(left, iv, on="t", lo_col="lo", hi_col="hi",
                   value_cols=["label"], bucket_width=100).to_pandas()
    b = range_join_broadcast(left, iv, on="t", lo_col="lo", hi_col="hi",
                             value_cols=["label"], concurrency=2).to_pandas()
    ka = sorted(zip(a["t"], np.round(a["v"], 9), a["label"]))
    kb = sorted(zip(b["t"], np.round(b["v"], 9), b["label"]))
    assert ka == kb and len(ka) > 0
    # exact oracle in pure pandas
    exp = left_df.merge(iv, how="cross")
    exp = exp[(exp["t"] >= exp["lo"]) & (exp["t"] < exp["hi"])]
    assert len(ka) == len(exp)
    assert (a["label"] != 6).all()  # empty interval matched nothing


@pytest.mark.usefixtures("ray_session")
def test_hopping_window_membership():
    """Each event lands in exactly width/step windows; totals match an
    explicit per-event expansion."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from etl_ray.ops.windows import hopping_window

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 3 * 86400, n), unit="s"),
        "value": np.round(rng.random(n), 2),
    })
    out = hopping_window(rd.from_pandas(df).repartition(4),
                         width_s=3 * 3600, step_s=3600).to_pandas()
    # explicit oracle
    rows = []
    for r in df.itertuples(index=False):
        w_last = int(r.ts.timestamp()) // 3600
        for w in range(w_last - 2, w_last + 1):
            rows.append((r.user_id, w, round(r.value * 100)))
    exp = (pd.DataFrame(rows, columns=["user_id", "window", "cents"])
           .groupby(["user_id", "window"], as_index=False)
           .agg(n=("cents", "size"), sum_cents=("cents", "sum")))
    got = out.sort_values(["user_id", "window"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "window"]).reset_index(drop=True)
    assert got["n"].sum() == 3 * n
    pd.testing.assert_frame_equal(
        got[["user_id", "window", "n", "sum_cents"]].astype("int64"),
        exp.astype("int64"))
