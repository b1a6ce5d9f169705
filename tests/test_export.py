"""Resumable hash-sharded training export (ops/export.py)."""
import os

import pandas as pd
import pyarrow as pa
import pytest


def _docs(n=200):
    return pa.table({
        "doc_id": pa.array([str(i) for i in range(n)], pa.string()),
        "tokens": pa.array([[j % 7 for j in range(i % 9 + 1)]
                            for i in range(n)], pa.list_(pa.int32())),
    })


@pytest.mark.usefixtures("ray_session")
def test_export_shards_roundtrip_and_resume(tmp_path):
    import ray.data as rd

    from etl_ray.ops.export import export_shards, read_shards

    out = str(tmp_path / "shards")
    ds = rd.from_arrow(_docs()).repartition(4)
    m1 = export_shards(ds, out, n_shards=8, tokens_col="tokens")
    assert m1["shard"].tolist() == list(range(8))
    assert not m1["skipped"].any()
    assert m1["n_docs"].sum() == 200
    back = read_shards(out).to_pandas()
    assert len(back) == 200 and set(back["doc_id"]) == {
        str(i) for i in range(200)}

    # simulate a crash: delete two shards' files AND markers
    for s in (2, 5):
        os.remove(os.path.join(out, f"shard-{s:05d}.parquet"))
        os.remove(os.path.join(out, f"shard-{s:05d}.SUCCESS"))
    m2 = export_shards(ds, out, n_shards=8, tokens_col="tokens")
    # only the missing shards were rewritten; others carried as skipped
    assert sorted(m2[~m2["skipped"]]["shard"]) == [2, 5]
    assert sorted(m2[m2["skipped"]]["shard"]) == [0, 1, 3, 4, 6, 7]
    # manifest identical to the first run's
    pd.testing.assert_frame_equal(
        m1[["shard", "n_docs", "n_tok"]],
        m2[["shard", "n_docs", "n_tok"]])

    # byte-stable: rewritten shard files equal a fresh full export's
    out2 = str(tmp_path / "shards2")
    export_shards(ds, out2, n_shards=8, tokens_col="tokens")
    for s in (2, 5):
        a = open(os.path.join(out, f"shard-{s:05d}.parquet"), "rb").read()
        b = open(os.path.join(out2, f"shard-{s:05d}.parquet"), "rb").read()
        assert a == b


@pytest.mark.usefixtures("ray_session")
def test_export_shards_assignment_is_partitioning_independent(tmp_path):
    import ray.data as rd

    from etl_ray.ops.export import export_shards

    t = _docs(64)
    m_a = export_shards(rd.from_arrow(t), str(tmp_path / "a"), n_shards=4)
    m_b = export_shards(rd.from_arrow(t).repartition(7),
                        str(tmp_path / "b"), n_shards=4)
    pd.testing.assert_frame_equal(m_a, m_b)


@pytest.mark.usefixtures("ray_session")
def test_export_shards_lost_file_and_config_mismatch(tmp_path):
    import ray.data as rd

    from etl_ray.ops.export import export_shards, read_shards

    out = str(tmp_path / "s")
    ds = rd.from_arrow(_docs(50))
    export_shards(ds, out, n_shards=4)
    # marker survives but data file is lost: resume must REWRITE it,
    # and read_shards must refuse the half-state rather than truncate
    os.remove(os.path.join(out, "shard-00002.parquet"))
    with pytest.raises(FileNotFoundError, match="committed"):
        read_shards(out)
    m = export_shards(ds, out, n_shards=4)
    rewritten = m[~m["skipped"]]
    assert rewritten["shard"].tolist() == [2]
    assert len(read_shards(out).to_pandas()) == 50

    # resuming under a different sharding config must refuse loudly
    with pytest.raises(ValueError, match="fresh out_dir"):
        export_shards(ds, out, n_shards=8)
    with pytest.raises(ValueError, match="fresh out_dir"):
        export_shards(ds, out, n_shards=4, seed="other")

    # fully-resumed run: everything carried, empty written frame handled
    m2 = export_shards(ds, out, n_shards=4)
    assert m2["skipped"].all() and len(m2) == 4
