"""Streaming (bounded-memory) sort-merge compaction equals in-memory merge."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ray.config import EngineConfig, TokensPayload
from etl_ray.lake import read_lake
from etl_ray.oracle import oracle_replay
from etl_ray.pipelines.compaction import compact
from etl_ray.pipelines.replay import replay
from etl_ray.sources.generator import generate_changelog
from etl_ray.stages.merge import merge_runs
from etl_ray.stages.streaming_merge import split_points, streaming_merge_files
from etl_ray.state.manifest import Manifest

VOCAB = 500


def _sorted_run(path, rows):
    t = pa.Table.from_pylist(rows).sort_by(
        [("doc_id", "ascending"), ("sequence_number", "ascending")])
    pq.write_table(t, path, row_group_size=4)
    return t


def test_streaming_merge_equals_memory(tmp_path):
    schema = pa.schema(
        [("doc_id", pa.string()), ("sequence_number", pa.int64()),
         ("v", pa.int64()), ("op", pa.string())]
    )
    base_rows = [{"doc_id": f"d{i:04d}", "sequence_number": -1, "v": i,
                  "op": None} for i in range(50)]
    d1_rows = [{"doc_id": f"d{i:04d}", "sequence_number": 100 + i, "v": -i,
                "op": "update"} for i in range(0, 50, 3)]
    d2_rows = (
        [{"doc_id": f"d{i:04d}", "sequence_number": 200 + i, "v": None,
          "op": "delete"} for i in range(0, 50, 7)]
        + [{"doc_id": f"x{i}", "sequence_number": 300 + i, "v": 1000 + i,
            "op": "insert"} for i in range(5)]  # beyond base key range
    )
    paths = []
    for name, rows in [("b.parquet", base_rows), ("d1.parquet", d1_rows),
                       ("d2.parquet", d2_rows)]:
        p = str(tmp_path / name)
        _sorted_run(p, rows)
        paths.append(p)

    pts = split_points(paths, rows_per_range=10)
    assert pts and len(pts) >= 3  # genuinely range-sliced

    out = str(tmp_path / "merged.parquet")
    n = streaming_merge_files(paths, out, target_schema=schema,
                              drop_deletes=True, drop_columns=["op"],
                              rows_per_range=10)
    got = pq.read_table(out)
    assert n == len(got)

    exp = merge_runs([pq.read_table(p) for p in paths], drop_deletes=True,
                     target_schema=schema).drop_columns(["op"])
    assert got.sort_by([("doc_id", "ascending")]).equals(
        exp.sort_by([("doc_id", "ascending")]))
    # output globally sorted by doc_id
    ids = got["doc_id"].to_pylist()
    assert ids == sorted(ids)


@pytest.mark.usefixtures("ray_session")
def test_compaction_streaming_path_matches_oracle(tmp_wal, tmp_lake):
    paths = generate_changelog(tmp_wal, n_events=1500, n_segments=5,
                               n_base_docs=0, seed=31, vocab=VOCAB)
    cfg = EngineConfig(num_partitions=4, max_salt=2, batch_size=256,
                       payload=TokensPayload(vocab_size=VOCAB),
                       compact_streaming_threshold_bytes=1,  # force streaming
                       compact_rows_per_range=64)
    replay(tmp_wal, tmp_lake, cfg, segments_per_commit=1)
    res = compact(tmp_lake, cfg, force=True)
    assert res["compacted_partitions"] == 4
    m = Manifest.load(tmp_lake)
    assert all(len(p.files) == 1 for p in m.partitions.values())

    got = read_lake(tmp_lake, include_seq=True).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    exp = oracle_replay(paths, vocab=VOCAB).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    for g, e in zip(got["tokens"], exp["tokens"]):
        assert list(g) == list(e)
