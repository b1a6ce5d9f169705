"""Time travel: historical manifest versions reconstruct past snapshots;
gc keeps history-referenced files; prune retires it (VACUUM analog)."""

import os

import pytest

from etl_ray.config import EngineConfig, TokensPayload
from etl_ray.lake import read_lake
from etl_ray.oracle import oracle_replay
from etl_ray.pipelines.compaction import compact
from etl_ray.pipelines.replay import replay
from etl_ray.sources.generator import generate_changelog
from etl_ray.state.manifest import Manifest

VOCAB = 500


def cfg(**kw):
    kw.setdefault("num_partitions", 4)
    kw.setdefault("batch_size", 256)
    kw.setdefault("payload", TokensPayload(vocab_size=VOCAB))
    return EngineConfig(**kw)


def state(lake, version=None):
    df = read_lake(lake, include_seq=True, version=version).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_time_travel_reconstructs_past_versions(tmp_wal, tmp_lake):
    paths = generate_changelog(tmp_wal, n_events=900, n_segments=3, seed=61,
                               vocab=VOCAB)
    replay(tmp_wal, tmp_lake, cfg(), segments_per_commit=1)
    assert Manifest.load(tmp_lake).version == 3
    # version k == oracle over the first k segments
    for k in (1, 2, 3):
        got = state(tmp_lake, version=k)
        exp = oracle_replay(paths[:k], vocab=VOCAB).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert list(got["doc_id"]) == list(exp["doc_id"]), f"v{k}"
        assert list(got["sequence_number"]) == list(exp["sequence_number"])
    # version 0 = empty lake
    assert read_lake(tmp_lake, version=0).count() == 0
    # default read = latest
    assert state(tmp_lake).equals(state(tmp_lake, version=3))


@pytest.mark.usefixtures("ray_session")
def test_gc_preserves_history_prune_retires_it(tmp_wal, tmp_lake):
    generate_changelog(tmp_wal, n_events=600, n_segments=2, seed=62,
                       vocab=VOCAB)
    c = cfg(compact_min_deltas=1)
    replay(tmp_wal, tmp_lake, c, segments_per_commit=1)
    compact(tmp_lake, c, force=True)
    m = Manifest.load(tmp_lake)
    v_old = 1
    old_files = Manifest.load(tmp_lake, version=v_old).live_files()
    assert old_files
    # gc keeps everything any retained version references
    removed = m.gc()
    assert not set(removed) & set(old_files)
    before = state(tmp_lake, version=v_old)
    assert len(before) > 0
    # prune to latest only: old snapshot files reclaimed, time travel gone
    removed = Manifest.load(tmp_lake).prune(keep_last=1)
    assert set(removed) >= (set(old_files)
                            - set(Manifest.load(tmp_lake).live_files()))
    assert not os.path.exists(
        os.path.join(tmp_lake, "_manifest", f"v{v_old}.json"))
    # latest still reads fine after prune
    assert len(state(tmp_lake)) == len(before) or len(state(tmp_lake)) > 0
