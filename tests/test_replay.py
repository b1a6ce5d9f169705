"""End-to-end replay vs the pure-pyarrow oracle: token-array equality per
doc_id (BASELINE.json input_hint), exactly-once under duplicate delivery and
crash/resume, quarantine lineage."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ray.config import EngineConfig, TokensPayload
from etl_ray.lake import bootstrap, read_lake, read_quarantine
from etl_ray.oracle import oracle_replay
from etl_ray.pipelines.replay import replay, replay_once
from etl_ray.sources.generator import generate_base, generate_changelog
from etl_ray.state.manifest import Manifest

VOCAB = 1000


def cfg(**kw):
    kw.setdefault("num_partitions", 8)
    kw.setdefault("max_salt", 4)
    kw.setdefault("batch_size", 256)
    kw.setdefault("apply_concurrency", 2)
    kw.setdefault("payload", TokensPayload(vocab_size=VOCAB))
    return EngineConfig(**kw)


def lake_state(lake_dir):
    t = read_lake(lake_dir, include_seq=True).to_pandas()
    return t.sort_values("doc_id").reset_index(drop=True)


def assert_matches_oracle(lake_dir, oracle: pa.Table):
    got = lake_state(lake_dir)
    exp = oracle.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp), f"{len(got)} rows != oracle {len(exp)}"
    assert list(got["doc_id"]) == list(exp["doc_id"])
    for g, e in zip(got["tokens"], exp["tokens"]):
        assert list(g) == list(e)
    assert list(got["n_tok"]) == list(exp["n_tok"])
    assert list(got["source"]) == list(exp["source"])
    assert list(got["sequence_number"]) == list(exp["sequence_number"])


@pytest.mark.usefixtures("ray_session")
def test_full_replay_matches_oracle(tmp_wal, tmp_lake):
    paths = generate_changelog(tmp_wal, n_events=2000, n_segments=5,
                               n_base_docs=0, seed=11, vocab=VOCAB)
    commits = replay(tmp_wal, tmp_lake, cfg())
    assert len(commits) == 1
    assert commits[0].events_in == 2000
    assert_matches_oracle(tmp_lake, oracle_replay(paths, vocab=VOCAB))


@pytest.mark.usefixtures("ray_session")
def test_replay_with_base_and_multi_commit(tmp_wal, tmp_lake, tmp_path):
    base_path = str(tmp_path / "base.parquet")
    base = generate_base(base_path, n_docs=200, seed=2, vocab=VOCAB)
    paths = generate_changelog(tmp_wal, n_events=1500, n_segments=6,
                               n_base_docs=200, seed=12, vocab=VOCAB)
    c = cfg()
    bootstrap(base_path, tmp_lake, c)
    commits = replay(tmp_wal, tmp_lake, c, segments_per_commit=2)
    assert len(commits) == 3
    m = Manifest.load(tmp_lake)
    assert m.applied_through_segment == 5
    assert_matches_oracle(
        tmp_lake, oracle_replay(paths, base_table=base, vocab=VOCAB))


@pytest.mark.usefixtures("ray_session")
def test_duplicate_delivery_idempotent(tmp_wal, tmp_lake):
    paths = generate_changelog(tmp_wal, n_events=800, n_segments=4,
                               n_base_docs=0, seed=13, vocab=VOCAB)
    c = cfg()
    replay(tmp_wal, tmp_lake, c)
    before = lake_state(tmp_lake)
    v_before = Manifest.load(tmp_lake).version
    # duplicate delivery of already-applied segments: watermark skips them
    again = replay(tmp_wal, tmp_lake, c)
    assert again == []
    assert Manifest.load(tmp_lake).version == v_before
    after = lake_state(tmp_lake)
    assert before.equals(after)


@pytest.mark.usefixtures("ray_session")
def test_crash_before_commit_then_resume(tmp_wal, tmp_lake):
    paths = generate_changelog(tmp_wal, n_events=1200, n_segments=4,
                               n_base_docs=0, seed=14, vocab=VOCAB)
    c = cfg()
    # commit 1 applies segments 0-1 normally
    replay_once(tmp_wal, tmp_lake, c, max_segments=2)
    # commit 2 crashes AFTER writing data files but BEFORE the manifest flip
    replay_once(tmp_wal, tmp_lake, c, max_segments=2, commit=False)
    m = Manifest.load(tmp_lake)
    assert m.applied_through_segment == 1  # watermark unchanged
    # restart: rerun applies the same segments; deterministic same files
    replay(tmp_wal, tmp_lake, c)
    assert Manifest.load(tmp_lake).applied_through_segment == 3
    assert_matches_oracle(tmp_lake, oracle_replay(paths, vocab=VOCAB))


@pytest.mark.usefixtures("ray_session")
def test_quarantine_and_lineage(tmp_wal, tmp_lake):
    paths = generate_changelog(tmp_wal, n_events=1000, n_segments=2,
                               n_base_docs=50, seed=15, vocab=VOCAB,
                               corrupt_frac=0.08)
    c = cfg()
    commits = replay(tmp_wal, tmp_lake, c)
    cs = commits[0]
    assert cs.quarantined > 20
    assert cs.events_in == 1000
    assert cs.valid == cs.events_in - cs.quarantined
    q = read_quarantine(tmp_lake)
    assert len(q) == cs.quarantined
    assert q["__reason"].null_count == 0
    reasons = set(q["__reason"].to_pylist())
    assert "unknown op" in reasons
    # corrupt events were never applied; final state matches oracle (which
    # skips invalid rows by the same rules)
    assert_matches_oracle(tmp_lake, oracle_replay(paths, vocab=VOCAB))
    # manifest lineage invariant: events_in == valid + quarantined
    lin = Manifest.load(tmp_lake).lineage
    assert lin["events_in"] == lin["valid"] + lin["quarantined"]


@pytest.mark.usefixtures("ray_session")
def test_salted_replay_same_result(tmp_wal, tmp_lake, tmp_path):
    paths = generate_changelog(tmp_wal, n_events=1500, n_segments=3,
                               n_base_docs=0, seed=16, vocab=VOCAB)
    # salt_threshold=1 → every partition salted after the first commit
    c = cfg(salt_threshold=1)
    commits = replay(tmp_wal, tmp_lake, c, segments_per_commit=1)
    assert len(commits) == 3
    # later commits actually salted: >1 delta file per partition per commit
    m = Manifest.load(tmp_lake)
    salted_files = [
        f for p in m.partitions.values() for f in p.files if "-s1" in f or "-s2" in f
    ]
    assert salted_files
    assert_matches_oracle(tmp_lake, oracle_replay(paths, vocab=VOCAB))
