import pyarrow.parquet as pq

from etl_ray.sources.generator import generate_base, generate_changelog
from etl_ray.sources.wal import list_segments


def test_changelog_deterministic(tmp_path):
    a = generate_changelog(str(tmp_path / "a"), n_events=500, n_segments=3,
                           n_base_docs=50, seed=7)
    b = generate_changelog(str(tmp_path / "b"), n_events=500, n_segments=3,
                           n_base_docs=50, seed=7)
    for pa_, pb in zip(a, b):
        ta, tb = pq.read_table(pa_), pq.read_table(pb)
        assert ta.equals(tb)


def test_changelog_shape(tmp_path):
    paths = generate_changelog(str(tmp_path / "w"), n_events=300,
                               n_segments=3, n_base_docs=10, seed=1)
    assert len(paths) == 3
    total = 0
    seqs = []
    for p in paths:
        t = pq.read_table(p)
        total += len(t)
        seqs.extend(t["sequence_number"].to_pylist())
        ops = set(t["op"].to_pylist())
        assert ops <= {"insert", "update", "delete"}
        # deletes have null payload
        for op, tok in zip(t["op"].to_pylist(), t["tokens"].to_pylist()):
            if op == "delete":
                assert tok is None
    assert total == 300
    assert seqs == sorted(seqs) and len(set(seqs)) == 300


def test_base_deterministic_and_invariant(tmp_path):
    t = generate_base(str(tmp_path / "base.parquet"), n_docs=40, seed=3)
    t2 = generate_base("", n_docs=40, seed=3)
    assert t.equals(t2)
    for toks, n in zip(t["tokens"].to_pylist(), t["n_tok"].to_pylist()):
        assert len(toks) == n


def test_list_segments_watermark_and_sampling(tmp_path):
    generate_changelog(str(tmp_path), n_events=100, n_segments=10,
                       n_base_docs=0, seed=5)
    segs = list_segments(str(tmp_path))
    assert [s.number for s in segs] == list(range(10))
    assert [s.number for s in list_segments(str(tmp_path), after=6)] == [7, 8, 9]
    sampled = list_segments(str(tmp_path), skip_count=1)
    assert [s.number for s in sampled] == [0, 2, 4, 6, 8]


def test_corruption_injection(tmp_path):
    paths = generate_changelog(str(tmp_path), n_events=400, n_segments=2,
                               n_base_docs=20, seed=9, corrupt_frac=0.1)
    bad = 0
    for p in paths:
        t = pq.read_table(p)
        for r in t.to_pylist():
            if (
                r["op"] not in ("insert", "update", "delete")
                or r["doc_id"] is None
                or (r["sequence_number"] is not None and r["sequence_number"] < 0)
                or (
                    r["op"] != "delete"
                    and r["tokens"] is not None
                    and r["n_tok"] is not None
                    and r["n_tok"] != len(r["tokens"])
                )
            ):
                bad += 1
    assert bad > 10
