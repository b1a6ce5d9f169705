"""HTTP one-shot worker service and IVF ANN."""

import io
import json
import tarfile
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest


def http_get(port, path):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.mark.usefixtures("ray_session")
def test_worker_service_end_to_end(tmp_path):
    from etl_ray.service import WorkerService

    tar_path = str(tmp_path / "a.tgz")
    with tarfile.open(tar_path, "w:gz") as tf:
        for name, blob in [("x.txt", b"hello world"),
                           ("y.jsonl", b'{"a": 1}\n{"a": 2}\n'),
                           ("bad.jsonl", b"{broken")]:
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))

    svc = WorkerService(port=0)
    t = threading.Thread(target=svc.serve_forever, daemon=True)
    t.start()
    try:
        code, body = http_get(svc.port, "/health")
        assert code == 200 and body["ok"]
        code, body = http_get(svc.port, f"/v2/worker?archive={tar_path}")
        assert code == 200
        assert body["rows"] == 3  # 1 txt summary + 2 jsonl rows
        assert body["errors"] == 1  # the broken jsonl member
        assert set(body["datatypes"]) == {"text", "jsonl"}
        code, _ = http_get(svc.port, "/v2/worker?archive=/nope.tgz")
        assert code == 500
        code, _ = http_get(svc.port, "/v2/worker")
        assert code == 400
        code, _ = http_get(svc.port, "/nope")
        assert code == 404
    finally:
        svc.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_matches_bruteforce_in_probed_cells():
    import ray.data as rd

    from etl_ray.ops.similarity import (
        _normalize,
        cosine_topk,
        ivf_centroids,
        ivf_topk,
    )

    rng = np.random.default_rng(3)
    n, dim = 300, 64
    M = rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64)
    Q = M[:4] + 0.01 * rng.standard_normal((4, dim))
    df = pd.DataFrame({"vec_id": ids, "embedding": [list(map(float, r))
                                                    for r in M]})
    ds = rd.from_pandas(df)

    out = ivf_topk(ds, np.arange(4), Q, k=5, nlist=8, nprobe=8,
                   concurrency=2)
    # nprobe == nlist → no pruning → must equal exact brute force
    exact = cosine_topk(ds, np.arange(4), Q, k=5, concurrency=2)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True)[["query_id", "vec_id", "rank"]],
        exact.reset_index(drop=True)[["query_id", "vec_id", "rank"]])

    # pruned: each query's own perturbed source vector lives in the probed
    # cell (query ≈ vector → same nearest centroid) → still found at rank 1
    pruned = ivf_topk(ds, np.arange(4), Q, k=5, nlist=8, nprobe=2,
                      concurrency=2)
    top1 = pruned[pruned["rank"] == 1]
    assert list(top1["vec_id"]) == [0, 1, 2, 3]
    # and pruning actually dropped candidates relative to full scoring
    C = ivf_centroids(dim, 8)
    assign = np.argmax(_normalize(M) @ C.T, axis=1)
    assert len(set(assign)) > 2  # cells genuinely partition the corpus


@pytest.mark.usefixtures("ray_session")
def test_ivf_partitioned_lake_uri_transparent(tmp_path):
    # the pruned-read path must work with the lake root given as a
    # pyarrow.fs URI (at 100 TB the lake lives in object storage), and
    # must return an empty frame — not raise — when every probed
    # centroid maps to an empty cell
    import ray.data as rd

    from etl_ray.ops.similarity import (
        ivf_build,
        ivf_persist,
        ivf_topk_partitioned,
        probed_cells,
    )

    rng = np.random.default_rng(7)
    n, dim = 200, 32
    M = rng.standard_normal((n, dim))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [list(map(float, r)) for r in M]})
    indexed, C = ivf_build(rd.from_pandas(df), dim=dim, nlist=8,
                           concurrency=2)
    root = str(tmp_path / "ivf_lake")
    ivf_persist(indexed, root)

    Q = M[:3] + 0.01 * rng.standard_normal((3, dim))
    plain, st_plain = ivf_topk_partitioned(
        root, np.arange(3), Q, centroids=C, k=5, nprobe=3, concurrency=2)
    via_uri, st_uri = ivf_topk_partitioned(
        "file://" + root, np.arange(3), Q, centroids=C, k=5, nprobe=3,
        concurrency=2)
    pd.testing.assert_frame_equal(plain.reset_index(drop=True),
                                  via_uri.reset_index(drop=True))
    assert st_uri == st_plain
    assert 0 < st_uri["bytes_read"] < st_uri["bytes_total"]

    # empty-cell probe: fabricate queries whose probed cells are all
    # cells that hold no vectors (if every cell is occupied, drop the
    # occupied cells' files by probing a lake with only one cell kept)
    occupied = {int(p.name.split("=")[1])
                for p in (tmp_path / "ivf_lake").iterdir()}
    empty_cells = [c for c in range(8) if c not in occupied]
    if empty_cells:
        # a query pointing exactly AT an empty cell's centroid probes it
        Qe = C[empty_cells[:1]]
        got = probed_cells(Qe, C, 1)
        assert int(got[0]) == empty_cells[0]
        out, st = ivf_topk_partitioned(root, [0], Qe, centroids=C,
                                       k=5, nprobe=1, concurrency=2)
        assert len(out) == 0
        assert st["bytes_read"] == 0
