"""Per-member stream retry (reference storage/storage.go:163-210) and the
GetFilename base64 queue-message branch (reference etl/globals.go:377-394)."""
import base64
import io
import tarfile

import pytest

from etl_ray.functions.paths import get_filename
from etl_ray.sources.archive import RetryingStream


def make_tar(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


class FlakyFile:
    """File over bytes that raises OSError on chosen read() call numbers
    (counted across reopens via the shared ``state`` dict)."""

    def __init__(self, payload: bytes, state: dict, fail_on_calls):
        self._b = io.BytesIO(payload)
        self._state = state
        self._fail = set(fail_on_calls)

    def read(self, n=-1):
        self._state["calls"] = self._state.get("calls", 0) + 1
        if self._state["calls"] in self._fail:
            raise OSError("stream error: transient stall")
        return self._b.read(n)

    def seek(self, off, whence=0):
        return self._b.seek(off, whence)

    def tell(self):
        return self._b.tell()

    def close(self):
        pass


def test_retrying_stream_heals_mid_read():
    payload = bytes(range(256)) * 512  # 128 KiB
    state = {}
    rs = RetryingStream(lambda: FlakyFile(payload, state, {2, 3}),
                        sleep=lambda s: None)
    got = b""
    while True:
        chunk = rs.read(4096)
        if not chunk:
            break
        got += chunk
    assert got == payload
    assert rs.retries == 2


def test_retrying_stream_gives_up_after_max_trials():
    state = {}
    rs = RetryingStream(
        lambda: FlakyFile(b"x" * 100, state, set(range(1, 100))),
        max_trials=4, sleep=lambda s: None)
    with pytest.raises(OSError):
        rs.read(10)
    assert rs.retries == 3  # trials 1-3 retried, trial 4 raised


def test_retrying_stream_backoff_is_exponential():
    sleeps = []
    state = {}
    rs = RetryingStream(lambda: FlakyFile(b"y" * 64, state, {1, 2, 3}),
                        sleep=sleeps.append)
    assert rs.read(64) == b"y" * 64
    assert sleeps == [0.016, 0.032, 0.064]


def test_member_level_recovery_through_tarfile():
    """A stream error mid-archive heals below the tar layer: every member
    decodes intact and the archive is read exactly once (no task re-run)."""
    members = [(f"m{i}.json", bytes([i]) * 3000) for i in range(8)]
    payload = make_tar(members)
    state = {}
    rs = RetryingStream(lambda: FlakyFile(payload, state, {3, 7}),
                        sleep=lambda s: None)
    with tarfile.open(fileobj=io.BufferedReader(rs, 4096), mode="r") as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf if m.isfile()]
    assert got == members
    assert rs.retries == 2


def test_get_filename_plain_and_base64():
    assert get_filename("gs://bucket/a.tgz") == "gs://bucket/a.tgz"
    assert get_filename("/data/a.tar") == "/data/a.tar"
    enc = base64.b64encode(b"gs://bucket/b.tgz").decode()
    assert get_filename(enc) == "gs://bucket/b.tgz"
    with pytest.raises(ValueError):
        get_filename("not-a-path-nor-base64!!")
    # valid base64 of a non-URI still rejects
    with pytest.raises(ValueError):
        get_filename(base64.b64encode(b"hello").decode())


def test_worker_accepts_base64_archive(ray_session, tmp_path):
    import json
    import threading
    import urllib.request

    from etl_ray.service import WorkerService

    arc = tmp_path / "t.tar"
    arc.write_bytes(make_tar([("a.json", b'{"k": 1}')]))
    svc = WorkerService(port=0)
    t = threading.Thread(target=svc.serve_forever, daemon=True)
    t.start()
    try:
        enc = base64.b64encode(str(arc).encode()).decode()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{svc.port}/v2/worker?archive={enc}") as r:
            out = json.loads(r.read())
        assert out["archive"] == str(arc)
        assert out["rows"] >= 1
        # invalid (non-URI, non-base64) → 400, not 500
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{svc.port}/v2/worker?archive=@@bad@@")
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        svc.httpd.shutdown()
