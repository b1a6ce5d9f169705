"""Gardener job-tracker protocol: fake tracker (stdlib HTTP), real Ray
parse pipeline — the analog of reference active/poller_test.go."""
import io
import json
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from etl_ray.tracker import (FAILED, PARSE_COMPLETE, PARSING, JobClient,
                             job_root, poll)


class FakeGardener:
    """Counts heartbeats/updates and hands out a queued job list, like
    poller_test.go's fakeGardener."""

    def __init__(self):
        self.jobs = []
        self.heartbeats = 0
        self.updates = []  # (id, state, detail)
        fg = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def do_POST(self):
                url = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                if url.path == "/v2/job/next":
                    if not fg.jobs:
                        self.send_response(404)  # reachable: no job (4xx)
                        self.end_headers()
                        return
                    body = json.dumps(fg.jobs.pop(0)).encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif url.path == "/v2/job/heartbeat":
                    fg.heartbeats += 1
                    self.send_response(200)
                    self.end_headers()
                elif url.path == "/v2/job/update":
                    fg.updates.append(
                        (q["id"], q["state"], q.get("detail", "")))
                    self.send_response(200)
                    self.end_headers()
                else:
                    self.send_response(404)
                    self.end_headers()

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        threading.Thread(target=self.httpd.serve_forever,
                         daemon=True).start()

    def close(self):
        self.httpd.shutdown()


def write_tar(path, members):
    with tarfile.open(path, "w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


@pytest.fixture()
def gardener():
    fg = FakeGardener()
    yield fg
    fg.close()


def test_job_root_shapes():
    assert job_root({"root": "/data/x"}) == "/data/x"
    assert job_root({"bucket": "b", "prefix": "ndt/2019"}) == "gs://b/ndt/2019"
    with pytest.raises(ValueError):
        job_root({"id": "j1"})


def test_poll_runs_jobs_and_reports(gardener, ray_session, tmp_path):
    write_tar(tmp_path / "a.tar", [("x.json", b'{"k": 1}')])
    write_tar(tmp_path / "b.tar", [("y.json", b'{"k": 2}'),
                                   ("z.json", b'{"k": 3}')])
    gardener.jobs.append({"id": "j1", "root": str(tmp_path)})
    done = poll(gardener.url, max_jobs=5)
    assert len(done) == 1
    assert done[0] == {"id": "j1", "archives": 2, "rows": 3, "errors": 0}
    # one dispatch beat + the background beater holds the lease (period
    # default 10s, so short parses see just the dispatch beat)
    assert gardener.heartbeats >= 1
    states = [(u[0], u[1]) for u in gardener.updates]
    assert states[0] == ("j1", PARSING)  # starting tasks
    assert ("j1", PARSE_COMPLETE) in states
    # queue drained: poll stopped on the 404 from /v2/job/next


def test_poll_isolates_job_failures(gardener, ray_session, tmp_path):
    gardener.jobs.append({"id": "bad"})  # no input location → ValueError
    write_tar(tmp_path / "a.tar", [("x.json", b'{"k": 1}')])
    gardener.jobs.append({"id": "good", "root": str(tmp_path)})
    done = poll(gardener.url, max_jobs=5)
    assert [d["id"] for d in done] == ["bad", "good"]
    assert "error" in done[0] and done[1]["rows"] == 1
    by_id = {}
    for jid, state, _ in gardener.updates:
        by_id.setdefault(jid, []).append(state)
    assert FAILED in by_id["bad"]
    assert PARSE_COMPLETE in by_id["good"]


def test_client_distinguishes_unreachable_from_drained():
    from etl_ray.tracker import TrackerUnreachable

    c = JobClient("http://127.0.0.1:1", timeout=0.2)  # nothing listens
    with pytest.raises(TrackerUnreachable):  # transport != empty queue
        c.next_job()
    assert c.heartbeat("x") is False  # status posts log-and-continue
    assert c.update("x", PARSING) is False
    assert c.transport_errors == 3


def test_poll_retries_transient_then_gives_up():
    # nothing listens: poll must retry with backoff, then exit cleanly
    # (not crash), returning no jobs
    done = poll("http://127.0.0.1:1", max_jobs=3, max_transient=2,
                backoff=0.01)
    assert done == []


def test_poll_skips_malformed_job_payloads(gardener, ray_session, tmp_path):
    # valid JSON but not a job (no id): treated as no-job (clean stop),
    # never a KeyError crash mid-loop
    gardener.jobs.append({"jobs": ["wrong-shape"]})
    done = poll(gardener.url, max_jobs=5)
    assert done == []


def test_job_filter_applied(gardener, ray_session, tmp_path):
    write_tar(tmp_path / "keep_me.tar", [("x.json", b'{"k": 1}')])
    write_tar(tmp_path / "skip.tar", [("y.json", b'{"k": 2}')])
    gardener.jobs.append({"id": "jf", "root": str(tmp_path),
                          "filter": r"keep_.*\.tar$"})
    done = poll(gardener.url, max_jobs=1)
    assert done[0]["archives"] == 1 and done[0]["rows"] == 1


def test_5xx_from_reachable_tracker_is_transient():
    # a tracker mid-restart behind a proxy answers 503: that is NOT a
    # drained queue — next_job must raise for the retry path
    from etl_ray.tracker import TrackerUnreachable

    class FiveOhThree(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_POST(self):
            self.send_response(503)
            self.end_headers()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), FiveOhThree)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        c = JobClient(f"http://127.0.0.1:{httpd.server_address[1]}",
                      timeout=1.0)
        with pytest.raises(TrackerUnreachable):
            c.next_job()
        # status posts still log-and-continue on 5xx
        assert c.update("x", PARSING) is False
    finally:
        httpd.shutdown()
