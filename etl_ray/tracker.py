"""Remote job-tracker (Gardener) protocol: the worker's OUTBOUND status
reporting to an external coordinator.

The reference parser is driven by Gardener: it polls ``POST /v2/job/next``
for a job (a bucket/prefix + filename filter), posts
``POST /v2/job/heartbeat?id=…`` while working, and posts
``POST /v2/job/update?id=…&state=…&detail=…`` state transitions —
``Parsing`` as archives complete and ``ParseComplete`` when the job is
drained (reference active/poller.go:83-106, 169-191; the endpoint shapes
are pinned by active/poller_test.go:55-70). Gardener treats those updates
as the job checkpoint; a worker that goes silent gets its job re-issued.

Engine analog, same wire shapes, stdlib HTTP only: ``JobClient`` speaks
the three endpoints; ``run_job`` executes one job as a Ray pipeline
(list archives under the job root → filter → parse_archives) while a
daemon thread posts a heartbeat every ``heartbeat_period`` seconds for
the WHOLE parse — the lease must stay fresh for as long as the pipeline
runs, or Gardener re-issues an in-flight job and it gets double-parsed.
``poll`` is the reference's Poll loop — next/run/update until the queue
drains. The liveness taxonomy matters: an HTTP error status from a
REACHABLE tracker means "no job for you" (queue drained → stop), while a
transport failure (refused/timeout) is transient — poll backs off and
retries a bounded number of times instead of exiting the worker fleet on
the first network blip. Heartbeat/update transport failures are logged
and never fail the job — status reporting must not take down parsing
(reference logs-and-continues in the same spots)."""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable, Optional


class TrackerUnreachable(Exception):
    """Transport-level failure talking to the tracker (connection refused,
    timeout) — transient by definition; callers retry with backoff."""

# reference tracker states used by the parser side (tracker/tracker.go)
PARSING = "Parsing"
PARSE_COMPLETE = "ParseComplete"
FAILED = "Failed"


class JobClient:
    """Gardener v2 job API client (stdlib urllib; no dependencies)."""

    def __init__(self, base_url: str, *, timeout: float = 10.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout
        self.transport_errors = 0

    def _post(self, path: str, params: Optional[dict] = None, *,
              raise_transport: bool = False) -> Optional[bytes]:
        """POST; transport failures AND 5xx statuses either log-and-None
        (status reporting must not take down parsing) or raise
        TrackerUnreachable when the caller wants to retry. A 4xx from a
        reachable tracker is a definitive 'no' — returns None always."""
        url = self.base + path
        if params:
            url += "?" + urllib.parse.urlencode(params)
        req = urllib.request.Request(url, data=b"", method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as ex:
            if ex.code < 500:
                return None  # reachable tracker said no — definitive
            self.transport_errors += 1
            print(f"[tracker] {path} failed: {ex}", flush=True)
            if raise_transport:
                raise TrackerUnreachable(str(ex))
            return None
        except (urllib.error.URLError, OSError) as ex:
            self.transport_errors += 1
            print(f"[tracker] {path} failed: {ex}", flush=True)
            if raise_transport:
                raise TrackerUnreachable(str(ex))
            return None

    def next_job(self) -> Optional[dict]:
        """POST /v2/job/next → job dict, or None when the tracker has no
        job to hand out (a 4xx from a reachable tracker — the reference's
        ErrNoJobFound — or a payload that isn't a job). Raises
        TrackerUnreachable on transport failure OR a 5xx status so the
        poll loop retries with backoff instead of mistaking a blip (or a
        tracker mid-restart behind a proxy) for a drained queue. Expected
        fields: ``id`` plus whatever locates the input (the engine reads
        ``root`` or ``bucket``+``prefix``, and an optional ``filter``
        regex)."""
        body = self._post("/v2/job/next", raise_transport=True)
        if not body:
            return None
        try:
            job = json.loads(body)
        except json.JSONDecodeError:
            print(f"[tracker] bad job payload: {body[:200]!r}", flush=True)
            return None
        if not isinstance(job, dict) or "id" not in job:
            print(f"[tracker] job payload has no id: {job!r}", flush=True)
            return None
        return job

    def heartbeat(self, job_id) -> bool:
        return self._post("/v2/job/heartbeat", {"id": job_id}) is not None

    def update(self, job_id, state: str, detail: str = "") -> bool:
        return self._post(
            "/v2/job/update",
            {"id": job_id, "state": state, "detail": detail}) is not None


def job_root(job: dict) -> str:
    """Input root of a job: ``root`` verbatim, or gs://bucket/prefix."""
    if "root" in job:
        return job["root"]
    if "bucket" in job:
        prefix = (job.get("prefix") or "").lstrip("/")
        return f"gs://{job['bucket']}/{prefix}".rstrip("/")
    raise ValueError(f"job carries no input location: {job}")


def run_job(job: dict, client: JobClient, *,
            registry: Optional[dict] = None,
            heartbeat_period: float = 10.0) -> dict:
    """Execute one tracker job: list archives under the job root (filter
    regex applied at the listing, like JobFileSource), parse all of them
    as ONE Ray pipeline while a daemon thread heartbeats every
    ``heartbeat_period`` seconds — the lease must stay fresh for the
    WHOLE parse or Gardener re-issues the in-flight job — and report
    Parsing progress and the final counts."""
    from etl_ray.parsers import parse_archives
    from etl_ray.sources.archive import list_archives

    kw = {}
    if job.get("filter"):
        kw["pattern"] = job["filter"]
    paths = list_archives(job_root(job), **kw)
    client.heartbeat(job["id"])
    if not paths:
        return {"archives": 0, "rows": 0, "errors": 0}
    client.update(job["id"], PARSING,
                  f"dispatched {len(paths)} archives")
    stop = threading.Event()

    def beat():
        while not stop.wait(heartbeat_period):
            client.heartbeat(job["id"])

    beater = threading.Thread(target=beat, daemon=True)
    beater.start()
    try:
        parsed = parse_archives(paths, registry).to_pandas()
    finally:
        stop.set()
        beater.join(timeout=2 * heartbeat_period)
    err = parsed["error"].notna()
    return {"archives": len(paths), "rows": int((~err).sum()),
            "errors": int(err.sum())}


def poll(base_url: str, *, max_jobs: Optional[int] = None,
         period: float = 0.0, registry: Optional[dict] = None,
         run: Callable = run_job, max_transient: int = 5,
         backoff: float = 0.5) -> list:
    """The reference Poll loop: next → run → update, until the queue
    drains (next_job returns None) or ``max_jobs`` is hit. A job failure
    posts state=Failed with the error detail and the loop continues —
    one bad job must not stop the worker. A TRANSPORT failure reaching
    the tracker is retried with exponential backoff (``backoff``·2ⁿ, up
    to ``max_transient`` consecutive failures) — a fleet must not die on
    the first network blip while the tracker still holds queued jobs."""
    client = JobClient(base_url)
    done = []
    transient = 0
    while max_jobs is None or len(done) < max_jobs:
        try:
            job = client.next_job()
        except TrackerUnreachable as ex:
            transient += 1
            if transient > max_transient:
                print(f"[tracker] unreachable after {max_transient} "
                      f"retries, giving up: {ex}", flush=True)
                break
            time.sleep(backoff * (2 ** (transient - 1)))
            continue
        transient = 0
        if job is None:
            break
        client.update(job["id"], PARSING, "starting tasks")
        try:
            result = run(job, client, registry=registry)
        except Exception as ex:  # noqa: BLE001 — job isolation
            client.update(job["id"], FAILED, str(ex))
            done.append({"id": job["id"], "error": str(ex)})
        else:
            client.update(job["id"], PARSE_COMPLETE, "")
            done.append({"id": job["id"], **result})
        if period:
            time.sleep(period)
    return done
