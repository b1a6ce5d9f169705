"""Path-metadata extraction — the analog of the reference's DataPath /
ValidateTestPath archive-URI parsing (/root/reference/etl/globals.go:43-163)
and CreateTestId (parser/pt.go:543-553), plus filename time extraction
(parser/pt.go:34-51, parser/ss.go:43-56, parser/ndt.go:60-115).

In the CDC engine the unit of work is a WAL segment, but the same
capability — derive partition/date/host metadata from a path with a strict
regex, rejecting invalid names — applies to ingesting archive-shaped
corpora into the lake.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Optional

# <prefix>/<experiment>/<datatype>/YYYY/MM/DD/<archive-name>.(tgz|tar|tar.gz)
_ARCHIVE_RE = re.compile(
    r"^(?:gs://|file://)?(?P<bucket>[^/]*)/+"
    r"(?P<experiment>[a-z0-9-]+)/(?P<datatype>[a-z0-9_-]+)/"
    r"(?P<year>\d{4})/(?P<month>\d{2})/(?P<day>\d{2})/"
    r"(?P<name>[^/]+)\.(?P<ext>tgz|tar|tar\.gz)$"
)

# 20170509T13:45:13.590210000Z_eb.measurementlab.net:44160
_LOGTIME_RE = re.compile(
    r"(\d{4})(\d{2})(\d{2})T(\d{2}):?(\d{2}):?(\d{2})"
)


@dataclass(frozen=True)
class DataPath:
    bucket: str
    experiment: str
    datatype: str
    date: str  # YYYY-MM-DD
    name: str

    @property
    def partition_date(self) -> str:
        return self.date


def parse_archive_path(path: str) -> Optional[DataPath]:
    """Strict parse; returns None on invalid (reference rejects with an
    error and the task is not retried)."""
    m = _ARCHIVE_RE.match(path)
    if not m:
        return None
    return DataPath(
        bucket=m.group("bucket"),
        experiment=m.group("experiment"),
        datatype=m.group("datatype"),
        date=f"{m.group('year')}-{m.group('month')}-{m.group('day')}",
        name=m.group("name"),
    )


def extract_logtime(filename: str) -> Optional[datetime]:
    """Timestamp embedded in a test filename (reference GetLogtime)."""
    m = _LOGTIME_RE.search(filename)
    if not m:
        return None
    y, mo, d, h, mi, s = (int(g) for g in m.groups())
    try:
        return datetime(y, mo, d, h, mi, s, tzinfo=timezone.utc)
    except ValueError:
        return None


def create_test_id(date: str, host: str, basename: str) -> str:
    """``YYYY/MM/DD/host/basename.gz`` rewrite (reference CreateTestId)."""
    y, m, d = date.split("-")
    base = basename if basename.endswith(".gz") else basename + ".gz"
    return f"{y}/{m}/{d}/{host}/{base}"


def get_filename(filename: str) -> str:
    """Queue-message → archive URI (reference etl/globals.go:377-394).

    Task-queue front-ends may base64-encode the payload: accept a plain
    URI (any pyarrow.fs scheme, or an absolute local path — the engine is
    URI-transparent where the reference is gs://-only), else try base64
    and require the decoded text to be a URI/path. Raises ValueError on
    anything else, mirroring the reference's error-and-don't-retry."""
    import base64

    def is_uri(s: str) -> bool:
        return "://" in s or s.startswith("/")

    if is_uri(filename):
        return filename
    try:
        decoded = base64.b64decode(filename, validate=True).decode()
    except Exception:
        raise ValueError(f"invalid file path: {filename}")
    if is_uri(decoded):
        return decoded
    raise ValueError(f"invalid base64 encoded file path: {decoded}")
