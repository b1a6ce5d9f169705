"""Changelog (WAL) segment discovery.

The analog of the reference's job/prefix listing with regex filter and
skip-count sampling (/root/reference/active/active.go:44-54,167-203,
etl/globals.go:326-330): list segment files, keep those strictly after the
manifest's global watermark, optionally sample every (skip+1)-th.

Discovery is driver-side (hybrid scout-then-pipeline): the work-list is tiny
(one path per segment); the data itself is only ever read by distributed
``ray.data.read_parquet`` tasks.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import List, Optional

import pyarrow.parquet as pq

SEGMENT_RE = re.compile(r"^seg-(\d+)\.parquet$")


@dataclass(frozen=True)
class Segment:
    path: str
    number: int


def list_segments(wal_dir: str, *, after: int = -1,
                  skip_count: int = 0,
                  name_filter: Optional[str] = None,
                  limit: Optional[int] = None) -> List[Segment]:
    """Segments with number > ``after``, in order. ``skip_count`` keeps every
    (skip_count+1)-th segment (sampling relief valve); ``name_filter`` is an
    optional regex over file names (reference job filter)."""
    pat = re.compile(name_filter) if name_filter else None
    segs = []
    for fn in sorted(os.listdir(wal_dir)):
        m = SEGMENT_RE.match(fn)
        if not m:
            continue
        if pat and not pat.search(fn):
            continue
        num = int(m.group(1))
        if num <= after:
            continue
        segs.append(Segment(os.path.join(wal_dir, fn), num))
    if skip_count > 0:
        segs = segs[:: skip_count + 1]
    if limit is not None:
        segs = segs[:limit]
    return segs


def segments_schema(paths: List[str]):
    """Promoted Arrow schema across segment footers (footer-only reads —
    cheap; no data IO). Drives schema evolution before the pipeline runs."""
    from etl_ray.schema import promote_all

    return promote_all(pq.read_schema(p) for p in paths)
