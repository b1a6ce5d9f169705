"""Deterministic key / id functions.

The reference manufactures deterministic row keys so the downstream system
can dedup and join (synthetic UUIDs: /root/reference/parser/parser.go:150-176;
HopID: parser/parser.go:77-87). Here the same role is played by the upsert
key and by content hashes used for dedup; md5-hex variants are reproducible
in ANSI SQL (DuckDB ``md5()``), which the driver's oracle checks rely on.
"""

from __future__ import annotations

import base64
import hashlib
from datetime import datetime, timezone
from typing import Iterable, List

import numpy as np


def base64hash(value: str) -> str:
    """md5 → urlsafe base64 (reference parser.go:152-155)."""
    h = hashlib.md5(value.encode("utf-8")).digest()
    return base64.urlsafe_b64encode(h).decode().rstrip("=")


def md5_hex(value: str) -> str:
    return hashlib.md5(value.encode("utf-8")).hexdigest()


def md5_hex_array(values: Iterable) -> List[str]:
    """Vectorized-ish md5 hex over a column (used for exact dedup and
    synthetic ids; equals DuckDB ``md5(x)``)."""
    return [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in values]


def synthetic_uuid(*fields) -> str:
    """Deterministic key from identifying fields — 'the same fields used by
    dedup' (reference parser.go:157-176). Joined with '|' then md5-hex."""
    return md5_hex("|".join(str(f) for f in fields))


def hop_id(cycle_start_unix: float, hostname: str, addr: str) -> str:
    """``YYYYMMDD_host_addr`` from a cycle start time
    (reference parser/parser.go:83-87, scamper1.go:80-89)."""
    d = datetime.fromtimestamp(cycle_start_unix, tz=timezone.utc)
    return f"{d.strftime('%Y%m%d')}_{hostname}_{addr}"


def bucket_of_md5(values: Iterable, num_buckets: int) -> np.ndarray:
    """Partition bucket from the first 8 hex chars of md5 — reproducible in
    DuckDB: ``CAST(('0x' || substr(md5(x),1,8)) AS BIGINT) % B``."""
    vals = [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % num_buckets
            for v in values]
    return np.asarray(vals, dtype=np.int64)
