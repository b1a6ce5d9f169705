"""Sidestream (SS) parser: self-describing ``K:``-header text → N typed rows.

The schema-on-read text capability class from the reference
(/root/reference/parser/ss.go:59-312):

  * line 1   ``K: cid PollTime LocalAddress LocalPort RemAddress RemPort
    StartTimeStamp StartTimeUsec <web100 vars...>`` declares the columns;
  * lines 2+ ``C: v1 v2 ...`` are one row each (1→N);
  * header names are canonicalized through a legacy→preferred rename
    dictionary (the reference loads tcp-kis.txt RenameFrom entries,
    web100/parse.go:16-43 — here config-as-data, extensible via
    ``CANONICAL_RENAMES``);
  * rows with a wrong field count are skipped as "corrupted content", rows
    with invalid local/remote IPs are skipped (parser/ss.go:266-279),
    ``:::`` IPv6 damage is repaired (web100/parse.go:74-90);
  * ``StartTimeStamp`` is combined with ``StartTimeUsec`` into microseconds
    (parser/ss.go:216-219);
  * the log time comes from the filename
    ``YYYYMMDDThh:mm:ssZ_<ip>_<n>.web100`` (parser/ss.go:39-56).

The per-file C-line parse is vectorized (pandas str.split → column frame →
to_numeric), not a Python loop per field.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd

from etl_ray.functions.netutil import is_valid_ip, normalize_ip

# legacy → canonical web100 variable renames (RFC 4898 naming). The reference
# ships the full tcp-kis.txt dictionary; this registry is the plug point —
# extend with CANONICAL_RENAMES.update(...) before building the pipeline.
CANONICAL_RENAMES = {
    "PktsOut": "SegsOut",
    "PktsIn": "SegsIn",
    "DataPktsOut": "DataSegsOut",
    "DataPktsIn": "DataSegsIn",
    "DataBytesOut": "DataOctetsOut",
    "DataBytesIn": "DataOctetsIn",
    "AckPktsOut": "AckSegsOut",
    "AckPktsIn": "AckSegsIn",
    "MaxRwinRcvd": "MaxRwndRcvd",
    "MaxRwinSent": "MaxRwndSent",
}

# columns carried as strings; everything else parses as int64 (the web100
# counter/gauge types all surface as integers in sidestream text)
STRING_FIELDS = {"LocalAddress", "RemAddress"}

# SideStream-specific fields that are not web100 variables (parser/ss.go:186)
SS_ONLY_FIELDS = ("cid", "PollTime")


def extract_ss_logtime(filename: str) -> int:
    """Epoch seconds from ``20170315T01:00:00Z_...web100`` names; raises on
    malformed names (the whole file is then quarantined)."""
    import os
    from datetime import datetime, timezone

    base = os.path.basename(filename)
    if len(base) < 19 or ".web100" not in base:
        raise ValueError("invalid sidestream filename")
    t = datetime.strptime(base[:17], "%Y%m%dT%H:%M:%S")
    return int(t.replace(tzinfo=timezone.utc).timestamp())


def parse_k_header(header: str) -> List[str]:
    parts = header.split(" ")
    if not parts or parts[0] != "K:":
        raise ValueError("corrupted header")
    return [CANONICAL_RENAMES.get(n, n) for n in parts[1:] if n]


def parse_ss_lines(body_lines: List[str], names: List[str]) -> Tuple[pd.DataFrame, int]:
    """Vectorized parse of ``C:`` rows → typed frame. Returns
    (frame, n_skipped). Skips wrong-arity lines and invalid-IP rows."""
    s = pd.Series(body_lines, dtype=object)
    s = s[s.str.len() > 0]
    if s.empty:
        return pd.DataFrame(columns=names), 0
    toks = s.str.split(" ")
    ok = (toks.str.len() == len(names) + 1) & (toks.str[0] == "C:")
    skipped = int((~ok).sum())
    toks = toks[ok]
    if toks.empty:
        return pd.DataFrame(columns=names), skipped
    frame = pd.DataFrame(toks.tolist()).iloc[:, 1:]
    frame.columns = names

    for col in names:
        if col in STRING_FIELDS:
            # repair ::: damage, canonicalize, then validate
            vals = frame[col].map(normalize_ip)
            frame[col] = vals
        else:
            frame[col] = pd.to_numeric(frame[col], errors="coerce")

    # rows with unparseable numerics are corrupted content
    num_cols = [c for c in names if c not in STRING_FIELDS]
    good = ~frame[num_cols].isna().any(axis=1)
    for col in ("LocalAddress", "RemAddress"):
        if col in frame.columns:
            good &= frame[col].map(is_valid_ip)
            good &= ~frame[col].isin(("0.0.0.0", "::"))
    skipped += int((~good).sum())
    frame = frame[good].reset_index(drop=True)
    for c in num_cols:
        frame[c] = frame[c].astype(np.int64)

    # StartTimeStamp (seconds) + StartTimeUsec → microseconds
    if "StartTimeStamp" in frame.columns and "StartTimeUsec" in frame.columns:
        frame["StartTimeStamp"] = (
            frame["StartTimeStamp"] * 1_000_000 + frame["StartTimeUsec"]
        )
        frame = frame.drop(columns=["StartTimeUsec"])
    return frame, skipped


class SidestreamParser:
    """Registry parser: ``.web100`` members → N typed rows; ``.tra`` trace
    companions are explicitly not parsed (reference IsParsable,
    parser/ss.go:225-234)."""

    datatype = "ss"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        if name.endswith(".web100"):
            return "web100", True
        if name.endswith(".tra"):
            return "trace", False
        return "unknown", False

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        log_time = extract_ss_logtime(name)
        lines = data.decode("utf-8").split("\n")
        if len(lines) < 2:
            raise ValueError("empty test file")
        names = parse_k_header(lines[0])
        frame, _skipped = parse_ss_lines(lines[1:], names)
        frame.insert(0, "test_id", name)
        frame.insert(1, "log_time", np.int64(log_time))
        # to_json→loads: native-typed records at C speed (to_dict would
        # hand numpy scalars to the framework's json encoder)
        import json

        return json.loads(frame.to_json(orient="records"))
