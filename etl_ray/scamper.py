"""Scamper1 tracelb parser: nested traceroute JSON → restructured hop rows.

The reference's scamper1 datatype (/root/reference/parser/scamper1.go): a
``.jsonl`` test file carries four lines — metadata, cycle-start, tracelb,
cycle-stop. The parse restructures ``tracelb.nodes`` (scamper1.go:44-91),
attaching to every node a ``hop_id`` manufactured from the cycle-start time,
hostname and node address (parser.go:77-87 GetHopID) — the join key for hop
annotations. Rows over the 90 MB sink limit are rejected up front
(scamper1.go:22-25,107-111).

Engine shape: one member → 1 trace + N hop rows (flattened here: one row per
node with the trace-level fields repeated — the columnar-friendly layout).
"""

from __future__ import annotations

import json
from typing import List, Tuple

from etl_ray.functions.keys import hop_id

MAX_ROW_BYTES = 90_000_000  # BQ 100 MB minus JSON headroom (scamper1.go:22)


class Scamper1Parser:
    """Registry parser for ``*.tracelb.jsonl`` members (the generic
    JsonlParser keeps plain ``.jsonl``)."""

    datatype = "scamper1"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, name.endswith(".tracelb.jsonl")

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        if len(data) > MAX_ROW_BYTES:
            raise ValueError("row size too big")
        lines = [ln for ln in data.decode("utf-8").splitlines() if ln.strip()]
        if len(lines) != 4:
            raise ValueError(f"expected 4 jsonl lines, got {len(lines)}")
        _meta, cycle_start, tracelb, cycle_stop = (json.loads(ln)
                                                   for ln in lines)
        if cycle_start.get("type") != "cycle-start":
            raise ValueError("missing cycle-start line")
        if cycle_stop.get("type") != "cycle-stop":
            raise ValueError("missing cycle-stop line")
        start_time = float(cycle_start["start_time"])
        hostname = cycle_start.get("hostname", "")
        rows = []
        for node in tracelb.get("nodes", []):
            rows.append({
                "hop_id": hop_id(start_time, hostname, node.get("addr", "")),
                "addr": node.get("addr"),
                "name": node.get("name"),
                "q_ttl": node.get("q_ttl"),
                "linkc": node.get("linkc"),
                "src": tracelb.get("src"),
                "dst": tracelb.get("dst"),
                "probe_size": tracelb.get("probe_size"),
                "probec": tracelb.get("probec"),
                "nodec": tracelb.get("nodec"),
                "hostname": hostname,
                "cycle_start_time": int(start_time),
            })
        return rows
