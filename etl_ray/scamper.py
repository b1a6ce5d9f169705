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
import re
from typing import List, Tuple

from etl_ray.functions.keys import hop_id

MAX_ROW_BYTES = 90_000_000  # BQ 100 MB minus JSON headroom (scamper1.go:22)


def _repair_json(text: str) -> str:
    """JSON-superset → JSON: strip // and /* */ comments, convert
    single-quoted strings, drop trailing commas — all via one
    string-aware scan — then quote bare object keys. The grammar is the
    useful subset of what jsonnet tolerates (the reference re-evaluates
    malformed early-scamper output through a jsonnet VM,
    parser/pt.go:236-248)."""
    out = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':  # pass a double-quoted string through verbatim
            out.append(c)
            i += 1
            while i < n:
                out.append(text[i])
                if text[i] == "\\" and i + 1 < n:
                    out.append(text[i + 1])
                    i += 2
                    continue
                if text[i] == '"':
                    i += 1
                    break
                i += 1
            continue
        if c == "'":  # single-quoted string → double-quoted
            i += 1
            buf = []
            esc = {"'": "'", '"': '"', "\\": "\\", "/": "/", "n": "\n",
                   "t": "\t", "r": "\r", "b": "\b", "f": "\f"}
            while i < n and text[i] != "'":
                if text[i] == "\\" and i + 1 < n:
                    # decode standard JSON escapes (not just \') so the
                    # repaired payload carries the real character —
                    # json.dumps below re-escapes it correctly; jsonnet
                    # would likewise produce the decoded char
                    nxt = text[i + 1]
                    if nxt in esc:
                        buf.append(esc[nxt])
                        i += 2
                        continue
                    if nxt == "u" and i + 5 < n:
                        try:
                            buf.append(chr(int(text[i + 2:i + 6], 16)))
                            i += 6
                            continue
                        except ValueError:
                            pass
                    buf.append(text[i] + nxt)  # unknown escape: verbatim
                    i += 2
                    continue
                buf.append(text[i])
                i += 1
            i += 1
            out.append(json.dumps("".join(buf)))
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "*":
            i += 2
            while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                i += 1
            i += 2
            continue
        if c == ",":
            j = i + 1
            while j < n and text[j] in " \t\r\n":
                j += 1
            if j < n and text[j] in "}]":
                i += 1  # trailing comma
                continue
        out.append(c)
        i += 1
    s = "".join(out)
    # bare object keys → quoted (strings are already normalized above;
    # a pathological string VALUE containing '{key:' could be touched,
    # but the failure mode is load-failure → quarantine, same as today)
    return re.sub(r'([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)(\s*:)', r'\1"\2"\3', s)


def tolerant_json_loads(text: str):
    """json.loads with a one-shot grammar repair on failure
    (reference pt.go:236-248). Raises json.JSONDecodeError when even the
    repaired text does not parse — callers quarantine."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        return json.loads(_repair_json(text))


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
        _meta = json.loads(lines[0])
        cycle_start = json.loads(lines[1])
        # the tracelb line is the one early scamper emitted with grammar
        # errors; repair it like the reference's jsonnet pass
        # (pt.go:236-248) instead of quarantining the whole member
        tracelb = tolerant_json_loads(lines[2])
        cycle_stop = json.loads(lines[3])
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
