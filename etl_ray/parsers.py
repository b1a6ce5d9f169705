"""Parser framework: the user-extension surface for new datatypes.

Mirrors the reference's plugin point (etl.Parser interface,
/root/reference/etl/etl.go:119-147; registry dispatch parser/parser.go:89-112;
config-as-data registries etl/globals.go:270-302):

  * ``Parser`` protocol: ``is_parsable(name) -> (kind, bool)`` — a cheap
    filename predicate — and ``parse(meta, name, data) -> list[dict]``
    (one member may yield 0..N rows, like NDT5's S2C/C2S fan-out).
  * ``REGISTRY`` maps datatype → parser; ``dispatch`` routes archive members
    to the right parser inside a single vectorized map_batches stage.
  * Standard-columns convention (reference schema/ndt7_result.go:16-22):
    every emitted row gets ``id`` (deterministic synthetic uuid — the dedup
    key, parser/parser.go:157-176) and a ``parser`` lineage struct
    {version, time, archive, member} (schema/schema.go:15-24 ParseInfo).

Parse errors quarantine the member (reason string), mirroring the task
loop's per-file error accounting (task/task.go:146-162) and the >10%-failure
TaskError gate (etl/etl.go:116-117).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Tuple

import pyarrow as pa

from etl_ray.functions.keys import synthetic_uuid

PARSER_VERSION = "etl-ray-0.1"


class JsonlParser:
    """One JSON object per line → one row per line (1→N).

    The analog of tcpinfo/scamper JSONL parsing (parser/tcpinfo.go:119-207).
    """

    datatype = "jsonl"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, name.endswith((".jsonl", ".json"))

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        text = data.decode("utf-8")
        rows = []
        for i, line in enumerate(text.splitlines()):
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            if not isinstance(obj, dict):
                raise ValueError(f"line {i}: not an object")
            rows.append(obj)
        return rows


class KeyValueParser:
    """``key: value`` text files → one row per file.

    The analog of the NDT .meta file parser
    (/root/reference/parser/ndt_meta.go:21-217).
    """

    datatype = "meta"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, name.endswith(".meta")

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        row = {}
        for line in data.decode("utf-8").splitlines():
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            k = k.strip().replace(" ", "_").replace(".", "_")
            if k:
                row[k] = v.strip()
        return [row] if row else []


class TextStatsParser:
    """Plain-text member → one summary row (chars/words/lines).

    Stand-in for binary format parsers (pcap/web100) whose decode libraries
    live outside this environment; demonstrates the summary-row shape
    (reference parser/pcap.go:136-193 emits ID+metadata rows).
    """

    datatype = "text"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, name.endswith(".txt")

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        text = data.decode("utf-8", errors="replace")
        return [
            {
                "n_chars": len(text),
                "n_words": len(text.split()),
                "n_lines": text.count("\n") + (1 if text else 0),
            }
        ]


def _default_parsers():
    from etl_ray.pcaplite import PcapParser
    from etl_ray.scamper import Scamper1Parser
    from etl_ray.sidestream import SidestreamParser
    from etl_ray.snaplog import SnaplogParser

    # Scamper1 precedes the generic JsonlParser: it claims the narrower
    # ``*.tracelb.jsonl`` suffix (registry order is dispatch order)
    return (Scamper1Parser(), JsonlParser(), KeyValueParser(),
            TextStatsParser(), SidestreamParser(), SnaplogParser(),
            PcapParser())


REGISTRY: Dict[str, object] = {p.datatype: p for p in _default_parsers()}


def register(parser) -> None:
    REGISTRY[parser.datatype] = parser


def classify(name: str, registry: Optional[dict] = None) -> Optional[str]:
    """First registered parser claiming the member (IsParsable dispatch).
    Compression suffixes are transparent: the archive source has already
    decoded ``.gz``/``.zst`` members, so ``x.web100.zst`` dispatches as
    ``x.web100``."""
    for ext in (".gz", ".zst"):
        if name.endswith(ext):
            name = name[: -len(ext)]
    for datatype, p in (registry or REGISTRY).items():
        _, ok = p.is_parsable(name)
        if ok:
            return datatype
    return None


class ParseMembers:
    """map_batches stage over archive-member rows → parsed rows.

    Output: one JSON-encoded payload column (heterogeneous datatypes share a
    stage) + standard columns {id, datatype, archive, member, parser_version,
    error}. Callers filter by datatype and re-expand payloads to typed
    columns with ``rows_to_table``.
    """

    def __init__(self, registry: Optional[dict] = None):
        # snapshot: the registry ships WITH the stage (driver-side register()
        # calls would otherwise be invisible to worker processes, which
        # import this module fresh)
        self.registry = dict(registry or REGISTRY)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "id": [], "datatype": [], "archive": [], "member": [],
            "parser_version": [], "payload": [], "error": [],
        }
        for row in batch.to_pylist():
            if row.get("skipped"):
                self._emit(out, row, None, None, f"skipped: {row['skipped']}")
                continue
            datatype = classify(row["member"], self.registry)
            if datatype is None:
                self._emit(out, row, None, None, "no parser")
                continue
            parser = self.registry[datatype]
            meta = {"archive": row["archive"], "member": row["member"]}
            try:
                parsed = parser.parse(meta, row["member"], row["data"])
            except Exception as ex:  # quarantine, never crash the task
                self._emit(out, row, datatype, None, f"parse error: {ex}")
                continue
            if not parsed:
                self._emit(out, row, datatype, None, "empty test")
                continue
            for i, payload in enumerate(parsed):
                out["id"].append(
                    synthetic_uuid(row["archive"], row["member"], i))
                out["datatype"].append(datatype)
                out["archive"].append(row["archive"])
                out["member"].append(row["member"])
                out["parser_version"].append(PARSER_VERSION)
                out["payload"].append(json.dumps(payload, sort_keys=True))
                out["error"].append(None)
        return pa.table(
            {
                "id": pa.array(out["id"], pa.string()),
                "datatype": pa.array(out["datatype"], pa.string()),
                "archive": pa.array(out["archive"], pa.string()),
                "member": pa.array(out["member"], pa.string()),
                "parser_version": pa.array(out["parser_version"], pa.string()),
                "payload": pa.array(out["payload"], pa.string()),
                "error": pa.array(out["error"], pa.string()),
            }
        )

    @staticmethod
    def _emit(out, row, datatype, payload, error):
        out["id"].append(synthetic_uuid(row["archive"], row["member"], -1))
        out["datatype"].append(datatype)
        out["archive"].append(row["archive"])
        out["member"].append(row["member"])
        out["parser_version"].append(PARSER_VERSION)
        out["payload"].append(payload)
        out["error"].append(error)


def rows_to_table(payloads: List[str]) -> pa.Table:
    """JSON payload strings → typed Arrow table (schema inferred, like the
    reference's reflection-based InferSchema, schema/ndt7_result.go:35-46)."""
    return pa.Table.from_pylist([json.loads(p) for p in payloads])


def parse_archives(root_or_paths, registry: Optional[dict] = None,
                   **read_kwargs):
    """End-to-end: archives → members → parsed standard-column rows."""
    from etl_ray.sources.archive import read_archives

    members = read_archives(root_or_paths, **read_kwargs)
    return members.map_batches(ParseMembers(registry),
                               batch_format="pyarrow")
