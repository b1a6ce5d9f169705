"""NDT test-group assembly: group archive members {c2s, s2c, meta} that
share a timestamp prefix, prefer ``.gz`` on name collisions, and enrich
snaplog rows from the ``.meta`` file.

Reference semantics (parser/ndt.go:210-309 grouping + collisions;
ndt.go:570-588 meta enrichment + data_direction; ndt.go:91-115 filename
parse; ndt_meta.go:32-33 direction constants):

  * a test filename is ``[yyyy/mm/dd/]yyyymmddThh:mm:ss.ff...Z_<addr>.<suffix>[.gz]``;
  * all files with the same timestamp belong to one test group;
  * on a c2s/s2c collision the ``.gz`` member wins (the unzipped twin may
    be incomplete); an unzipped file AFTER the zipped one is ignored;
  * the ``.meta`` member's key:value fields populate the connection spec
    of every snaplog row in the group; a group with no meta gets the
    ``no_meta`` anomaly instead;
  * c2s → data_direction=0, s2c → data_direction=1.

Ray-side shape: ``NdtArchiveGrouper`` is a per-ARCHIVE task (descriptor
rows in, group rows out) — the group key never crosses an archive
boundary in the reference either (one scraper tarball = one host+window),
so no shuffle is needed; each task holds only one archive's members.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from etl_ray.sources.archive import ArchiveReader

CLIENT_TO_SERVER = 0  # reference ndt_meta.go:32
SERVER_TO_CLIENT = 1

_STEM = (r"^(?:(?P<dir>\d{4}/\d{2}/\d{2})/)?"
         r"(?P<date>\d{8})T(?P<time>[012]\d:[0-6]\d:\d{2}\.\d{1,10})Z_"
         r"(?P<address>.*)\.(?P<suffix>[a-z2].*)")
# the gz pattern MUST be tried first: a greedy address otherwise swallows
# the real suffix and matches suffix='gz' (same order as the reference,
# ndt.go:93-98)
_GZ_NAME_RE = re.compile(_STEM + r"\.gz$")
_NAME_RE = re.compile(_STEM + r"$")


def parse_ndt_filename(name: str) -> Optional[dict]:
    """Filename → {date, time, timestamp, address, suffix, gz} or None
    (reference ParseNDTFileName, ndt.go:91-115)."""
    gz = True
    m = _GZ_NAME_RE.match(name)
    if not m:
        gz = False
        m = _NAME_RE.match(name)
    if not m:
        return None
    d = m.groupdict()
    return {
        "date": d["date"],
        "time": d["time"],
        "timestamp": f"{d['date']}T{d['time']}Z",
        "address": d["address"],
        "suffix": d["suffix"],
        "gz": gz,
    }


def _parse_meta(data: bytes) -> Dict[str, str]:
    """key:value meta file → dict (ndt_meta.go analog; shared shape with
    parsers.KeyValueParser)."""
    row: Dict[str, str] = {}
    for line in data.decode("utf-8", "replace").splitlines():
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        k = k.strip().replace(" ", "_").replace(".", "_")
        if k:
            row[k] = v.strip()
    return row


_GROUP_SCHEMA = pa.schema([
    ("archive", pa.string()),
    ("timestamp", pa.string()),
    ("member", pa.string()),
    ("direction", pa.int64()),       # 0=c2s, 1=s2c
    ("address", pa.string()),
    ("data", pa.binary()),
    ("no_meta", pa.bool_()),
    ("collision", pa.bool_()),       # a twin was dropped for this slot
    ("client_ip", pa.string()),      # from meta (null when absent)
    ("server_ip", pa.string()),
    ("client_os", pa.string()),
])


class _Slot:
    """One direction slot within a test group, with the reference's
    gz-preference collision rules (ndt.go:253-296)."""

    def __init__(self):
        self.name: Optional[str] = None
        self.data: Optional[bytes] = None
        self.collision = False

    def offer(self, name: str, data: bytes) -> None:
        if self.name is None:
            self.name, self.data = name, data
        elif self.name + ".gz" == name:
            # zipped twin arrives after unzipped: prefer the zipped one
            self.name, self.data = name, data
            self.collision = True
        elif self.name == name + ".gz":
            # unzipped twin after zipped: ignore it
            self.collision = True
        else:
            # unexpected same-timestamp collision: keep the first, flag it
            self.collision = True


class NdtArchiveGrouper:
    """map_batches stage over archive DESCRIPTOR rows (path) → one output
    row per kept snaplog member, meta-enriched. Use with
    ``descriptor_dataset([...]).map_batches(NdtArchiveGrouper(), batch_size=1)``.
    Members stream in tar order; groups flush when the timestamp changes
    (scrapers write tars in lexical=timestamp order, ndt.go:211-214) and at
    end-of-archive."""

    def __init__(self, max_member_bytes: int = 200 << 20):
        self.reader = ArchiveReader(max_member_bytes=max_member_bytes)

    def _flush(self, archive: str, ts: str, slots: Dict[str, _Slot],
               meta: Optional[Dict[str, str]], out: List[dict]) -> None:
        for suffix, direction in (("c2s_snaplog", CLIENT_TO_SERVER),
                                  ("s2c_snaplog", SERVER_TO_CLIENT)):
            slot = slots.get(suffix)
            if slot is None or slot.name is None:
                continue
            info = parse_ndt_filename(slot.name) or {}
            out.append({
                "archive": archive,
                "timestamp": ts,
                "member": slot.name,
                "direction": direction,
                "address": info.get("address"),
                "data": slot.data,
                "no_meta": meta is None,
                "collision": slot.collision,
                "client_ip": (meta or {}).get("client_ip"),
                "server_ip": (meta or {}).get("server_ip"),
                "client_os": (meta or {}).get("client_os"),
            })

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[dict] = []
        for path in batch["path"].to_pylist():
            ts: Optional[str] = None
            slots: Dict[str, _Slot] = {}
            meta: Optional[Dict[str, str]] = None
            for arch, member, _, data, skipped in self.reader._read_archive(
                    path):
                if skipped:
                    continue
                info = parse_ndt_filename(member)
                if info is None:
                    continue  # bad filename: counted upstream, non-fatal
                if info["timestamp"] != ts:
                    if ts is not None:
                        self._flush(path, ts, slots, meta, out)
                    ts, slots, meta = info["timestamp"], {}, None
                if info["suffix"] in ("c2s_snaplog", "s2c_snaplog"):
                    slots.setdefault(info["suffix"], _Slot()).offer(
                        member, data)
                elif info["suffix"] == "meta":
                    meta = _parse_meta(data)
                # other suffixes (cputime, ndttrace, ...) pass through the
                # registry parsers, not this grouper
            if ts is not None:
                self._flush(path, ts, slots, meta, out)
        if not out:
            return _GROUP_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=_GROUP_SCHEMA)


def group_ndt_archives(paths: List[str], **kwargs):
    """Dataset of meta-enriched snaplog group rows from NDT archives."""
    from etl_ray.sources.archive import descriptor_dataset

    ds = descriptor_dataset([{"path": p} for p in paths])
    return ds.map_batches(NdtArchiveGrouper(**kwargs),
                          batch_format="pyarrow", batch_size=1)
