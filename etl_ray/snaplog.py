"""Snaplog analog: self-describing BINARY snapshot logs → typed columns +
per-snapshot deltas.

The web100 snaplog capability class from the reference
(/root/reference/web100/web100.go:164-497, parser/ndt.go:389-450): a file
whose HEADER declares the field table (name, offset, type) and whose body is
a stream of fixed-size binary snapshot records, each prefixed by a
``----Begin-Snap-Data----`` magic. The reference decodes field-by-field with
reflection (~10x faster than libweb100, web100/web100.go:73-77); this engine
goes further: the header builds ONE numpy structured dtype (with declared
offsets) and ``np.frombuffer`` decodes EVERY snapshot in a single vectorized
view — no per-field or per-snapshot Python.

Format (versioned, little-endian):

    SNAPLOG-ANALOG 1\\n
    logtime: <epoch seconds>\\n
    group: read\\n
    reclen: <packed field bytes per record>\\n
    field: <name> <offset> <type>\\n      # type in {i32,u32,u64,u16,u8}
    ----End-Of-Header----\\n
    (----Begin-Snap-Data----\\n + <reclen> packed bytes) * n_snapshots

Field names are canonicalized through the same legacy→preferred rename
dictionary as sidestream (tcp-kis.txt analog); names starting with ``_`` are
deprecated and skipped (web100/web100.go:219-222). The delta kernel mirrors
the NDT parser's snapshot-pair walk (parser/ndt.go:389-450) as one
``np.diff`` per field with group-boundary masking.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from etl_ray.sidestream import CANONICAL_RENAMES

MAGIC_HEADER = b"SNAPLOG-ANALOG 1\n"
END_OF_HEADER = b"----End-Of-Header----\n"
BEGIN_SNAP = b"----Begin-Snap-Data----\n"

TYPE_FORMATS = {"i32": "<i4", "u32": "<u4", "u64": "<u8", "u16": "<u2",
                "u8": "u1"}
TYPE_SIZES = {"i32": 4, "u32": 4, "u64": 8, "u16": 2, "u8": 1}


def write_snaplog(fields: List[Tuple[str, str]], columns: Dict[str, np.ndarray],
                  logtime: int) -> bytes:
    """Serialize snapshots (test fixture / bench generator). ``fields`` is
    the declared (name, type) layout in offset order; ``columns`` maps each
    name to its per-snapshot values."""
    offset = 0
    lines = [MAGIC_HEADER, f"logtime: {logtime}\n".encode(),
             b"group: read\n"]
    specs = []
    for name, typ in fields:
        specs.append((name, typ, offset))
        offset += TYPE_SIZES[typ]
    lines.insert(2, f"reclen: {offset}\n".encode())
    for name, typ, off in specs:
        lines.append(f"field: {name} {off} {typ}\n".encode())
    lines.append(END_OF_HEADER)

    n = len(next(iter(columns.values()))) if columns else 0
    dtype = np.dtype({
        "names": [s[0] for s in specs],
        "formats": [TYPE_FORMATS[s[1]] for s in specs],
        "offsets": [s[2] for s in specs],
        "itemsize": offset,
    })
    rec = np.zeros(n, dtype=dtype)
    for name, typ, _ in specs:
        rec[name] = columns[name]
    raw = rec.tobytes()
    body = b"".join(
        BEGIN_SNAP + raw[i * offset:(i + 1) * offset] for i in range(n)
    )
    return b"".join(lines) + body


# the reference caps snapshots parsed per log at 2800 (≈14 s of 5 ms polls)
# as an OOM/latency guard, parser/ndt.go:41-54
DEFAULT_MAX_SNAPSHOTS = 2800


def decode_snaplog(data: bytes,
                   max_snapshots: int = DEFAULT_MAX_SNAPSHOTS
                   ) -> Tuple[pa.Table, int]:
    """Binary snaplog → (Arrow table of all snapshots, logtime). One
    np.frombuffer over the whole body; magic verified vectorized. Records
    beyond ``max_snapshots`` are truncated (the reference's snapshot cap).

    Dispatches on the header: the engine-native ``SNAPLOG-ANALOG`` layout
    decodes here; anything else is treated as the REAL web100 snaplog
    format (version line + /spec /read /tune field tables,
    reference web100/web100.go:418-497) via ``etl_ray.web100`` — with the
    sidestream rename dictionary applied, so both formats surface the same
    canonical column names."""
    if not data.startswith(MAGIC_HEADER):
        from etl_ray.web100 import decode_web100_snaplog

        return decode_web100_snaplog(data, renames=CANONICAL_RENAMES,
                                     max_snapshots=max_snapshots)
    end = data.find(END_OF_HEADER)
    if end < 0:
        raise ValueError("truncated header")
    header = data[len(MAGIC_HEADER):end].decode("utf-8")
    body = data[end + len(END_OF_HEADER):]

    logtime, reclen = 0, -1
    specs: List[Tuple[str, str, int]] = []
    for line in header.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "logtime:":
            logtime = int(parts[1])
        elif parts[0] == "reclen:":
            reclen = int(parts[1])
        elif parts[0] == "field:":
            name, off, typ = parts[1], int(parts[2]), parts[3]
            if typ not in TYPE_FORMATS:
                raise ValueError(f"invalid type field: {typ}")
            specs.append((name, typ, off))
    if reclen <= 0 or not specs:
        raise ValueError("empty field table")
    for name, typ, off in specs:
        if off + TYPE_SIZES[typ] > reclen:
            raise ValueError(f"field {name} overruns record")

    stride = len(BEGIN_SNAP) + reclen
    if len(body) % stride != 0:
        raise ValueError("corrupted body (not a whole number of records)")
    n = len(body) // stride
    if max_snapshots is not None and n > max_snapshots:
        n = max_snapshots
        body = body[: n * stride]

    # skip deprecated fields; canonicalize the rest (web100/web100.go:219-233)
    live = [(CANONICAL_RENAMES.get(nm, nm), ty, off) for nm, ty, off in specs
            if not nm.startswith("_")]
    dtype = np.dtype({
        "names": [s[0] for s in live] + ["__magic"],
        "formats": [TYPE_FORMATS[s[1]] for s in live]
        + [f"S{len(BEGIN_SNAP)}"],
        "offsets": [len(BEGIN_SNAP) + s[2] for s in live] + [0],
        "itemsize": stride,
    })
    rec = np.frombuffer(body, dtype=dtype)
    if n and not (rec["__magic"] == BEGIN_SNAP).all():
        raise ValueError("bad snapshot magic")
    cols = {nm: pa.array(rec[nm].astype(np.int64))
            for nm, _, _ in live}
    cols["snap_index"] = pa.array(np.arange(n, dtype=np.int64))
    return pa.table(cols), logtime


def delta_columns(table: pa.Table, fields: List[str],
                  group_starts: np.ndarray = None) -> pa.Table:
    """Append ``d_<field>`` = field - previous-snapshot field (null at each
    group start). Vectorized: one np.diff per field; ``group_starts`` marks
    rows that begin a new connection (default: only row 0)."""
    n = len(table)
    first = np.zeros(n, dtype=bool)
    if n:
        first[0] = True
    if group_starts is not None:
        first |= group_starts
    for f in fields:
        v = table[f].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.empty(n, dtype=np.int64)
        if n:
            d[0] = 0
            d[1:] = np.diff(v)
        table = table.append_column(
            f"d_{f}", pa.array(np.ma.masked_array(d, mask=first)))
    return table


class SnaplogParser:
    """Registry parser: ``.snaplog`` members → one row per snapshot (JSON
    payload framework path; the high-throughput Arrow path is
    ``SnaplogDecoder``)."""

    datatype = "snaplog"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, name.endswith(".snaplog")

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        import json

        table, logtime = decode_snaplog(data)
        frame = table.to_pandas()
        frame.insert(0, "log_time", np.int64(logtime))
        return json.loads(frame.to_json(orient="records"))


class SnaplogDecoder:
    """map_batches stage over archive-member rows → typed snapshot rows with
    per-connection deltas (zero JSON; one Arrow table per member, concat per
    batch). Each member is one connection, so deltas reset per member."""

    def __init__(self, delta_fields: List[str] = None):
        self.delta_fields = delta_fields or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            if row.get("skipped"):
                continue
            try:
                t, logtime = decode_snaplog(row["data"])
            except (ValueError, UnicodeDecodeError):
                continue  # corrupted member: counted upstream, never fatal
            t = t.append_column(
                "member", pa.array([row["member"]] * len(t)))
            t = t.append_column(
                "log_time", pa.array(np.full(len(t), logtime, np.int64)))
            fields = [f for f in self.delta_fields if f in t.column_names]
            outs.append(delta_columns(t, fields))
        if not outs:
            # full output schema at zero rows so an all-corrupt batch stays
            # non-fatal for downstream projections (ADVICE r02). The live
            # field set is header-driven; with no decodable header we emit
            # the control columns plus the requested delta fields — the
            # columns any downstream of THIS decoder instance selects.
            names = ["member", "log_time", "snap_index", "SnapTimeStamp"]
            for f in self.delta_fields:
                if f not in names:
                    names.append(f)
                names.append(f"d_{f}")
            return pa.schema([
                (n_, pa.string() if n_ == "member" else pa.int64())
                for n_ in names
            ]).empty_table()
        return pa.concat_tables(outs, promote_options="default")
