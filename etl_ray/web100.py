"""REAL web100 snaplog binary format: self-describing header → vectorized
snapshot decode.

Layout (reference web100/web100.go:418-497; field tables 357-393; types
117-161; 17-byte IP encoding 199-212; connection spec 396-416)::

    <version line>\\n
    \\n
    /spec\\n
    <name offset type length>\\n ...     # dense: offset == running length
    \\n
    /read\\n
    <fields>\\n
    \\n
    /tune\\n
    <fields>
    \\x00----End-Of-Header---- -1 -1\\n
    <4-byte LE logTime> <32-byte NUL-padded group name ("read")>
    <16-byte connection spec: dstPort u16 _ dstAddr[4] srcPort u16 _ srcAddr[4]>
    ("----Begin-Snap-Data----\\n" + <read-record bytes>) * n

Decode strategy is the engine's, not the reference's: the /read field table
builds ONE numpy structured dtype and ``np.frombuffer`` views every
snapshot at once; only the (rare, few-per-record) IP/string fields take a
per-row pass. Legacy names are canonicalized through a tcp-kis.txt-format
rename dictionary (reference web100/parse.go:16-43) loadable from a file.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

BEGIN_SNAP_DATA = b"----Begin-Snap-Data----\n"
END_OF_HEADER = b"\x00----End-Of-Header---- -1 -1\n"
GROUPNAME_LEN = 32

# web100 type ids, in library order (web100/web100.go:117-133)
(T_INTEGER, T_INTEGER32, T_IPV4, T_COUNTER32, T_GAUGE32, T_UNSIGNED32,
 T_TIME_TICKS, T_COUNTER64, T_PORT, T_INET_ADDRESS, T_INET_ADDRESS_IPV6,
 T_STR32, T_OCTET) = range(13)

TYPE_SIZES = {T_INTEGER: 4, T_INTEGER32: 4, T_IPV4: 4, T_COUNTER32: 4,
              T_GAUGE32: 4, T_UNSIGNED32: 4, T_TIME_TICKS: 4,
              T_COUNTER64: 8, T_PORT: 2, T_INET_ADDRESS: 17,
              T_INET_ADDRESS_IPV6: 17, T_STR32: 32, T_OCTET: 1}

_NUMERIC_FMT = {T_INTEGER: "<u4", T_INTEGER32: "<u4", T_COUNTER32: "<u4",
                T_GAUGE32: "<u4", T_UNSIGNED32: "<u4", T_TIME_TICKS: "<u4",
                T_COUNTER64: "<u8", T_PORT: "<u2", T_OCTET: "u1"}

ADDRTYPE_IPV4, ADDRTYPE_IPV6 = 1, 2


def parse_tcp_kis(text: str) -> Dict[str, str]:
    """tcp-kis.txt → {legacy_name: canonical_name}
    (reference web100/parse.go:16-43): 'VariableName:' sets the preferred
    name; each following 'RenameFrom:' lists legacy aliases."""
    renames: Dict[str, str] = {}
    preferred = ""
    for line in text.split("\n"):
        fields = line.split()
        if len(fields) < 2:
            continue
        if fields[0] == "VariableName:":
            preferred = fields[1]
        elif fields[0] == "RenameFrom:":
            for legacy in fields[1:]:
                renames[legacy] = preferred
    return renames


def load_tcp_kis(path: str) -> Dict[str, str]:
    with open(path, encoding="utf-8") as f:
        return parse_tcp_kis(f.read())


@dataclass
class Variable:
    name: str
    offset: int
    type: int
    size: int


def _parse_field_line(line: str) -> Variable:
    parts = line.split()
    if len(parts) != 4:
        raise ValueError(f"bad field line: {line!r}")
    name, offset, typ, length = parts[0], int(parts[1]), int(parts[2]), \
        int(parts[3])
    if typ not in TYPE_SIZES:
        raise ValueError(f"invalid type field: {typ}")
    if length != TYPE_SIZES[typ]:
        raise ValueError(f"invalid length for {name} field: {length}")
    return Variable(name, offset, typ, length)


def _parse_fields(lines: List[bytes], i: int, preamble: bytes,
                  terminator: bytes) -> Tuple[List[Variable], int, int]:
    """One header section → (fields, record_length, next_line_index).
    Offsets must be dense (reference parseFields, web100.go:357-393)."""
    if i >= len(lines) or lines[i] != preamble:
        raise ValueError(f"expected preamble {preamble!r}")
    i += 1
    fields: List[Variable] = []
    length = 0
    while True:
        if i >= len(lines):
            raise ValueError("encountered EOF in header")
        line = lines[i]
        if line == terminator:
            return fields, length, i + 1
        if len(line) > 32 + 20 + 1:
            raise ValueError("corrupted header")
        v = _parse_field_line(line.decode("ascii"))
        if v.offset != length:
            raise ValueError(f"bad offset at {v.name}")
        fields.append(v)
        length += v.size
        i += 1


@dataclass
class SnapLogHeader:
    version: str
    log_time: int
    group_name: str
    read_fields: List[Variable]
    record_len: int  # including the BEGIN_SNAP_DATA preamble
    body_offset: int
    conn_spec: dict


def parse_header(data: bytes) -> SnapLogHeader:
    """Version + /spec + /read + /tune + logtime + group + connspec
    (reference NewSnapLog, web100.go:418-497)."""
    end = data.find(END_OF_HEADER)
    if end < 0:
        raise ValueError("no end-of-header marker")
    head = data[:end]
    lines = [ln + b"\n" for ln in head.split(b"\n")]
    if len(lines) < 3:
        raise ValueError("truncated header")
    version = lines[0].rstrip(b"\n").decode("utf-8", "replace")
    if lines[1] != b"\n":
        raise ValueError("expected empty line after version")
    _, _, i = _parse_fields(lines, 2, b"/spec\n", b"\n")
    read_fields, read_len, i = _parse_fields(lines, i, b"/read\n", b"\n")
    # /tune's terminator is the end-of-header marker itself (no leading
    # newline, web100.go:453-457) — head stops right before it, so the
    # section simply runs to the end of the split lines (last entry is the
    # leftover b"\n" from the final split)
    _parse_fields(lines[:-1] + [b""], i, b"/tune\n", b"")

    pos = end + len(END_OF_HEADER)
    if len(data) < pos + 4 + GROUPNAME_LEN + 16:
        raise ValueError("too few bytes for logTime/groupName/connSpec")
    log_time = int(np.frombuffer(data, "<u4", 1, pos)[0])
    pos += 4
    group = data[pos:pos + GROUPNAME_LEN].split(b"\x00", 1)[0].decode(
        "ascii", "replace")
    if group != "read":
        raise ValueError("only 'read' group is supported")
    pos += GROUPNAME_LEN
    cs = data[pos:pos + 16]
    conn_spec = {
        "remote_port": int(np.frombuffer(cs, "<u2", 1, 0)[0]),
        "remote_ip": ".".join(str(b) for b in cs[4:8]),
        "local_port": int(np.frombuffer(cs, "<u2", 1, 8)[0]),
        "local_ip": ".".join(str(b) for b in cs[12:16]),
    }
    pos += 16
    return SnapLogHeader(version, log_time, group, read_fields,
                         len(BEGIN_SNAP_DATA) + read_len, pos, conn_spec)


def _ips_from_17byte(raw: np.ndarray) -> List[Optional[str]]:
    """(n, 17) uint8 → dotted/compressed strings; byte 16 is the address
    type (reference IPFromBytes, web100.go:199-212)."""
    out: List[Optional[str]] = []
    for row in raw:
        at = row[16]
        if at == ADDRTYPE_IPV4:
            out.append(".".join(str(b) for b in row[:4]))
        elif at == ADDRTYPE_IPV6:
            out.append(str(ipaddress.IPv6Address(bytes(row[:16]))))
        else:
            out.append(None)
    return out


def decode_web100_snaplog(
    data: bytes,
    renames: Optional[Dict[str, str]] = None,
    max_snapshots: Optional[int] = 2800,
) -> Tuple[pa.Table, int]:
    """Real-format snaplog → (Arrow table of all snapshots, logtime).

    Numeric fields decode in ONE ``np.frombuffer`` structured view; IP /
    STR32 fields (a handful per record) take a per-row pass. Signed
    INTEGER/INTEGER32 reproduce the reference's exact convention
    (``val >= 0x7FFFFFFF → val - 2^32``, web100.go:236-242 — note the
    boundary value itself maps negative, faithfully kept). Deprecated
    ``_``-prefixed names are skipped; the rest canonicalize through
    ``renames`` (tcp-kis)."""
    hdr = parse_header(data)
    body = data[hdr.body_offset:]
    stride = hdr.record_len
    n = len(body) // stride  # SnapCount truncates a partial tail record
    if max_snapshots is not None and n > max_snapshots:
        n = max_snapshots
    body = body[: n * stride]

    live = [v for v in hdr.read_fields if not v.name.startswith("_")]
    renames = renames or {}
    pre = len(BEGIN_SNAP_DATA)

    numeric = [v for v in live if v.type in _NUMERIC_FMT]
    dtype = np.dtype({
        "names": [v.name for v in numeric] + ["__magic"],
        "formats": [_NUMERIC_FMT[v.type] for v in numeric]
        + [f"S{pre}"],
        "offsets": [pre + v.offset for v in numeric] + [0],
        "itemsize": stride,
    })
    rec = np.frombuffer(body, dtype=dtype)
    if n and not (rec["__magic"] == BEGIN_SNAP_DATA).all():
        raise ValueError("bad snapshot magic")

    cols: Dict[str, pa.Array] = {}
    for v in live:
        name = renames.get(v.name, v.name)
        if v.type in (T_INTEGER, T_INTEGER32):
            u = rec[v.name].astype(np.int64)
            cols[name] = pa.array(np.where(u >= 0x7FFFFFFF, u - 2**32, u))
        elif v.type in _NUMERIC_FMT:
            u = rec[v.name]
            # COUNTER64: Go converts via int64() — wraparound, not clamp
            cols[name] = pa.array(u.view(np.int64) if u.dtype == np.uint64
                                  else u.astype(np.int64))
        else:
            raw = np.frombuffer(body, np.uint8).reshape(n, stride)
            fld = raw[:, pre + v.offset: pre + v.offset + v.size]
            if v.type == T_IPV4:
                cols[name] = pa.array(
                    [".".join(str(b) for b in r) for r in fld], pa.string())
            elif v.type in (T_INET_ADDRESS, T_INET_ADDRESS_IPV6):
                cols[name] = pa.array(_ips_from_17byte(fld), pa.string())
            elif v.type == T_STR32:
                cols[name] = pa.array(
                    [bytes(r).split(b"\x00", 1)[0].decode("ascii", "replace")
                     for r in fld], pa.string())
    cols["snap_index"] = pa.array(np.arange(n, dtype=np.int64))
    return pa.table(cols), hdr.log_time


def write_web100_snaplog(fields: List[Tuple[str, int]],
                         columns: Dict[str, np.ndarray], *,
                         logtime: int,
                         version: str = "2.5.27 201001301335 net100",
                         conn_spec: Optional[dict] = None) -> bytes:
    """Serialize a REAL-format snaplog (test fixture / bench generator).
    ``fields`` is the /read layout in order as (name, web100_type_id);
    ``columns`` maps names to per-snapshot numeric values (numeric types
    only — enough to exercise the format; IP/STR32 fixtures pass raw
    bytes as uint8 (n, size) arrays)."""
    head = [version.encode() + b"\n", b"\n", b"/spec\n", b"\n"]
    offset = 0
    lines = [b"/read\n"]
    specs = []
    for name, typ in fields:
        size = TYPE_SIZES[typ]
        lines.append(f"{name} {offset} {typ} {size}\n".encode())
        specs.append((name, typ, offset, size))
        offset += size
    lines.append(b"\n")
    head += lines
    head.append(b"/tune\n")
    blob = b"".join(head) + END_OF_HEADER
    blob += np.uint32(logtime).tobytes()
    blob += b"read".ljust(GROUPNAME_LEN, b"\x00")
    cs = conn_spec or {"remote_port": 0, "remote_ip": "0.0.0.0",
                       "local_port": 0, "local_ip": "0.0.0.0"}
    csb = bytearray(16)
    csb[0:2] = np.uint16(cs["remote_port"]).tobytes()
    csb[4:8] = bytes(int(x) for x in cs["remote_ip"].split("."))
    csb[8:10] = np.uint16(cs["local_port"]).tobytes()
    csb[12:16] = bytes(int(x) for x in cs["local_ip"].split("."))
    blob += bytes(csb)

    n = len(next(iter(columns.values()))) if columns else 0
    rec = np.zeros((n, offset), dtype=np.uint8)
    for name, typ, off, size in specs:
        vals = np.asarray(columns[name])
        if typ in _NUMERIC_FMT and vals.ndim == 1:
            raw = vals.astype(_NUMERIC_FMT[typ]).view(np.uint8).reshape(
                n, size)
        else:
            raw = vals.astype(np.uint8).reshape(n, size)
        rec[:, off:off + size] = raw
    body = b"".join(BEGIN_SNAP_DATA + rec[i].tobytes() for i in range(n))
    return blob + body
