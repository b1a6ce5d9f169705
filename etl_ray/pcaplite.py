"""PCAP binary packet decode (libpcap classic format, public spec).

The packet-header capability class from the reference
(/root/reference/parser/pcap.go:40-109): read the pcap global header
(either endianness, µs or ns magic), walk the fixed 16-byte record headers,
and decode Ethernet → IPv4/IPv6 for each packet (src/dst IP, TTL/hop-limit,
IP payload length — the same fields GetIP extracts). The reference emits one
summary row per capture (packet count + duration + first-packet alpha,
pcap.go:150-193); ``summarize_pcap`` mirrors that shape.

Decode strategy: one pass over the record headers discovers the (variable)
packet offsets; every FIELD decode is then a vectorized numpy gather over a
single uint8 view — no per-packet struct unpacking of IP fields.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

MAGIC_US = 0xA1B2C3D4
MAGIC_NS = 0xA1B23C4D
GLOBAL_HEADER_LEN = 24
REC_HEADER_LEN = 16
ETH_LEN = 14
ETHERTYPE_IPV4 = 0x0800
ETHERTYPE_IPV6 = 0x86DD


def write_pcap(packets: List[Tuple[int, int, bytes]], *,
               snaplen: int = 65535, nanos: bool = False) -> bytes:
    """Serialize (ts_sec, ts_frac, frame_bytes) packets (fixture/bench
    generator), little-endian classic pcap."""
    magic = MAGIC_NS if nanos else MAGIC_US
    out = [struct.pack("<IHHiIII", magic, 2, 4, 0, 0, snaplen, 1)]
    for ts_sec, ts_frac, frame in packets:
        out.append(struct.pack("<IIII", ts_sec, ts_frac, len(frame),
                               len(frame)))
        out.append(frame)
    return b"".join(out)


def ipv4_frame(src: str, dst: str, *, ttl: int, payload: bytes,
               proto: int = 6) -> bytes:
    """Minimal Ethernet+IPv4 frame for fixtures."""
    total = 20 + len(payload)
    ip = struct.pack(">BBHHHBBH4s4s", 0x45, 0, total, 0, 0, ttl, proto, 0,
                     bytes(int(x) for x in src.split(".")),
                     bytes(int(x) for x in dst.split(".")))
    eth = b"\x02\x00\x00\x00\x00\x01\x02\x00\x00\x00\x00\x02" \
        + struct.pack(">H", ETHERTYPE_IPV4)
    return eth + ip + payload


def decode_pcap(data: bytes) -> Dict[str, np.ndarray]:
    """pcap bytes → per-packet column arrays. Raises ValueError on a bad
    magic / truncated capture (the member quarantines upstream)."""
    if len(data) < GLOBAL_HEADER_LEN:
        raise ValueError("truncated pcap global header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic in (MAGIC_US, MAGIC_NS):
        endian = "<"
    else:
        (magic,) = struct.unpack_from(">I", data, 0)
        if magic in (MAGIC_US, MAGIC_NS):
            endian = ">"
        else:
            raise ValueError("bad pcap magic")
    nanos = magic == MAGIC_NS

    # pass 1: record-header walk (variable-length packets → offset list)
    off = GLOBAL_HEADER_LEN
    ts_sec, ts_frac, incl, pkt_off = [], [], [], []
    unpack = struct.Struct(endian + "IIII").unpack_from
    n_bytes = len(data)
    while off + REC_HEADER_LEN <= n_bytes:
        s, f, inc, _orig = unpack(data, off)
        if off + REC_HEADER_LEN + inc > n_bytes:
            raise ValueError("truncated packet record")
        ts_sec.append(s)
        ts_frac.append(f)
        incl.append(inc)
        pkt_off.append(off + REC_HEADER_LEN)
        off += REC_HEADER_LEN + inc
    if off != n_bytes:
        raise ValueError("trailing garbage after last record")

    n = len(pkt_off)
    b = np.frombuffer(data, dtype=np.uint8)
    offs = np.array(pkt_off, dtype=np.int64)
    incl_a = np.array(incl, dtype=np.int64)
    out: Dict[str, np.ndarray] = {
        "ts_sec": np.array(ts_sec, dtype=np.int64),
        "ts_usec": np.array(ts_frac, dtype=np.int64) // (1000 if nanos else 1),
        "incl_len": incl_a,
    }
    src = np.full(n, None, dtype=object)
    dst = np.full(n, None, dtype=object)
    ttl = np.full(n, -1, dtype=np.int64)
    proto = np.full(n, -1, dtype=np.int64)
    payload_len = np.full(n, -1, dtype=np.int64)

    if n:
        has_eth = incl_a >= ETH_LEN
        etype = np.zeros(n, dtype=np.int64)
        eo = offs[has_eth]
        etype[has_eth] = b[eo + 12].astype(np.int64) * 256 + b[eo + 13]

        # vectorized IPv4 header gather (reference GetIP's v4 branch)
        v4 = has_eth & (etype == ETHERTYPE_IPV4) & (incl_a >= ETH_LEN + 20)
        io = offs[v4] + ETH_LEN
        if len(io):
            ihl = (b[io] & 0x0F).astype(np.int64)
            tot = b[io + 2].astype(np.int64) * 256 + b[io + 3]
            ttl[v4] = b[io + 8]
            proto[v4] = b[io + 9]
            payload_len[v4] = tot - 4 * ihl
            sb = b[io[:, None] + np.arange(12, 16)]
            db = b[io[:, None] + np.arange(16, 20)]
            src[v4] = [".".join(map(str, r)) for r in sb]
            dst[v4] = [".".join(map(str, r)) for r in db]

        # IPv6: hop limit + payload length (reference GetIP's v6 branch)
        v6 = has_eth & (etype == ETHERTYPE_IPV6) & (incl_a >= ETH_LEN + 40)
        io6 = offs[v6] + ETH_LEN
        if len(io6):
            payload_len[v6] = b[io6 + 4].astype(np.int64) * 256 + b[io6 + 5]
            proto[v6] = b[io6 + 6]
            ttl[v6] = b[io6 + 7]
            import socket

            sv = b[io6[:, None] + np.arange(8, 24)]
            dv = b[io6[:, None] + np.arange(24, 40)]
            src[v6] = [socket.inet_ntop(socket.AF_INET6, r.tobytes())
                       for r in sv]
            dst[v6] = [socket.inet_ntop(socket.AF_INET6, r.tobytes())
                       for r in dv]

    out["src_ip"] = src
    out["dst_ip"] = dst
    out["ttl"] = ttl
    out["proto"] = proto
    out["ip_payload_len"] = payload_len
    return out


def summarize_pcap(data: bytes) -> dict:
    """One summary row per capture: packet count, duration, first-packet
    alpha (reference parser/pcap.go:150-193 row shape)."""
    cols = decode_pcap(data)
    n = len(cols["ts_sec"])
    if n == 0:
        return {"n_packets": 0, "duration_us": 0, "src_ip": None,
                "dst_ip": None, "ttl": None, "ip_payload_len": None}
    t_us = cols["ts_sec"] * 1_000_000 + cols["ts_usec"]
    return {
        "n_packets": int(n),
        "duration_us": int(t_us.max() - t_us.min()),
        "src_ip": cols["src_ip"][0],
        "dst_ip": cols["dst_ip"][0],
        "ttl": int(cols["ttl"][0]),
        "ip_payload_len": int(cols["ip_payload_len"][0]),
    }


class PcapParser:
    """Registry parser: ``.pcap`` members → one summary row per capture."""

    datatype = "pcap"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, name.endswith(".pcap")

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        return [summarize_pcap(data)]


class PcapPacketDecoder:
    """map_batches stage over archive-member rows → one row per PACKET
    (Arrow path; no JSON)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            if row.get("skipped"):
                continue
            try:
                cols = decode_pcap(row["data"])
            except ValueError:
                continue
            n = len(cols["ts_sec"])
            t = pa.table({
                "member": pa.array([row["member"]] * n),
                "packet_index": pa.array(np.arange(n, dtype=np.int64)),
                "ts_sec": pa.array(cols["ts_sec"]),
                "ts_usec": pa.array(cols["ts_usec"]),
                "src_ip": pa.array(cols["src_ip"], pa.string()),
                "dst_ip": pa.array(cols["dst_ip"], pa.string()),
                "ttl": pa.array(cols["ttl"]),
                "proto": pa.array(cols["proto"]),
                "ip_payload_len": pa.array(cols["ip_payload_len"]),
            })
            outs.append(t)
        if not outs:
            # full output schema at zero rows: an all-corrupt/all-skipped
            # batch must stay non-fatal for downstream column projections
            # (ADVICE r02)
            return pa.schema([
                ("member", pa.string()), ("packet_index", pa.int64()),
                ("ts_sec", pa.int64()), ("ts_usec", pa.int64()),
                ("src_ip", pa.string()), ("dst_ip", pa.string()),
                ("ttl", pa.int64()), ("proto", pa.int64()),
                ("ip_payload_len", pa.int64()),
            ]).empty_table()
        return pa.concat_tables(outs)
