"""Legacy paris-traceroute ``.paris`` text parser.

The reference's biggest single parser (reference parser/pt.go:321-933):
a text traceroute file becomes a node TREE (multi-flow hops fork the
path), then the node list is reversed into hop rows
(reference ProcessAllNodes, pt.go:375-422; tree build ProcessOneTuple,
pt.go:677-781; line loop Parse, pt.go:784-933).

Format::

    traceroute [(64.86.132.76:33461) -> (98.162.212.214:53849)], protocol icmp, algo exhaustive, duration 19 s
    1  P(6, 6)  host.example  (10.0.0.1)  0.1/0.2/0.3/0.4 ms
    2  P(6, 6)  a.example  (10.0.0.2):0,2,4  1.0/1.1/1.2/1.3 ms  b.example  (10.0.0.3):1,3  2.0/2.1/2.2/2.3 ms

Each hop line carries 4-tuples ``(hostname, (ip)[:flows], rtts, 'ms')``
optionally followed by ``!``-prefixed error codes (skipped). Single-flow
tuples attach the node under EVERY current leaf; multi-flow tuples fork one
child per flow under flow-compatible leaves. MPLS lines and ``#`` comments
are skipped.

Ray-side integration is ``ParisDecoder``: a ``map_batches`` stage over
archive member rows (member, data) → one Arrow row per hop — corrupt
members are skipped (counted by the caller's lineage, never fatal), the
same quarantine contract as the pcap/snaplog decoders.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from etl_ray.functions.keys import hop_id

PT_BUFFER_SIZE = 2  # reference pt.go:363 (pollution look-back window)


@dataclass
class Node:
    """One observed (hostname, ip) at one tree position
    (reference pt.go:347-361)."""

    hostname: str
    ip: str
    rtts: List[float]
    parent_ip: str = ""
    parent_hostname: str = ""
    flow: int = -1


@dataclass
class ParisTest:
    protocol: str
    server_ip: str
    dest_ip: str
    nodes: List[Node] = field(default_factory=list)
    last_valid_hop_line: str = ""
    reached_dest: bool = False
    # Computed ONCE in parse_paris BEFORE last_valid_hop_line is replaced
    # with the 'ExpectedDestIP' marker (pt.go:902-904) — the reference
    # computes-then-marks in that order, so a property re-reading the
    # mutated line would flip for multi-path last hops where the dest IP
    # appears in the final hop line but the final node is a different IP.
    last_hop: str = ""
    reached_expected_dest: bool = False

    def compute_last_hop(self) -> str:
        """Best estimate of where the test ended (pt.go:884-901): dest_ip
        when the final node or final hop line mentions it, else the final
        node's ip."""
        if not self.nodes:
            return self.dest_ip
        if (self.nodes[-1].ip != self.dest_ip
                and self.dest_ip not in self.last_valid_hop_line):
            return self.nodes[-1].ip
        return self.dest_ip


def parse_first_line(line: str) -> Tuple[str, str, str]:
    """'traceroute [(serverIP:port) -> (destIP:port)], protocol p, ...'
    → (protocol, dest_ip, server_ip). Mirrors reference ParseFirstLine
    (pt.go:441-488) including its error cases."""
    protocol = ""
    dest_ip = server_ip = ""
    for index, part in enumerate(line.split(",")):
        if index == 0:
            segments = part.split(" ")
            if len(segments) != 4:
                raise ValueError("corrupted first line")
            if (len(segments[1]) <= 2 or not segments[1].startswith("[(")
                    or len(segments[3]) <= 2
                    or not segments[3].startswith("(")):
                raise ValueError("invalid data format in the first line")
            si = segments[1].rfind(":")
            di = segments[3].rfind(":")
            if si < 3 or di < 2:
                raise ValueError("invalid data format in the first line")
            server_ip = segments[1][2:si]
            dest_ip = segments[3][1:di]
            try:
                ipaddress.ip_address(server_ip)
                ipaddress.ip_address(dest_ip)
            except ValueError:
                raise ValueError("invalid IP address in the first line")
            continue
        mm = part.strip().split(" ")
        if len(mm) > 1 and mm[0] == "protocol":
            if mm[1] not in ("icmp", "udp", "tcp"):
                raise ValueError("unknown protocol")
            protocol = mm[1]
    return protocol, dest_ip, server_ip


def _parse_rtts(txt: str, protocol: str) -> List[float]:
    if protocol in ("tcp", "udp"):
        return [float(txt)]
    if protocol == "icmp":
        nums = txt.split("/")
        if len(nums) != 4:
            raise ValueError("expected 4 icmp rtts")
        return [float(x) for x in nums]
    return []  # unknown protocol: no rtts, not an error (pt.go:683-712)


def _unique(node: Node, nodes: List[Node]) -> bool:
    return not any(
        e.hostname == node.hostname and e.ip == node.ip
        and e.flow == node.flow for e in nodes)


def process_one_tuple(parts: List[str], protocol: str,
                      current_leaves: List[Node], all_nodes: List[Node],
                      new_leaves: List[Node]) -> None:
    """One (hostname, (ip)[:flows], rtts, 'ms') tuple → tree growth
    (reference ProcessOneTuple, pt.go:677-781)."""
    if len(parts) != 4:
        raise ValueError("corrupted input")
    if parts[3] != "ms":
        raise ValueError("malformed line, expected 'ms'")
    rtts = _parse_rtts(parts[2], protocol)
    ips = parts[1].split(":")
    if len(ips[0]) < 2 or ips[0][0] != "(" or ips[0][-1] != ")":
        raise ValueError("wrong format for IP address")
    ip = ips[0][1:-1]

    if not all_nodes:  # root node
        node = Node(parts[0], ip, rtts, "", "", -1)
        all_nodes.append(node)
        new_leaves.append(node)
        return
    if len(ips) == 1:
        # single flow: the node is a child of EVERY current leaf
        for leaf in current_leaves:
            node = Node(parts[0], ip, rtts, leaf.ip, leaf.hostname, -1)
            all_nodes.append(node)
            if _unique(node, new_leaves):
                new_leaves.append(node)
    elif len(ips) == 2:
        # multi-flow '(ip):0,2,4' — one child per flow under
        # flow-compatible leaves
        for flow_txt in ips[1].split(","):
            flow = int(flow_txt)
            for leaf in current_leaves:
                if leaf.flow in (-1, flow):
                    node = Node(parts[0], ip, rtts, leaf.ip,
                                leaf.hostname, flow)
                    all_nodes.append(node)
                    if _unique(node, new_leaves):
                        new_leaves.append(node)
    else:
        raise ValueError("wrong format for IP address")


def parse_paris(text: str) -> ParisTest:
    """Full test file → ParisTest (reference Parse, pt.go:784-933).
    Raises ValueError on a corrupted first line / tuple or an empty test."""
    first = True
    protocol, dest_ip, server_ip = "icmp", "", ""
    current_leaves: List[Node] = []
    all_nodes: List[Node] = []
    last_valid = ""
    reached = False
    for line in text.split("\n"):
        if not line or line[0] == "#":
            continue
        new_leaves: List[Node] = []
        if first:
            first = False
            protocol, dest_ip, server_ip = parse_first_line(line)
            continue
        parts = line.split()
        # skip MPLS annotations and short lines (pt.go:838-841)
        if len(parts) < 4 or parts[0] == "MPLS":
            continue
        # drop the leading '<ttl>  P(a, b)' (3 fields), then 4-tuples,
        # skipping trailing '!'-prefixed error codes (pt.go:845-859)
        i = 3
        while i < len(parts):
            if i + 3 >= len(parts):
                break  # corrupted tail: ignore, like the reference
            process_one_tuple(parts[i:i + 4], protocol, current_leaves,
                              all_nodes, new_leaves)
            i += 4
            while i < len(parts) and parts[i].startswith("!"):
                i += 1
        if dest_ip and dest_ip in line:
            reached = True
        last_valid = line
        current_leaves = new_leaves
    if not all_nodes:
        raise ValueError("empty test")
    t = ParisTest(protocol, server_ip, dest_ip, all_nodes, last_valid,
                  reached)
    # compute-then-mark, mirroring the reference's order (pt.go:884-904):
    # last_hop/reached are fixed from the REAL final hop line, and only
    # then is the line replaced with the marker.
    t.last_hop = t.compute_last_hop()
    t.reached_expected_dest = t.last_hop == dest_ip
    if t.last_hop == dest_ip:
        t.last_valid_hop_line = "ExpectedDestIP"  # pt.go:902-904
    return t


def nodes_to_hops(test: ParisTest, *, logtime_unix: float,
                  machine: str) -> List[dict]:
    """Node list → hop rows, REVERSED (reference ProcessAllNodes,
    pt.go:375-422): iterate nodes from the end; a parentless (root) node
    emits the server→root hop and stops. Hops[0] is therefore the FINAL
    hop — the pollution buffer depends on that order (pt.go:636-639)."""
    hops = []
    for node in reversed(test.nodes):
        if node.parent_ip == "":
            src_ip, src_host = test.server_ip, ""
        else:
            src_ip, src_host = node.parent_ip, node.parent_hostname
        hops.append({
            "hop_id": hop_id(logtime_unix, machine, src_ip),
            "source_ip": src_ip,
            "source_hostname": src_host,
            "dst_ip": node.ip,
            "rtts": node.rtts,
        })
        if node.parent_ip == "":
            break
    return hops


def logtime_from_name(member: str) -> Optional[float]:
    """Filename → unix logtime. Handles both the old
    '20160221T23:43:25Z_ALL27695.paris' and the 5-tuple
    '20170501T23:53:10Z-98.162.212.214-...paris' names
    (reference GetLogtime, parser/parser.go + pt.go:790-800)."""
    base = member.rsplit("/", 1)[-1]
    z = base.find("Z")
    if z < 0:
        return None
    try:
        dt = datetime.strptime(base[:z], "%Y%m%dT%H:%M:%S").replace(
            tzinfo=timezone.utc)
    except ValueError:
        return None
    return dt.timestamp()


_HOP_SCHEMA = pa.schema([
    ("member", pa.string()),
    ("hop_index", pa.int64()),
    ("hop_id", pa.string()),
    ("source_ip", pa.string()),
    ("source_hostname", pa.string()),
    ("dst_ip", pa.string()),
    ("rtt0", pa.float64()),
    ("n_rtts", pa.int64()),
    ("dest_ip", pa.string()),
    ("server_ip", pa.string()),
    ("protocol", pa.string()),
    ("last_hop", pa.string()),
    ("reached_dest", pa.bool_()),
    ("log_time", pa.int64()),
])


class ParisDecoder:
    """map_batches stage: archive member rows (member, data, skipped) →
    one row per hop. Corrupt members are skipped (non-fatal, same contract
    as PcapPacketDecoder/SnaplogDecoder); an all-corrupt batch returns the
    full zero-row schema so downstream projections never KeyError."""

    def __init__(self, machine: str = "unknown-unknown"):
        self.machine = machine

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            if row.get("skipped"):
                continue
            member = row["member"]
            logtime = logtime_from_name(member)
            if logtime is None:
                continue
            try:
                test = parse_paris(
                    row["data"].decode("utf-8", errors="strict"))
            except (ValueError, UnicodeDecodeError):
                continue  # corrupted member: counted upstream, never fatal
            hops = nodes_to_hops(test, logtime_unix=logtime,
                                 machine=self.machine)
            n = len(hops)
            outs.append(pa.table({
                "member": pa.array([member] * n),
                "hop_index": pa.array(np.arange(n, dtype=np.int64)),
                "hop_id": pa.array([h["hop_id"] for h in hops]),
                "source_ip": pa.array([h["source_ip"] for h in hops]),
                "source_hostname": pa.array(
                    [h["source_hostname"] for h in hops]),
                "dst_ip": pa.array([h["dst_ip"] for h in hops]),
                "rtt0": pa.array(
                    [h["rtts"][0] if h["rtts"] else None for h in hops],
                    pa.float64()),
                "n_rtts": pa.array(
                    [len(h["rtts"]) for h in hops], pa.int64()),
                "dest_ip": pa.array([test.dest_ip] * n),
                "server_ip": pa.array([test.server_ip] * n),
                "protocol": pa.array([test.protocol] * n),
                "last_hop": pa.array([test.last_hop] * n),
                "reached_dest": pa.array([test.reached_expected_dest] * n),
                "log_time": pa.array(
                    np.full(n, int(logtime), np.int64)),
            }, schema=_HOP_SCHEMA))
        if not outs:
            return _HOP_SCHEMA.empty_table()
        return pa.concat_tables(outs)


def paris_tests(ds, *, concurrency: int = 4):
    """Hop-row Dataset (ParisDecoder output) → one row per TEST with the
    pollution-relevant fields: dest_ip, last_hop, complete
    (= reached expected dest). Feed into ops.pollution.detect_pollution
    keyed by server/machine — the reference buffers per parser instance
    (pt.go:627-669); here the key column makes the same window distributed."""
    import pyarrow.compute as pc

    def per_test(batch: pa.Table) -> pa.Table:
        # hop_index==0 is the FINAL hop of its test: one row per member
        return batch.filter(pc.equal(batch["hop_index"], 0)).select(
            ["member", "dest_ip", "server_ip", "last_hop", "reached_dest",
             "log_time"])

    return ds.map_batches(per_test, batch_format="pyarrow")


def detect_paris_pollution(hops_ds, *, window: int = PT_BUFFER_SIZE,
                           concurrency: int = 4):
    """End-to-end integration: parsed .paris hop rows → per-test stream →
    pollution flags (a later test whose dest matches a buffered incomplete
    test's last hop retracts it — reference pt.go:627-669). Returns the
    per-test Dataset with (polluted, retracted_by)."""
    from etl_ray.ops.pollution import detect_pollution

    tests = paris_tests(hops_ds, concurrency=concurrency)
    return detect_pollution(
        tests, key_col="server_ip", order_col="log_time",
        dest_col="dest_ip", last_hop_col="last_hop",
        complete_col="reached_dest", window=window,
        concurrency=concurrency)
