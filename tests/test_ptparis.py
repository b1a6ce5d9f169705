"""PT legacy ``.paris`` text parser (reference parser/pt.go:321-933):
first-line parse, tree build incl. multi-flow forks, hop reversal,
error-code/MPLS skipping, decoder quarantine."""

import pyarrow as pa
import pytest

from etl_ray.ptparis import (ParisDecoder, nodes_to_hops, parse_first_line,
                             parse_paris)

FIRST = ("traceroute [(64.86.132.76:33461) -> (98.162.212.214:53849)], "
         "protocol icmp, algo exhaustive, duration 19 s")


def test_parse_first_line():
    proto, dest, server = parse_first_line(FIRST)
    assert (proto, dest, server) == ("icmp", "98.162.212.214",
                                     "64.86.132.76")


@pytest.mark.parametrize("bad", [
    "traceroute [(1.2.3.4:1) -> (5.6.7.8:2)] extra words here, protocol icmp",
    "traceroute [(notanip:1) -> (5.6.7.8:2)], protocol icmp",
    "traceroute [(1.2.3.4:1) -> (5.6.7.8:2)], protocol carrierpigeon",
    "nonsense",
])
def test_parse_first_line_corrupt(bad):
    with pytest.raises(ValueError):
        parse_first_line(bad)


def chain_text():
    return "\n".join([
        "#comment",
        FIRST,
        "1  P(6, 6)  a.example  (10.1.0.1)  0.1/0.2/0.3/0.4 ms",
        "MPLS Label 337379 TTL 1",
        "2  P(6, 6)  b.example  (10.1.0.2)  1.0/1.1/1.2/1.3 ms !T2 !X5",
        "3  P(6, 6)  c.example  (10.1.0.3)  2.0/2.1/2.2/2.3 ms",
    ])


def test_single_flow_chain_reversed_hops():
    t = parse_paris(chain_text())
    assert [n.ip for n in t.nodes] == ["10.1.0.1", "10.1.0.2", "10.1.0.3"]
    assert t.nodes[1].parent_ip == "10.1.0.1"
    assert t.last_hop == "10.1.0.3"  # never reached 98.162.212.214
    assert not t.reached_expected_dest
    hops = nodes_to_hops(t, logtime_unix=1489536000, machine="mlab1-lga03")
    # Hops[0] is the FINAL hop; the root hop (source=server) is last
    assert [h["dst_ip"] for h in hops] == ["10.1.0.3", "10.1.0.2",
                                           "10.1.0.1"]
    assert hops[0]["source_ip"] == "10.1.0.2"
    assert hops[-1]["source_ip"] == "64.86.132.76"
    assert hops[-1]["source_hostname"] == ""
    assert hops[0]["hop_id"] == "20170315_mlab1-lga03_10.1.0.2"
    assert hops[0]["rtts"] == [2.0, 2.1, 2.2, 2.3]


def test_multi_flow_fork_and_merge():
    """(ip):0,1 forks one node per flow; a later single-flow hop attaches
    under EVERY leaf (pt.go:727-781)."""
    text = "\n".join([
        FIRST,
        "1  P(6, 6)  root.example  (10.1.0.1)  0.1/0.2/0.3/0.4 ms",
        "2  P(6, 6)  fork.example  (10.2.0.1):0,1  1.0/1.1/1.2/1.3 ms",
        "3  P(6, 6)  merge.example  (10.3.0.1)  2.0/2.1/2.2/2.3 ms",
    ])
    t = parse_paris(text)
    # root + 2 flow nodes + a merge node under each of the 2 leaves
    assert len(t.nodes) == 1 + 2 + 2
    flows = [n.flow for n in t.nodes]
    assert flows == [-1, 0, 1, -1, -1]
    assert {n.parent_ip for n in t.nodes[3:]} == {"10.2.0.1"}
    hops = nodes_to_hops(t, logtime_unix=0, machine="m")
    # reversal stops at the root node (break after the server hop)
    assert hops[-1]["source_ip"] == "64.86.132.76"
    assert len(hops) == 5


def test_reached_dest_marks_expected():
    text = "\n".join([
        FIRST,
        "1  P(6, 6)  a.example  (10.1.0.1)  0.1/0.2/0.3/0.4 ms",
        "2  P(6, 6)  z.example  (98.162.212.214)  9.0/9.1/9.2/9.3 ms",
    ])
    t = parse_paris(text)
    assert t.reached_expected_dest
    assert t.last_hop == "98.162.212.214"
    assert t.last_valid_hop_line == "ExpectedDestIP"


def test_tcp_single_rtt_and_empty_test():
    text = "\n".join([
        FIRST.replace("protocol icmp", "protocol tcp"),
        "1  P(6, 6)  a.example  (10.1.0.1)  0.298 ms",
    ])
    t = parse_paris(text)
    assert t.nodes[0].rtts == [0.298]
    with pytest.raises(ValueError, match="empty test"):
        parse_paris(FIRST)  # no hop lines


def test_decoder_skips_corrupt_members_keeps_schema():
    good = chain_text().encode()
    batch = pa.table({
        "member": pa.array([
            "20170315T00:00:00Z-1.2.3.4-1-5.6.7.8-2-u1.paris",
            "20170315T00:00:00Z-1.2.3.4-1-5.6.7.8-2-u2.paris",
            "noz.paris",
        ]),
        "data": pa.array([good, b"traceroute garbage\nnope", good],
                         pa.binary()),
        "skipped": pa.array([False, False, False]),
    })
    out = ParisDecoder(machine="mlab1-lga03")(batch)
    # member 2 corrupt (bad first line), member 3 has no parsable logtime
    assert len(out) == 3
    assert set(out["member"].to_pylist()) == {
        "20170315T00:00:00Z-1.2.3.4-1-5.6.7.8-2-u1.paris"}
    # all-corrupt batch: zero rows, full schema
    bad = pa.table({
        "member": pa.array(["20170315T00:00:00Z-x-u9.paris"]),
        "data": pa.array([b"nope"], pa.binary()),
        "skipped": pa.array([False]),
    })
    empty = ParisDecoder()(bad)
    assert len(empty) == 0
    empty.select(["hop_id", "dst_ip", "last_hop"])  # no KeyError


def test_tolerant_json_repair():
    """jsonnet-style grammar repair for early scamper output
    (reference pt.go:236-248)."""
    from etl_ray.scamper import tolerant_json_loads

    assert tolerant_json_loads('{"a": 1,}') == {"a": 1}
    assert tolerant_json_loads("{a: 1, b: [1, 2,], }") == {
        "a": 1, "b": [1, 2]}
    assert tolerant_json_loads(
        "{// comment\n'addr': '1.2.3.4', /* x */ \"q_ttl\": 2}") == {
        "addr": "1.2.3.4", "q_ttl": 2}
    # strings with structural chars inside stay untouched
    assert tolerant_json_loads('{"k": "a,}{:\'v"}') == {"k": "a,}{:'v"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tolerant_json_loads("{utterly broken")


def test_scamper_parser_repairs_malformed_tracelb():
    from etl_ray.scamper import Scamper1Parser

    lines = [
        '{"type": "meta"}',
        '{"type": "cycle-start", "start_time": 1489539600, '
        '"hostname": "h1"}',
        # trailing comma + bare keys: early-scamper damage
        '{dst: "192.0.2.77", nodec: 1, nodes: '
        '[{addr: "192.0.2.5", q_ttl: 2,},],}',
        '{"type": "cycle-stop"}',
    ]
    rows = Scamper1Parser().parse({}, "t.tracelb.jsonl",
                                  "\n".join(lines).encode())
    assert len(rows) == 1
    assert rows[0]["addr"] == "192.0.2.5"
    assert rows[0]["hop_id"] == "20170315_h1_192.0.2.5"


@pytest.mark.usefixtures("ray_session")
def test_paris_pollution_integration(tmp_path):
    """A later test whose dest equals a buffered incomplete test's last hop
    retracts it (pt.go:627-669), driven from raw .paris text through
    ParisDecoder -> per-test rows -> the distributed pollution window."""
    import io
    import tarfile

    from etl_ray.ptparis import detect_paris_pollution
    from etl_ray.sources.archive import read_archives

    def paris(dest, hops, t):
        lines = [f"traceroute [(10.0.0.1:33461) -> ({dest}:53849)], "
                 "protocol icmp, algo exhaustive, duration 19 s"]
        for i, ip in enumerate(hops):
            lines.append(f"{i+1}  P(6, 6)  h.example  ({ip})  "
                         "0.1/0.2/0.3/0.4 ms")
        name = f"20170315T00:00:{t:02d}Z_x.paris"
        return name, "\n".join(lines).encode()

    members = [
        # test A: incomplete, last hop 192.0.2.9
        paris("203.0.113.50", ["192.0.2.1", "192.0.2.9"], 1),
        # test B: dest EQUALS A's last hop -> A is polluted
        paris("192.0.2.9", ["192.0.2.1", "192.0.2.9"], 2),
        # test C: unrelated
        paris("203.0.113.60", ["192.0.2.3"], 3),
    ]
    p = tmp_path / "pt.tgz"
    with tarfile.open(p, "w:gz") as tf:
        for name, blob in members:
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    from etl_ray.ptparis import ParisDecoder

    hops = read_archives([str(p)]).map_batches(
        ParisDecoder(machine="m1"), batch_format="pyarrow")
    out = detect_paris_pollution(hops).to_pandas().sort_values(
        "log_time").reset_index(drop=True)
    assert len(out) == 3
    assert bool(out.loc[0, "polluted"])          # A retracted by B
    assert not bool(out.loc[1, "polluted"])      # B reached its dest
    assert not bool(out.loc[2, "polluted"])
