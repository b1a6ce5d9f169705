"""Scamper1 tracelb restructure: node → hop rows with manufactured HopID."""

import json

import pytest

from etl_ray.scamper import MAX_ROW_BYTES, Scamper1Parser


def tracelb_blob(nodes, hostname="host-3", start=1489539600):
    lines = [
        {"type": "mda-metadata", "uuid": "u1"},
        {"type": "cycle-start", "start_time": start, "hostname": hostname},
        {"type": "tracelb", "src": "10.0.0.1", "dst": "192.0.2.77",
         "probe_size": 44, "probec": len(nodes), "nodec": len(nodes),
         "nodes": nodes},
        {"type": "cycle-stop", "stop_time": start + 300},
    ]
    return "\n".join(json.dumps(x) for x in lines).encode()


def test_nodes_restructured_with_hop_id():
    nodes = [{"addr": "192.0.2.5", "name": "n1", "q_ttl": 2, "linkc": 1},
             {"addr": "192.0.2.6", "name": "n2", "q_ttl": 3, "linkc": 1}]
    rows = Scamper1Parser().parse({}, "u1.tracelb.jsonl", tracelb_blob(nodes))
    assert len(rows) == 2
    # HopID = YYYYMMDD_hostname_addr from the CYCLE-START time
    assert rows[0]["hop_id"] == "20170315_host-3_192.0.2.5"
    assert rows[1]["addr"] == "192.0.2.6"
    assert rows[0]["dst"] == "192.0.2.77"
    assert rows[0]["nodec"] == 2


def test_corrupt_structures_rejected():
    p = Scamper1Parser()
    with pytest.raises(ValueError):
        p.parse({}, "x.tracelb.jsonl", b'{"type":"tracelb"}')  # 1 line
    bad = tracelb_blob([]).replace(b"cycle-start", b"cycle-wrong")
    with pytest.raises(ValueError):
        p.parse({}, "x.tracelb.jsonl", bad)


def test_oversize_row_guard():
    p = Scamper1Parser()
    blob = tracelb_blob([])
    padded = blob + b" " * (MAX_ROW_BYTES - len(blob) + 1)
    with pytest.raises(ValueError, match="row size too big"):
        p.parse({}, "x.tracelb.jsonl", padded)


def test_registry_dispatch_precedence():
    from etl_ray.parsers import classify

    # the narrower tracelb suffix wins over the generic jsonl parser
    assert classify("a.tracelb.jsonl") == "scamper1"
    assert classify("a.jsonl") == "jsonl"
    assert classify("a.tracelb.jsonl.gz") == "scamper1"
