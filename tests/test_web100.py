"""REAL web100 snaplog format: header field tables, typed binary decode
(incl. the 17-byte IP encoding and signed-int convention), tcp-kis renames
(reference web100/web100.go:115-497, web100/parse.go:16-43)."""

import numpy as np
import pyarrow as pa
import pytest

from etl_ray.web100 import (T_COUNTER32, T_COUNTER64, T_INET_ADDRESS,
                            T_INTEGER32, T_IPV4, T_PORT, T_STR32,
                            decode_web100_snaplog, parse_header,
                            parse_tcp_kis, write_web100_snaplog)

TCP_KIS = """
VariableName:\tSegsOut
Scope:\t\tWeb100
RenameFrom:\tPktsOut
------------------------------------------------------------------------------
VariableName:\tDataOctetsOut
RenameFrom:\tDataBytesOut
"""


def test_parse_tcp_kis():
    r = parse_tcp_kis(TCP_KIS)
    assert r == {"PktsOut": "SegsOut", "DataBytesOut": "DataOctetsOut"}


def make_fixture(n=5):
    ip17 = np.zeros((n, 17), dtype=np.uint8)
    ip17[:, 0] = 192
    ip17[:, 1] = 0
    ip17[:, 2] = 2
    ip17[:, 3] = np.arange(1, n + 1)
    ip17[:, 16] = 1  # ADDRTYPE_IPV4
    s32 = np.zeros((n, 32), dtype=np.uint8)
    for i in range(n):
        s32[i, :5] = np.frombuffer(b"state", np.uint8)
    fields = [
        ("SnapTimeStamp", T_COUNTER32),
        ("PktsOut", T_COUNTER32),          # legacy name → renamed
        ("DataBytesOut", T_COUNTER64),
        ("CongSignals", T_INTEGER32),      # signed
        ("LocalPort", T_PORT),
        ("LocalAddress", T_IPV4),
        ("RemAddress", T_INET_ADDRESS),
        ("_Deprecated", T_COUNTER32),      # must be skipped
        ("State32", T_STR32),
    ]
    cols = {
        "SnapTimeStamp": np.arange(n) + 100,
        "PktsOut": np.arange(n) * 2,
        "DataBytesOut": np.arange(n, dtype=np.uint64) * 10 + 2**33,
        "CongSignals": np.array([0, 1, 2**32 - 5, 0x7FFFFFFF, 3],
                                dtype=np.uint32)[:n],
        "LocalPort": np.full(n, 3010),
        "LocalAddress": np.tile(
            np.array([10, 0, 0, 7], np.uint8), (n, 1)),
        "RemAddress": ip17,
        "_Deprecated": np.full(n, 9),
        "State32": s32,
    }
    return write_web100_snaplog(fields, cols, logtime=1489539600,
                                conn_spec={"remote_port": 53849,
                                           "remote_ip": "192.0.2.99",
                                           "local_port": 3010,
                                           "local_ip": "10.0.0.7"})


def test_header_roundtrip():
    blob = make_fixture()
    hdr = parse_header(blob)
    assert hdr.log_time == 1489539600
    assert hdr.group_name == "read"
    assert [v.name for v in hdr.read_fields][:3] == [
        "SnapTimeStamp", "PktsOut", "DataBytesOut"]
    assert hdr.conn_spec == {"remote_port": 53849, "remote_ip": "192.0.2.99",
                             "local_port": 3010, "local_ip": "10.0.0.7"}


def test_decode_real_snaplog_typed_and_renamed():
    blob = make_fixture()
    t, logtime = decode_web100_snaplog(
        blob, renames={"PktsOut": "SegsOut",
                       "DataBytesOut": "DataOctetsOut"})
    assert logtime == 1489539600
    assert len(t) == 5
    assert "SegsOut" in t.column_names and "PktsOut" not in t.column_names
    assert "_Deprecated" not in t.column_names
    assert t["SegsOut"].to_pylist() == [0, 2, 4, 6, 8]
    # COUNTER64 beyond 2^32
    assert t["DataOctetsOut"].to_pylist()[0] == 2**33
    # the reference's signed convention: >= 0x7FFFFFFF wraps negative
    assert t["CongSignals"].to_pylist() == [0, 1, -5, -2147483649, 3]
    assert t["LocalAddress"].to_pylist() == ["10.0.0.7"] * 5
    assert t["RemAddress"].to_pylist() == [
        f"192.0.2.{i}" for i in range(1, 6)]
    assert t["State32"].to_pylist() == ["state"] * 5
    assert t["snap_index"].to_pylist() == list(range(5))


def test_truncated_tail_record_dropped_and_caps():
    blob = make_fixture()
    t, _ = decode_web100_snaplog(blob[:-7])  # partial last record
    assert len(t) == 4
    t2, _ = decode_web100_snaplog(blob, max_snapshots=2)
    assert len(t2) == 2


def test_corrupt_headers_raise():
    blob = make_fixture()
    with pytest.raises(ValueError):
        decode_web100_snaplog(b"not a snaplog at all")
    # flip the group name away from 'read'
    bad = blob.replace(b"read".ljust(32, b"\x00"),
                       b"tune".ljust(32, b"\x00"))
    with pytest.raises(ValueError, match="read"):
        decode_web100_snaplog(bad)


def test_snaplog_decoder_dispatches_real_format():
    """The existing SnaplogDecoder stage must read a REAL-format member
    (and keep the analog path working — snaplog_deltas stays green)."""
    from etl_ray.snaplog import SnaplogDecoder

    batch = pa.table({
        "member": pa.array(["u7.snaplog"]),
        "data": pa.array([make_fixture()], pa.binary()),
        "skipped": pa.array([False]),
    })
    out = SnaplogDecoder(delta_fields=["SegsOut"])(batch)
    assert len(out) == 5
    assert out["SegsOut"].to_pylist() == [0, 2, 4, 6, 8]
    assert out["d_SegsOut"].to_pylist() == [None, 2, 2, 2, 2]
    assert out["log_time"].to_pylist() == [1489539600] * 5
