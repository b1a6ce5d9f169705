"""Sidestream (K:/C: schema-on-read text) and snaplog (self-describing
binary) parsers: golden decode, corruption quarantine, canonical renames,
delta kernel, zstd member decode."""

import gzip
import io
import os
import tarfile

import numpy as np
import pyarrow as pa
import pytest

from etl_ray.sidestream import (
    SidestreamParser,
    extract_ss_logtime,
    parse_k_header,
    parse_ss_lines,
)
from etl_ray.snaplog import (
    SnaplogParser,
    decode_snaplog,
    delta_columns,
    write_snaplog,
)

SS_NAME = "20170315T01:00:00Z_10.0.0.9_0.web100"


def ss_file(lines):
    return "\n".join(lines).encode()


HEADER = ("K: cid PollTime LocalAddress LocalPort RemAddress RemPort "
          "StartTimeStamp StartTimeUsec DataBytesOut PktsOut")


def test_ss_golden_parse():
    data = ss_file([
        HEADER,
        "C: 5 100 10.0.0.9 80 192.0.2.7 5501 1489539600 250000 1234 10",
        "C: 5 101 10.0.0.9 80 192.0.2.7 5501 1489539601 250001 2234 20",
    ])
    rows = SidestreamParser().parse({}, SS_NAME, data)
    assert len(rows) == 2
    r = rows[0]
    # canonical renames applied (legacy PktsOut/DataBytesOut)
    assert r["SegsOut"] == 10
    assert r["DataOctetsOut"] == 1234
    assert "PktsOut" not in r
    # StartTimeStamp combined with StartTimeUsec into microseconds
    assert r["StartTimeStamp"] == 1489539600 * 1_000_000 + 250000
    assert r["LocalAddress"] == "10.0.0.9"
    # log_time from the filename (2017-03-15T01:00:00Z), not the content
    assert r["log_time"] == 1489539600 == extract_ss_logtime(SS_NAME)
    assert r["test_id"] == SS_NAME


def test_ss_skips_corrupt_rows_and_bad_ips():
    data = ss_file([
        HEADER,
        "C: 5 100 10.0.0.9 80 192.0.2.7 5501 1 0 1 1",
        "C: 5 100 10.0.0.9 80",  # wrong arity -> skipped
        "X: 5 100 10.0.0.9 80 192.0.2.7 5501 1 0 1 1",  # wrong tag
        "C: 5 100 0.0.0.0 80 192.0.2.7 5501 1 0 1 1",  # zero local IP
        "C: 5 100 10.0.0.9 80 not-an-ip 5501 1 0 1 1",  # bad remote IP
        "C: 5 xx 10.0.0.9 80 192.0.2.7 5501 1 0 1 1",  # non-numeric
        "",
        "C: 6 200 2001:db8:::9 443 192.0.2.8 5502 2 0 2 2",  # ::: repaired
    ])
    rows = SidestreamParser().parse({}, SS_NAME, data)
    assert len(rows) == 2
    assert rows[1]["LocalAddress"] == "2001:db8::9"


def test_ss_header_and_filename_errors():
    with pytest.raises(ValueError):
        parse_k_header("H: cid PollTime")
    with pytest.raises(ValueError):
        extract_ss_logtime("invalid.web100")
    with pytest.raises(ValueError):
        extract_ss_logtime("20170315T01:00:00Z_bad.tra")
    p = SidestreamParser()
    assert p.is_parsable("x.web100")[1] is True
    assert p.is_parsable("x.tra")[1] is False  # trace companion ignored


def test_ss_vectorized_line_parse_empty():
    frame, skipped = parse_ss_lines([], ["cid"])
    assert len(frame) == 0 and skipped == 0


# ------------------------------------------------------------------- snaplog
FIELDS = [("SnapTimeStamp", "u32"), ("DataBytesOut", "u64"),
          ("PktsOut", "u32"), ("CurMSS", "i32"), ("_Deprecated", "u16")]


def make_snaplog(n=5, logtime=1700000000):
    cols = {
        "SnapTimeStamp": np.arange(n, dtype=np.uint64) + 100,
        "DataBytesOut": (np.arange(n, dtype=np.uint64) ** 2) * 1000,
        "PktsOut": np.arange(n, dtype=np.uint64) * 3,
        "CurMSS": np.full(n, -1460, dtype=np.int64),  # signed i32 roundtrip
        "_Deprecated": np.full(n, 9, dtype=np.uint64),
    }
    return write_snaplog(FIELDS, cols, logtime), cols


def test_snaplog_roundtrip_vectorized_decode():
    data, cols = make_snaplog(7)
    t, logtime = decode_snaplog(data)
    assert logtime == 1700000000
    assert len(t) == 7
    # canonical renames + deprecated-field skip
    assert "SegsOut" in t.column_names and "PktsOut" not in t.column_names
    assert "_Deprecated" not in t.column_names
    assert t["SegsOut"].to_pylist() == cols["PktsOut"].astype(int).tolist()
    assert t["DataOctetsOut"].to_pylist() == cols["DataBytesOut"].astype(
        int).tolist()
    assert t["CurMSS"].to_pylist() == [-1460] * 7  # signed decode
    assert t["snap_index"].to_pylist() == list(range(7))


def test_snaplog_corruption_detected():
    data, _ = make_snaplog(3)
    with pytest.raises(ValueError):
        decode_snaplog(data[:-5])  # truncated record
    with pytest.raises(ValueError):
        decode_snaplog(b"NOTSNAP" + data)
    # flipped magic inside body
    bad = data.replace(b"----Begin-Snap-Data----\n",
                       b"----Begin-Snap-Dati----\n", 1)
    with pytest.raises(ValueError):
        decode_snaplog(bad)


def test_snaplog_delta_kernel():
    data, cols = make_snaplog(4)
    t, _ = decode_snaplog(data)
    out = delta_columns(t, ["DataOctetsOut"])
    d = out["d_DataOctetsOut"].to_pylist()
    assert d[0] is None
    assert d[1:] == np.diff(cols["DataBytesOut"].astype(int)).tolist()


def test_snaplog_registry_parser_rows():
    data, _ = make_snaplog(3)
    rows = SnaplogParser().parse({}, "x.snaplog", data)
    assert len(rows) == 3
    assert rows[0]["log_time"] == 1700000000
    assert rows[2]["SegsOut"] == 6


# --------------------------------------------- zstd members through archives
@pytest.mark.usefixtures("ray_session")
def test_zstd_member_decode_and_dispatch(tmp_path):
    from etl_ray.parsers import parse_archives

    raw = ss_file([
        HEADER,
        "C: 5 100 10.0.0.9 80 192.0.2.7 5501 1 0 77 7",
    ])
    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, "zstd") as s:
        s.write(raw)
    comp = sink.getvalue().to_pybytes()
    tar_path = str(tmp_path / "a.tgz")
    with tarfile.open(tar_path, "w:gz") as tf:
        for name, blob in [(SS_NAME + ".zst", comp),
                           (SS_NAME.replace("_0.", "_1."), raw),
                           ("bad.web100.zst", b"\x28\xb5\x2f\xfdgarbage")]:
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    df = parse_archives([tar_path]).to_pandas()
    ok = df[df["error"].isna()]
    assert len(ok) == 2  # zstd + plain members both parse as sidestream
    import json

    payloads = [json.loads(p) for p in ok["payload"]]
    assert {p["DataOctetsOut"] for p in payloads} == {77}
    bad = df[~df["error"].isna()]
    assert len(bad) == 1


def test_snaplog_snapshot_cap():
    """Reference ndt.go:41-54: parse at most the snapshot cap (OOM guard)."""
    data, cols = make_snaplog(10)
    t, _ = decode_snaplog(data, max_snapshots=4)
    assert len(t) == 4
    assert t["SegsOut"].to_pylist() == cols["PktsOut"][:4].astype(int).tolist()
    full, _ = decode_snaplog(data)
    assert len(full) == 10
