"""NDT test-group assembly (reference parser/ndt.go:91-115,210-309):
filename parse, gz-preference collisions, timestamp-flush, meta
enrichment."""

import gzip
import io
import tarfile

import pyarrow as pa

from etl_ray.ops.ndtgroup import (NdtArchiveGrouper, parse_ndt_filename)


def test_parse_ndt_filename():
    i = parse_ndt_filename(
        "2017/03/15/20170315T00:00:00.000000Z_1.2.3.4.c2s_snaplog.gz")
    assert i["suffix"] == "c2s_snaplog" and i["gz"]
    assert i["address"] == "1.2.3.4"
    assert i["timestamp"] == "20170315T00:00:00.000000Z"
    i2 = parse_ndt_filename("20170315T00:00:00.5Z_host.meta")
    assert i2["suffix"] == "meta" and not i2["gz"]
    assert parse_ndt_filename("not_a_test_file.txt") is None
    # greedy-address trap: suffix must NOT come out as 'gz'
    i3 = parse_ndt_filename("20170315T00:00:00.5Z_a.b.c.s2c_snaplog.gz")
    assert i3["suffix"] == "s2c_snaplog" and i3["address"] == "a.b.c"


def tar_bytes(members, tmp_path):
    p = tmp_path / "ndt.tgz"
    with tarfile.open(p, "w:gz") as tf:
        for name, blob in members:
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    return str(p)


def test_grouping_collisions_and_meta(tmp_path):
    ts1, ts2 = "20170315T00:00:00.1Z", "20170315T00:00:00.2Z"
    good, bad = b"GOODDATA", b"BAD"
    members = [
        # group 1: unzipped first, zipped twin after → zipped wins
        (f"{ts1}_u1.c2s_snaplog", bad),
        (f"{ts1}_u1.c2s_snaplog.gz", gzip.compress(good)),
        (f"{ts1}_u1.s2c_snaplog", good),
        (f"{ts1}_u1.meta", b"client_ip: 1.2.3.4\nclient_os: linux\n"),
        # group 2 (new timestamp → group 1 flushed): zipped first,
        # unzipped twin ignored; no meta member
        (f"{ts2}_u2.c2s_snaplog.gz", gzip.compress(good)),
        (f"{ts2}_u2.c2s_snaplog", bad),
    ]
    path = tar_bytes(members, tmp_path)
    out = NdtArchiveGrouper()(pa.table({"path": [path]}))
    rows = {(r["timestamp"], r["direction"]): r for r in out.to_pylist()}
    g1c = rows[(ts1, 0)]
    assert g1c["data"] == good and g1c["collision"]
    assert g1c["client_ip"] == "1.2.3.4" and not g1c["no_meta"]
    assert rows[(ts1, 1)]["data"] == good
    g2c = rows[(ts2, 0)]
    assert g2c["data"] == good and g2c["collision"] and g2c["no_meta"]
    assert g2c["client_ip"] is None
    assert len(out) == 3


def test_empty_archive_keeps_schema(tmp_path):
    path = tar_bytes([("README.txt", b"not an ndt file")], tmp_path)
    out = NdtArchiveGrouper()(pa.table({"path": [path]}))
    assert len(out) == 0
    out.select(["timestamp", "direction", "client_ip"])  # no KeyError
