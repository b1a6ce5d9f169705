"""Archive source + parser registry (SURVEY §2.1/§2.3/§2.11)."""

import gzip
import io
import json
import os
import tarfile

import pytest

from etl_ray.parsers import (
    ParseMembers,
    classify,
    parse_archives,
    register,
    rows_to_table,
)
from etl_ray.sources.archive import list_archives, read_archives


def make_archive(path, members):
    with tarfile.open(path, "w:gz") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


@pytest.fixture()
def archive_dir(tmp_path):
    d = tmp_path / "archives"
    d.mkdir()
    make_archive(
        str(d / "a1.tgz"),
        [
            ("t1.jsonl", b'{"x": 1}\n{"x": 2}\n'),
            ("t2.meta", b"server name: mlab1\nClient OS: linux\n"),
            ("t3.txt", b"hello world\nsecond line"),
            ("t4.gz", gzip.compress(b"gz body")),
            ("bad.jsonl", b"{not json"),
            ("unknown.bin", b"\x00\x01"),
        ],
    )
    make_archive(str(d / "a2.tar.gz"), [("t5.jsonl", b'{"y": 3}\n')])
    return str(d)


def test_list_archives_sampling(archive_dir):
    paths = list_archives(archive_dir)
    assert [os.path.basename(p) for p in paths] == ["a1.tgz", "a2.tar.gz"]
    assert len(list_archives(archive_dir, skip_count=1)) == 1


@pytest.mark.usefixtures("ray_session")
def test_read_archives_members(archive_dir):
    df = read_archives(archive_dir).to_pandas()
    assert len(df) == 7
    gz = df[df["member"] == "t4.gz"].iloc[0]
    assert gz["data"] == b"gz body"  # member gzip decode
    assert df["skipped"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_oversize_member_skipped(archive_dir):
    df = read_archives(archive_dir, max_member_bytes=10).to_pandas()
    skipped = df[df["skipped"].notna()]
    assert set(skipped["skipped"]) == {"oversize"}
    assert len(skipped) >= 2


def test_classify():
    assert classify("x.jsonl") == "jsonl"
    assert classify("x.meta") == "meta"
    assert classify("x.txt") == "text"
    assert classify("x.bin") is None


@pytest.mark.usefixtures("ray_session")
def test_parse_archives_dispatch_and_errors(archive_dir):
    df = parse_archives(archive_dir).to_pandas()
    ok = df[df["error"].isna()]
    bad = df[df["error"].notna()]
    # t1 fan-out 1 member → 2 rows; t5 → 1; t2 → 1; t3 → 1
    by_member = ok.groupby("member").size().to_dict()
    assert by_member["t1.jsonl"] == 2
    assert by_member["t5.jsonl"] == 1
    errors = {r["member"]: r["error"] for _, r in bad.iterrows()}
    assert errors["bad.jsonl"].startswith("parse error")
    assert errors["unknown.bin"] == "no parser"
    assert errors["t4.gz"] == "no parser"
    # deterministic synthetic ids (dedup contract)
    df2 = parse_archives(archive_dir).to_pandas()
    assert sorted(df["id"]) == sorted(df2["id"])
    # payload expansion to typed table
    t1 = ok[ok["member"] == "t1.jsonl"].sort_values("payload")
    tab = rows_to_table(list(t1["payload"]))
    assert tab["x"].to_pylist() == [1, 2]
    meta = json.loads(ok[ok["member"] == "t2.meta"].iloc[0]["payload"])
    assert meta == {"server_name": "mlab1", "Client_OS": "linux"}
    txt = json.loads(ok[ok["member"] == "t3.txt"].iloc[0]["payload"])
    assert txt == {"n_chars": 23, "n_words": 4, "n_lines": 2}


@pytest.mark.usefixtures("ray_session")
def test_register_custom_parser(archive_dir):
    class BinParser:
        datatype = "bin"

        def is_parsable(self, name):
            return "bin", name.endswith(".bin")

        def parse(self, meta, name, data):
            return [{"n_bytes": len(data)}]

    register(BinParser())
    try:
        df = parse_archives(archive_dir).to_pandas()
        row = df[df["member"] == "unknown.bin"].iloc[0]
        assert row["error"] is None or not row["error"]
        assert json.loads(row["payload"]) == {"n_bytes": 2}
    finally:
        from etl_ray import parsers

        parsers.REGISTRY.pop("bin", None)
