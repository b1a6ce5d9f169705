"""ndt7/ndt5 shipped field-rule scrubs (reference
parser/ndt7_result.go:65-134, parser/ndt5_result.go:68-104) and the
pure-numpy real image decoder. No Ray needed."""

import json

import numpy as np
import pytest

from etl_ray.ndtresult import (
    NDT5ResultParser,
    NDT7ResultParser,
    ndt_result_registry,
    scrub_ndt7,
)
from etl_ray.ops.multimodal import decode_image


def _meas(acked, elapsed, minrtt, sent=10, retrans=1):
    return {
        "ConnectionInfo": {"Client": "1.2.3.4:5", "Server": "6.7.8.9:443"},
        "TCPInfo": {"BytesAcked": acked, "BytesReceived": acked * 2,
                    "ElapsedTime": elapsed, "MinRTT": minrtt,
                    "BytesSent": sent, "BytesRetrans": retrans},
    }


def test_ndt7_conninfo_scrubbed_and_uuid_stripped():
    obj = {"Download": {"UUID": "abc_unsafe-123",
                        "StartTime": "2020-01-01T00:00:00Z",
                        "ServerMeasurements": [_meas(100, 2, 5000),
                                               _meas(4000, 8, 3000)]},
           "Upload": {"UUID": "up_unsafe",
                      "ServerMeasurements": [_meas(10, 1, 1000)]}}
    rows = NDT7ResultParser().parse(
        {}, "ndt7-download-x.json", json.dumps(obj).encode())
    assert len(rows) == 1
    r = rows[0]
    assert r["id"] == "abc-123"  # every _unsafe substring stripped
    assert r["n_conninfo_remaining"] == 0
    assert r["n_conninfo_scrubbed"] == 3
    assert r["n_measurements"] == 3
    # last-measurement summary: 8*4000/8 Mbps, 3000/1000 ms, 1/10 loss
    assert r["mean_throughput_mbps"] == 4000.0
    assert r["min_rtt"] == 3.0
    assert r["loss_rate"] == 0.1
    assert r["congestion_control"] == "bbr"


def test_ndt7_upload_only_uses_bytes_received():
    obj = {"Upload": {"UUID": "u", "ServerMeasurements": [_meas(100, 4, 0)]}}
    r = NDT7ResultParser().parse({}, "ndt7-upload.json",
                                 json.dumps(obj).encode())[0]
    assert r["mean_throughput_mbps"] == 8 * 200 / 4  # BytesReceived
    assert r["loss_rate"] == 0.0  # upload loss fixed at 0


def test_ndt7_scrub_counts_only_present_conninfo():
    obj = {"Download": {"ServerMeasurements": [
        {"TCPInfo": {}}, _meas(1, 1, 1)]}}
    assert scrub_ndt7(obj) == 1
    assert all(m.get("ConnectionInfo") is None
               for m in obj["Download"]["ServerMeasurements"])


NDT5 = {
    "Control": {"UUID": "ctl-1"},
    "S2C": {"UUID": "s_unsafe-1", "StartTime": "t",
            "MeanThroughputMbps": 12.5, "MinRTT": 7_000_000,
            "TCPInfo": {"MinRTT": 6500, "BytesSent": 100,
                        "BytesRetrans": 3}},
    "C2S": {"UUID": "c-1", "StartTime": "t", "MeanThroughputMbps": 2.5},
}


def test_ndt5_fanout_and_clientmetadata_strip():
    text = json.dumps(NDT5, sort_keys=True)
    legacy = text[:-1] + ',"ClientMetadata":{"name":"legacy"}}'
    rows = NDT5ResultParser().parse({}, "ndt5-x.json", legacy.encode())
    assert [r["direction"] for r in rows] == ["s2c", "c2s"]
    s2c, c2s = rows
    assert s2c["id"] == "s-1"  # _unsafe stripped
    assert s2c["min_rtt"] == 6.5  # TCPInfo wins over user-space estimate
    assert s2c["loss_rate"] == 0.03
    assert s2c["congestion_control"] == "cubic"
    assert c2s["min_rtt"] == -1.0 and c2s["loss_rate"] == -1.0
    assert all(r["client_metadata_stripped"] for r in rows)


def test_ndt5_userspace_minrtt_fallback_and_neither_direction():
    obj = {"Control": {"UUID": "ctl-9"},
           "S2C": {"UUID": "s", "MinRTT": 9_500_000}}  # ns → 9.5 ms
    r = NDT5ResultParser().parse({}, "ndt5.json", json.dumps(obj).encode())
    assert r[0]["min_rtt"] == 9.5 and r[0]["loss_rate"] == 0.0
    none = NDT5ResultParser().parse(
        {}, "ndt5.json", json.dumps({"Control": {"UUID": "ctl-9"}}).encode())
    assert none[0]["direction"] == "none" and none[0]["id"] == "ctl-9"
    assert NDT5ResultParser().parse({}, "ndt5.json", b"") == []


def test_ndt_registry_dispatch_precedes_generic_jsonl():
    from etl_ray.parsers import classify

    reg = ndt_result_registry()
    assert classify("ndt7-download-x.json.gz", reg) == "ndt7_result"
    assert classify("ndt5-y.json", reg) == "ndt5_result"
    assert classify("plain.jsonl", reg) == "jsonl"


# ---------------------------------------------------------- image decode
def test_decode_ppm_p6_and_pgm_p5():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    b = b"P6\n# comment\n4 2\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(b), px)
    g = np.arange(8, dtype=np.uint8).reshape(2, 4, 1)
    assert np.array_equal(decode_image(b"P5\n4 2\n255\n" + g.tobytes()), g)


def _bmp(px, height_sign=1):
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    body_px = px[::-1] if height_sign > 0 else px  # bottom-up storage
    rows[:, : w * 3] = body_px[:, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    return (b"BM" + (54 + len(body)).to_bytes(4, "little")
            + b"\x00" * 4 + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + (h * height_sign).to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + b"\x00" * 20 + body)


def test_decode_bmp_bottom_up_and_top_down():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_image(_bmp(px, 1)), px)
    assert np.array_equal(decode_image(_bmp(px, -1)), px)


def test_decode_rejects_unknown_and_deep_pnm():
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8jpeg")
    with pytest.raises(ValueError):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


# ------------------------------------------------------ schema field docs
def test_schema_docs_annotate_roundtrip_and_promote():
    import pyarrow as pa

    from etl_ray.schema import (annotate_schema, describe_schema,
                                promote_schema, schema_docs_for,
                                schema_from_hex, schema_to_hex)

    s = pa.schema([("id", pa.string()), ("min_rtt", pa.float64()),
                   ("extra", pa.int32())])
    docs = schema_docs_for("ndt7_result")
    ann = annotate_schema(s, docs)
    # IPC round-trip (the manifest path) preserves descriptions
    rt = schema_from_hex(schema_to_hex(ann))
    d = {p: desc for p, _t, desc in describe_schema(rt)}
    assert d["id"] == docs["id"]
    assert d["min_rtt"] == docs["min_rtt"]
    assert d["extra"] is None  # undocumented fields stay undocumented
    # evolution (widen + add column) keeps the docs
    inc = pa.schema([("extra", pa.int64()), ("new_col", pa.string())])
    promoted = promote_schema(rt, inc)
    d2 = {p: desc for p, _t, desc in describe_schema(promoted)}
    assert d2["min_rtt"] == docs["min_rtt"]
    assert promoted.field("extra").type == pa.int64()


def test_schema_docs_nested_struct_paths():
    import pyarrow as pa

    from etl_ray.schema import annotate_schema, describe_schema

    s = pa.schema([
        ("a", pa.struct([("uuid", pa.string()), ("rtt", pa.float64())])),
    ])
    ann = annotate_schema(s, {"a": "summary", "a.uuid": "connection uuid"})
    d = {p: desc for p, _t, desc in describe_schema(ann)}
    assert d["a"] == "summary"
    assert d["a.uuid"] == "connection uuid"
    assert d["a.rtt"] is None
