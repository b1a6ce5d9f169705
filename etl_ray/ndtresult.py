"""NDT7 / NDT5 result parsers with the reference's SHIPPED field-rule
scrubs — the datatype-specific fidelity the generic JsonlParser cannot
carry on its own.

ndt7 (reference parser/ndt7_result.go:65-134):
- every ``Download/Upload.ServerMeasurements[*].ConnectionInfo`` is nulled
  before the row is published (client IP:port must not reach the lake);
- the summary UUID strips every ``_unsafe`` substring;
- the per-test summary comes from the LAST ServerMeasurement: download
  Mbps = 8·BytesAcked/ElapsedTime, upload Mbps = 8·BytesReceived/
  ElapsedTime, MinRTT = TCPInfo.MinRTT/1000 ms, download loss =
  BytesRetrans/BytesSent (upload loss fixed at 0).

ndt5 (reference parser/ndt5_result.go:68-104,163-207):
- the legacy JSON-OBJECT ``ClientMetadata`` (v0.10–v0.12 era) is
  regex-stripped from the RAW BYTES before decode, exactly
  ``,"ClientMetadata":{[^}]+}``;
- an empty test after the strip produces no rows;
- one row per measured direction: S2C when ``S2C.UUID`` is set (cubic,
  MinRTT from TCPInfo if present else the user-space estimate, loss from
  TCPInfo when BytesSent>0) and C2S likewise (congestion control
  "unknown", MinRTT/LossRate −1 = unknown); a test with NEITHER direction
  still emits one summary-less row keyed by ``Control.UUID``.

Both are plain registry parsers (etl_ray/parsers.py protocol): the scrub
rules ship WITH the parser, so every worker applies them — no driver-side
configuration step to forget.
"""

from __future__ import annotations

import json
import re
from typing import List, Tuple

# exactly the reference's pattern (parser/ndt5_result.go:77)
NDT5_CLIENT_METADATA_RE = re.compile(r',"ClientMetadata":{[^}]+}')


def scrub_ndt7(raw: dict) -> int:
    """Null ConnectionInfo in every ServerMeasurement of both directions,
    in place. Returns how many measurements carried one (for audits)."""
    scrubbed = 0
    for direction in ("Download", "Upload"):
        d = raw.get(direction)
        if not isinstance(d, dict):
            continue
        for m in d.get("ServerMeasurements") or []:
            if isinstance(m, dict) and m.get("ConnectionInfo") is not None:
                m["ConnectionInfo"] = None
                scrubbed += 1
    return scrubbed


def _tcp_last(ad: dict) -> dict:
    ms = ad.get("ServerMeasurements") or []
    if not ms or not isinstance(ms[-1], dict):
        return {}
    return ms[-1].get("TCPInfo") or {}


def ndt7_summary(ad: dict, direction: str) -> dict:
    """downSummary/upSummary (ndt7_result.go:137-170): last-measurement
    rates, millisecond MinRTT, _unsafe-stripped UUID."""
    tcp = _tcp_last(ad)

    def f(key):
        return float(tcp.get(key) or 0)

    elapsed = f("ElapsedTime")
    if direction == "download":
        mbps = 8.0 * f("BytesAcked") / elapsed if elapsed else 0.0
        sent = f("BytesSent")
        loss = f("BytesRetrans") / sent if sent else 0.0
    else:
        mbps = 8.0 * f("BytesReceived") / elapsed if elapsed else 0.0
        loss = 0.0
    return {
        "uuid": (ad.get("UUID") or "").replace("_unsafe", ""),
        "test_time": ad.get("StartTime"),
        "congestion_control": "bbr",
        "mean_throughput_mbps": mbps,
        "min_rtt": f("MinRTT") / 1000.0,
        "loss_rate": loss,
    }


class NDT7ResultParser:
    """One ndt7 result file → one summary row, ConnectionInfo scrubbed."""

    datatype = "ndt7_result"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, "ndt7" in name and name.endswith(".json")

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        raw = json.loads(data.decode("utf-8"))
        n_scrubbed = scrub_ndt7(raw)
        down, up = raw.get("Download"), raw.get("Upload")
        # nil-check, not truthiness: a present-but-empty {"Download": {}}
        # still summarizes the download side (empty UUID, zero rates),
        # matching ndt7_result.go:110-117
        if down is not None:
            a = ndt7_summary(down, "download")
        elif up is not None:
            a = ndt7_summary(up, "upload")
        else:
            a = {"uuid": "", "test_time": None, "congestion_control": "bbr",
                 "mean_throughput_mbps": 0.0, "min_rtt": 0.0,
                 "loss_rate": 0.0}
        n_meas = n_conn = 0
        for d in (down, up):
            for m in (d or {}).get("ServerMeasurements") or []:
                n_meas += 1
                if isinstance(m, dict) and m.get("ConnectionInfo") is not None:
                    n_conn += 1
        row = dict(a)
        row.update({
            "id": a["uuid"],
            "n_measurements": n_meas,
            # the audit column the oracle checks: MUST be 0 post-scrub
            "n_conninfo_remaining": n_conn,
            "n_conninfo_scrubbed": n_scrubbed,
        })
        return [row]


def _ndt5_minrtt(side: dict) -> float:
    tcp = side.get("TCPInfo")
    if tcp is not None:
        return float(tcp.get("MinRTT") or 0) / 1000.0
    # user-space estimate is a Go time.Duration (nanoseconds) → ms
    return float(side.get("MinRTT") or 0) / 1_000_000.0


class NDT5ResultParser:
    """One ndt5 result file → one row per measured direction (1→2), with
    the legacy ClientMetadata object stripped pre-decode."""

    datatype = "ndt5_result"

    def is_parsable(self, name: str) -> Tuple[str, bool]:
        return self.datatype, "ndt5" in name and name.endswith(".json")

    def parse(self, meta: dict, name: str, data: bytes) -> List[dict]:
        text = NDT5_CLIENT_METADATA_RE.sub("", data.decode("utf-8"))
        if not text:
            return []  # empty test: no rows (ndt5_result.go:79-84)
        raw = json.loads(text)
        rows: List[dict] = []
        s2c, c2s = raw.get("S2C"), raw.get("C2S")
        if isinstance(s2c, dict) and s2c.get("UUID"):
            uuid = s2c["UUID"].replace("_unsafe", "")
            tcp = s2c.get("TCPInfo") or {}
            sent = float(tcp.get("BytesSent") or 0)
            rows.append({
                "id": uuid,
                "direction": "s2c",
                "test_time": s2c.get("StartTime"),
                "congestion_control": "cubic",
                "mean_throughput_mbps":
                    float(s2c.get("MeanThroughputMbps") or 0),
                "min_rtt": _ndt5_minrtt(s2c),
                "loss_rate": (float(tcp.get("BytesRetrans") or 0) / sent
                              if sent > 0 else 0.0),
                "client_metadata_stripped":
                    "ClientMetadata" not in raw,
            })
        if isinstance(c2s, dict) and c2s.get("UUID"):
            uuid = c2s["UUID"].replace("_unsafe", "")
            rows.append({
                "id": uuid,
                "direction": "c2s",
                "test_time": c2s.get("StartTime"),
                "congestion_control": "unknown",
                "mean_throughput_mbps":
                    float(c2s.get("MeanThroughputMbps") or 0),
                "min_rtt": -1.0,
                "loss_rate": -1.0,
                "client_metadata_stripped":
                    "ClientMetadata" not in raw,
            })
        if not rows:
            control = raw.get("Control") or {}
            rows.append({
                "id": control.get("UUID") or "",
                "direction": "none",
                "test_time": None,
                "congestion_control": None,
                "mean_throughput_mbps": None,
                "min_rtt": None,
                "loss_rate": None,
                "client_metadata_stripped": "ClientMetadata" not in raw,
            })
        return rows


def ndt_result_registry() -> dict:
    """The default registry EXTENDED with the ndt result parsers, which
    claim ``*ndt7*.json`` / ``*ndt5*.json`` AHEAD of the generic
    JsonlParser (registry order is dispatch order)."""
    from etl_ray.parsers import REGISTRY

    reg = {
        NDT7ResultParser.datatype: NDT7ResultParser(),
        NDT5ResultParser.datatype: NDT5ResultParser(),
    }
    reg.update(REGISTRY)
    return reg
