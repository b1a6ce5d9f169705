"""Single-process reference materializer (the "golden" oracle).

Deliberately implemented with a plain Python dict replay — an independent,
obviously-correct implementation the distributed engine is compared against
(the analog of the reference's golden-file parser tests,
/root/reference/parser/ndt7_result_test.go:18-124). Only for test-scale data.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from etl_ray.schema import conform, promote_all


def oracle_replay(
    segment_paths: List[str],
    *,
    base_table: Optional[pa.Table] = None,
    vocab: int = 50257,
    max_tokens: int = 1 << 20,
) -> pa.Table:
    """Replay segments (plus optional base) in sequence_number order with
    LWW + delete semantics and the tokens validity rules; returns the final
    state sorted by doc_id. Invalid events are skipped (they quarantine in
    the engine)."""
    tables = [pq.read_table(p) for p in segment_paths]
    target = promote_all([t.schema for t in tables])
    rows: List[dict] = []
    for t in tables:
        rows.extend(conform(t, target).to_pylist())
    rows.sort(key=lambda r: (r["sequence_number"] if r["sequence_number"]
                             is not None else -(2**62)))

    state: dict = {}
    if base_table is not None:
        for r in base_table.to_pylist():
            r = dict(r)
            r.setdefault("sequence_number", -1)
            r.pop("op", None)
            state[r["doc_id"]] = r

    has_lang = "lang" in target.names
    for r in rows:
        op = r.get("op")
        did = r.get("doc_id")
        seq = r.get("sequence_number")
        if op not in ("insert", "update", "delete"):
            continue
        if did is None or did == "":
            continue
        if seq is None or seq < 0:
            continue
        if op == "delete":
            state.pop(did, None)
            continue
        toks = r.get("tokens")
        if toks is None:
            continue
        if r.get("n_tok") is not None and r["n_tok"] != len(toks):
            continue
        if len(toks) > max_tokens:
            continue
        if any(t < 0 or t >= vocab for t in toks):
            continue
        rec = {k: v for k, v in r.items() if k != "op"}
        state[did] = rec

    out_schema = pa.schema([f for f in target if f.name != "op"])
    # base-only docs may predate evolved columns; conform fills nulls
    recs = sorted(state.values(), key=lambda r: r["doc_id"])
    if not recs:
        return out_schema.empty_table()
    tbl = pa.Table.from_pylist(recs)
    return conform(tbl, out_schema)
