"""Round-4 regression tests for the ADVICE.md r03 findings:

1. ptparis last_hop/reached computed BEFORE the ExpectedDestIP marker
   overwrite (multi-path last hop, reference pt.go:884-904).
2. fuzzyjoin all-empty batch width=0 crash + null text pairing.
3. exchange _shrink dictionary heuristic no longer locked by first batch.
4. bucketize_by_quantile unsorted qs.
5. scamper single-quote escape decoding.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

FIRST = ("traceroute [(64.86.132.76:33461) -> (98.162.212.214:53849)], "
         "protocol icmp, algo exhaustive, duration 19 s")


def test_paris_multipath_last_hop_stays_reached():
    """dest IP appears in the FINAL hop line but the final NODE is a
    different IP (multi-path last hop). The reference computes
    last_hop=dest / reached=True then marks the line (pt.go:884-904);
    re-evaluating after the marker overwrite used to flip both."""
    from etl_ray.ptparis import parse_paris

    text = "\n".join([
        FIRST,
        "1  P(6, 6)  a.example  (10.1.0.1)  0.1/0.2/0.3/0.4 ms",
        # two tuples on the last line: dest first, another node second
        "2  P(6, 6)  z.example  (98.162.212.214)  9.0/9.1/9.2/9.3 ms  "
        "other.example  (10.9.0.9)  8.0/8.1/8.2/8.3 ms",
    ])
    t = parse_paris(text)
    assert t.nodes[-1].ip == "10.9.0.9"  # final node is NOT the dest
    assert t.last_valid_hop_line == "ExpectedDestIP"
    # values must be stable post-marking (plain fields, not properties)
    assert t.last_hop == "98.162.212.214"
    assert t.reached_expected_dest is True


def test_deletion_signatures_all_empty_batch():
    from etl_ray.ops.fuzzyjoin import _SigGen, _deletion_signatures

    rows, sigs = _deletion_signatures(np.asarray(["", ""], dtype="U"))
    assert list(sigs) == ["", ""]
    # the map stage drops empty and null text instead of crashing/pairing
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "name": pa.array(["", None, "ab"], pa.string())})
    out = _SigGen("id", "name")(t)
    assert set(out["id"].to_pylist()) == {3}
    assert "None" not in set(out["sig"].to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_edit1_pairs_ignores_nulls_and_empties():
    import ray

    from etl_ray.ops.fuzzyjoin import edit1_pairs

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "name": pa.array([None, "", "", "abc", "abd"], pa.string()),
    }))
    got = edit1_pairs(ds, id_col="id", text_col="name").to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert pairs == {(4, 5)}  # no null/empty pairs at distance 0


def test_exchange_shrink_not_locked_by_first_batch():
    """A first batch of bursty same-doc updates must not dict-encode
    doc_id for all later (high-cardinality) batches."""
    from etl_ray.config import EngineConfig
    from etl_ray.stages.exchange import FragmentWriter

    fw = FragmentWriter.__new__(FragmentWriter)  # bypass Validator setup
    fw._never_dict = set()
    burst = pa.table({
        "__shard": pa.array(np.zeros(4000, np.int64)),
        "doc_id": pa.array(["doc-1"] * 4000, pa.string()),
    })
    s1 = fw._shrink(burst)
    assert pa.types.is_dictionary(s1.schema.field("doc_id").type)
    wide = pa.table({
        "__shard": pa.array(np.zeros(4000, np.int64)),
        "doc_id": pa.array([f"doc-{i}" for i in range(4000)], pa.string()),
    })
    s2 = fw._shrink(wide)
    assert not pa.types.is_dictionary(s2.schema.field("doc_id").type)
    assert "doc_id" in fw._never_dict  # and never re-counted


@pytest.mark.usefixtures("ray_session")
def test_bucketize_unsorted_qs():
    import ray

    from etl_ray.ops.stats import bucketize_by_quantile

    df = pd.DataFrame({"id": np.arange(100),
                       "v": np.arange(100, dtype=np.float64)})
    ds = ray.data.from_pandas(df)
    a = bucketize_by_quantile(ds, col="v", qs=[0.25, 0.5, 0.75],
                              keep_cols=["id"]).to_pandas()
    b = bucketize_by_quantile(ds, col="v", qs=[0.75, 0.25, 0.5],
                              keep_cols=["id"]).to_pandas()
    merged = a.merge(b, on="id", suffixes=("_sorted", "_shuffled"))
    assert (merged["bucket_sorted"] == merged["bucket_shuffled"]).all()
    assert merged["bucket_sorted"].nunique() == 4


def test_scamper_single_quote_escapes_decoded():
    from etl_ray.scamper import tolerant_json_loads

    got = tolerant_json_loads(r"{'a': 'x\ny\tz\\w', 'b': 'qA'}")
    assert got == {"a": "x\ny\tz\\w", "b": "qA"}
    # \' still works and unknown escapes pass through verbatim
    assert tolerant_json_loads(r"{'k': 'it\'s \z'}") == {"k": r"it's \z"}
