"""Correction rules (mask / shift) and MinHash-LSH recall vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_ray.config import MaskRule, ShiftRule


def test_mask_rule_nulls_bad_values_only():
    t = pa.table({"event_type": ["click", "signup", None, "view"]})
    out = MaskRule("event_type", ("signup",)).apply(t)
    assert out["event_type"].to_pylist() == ["click", None, None, "view"]
    # absent column: no-op
    assert MaskRule("nope", ("x",)).apply(t).equals(t)


def test_shift_rule_conditional_and_unconditional():
    t = pa.table({
        "value": pa.array([1.0, 2.0, None, 4.0]),
        "event_type": ["purchase", "click", "purchase", "purchase"],
    })
    out = ShiftRule("value", 1000.0, when_column="event_type",
                    when_equals="purchase").apply(t)
    assert out["value"].to_pylist() == [1001.0, 2.0, None, 1004.0]
    out2 = ShiftRule("value", 1.0).apply(t)
    assert out2["value"].to_pylist() == [2.0, 3.0, None, 5.0]


@pytest.mark.usefixtures("ray_session")
def test_minhash_recall_vs_bruteforce():
    """LSH candidates must catch (nearly) all truly-similar pairs: recall
    vs brute-force jaccard at a threshold where 16 bands × 4 rows is a
    strong filter (j=0.7 → P(caught) ≈ 1-(1-0.7^4)^16 ≈ 0.99)."""
    import ray.data as rd

    from etl_ray.ops.dedup import jaccard_of_texts, minhash_lsh_candidates

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(30)]
    docs = []
    for i, b in enumerate(base):
        docs.append((2 * i, b))
        words = b.split()
        # near-dup: tweak ONE of 40 words → kills ≤3 of ~38 shingles,
        # jaccard ≈ 0.85
        words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        docs.append((2 * i + 1, " ".join(words)))
    df = pd.DataFrame(docs, columns=["doc_id", "text"])

    truth = set()
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            if jaccard_of_texts(df.text[i], df.text[j]) >= 0.7:
                truth.add((df.doc_id[i], df.doc_id[j]))
    assert len(truth) >= 20  # the construction produces ~30 dup pairs

    ds = rd.from_pandas(df)
    cand = minhash_lsh_candidates(ds, concurrency=2).to_pandas()
    got = set(zip(cand["id_a"], cand["id_b"]))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, (recall, len(truth), len(got))
