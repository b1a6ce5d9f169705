"""repetition_scores: Gopher-style per-doc repetition quality signals."""
import numpy as np
import pyarrow as pa
import pytest


def _run(texts):
    import ray.data as rd

    from etl_ray.ops.textops import repetition_scores

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    return (repetition_scores(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_repetition_scores_hand_computed():
    out = _run([
        "a b a b a b",      # 6 toks, 2 uniq; top word 'a'x3; bigrams:
                            # "a b"x3 "b a"x2 of 5; trigrams 4, 2 uniq
        "x y z",            # all unique, no repeated grams
        "q q q q",          # total repetition
    ])
    r = out.iloc[0]
    assert r["n_tok"] == 6
    assert r["dup_word_frac"] == pytest.approx(1 - 2 / 6, abs=1e-4)
    assert r["top_word_frac"] == pytest.approx(3 / 6, abs=1e-4)
    assert r["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-4)
    assert r["dup_trigram_frac"] == pytest.approx(1 - 2 / 4, abs=1e-4)
    r = out.iloc[1]
    assert r["dup_word_frac"] == 0.0
    assert r["top_bigram_frac"] == pytest.approx(1 / 2, abs=1e-4)
    assert r["dup_trigram_frac"] == 0.0  # 1 trigram, unique
    r = out.iloc[2]
    assert r["dup_word_frac"] == pytest.approx(3 / 4, abs=1e-4)
    assert r["top_word_frac"] == 1.0
    assert r["top_bigram_frac"] == 1.0
    assert r["dup_trigram_frac"] == pytest.approx(1 - 1 / 2, abs=1e-4)


@pytest.mark.usefixtures("ray_session")
def test_repetition_scores_edges():
    # empty / whitespace-only docs are dropped; single-token docs score 0
    # on the gram fractions instead of dividing by zero
    out = _run(["", "   ", "solo", "two words"])
    assert out["doc_id"].tolist() == [2, 3]
    solo = out.iloc[0]
    assert solo["n_tok"] == 1
    assert solo["top_word_frac"] == 1.0
    assert solo["top_bigram_frac"] == 0.0
    assert solo["dup_trigram_frac"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_repetition_scores_rounding_is_half_away_from_zero():
    # 1/32 = 0.03125 exactly: numpy's default banker's rounding gives
    # 0.0312, SQL round() gives 0.0313 — the op must match SQL
    x = np.floor((1 / 32) * 1e4 + 0.5) / 1e4
    assert x == 0.0313
    # 31 unique trigrams out of 32: doc with 34 tokens, one repeated
    # trigram window
    toks = [f"t{i}" for i in range(31)] + ["t0", "t1", "t2"]
    out = _run([" ".join(toks)])
    assert out.iloc[0]["dup_trigram_frac"] == 0.0313


@pytest.mark.usefixtures("ray_session")
def test_oov_rates_hand_case():
    import pyarrow as pa
    import ray.data as rd

    from etl_ray.ops.textops import oov_rates

    # counts: a=3, z=3, b=2, x=1 -> top-2 vocab {a, z} (count desc,
    # token asc tie-break)
    texts = ["a a b x", "a b", "z z z", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = (oov_rates(ds, vocab_k=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 2]  # empty doc dropped
    assert out["n_oov"].tolist() == [2, 1, 0]
    assert out["oov_rate"].tolist() == [0.5, 0.5, 0.0]


@pytest.mark.usefixtures("ray_session")
def test_vocab_and_oov_ignore_null_text():
    import pyarrow as pa
    import ray.data as rd

    from etl_ray.ops.textops import oov_rates, token_histogram

    # many null-text docs must NOT put a literal 'None' token in the
    # vocab (the oracle's trim(text) <> '' excludes nulls)
    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["a b", "a c", None, None, None, None],
                         pa.string()),
    })
    h = token_histogram(rd.from_arrow(t)).to_pandas()
    assert "None" not in set(h["token"])
    out = oov_rates(rd.from_arrow(t), vocab_k=1).to_pandas()
    assert out["doc_id"].tolist() == [0, 1]  # null docs dropped
