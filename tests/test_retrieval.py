"""BM25 / TF-IDF retrieval ops (etl_ray/ops/retrieval.py)."""

import math

import ray.data as rd

from etl_ray.ops.retrieval import (bm25_scores, bm25_topk, doc_frequencies,
                                   tfidf_weights)

DOCS = [
    {"doc_id": 1, "text": "apple banana apple"},
    {"doc_id": 2, "text": "banana cherry"},
    {"doc_id": 3, "text": "cherry cherry cherry date"},
    {"doc_id": 4, "text": ""},
    {"doc_id": 5, "text": None},
]


def test_doc_frequencies(ray_session):
    out = doc_frequencies(rd.from_items(DOCS)).to_pandas()
    got = dict(zip(out["token"], out["df"]))
    assert got == {"apple": 1, "banana": 2, "cherry": 2, "date": 1}


def test_bm25_scores_hand_check(ray_session):
    out = bm25_scores(rd.from_items(DOCS), ["cherry"]).to_pandas()
    got = dict(zip(out["doc_id"], out["score"]))
    assert set(got) == {2, 3}
    # hand-compute doc 2: N=5, df=2, dl=2, avgdl=(3+2+4+0+0)/5=1.8, tf=1
    idf = math.log(1 + (5 - 2 + 0.5) / (2 + 0.5))
    norm = 1.2 * (1 - 0.75 + 0.75 * 2 / 1.8)
    exp = idf * 1 * 2.2 / (1 + norm)
    assert abs(got[2] - exp) < 1e-12
    # doc 3 has higher tf ⇒ higher score
    assert got[3] > got[2]


def test_bm25_topk_order(ray_session):
    top = bm25_topk(rd.from_items(DOCS), ["cherry", "banana"], k=2)
    assert len(top) == 2
    # doc 2 matches BOTH terms, beating doc 3's single high-tf term
    assert list(top["doc_id"]) == [2, 3]


def test_tfidf_weights(ray_session):
    out = tfidf_weights(rd.from_items(DOCS), ["apple", "cherry"]).to_pandas()
    w = {(r.doc_id, r.term): r.weight for r in out.itertuples()}
    assert set(w) == {(1, "apple"), (2, "cherry"), (3, "cherry")}
    assert abs(w[(1, "apple")] - 2 * math.log(6 / 2)) < 1e-12
    assert abs(w[(3, "cherry")] - 3 * math.log(6 / 3)) < 1e-12


def test_enrich_documents(ray_session):
    from etl_ray.pipelines.curation import enrich_documents

    ds = rd.from_items([
        {"doc_id": 1, "text": "the cat and the hat is that"},
        {"doc_id": 2, "text": "der hund und die katze ist nicht"},
        {"doc_id": 3, "text": "xyzzy plugh"},
    ])
    out = enrich_documents(ds).to_pandas().sort_values("doc_id")
    assert list(out["lang_pred"]) == ["en", "de", "unk"]
    assert list(out["n_words"]) == [7, 7, 2]
