"""End-to-end corpus curation — the flagship training-data pipeline
composing the text + dedup operator families:

  read → enrich (language-ID + whitespace token count, one pass)
       → filter (language + min length)
       → near-dup candidates (MinHash-LSH) → exact Jaccard verify
       → connected components → drop non-canonical cluster members
       → surviving docs with their curation metadata.

Every stage is an existing oracled op (ops/textops.py, ops/dedup.py,
ops/components.py); this module only wires them, so the whole pipeline is
reproducible as one SQL statement (__ray_entry__._sql_corpus_curation).

Scale notes: enrich+filter stream (stateless map_batches, text never
shuffles); the pair list after LSH banding and verification is orders of
magnitude smaller than the corpus, so the cluster drop-list is collected
and BROADCAST (ray.put) into the final filter — the small-side-lookup
pattern. If a corpus ever produced a drop-list too big to broadcast, swap
the final stage for a hash anti-join on doc_id (Dataset.join left_outer +
null filter); the wiring point is marked below.
"""

from __future__ import annotations

import os

import pandas as pd

from etl_ray.functions import text as T


def enrich_documents(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """One streaming pass: (doc_id, text, lang_pred, n_words)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            text_col: df[text_col].to_numpy(),
            "lang_pred": T.detect_lang(df[text_col]),
            "n_words": T.word_count(df[text_col]),
        })

    return ds.map_batches(f, batch_format="pandas")


def curate_corpus(sf_dir: str, *, lang: str = "en", min_words: int = 20,
                  threshold: float = 0.3, concurrency: int = 2):
    """Returns the surviving corpus as a pandas DataFrame
    (doc_id, lang_pred, n_words), sorted by doc_id."""
    import ray
    import ray.data as rd

    from etl_ray.ops.components import dup_clusters
    from etl_ray.ops.dedup import minhash_lsh_candidates, verify_candidates

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    kept = enrich_documents(docs).map_batches(
        lambda df: df[(df["lang_pred"] == lang)
                      & (df["n_words"] >= min_words)],
        batch_format="pandas",
    ).materialize()  # consumed twice: pair generation + final filter

    cand = minhash_lsh_candidates(kept, concurrency=concurrency)
    pairs = verify_candidates(kept, cand, threshold=threshold)
    clusters = dup_clusters(pairs).to_pandas()  # small: nodes-in-pairs only
    drop = set(clusters.loc[~clusters["keep"], "doc_id"].tolist())

    # broadcast drop-list; swap for a hash anti-join if it outgrows a task
    drop_ref = ray.put(drop)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        out = df[~df["doc_id"].isin(d)]
        return out[["doc_id", "lang_pred", "n_words"]]

    out = kept.map_batches(final, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
