"""End-to-end corpus curation — the flagship training-data pipeline
composing the text + dedup operator families:

  read → enrich (language-ID + token count + dup-word fraction, one pass)
       → filter (language + min length + optional Gopher repetition gate)
       → near-dup candidates (MinHash-LSH) → exact Jaccard verify
       → connected components → drop non-canonical cluster members
       → surviving docs with their curation metadata.

Every stage is an existing oracled op (ops/textops.py, ops/dedup.py,
ops/components.py); this module only wires them, so the whole pipeline is
reproducible as one SQL statement (__ray_entry__._sql_corpus_curation).

Scale notes: enrich+filter stream (stateless map_batches, text never
shuffles); the final drop stage is a distributed hash ANTI-JOIN on
doc_id against the cluster table (ops/joins.py anti_join) — the
drop-list never materializes on the driver, so a boilerplate-heavy
corpus whose dup-cluster table has millions of rows still streams. The
cluster table itself stays distributed end-to-end: LSH pairs → connected
components → keep flags → anti-join, no to_pandas anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from etl_ray.functions import text as T


def enrich_documents(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     with_repetition: bool = False):
    """One streaming pass: (doc_id, text, lang_pred, n_words [,
    dup_word_frac]) — the duplicate-word fraction (the cheapest Gopher
    repetition signal) costs an explode + grouped nunique over every
    token, so it is computed only when a repetition gate will read it."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        n = T.word_count(df[text_col]).astype("float64")
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            text_col: df[text_col].to_numpy(),
            "lang_pred": T.detect_lang(df[text_col]),
            "n_words": n.astype("int64"),
        })
        if with_repetition:
            toks = df[text_col].astype(str).str.split().explode().dropna()
            uq = toks.groupby(level=0).nunique()
            out["dup_word_frac"] = 1.0 - uq.reindex(
                range(len(df)), fill_value=0).to_numpy() \
                / np.maximum(n, 1.0)
        return out

    return ds.map_batches(f, batch_format="pandas")


def curate_corpus(sf_dir: str, *, lang: str = "en", min_words: int = 20,
                  threshold: float = 0.3, concurrency: int = 2,
                  max_dup_word_frac: float | None = None):
    """Returns the surviving corpus as a pandas DataFrame
    (doc_id, lang_pred, n_words), sorted by doc_id.
    ``max_dup_word_frac`` adds the Gopher repetition gate to the filter
    stage (docs above the duplicate-word-fraction cut never reach the
    dedup shuffle — cheapest-filter-first ordering)."""
    import ray.data as rd

    from etl_ray.ops.components import dup_clusters
    from etl_ray.ops.dedup import minhash_lsh_candidates, verify_candidates
    from etl_ray.ops.joins import anti_join

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cut = max_dup_word_frac

    def keep_filter(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["lang_pred"] == lang) & (df["n_words"] >= min_words)
        if cut is not None:
            m &= df["dup_word_frac"] <= cut
        return df[m]

    kept = enrich_documents(docs, with_repetition=cut is not None) \
        .map_batches(
            keep_filter, batch_format="pandas",
        ).materialize()  # consumed twice: pair generation + final filter

    cand = minhash_lsh_candidates(kept, concurrency=concurrency)
    pairs = verify_candidates(kept, cand, threshold=threshold)
    def non_canonical(t):  # non-canonical cluster members only
        import pyarrow.compute as pc

        return t.filter(pc.invert(t["keep"])).select(["doc_id"])

    drops = dup_clusters(pairs).map_batches(
        non_canonical, batch_format="pyarrow")
    survivors = anti_join(
        kept.map_batches(
            lambda df: df[["doc_id", "lang_pred", "n_words"]],
            batch_format="pandas"),
        drops, on="doc_id")
    out = survivors.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
