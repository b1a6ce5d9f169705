"""Sparse retrieval over the documents table: document frequencies, TF-IDF
weights and BM25 scoring.

The reference engine has no retrieval stage (its lookups are key joins,
e.g. the annotation joins in SURVEY.md §2.7); this is the training-data
analog a corpus pipeline needs — "find documents matching a term query,
ranked" — built Ray-Data-first:

  pass 1 (corpus stats): one ``map_batches`` computes a COMPACT per-doc
    stat row (doc length + per-query-term tf, one int64 column per term) —
    a few dozen bytes/doc regardless of text size. ``doc_frequencies``
    likewise collapses to one row per DISTINCT (batch, token) before its
    Sum aggregate, so the shuffle never moves full text.
  pass 2 (scoring): N / avgdl / df are a handful of scalars broadcast into
    a stateless ``map_batches`` over the compact stats; scoring is pure
    numpy. Nothing wide happens after the first pre-aggregation.

At 100 TB the compact stats table is ~1e-4 of the corpus bytes; persist it
with ``write_parquet`` between passes if the two consumers shouldn't
recompute pass 1 (here it is materialized once and reused).

BM25 formula: Robertson idf with the +1 floor (the Lucene form),
``idf = ln(1 + (N - df + .5)/(df + .5))``;
``score = Σ_j idf_j · tf_j(k1+1) / (tf_j + k1(1 - b + b·dl/avgdl))``.
Tokens are whitespace-delimited, matching functions/text.py word_count and
the DuckDB oracle's regexp_split_to_array.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def doc_frequencies(ds, *, text_col: str = "text"):
    """(token, df): number of documents containing the token at least
    once. Batch-local distinct first — each document lives wholly in one
    row, so per-batch distinct doc counts Sum to the exact global df."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = (df[text_col].fillna("").astype(str).str.split().explode().dropna()
                .reset_index())  # (row index = doc, token)
        toks.columns = ["_doc", "token"]
        u = toks.drop_duplicates()
        vc = u["token"].value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "df": vc.to_numpy(dtype="int64")})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )


def _term_stats(ds, terms, text_col: str, id_col: str):
    """Compact per-doc stats: (doc_id, dl, tf_0..tf_{m-1})."""
    pats = [re.compile(r"(?<!\S)" + re.escape(t) + r"(?!\S)") for t in terms]

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("").astype(str)
        out = {id_col: df[id_col].to_numpy(),
               "dl": t.str.count(r"\S+").to_numpy(dtype="int64")}
        for j, pat in enumerate(pats):
            out[f"tf_{j}"] = t.str.count(pat).to_numpy(dtype="int64")
        return pd.DataFrame(out)

    return ds.map_batches(stats, batch_format="pandas")


def bm25_scores(ds, terms, *, k1: float = 1.2, b: float = 0.75,
                text_col: str = "text", id_col: str = "doc_id"):
    """Score every document against ``terms``; returns a Dataset of
    (doc_id, score) for documents with score > 0."""
    stats = _term_stats(ds, terms, text_col, id_col).materialize()

    agg = stats.map_batches(
        lambda df: pd.DataFrame({
            "n": [len(df)], "sum_dl": [int(df["dl"].sum())],
            **{f"df_{j}": [int((df[f"tf_{j}"] > 0).sum())]
               for j in range(len(terms))},
        }),
        batch_format="pandas",
    ).sum(["n", "sum_dl"] + [f"df_{j}" for j in range(len(terms))])
    n = agg["sum(n)"]
    avgdl = agg["sum(sum_dl)"] / max(n, 1)
    idf = np.array([
        np.log(1.0 + (n - agg[f"sum(df_{j})"] + 0.5)
               / (agg[f"sum(df_{j})"] + 0.5))
        for j in range(len(terms))
    ])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(dtype="float64")
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(df))
        for j in range(len(terms)):
            tf = df[f"tf_{j}"].to_numpy(dtype="float64")
            s += idf[j] * tf * (k1 + 1.0) / (tf + norm)
        keep = s > 0
        return pd.DataFrame({id_col: df[id_col].to_numpy()[keep],
                             "score": s[keep]})

    return stats.map_batches(score, batch_format="pandas")


def bm25_topk(ds, terms, *, k: int = 10, k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """Top-k BM25 documents: per-batch partial top-k (np.argpartition),
    then a driver-side merge of ≤ k rows per batch — the same
    partial-then-tiny-reduce shape as ops/similarity.CosineTopK."""
    scores = bm25_scores(ds, terms, k1=k1, b=b, text_col=text_col,
                         id_col=id_col)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) <= k:
            return df
        idx = np.argpartition(-df["score"].to_numpy(), k - 1)[:k]
        return df.iloc[idx]

    out = scores.map_batches(partial_topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["score", id_col], ascending=[False, True])
    return out.head(k).reset_index(drop=True)


def tfidf_weights(ds, terms, *, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Per-(doc, term) smoothed TF-IDF, the sklearn-style smooth idf kept
    deliberately SQL-reproducible: weight = tf · ln((1 + N) / (1 + df))."""
    stats = _term_stats(ds, terms, text_col, id_col).materialize()
    agg = stats.map_batches(
        lambda df: pd.DataFrame({
            "n": [len(df)],
            **{f"df_{j}": [int((df[f"tf_{j}"] > 0).sum())]
               for j in range(len(terms))},
        }),
        batch_format="pandas",
    ).sum(["n"] + [f"df_{j}" for j in range(len(terms))])
    n = agg["sum(n)"]
    idf = np.array([np.log((1.0 + n) / (1.0 + agg[f"sum(df_{j})"]))
                    for j in range(len(terms))])

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for j, term in enumerate(terms):
            tf = df[f"tf_{j}"].to_numpy(dtype="float64")
            keep = tf > 0
            frames.append(pd.DataFrame({
                id_col: df[id_col].to_numpy()[keep],
                "term": term,
                "weight": tf[keep] * idf[j],
            }))
        return pd.concat(frames, ignore_index=True)

    return stats.map_batches(weigh, batch_format="pandas")
