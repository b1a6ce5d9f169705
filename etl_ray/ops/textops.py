"""Text-analysis pipelines over the documents table (language-ID, quality
scoring, token counting, fingerprinting) — vectorized map_batches stages
wrapping etl_ray.functions.text kernels."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from etl_ray.functions import text as T


def quality_scores(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc quality signals (lengths, punctuation, stopword ratio)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = T.quality_metrics(df[text_col])
        out.insert(0, id_col, df[id_col].to_numpy())
        return out

    return ds.map_batches(f, batch_format="pandas")


def token_counts(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace and BPE-ish token counts per document."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_ws_tokens": T.word_count(df[text_col]),
                "n_bpe_tokens": T.bpe_token_count(df[text_col]),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def language_id(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Stopword-profile language heuristic per document."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "lang_pred": T.detect_lang(df[text_col]),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """md5 fingerprint of normalized text (exact-dedup key) plus a winnowed
    rolling-hash fingerprint length (near-dup building block)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fp = T.fingerprint_md5(df[text_col])
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "fingerprint": fp,
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def top_tokens(ds, *, text_col: str = "text", k: int = 50) -> pd.DataFrame:
    """Global top-k vocabulary heavy hitters with a DETERMINISTIC
    tie-break (count desc, token asc). The corpus collapses combiner-first
    to one row per distinct token (see token_histogram — data rows never
    shuffle); only that small aggregated table is sorted/limited on the
    driver. For open-ended vocabularies where even the distinct-token
    table is huge, pre-filter candidates with the CMS sketch
    (ops/sketches.py) and verify exactly."""
    h = token_histogram(ds, text_col=text_col).to_pandas()
    h = h.sort_values(["n", "token"], ascending=[False, True]).head(k)
    return h.reset_index(drop=True)


def doc_entropy(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon entropy (nats) of the whitespace-token
    histogram — a repetitiveness/diversity quality score (boilerplate and
    keyword-stuffed pages score low). Zero shuffle: a document is one row,
    so the whole computation is batch-local — explode + two grouped sums,
    no per-row Python. Empty documents are dropped (no distribution to
    score). Returns (id, n_tok, entropy) rounded to 4 decimals."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[text_col].astype(str).str.split().explode().dropna()
        if len(toks) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=df[id_col].dtype),
                                 "n_tok": pd.Series([], dtype="int64"),
                                 "entropy": pd.Series([], dtype="float64")})
        fr = pd.DataFrame({"r": toks.index.to_numpy(),
                           "t": toks.to_numpy()})
        c = fr.groupby(["r", "t"], sort=True).size()
        row = c.index.get_level_values(0).to_numpy()
        tot = c.groupby(level=0).sum()
        p = c.to_numpy(dtype=np.float64) / tot.reindex(row).to_numpy(
            dtype=np.float64)
        plogp = pd.Series(p * np.log(p)).groupby(row).sum()
        ent = np.round(-plogp.to_numpy(), 4) + 0.0  # normalize -0.0
        keep = tot.index.to_numpy()
        return pd.DataFrame({
            id_col: df[id_col].iloc[keep].to_numpy(),
            "n_tok": tot.to_numpy(dtype="int64"),
            "entropy": ent,
        })

    return ds.map_batches(f, batch_format="pandas")


def token_histogram(ds, *, text_col: str = "text"):
    """Corpus-wide vocabulary histogram: whitespace tokens → (token, n).

    The canonical pre-training corpus statistic. Scale shape: tokens are
    counted WITHIN each batch first (pandas explode + value_counts — no
    Python loop), so the shuffle moves one row per DISTINCT token per
    batch, and the combine is a hash-aggregate Sum; rows never move."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # drop nulls BEFORE astype(str): a null text would otherwise count
        # a literal 'None' token (the oracle's trim(text) <> '' already
        # excludes nulls — keep the engine aligned)
        toks = df.loc[df[text_col].notna(), text_col] \
            .astype(str).str.split().explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(dtype="int64")})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )


# PII scrub rules, ordered: emails first (their local parts contain digits
# a later pattern must not see), then dotted quads, then +international
# phone runs. RE2 syntax ONLY — Arrow's replace_substring_regex and the
# DuckDB oracle's regexp_replace both run RE2, so the masked text is
# bit-identical across engines. The free-text analog of the shipped
# field-rule scrubs in etl_ray/ndtresult.py (the reference nulls client
# network identity before rows reach the lake,
# /root/reference/parser/ndt7_result.go:65-134).
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 \-]{7,}[0-9]", "<PHONE>"),
)


def scrub_pii(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Mask emails, IPv4 addresses and international phone numbers in a
    text corpus → (id, text_clean, n_email, n_ip, n_phone).

    Stateless vectorized map_batches: one compiled-RE2 pass per rule over
    the Arrow string column, zero Python per row; counts are taken on the
    progressively-scrubbed text so the rule chain is order-exact
    (reproducible in SQL as nested regexp_replace). Streams at any corpus
    size — nothing shuffles, nothing reaches the driver."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        cols = {id_col: t[id_col]}
        counts = {}
        for name, pat, rep in PII_RULES:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64())
            txt = pc.replace_substring_regex(txt, pat, rep)
        cols["text_clean"] = txt
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def repetition_scores(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition quality signals per document → (id, n_tok,
    dup_word_frac, top_word_frac, top_bigram_frac, dup_trigram_frac).

    The staple heuristics pre-training curation applies before any model
    sees the text (Rae et al. 2021 "Scaling Language Models" table A1;
    C4/RefinedWeb use the same family): a page whose most frequent bigram
    covers a third of the text, or whose trigrams are mostly repeats, is
    boilerplate or keyword stuffing. Definitions (whitespace tokens):

      dup_word_frac    = 1 - unique_words / n_tok
      top_word_frac    = count(most frequent word) / n_tok
      top_bigram_frac  = count(most frequent bigram) / n_bigrams (0 if none)
      dup_trigram_frac = 1 - unique_trigrams / n_trigrams     (0 if none)

    Zero shuffle — a document is one row, so everything is batch-local.
    Vectorization mirrors doc_entropy: one explode, consecutive-token
    n-grams built by shifted-array concat gated on same-row masks, grouped
    sums — no per-row Python. Empty documents are dropped (no tokens to
    score). Fractions rounded to 4 decimals for stable cross-engine
    comparison."""

    def _gram_stats(r: np.ndarray, g: pd.Series, n_docs: int):
        """(max count, total, unique) per row index for gram series g
        grouped by row ids r; rows absent from r get (0, 0, 0)."""
        out = np.zeros((n_docs, 3), dtype=np.int64)
        if len(g) == 0:
            return out
        c = pd.DataFrame({"r": r, "g": g.to_numpy()}).groupby(
            ["r", "g"], sort=False).size()
        rows = c.index.get_level_values(0).to_numpy()
        byrow = c.groupby(rows)
        mx = byrow.max()
        idx = mx.index.to_numpy()
        out[idx, 0] = mx.to_numpy()
        out[idx, 1] = byrow.sum().to_numpy()
        out[idx, 2] = byrow.size().to_numpy()
        return out

    def f(df: pd.DataFrame) -> pd.DataFrame:
        # null text has no tokens to score — drop it BEFORE astype(str)
        # turns it into a literal 'None' token (matches the oracle's
        # NULL/empty exclusion)
        df = df[df[text_col].notna()].reset_index(drop=True)
        toks = df[text_col].astype(str).str.split().explode().dropna()
        toks = toks[toks != ""]
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=df[id_col].dtype),
            "n_tok": pd.Series([], dtype="int64"),
            "dup_word_frac": pd.Series([], dtype="float64"),
            "top_word_frac": pd.Series([], dtype="float64"),
            "top_bigram_frac": pd.Series([], dtype="float64"),
            "dup_trigram_frac": pd.Series([], dtype="float64"),
        })
        if len(toks) == 0:
            return empty
        r = toks.index.to_numpy()
        t = pd.Series(toks.to_numpy(), copy=False)
        n = len(df)
        w = _gram_stats(r, t, n)
        m2 = r[1:] == r[:-1]
        bg = (t.iloc[:-1].reset_index(drop=True) + " " +
              t.iloc[1:].reset_index(drop=True))[m2]
        b = _gram_stats(r[:-1][m2], bg, n)
        m3 = r[2:] == r[:-2]
        tg = (t.iloc[:-2].reset_index(drop=True) + " " +
              t.iloc[1:-1].reset_index(drop=True) + " " +
              t.iloc[2:].reset_index(drop=True))[m3]
        g3 = _gram_stats(r[:-2][m3], tg, n)
        keep = w[:, 1] > 0
        n_tok = w[keep, 1].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            dup_w = 1.0 - w[keep, 2] / n_tok
            top_w = w[keep, 0] / n_tok
            top_b = np.where(b[keep, 1] > 0, b[keep, 0] / b[keep, 1], 0.0)
            dup_t = np.where(g3[keep, 1] > 0,
                             1.0 - g3[keep, 2] / np.maximum(g3[keep, 1], 1),
                             0.0)
        # round half-AWAY-from-zero (floor(x*1e4+0.5)/1e4): numpy's
        # banker's rounding and SQL round() disagree on exact dyadic
        # ties like 1/32 = 0.03125; this form is identical in both.
        def r4(x):
            return np.floor(x * 1e4 + 0.5) / 1e4 + 0.0

        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "n_tok": w[keep, 1],
            "dup_word_frac": r4(dup_w),
            "top_word_frac": r4(top_w),
            "top_bigram_frac": r4(top_b),
            "dup_trigram_frac": r4(dup_t),
        })

    return ds.map_batches(f, batch_format="pandas")


def token_id_histogram(ds, *, tokens_col: str = "tokens"):
    """Corpus unigram distribution over NATIVE token arrays — the
    tokens-payload analog of token_histogram (which counts text words):
    (token_id, n) for every id in every sequence. The first statistic a
    tokenizer/vocab audit asks of a pre-tokenized lake.

    Scale shape: combiner-first — each batch flattens its lists zero-copy
    (list_flatten) and collapses to one row per distinct id via bincount
    before the shuffle, so the exchange moves at most |vocab-seen| rows
    per batch, never the token stream."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def per_batch(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t[tokens_col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            return pa.table({"token_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ids, counts = np.unique(flat, return_counts=True)
        return pa.table({"token_id": pa.array(ids),
                         "n": pa.array(counts.astype(np.int64))})

    return (ds.map_batches(per_batch, batch_format="pyarrow")
            .groupby("token_id").aggregate(Sum("n", alias_name="n")))


def oov_rates(ds, *, text_col: str = "text", id_col: str = "doc_id",
              vocab_k: int = 200):
    """Per-document out-of-vocabulary rate against the corpus's own top-k
    vocabulary — the noise detector that catches mojibake, boilerplate
    markup and wrong-language residue curation filters miss (a normal doc
    draws most tokens from the head of the corpus distribution).

    Two passes, both scale-shaped: (1) the corpus histogram collapses
    combiner-first and only the k-row vocab reaches the driver (see
    top_tokens); (2) the vocab broadcasts once via ray.put and each batch
    counts membership with a sorted-array searchsorted — zero shuffle,
    the corpus streams. Returns (id, n_tok, n_oov, oov_rate) with the
    rate rounded half-away-from-zero to 4 decimals (SQL round parity);
    empty docs are dropped."""
    import ray

    vocab = top_tokens(ds, text_col=text_col, k=vocab_k)["token"]
    vref = ray.put(np.sort(vocab.to_numpy().astype(str)))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vref)
        df = df[df[text_col].notna()].reset_index(drop=True)
        toks = df[text_col].astype(str).str.split().explode().dropna()
        toks = toks[toks != ""]
        if len(toks) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=df[id_col].dtype),
                "n_tok": pd.Series([], dtype="int64"),
                "n_oov": pd.Series([], dtype="int64"),
                "oov_rate": pd.Series([], dtype="float64"),
            })
        r = toks.index.to_numpy()
        t = toks.to_numpy().astype(str)
        pos = np.searchsorted(v, t)
        inv = (pos < len(v)) & (v[np.minimum(pos, len(v) - 1)] == t)
        n_tok = np.bincount(r, minlength=len(df))
        n_oov = np.bincount(r[~inv], minlength=len(df))
        keep = n_tok > 0
        rate = np.floor(n_oov[keep] / n_tok[keep] * 1e4 + 0.5) / 1e4
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "n_tok": n_tok[keep].astype("int64"),
            "n_oov": n_oov[keep],
            "oov_rate": rate + 0.0,
        })

    return ds.map_batches(f, batch_format="pandas")


def source_quality_report(ds, *, source_col: str = "source",
                          text_col: str = "text"):
    """Per-source corpus quality rollup — the dashboard that drives
    mixture decisions: (source, n_docs, total_chars, total_words,
    stop_ratio, punct_ratio), ratios computed from EXACT integer totals
    (mergeable sums; no mean-of-means bias) and rounded half-away to 4
    decimals. Combiner-first: each batch collapses to one row per source
    before the shuffle; the final table is |sources| rows."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("")
        g = pd.DataFrame({
            source_col: df[source_col].to_numpy(),
            "n_docs": np.int64(1),
            "total_chars": t.str.len().to_numpy(dtype=np.int64),
            "total_words": T.word_count(t),
            "_stop": T.stopword_count(t),
            "_punct": t.str.count(r"[^\w\s]").to_numpy(dtype=np.int64),
        })
        return g.groupby(source_col, as_index=False).sum()

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby(source_col)
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("total_chars", alias_name="total_chars"),
                      Sum("total_words", alias_name="total_words"),
                      Sum("_stop", alias_name="_stop"),
                      Sum("_punct", alias_name="_punct")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        w = np.maximum(df["total_words"].to_numpy(dtype=np.float64), 1.0)
        c = np.maximum(df["total_chars"].to_numpy(dtype=np.float64), 1.0)
        df = df.copy()
        df["stop_ratio"] = np.floor(
            df["_stop"].to_numpy() / w * 1e4 + 0.5) / 1e4 + 0.0
        df["punct_ratio"] = np.floor(
            df["_punct"].to_numpy() / c * 1e4 + 0.5) / 1e4 + 0.0
        return df.drop(columns=["_stop", "_punct"])

    return agg.map_batches(finish, batch_format="pandas")
