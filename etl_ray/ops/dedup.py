"""Deduplication operators over a documents table.

Exact dedup is the reference's downstream contract (synthetic UUIDs exist so
the dedup step can collapse re-parses — /root/reference/parser/parser.go:
157-176); near-dup variants are the large-scale-training-data extensions.

Scale notes (100 TB): every variant is shuffle-light —
  * exact: md5 content hash computed per batch (vectorized), ONE groupby on
    the hash (pre-deduped within batch first, so the shuffle moves at most
    one row per distinct hash per batch);
  * MinHash-LSH / SimHash: per-batch signature computation, explode to
    (band, band_hash, doc_id) — the groupby moves tiny signature rows, never
    documents; candidate verification re-reads only candidate docs;
  * embedding near-dup: the comparison side is broadcast once via ray.put
    (valid while the index side fits memory; the LSH-bucketed variant in
    similarity.py is the unbounded-scale path).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from etl_ray.functions.text import normalize_for_fingerprint

MERSENNE = (1 << 61) - 1


# --------------------------------------------------------------- exact dedup
def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pandas().fillna("")
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per exact content hash.

    hash per batch → batch-local collapse → groupby(hash) keep min id.
    Returns a Dataset of (content_hash, doc_id-kept).
    """

    def local(batch: pa.Table) -> pa.Table:
        batch = add_content_hash(batch, text_col)
        t = batch.select([id_col, "content_hash"]).sort_by(
            [("content_hash", "ascending"), (id_col, "ascending")]
        )
        h = t["content_hash"].combine_chunks()
        n = len(h)
        if n == 0:
            return t
        neq = pc.not_equal(h.slice(0, n - 1), h.slice(1, n - 1))
        first = pa.chunked_array([pa.array([True]), neq])
        return t.filter(first)

    from ray.data.aggregate import Min

    out = (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
    )
    return out


# ------------------------------------------------------------- MinHash + LSH
def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (int64, deduped)."""
    words = text.split()
    if len(words) < n:
        ngrams = [" ".join(words)] if words else []
    else:
        ngrams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    if not ngrams:
        return np.zeros(0, dtype=np.uint64)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
         for g in ngrams),
        dtype=np.uint64, count=len(ngrams),
    )
    return np.unique(hs)


_SHINGLE_C = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


def _word_shingle_hashes(word_hashes: np.ndarray, doc_of_word: np.ndarray,
                         n: int) -> tuple:
    """Vectorized word n-gram shingle hashes across ALL docs of a batch.

    Shingle hash = polynomial fold of n consecutive word hashes (uint64
    wraparound); shingles that would straddle a doc boundary are masked out.
    Docs shorter than n words get one whole-doc shingle. Returns
    (flat shingle hashes, doc index per shingle).
    """
    m = len(word_hashes)
    if m == 0:
        return (np.zeros(0, np.uint64), np.zeros(0, np.int64))
    acc = word_hashes.copy()
    for k in range(1, n):
        shifted = np.empty_like(word_hashes)
        shifted[:m - k] = word_hashes[k:]
        shifted[m - k:] = 0
        acc = acc * _SHINGLE_C + shifted
    if n > 1:
        valid = np.zeros(m, dtype=bool)
        valid[: m - (n - 1)] = doc_of_word[: m - (n - 1)] == doc_of_word[n - 1:]
    else:
        valid = np.ones(m, dtype=bool)
    sh = acc[valid]
    docs = doc_of_word[valid]
    # short docs (< n words): one fold over what exists
    present = np.unique(doc_of_word)
    covered = np.unique(docs)
    missing = np.setdiff1d(present, covered, assume_unique=True)
    if len(missing):
        extra_h, extra_d = [], []
        starts = np.searchsorted(doc_of_word, missing, side="left")
        ends = np.searchsorted(doc_of_word, missing, side="right")
        for d, s, e in zip(missing, starts, ends):
            h = np.uint64(0)
            for w in word_hashes[s:e]:
                h = h * _SHINGLE_C + w
            extra_h.append(h)
            extra_d.append(d)
        sh = np.concatenate([sh, np.array(extra_h, np.uint64)])
        docs = np.concatenate([docs, np.array(extra_d, np.int64)])
        order = np.argsort(docs, kind="stable")
        sh, docs = sh[order], docs[order]
    return sh, docs


class MinHasher:
    """Stateful minhash stage: hash coefficients drawn once per worker from a
    fixed seed (reference pattern: per-process dictionaries, SURVEY.md §2.6).
    Fully vectorized: word hashes via pandas hash_array, shingles via a
    polynomial fold, per-doc minima via ``np.minimum.reduceat`` — no Python
    loop over documents in the hot path."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 97):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col

    def _minhash(self, sh: np.ndarray) -> np.ndarray:
        """(S,) shingle hashes → (P,) signature."""
        v = (self.a[:, None] * (sh[None, :] % MERSENNE) + self.b[:, None]) \
            % MERSENNE
        return v.min(axis=1)

    def signature(self, text: str) -> np.ndarray:
        words = np.array(text.split(), dtype=object)
        if len(words) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        wh = pd.util.hash_array(words)
        sh, _ = _word_shingle_hashes(wh, np.zeros(len(wh), np.int64),
                                     self.shingle_n)
        return self._minhash(sh)

    def signatures(self, texts: pd.Series) -> np.ndarray:
        """(n_docs, num_perm) signatures, vectorized across the batch."""
        n = len(texts)
        words = texts.str.split()
        lengths = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        doc_of_word = np.repeat(np.arange(n), lengths)
        flat = words.explode().dropna().to_numpy(dtype=object)
        sigs = np.zeros((n, self.num_perm), dtype=np.uint64)
        if len(flat) == 0:
            return sigs
        wh = pd.util.hash_array(flat)
        sh, docs = _word_shingle_hashes(wh, doc_of_word, self.shingle_n)
        if len(sh) == 0:
            return sigs
        # per-(perm, doc) minima in one reduceat per perm dimension
        v = (self.a[:, None] * (sh[None, :] % MERSENNE) + self.b[:, None]) \
            % MERSENNE
        starts = np.searchsorted(docs, np.arange(n), side="left")
        present = np.unique(docs)
        mins = np.minimum.reduceat(v, starts[present], axis=1)
        sigs[present] = mins.T
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into one row per LSH band:
        (band, band_hash, doc_id)."""
        texts = normalize_for_fingerprint(batch[self.text_col].to_pandas())
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        sigs = self.signatures(texts)  # (n, P)
        sb = sigs.reshape(n, self.bands, self.rows_per_band)
        # band key = polynomial fold of the band's minhash values
        key = np.zeros((n, self.bands), dtype=np.uint64)
        for r in range(self.rows_per_band):
            key = key * _SHINGLE_C + sb[:, :, r]
        band_idx = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                "band": pa.array(band_idx),
                "band_hash": pa.array(key.reshape(-1).astype(np.int64)
                                      .view(np.uint64)),
                "doc_id": pa.array(np.repeat(ids, self.bands)),
            }
        )


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(df["doc_id"]))
    dtype = df["doc_id"].dtype
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype=dtype),
                             "id_b": pd.Series([], dtype=dtype)})
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
    return pd.DataFrame({"id_a": pd.Series(a, dtype=dtype),
                         "id_b": pd.Series(b, dtype=dtype)})


def minhash_lsh_candidates(ds, *, num_perm: int = 64, bands: int = 16,
                           shingle_n: int = 3, text_col: str = "text",
                           id_col: str = "doc_id", concurrency: int = 4):
    """Candidate near-dup pairs via MinHash banding; returns a Dataset of
    unique (id_a, id_b)."""
    # constructed instance → task pool: the hash coefficients are tiny, and
    # a per-execution actor pool costs ~1s/actor in spawn (see EngineConfig.
    # use_actor_pool); pass the CLASS + concurrency for heavy-state variants
    sig = ds.map_batches(
        MinHasher(num_perm=num_perm, bands=bands, shingle_n=shingle_n,
                  text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
    pairs = (
        sig.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    # dedupe pairs across bands (tiny relative to the corpus)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def jaccard_of_texts(text_a: str, text_b: str, n: int = 3) -> float:
    # normalize exactly like candidate generation (MinHasher applies
    # normalize_for_fingerprint) so verification measures the same quantity
    # the LSH models — case/whitespace-only variants verify as jaccard 1.0
    text_a = " ".join((text_a or "").lower().split())
    text_b = " ".join((text_b or "").lower().split())
    a = set(_shingle_hashes(text_a, n).tolist())
    b = set(_shingle_hashes(text_b, n).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a | b), 1)


def verify_jaccard(pairs_df: pd.DataFrame, docs_df: pd.DataFrame, *,
                   threshold: float, n: int = 3,
                   text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Exact n-gram Jaccard over CANDIDATE pairs only (candidates are small
    by construction; docs_df holds just the candidate docs)."""
    texts = docs_df.set_index(id_col)[text_col]
    out = []
    for r in pairs_df.itertuples(index=False):
        j = jaccard_of_texts(texts.get(r.id_a, ""), texts.get(r.id_b, ""), n)
        if j >= threshold:
            out.append((r.id_a, r.id_b, j))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


# ------------------------------------------------------------------- SimHash
class SimHasher:
    """64-bit SimHash per doc from word-feature hashes; actor-pool stage."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> int:
        words = text.split()
        if not words:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
             for w in words),
            dtype=np.uint64, count=len(words),
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = normalize_for_fingerprint(batch[self.text_col].to_pandas())
        sh = np.array([self.simhash64(t) for t in texts], dtype=np.uint64)
        out = pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(sh, type=pa.uint64()),
            }
        )
        # 4 × 16-bit chunks: near-dups within hamming distance 3 share at
        # least one chunk (pigeonhole) → banding key for the groupby
        chunks = [((sh >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int64)
                  for i in range(4)]
        for i, c in enumerate(chunks):
            out = out.append_column(f"chunk{i}", pa.array(c))
        return out


def simhash_candidates(ds, *, max_hamming: int = 3, text_col: str = "text",
                       id_col: str = "doc_id", concurrency: int = 4):
    """Near-dup pairs by SimHash banding + exact hamming verify inside each
    16-bit-chunk bucket."""
    import ray.data as rd

    sigs = ds.map_batches(
        SimHasher(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        tabs = []
        for i in range(4):
            tabs.append(pa.table({
                id_col: batch[id_col],
                "simhash": batch["simhash"],
                "bucket": pc.add(pc.multiply(batch[f"chunk{i}"], 4), i),
            }))
        return pa.concat_tables(tabs)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(id_col).sort_values(id_col)
        dtype = df[id_col].dtype
        if len(df) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=dtype),
                                 "id_b": pd.Series([], dtype=dtype),
                                 "hamming": pd.Series([], dtype="int64")})
        ids = df[id_col].to_numpy()
        sh = df["simhash"].to_numpy().astype(np.uint64)
        out = []
        for i in range(len(ids)):
            x = sh[i] ^ sh[i + 1:]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for j in np.flatnonzero(ham <= max_hamming):
                out.append((ids[i], ids[i + 1 + j], int(ham[j])))
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype=dtype),
                                 "id_b": pd.Series([], dtype=dtype),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])

    cand = sigs.map_batches(explode, batch_format="pyarrow").groupby(
        "bucket").map_groups(pairs, batch_format="pandas")
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def minhash_near_dups(ds, *, threshold: float = 0.5, num_perm: int = 64,
                      bands: int = 16, shingle_n: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      concurrency: int = 4):
    """Full near-dup pipeline: MinHash-LSH candidates → exact n-gram Jaccard
    verification over ONLY the candidate docs.

    The verify step fetches just the candidate documents (a distributed
    filter against the broadcast candidate-id set — candidates are tiny by
    LSH design) and checks exact Jaccard on the driver. Returns a pandas
    DataFrame (id_a, id_b, jaccard ≥ threshold).
    """
    import pyarrow.compute as pc

    cand = minhash_lsh_candidates(
        ds, num_perm=num_perm, bands=bands, shingle_n=shingle_n,
        text_col=text_col, id_col=id_col, concurrency=concurrency,
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    ids = sorted(set(cand["id_a"]) | set(cand["id_b"]))
    id_set = pa.array(ids)
    docs = (
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t[id_col], value_set=id_set)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = verify_jaccard(cand, docs, threshold=threshold, n=shingle_n,
                         text_col=text_col, id_col=id_col)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
