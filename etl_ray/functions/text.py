"""Text-analysis kernels for the documents table — language-ID, quality
scoring, token counting, fingerprinting.

All operate on pandas Series / numpy vectors (used inside ``map_batches``;
never per-row Python in the dataset hot path). The simple definitions are
deliberately reproducible in DuckDB SQL so the driver's oracle can verify
them value-for-value (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

WORD_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs (a public
# GPT-2-style pattern simplified to be regex-engine portable)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")

STOPWORDS = ("the", "a", "and", "of", "to")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un", "une"},
    "es": {"el", "la", "los", "y", "es", "un", "una"},
}


def word_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count; equals DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` for non-empty text."""
    return texts.fillna("").str.count(r"\S+").to_numpy(dtype=np.int64)


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish piece count (letters runs + digit runs + punct runs)."""
    return texts.fillna("").str.count(BPE_RE).to_numpy(dtype=np.int64)


def stopword_count(texts: pd.Series) -> np.ndarray:
    """Occurrences of the canonical stopword set as whole words."""
    pat = r"\b(?:%s)\b" % "|".join(STOPWORDS)
    return texts.fillna("").str.lower().str.count(pat).to_numpy(dtype=np.int64)


def quality_metrics(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation / stopword quality signals per document."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_words = word_count(t)
    n_stop = stopword_count(t)
    n_punct = t.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    safe_words = np.maximum(n_words, 1)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "avg_word_len": np.where(
                n_words > 0, (n_chars - np.maximum(n_words - 1, 0)) / safe_words, 0.0
            ),
            "stop_ratio": n_stop / safe_words,
            "punct_ratio": n_punct / np.maximum(n_chars, 1),
        }
    )


def detect_lang(texts: pd.Series) -> np.ndarray:
    """Stopword-profile language heuristic: argmax of per-language whole-word
    hits; 'unk' when nothing matches. Vectorized: one regex count pass per
    language profile."""
    t = texts.fillna("").str.lower()
    scores = np.zeros((len(LANG_PROFILES), len(t)), dtype=np.int64)
    langs = list(LANG_PROFILES)
    for i, lang in enumerate(langs):
        pat = r"\b(?:%s)\b" % "|".join(sorted(LANG_PROFILES[lang]))
        scores[i] = t.str.count(pat).to_numpy(dtype=np.int64)
    best = scores.argmax(axis=0)
    hit = scores.max(axis=0) > 0
    out = np.where(hit, np.array(langs, dtype=object)[best], "unk")
    return out.astype(object)


def normalize_for_fingerprint(texts: pd.Series) -> pd.Series:
    """lowercase + collapse whitespace — DuckDB:
    ``regexp_replace(lower(text), '\\s+', ' ', 'g')`` then trim."""
    return (
        texts.fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )


def fingerprint_md5(texts: pd.Series) -> list:
    """Content fingerprint: md5 hex of the normalized text (DuckDB ``md5``)."""
    norm = normalize_for_fingerprint(texts)
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm]


def rolling_hashes(text: str, window: int = 8, base: int = 257,
                   mod: int = (1 << 61) - 1) -> np.ndarray:
    """Rabin-Karp rolling hashes of character windows (document
    fingerprinting / winnowing building block). Vectorized over positions."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    n = len(b)
    if n < window:
        return np.zeros(0, dtype=np.int64)
    powers = np.power(base, np.arange(window - 1, -1, -1), dtype=object)
    # windowed dot product under the modulus (object dtype avoids overflow)
    out = np.empty(n - window + 1, dtype=np.int64)
    h = 0
    for i in range(window):
        h = (h * base + int(b[i])) % mod
    out[0] = h
    top = pow(base, window - 1, mod)
    for i in range(1, n - window + 1):
        h = ((h - int(b[i - 1]) * top) * base + int(b[i + window - 1])) % mod
        out[i] = h % mod
    return out


def winnow_fingerprint(text: str, window: int = 8, k: int = 4) -> list:
    """Winnowing: min rolling hash per k-sized band → compact fingerprint."""
    h = rolling_hashes(text, window)
    if len(h) == 0:
        return []
    pad = (-len(h)) % k
    if pad:
        h = np.concatenate([h, np.full(pad, np.iinfo(np.int64).max)])
    return np.minimum.reduceat(h, np.arange(0, len(h), k)).tolist()
