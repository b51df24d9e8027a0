"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All deterministic, all vectorized-per-batch, all
defined so a DuckDB oracle can reproduce them where SQL allows."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.tokenize import TOKEN_RE, tokenize_text

# stopword profiles for the n-gram-free language heuristic (deterministic,
# SQL-reproducible: counts of profile words, argmax with fixed tie order)
LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "en", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "eine", "mit", "zu"),
}
LANG_ORDER = ("en", "fr", "de")  # tie-break priority

STOPWORDS_EN = frozenset(LANG_PROFILES["en"])

_PUNCT_RE = re.compile(r"[^\w\s]")
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_ISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def lang_id_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Adds pred_lang: argmax profile-hit count, ties broken en > fr > de,
    'und' (undetermined) when zero hits."""
    toks_list = [tokenize_text(t) for t in df[text_col]]
    profile_sets = {lang: frozenset(words) for lang, words in LANG_PROFILES.items()}
    counts = {
        lang: np.array(
            [sum(t in words for t in toks) for toks in toks_list], dtype=np.int64
        )
        for lang, words in profile_sets.items()
    }
    n = len(df)
    best = np.full(n, "und", dtype=object)
    best_count = np.zeros(n, dtype=np.int64)
    for lang in LANG_ORDER:
        c = counts[lang]
        better = c > best_count
        best[better] = lang
        best_count[better] = c[better]
    out = df.copy()
    out["pred_lang"] = best
    for lang in LANG_ORDER:
        out[f"hits_{lang}"] = counts[lang]
    return out


def quality_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality-scoring features per doc: token count, mean token length,
    stopword ratio, punctuation ratio, alpha ratio — the usual pre-training
    quality filters, defined with integer counts so oracles match exactly."""
    out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
    texts = df[text_col].tolist()
    toks_list = [TOKEN_RE.findall(t.lower()) for t in texts]
    n_tokens = np.array([len(t) for t in toks_list], dtype=np.int64)
    n_stop = np.array(
        [sum(t in STOPWORDS_EN for t in toks) for toks in toks_list], dtype=np.int64
    )
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    n_punct = np.array([len(_PUNCT_RE.findall(t)) for t in texts], dtype=np.int64)
    n_alpha = np.array([sum(c.isalpha() for c in t) for t in texts], dtype=np.int64)
    tok_chars = np.array([sum(len(w) for w in toks) for toks in toks_list], dtype=np.int64)
    out["n_tokens"] = n_tokens
    out["n_stopwords"] = n_stop
    out["n_chars"] = n_chars
    out["n_punct"] = n_punct
    out["n_alpha"] = n_alpha
    out["tok_chars"] = tok_chars
    return out


def token_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace token count + BPE-ish piece count per doc."""
    texts = df[text_col].tolist()
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "ws_tokens": np.array([len(t.split()) for t in texts], dtype=np.int64),
            "bpe_ish_tokens": np.array(
                [len(BPE_ISH_RE.findall(t)) for t in texts], dtype=np.int64
            ),
        }
    )


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)


_FP_MASK = 0xFFFFFFFFFFFFFFFF


def fingerprint64(text: str) -> int:
    """Deterministic rolling (FNV-1a over token stream) document fingerprint.

    Identity used everywhere (incl. the SQL oracle): hashing each token's
    bytes followed by a 0x20 separator == hashing the bytes of
    ``" ".join(tokens) + " "`` (empty token stream hashes to the offset).
    """
    stream = " ".join(tokenize_text(text))
    h = int(_FP_OFF)
    base = int(_FP_BASE)
    if stream:
        for b in (stream + " ").encode():
            h = ((h ^ b) * base) & _FP_MASK
    return h


def _fingerprint_vec(texts) -> np.ndarray:
    """FNV-1a fingerprints vectorized ACROSS documents: the recurrence
    h = (h ^ byte) * prime is inherently sequential per doc, so the loop runs
    over byte POSITIONS while each step is a numpy op over the whole batch
    (uint64 wrap is numpy's native overflow behavior for arrays)."""
    streams = []
    for t in texts:
        s = " ".join(tokenize_text(t))
        streams.append((s + " ").encode() if s else b"")
    n = len(streams)
    lens = np.fromiter((len(s) for s in streams), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, int(_FP_OFF), dtype=np.uint64)
    if maxlen == 0:
        return h
    padded = np.zeros((n, maxlen), dtype=np.uint8)
    for i, s in enumerate(streams):
        if s:
            padded[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    base = np.uint64(int(_FP_BASE))
    cols = padded.astype(np.uint64)
    for i in range(maxlen):
        active = lens > i
        h = np.where(active, (h ^ cols[:, i]) * base, h)
    return h


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    fp = _fingerprint_vec(list(df[text_col]))
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            # fp - 2^63 ≡ fp + 2^63 (mod 2^64); the bit-reinterpretation as
            # int64 equals the python-int subtraction the oracle mirrors
            "fingerprint": (fp + np.uint64(1 << 63)).view(np.int64),
        }
    )
