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
    counts = {
        lang: np.array(
            [sum(t in set(words) for t in toks) for toks in toks_list], dtype=np.int64
        )
        for lang, words in LANG_PROFILES.items()
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


def fingerprint64(text: str) -> int:
    """Deterministic rolling (FNV-1a over token stream) document fingerprint."""
    h = _FP_OFF
    for tok in tokenize_text(text):
        for b in tok.encode():
            h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
        h = np.uint64((int(h) ^ 0x20) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "fingerprint": np.array(
                [np.int64(fingerprint64(t) - (1 << 63)) for t in df[text_col]],
                dtype=np.int64,
            ),
        }
    )
