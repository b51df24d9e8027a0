"""Snippet extraction / highlighting for search results — the Solr
highlighting surface the reference's UI relies on, as a post-retrieval
batch stage: join top-k doc ids back to the corpus, pick the best token
window per doc (most distinct query terms, ties → more total hits → earliest
window), and mark hits.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.tokenize import TOKEN_RE, tokenize_text


def best_window(tokens: list[str], query_terms: set[str], window: int = 20) -> tuple[int, int]:
    """(start, end) token indices of the best window: max distinct query
    terms, then max total hits, then earliest. O(n) sliding window."""
    n = len(tokens)
    if n == 0:
        return 0, 0
    w = min(window, n)
    is_hit = np.array([t in query_terms for t in tokens], dtype=np.int64)
    # distinct-term coverage needs per-term counts in window
    best = (-1, -1, 0)  # (distinct, total, -start) maximized
    counts: dict[str, int] = {}
    distinct = 0
    total = 0
    for i in range(n):
        t = tokens[i]
        if t in query_terms:
            counts[t] = counts.get(t, 0) + 1
            if counts[t] == 1:
                distinct += 1
            total += 1
        if i >= w:
            old = tokens[i - w]
            if old in query_terms:
                counts[old] -= 1
                if counts[old] == 0:
                    distinct -= 1
                total -= 1
        if i >= w - 1:
            start = i - w + 1
            cand = (distinct, total, -start)
            if cand > best:
                best = cand
    start = -best[2]
    return start, min(start + w, n)


def make_snippet(text: str, query: str, window: int = 20, mark: str = "**") -> str:
    """Best-window snippet with query terms wrapped in ``mark``.
    Token positions map back to the original text via finditer spans."""
    qterms = set(tokenize_text(query))
    spans = [(m.start(), m.end()) for m in TOKEN_RE.finditer(text.lower())]
    tokens = [text[s:e].lower() for s, e in spans]
    if not tokens:
        return text[: window * 8]
    s_tok, e_tok = best_window(tokens, qterms, window)
    lo = spans[s_tok][0]
    hi = spans[e_tok - 1][1] if e_tok > s_tok else lo
    out = []
    cursor = lo
    for (ts, te), tok in zip(spans[s_tok:e_tok], tokens[s_tok:e_tok]):
        out.append(text[cursor:ts])
        piece = text[ts:te]
        out.append(f"{mark}{piece}{mark}" if tok in qterms else piece)
        cursor = te
    prefix = "… " if lo > 0 else ""
    suffix = " …" if hi < len(text) else ""
    return prefix + "".join(out) + suffix


def attach_snippets(results_df: pd.DataFrame, corpus_ds, queries: dict[int, str],
                    text_col: str = "text", id_col: str = "doc_id",
                    window: int = 20) -> pd.DataFrame:
    """Join (query_id, doc_id, …) results against the corpus and add a
    ``snippet`` column. The corpus side is filtered to the top-k ids BEFORE
    leaving the read (predicate pushdown via isin), so only k×n_queries
    texts ever move."""
    import ray

    wanted = np.unique(results_df[id_col].to_numpy())
    wanted_ref = ray.put(wanted)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(wanted_ref)
        return df[df[id_col].isin(w)][[id_col, text_col]].reset_index(drop=True)

    texts = corpus_ds.map_batches(pick, batch_format="pandas").to_pandas()
    text_map = dict(zip(texts[id_col], texts[text_col]))
    snippets = [
        make_snippet(text_map.get(d, ""), queries[int(q)], window=window)
        for q, d in zip(results_df["query_id"], results_df[id_col])
    ]
    out = results_df.copy()
    out["snippet"] = snippets
    return out
