"""Single-process conformance oracle: tokenizer + inverted index + Okapi BM25.

Stands in for the reference engine's Solr-side results (the ``*_text`` fields
the reference posts, SolrHelper.java:82-96, and queries back,
SolrHelper.java:39-80). The Ray engine must be **rank-identical in doc_ids and
bit-identical in scores** to this oracle on the fixed query set.

Scoring math (BM25, k1=1.2, b=0.75, Lucene-style non-negative idf):

    idf(t)      = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    score(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

Float determinism contract (SURVEY.md §7.4): a document's score accumulates
per-term contributions in the **canonical term order** — descending global
term upper bound, ties broken by ascending term string — and the engine
accumulates in exactly the same order, so sums are bit-identical. Final
ranking: score descending, doc_id ascending.
"""

from __future__ import annotations

from collections import Counter

from .functions.tokenize import tokenize_text

K1 = 1.2
B = 0.75


def bm25_idf(df: int, n_docs: int) -> float:
    import math

    # Lucene's formula is non-negative whenever df <= n_docs — true for any
    # exact-stats index, so the clamp is a no-op there (the DuckDB oracle
    # SQL needs no counterpart). It binds only in the documented stale-df
    # window (df counts replaced/deleted versions until a full merge while
    # n_docs is live): an "in more docs than exist" term carries no
    # information and contributes 0 — without the clamp its negative
    # "upper" bound is really a lower bound and WAND pruning silently
    # empties the result set.
    return max(0.0, math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))


def term_upper_bound(idf: float, max_tf: int, min_dl: int, avgdl: float) -> float:
    """Max possible contribution of a term given (max tf, min dl) — the
    block-max bound the engine stores per posting block."""
    denom = max_tf + K1 * (1.0 - B + B * (min_dl / avgdl))
    return idf * max_tf * (K1 + 1.0) / denom


class OracleIndex:
    """In-memory inverted index over (doc_id, content) pairs."""

    def __init__(self, doc_ids, contents):
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, content in zip(doc_ids, contents):
            doc_id = int(doc_id)
            toks = tokenize_text(content)
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.doc_len)
        self.total_len = sum(self.doc_len.values())
        self.avgdl = self.total_len / self.n_docs if self.n_docs else 0.0

    def global_df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def canonical_term_order(self, terms: list[str]) -> list[str]:
        """Descending global upper bound (computed from true max_tf / min_dl
        over the term's postings), tie by ascending term. Terms absent from
        the index sort last (ub 0)."""
        def ub(t: str) -> float:
            plist = self.postings.get(t)
            if not plist:
                return 0.0
            idf = bm25_idf(len(plist), self.n_docs)
            max_tf = max(plist.values())
            min_dl = min(self.doc_len[d] for d in plist)
            return term_upper_bound(idf, max_tf, min_dl, self.avgdl)

        return sorted(set(terms), key=lambda t: (-ub(t), t))

    def score_query(self, text: str, k: int) -> list[tuple[int, float]]:
        """Exact BM25 top-k: [(doc_id, score)] — score desc, doc_id asc."""
        terms = self.canonical_term_order(tokenize_text(text))
        acc: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = bm25_idf(len(plist), self.n_docs)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                s = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
