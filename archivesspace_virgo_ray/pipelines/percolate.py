"""Percolation / reverse search (the Elasticsearch percolator surface):
a SMALL registry of stored queries is matched against a STREAM of incoming
documents — "which alerts fire for this doc" — instead of the usual
"which docs match this query".

Scale shape (the part that matters at 100 TB): the stored-query registry is
the small side — it is compiled ONCE per actor (terms factorized against a
sorted union vocabulary, a bool needs-matrix Q x U) and the document stream
never shuffles: one ``map_batches`` pass, each batch tokenized vectorized
(``batch_term_doc_tf``), presence looked up via ``searchsorted`` against the
union vocabulary, and conjunctive satisfaction computed as ONE int matmul
(presence @ needs.T == terms_per_query). Output is the sparse (doc_id,
query_id) match list — rows only for hits.

Stored-query semantics: each query is a conjunctive term set (q.op=AND over
its tokenized text) — the percolator's registered-query core; richer
per-query DSL belongs in a verify stage downstream of this candidate pass
(the same two-phase contract as ``index/phrase.phrase_topk``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.tokenize import TOKEN_RE, batch_term_doc_tf


class PercolateStage:
    """Actor-pool stage: the stored-query registry is compiled once per
    actor (T1 pattern) — union vocabulary + bool needs-matrix — and each
    batch is one vectorized tokenize + searchsorted + matmul.

    ``phrase_queries`` are stored EXACT-PHRASE alerts: they ride the same
    conjunctive candidate matmul (all phrase tokens present), then verify
    with the index's phrase-needle contract (consecutive tokens in the
    joined token stream — ``index.phrase.phrase_needle``) computed only
    for the candidate docs of that batch (two-phase, like phrase_topk)."""

    def __init__(self, queries: list[tuple[int, str]],
                 id_col: str = "doc_id", text_col: str = "text",
                 phrase_queries: list[tuple[int, str]] | None = None):
        from ..index.phrase import phrase_needle

        self.id_col = id_col
        self.text_col = text_col
        self.needles: dict[int, str] = {}
        qids, term_sets = [], []
        for qid, text in queries:
            toks = sorted(set(TOKEN_RE.findall(text.lower())))
            if toks:
                qids.append(int(qid))
                term_sets.append(toks)
        for qid, phrase in (phrase_queries or []):
            toks = sorted(set(TOKEN_RE.findall(phrase.lower())))
            if toks:
                qids.append(int(qid))
                term_sets.append(toks)
                self.needles[int(qid)] = phrase_needle(phrase)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.vocab = np.asarray(
            sorted({t for ts in term_sets for t in ts}), dtype=object
        )
        self.needs = np.zeros((len(qids), len(self.vocab)), dtype=np.int64)
        for i, ts in enumerate(term_sets):
            self.needs[i, np.searchsorted(self.vocab, np.asarray(ts, dtype=object))] = 1
        self.need_counts = self.needs.sum(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "query_id": pd.Series([], dtype=np.int64),
        })
        if len(df) == 0 or len(self.qids) == 0 or len(self.vocab) == 0:
            return empty
        terms, doc_ids, _, _ = batch_term_doc_tf(
            df[self.id_col].to_numpy(), df[self.text_col].to_numpy()
        )
        if len(terms) == 0:
            return empty
        # keep only (doc, term) rows whose term is in the union vocabulary
        pos = np.searchsorted(self.vocab, terms)
        pos_c = np.clip(pos, 0, len(self.vocab) - 1)
        in_vocab = self.vocab[pos_c] == terms
        if not in_vocab.any():
            return empty
        pos, doc_ids = pos_c[in_vocab], doc_ids[in_vocab]
        uniq_docs, doc_ord = np.unique(doc_ids, return_inverse=True)
        presence = np.zeros((len(uniq_docs), len(self.vocab)), dtype=np.int64)
        presence[doc_ord, pos] = 1
        # conjunctive satisfaction: doc d matches query q iff it contains
        # every needed term — one matmul against the compiled needs-matrix
        hits = (presence @ self.needs.T) == self.need_counts[None, :]
        di, qi = np.nonzero(hits)
        out_docs = uniq_docs[di]
        out_qids = self.qids[qi]
        if self.needles and len(out_docs):
            # two-phase for phrase alerts: verify conjunctive candidates
            # against the needle, building the joined token stream ONLY for
            # this batch's candidate docs
            is_phrase = np.isin(out_qids, np.fromiter(self.needles, dtype=np.int64))
            cand_docs = np.unique(out_docs[is_phrase])
            if len(cand_docs):
                sub = df[np.isin(df[self.id_col].to_numpy(np.int64), cand_docs)]
                streams = {
                    int(d): " " + " ".join(TOKEN_RE.findall(str(t).lower())) + " "
                    for d, t in zip(sub[self.id_col], sub[self.text_col])
                }
                keep = np.ones(len(out_docs), dtype=bool)
                for i in np.flatnonzero(is_phrase):
                    needle = self.needles[int(out_qids[i])]
                    keep[i] = needle in streams.get(int(out_docs[i]), "")
                out_docs, out_qids = out_docs[keep], out_qids[keep]
        return pd.DataFrame({
            "doc_id": pd.Series(out_docs, dtype=np.int64),
            "query_id": pd.Series(out_qids, dtype=np.int64),
        })


def percolate(ds, queries: list[tuple[int, str]],
              id_col: str = "doc_id", text_col: str = "text",
              concurrency: int = 4,
              phrase_queries: list[tuple[int, str]] | None = None):
    """documents Dataset -> (doc_id, query_id) match Dataset: every stored
    query whose full conjunctive term set the document contains, plus
    every stored PHRASE query appearing consecutively (``phrase_queries``,
    two-phase verified). One streaming pass; no shuffle; registry compiled
    once per actor.

    ``concurrency`` is the pool's MAX — autoscaling (1, N) so the stage
    never deadlocks a small cluster by demanding every CPU slot up front."""
    return ds.map_batches(
        PercolateStage,
        fn_constructor_args=(queries, id_col, text_col, phrase_queries),
        batch_format="pandas",
        concurrency=(1, concurrency),
    )
