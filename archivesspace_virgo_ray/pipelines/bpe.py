"""Distributed BPE vocabulary learning (Sennrich et al. 2016, the
subword-tokenizer trainer a pretraining-data pipeline runs over its corpus).

Scale shape — the part that matters at 100 TB: the CORPUS is touched by
exactly ONE distributed aggregation (word-type counts via
``state.aggregates.tree_aggregate``; the text never shuffles, only
(term, count) partials do). The merge loop then runs over the WORD-TYPE
table — vocabulary-sized and Zipf-bounded (~10^7-10^8 types for a web-scale
corpus), which is a single-machine problem; this is exactly how production
tokenizer trainers (HF tokenizers, SentencePiece) structure BPE training.
The loop here maintains pair counts INCREMENTALLY (only words containing
the just-merged pair are re-examined, via a pair -> word-ids index), the
same optimization as the reference implementations, so cost is
O(total affected symbols), not O(n_merges x corpus vocab).

Determinism contract: merge choice is (count desc, left asc, right asc) —
bit-stable across runs, partitionings, and cluster sizes (counts are exact
integers from the distributed aggregation).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd

END = "</w>"


def word_counts(ds, text_col: str = "text"):
    """documents Dataset -> (term, tf) pandas table via one distributed
    tree-aggregated pass (the only corpus-sized step of BPE training)."""
    from ..functions.tokenize import batch_term_doc_tf
    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, _docs, tfs, _dls = batch_term_doc_tf(
            np.zeros(len(df), np.int64), df[text_col].to_numpy()
        )
        out = pd.DataFrame({"term": terms, "tf": tfs})
        return out.groupby("term", as_index=False)["tf"].sum()

    return tree_aggregate(ds, ["term"], partial, {"tf": "sum"}).to_pandas()


def _pairs_of(syms: tuple) -> Counter:
    c: Counter = Counter()
    for a, b in zip(syms, syms[1:]):
        c[(a, b)] += 1
    return c


def _merge_word(syms: tuple, a: str, b: str, ab: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(
    wc: pd.DataFrame, n_merges: int, min_freq: int = 2
) -> pd.DataFrame:
    """(term, tf) word-type table -> merge table (rank, left, right, count).

    Words are symbol sequences of characters plus a terminal ``</w>``
    marker (so word-final units are distinct, per the original paper).
    Stops early when no pair reaches ``min_freq``."""
    words: list[tuple] = [
        tuple(t) + (END,) for t in wc["term"].astype(str).tolist()
    ]
    counts = wc["tf"].to_numpy(np.int64)

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for wi, syms in enumerate(words):
        c = int(counts[wi])
        for p, k in _pairs_of(syms).items():
            pair_counts[p] += k * c
            pair_words[p].add(wi)

    merges = []
    for rank in range(1, n_merges + 1):
        if not pair_counts:
            break
        (a, b), best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < min_freq:
            break
        merges.append((rank, a, b, int(best)))
        ab = a + b
        # re-examine ONLY words containing (a, b)
        for wi in list(pair_words[(a, b)]):
            old = words[wi]
            new = _merge_word(old, a, b, ab)
            c = int(counts[wi])
            for p, k in _pairs_of(old).items():
                pair_counts[p] -= k * c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words[p]
                s.discard(wi)
                if not s:
                    del pair_words[p]
            for p, k in _pairs_of(new).items():
                pair_counts[p] += k * c
                pair_words[p].add(wi)
            words[wi] = new
    return pd.DataFrame({
        "rank": pd.Series([m[0] for m in merges], dtype=np.int64),
        "left": pd.Series([m[1] for m in merges], dtype=object),
        "right": pd.Series([m[2] for m in merges], dtype=object),
        "count": pd.Series([m[3] for m in merges], dtype=np.int64),
    })


def bpe_encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Standard BPE encode: repeatedly merge the LOWEST-RANK applicable
    pair until none applies."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncodeStage:
    """Actor-pool encode stage: the merge table loads ONCE per actor
    (``__init__``), batches of docs encode per ``__call__`` — the T1
    stateful-stage pattern. Output: (doc_id, n_bpe_tokens, n_words)."""

    def __init__(self, merges: pd.DataFrame, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.ranks = {
            (l, r): int(k) for l, r, k in zip(
                merges["left"], merges["right"], merges["rank"]
            )
        }
        self.text_col, self.id_col = text_col, id_col
        self._cache: dict[str, int] = {}

    def _n_units(self, w: str) -> int:
        n = self._cache.get(w)
        if n is None:
            n = len(bpe_encode_word(w, self.ranks))
            self._cache[w] = n
        return n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.tokenize import tokenize_text

        ids, n_tok, n_words = [], [], []
        for i, t in zip(df[self.id_col].to_numpy(), df[self.text_col]):
            ws = tokenize_text(t or "")
            ids.append(int(i))
            n_words.append(len(ws))
            n_tok.append(sum(self._n_units(w) for w in ws))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=np.int64),
            "n_bpe_tokens": pd.Series(n_tok, dtype=np.int64),
            "n_words": pd.Series(n_words, dtype=np.int64),
        })


def bpe_token_counts(ds, merges: pd.DataFrame, concurrency: int = 4):
    """Per-doc BPE token counts with the learned merges — the "how many
    tokens will this corpus cost" pass. Merge table broadcast once per
    actor; per-word encodes memoized (Zipf: most words repeat)."""
    return ds.map_batches(
        BpeEncodeStage,
        fn_constructor_args=(merges,),
        batch_format="pandas",
        concurrency=(1, concurrency),
    )
