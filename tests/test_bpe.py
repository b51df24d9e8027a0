"""BPE training: golden vs a naive full-recount reference, partitioning
invariance, encode semantics, and the distributed token-count stage."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray

from archivesspace_virgo_ray.pipelines.bpe import (
    END,
    bpe_encode_word,
    bpe_token_counts,
    learn_bpe,
    word_counts,
)


def naive_bpe(wc: pd.DataFrame, n_merges: int, min_freq: int = 2):
    """Independent reference: full pair recount every round."""
    words = {}
    for t, c in zip(wc["term"], wc["tf"]):
        k = tuple(t) + (END,)
        words[k] = words.get(k, 0) + int(c)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < min_freq:
            break
        merges.append((rank, a, b, best))
        new = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + c
        words = new
    return merges


WC = pd.DataFrame({
    "term": ["low", "lower", "lowest", "newer", "wider", "new", "west"],
    "tf": [5, 2, 6, 6, 3, 2, 4],
})


def test_learn_bpe_matches_naive_recount():
    got = learn_bpe(WC, n_merges=12, min_freq=2)
    want = naive_bpe(WC, 12, 2)
    assert list(zip(got["rank"], got["left"], got["right"], got["count"])) \
        == want


def test_learn_bpe_min_freq_stops():
    got = learn_bpe(WC, n_merges=100, min_freq=8)
    want = naive_bpe(WC, 100, 8)
    assert len(got) == len(want)
    assert (got["count"] >= 8).all()


def test_encode_uses_rank_priority():
    merges = learn_bpe(WC, n_merges=12, min_freq=2)
    ranks = {(l, r): int(k) for l, r, k in
             zip(merges["left"], merges["right"], merges["rank"])}
    for w in ["lowest", "newer", "west", "zzz"]:
        units = bpe_encode_word(w, ranks)
        # lossless: concatenation restores word + terminal marker
        assert "".join(units) == w + END
        # every unit is either a learned symbol or a single char piece
        assert all(len(u) >= 1 for u in units)
    # an unseen word falls back to characters
    assert len(bpe_encode_word("qqq", {})) == 4  # q q q </w>


def test_word_counts_and_invariance(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["low low lower", "newer west", "lowest lowest",
                 "new wider", "west newer", "low lowest"],
    })
    wc1 = word_counts(ray.data.from_pandas(docs).repartition(2))
    wc2 = word_counts(ray.data.from_pandas(docs).repartition(5))
    a = wc1.sort_values("term", ignore_index=True)
    b = wc2.sort_values("term", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert a.set_index("term")["tf"]["low"] == 3
    m1 = learn_bpe(wc1, 10, min_freq=2)
    m2 = learn_bpe(wc2, 10, min_freq=2)
    pd.testing.assert_frame_equal(m1, m2)


def test_bpe_token_counts_distributed_matches_driver(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["low lower lowest", "newer new", "", "west wider west"],
    })
    ds = ray.data.from_pandas(docs).repartition(2)
    merges = learn_bpe(word_counts(ds), 8, min_freq=2)
    out = (bpe_token_counts(ds, merges)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    ranks = {(l, r): int(k) for l, r, k in
             zip(merges["left"], merges["right"], merges["rank"])}
    from archivesspace_virgo_ray.functions.tokenize import tokenize_text
    for _, row in out.iterrows():
        ws = tokenize_text(docs.loc[docs["doc_id"] == row["doc_id"],
                                    "text"].iloc[0])
        assert row["n_words"] == len(ws)
        assert row["n_bpe_tokens"] == sum(
            len(bpe_encode_word(w, ranks)) for w in ws
        )
