"""Percolation (reverse search): conjunctive stored-query matching."""

import numpy as np
import pandas as pd
import pytest

from archivesspace_virgo_ray.pipelines.percolate import PercolateStage, percolate

QUERIES = [
    (10, "alpha beta"),      # conjunctive pair
    (11, "beta"),            # single term
    (12, "alpha alpha beta"),  # duplicate terms collapse -> same as 10
    (13, "???"),             # tokenizes to nothing -> dropped
    (14, "gamma delta epsilon"),
]

DOCS = pd.DataFrame({
    "doc_id": pd.Series([1, 2, 3, 4, 5], dtype=np.int64),
    "text": [
        "alpha beta gamma",          # matches 10, 11, 12
        "beta only here",            # matches 11
        "alpha without the other",   # no full conjunction
        "",                          # empty
        "delta epsilon gamma zeta",  # matches 14
    ],
})


def test_percolate_stage_conjunctive_semantics():
    out = PercolateStage(QUERIES)(DOCS)
    got = sorted(map(tuple, out.to_numpy()))
    assert got == [
        (1, 10), (1, 11), (1, 12), (2, 11), (5, 14),
    ]
    assert out["doc_id"].dtype == np.int64 and out["query_id"].dtype == np.int64


def test_percolate_stage_empty_inputs():
    empty_docs = DOCS.iloc[0:0]
    assert len(PercolateStage(QUERIES)(empty_docs)) == 0
    # registry with no tokenizable query: no matches, typed empty
    out = PercolateStage([(1, "?!")])(DOCS)
    assert len(out) == 0 and out["doc_id"].dtype == np.int64


def test_percolate_dataset_partition_invariant(ray_session):
    import ray.data

    a = percolate(ray.data.from_pandas(DOCS).repartition(1), QUERIES).to_pandas()
    b = percolate(ray.data.from_pandas(DOCS).repartition(4), QUERIES).to_pandas()
    key = ["doc_id", "query_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True), b.sort_values(key, ignore_index=True)
    )


def test_tfidf_keywords_partition_invariant_and_exact(ray_session):
    """tfidf_keywords matches a direct pandas computation and is invariant
    to input partitioning; empty docs emit no rows."""
    import ray.data

    from archivesspace_virgo_ray.functions.tokenize import TOKEN_RE
    from archivesspace_virgo_ray.pipelines.textstats import tfidf_keywords

    docs = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3, 4], dtype=np.int64),
        "text": [
            "apple apple banana cherry",
            "banana banana banana apple",
            "cherry dates",
            "",
        ],
    })
    toks = {d: TOKEN_RE.findall(t.lower()) for d, t in zip(docs.doc_id, docs.text)}
    vocab_set = sorted({t for ts in toks.values() for t in ts})
    dfs = np.array([sum(t in set(ts) for ts in toks.values()) for t in vocab_set],
                   dtype=np.int64)
    vocab = np.asarray(vocab_set, dtype=object)
    n = len(docs)

    a = tfidf_keywords(ray.data.from_pandas(docs).repartition(1),
                       vocab, dfs, n, k=2).to_pandas()
    b = tfidf_keywords(ray.data.from_pandas(docs).repartition(3),
                       vocab, dfs, n, k=2).to_pandas()
    key = ["doc_id", "rank"]
    pd.testing.assert_frame_equal(a.sort_values(key, ignore_index=True),
                                  b.sort_values(key, ignore_index=True))
    a = a.sort_values(key, ignore_index=True)
    assert 4 not in set(a["doc_id"])  # empty doc: no keywords
    # doc 1: apple tf=2 df=2, banana tf=1 df=2, cherry tf=1 df=2 ->
    # top1 apple (tf 2), top2 banana (tie with cherry, term asc)
    d1 = a[a.doc_id == 1]
    assert d1["term"].tolist() == ["apple", "banana"]
    want_top = round(2 * np.log((n + 1) / (2 + 1)), 6)
    assert d1["tfidf"].iloc[0] == pytest.approx(want_top, abs=1e-9)


def test_phrase_percolation_order_sensitive(ray_session):
    """Phrase alerts fire only on consecutive in-order tokens; a doc with
    both tokens non-adjacent passes the conjunctive phase but fails the
    needle verify."""
    import ray.data

    docs = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3, 4], dtype=np.int64),
        "text": [
            "fast hash join here",       # phrase "hash join" fires
            "join the hash later",       # both tokens, wrong order/adjacency
            "hash-join via punctuation",  # tokenizer normalizes -> fires
            "nothing relevant",
        ],
    })
    out = percolate(
        ray.data.from_pandas(docs).repartition(2),
        [(0, "hash later")],                 # conjunctive term alert
        phrase_queries=[(10, "hash join"), (11, "join hash")],
    ).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "query_id"]].to_numpy()))
    assert got == [(1, 10), (2, 0), (3, 10)]
