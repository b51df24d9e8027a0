"""Exact-phrase retrieval: brute-force parity, single-term equivalence,
zero-match behavior."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.functions.tokenize import tokenize_text
from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.phrase import phrase_needle, phrase_topk

DOCS = [
    (101, "the quick brown fox jumps over the lazy dog"),
    (102, "quick brown foxes are not the same as a quick brown fox"),
    (103, "brown quick fox — order matters for phrases"),
    (104, "the fox is quick and the dog is brown"),
    (105, "quick, brown; fox!  punctuation between tokens still counts"),
    (106, "nothing relevant in this one at all"),
    (107, "a quick brown fox and another quick brown fox appear twice here"),
]


# every test runs on BOTH verification paths: text-verify (positions off)
# and positional (store_positions=True — ShardWorker.phrase_ids)
@pytest.fixture(scope="module", params=[False, True], ids=["textverify", "positional"])
def phrase_idx(request, ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp(f"phrase_{request.param}")
    docs_path = str(root / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }),
        docs_path,
    )
    idx = str(root / "idx")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(
        docs_path, idx,
        BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                    meta_cols=(), store_positions=request.param),
        resume=False,
    )
    return idx, docs_path


def _brute_phrase_docs(phrase: str) -> set[int]:
    needle = phrase_needle(phrase)
    return {
        d for d, t in DOCS
        if needle in " " + " ".join(tokenize_text(t)) + " "
    }


def _run(idx, docs_path, phrases, k=10) -> pd.DataFrame:
    q = pa.table({
        "query_id": pa.array(list(range(len(phrases))), pa.int64()),
        "text": pa.array(phrases, pa.string()),
        "k": pa.array([k] * len(phrases), pa.int32()),
    })
    return phrase_topk(idx, docs_path, q).to_pandas()


def test_phrase_matches_brute_force(phrase_idx):
    idx, docs_path = phrase_idx
    phrases = ["quick brown fox", "brown fox", "quick brown", "fox is quick"]
    out = _run(idx, docs_path, phrases)
    for qid, p in enumerate(phrases):
        got = set(out[out.query_id == qid].doc_id)
        assert got == _brute_phrase_docs(p), p


def test_phrase_order_matters(phrase_idx):
    idx, docs_path = phrase_idx
    out = _run(idx, docs_path, ["brown quick fox"])
    # only doc 103 has the tokens in THIS order (101/102/105/107 have all
    # three tokens — conjunctive candidates — but not consecutively)
    assert set(out.doc_id) == {103}


def test_phrase_crosses_punctuation(phrase_idx):
    idx, docs_path = phrase_idx
    out = _run(idx, docs_path, ["quick brown fox"])
    assert 105 in set(out.doc_id)  # "quick, brown; fox!" tokenizes through


def test_single_term_phrase_equals_term_query(phrase_idx):
    idx, docs_path = phrase_idx
    from archivesspace_virgo_ray.index.query import get_pool

    out = _run(idx, docs_path, ["fox"])
    q = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array(["fox"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    base = get_pool(idx).topk(q).to_pandas()
    got = out.sort_values("doc_id", ignore_index=True)
    want = base.sort_values("doc_id", ignore_index=True)
    assert list(got.doc_id) == list(want.doc_id)
    np.testing.assert_allclose(got.score, want.score, rtol=0, atol=0)


def test_zero_match_and_unknown_term(phrase_idx):
    idx, docs_path = phrase_idx
    out = _run(idx, docs_path, ["zebra unicorn", "fox the quick"])
    # unknown vocab -> no candidates; known tokens in never-adjacent order
    # -> candidates but no verification survivors
    assert len(out) == 0


def test_phrase_scores_match_unrestricted_query(phrase_idx):
    """Phrase filtering changes MEMBERSHIP, never the score math."""
    idx, docs_path = phrase_idx
    from archivesspace_virgo_ray.index.query import get_pool

    out = _run(idx, docs_path, ["quick brown fox"])
    q = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array(["quick brown fox"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    base = get_pool(idx).topk(q).to_pandas().set_index("doc_id")["score"]
    for _, row in out.iterrows():
        assert row.score == base.loc[row.doc_id]


def _run_sloppy(idx, docs_path, items, k=10) -> pd.DataFrame:
    q = pa.table({
        "query_id": pa.array(list(range(len(items))), pa.int64()),
        "text": pa.array([t for t, _ in items], pa.string()),
        "k": pa.array([k] * len(items), pa.int32()),
        "slop": pa.array([s for _, s in items], pa.int32()),
    })
    return phrase_topk(idx, docs_path, q).to_pandas()


def _brute_sloppy_docs(phrase: str, slop: int) -> set[int]:
    import re

    from archivesspace_virgo_ray.index.phrase import slop_pattern

    pat = re.compile(slop_pattern(phrase, slop))
    return {
        d for d, t in DOCS
        if pat.search(" " + " ".join(tokenize_text(t)) + " ")
    }


def test_sloppy_matches_brute_force(phrase_idx):
    idx, docs_path = phrase_idx
    items = [("quick fox", 1), ("quick fox", 0), ("the dog", 3),
             ("fox dog", 4), ("quick brown fox", 1)]
    out = _run_sloppy(idx, docs_path, items)
    for qid, (p, s) in enumerate(items):
        got = set(out[out.query_id == qid].doc_id)
        assert got == _brute_sloppy_docs(p, s), (p, s)


def test_sloppy_widens_exact_phrase(phrase_idx):
    idx, docs_path = phrase_idx
    # "quick fox" is adjacent only in doc 103 ("brown quick fox"); slop 1
    # additionally admits "quick brown fox" docs (one intervening token)
    exact = _run_sloppy(idx, docs_path, [("quick fox", 0)])
    sloppy = _run_sloppy(idx, docs_path, [("quick fox", 1)])
    assert set(exact.doc_id) == {103}
    assert {101, 102, 103, 107} <= set(sloppy.doc_id)


def test_sloppy_order_still_matters(phrase_idx):
    idx, docs_path = phrase_idx
    # doc 104 "the fox is quick": "quick fox" in order never appears even
    # with slop 2 at distance... "quick" follows "fox" -> only reverse order
    out = _run_sloppy(idx, docs_path, [("quick fox", 2)])
    assert 104 not in set(out.doc_id)


def test_slop_zero_equals_exact_phrase(phrase_idx):
    idx, docs_path = phrase_idx
    a = _run_sloppy(idx, docs_path, [("quick brown fox", 0)])
    b = _run(idx, docs_path, ["quick brown fox"])
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id", ignore_index=True),
        b.sort_values("doc_id", ignore_index=True),
    )


def _run_near(idx, docs_path, items, k=10) -> pd.DataFrame:
    from archivesspace_virgo_ray.index.phrase import near_topk

    q = pa.table({
        "query_id": pa.array(list(range(len(items))), pa.int64()),
        "text": pa.array([t for t, _ in items], pa.string()),
        "k": pa.array([k] * len(items), pa.int32()),
        "slop": pa.array([s for _, s in items], pa.int32()),
    })
    return near_topk(idx, docs_path, q).to_pandas()


def _brute_near_docs(phrase: str, slop: int) -> set[int]:
    import re

    from archivesspace_virgo_ray.index.phrase import slop_pattern

    toks = tokenize_text(phrase)
    pats = [re.compile(slop_pattern(" ".join(toks), slop)),
            re.compile(slop_pattern(" ".join(reversed(toks)), slop))]
    return {
        d for d, t in DOCS
        if any(p.search(" " + " ".join(tokenize_text(t)) + " ") for p in pats)
    }


def test_near_unordered_matches_brute_force(phrase_idx):
    idx, docs_path = phrase_idx
    items = [("fox quick", 1), ("quick fox", 1), ("dog the", 0), ("fox dog", 4)]
    out = _run_near(idx, docs_path, items)
    for qid, (p, s) in enumerate(items):
        got = set(out[out.query_id == qid].doc_id)
        assert got == _brute_near_docs(p, s), (p, s)
    # unordered is direction-symmetric: "fox quick" == "quick fox"
    a = set(out[out.query_id == 0].doc_id)
    b = set(out[out.query_id == 1].doc_id)
    assert a == b


def test_near_is_superset_of_ordered_slop(phrase_idx):
    idx, docs_path = phrase_idx
    near = set(_run_near(idx, docs_path, [("quick fox", 1)]).doc_id)
    ordered = set(_run_sloppy(idx, docs_path, [("quick fox", 1)]).doc_id)
    assert ordered <= near
    # doc 104 "the fox is quick": reverse-order within slop 2 -> near-only
    near2 = set(_run_near(idx, docs_path, [("quick fox", 2)]).doc_id)
    assert 104 in near2


def test_span_first_positional(phrase_idx):
    """SpanFirst: match only when the span starts within the first N
    tokens (positional-index machinery; the sf-entry fallback is a text
    scan tested via the oracle gate)."""
    idx, docs_path = phrase_idx
    from archivesspace_virgo_ray.index.query import get_pool

    pool = get_pool(idx)
    if not pool.has_positions:
        pytest.skip("positional-only machinery")
    for term, n in (("quick", 2), ("fox", 3), ("brown", 1), ("dog", 50)):
        got = set(pool.phrase_ids({0: (term, 0, n)})[0].tolist())
        want = {d for d, t in DOCS if term in tokenize_text(t)[:n]}
        assert got == want, (term, n)
    # multi-token span first: "quick brown" starting within first 1 token
    got = set(pool.phrase_ids({0: ("quick brown", 0, 1)})[0].tolist())
    want = {d for d, t in DOCS
            if tokenize_text(t)[:2] == ["quick", "brown"]}
    assert got == want


def _brute_span_not(phrase: str, excl: str, dist: int) -> set[int]:
    pt = tokenize_text(phrase)
    L = len(pt)
    out = set()
    for did, t in DOCS:
        toks = tokenize_text(t)
        for st in range(len(toks) - L + 1):
            if toks[st:st + L] != pt:
                continue
            lo, hi = max(st - dist, 0), min(st + L - 1 + dist, len(toks) - 1)
            if excl not in toks[lo:hi + 1]:
                out.add(did)
                break
    return out


def test_span_not_matches_brute_force(phrase_idx):
    """SpanNot on both paths: per-occurrence exclusion (doc 107's second
    clean occurrence keeps it alive), pre/post distance windows, exclude
    term inside the span (dist 0), and unknown exclude term = no-op."""
    idx, docs_path = phrase_idx
    from archivesspace_virgo_ray.index.phrase import span_not_topk

    cases = [
        (0, "quick brown", "fox", 0),    # excl adjacent after span
        (1, "quick brown", "the", 2),
        (2, "quick brown", "quick", 0),  # excl inside span: kills all
        (3, "brown fox", "dog", 4),
        (4, "quick brown", "zzzunknown", 3),  # unknown excl = plain phrase
        (5, "lazy dog", "fox", 10),
    ]
    q = pa.table({
        "query_id": pa.array([c[0] for c in cases], pa.int64()),
        "text": pa.array([c[1] for c in cases], pa.string()),
        "excl": pa.array([c[2] for c in cases], pa.string()),
        "dist": pa.array([c[3] for c in cases], pa.int32()),
        "k": pa.array([10] * len(cases), pa.int32()),
    })
    out = span_not_topk(idx, docs_path, q).to_pandas()
    for qid, phrase, excl, dist in cases:
        got = set(out.loc[out["query_id"] == qid, "doc_id"].astype(int))
        assert got == _brute_span_not(phrase, excl, dist), (qid, phrase, excl)
