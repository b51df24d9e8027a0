"""Minimum-should-match (Solr edismax ``mm``): >=m-of-n whitelist semantics,
score invariance, degeneration to OR (mm<=1) and AND (mm=n), absent terms."""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.query import LocalSearcher, bm25_topk

DOCS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta delta"),
    (3, "alpha gamma delta"),
    (4, "beta delta epsilon"),
    (5, "alpha alpha beta"),
    (6, "epsilon zeta"),
]


@pytest.fixture(scope="module")
def mm_idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("mmq")
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
                    meta_cols=()),
        resume=False,
    )
    return idx


def _pool_topk(idx, text, k, mm):
    q = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array([text], pa.string()),
        "min_match": pa.array([mm], pa.int32()),
        "k": pa.array([k], pa.int32()),
    })
    out = bm25_topk(idx, q).to_pandas()
    return list(zip(out["doc_id"], out["score"]))


def _brute_match_count(text):
    terms = set(text.split())
    return {d: len(terms & set(t.split())) for d, t in DOCS}


def test_mm_filters_by_distinct_matched_terms(mm_idx):
    s = LocalSearcher(mm_idx)
    plain = dict(s.search("alpha beta epsilon", 10))
    got = dict(_pool_topk(mm_idx, "alpha beta epsilon", 10, mm=2))
    counts = _brute_match_count("alpha beta epsilon")
    assert set(got) == {d for d, c in counts.items() if c >= 2}
    # mm gates matching, never scoring: surviving scores are the OR scores
    for d, sc in got.items():
        assert sc == plain[d]


def test_mm_one_is_plain_or(mm_idx):
    s = LocalSearcher(mm_idx)
    assert _pool_topk(mm_idx, "alpha beta", 10, mm=1) == \
        s.search("alpha beta", 10)


def test_mm_equal_n_is_conjunctive(mm_idx):
    s = LocalSearcher(mm_idx)
    want = s.search("alpha beta delta", 10, require_all=True)
    assert _pool_topk(mm_idx, "alpha beta delta", 10, mm=3) == want


def test_mm_absent_term_cannot_count(mm_idx):
    # 'zzz' is not in the index: mm=2 over "alpha zzz" is unsatisfiable
    assert _pool_topk(mm_idx, "alpha zzz", 10, mm=2) == []
    # but mm=2 over three terms with one absent still works via the other two
    got = dict(_pool_topk(mm_idx, "alpha beta zzz", 10, mm=2))
    counts = _brute_match_count("alpha beta")
    assert set(got) == {d for d, c in counts.items() if c >= 2}


def test_mm_exceeding_terms_is_empty(mm_idx):
    assert _pool_topk(mm_idx, "alpha beta", 10, mm=3) == []
