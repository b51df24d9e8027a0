"""Boolean NOT queries: exclusion semantics, score invariance, pool parity."""

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
]


@pytest.fixture(scope="module")
def not_idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("notq")
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


def test_not_excludes_matching_docs(not_idx):
    s = LocalSearcher(not_idx)
    plain = dict(s.search("alpha beta", 10))
    got = dict(s.search("alpha beta", 10, not_text="delta"))
    # docs 2, 3, 4 contain delta and must vanish; 1 and 5 survive
    assert set(got) == {1, 5}
    # the NOT clause is a filter: surviving scores are unchanged
    for d, sc in got.items():
        assert sc == plain[d]


def test_not_multi_term_is_any(not_idx):
    s = LocalSearcher(not_idx)
    got = dict(s.search("alpha", 10, not_text="gamma epsilon"))
    # gamma hits 1,3; epsilon hits 4; alpha matches 1,2,3,5 -> keep 2,5
    assert set(got) == {2, 5}


def test_not_unknown_term_is_noop(not_idx):
    s = LocalSearcher(not_idx)
    assert s.search("alpha beta", 10, not_text="zzzznope") == \
        s.search("alpha beta", 10)


def test_not_can_empty_result(not_idx):
    s = LocalSearcher(not_idx)
    assert s.search("gamma", 10, not_text="alpha") == []


def test_pool_not_text_column_matches_local(not_idx):
    q = pa.table({
        "query_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["alpha beta", "beta"], pa.string()),
        "not_text": pa.array(["delta", ""], pa.string()),
        "k": pa.array([10, 10], pa.int32()),
    })
    out = bm25_topk(not_idx, q).to_pandas()
    s = LocalSearcher(not_idx)
    want7 = s.search("alpha beta", 10, not_text="delta")
    want8 = s.search("beta", 10)
    g7 = out[out["query_id"] == 7]
    g8 = out[out["query_id"] == 8]
    assert list(zip(g7["doc_id"], g7["score"])) == [(d, s_) for d, s_ in want7]
    assert list(zip(g8["doc_id"], g8["score"])) == [(d, s_) for d, s_ in want8]
