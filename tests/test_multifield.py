"""Fielded dismax search: max-combine exactness vs brute force, boost
semantics, single-field matches."""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.multifield import dismax_topk
from archivesspace_virgo_ray.index.query import LocalSearcher

# (doc_id, title, body) — doc 3 mentions 'query' only in its title; doc 4
# only in its body; doc 5 in neither.
DOCS = [
    (1, "query planner notes", "the query planner chooses a join order"),
    (2, "storage engine", "pages and buffers and a write ahead log"),
    (3, "query tuning guide", "indexes make lookups fast"),
    (4, "operations manual", "restart the query service nightly"),
    (5, "release notes", "bug fixes and small improvements"),
]
W_TITLE = 2.0


@pytest.fixture(scope="module")
def field_idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("dismax")
    out = {}
    for name, col_vals in [
        ("title", [(d, t) for d, t, _ in DOCS]),
        ("body", [(d, b) for d, _, b in DOCS]),
    ]:
        path = str(root / f"{name}.parquet")
        pq.write_table(
            pa.table({
                "doc_id": pa.array([d for d, _ in col_vals], pa.int64()),
                "text": pa.array([t for _, t in col_vals], pa.string()),
            }),
            path,
        )
        idx = str(root / f"idx_{name}")
        shutil.rmtree(idx, ignore_errors=True)
        build_index(
            path, idx,
            BuildConfig(n_shards=2, n_buckets=4, text_col="text",
                        id_col="doc_id", meta_cols=()),
            resume=False,
        )
        out[name] = idx
    return out


def _brute_dismax(field_idx, text, k):
    scores = {}
    for name, w in [("title", W_TITLE), ("body", 1.0)]:
        for d, s in LocalSearcher(field_idx[name]).search(text, 100):
            scores[d] = max(scores.get(d, 0.0), w * s)
    order = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return order


def _run(field_idx, text, k=10):
    q = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array([text], pa.string()),
        "k": pa.array([k], pa.int32()),
    })
    t = dismax_topk(
        [(field_idx["title"], W_TITLE), (field_idx["body"], 1.0)], q
    ).to_pandas()
    return list(zip(t["doc_id"], t["score"]))


def test_dismax_matches_brute_force(field_idx):
    got = _run(field_idx, "query planner")
    want = _brute_dismax(field_idx, "query planner", 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert np.allclose([s for _, s in got], [s for _, s in want])


def test_dismax_includes_single_field_matches(field_idx):
    docs = {d for d, _ in _run(field_idx, "query")}
    assert {1, 3, 4} <= docs  # title-only (3) and body-only (4) both present


def test_title_boost_outranks_body_match(field_idx):
    got = _run(field_idx, "query")
    by_doc = dict(got)
    # title hits carry the 2x boost: the title-field score of doc 3 beats
    # the body-only score of doc 4
    assert by_doc[3] > by_doc[4]


def test_dismax_empty_query(field_idx):
    out = _run(field_idx, "zzzznope")
    assert out == []


def test_dismax_small_k_exact_boundary(field_idx):
    got = _run(field_idx, "query planner", k=2)
    want = _brute_dismax(field_idx, "query planner", 2)
    assert [d for d, _ in got] == [d for d, _ in want]
