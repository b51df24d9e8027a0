"""Solr timeAllowed / partialResults surface: deadline-bounded BM25 scatter.

Contract: a query returned by ``topk_time_allowed`` is bit-identical to the
exact path (it is returned only if EVERY worker finished it); queries the
deadline cut off are dropped and reported, never returned with
silently-wrong ranks."""

import os

import pyarrow as pa
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.query import get_pool


@pytest.fixture(scope="module")
def ta_index(tmp_path_factory, ray_session, sf_dir):
    idx = str(tmp_path_factory.mktemp("taidx") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                    meta_cols=("lang", "source")),
        resume=False,
    )
    return idx


def _queries():
    return pa.table({
        "query_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["the data model", "hash join table", "sort merge"],
                         pa.string()),
        "k": pa.array([5, 5, 5], pa.int32()),
    })


def test_generous_deadline_matches_exact_path(ta_index):
    pool = get_pool(ta_index)
    exact = pool.topk(_queries()).to_pandas()
    got, partial = pool.topk_time_allowed(_queries(), time_allowed_s=60.0)
    assert partial == []
    assert got.to_pandas().equals(exact)


def test_expired_deadline_returns_all_partial(ta_index):
    pool = get_pool(ta_index)
    got, partial = pool.topk_time_allowed(_queries(), time_allowed_s=0.0)
    assert got.num_rows == 0
    assert partial == [0, 1, 2]


def test_partial_queries_never_have_rows(ta_index):
    # whatever the deadline cuts, returned rows must only belong to fully
    # finished queries and must match the exact path for those queries
    pool = get_pool(ta_index)
    exact = pool.topk(_queries()).to_pandas()
    got, partial = pool.topk_time_allowed(_queries(), time_allowed_s=0.001)
    g = got.to_pandas()
    returned = set(g["query_id"].unique().tolist())
    assert returned.isdisjoint(set(partial))
    for qid in returned:
        a = g[g["query_id"] == qid].reset_index(drop=True)
        b = exact[exact["query_id"] == qid].reset_index(drop=True)
        assert a.equals(b)
