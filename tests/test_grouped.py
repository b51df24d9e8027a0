"""Field collapsing (grouped top-k): brute-force parity, group boundaries,
empty queries."""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.query import LocalSearcher, get_pool

DOCS = [
    (1, "apple banana apple", "a"),
    (2, "apple cherry", "a"),
    (3, "apple apple apple", "b"),
    (4, "banana cherry", "b"),
    (5, "apple banana", "c"),
    (6, "cherry cherry", "c"),
]


@pytest.fixture(scope="module")
def grp_idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("grp")
    path = str(root / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d for d, _, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t, _ in DOCS], pa.string()),
            "grp": pa.array([g for _, _, g in DOCS], pa.string()),
        }),
        path,
    )
    idx = str(root / "idx")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(
        path, idx,
        BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                    meta_cols=("grp",)),
        resume=False,
    )
    return idx


def _query_table(text, k):
    return pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array([text], pa.string()),
        "k": pa.array([k], pa.int32()),
    })


def _brute(idx, text, n):
    by_grp = {g for _, _, g in DOCS}
    meta = {d: g for d, _, g in DOCS}
    scored = LocalSearcher(idx).search(text, 100)
    out = {}
    for g in sorted(by_grp):
        rows = [(d, s) for d, s in scored if meta[d] == g][:n]
        if rows:
            out[g] = rows
    return out


def test_grouped_matches_brute_force(grp_idx):
    got = get_pool(grp_idx).grouped_topk(_query_table("apple banana", 2), "grp")
    want = _brute(grp_idx, "apple banana", 2)
    for g, rows in want.items():
        sub = got[got["grp"] == g]
        assert list(sub["doc_id"]) == [d for d, _ in rows]
        assert np.allclose(sub["score"], [s for _, s in rows])
        assert list(sub["grp_rank"]) == list(range(1, len(rows) + 1))


def test_grouped_n1_collapse(grp_idx):
    got = get_pool(grp_idx).grouped_topk(_query_table("apple", 1), "grp")
    # exactly one (best) doc per group that has any match
    assert got.groupby("grp").size().max() == 1
    want = _brute(grp_idx, "apple", 1)
    assert set(got["grp"]) == set(want)


def test_grouped_unmatched_query_empty(grp_idx):
    got = get_pool(grp_idx).grouped_topk(_query_table("zzznope", 3), "grp")
    assert len(got) == 0
    assert list(got.columns) == ["query_id", "grp", "grp_rank", "doc_id", "score"]


def test_boosted_topk_identity_weights_match_plain(grp_idx):
    pool = get_pool(grp_idx)
    q = _query_table("apple banana", 10)
    plain = pool.topk(q).to_pandas()
    boosted = pool.boosted_topk(q, "grp", {}, 1.0)
    a = plain.sort_values("doc_id", ignore_index=True)
    b = boosted.sort_values("doc_id", ignore_index=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    np.testing.assert_allclose(
        a["score"].to_numpy(), b["boosted"].to_numpy(), rtol=0, atol=0
    )


def test_boosted_topk_reorders_by_weight(grp_idx):
    pool = get_pool(grp_idx)
    q = _query_table("apple", 10)
    base = pool.topk(q).to_pandas()
    heavy = pool.boosted_topk(q, "grp", {"c": 1000.0}, 1.0)
    top = heavy.sort_values(["boosted", "doc_id"],
                            ascending=[False, True]).iloc[0]
    meta = {d: g for d, _, g in DOCS}
    assert meta[int(top["doc_id"])] == "c"
    # raw scores survive unchanged next to the boost
    merged = heavy.merge(base, on="doc_id", suffixes=("", "_base"))
    np.testing.assert_allclose(merged["score"], merged["score_base"],
                               rtol=0, atol=0)


def test_boosted_topk_can_promote_below_topk_docs(grp_idx):
    pool = get_pool(grp_idx)
    # k=1: plain winner is doc 3 ("apple apple apple"); boosting its group
    # DOWN promotes a different group's doc without rescoring
    q = _query_table("apple", 1)
    plain = pool.topk(q).to_pandas()
    assert plain["doc_id"].tolist() == [3]
    flipped = pool.boosted_topk(q, "grp", {"b": 0.001}, 1.0)
    assert flipped["doc_id"].tolist() != [3]
