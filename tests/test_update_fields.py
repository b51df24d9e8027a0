"""Atomic partial (metadata-only) updates: visibility, score stability,
pool invalidation, error cases."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.query import get_pool
from archivesspace_virgo_ray.index.update import update_fields

DOCS = [
    (1, "apple banana apple", "a"),
    (2, "apple cherry", "a"),
    (3, "apple apple apple", "b"),
    (4, "banana cherry", "b"),
]


@pytest.fixture()
def upd_idx(ray_session, tmp_path):
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d for d, _, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t, _ in DOCS], pa.string()),
            "grp": pa.array([g for _, _, g in DOCS], pa.string()),
        }),
        path,
    )
    idx = str(tmp_path / "idx")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(
        path, idx,
        BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                    meta_cols=("grp",)),
        resume=False,
    )
    return idx


def _q(text, k=10):
    return pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array([text], pa.string()),
        "k": pa.array([k], pa.int32()),
    })


def test_update_fields_changes_facets_not_scores(upd_idx):
    pool = get_pool(upd_idx)
    before = pool.topk(_q("apple banana")).to_pandas()
    fc_before = pool.facet_counts("grp", text="apple", mode="or")
    assert dict(zip(fc_before["grp"], fc_before["n_docs"])) == {"a": 2, "b": 1}

    r = update_fields(upd_idx, pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64), "grp": ["b"]
    }))
    assert r["n_updated"] == 1

    pool2 = get_pool(upd_idx)
    # staleness fingerprint caught the meta gen -> in-place refresh
    assert pool2 is pool
    fc_after = pool2.facet_counts("grp", text="apple", mode="or")
    assert dict(zip(fc_after["grp"], fc_after["n_docs"])) == {"a": 1, "b": 2}
    after = pool2.topk(_q("apple banana")).to_pandas()
    pd.testing.assert_frame_equal(before, after)  # scores bit-identical


def test_update_fields_affects_grouping_and_boost(upd_idx):
    update_fields(upd_idx, pd.DataFrame({
        "doc_id": np.array([3], dtype=np.int64), "grp": ["z"]
    }))
    pool = get_pool(upd_idx)
    g = pool.grouped_topk(_q("apple"), "grp")
    assert "z" in set(g["grp"])
    boosted = pool.boosted_topk(_q("apple"), "grp", {"z": 1000.0}, 1.0)
    assert int(boosted.iloc[0]["doc_id"]) == 3


def test_update_fields_rejects_bad_input(upd_idx):
    with pytest.raises(ValueError, match="not updatable"):
        update_fields(upd_idx, pd.DataFrame({
            "doc_id": np.array([1], dtype=np.int64), "sha256": ["x"]
        }))
    with pytest.raises(ValueError, match="not live"):
        update_fields(upd_idx, pd.DataFrame({
            "doc_id": np.array([999], dtype=np.int64), "grp": ["a"]
        }))
    with pytest.raises(ValueError, match="no columns"):
        update_fields(upd_idx, pd.DataFrame({
            "doc_id": np.array([1], dtype=np.int64)
        }))


def test_update_fields_twice_latest_wins(upd_idx):
    update_fields(upd_idx, pd.DataFrame({
        "doc_id": np.array([2], dtype=np.int64), "grp": ["x"]
    }))
    update_fields(upd_idx, pd.DataFrame({
        "doc_id": np.array([2], dtype=np.int64), "grp": ["y"]
    }))
    pool = get_pool(upd_idx)
    fc = pool.facet_counts("grp", text="cherry", mode="or")
    m = dict(zip(fc["grp"], fc["n_docs"]))
    assert m.get("y") == 1 and "x" not in m
