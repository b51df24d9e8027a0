"""Fuzzy queries: Levenshtein kernel, band pruning, expansion order,
OR-equivalence."""

import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.fuzzy import (
    expand_fuzzy,
    fuzzy_topk,
    levenshtein,
)

DOCS = [
    (1, "mode model modem node"),
    (2, "model model mode"),
    (3, "node code cove"),
    (4, "entirely unrelated words here"),
    (5, "mode node model modes"),
]


@pytest.fixture(scope="module")
def fuzzy_idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzzy")
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
    return idx, docs_path


def test_levenshtein_matches_duckdb():
    import duckdb

    pairs = [("hash", "hsah"), ("", "abc"), ("kitten", "sitting"),
             ("table", "tabel"), ("a", "a"), ("ab", "ba"), ("scan", "scann")]
    for a, b in pairs:
        want = duckdb.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_expand_orders_by_distance_then_df(fuzzy_idx):
    idx, _ = fuzzy_idx
    # vocab df: mode 3, model 3, node 3, code 1, modem 1, modes 1, cove 1
    # distances from 'mode': mode 0; model/node/code/modem/modes 1; cove 2
    got = expand_fuzzy(idx, ["mode"], max_distance=2, max_expansions=4)["mode"]
    assert got[0] == "mode"
    # d=1 group ordered df desc then term asc: model(3), node(3), code(1)
    assert got[1:4] == ["model", "node", "code"]


def test_expand_distance_bound(fuzzy_idx):
    idx, _ = fuzzy_idx
    got = expand_fuzzy(idx, ["mode"], max_distance=1, max_expansions=10)["mode"]
    assert "cove" not in got  # d=2 excluded at max_distance=1
    assert got == ["mode", "model", "node", "code", "modem", "modes"]


def test_expand_no_match(fuzzy_idx):
    idx, _ = fuzzy_idx
    assert expand_fuzzy(idx, ["qqqqqqqq"], 2, 10)["qqqqqqqq"] == []


def test_fuzzy_topk_equals_expanded_or_query(fuzzy_idx):
    idx, _ = fuzzy_idx
    from archivesspace_virgo_ray.index.query import get_pool

    q = pa.table({
        "query_id": pa.array([3], pa.int64()),
        "word": pa.array(["mode"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    got = fuzzy_topk(idx, q, max_distance=1, max_expansions=10).to_pandas()
    explicit = pa.table({
        "query_id": pa.array([3], pa.int64()),
        "text": pa.array(["mode model node code modem modes"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    want = get_pool(idx).topk(explicit).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id", ignore_index=True),
        want.sort_values("doc_id", ignore_index=True),
    )


def test_fuzzy_topk_empty(fuzzy_idx):
    idx, _ = fuzzy_idx
    q = pa.table({
        "query_id": pa.array([1], pa.int64()),
        "word": pa.array(["qqqqqqqq"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    out = fuzzy_topk(idx, q)
    assert out.num_rows == 0
    assert out.column_names == ["query_id", "rank", "doc_id", "score"]
