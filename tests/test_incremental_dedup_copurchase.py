"""Round-4 continuation: incremental delta dedup vs a base corpus, and
market-basket co-purchase pair mining."""

import pyarrow as pa
import pyarrow.parquet as pq

from archivesspace_virgo_ray.pipelines.queries import (
    copurchase_top_pairs,
    incremental_dedup_new_docs,
)


def _write(d, name, table):
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, str(d / f"{name}.parquet"))


def test_incremental_dedup_statuses(ray_session, tmp_path):
    d = tmp_path / "sf"
    # 10 docs -> base = first 8 by id, delta = ids 8, 9 (plus planted ids).
    # Use explicit ids 0..9: cutoff = ids[7] = 7.
    texts = [f"base doc {i}" for i in range(8)]
    # delta: doc 8 duplicates base doc 3; doc 9 is new
    texts += ["base doc 3", "genuinely new text"]
    _write(d, "documents", pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 10, pa.string()),
        "source": pa.array(["s"] * 10, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    out = incremental_dedup_new_docs(str(d)).set_index("doc_id")
    assert list(out.index) == [8, 9]
    assert out.loc[8, "status"] == "dup_of_base"
    assert out.loc[9, "status"] == "new"


def test_incremental_dedup_within_delta(ray_session, tmp_path):
    d = tmp_path / "sf"
    # 15 docs: base = first 12, delta = 12, 13, 14; docs 13 and 14 are
    # copies of each other (not in base) -> 13 'new', 14 'dup_in_delta'
    texts = [f"base {i}" for i in range(12)] + ["fresh A", "twin", "twin"]
    _write(d, "documents", pa.table({
        "doc_id": pa.array(list(range(15)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 15, pa.string()),
        "source": pa.array(["s"] * 15, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    out = incremental_dedup_new_docs(str(d)).set_index("doc_id")
    assert out.loc[12, "status"] == "new"
    assert out.loc[13, "status"] == "new"
    assert out.loc[14, "status"] == "dup_in_delta"


def test_copurchase_pairs_counted_once_per_order(ray_session, tmp_path):
    d = tmp_path / "sf"
    # order 1: parts {1, 2, 3} (part 2 appears twice -> still one pair
    # contribution); order 2: parts {1, 2}; order 3: part {5} alone
    _write(d, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3, 1, 2, 5], pa.int64()),
    }))
    out = copurchase_top_pairs(str(d))
    top = out.iloc[0]
    assert (top["part_a"], top["part_b"], top["n_orders"]) == (1, 2, 2)
    pairs = set(zip(out["part_a"], out["part_b"]))
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_props_k_stats_json_extraction(ray_session, tmp_path):
    import pandas as pd

    from archivesspace_virgo_ray.pipelines.queries import props_k_stats_by_type

    d = tmp_path / "sf"
    _write(d, "events", pa.table({
        "event_type": pa.array(["view", "view", "click", "click"],
                               pa.string()),
        # one malformed row must be dropped, negatives must parse
        "props": pa.array(['{"k": 10}', '{"k": -4}', '{"k": 7}', 'oops'],
                          pa.string()),
    }))
    out = props_k_stats_by_type(str(d)).set_index("event_type")
    assert out.loc["view", "n"] == 2
    assert out.loc["view", "avg_k"] == 3.0
    assert out.loc["view", "min_k"] == -4
    assert out.loc["click", "n"] == 1
    assert out.loc["click", "max_k"] == 7
