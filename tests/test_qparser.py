"""Query-string parser: grammar cases + end-to-end semantics on a planted
corpus (must/should/not/phrase/slop/prefix)."""

import pyarrow as pa
import pyarrow.parquet as pq

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.qparser import parse_query, querystring_topk


def test_parse_grammar():
    pq_ = parse_query('+data stream "hash table"~2 -scan filt* "a b"')
    assert pq_.must == ["data"]
    assert pq_.should == ["stream"]
    assert pq_.must_not == ["scan"]
    assert ("hash table", 2) in pq_.phrases and ("a b", 0) in pq_.phrases
    assert pq_.prefixes == ["filt"]
    # prohibited phrase degrades to prohibited terms
    pq2 = parse_query('-"bad pair" ok')
    assert set(pq2.must_not) == {"bad", "pair"}
    assert pq2.should == ["ok"]
    # multi-token clause tokenizes fully; casing folds
    pq3 = parse_query("+Data-Model")
    assert pq3.must == ["data", "model"]


def _build(tmp_path, texts):
    d = tmp_path / "c.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(d))
    idx = str(tmp_path / "idx")
    build_index(str(d), idx, BuildConfig(
        n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
        meta_cols=(), store_positions=True))
    return idx


def _run(idx, qs, k=10):
    t = pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": pa.array([qs], pa.string()),
                  "k": pa.array([k], pa.int32())})
    out = querystring_topk(idx, t).to_pandas()
    return out["doc_id"].tolist()


def test_semantics_end_to_end(ray_session, tmp_path):
    texts = [
        "alpha beta gamma",        # 0
        "alpha beta delta gamma",  # 1 (one token between beta and gamma)
        "alpha delta",             # 2
        "beta gamma epsilon",      # 3 (no alpha)
        "alpha beta gamma scanx",  # 4
    ]
    idx = _build(tmp_path, texts)
    # must alpha + exact phrase "beta gamma"
    assert set(_run(idx, '+alpha "beta gamma"')) == {0, 4}
    # add prohibition
    assert set(_run(idx, '+alpha "beta gamma" -scanx')) == {0}
    # sloppy phrase (ordered proximity) reaches doc 1's one-gap span
    assert set(_run(idx, '+alpha "beta gamma"~1')) == {0, 1, 4}
    assert set(_run(idx, '+alpha "beta gamma"')) == {0, 4}
    # prefix expansion: scan* matches scanx
    assert 4 in _run(idx, "scan*")
    # should-only never restricts: every alpha doc ranked
    assert set(_run(idx, "alpha")) == {0, 1, 2, 4}
    # impossible phrase -> empty
    assert _run(idx, '"epsilon alpha zulu"') == []


def test_phrase_requires_positions(ray_session, tmp_path):
    import pytest

    d = tmp_path / "c.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["alpha beta"], pa.string()),
    }), str(d))
    idx = str(tmp_path / "idx")
    build_index(str(d), idx, BuildConfig(
        n_shards=1, n_buckets=2, text_col="text", id_col="doc_id",
        meta_cols=(), store_positions=False))
    with pytest.raises(ValueError, match="positional index"):
        _run(idx, '"alpha beta"')
    # non-phrase queries still work on a non-positional index
    assert _run(idx, "+alpha") == [0]


def test_field_filters(ray_session, tmp_path):
    import pytest

    d = tmp_path / "c.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha one", "alpha two", "alpha three"],
                         pa.string()),
        "lang": pa.array(["en", "de", "en"], pa.string()),
    }), str(d))
    idx = str(tmp_path / "idx")
    build_index(str(d), idx, BuildConfig(
        n_shards=1, n_buckets=2, text_col="text", id_col="doc_id",
        meta_cols=("lang",)))
    assert set(_run(idx, "alpha lang:en")) == {0, 2}
    assert set(_run(idx, "alpha -lang:en")) == {1}
    with pytest.raises(ValueError, match="unknown filter field"):
        _run(idx, "alpha nosuch:x")


def test_parse_signed_prefixes():
    pq_ = parse_query("ok -bad* +need* also*")
    assert pq_.should == ["ok"]
    assert pq_.must_not_prefixes == ["bad"]
    assert pq_.must_prefixes == ["need"]
    assert pq_.prefixes == ["also"]
    assert pq_.all_prefixes() == ["also", "bad", "need"]
    # must_not expansions never score; must/should expansions do
    exp = {"bad": ["badger"], "need": ["needle"], "also": ["alsoran"]}
    assert pq_.positive_terms(exp) == ["alsoran", "needle", "ok"]


def test_signed_prefix_semantics_end_to_end(ray_session, tmp_path):
    texts = [
        "alpha beta gamma",      # 0
        "alpha scanx gamma",     # 1 (matches scan*)
        "alpha scanner",         # 2 (matches scan*)
        "alpha delta",           # 3
    ]
    idx = _build(tmp_path, texts)
    # -scan* EXCLUDES every expansion (the old bug ADDED them as should)
    assert set(_run(idx, "alpha -scan*")) == {0, 3}
    # +scan* requires ANY expansion
    assert set(_run(idx, "alpha +scan*")) == {1, 2}
    # +prefix with no vocabulary match -> empty result, not a crash
    assert _run(idx, "alpha +zzz*") == []
