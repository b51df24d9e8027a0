"""BuildConfig.analyzer: the index-recorded analysis chain (Solr schema
analog). Build-side rewrite, query-side auto-application, and the
consistency guards (resume / delta add / federated members)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.query import LocalSearcher


DOCS = pd.DataFrame({
    "doc_id": np.arange(6, dtype=np.int64),
    "text": [
        "keyAgg rowScan tableValue",      # compounds only
        "key agg plain words here",        # already split
        "fooBar foo_bar FOO",              # camel + snake of the same parts
        "getHTTPResponse serverLog",
        "unrelated tokens entirely",
        "key value agg scan",
    ],
})


def _write(tmp_path, df, name="docs.parquet"):
    p = str(tmp_path / name)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    return p


def _cfg(**kw):
    base = dict(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                meta_cols=())
    base.update(kw)
    return BuildConfig(**base)


def test_ident_index_equals_presplit_plain_index(ray_session, tmp_path):
    """analyzer='ident' at build == manually pre-splitting the corpus and
    building plain: identical scores for every query."""
    from archivesspace_virgo_ray.functions.tokenize import ident_pretokenize

    src = _write(tmp_path, DOCS)
    pre = DOCS.assign(text=[ident_pretokenize(t) for t in DOCS["text"]])
    src_pre = _write(tmp_path, pre, "pre.parquet")
    idx_a = str(tmp_path / "idx_ident")
    idx_b = str(tmp_path / "idx_plain")
    sa = build_index(src, idx_a, _cfg(analyzer="ident"), resume=False)
    sb = build_index(src_pre, idx_b, _cfg(), resume=False)
    assert sa["analyzer"] == "ident"
    assert sa["n_postings"] == sb["n_postings"]
    a, b = LocalSearcher(idx_a), LocalSearcher(idx_b)
    for q in ["key", "agg", "foo bar", "http response", "absent"]:
        assert a.search(q, 10) == b.search(q, 10), q


def test_query_text_auto_analyzed(ray_session, tmp_path):
    """Compound QUERY text splits through the index's recorded analyzer —
    'keyAgg' and 'key agg' are the same query against an ident index."""
    src = _write(tmp_path, DOCS)
    idx = str(tmp_path / "idx")
    build_index(src, idx, _cfg(analyzer="ident"), resume=False)
    s = LocalSearcher(idx)
    assert s.search("keyAgg", 10) == s.search("key agg", 10)
    assert s.search("foo_bar", 10) == s.search("foo bar", 10)
    assert len(s.search("keyAgg", 10)) > 0


def test_ident_phrase_both_verify_paths(ray_session, tmp_path):
    """A camel compound is a consecutive 2-token phrase occurrence: phrase
    search for 'key agg' matches doc 0 ('keyAgg...') on BOTH the positional
    in-index path and the raw-text verify fallback (which must re-apply the
    analyzer to the candidate text)."""
    from archivesspace_virgo_ray.index.phrase import phrase_topk

    src = _write(tmp_path, DOCS)
    q = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array(["key agg"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    hits = {}
    for name, positions in (("pos", True), ("text", False)):
        idx = str(tmp_path / f"idx_{name}")
        build_index(src, idx, _cfg(analyzer="ident",
                                   store_positions=positions), resume=False)
        out = phrase_topk(idx, src, q).to_pandas()
        hits[name] = sorted(out["doc_id"].tolist())
    # doc 0 has the compound; doc 1/5 have "key agg"/"key value agg" —
    # only docs with CONSECUTIVE key,agg match
    assert hits["pos"] == hits["text"]
    assert 0 in hits["pos"] and 1 in hits["pos"] and 5 not in hits["pos"]


def test_analyzer_consistency_guards(ray_session, tmp_path):
    from archivesspace_virgo_ray.index.update import add_documents

    src = _write(tmp_path, DOCS)
    idx = str(tmp_path / "idx")
    build_index(src, idx, _cfg(analyzer="ident"), resume=False)
    with pytest.raises(ValueError, match="analyzer"):
        build_index(src, idx, _cfg(analyzer="plain"), resume=True)
    more = DOCS.assign(doc_id=DOCS["doc_id"] + 100)
    src2 = _write(tmp_path, more, "more.parquet")
    with pytest.raises(ValueError, match="analyzer"):
        add_documents(src2, idx, _cfg(analyzer="plain"))
    with pytest.raises(ValueError, match="unknown analyzer"):
        build_index(src, str(tmp_path / "idx2"), _cfg(analyzer="nope"),
                    resume=False)


def test_ident_resume_and_delta_add(ray_session, tmp_path):
    """Fast-resume stamp honors the analyzer; a matching delta add lands
    and its compounds are findable by their parts."""
    from archivesspace_virgo_ray.index.update import add_documents

    src = _write(tmp_path, DOCS)
    idx = str(tmp_path / "idx")
    build_index(src, idx, _cfg(analyzer="ident"), resume=False)
    st = build_index(src, idx, _cfg(analyzer="ident"), resume=True)
    assert st["n_segments_written"] == 0  # fast-resume short circuit
    delta = pd.DataFrame({"doc_id": np.array([200], dtype=np.int64),
                          "text": ["brandNewCompound"]})
    add_documents(_write(tmp_path, delta, "d.parquet"), idx,
                  _cfg(analyzer="ident"))
    s = LocalSearcher(idx)
    assert [d for d, _ in s.search("brand new compound", 10)] == [200]


def test_federated_mixed_analyzers_rejected(ray_session, tmp_path):
    from archivesspace_virgo_ray.index.federated import FederatedSearcher

    src = _write(tmp_path, DOCS)
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(src, ia, _cfg(analyzer="ident"), resume=False)
    build_index(src, ib, _cfg(), resume=False)
    with pytest.raises(ValueError, match="analyzer"):
        FederatedSearcher([ia, ib])
