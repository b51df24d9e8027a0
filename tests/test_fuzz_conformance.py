"""Randomized conformance: on random small corpora and random queries, the
engine must stay rank-identical (and bit-identical in score) to the oracle —
including through a random base/delta split with incremental add."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.query import LocalSearcher
from archivesspace_virgo_ray.index.update import add_documents
from archivesspace_virgo_ray.oracle import OracleIndex

VOCAB = ["aa", "bb", "cc", "dd", "ee", "the", "x1", "y2", "z3", "needle_q"]


def _random_corpus(rng, n_docs):
    docs = []
    for i in range(n_docs):
        n_tok = rng.integers(1, 40)
        toks = rng.choice(VOCAB, size=n_tok, p=_zipf(len(VOCAB)))
        docs.append(" ".join(toks))
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )


def _zipf(n):
    p = 1.0 / np.arange(1, n + 1)
    return p / p.sum()


QUERIES = ["the", "aa bb", "x1 y2 z3", "needle_q", "cc the dd", "absent_term"]


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_fuzz_rank_identity(seed, tmp_path, ray_session):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(20, 150))
    t = _random_corpus(rng, n_docs)
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        n_shards=int(rng.integers(1, 4)),
        n_buckets=int(rng.integers(1, 5)),
        text_col="text",
        id_col="doc_id",
        meta_cols=(),
        batch_size=int(rng.integers(8, 64)),
    )
    build_index(src, idx, cfg, resume=False)
    oracle = OracleIndex(t["doc_id"].to_pylist(), t["text"].to_pylist())
    s = LocalSearcher(idx)
    for q in QUERIES:
        k = int(rng.integers(1, 15))
        expect = oracle.score_query(q, k)
        got = s.search(q, k)
        assert [d for d, _ in got] == [d for d, _ in expect], (seed, q, k)
        assert [x for _, x in got] == [x for _, x in expect], (seed, q, k)


@pytest.mark.parametrize("seed", [7, 8])
def test_fuzz_incremental_matches_union(seed, tmp_path, ray_session):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(40, 120))
    t = _random_corpus(rng, n_docs)
    split = int(rng.integers(1, n_docs - 1))
    pq.write_table(t.slice(0, split), str(tmp_path / "base.parquet"))
    pq.write_table(t.slice(split), str(tmp_path / "delta.parquet"))
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(n_shards=2, n_buckets=2, text_col="text", id_col="doc_id",
                      meta_cols=(), batch_size=32)
    build_index(str(tmp_path / "base.parquet"), idx, cfg, resume=False)
    add_documents(str(tmp_path / "delta.parquet"), idx, cfg)
    oracle = OracleIndex(t["doc_id"].to_pylist(), t["text"].to_pylist())
    s = LocalSearcher(idx)
    for q in QUERIES:
        expect = oracle.score_query(q, 10)
        got = s.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in expect], (seed, q)
        assert [x for _, x in got] == [x for _, x in expect], (seed, q)


def test_file_layout_invariance(tmp_path, ray_session):
    """Same corpus split into different parquet file layouts must produce a
    byte-identical index (blocks/batches never leak into segment content)."""
    import os

    from archivesspace_virgo_ray.corpus import write_corpus

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_corpus(a_dir, 300, seed=42, rows_per_file=37)
    write_corpus(b_dir, 300, seed=42, rows_per_file=150)
    cfg = BuildConfig(n_shards=2, n_buckets=3, batch_size=64)
    idx_a, idx_b = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(a_dir, idx_a, cfg, resume=False)
    build_index(b_dir, idx_b, BuildConfig(n_shards=2, n_buckets=3, batch_size=512),
                resume=False)
    for seg in sorted(os.listdir(os.path.join(idx_a, "segments"))):
        for f in ("terms.parquet", "blocks.parquet", "postings.bin"):
            x = open(os.path.join(idx_a, "segments", seg, f), "rb").read()
            y = open(os.path.join(idx_b, "segments", seg, f), "rb").read()
            assert x == y, f"{seg}/{f} differs across file layouts/batch sizes"
