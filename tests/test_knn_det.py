"""Deterministic (SQL-reproducible) IVF / PQ twins: determinism,
partitioning invariance, recall floor, and DuckDB unrolled-CTE parity.

The production knn_ivf/knn_pq trainers use Ray random_sample + numpy RNG
(k-means++) and stay rows-only gate entries; the *_det twins hash-check —
these tests pin the contract locally so a regression can't wait for the
driver gate.
"""

import duckdb
import numpy as np
import pytest

from archivesspace_virgo_ray.pipelines.similarity import (
    det_sample,
    knn_brute_force,
    knn_ivf_det,
    knn_pq_det,
    train_centroids_det,
    train_pq_codebooks_det,
)


@pytest.fixture()
def emb(sf_dir):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _q(ds) -> np.ndarray:
    pdf = ds.to_pandas().sort_values("vec_id")
    return np.stack(pdf["embedding"].to_numpy()[:1]).astype(np.float64)


def test_det_sample_sorted_and_deterministic(ray_session, emb):
    a = det_sample(emb, 4096, "ivfdet")
    b = det_sample(emb, 4096, "ivfdet")
    assert a["vec_id"].is_monotonic_increasing
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    # sub-full sample: the md5 threshold keeps roughly the asked fraction
    small = det_sample(emb, 100, "ivfdet")
    n = emb.count()
    assert 0 < len(small) < n
    assert abs(len(small) - 100) < 60  # Bernoulli, not exact


def test_train_centroids_det_partition_invariant(ray_session, emb):
    c1 = train_centroids_det(emb, 8, iters=4)
    c2 = train_centroids_det(emb.repartition(7), 8, iters=4)
    assert np.array_equal(c1, c2)
    # unit-norm centroids
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_train_pq_codebooks_det_partition_invariant(ray_session, emb):
    b1 = train_pq_codebooks_det(emb, m=8, k=8, iters=3)
    b2 = train_pq_codebooks_det(emb.repartition(5), m=8, k=8, iters=3)
    assert np.array_equal(b1, b2)
    assert b1.shape == (8, 8, 8)


def test_knn_det_recall_floor(ray_session, emb):
    q = _q(emb)
    exact = set(knn_brute_force(emb, q, k=10, exclude_ids=[0])["vec_id"])
    ivf = set(knn_ivf_det(emb, q, k=10, exclude_ids=[0])["vec_id"])
    pq = set(knn_pq_det(emb, q, k=10, exclude_ids=[0])["vec_id"])
    assert len(exact & ivf) / 10 >= 0.7
    assert len(exact & pq) / 10 >= 0.7


def test_knn_det_matches_duckdb_oracle(ray_session, sf_dir, emb):
    """End-to-end parity with the unrolled-CTE oracle — the same comparison
    the driver gate runs, pinned in-suite."""
    from archivesspace_virgo_ray.pipelines.oracles.ann import (
        _det_topk_frame,
        _ivf_det_sql,
        _pq_det_sql,
    )

    q = _q(emb)
    got_ivf = _det_topk_frame(knn_ivf_det(emb, q, k=10, exclude_ids=[0]))
    got_pq = _det_topk_frame(knn_pq_det(emb, q, k=10, exclude_ids=[0]))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want_ivf = con.execute(_ivf_det_sql()).fetchdf()
    want_pq = con.execute(_pq_det_sql()).fetchdf()
    for got, want in ((got_ivf, want_ivf), (got_pq, want_pq)):
        assert got["vec_id"].tolist() == want["vec_id"].astype(np.int64).tolist()
        assert got["rank"].tolist() == want["rank"].astype(np.int64).tolist()
        assert np.allclose(got["cos"].to_numpy(), want["cos"].to_numpy(),
                           atol=0, rtol=0)


def test_knn_det_md5_sample_branch_matches_oracle(ray_session, sf_dir, emb):
    """Force the sub-full md5-threshold sample branch (never taken at gate
    SFs where sample_n >= rows) and re-check DuckDB parity — the sampling
    predicate itself is part of the oracle contract."""
    from archivesspace_virgo_ray.pipelines.oracles.ann import (
        _det_topk_frame,
        _ivf_det_sql,
        _pq_det_sql,
    )

    q = _q(emb)
    got_ivf = _det_topk_frame(
        knn_ivf_det(emb, q, k=10, exclude_ids=[0], sample_n=200))
    got_pq = _det_topk_frame(
        knn_pq_det(emb, q, k=10, exclude_ids=[0], sample_n=200))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want_ivf = con.execute(_ivf_det_sql(sample_n=200)).fetchdf()
    want_pq = con.execute(_pq_det_sql(sample_n=200)).fetchdf()
    for got, want in ((got_ivf, want_ivf), (got_pq, want_pq)):
        assert got["vec_id"].tolist() == want["vec_id"].astype(np.int64).tolist()
        assert np.allclose(got["cos"].to_numpy(), want["cos"].to_numpy(),
                           atol=0, rtol=0)
