"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul, and each batch emits only
  its local top-k partials — the final merge sorts k×n_batches rows, never
  the corpus.
- ``knn_ivf``: the scale path — coarse centroids (sampled + refined on the
  driver), vectors assigned to their nearest centroid at build, queries probe
  only the ``n_probe`` nearest centroid partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    return mat / norm[:, None]


def knn_brute_force(ds, query_mat: np.ndarray, k: int = 10, exclude_ids=None):
    """-> pandas (query_idx, vec_id, cos, rank). Exact; deterministic ties by
    vec_id ascending."""
    import ray

    q = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_ref = ray.put(q)
    excl = frozenset(int(x) for x in (exclude_ids or []))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        if excl:
            keep = ~np.isin(ids, np.fromiter(excl, dtype=np.int64))
            mat, ids = mat[keep], ids[keep]
        if len(ids) == 0:
            return pd.DataFrame({"query_idx": [], "vec_id": [], "cos": []})
        sims = _normalize(mat) @ qm.T  # (n, n_queries)
        out_q, out_id, out_c = [], [], []
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_c.extend(s[idx].tolist())
        return pd.DataFrame(
            {
                "query_idx": pd.Series(out_q, dtype=np.int64),
                "vec_id": pd.Series(out_id, dtype=np.int64),
                "cos": pd.Series(out_c, dtype=np.float64),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        partials.groupby("query_idx").map_groups(merge, batch_format="pandas").to_pandas()
        .sort_values(["query_idx", "rank"], ignore_index=True)
    )


def train_centroids(ds, n_centroids: int = 16, sample_n: int = 2048, iters: int = 5, seed: int = 3):
    """Sampled k-means on the driver (the coarse quantizer — small by
    design). The sample is a REAL seeded random sample: the fraction is
    sized from the row count (parquet metadata — nothing executes) with
    25% headroom, then capped at sample_n; taking the first n rows would
    bias the centroids to the leading files' distribution."""
    total = max(1, ds.count())
    frac = min(1.0, (sample_n * 1.25) / total)
    sample = ds.random_sample(frac, seed=seed).limit(sample_n).to_pandas()
    if len(sample) == 0:  # tiny input + unlucky sample: fall back to all rows
        sample = ds.limit(sample_n).to_pandas()
    mat = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = mat[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def knn_ivf(ds, query_mat: np.ndarray, k: int = 10, n_centroids: int = 16, n_probe: int = 4, seed: int = 3):
    """IVF-style ANN: probe only the n_probe nearest centroid partitions.

    Approximate (recall < 1 when the true neighbor lives in an unprobed
    cell); exactness is the brute-force baseline's job.
    """
    import ray

    cent = train_centroids(ds, n_centroids, seed=seed)
    cent_ref = ray.put(cent)
    q = _normalize(np.asarray(query_mat, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_sets = [frozenset(int(c) for c in row) for row in probes]
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_sets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        qm = ray.get(q_ref)
        psets = ray.get(probe_ref)
        mat = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        ids = df["vec_id"].to_numpy(np.int64)
        assign = np.argmax(mat @ c.T, axis=1)
        out_q, out_id, out_c = [], [], []
        for qi in range(qm.shape[0]):
            m = np.isin(assign, np.fromiter(psets[qi], dtype=np.int64))
            if not m.any():
                continue
            s = mat[m] @ qm[qi]
            sub_ids = ids[m]
            kk = min(k, len(sub_ids))
            idx = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(sub_ids[idx].tolist())
            out_c.extend(s[idx].tolist())
        return pd.DataFrame(
            {
                "query_idx": pd.Series(out_q, dtype=np.int64),
                "vec_id": pd.Series(out_id, dtype=np.int64),
                "cos": pd.Series(out_c, dtype=np.float64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        partials.groupby("query_idx").map_groups(merge, batch_format="pandas").to_pandas()
        .sort_values(["query_idx", "rank"], ignore_index=True)
    )
