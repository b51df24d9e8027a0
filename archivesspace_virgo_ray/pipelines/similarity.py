"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul, and each batch emits only
  its local top-k partials — the final merge sorts k×n_batches rows, never
  the corpus.
- ``build_ivf_index`` / ``knn_ivf_query``: the scale path. Coarse k-means++
  centroids (sampled, refined on the driver — the quantizer is small by
  design), every vector **multi-assigned** to its ``replicas`` nearest cells,
  and the cells persisted as partitioned parquet — built ONCE, then every
  query run reads only the probed cell partitions (the round-2 design re-ran
  assignment per query run; that was the gap).
  Multi-assignment is what makes recall honest on weakly-clustered data:
  single-assignment IVF recall is bounded by the probed fraction when the
  corpus is near-isotropic (measured on the bench embeddings: 0.58 recall@10
  at 4/16 cells). With n_centroids=8, replicas=3, n_probe=3 the measured
  recall@10 is 1.0 at sf0.01 and 0.944 at sf0.1 — asserted in tests and
  reported by bench. On strongly-clustered real embeddings the same layout
  prunes much harder (replicas and probes cover cluster boundaries, not the
  bulk).
- ``knn_ivf``: convenience wrapper — builds (or reuses) the persisted index,
  then queries it.
"""

from __future__ import annotations

import json
import math
import os

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
        empty = pd.DataFrame({
            "query_idx": pd.Series([], dtype=np.int64),
            "vec_id": pd.Series([], dtype=np.int64),
            "cos": pd.Series([], dtype=np.float64),
        })
        if len(df) == 0:  # typed empty: all-empty pandas blocks lose schema
            return empty
        qm = ray.get(q_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        if excl:
            keep = ~np.isin(ids, np.fromiter(excl, dtype=np.int64))
            mat, ids = mat[keep], ids[keep]
        if len(ids) == 0:
            return empty
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
    return _merge_topk(partials, k)


def knn_filtered(ds, query_mat: np.ndarray, req_labels, k: int = 10,
                 exclude_ids=None, label_col: str = "label"):
    """Filtered vector search (the metadata-predicate ANN every vector DB
    exposes): per-query top-k cosine among ONLY the vectors whose
    ``label_col`` equals that query's required label. The filter applies
    INSIDE the per-batch partial (pre-filter, not post-filter — top-k never
    starves when the predicate is selective), so the merge stays k x batches
    rows. -> pandas (query_idx, vec_id, cos, rank), ties by vec_id asc."""
    import ray

    q = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_ref = ray.put(q)
    req = list(req_labels)
    excl = frozenset(int(x) for x in (exclude_ids or []))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        labs = df[label_col].to_numpy()
        if excl:
            keep = ~np.isin(ids, np.fromiter(excl, dtype=np.int64))
            mat, ids, labs = mat[keep], ids[keep], labs[keep]
        if len(ids) == 0:
            return pd.DataFrame({
                "query_idx": pd.Series([], dtype=np.int64),
                "vec_id": pd.Series([], dtype=np.int64),
                "cos": pd.Series([], dtype=np.float64),
            })
        sims = _normalize(mat) @ qm.T
        out_q, out_id, out_c = [], [], []
        for qi in range(qm.shape[0]):
            m = labs == req[qi]
            if not m.any():
                continue
            s = sims[m, qi]
            sel_ids = ids[m]
            kk = min(k, len(sel_ids))
            idx = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(sel_ids[idx].tolist())
            out_c.extend(s[idx].tolist())
        return pd.DataFrame({
            "query_idx": pd.Series(out_q, dtype=np.int64),
            "vec_id": pd.Series(out_id, dtype=np.int64),
            "cos": pd.Series(out_c, dtype=np.float64),
        })

    partials = ds.map_batches(partial_topk, batch_format="pandas")
    return _merge_topk(partials, k)


def _merge_topk(partials, k: int) -> pd.DataFrame:
    """k×n_batches partial rows -> per-query exact top-k (dedup by vec_id:
    multi-assigned IVF replicas emit the same candidate more than once)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["query_idx", "vec_id"])
        g = g.sort_values(
            ["cos", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        partials.groupby("query_idx").map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_idx", "rank"], ignore_index=True)
    )


def train_centroids(
    ds, n_centroids: int = 8, sample_n: int = 2048, iters: int = 20, seed: int = 3
):
    """Sampled k-means on the driver (the coarse quantizer — small by
    design) with **k-means++ seeding** over cosine distance. The sample is a
    REAL seeded random sample: the fraction is sized from the row count
    (parquet metadata — nothing executes) with 25% headroom, then capped at
    sample_n; taking the first n rows would bias the centroids to the
    leading files' distribution."""
    total = max(1, ds.count())
    frac = min(1.0, (sample_n * 1.25) / total)
    sample = ds.random_sample(frac, seed=seed).limit(sample_n).to_pandas()
    if len(sample) == 0:  # tiny input + unlucky sample: fall back to all rows
        sample = ds.limit(sample_n).to_pandas()
    mat = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(mat))
    cent = [mat[rng.integers(len(mat))]]
    # k-means++: sample ∝ distance to nearest seed. The min-distance vector
    # updates incrementally against only the NEWEST seed — recomputing the
    # min over all seeds each step is O(k²·sample·d) and dominates training
    # once k grows past a few hundred (the auto-sized IVF coarse quantizer).
    d2 = np.maximum(1.0 - mat @ cent[0], 0.0)
    for _ in range(k - 1):
        s = d2.sum()
        if s <= 0:
            nxt = rng.integers(len(mat))
        else:
            nxt = rng.choice(len(mat), p=d2 / s)
        cent.append(mat[nxt])
        d2 = np.minimum(d2, np.maximum(1.0 - mat @ mat[nxt], 0.0))
    cent = np.stack(cent)
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, mat)
        cnt = np.bincount(assign, minlength=len(cent))
        norms = np.linalg.norm(sums, axis=1)
        upd = (cnt > 0) & (norms > 0)
        cent[upd] = sums[upd] / norms[upd, None]
    return cent


def build_ivf_index(
    ds,
    index_dir: str,
    n_centroids: int = 8,
    replicas: int = 3,
    iters: int = 20,
    sample_n: int = 2048,
    seed: int = 3,
    source_tag: str | None = None,
):
    """Persist a multi-assigned IVF layout: ``index_dir/cells/cell=N/*.parquet``
    (vec_id + embedding, each vector in its ``replicas`` nearest cells) plus
    ``centroids.npy`` and ``meta.json``. Skips the build when meta matches
    the requested params and ``source_tag`` (pass the corpus fingerprint for
    cache reuse across runs). Returns the meta dict.
    """
    import ray

    meta_path = os.path.join(index_dir, "meta.json")
    want = {
        "n_centroids": int(n_centroids), "replicas": int(replicas),
        "iters": int(iters), "sample_n": int(sample_n), "seed": int(seed),
        "source_tag": source_tag,
    }
    try:
        with open(meta_path) as f:
            have = json.load(f)
        if all(have.get(k) == v for k, v in want.items()) and source_tag is not None:
            return have
    except (OSError, ValueError):
        pass

    cent = train_centroids(ds, n_centroids, sample_n, iters, seed)
    cent_ref = ray.put(cent)
    r = min(replicas, len(cent))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        sims = _normalize(mat) @ c.T
        top = np.argsort(-sims, axis=1)[:, :r]  # (n, r) cell ids
        n = len(df)
        cells = top.reshape(-1).astype(np.int64)
        out = pd.DataFrame(
            {
                "vec_id": np.repeat(df["vec_id"].to_numpy(np.int64), r),
                "cell": cells,
                # duplicated in-file (partition_cols lifts "cell" into the
                # path, and reading a cell dir directly wouldn't get it back)
                "cell_id": cells,
            }
        )
        out["embedding"] = [row for row in mat for _ in range(r)]
        return out

    cells_dir = os.path.join(index_dir, "cells")
    import shutil

    shutil.rmtree(cells_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    # coalesce before the partitioned write: each of the 32 writer blocks
    # would otherwise leave a fragment file in EVERY cell dir, and the query
    # path's fixed cost is per-file open, not per-row
    ds.map_batches(assign, batch_format="pandas").repartition(4).write_parquet(
        cells_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    meta = dict(want, dim=int(cent.shape[1]))
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def add_to_ivf_index(ds, index_dir: str) -> dict:
    """Incrementally add vectors to a persisted IVF layout (the vector-side
    analog of the inverted index's delta generations): new vectors are
    assigned to the EXISTING centroids (the coarse quantizer is frozen —
    standard IVF practice; retrain by rebuilding when drift matters) and
    land as delta parquet files inside the matching ``cells/cell=N/``
    partitions, so the query path picks them up with zero changes. Files
    move into place via rename AFTER a complete staged write — a crashed
    add leaves only an orphaned staging dir, never a half-visible delta."""
    import glob as _glob
    import shutil

    import ray
    import ray.data  # noqa: F401

    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    cent_ref = ray.put(cent)
    r = min(int(meta["replicas"]), len(cent))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        sims = _normalize(mat) @ c.T
        top = np.argsort(-sims, axis=1)[:, :r]
        cells = top.reshape(-1).astype(np.int64)
        out = pd.DataFrame({
            "vec_id": np.repeat(df["vec_id"].to_numpy(np.int64), r),
            "cell": cells,
            "cell_id": cells,
        })
        out["embedding"] = [row for row in mat for _ in range(r)]
        return out

    gen = int(meta.get("deltas", 0)) + 1
    stage = os.path.join(index_dir, f"_delta_stage_{gen}")
    shutil.rmtree(stage, ignore_errors=True)
    ds.map_batches(assign, batch_format="pandas").repartition(2).write_parquet(
        stage, partition_cols=["cell"]
    )
    n_files = 0
    for cell_dir in sorted(_glob.glob(os.path.join(stage, "cell=*"))):
        dest = os.path.join(index_dir, "cells", os.path.basename(cell_dir))
        os.makedirs(dest, exist_ok=True)
        for i, f in enumerate(sorted(_glob.glob(os.path.join(cell_dir, "*.parquet")))):
            os.replace(f, os.path.join(dest, f"delta-{gen}-{i}.parquet"))
            n_files += 1
    shutil.rmtree(stage, ignore_errors=True)
    meta["deltas"] = gen
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return {"gen": gen, "n_files": n_files}


def knn_ivf_query(index_dir: str, query_mat: np.ndarray, k: int = 10, n_probe: int = 3):
    """Query a persisted IVF index: reads ONLY the probed cell partitions
    (union across the query batch), one matmul per batch, per-query top-k
    partials merged exactly like brute force (replica dedup included)."""
    import ray
    import ray.data

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_mat, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    needed = sorted({int(c) for row in probes for c in row})
    import glob as _glob

    paths = [
        f
        for c in needed
        for f in sorted(
            _glob.glob(os.path.join(index_dir, "cells", f"cell={c}", "*.parquet"))
        )
    ]
    if not paths:  # every probed cell is empty (tiny/degenerate corpus)
        return pd.DataFrame(
            {"query_idx": pd.Series(dtype=np.int64),
             "vec_id": pd.Series(dtype=np.int64),
             "cos": pd.Series(dtype=np.float64),
             "rank": pd.Series(dtype=np.int64)}
        )
    probe_sets = [frozenset(int(c) for c in row) for row in probes]
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_sets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        psets = ray.get(probe_ref)
        mat = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        ids = df["vec_id"].to_numpy(np.int64)
        cells = df["cell_id"].to_numpy(np.int64)
        sims = mat @ qm.T  # (n, nq)
        out_q, out_id, out_c = [], [], []
        for qi in range(qm.shape[0]):
            m = np.isin(cells, np.fromiter(psets[qi], dtype=np.int64))
            if not m.any():
                continue
            s = sims[m, qi]
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

    # partition-column values come back from the path (cell=N)
    cells_ds = ray.data.read_parquet(paths)
    partials = cells_ds.map_batches(partial, batch_format="pandas")
    return _merge_topk(partials, k)


def knn_ivf(
    ds,
    query_mat: np.ndarray,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 3,
    replicas: int = 3,
    seed: int = 3,
    index_dir: str | None = None,
    source_tag: str | None = None,
):
    """Convenience: build (or reuse, when ``index_dir`` + ``source_tag``
    identify a persisted build) the IVF layout, then query it. Without an
    ``index_dir`` the layout is ephemeral: built in a temp dir and removed
    after the query (it holds replicas× the corpus — never leak it)."""
    ephemeral = index_dir is None
    if ephemeral:
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="avr_ivf_")
    try:
        build_ivf_index(
            ds, index_dir, n_centroids=n_centroids, replicas=replicas,
            seed=seed, source_tag=source_tag,
        )
        return knn_ivf_query(index_dir, query_mat, k=k, n_probe=n_probe)
    finally:
        if ephemeral:
            import shutil

            shutil.rmtree(index_dir, ignore_errors=True)


def mmr_select(qv: np.ndarray, cand_ids: np.ndarray, cand_mat: np.ndarray,
               k: int = 10, lam: float = 0.7,
               round_dp: int | None = None) -> pd.DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98):
    greedily pick argmax of lam*cos(q,d) - (1-lam)*max_{s in S} cos(d,s),
    ties by vec_id asc. Pure driver-side function over an already-gathered
    candidate slice (k x N work on an N-candidate matrix) — the distributed
    part is the top-N retrieval that produced the candidates.
    ``round_dp`` rounds every cosine AND the composite score to that many
    decimals BEFORE each argmax, making the greedy path reproducible by an
    external oracle that computes the same rounded values.
    -> (rank, vec_id, cos, mmr)."""
    q = _normalize(np.asarray(qv, dtype=np.float64)[None, :])[0]
    m = _normalize(np.asarray(cand_mat, dtype=np.float64))
    ids = np.asarray(cand_ids, dtype=np.int64)
    rel = m @ q
    inter = m @ m.T
    if round_dp is not None:
        rel = np.round(rel, round_dp)
        inter = np.round(inter, round_dp)
    n = len(ids)
    k = min(k, n)
    chosen: list[int] = []
    chosen_mask = np.zeros(n, dtype=bool)
    out_rank, out_id, out_cos, out_mmr = [], [], [], []
    for step in range(k):
        if chosen:
            div = inter[:, chosen].max(axis=1)
            score = lam * rel - (1.0 - lam) * div
        else:
            score = lam * rel
        if round_dp is not None:
            score = np.round(score, round_dp)
        score = np.where(chosen_mask, -np.inf, score)
        # deterministic argmax: best score, then smallest vec_id
        best = np.lexsort((ids, -score))[0]
        chosen.append(int(best))
        chosen_mask[best] = True
        out_rank.append(step + 1)
        out_id.append(int(ids[best]))
        out_cos.append(float(rel[best]))
        out_mmr.append(float(score[best]))
    return pd.DataFrame({
        "rank": pd.Series(out_rank, dtype=np.int64),
        "vec_id": pd.Series(out_id, dtype=np.int64),
        "cos": pd.Series(out_cos, dtype=np.float64),
        "mmr": pd.Series(out_mmr, dtype=np.float64),
    })


def knn_mmr(ds, query_vec: np.ndarray, k: int = 10, n_candidates: int = 50,
            lam: float = 0.7, exclude_ids=None,
            round_dp: int | None = None) -> pd.DataFrame:
    """Diversified kNN: distributed brute-force top-``n_candidates`` →
    pushdown gather of just those embeddings → driver-side MMR greedy.
    Stage-2 cost is k x n_candidates, independent of corpus size."""
    import ray

    cand = knn_brute_force(ds, np.asarray(query_vec, dtype=np.float64)[None, :],
                           k=n_candidates, exclude_ids=exclude_ids)
    ids = cand["vec_id"].to_numpy(np.int64)
    want_ref = ray.put(np.sort(ids))

    def gather(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(want_ref)
        m = np.isin(df["vec_id"].to_numpy(np.int64), w)
        return df[m].reset_index(drop=True)

    sel = ds.map_batches(gather, batch_format="pandas").to_pandas()
    sel = sel.set_index("vec_id").loc[ids]
    mat = np.stack(sel["embedding"].to_numpy()).astype(np.float64)
    return mmr_select(query_vec, ids, mat, k=k, lam=lam, round_dp=round_dp)


def quantize_embeddings(ds, id_col: str = "vec_id", col: str = "embedding"):
    """Symmetric per-vector int8 quantization (the compression step a
    100 TB ANN corpus runs before its vectors ever enter cell storage:
    4x smaller than float32, 8x smaller than float64):

        scale = max(|x_i|);  q_i = floor(127 * x_i / scale + 0.5)

    ``floor(+0.5)`` instead of banker's rounding so the value contract is
    bit-identical across numpy and SQL round-half conventions. Zero vectors
    quantize to zeros with scale 0. One streaming pass; no shuffle.
    -> Dataset (vec_id, dim, q:int64 in [-127,127], scale: round 6dp)."""

    def batch(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype=np.int64),
                "dim": pd.Series([], dtype=np.int64),
                "q": pd.Series([], dtype=np.int64),
                "scale": pd.Series([], dtype=np.float64),
            })
        mat = np.stack(df[col].to_numpy()).astype(np.float64)
        ids = df[id_col].to_numpy(np.int64)
        s = np.abs(mat).max(axis=1)
        safe = np.where(s == 0.0, 1.0, s)
        q = np.floor(127.0 * mat / safe[:, None] + 0.5).astype(np.int64)
        n, d = mat.shape
        return pd.DataFrame({
            "vec_id": pd.Series(np.repeat(ids, d), dtype=np.int64),
            "dim": pd.Series(np.tile(np.arange(d, dtype=np.int64), n),
                             dtype=np.int64),
            "q": pd.Series(q.ravel(), dtype=np.int64),
            "scale": pd.Series(np.repeat(np.round(s, 6), d), dtype=np.float64),
        })

    return ds.map_batches(batch, batch_format="pandas")


def train_pq_codebooks(
    ds, m: int = 8, k: int = 16, sample_n: int = 2048, iters: int = 20,
    seed: int = 5,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., "Product Quantization
    for Nearest Neighbor Search"): split each NORMALIZED embedding into
    ``m`` contiguous subspaces and k-means each subspace independently
    (k-means++ seeding, L2, Lloyd iterations) on a seeded driver-side
    sample — the same small-model-train / broadcast shape as the IVF
    coarse quantizer.

    -> (m, k, dim/m) float64 codebook tensor. Rows beyond the sample's
    distinct capacity repeat the last centroid (codes never reference
    them)."""
    total = max(1, ds.count())
    frac = min(1.0, (sample_n * 1.25) / total)
    sample = ds.random_sample(frac, seed=seed).limit(sample_n).to_pandas()
    if len(sample) == 0:
        sample = ds.limit(sample_n).to_pandas()
    mat = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = np.ascontiguousarray(mat[:, j * dsub:(j + 1) * dsub])
        x2 = (sub ** 2).sum(axis=1)
        kk = min(k, len(sub))
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2: one matmul per round, never
        # the (n, k, dsub) broadcast tensor (k=128 made that the bottleneck)
        cent = [sub[rng.integers(len(sub))]]
        d2 = x2 - 2.0 * sub @ cent[0] + (cent[0] ** 2).sum()
        for _ in range(kk - 1):
            d2 = np.maximum(d2, 0.0)
            s = d2.sum()
            if s <= 0:
                c = sub[rng.integers(len(sub))]
            else:
                c = sub[rng.choice(len(sub), p=d2 / s)]
            cent.append(c)
            d2 = np.minimum(d2, x2 - 2.0 * sub @ c + (c ** 2).sum())
        cent = np.stack(cent)
        for _ in range(iters):
            dots = sub @ cent.T - 0.5 * (cent ** 2).sum(axis=1)[None, :]
            a = np.argmax(dots, axis=1)
            # vectorized centroid update: per-cluster sums via np.add.at
            sums = np.zeros_like(cent)
            np.add.at(sums, a, sub)
            cnt = np.bincount(a, minlength=kk).astype(np.float64)
            nz = cnt > 0
            cent[nz] = sums[nz] / cnt[nz, None]
        books[j, :kk] = cent
        if kk < k:
            books[j, kk:] = cent[-1]
    return books


def pq_encode(ds, books: np.ndarray, id_col: str = "vec_id",
              col: str = "embedding"):
    """Encode each vector to ONE packed int64 PQ code: subspace j's argmin
    centroid index occupies bits [j*b, (j+1)*b) where b = ceil(log2(k)).
    With the defaults (m=8, k=16) a 64-dim float64 vector becomes 4 bytes
    of payload in an 8-byte lane — 128x smaller, the compression that lets
    a 100-TB embedding corpus sit in memory across a cluster. Streaming
    map; codebooks broadcast once.

    -> Dataset (vec_id, pq_code: int64)."""
    import ray

    m, k, dsub = books.shape
    bits = max(1, int(np.ceil(np.log2(k))))
    if m * bits > 63:
        raise ValueError(f"m={m} x {bits} bits exceeds the int64 lane")
    b_ref = ray.put(books)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype=np.int64),
                "pq_code": pd.Series([], dtype=np.int64),
            })
        bk = ray.get(b_ref)
        mat = _normalize(np.stack(df[col].to_numpy()).astype(np.float64))
        ids = df[id_col].to_numpy(np.int64)
        packed = np.zeros(len(df), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            # argmin ||x - c||^2 = argmax (x.c - ||c||^2/2), one matmul
            dots = sub @ bk[j].T - 0.5 * (bk[j] ** 2).sum(axis=1)[None, :]
            packed |= np.argmax(dots, axis=1).astype(np.int64) << (j * bits)
        return pd.DataFrame({
            "vec_id": pd.Series(ids, dtype=np.int64),
            "pq_code": pd.Series(packed, dtype=np.int64),
        })

    return ds.map_batches(encode, batch_format="pandas")


def knn_pq(
    ds, query_mat: np.ndarray, k: int = 10, m: int = 8, n_codes: int = 16,
    shortlist: int | None = None, sample_n: int = 2048, seed: int = 5,
):
    """PQ-accelerated kNN: asymmetric-distance (ADC) shortlist over the
    packed codes, then EXACT cosine rerank of the shortlist against the
    original vectors (the standard two-stage PQ serving pipeline). The ADC
    pass touches only 8 bytes/vector — at 100 TB the codes table is the
    only full scan; the rerank reads just the shortlisted ids via predicate
    pushdown.

    -> pandas (query_idx, vec_id, cos, rank) — cos is EXACT (rerank
    output): overlapping rows agree with knn_brute_force up to BLAS-kernel
    ULP variance (the two paths matmul over different batch shapes, and
    gemv vs gemm can differ in the last bit of the k-reduction)."""
    import ray

    shortlist = shortlist or 10 * k
    books = train_pq_codebooks(ds, m=m, k=n_codes, sample_n=sample_n, seed=seed)
    codes = pq_encode(ds, books)
    q = _normalize(np.asarray(query_mat, dtype=np.float64))
    mm, kk, dsub = books.shape
    bits = max(1, int(np.ceil(np.log2(kk))))
    # per-query ADC lookup tables: LUT[q, j, c] = q_sub[j] . books[j, c]
    lut = np.einsum("qjd,jcd->qjc", q.reshape(len(q), mm, dsub), books)
    lut_ref = ray.put(lut)
    mask = (1 << bits) - 1

    def adc_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "query_idx": pd.Series([], dtype=np.int64),
                "vec_id": pd.Series([], dtype=np.int64),
                "cos": pd.Series([], dtype=np.float64),
            })
        lt = ray.get(lut_ref)
        ids = df["vec_id"].to_numpy(np.int64)
        packed = df["pq_code"].to_numpy(np.int64)
        idx = np.empty((len(ids), mm), dtype=np.int64)
        for j in range(mm):
            idx[:, j] = (packed >> (j * bits)) & mask
        out_q, out_id, out_s = [], [], []
        nn = min(shortlist, len(ids))
        rows = np.arange(mm)[None, :]
        for qi in range(lt.shape[0]):
            scores = lt[qi][rows, idx].sum(axis=1)
            top = np.argpartition(-scores, nn - 1)[:nn]
            out_q.extend([qi] * len(top))
            out_id.extend(ids[top].tolist())
            out_s.extend(scores[top].tolist())
        return pd.DataFrame({
            "query_idx": pd.Series(out_q, dtype=np.int64),
            "vec_id": pd.Series(out_id, dtype=np.int64),
            "cos": pd.Series(out_s, dtype=np.float64),
        })

    cand = _merge_topk(codes.map_batches(adc_partial, batch_format="pandas"),
                       shortlist)
    cand_ids = np.unique(cand["vec_id"].to_numpy(np.int64))
    # exact rerank over the shortlist only (sorted-id searchsorted filter)
    gathered = ds.map_batches(
        lambda df: df[np.isin(df["vec_id"].to_numpy(np.int64), cand_ids)],
        batch_format="pandas",
    )
    return knn_brute_force(gathered, query_mat, k=k)


def label_centroids(ds, label_col: str = "label", vec_col: str = "embedding"):
    """Per-label mean embedding (the class-centroid table used for
    prototype classification, cluster naming, and embedding-drift checks):
    ONE keyed tree pass over (label, dim) partial sums — the corpus
    streams, only label_count × dim rows ever aggregate. Values are summed
    in float64 and the mean is rounded to 6 dp (the repo's float-parity
    contract with the SQL oracle). -> pandas (label, dim, mean), dim
    1-based."""
    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "label": pd.Series(dtype=np.int64),
                "dim": pd.Series(dtype=np.int64),
                "s": pd.Series(dtype=np.float64),
                "n": pd.Series(dtype=np.int64),
            })
        mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        labels = df[label_col].to_numpy(np.int64)
        ul, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(ul), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv).astype(np.int64)
        L, D = sums.shape
        return pd.DataFrame({
            "label": np.repeat(ul, D),
            "dim": np.tile(np.arange(1, D + 1, dtype=np.int64), L),
            "s": sums.ravel(),
            "n": np.repeat(cnt, D),
        })

    agg = tree_aggregate(
        ds, ["label", "dim"], partial, {"s": "sum", "n": "sum"}
    ).to_pandas()
    agg["mean"] = np.round(
        agg["s"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64), 6
    )
    agg["label"] = agg["label"].astype(np.int64)
    agg["dim"] = agg["dim"].astype(np.int64)
    return agg.sort_values(["label", "dim"], ignore_index=True)[
        ["label", "dim", "mean"]
    ]


# Above this many vectors the exact all-pairs path (corpus matrix broadcast
# + O(n²) matmul) stops being the right default and mode="auto" routes to
# the IVF shortlist instead. ~200k × 32 dims × 8 B ≈ 50 MB broadcast and
# 4·10^10 multiply-adds — the knee on the bench box.
KNN_CONFUSION_EXACT_MAX = 200_000
_CONFUSION_BUCKETS = 256


def _knn_label_confusion_ivf(ds, id_col: str, label_col: str, vec_col: str,
                             n_centroids: int | None = None, replicas: int = 3,
                             sample_n: int = 2048, iters: int = 20,
                             seed: int = 3, n_rows: int | None = None):
    """IVF-shortlisted leave-one-out 1-NN confusion — the 100-TB path.

    Partitioning assumption (document per the custom-operator rule): a
    vector's true nearest neighbor shares at least one of its ``replicas``
    nearest cells (multi-assignment on BOTH sides makes co-occurrence
    likely; with n_centroids=1 this degenerates to the exact answer). No
    corpus-sized broadcast anywhere: per-cell all-pairs matmuls are bounded
    by cell population (cells auto-size to ~sqrt(replicas·n) so population
    stays ~sqrt — a FIXED n_centroids makes per-cell work grow n²/k and
    wedged at 300k rows), and the cross-cell reduce rides a 256-bucket
    keyed groupby (never a row-cardinality key)."""
    import ray

    if isinstance(ds, pd.DataFrame):
        ds = ray.data.from_pandas(ds)
    if n_centroids is None:
        n = n_rows if n_rows is not None else ds.count()
        n_centroids = int(np.clip(round(np.sqrt(replicas * max(n, 1))),
                                  8, 65536))
        # the coarse quantizer needs enough sample mass per centroid
        sample_n = max(sample_n, 32 * n_centroids)
    cent = train_centroids(ds, n_centroids, sample_n, iters, seed)
    cent_ref = ray.put(cent)
    r = min(replicas, len(cent))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                label_col: pd.Series(dtype=np.int64),
                "cell": pd.Series(dtype=np.int64),
                vec_col: pd.Series(dtype=object),
            })
        c = ray.get(cent_ref)
        mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        sims = _normalize(mat) @ c.T
        top = np.argsort(-sims, axis=1)[:, :r]
        out = pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(np.int64), r),
            label_col: np.repeat(df[label_col].to_numpy(np.int64), r),
            "cell": top.reshape(-1).astype(np.int64),
        })
        out[vec_col] = [row for row in mat for _ in range(r)]
        return out

    def cell_nn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series(dtype=np.int64),
            "label": pd.Series(dtype=np.int64),
            "nn_id": pd.Series(dtype=np.int64),
            "nn_label": pd.Series(dtype=np.int64),
            "cos": pd.Series(dtype=np.float64),
            "bucket": pd.Series(dtype=np.int64),
        })
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col, ignore_index=True)
        mat = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy(np.int64)
        labels = g[label_col].to_numpy(np.int64)
        n_g = len(ids)
        # Row-chunked all-pairs: a dense n_g² sims matrix (plus np.round's
        # copy) is ~1.6 GB per task at a 14k-row cell — with 32 concurrent
        # tasks that thrashed the node. Bound the live matrix to ~2^25
        # elements regardless of cell size.
        ch = max(64, (1 << 25) // n_g)
        nn = np.empty(n_g, dtype=np.int64)
        cos = np.empty(n_g, dtype=np.float64)
        for s in range(0, n_g, ch):
            e = min(s + ch, n_g)
            sims = np.round(mat[s:e] @ mat.T, 6)
            rows = np.arange(e - s)
            sims[rows, np.arange(s, e)] = -np.inf  # leave-one-out: self
            nn[s:e] = np.argmax(sims, axis=1)  # ids asc → first max = min id
            cos[s:e] = sims[rows, nn[s:e]]
        bucket = (
            ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) % np.uint64(_CONFUSION_BUCKETS)
        return pd.DataFrame({
            id_col: ids,
            "label": labels,
            "nn_id": ids[nn],
            "nn_label": labels[nn],
            "cos": cos,
            "bucket": bucket.astype(np.int64),
        })

    def best_per_vec(g: pd.DataFrame) -> pd.DataFrame:
        # ≤ replicas candidate rows per vec: keep (cos desc, nn_id asc),
        # then collapse to per-bucket partial confusion counts.
        g = g.sort_values([id_col, "cos", "nn_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates(id_col, keep="first")
        out = g.groupby(["label", "nn_label"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    partials = (
        ds.map_batches(assign, batch_format="pandas")
        .groupby("cell")
        .map_groups(cell_nn, batch_format="pandas")
        .groupby("bucket")
        .map_groups(best_per_vec, batch_format="pandas")
        .to_pandas()
    )
    if len(partials) == 0:
        return pd.DataFrame({
            "label": pd.Series(dtype=np.int64),
            "nn_label": pd.Series(dtype=np.int64),
            "n": pd.Series(dtype=np.int64),
        })
    agg = partials.groupby(["label", "nn_label"], as_index=False)["n"].sum()
    agg["label"] = agg["label"].astype(np.int64)
    agg["nn_label"] = agg["nn_label"].astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    return agg.sort_values(["label", "nn_label"], ignore_index=True)


def knn_label_confusion(ds, id_col: str = "vec_id", label_col: str = "label",
                        vec_col: str = "embedding", mode: str = "auto",
                        exact_max_rows: int = KNN_CONFUSION_EXACT_MAX,
                        n_centroids: int | None = None, replicas: int = 3):
    """Leave-one-out 1-NN label confusion matrix — the standard intrinsic
    eval of an embedding table (how often is a vector's nearest neighbor
    from another class?). EXACT all-pairs by contract below
    ``exact_max_rows`` (like ``dedup.embedding_near_dups_exact``): the
    id-sorted corpus matrix is broadcast once (``ray.put``) and every batch
    does one matmul against it — O(n²) compute distributed over batches,
    one corpus-sized object. Past the threshold ``mode="auto"`` routes to
    the IVF shortlist (`_knn_label_confusion_ivf`) automatically — the
    corpus never broadcasts there. ``mode="exact"`` / ``mode="ivf"`` force
    a path.

    Ties break on (rounded cos desc, vec_id asc) — argmax over the
    ascending-id matrix returns the first maximum, mirroring the SQL
    row_number order. -> pandas (label, nn_label, n)."""
    import ray

    from ..state.aggregates import tree_aggregate

    n = None
    if mode == "auto":
        n = len(ds) if isinstance(ds, pd.DataFrame) else ds.count()
        mode = "exact" if n <= exact_max_rows else "ivf"
    if mode == "ivf":
        return _knn_label_confusion_ivf(
            ds, id_col, label_col, vec_col,
            n_centroids=n_centroids, replicas=replicas, n_rows=n,
        )

    pdf = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    pdf = pdf.sort_values(id_col, ignore_index=True)
    C = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    cids = pdf[id_col].to_numpy(np.int64)
    clabels = pdf[label_col].to_numpy(np.int64)
    ref = ray.put((C, cids, clabels))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "label": pd.Series(dtype=np.int64),
                "nn_label": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
            })
        Cm, ids, labels = ray.get(ref)
        mat = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        bids = df[id_col].to_numpy(np.int64)
        blab = df[label_col].to_numpy(np.int64)
        sims = np.round(mat @ Cm.T, 6)
        pos = np.searchsorted(ids, bids)
        ok = pos < len(ids)
        rows = np.flatnonzero(ok)
        rows = rows[ids[pos[ok]] == bids[ok]]
        sims[rows, pos[rows]] = -np.inf  # leave-one-out: mask self
        nn = np.argmax(sims, axis=1)
        out = pd.DataFrame({
            "label": blab, "nn_label": labels[nn],
            "n": np.int64(1),
        })
        return out.groupby(["label", "nn_label"], as_index=False)["n"].sum()

    agg = tree_aggregate(
        ds, ["label", "nn_label"], partial, {"n": "sum"}
    ).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    agg["label"] = agg["label"].astype(np.int64)
    agg["nn_label"] = agg["nn_label"].astype(np.int64)
    return agg.sort_values(["label", "nn_label"], ignore_index=True)


# ---------------------------------------------------------------------------
# Deterministic (SQL-reproducible) IVF / PQ twins.
#
# train_centroids / train_pq_codebooks use Ray's random_sample + numpy RNG
# (k-means++) — better recall, but the RNG stream is not reproducible in SQL,
# which is why knn_ivf_top10 / knn_pq_top10 are rows-only gate entries. The
# *_det twins below replace every random decision with a deterministic,
# SQL-expressible rule, so the WHOLE ANN pipeline (train -> assign -> probe ->
# shortlist -> exact rerank) hash-checks against an unrolled-CTE DuckDB oracle
# (the bpe_merges precedent):
#   - sample: md5-threshold Bernoulli (curation's md5 contract), frac rounded
#     to 6 dp so the threshold is a bit-identical double on both sides;
#   - seeding: farthest-point (k-center greedy) from the min-vec_id row,
#     ties -> lowest vec_id;
#   - Lloyd: fixed iteration count; assignment argmax-sim / argmin-d2 with
#     ties -> lowest cell/code id; empty cells keep their previous centroid.
# Float contract: discrete decisions (argmax/argmin/top-N cuts) must agree —
# both sides compute in float64 and random embeddings keep decision margins
# far above summation-order noise; the reported cos is exact-rerank output
# rounded to 6 dp, same as every other float gate entry.
# ---------------------------------------------------------------------------


def _normalize_det(mat: np.ndarray) -> np.ndarray:
    """Row L2-normalize via sqrt(sum(x^2)) — mirrors SQL's
    ``val / sqrt(list_dot_product(v, v))`` (np.linalg.norm routes through
    BLAS nrm2's scaled accumulation, a different rounding)."""
    nrm = np.sqrt((mat * mat).sum(axis=1))
    nrm[nrm == 0] = 1.0
    return mat / nrm[:, None]


def det_sample(ds, sample_n: int, salt: str) -> pd.DataFrame:
    """Deterministic training sample: keep vec_id iff
    ``md5_u64(f"{salt}:{vec_id}") < floor(frac * 2^64)`` with
    ``frac = round(min(1, sample_n / total), 6)`` — the exact curation
    md5-threshold idiom, so DuckDB reproduces the same row set. Returns a
    pandas frame SORTED by vec_id (the seeding order contract)."""
    from .curation import _U64, _hash_u64_vec

    total = max(1, ds.count())
    frac = round(min(1.0, sample_n / total), 6)
    if frac >= 1.0:
        pdf = ds.to_pandas()
    else:
        thresh = np.uint64(min(_U64 - 1, int(math.floor(frac * 2.0 ** 64))))

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            h = _hash_u64_vec(salt, df["vec_id"].to_numpy(np.int64))
            return df[h < thresh]

        pdf = ds.map_batches(keep, batch_format="pandas").to_pandas()
    return pdf.sort_values("vec_id", ignore_index=True)


def train_centroids_det(
    ds, n_centroids: int = 8, iters: int = 4, sample_n: int = 4096,
    salt: str = "ivfdet",
) -> np.ndarray:
    """Deterministic coarse quantizer (the hash-checkable twin of
    ``train_centroids``): farthest-point seeding over cosine distance from
    the min-vec_id sample row, then ``iters`` Lloyd rounds (assign = argmax
    cosine, ties lowest cell; update = L2-normalized mean; empty or
    zero-norm cells keep the previous centroid). -> (k, dim) float64."""
    sample = det_sample(ds, sample_n, salt)
    mat = _normalize_det(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    k = min(n_centroids, len(mat))
    seeds = [0]
    d = 1.0 - mat @ mat[0]
    for _ in range(k - 1):
        nxt = int(np.argmax(d))  # first max == lowest vec_id on exact ties
        seeds.append(nxt)
        d = np.minimum(d, 1.0 - mat @ mat[nxt])
    cent = mat[seeds].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)  # first max == lowest cell
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, mat)
        cnt = np.bincount(assign, minlength=k).astype(np.float64)
        nz = cnt > 0
        avg = np.zeros_like(cent)
        avg[nz] = sums[nz] / cnt[nz, None]
        nrm = np.sqrt((avg * avg).sum(axis=1))
        upd = nz & (nrm > 0)
        cent[upd] = avg[upd] / nrm[upd, None]
    return cent


def knn_ivf_det(
    ds, query_mat: np.ndarray, k: int = 10, n_cells: int = 8, iters: int = 4,
    replicas: int = 3, n_probe: int = 3, sample_n: int = 4096,
    exclude_ids=None,
) -> pd.DataFrame:
    """IVF kNN with the deterministic quantizer: every vector lands in its
    ``replicas`` nearest cells (ties lowest cell), the query probes its
    ``n_probe`` nearest cells, candidates rerank with exact cosine. The
    corpus pass is one streaming map_batches (centroids broadcast once);
    ranking ties break on vec_id. -> pandas (query_idx, vec_id, cos, rank),
    rank-identical to the DuckDB oracle."""
    import ray

    cent = train_centroids_det(ds, n_cells, iters, sample_n)
    q = _normalize_det(np.asarray(query_mat, dtype=np.float64))
    r = min(replicas, len(cent))
    probes = np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, : min(n_probe, len(cent))]
    probe_sets = [frozenset(int(c) for c in row) for row in probes]
    cent_ref = ray.put(cent)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_sets)
    excl = frozenset(int(x) for x in (exclude_ids or []))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "query_idx": pd.Series([], dtype=np.int64),
            "vec_id": pd.Series([], dtype=np.int64),
            "cos": pd.Series([], dtype=np.float64),
        })
        if len(df) == 0:
            return empty
        c = ray.get(cent_ref)
        qm = ray.get(q_ref)
        psets = ray.get(probe_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        if excl:
            m = ~np.isin(ids, np.fromiter(excl, dtype=np.int64))
            mat, ids = mat[m], ids[m]
        if len(ids) == 0:
            return empty
        nmat = _normalize_det(mat)
        top = np.argsort(-(nmat @ c.T), axis=1, kind="stable")[:, :r]
        sims = nmat @ qm.T  # (n, nq)
        out_q, out_id, out_c = [], [], []
        for qi in range(qm.shape[0]):
            cells = np.fromiter(psets[qi], dtype=np.int64)
            hit = np.isin(top, cells).any(axis=1)
            if not hit.any():
                continue
            s = sims[hit, qi]
            sub = ids[hit]
            kk = min(k, len(sub))
            idx = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(sub[idx].tolist())
            out_c.extend(s[idx].tolist())
        return pd.DataFrame({
            "query_idx": pd.Series(out_q, dtype=np.int64),
            "vec_id": pd.Series(out_id, dtype=np.int64),
            "cos": pd.Series(out_c, dtype=np.float64),
        })

    return _merge_topk(ds.map_batches(partial, batch_format="pandas"), k)


def train_pq_codebooks_det(
    ds, m: int = 8, k: int = 8, iters: int = 3, sample_n: int = 4096,
    salt: str = "pqdet",
) -> np.ndarray:
    """Deterministic PQ codebooks (the hash-checkable twin of
    ``train_pq_codebooks``): per contiguous subspace, farthest-point
    seeding in squared-L2 from the min-vec_id row, then ``iters`` Lloyd
    rounds (assign = argmin d2, ties lowest code; update = plain mean —
    no normalization, this is L2 k-means; empty codes keep their previous
    centroid). Rows beyond the sample's capacity repeat the last centroid.
    -> (m, k, dim/m) float64."""
    sample = det_sample(ds, sample_n, salt)
    mat = _normalize_det(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, k, dsub), dtype=np.float64)
    kk = min(k, len(mat))
    for j in range(m):
        sub = np.ascontiguousarray(mat[:, j * dsub:(j + 1) * dsub])
        seeds = [0]
        d2 = ((sub - sub[0]) ** 2).sum(axis=1)
        for _ in range(kk - 1):
            nxt = int(np.argmax(d2))
            seeds.append(nxt)
            d2 = np.minimum(d2, ((sub - sub[nxt]) ** 2).sum(axis=1))
        cent = sub[seeds].copy()
        for _ in range(iters):
            d2all = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2all, axis=1)  # first min == lowest code
            sums = np.zeros_like(cent)
            np.add.at(sums, a, sub)
            cnt = np.bincount(a, minlength=kk).astype(np.float64)
            nz = cnt > 0
            cent[nz] = sums[nz] / cnt[nz, None]
        books[j, :kk] = cent
        if kk < k:
            books[j, kk:] = cent[-1]
    return books


def knn_pq_det(
    ds, query_mat: np.ndarray, k: int = 10, m: int = 8, n_codes: int = 8,
    iters: int = 3, shortlist: int = 50, sample_n: int = 4096,
    exclude_ids=None,
) -> pd.DataFrame:
    """PQ kNN with deterministic codebooks: encode (argmin d2, ties lowest
    code), ADC shortlist by summed subspace squared-L2 to the query
    (ascending, ties lowest vec_id), exact cosine rerank of the shortlist.
    One streaming encode+ADC pass (codebooks broadcast once), then a
    shortlist-only rerank pass. -> pandas (query_idx, vec_id, cos, rank),
    rank-identical to the DuckDB oracle."""
    import ray

    books = train_pq_codebooks_det(ds, m=m, k=n_codes, iters=iters,
                                   sample_n=sample_n)
    q = _normalize_det(np.asarray(query_mat, dtype=np.float64))
    mm, kc, dsub = books.shape
    # ADC tables: dt[q, j, c] = ||q_sub_j - books[j, c]||^2
    qs = q.reshape(len(q), mm, dsub)
    dt = ((qs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
    b_ref = ray.put(books)
    dt_ref = ray.put(dt)
    excl = frozenset(int(x) for x in (exclude_ids or []))

    def adc_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "query_idx": pd.Series([], dtype=np.int64),
            "vec_id": pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
        })
        if len(df) == 0:
            return empty
        bk = ray.get(b_ref)
        lt = ray.get(dt_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        if excl:
            mk = ~np.isin(ids, np.fromiter(excl, dtype=np.int64))
            mat, ids = mat[mk], ids[mk]
        if len(ids) == 0:
            return empty
        nmat = _normalize_det(mat)
        codes = np.empty((len(ids), mm), dtype=np.int64)
        for j in range(mm):
            sub = nmat[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - bk[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        rows = np.arange(mm)[None, :]
        out_q, out_id, out_s = [], [], []
        nn = min(shortlist, len(ids))
        for qi in range(lt.shape[0]):
            scores = lt[qi][rows, codes].sum(axis=1)
            idx = np.argpartition(scores, nn - 1)[:nn]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(scores[idx].tolist())
        return pd.DataFrame({
            "query_idx": pd.Series(out_q, dtype=np.int64),
            "vec_id": pd.Series(out_id, dtype=np.int64),
            "score": pd.Series(out_s, dtype=np.float64),
        })

    partials = ds.map_batches(adc_partial, batch_format="pandas")

    def merge_short(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[True, True],
                          kind="mergesort").head(shortlist)
        return g

    short = (partials.groupby("query_idx")
             .map_groups(merge_short, batch_format="pandas").to_pandas())
    cand_ids = np.unique(short["vec_id"].to_numpy(np.int64))
    gathered = ds.map_batches(
        lambda df: df[np.isin(df["vec_id"].to_numpy(np.int64), cand_ids)],
        batch_format="pandas",
    )
    return knn_brute_force(gathered, query_mat, k=k)
