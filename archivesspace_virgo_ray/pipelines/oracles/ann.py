"""Vector / embedding / ANN / clustering oracles (split from queries.py; see that module for the facade)."""

from __future__ import annotations
import hashlib
import os
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ...functions.tokenize import TOKEN_RE, batch_term_doc_tf
from ..dedup import exact_dedup, minhash_dedup, simhash_near_dups
from ..similarity import knn_brute_force, knn_ivf
from ..textstats import LANG_PROFILES, lang_id_batch

from .common import *  # noqa: F401,F403
from .common import (_RANK_MARGIN, _bm25_sql, _build_docs_index, _docs, _index_dir_for, _matched_docs_ds, _ranked_topk)  # noqa: F401


def embedding_quantize_int8(sf_dir: str) -> pd.DataFrame:
    from ..similarity import quantize_embeddings

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    out = quantize_embeddings(ds).to_pandas()
    return out.sort_values(["vec_id", "dim"], ignore_index=True)


SQL_QUANTIZE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS sc FROM e)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(g.i AS BIGINT) AS dim,
       CAST(floor(127.0 * v[g.i + 1]
                  / (CASE WHEN sc = 0 THEN 1.0 ELSE sc END) + 0.5) AS BIGINT)
         AS q,
       round(sc, 6) AS scale
FROM s CROSS JOIN LATERAL (SELECT unnest(range(len(v))) AS i) g
ORDER BY vec_id, dim
"""


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=pads.field("vec_id") == vec_id, columns=["embedding"]
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def knn_cosine_top10(sf_dir: str):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = _query_vec(sf_dir, 0)
    out = knn_brute_force(ds, np.asarray([q0], dtype=np.float64), k=10, exclude_ids=[0])
    out = out.copy()
    out["cos"] = out["cos"].round(6)
    out = out.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort",
                          ignore_index=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "vec_id", "cos"]]


SQL_KNN_COSINE = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id,
         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)), 6) AS cos
  FROM embeddings WHERE vec_id <> 0)
SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank, vec_id, cos
FROM sims
ORDER BY cos DESC, vec_id
LIMIT 10
"""


def embedding_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label mean embedding (long form: label, dim, mean)."""
    from ..similarity import label_centroids

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["label", "embedding"])
    return label_centroids(ds)


SQL_LABEL_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(dim AS BIGINT) AS dim,
       round(avg(v), 6) AS mean
FROM (SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings)
GROUP BY label, dim
ORDER BY label, dim
"""


def knn_label_confusion_matrix(sf_dir: str) -> pd.DataFrame:
    """Leave-one-out 1-NN label confusion counts over the embedding table."""
    from ..similarity import knn_label_confusion

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return knn_label_confusion(ds)


SQL_KNN_LABEL_CONFUSION = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS aid, a.label AS alabel, b.vec_id AS bid,
         b.label AS blabel,
         round(list_cosine_similarity(a.v, b.v), 6) AS cos
  FROM e a JOIN e b ON b.vec_id <> a.vec_id),
nn AS (
  SELECT aid, alabel, blabel,
         row_number() OVER (PARTITION BY aid
                            ORDER BY cos DESC, bid) AS rn
  FROM pairs)
SELECT CAST(alabel AS BIGINT) AS label, CAST(blabel AS BIGINT) AS nn_label,
       CAST(count(*) AS BIGINT) AS n
FROM nn WHERE rn = 1
GROUP BY alabel, blabel
ORDER BY label, nn_label
"""


# --------------------------- filtered vector search -------------------------
#
# Metadata-predicate kNN (the filtered-ANN surface every vector store
# exposes): per query, top-10 cosine among ONLY vectors sharing the query
# vector's label. Pre-filter inside the per-batch partial — top-k can't
# starve on selective predicates, merge stays k x batches.

KNN_FILTER_QIDS = [0, 1, 2]


def knn_filtered_top10(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ..similarity import knn_filtered

    src = os.path.join(sf_dir, "embeddings.parquet")
    t = pads.dataset(src).to_table(
        filter=pads.field("vec_id").isin(KNN_FILTER_QIDS),
        columns=["vec_id", "embedding", "label"],
    )
    by_id = {
        int(v): (np.asarray(e, dtype=np.float64), int(lab))
        for v, e, lab in zip(
            t["vec_id"].to_pylist(), t["embedding"].to_pylist(),
            t["label"].to_pylist(),
        )
    }
    qm = np.stack([by_id[q][0] for q in KNN_FILTER_QIDS])
    labs = [by_id[q][1] for q in KNN_FILTER_QIDS]
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding", "label"])
    out = knn_filtered(ds, qm, labs, k=BM25_K + _RANK_MARGIN,
                       exclude_ids=KNN_FILTER_QIDS)
    out = out.copy()
    out["query_id"] = pd.Series(KNN_FILTER_QIDS, dtype=np.int64).to_numpy()[
        out["query_idx"].to_numpy(np.int64)
    ]
    out["cos"] = out["cos"].round(6)
    out = out.sort_values(["query_id", "cos", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "vec_id", "cos"]]


def _knn_filtered_sql() -> str:
    qids = ", ".join(str(q) for q in KNN_FILTER_QIDS)
    excl = ", ".join(str(q) for q in KNN_FILTER_QIDS)
    return f"""
WITH qv AS (
  SELECT vec_id AS query_id, label AS qlab,
         CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({qids})),
sims AS (
  SELECT qv.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qe), 6) AS cos
  FROM embeddings e
  JOIN qv ON e.label = qv.qlab
  WHERE e.vec_id NOT IN ({excl}))
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       vec_id, cos
FROM sims
QUALIFY rank <= {BM25_K}
ORDER BY query_id, rank
"""


# --------------------------- MMR diversified retrieval ----------------------
#
# Maximal Marginal Relevance (Carbonell & Goldstein '98) over the distributed
# brute-force top-50 candidates: greedy argmax of
#   lam*cos(q,d) - (1-lam)*max_{s in S} cos(d,s),  ties by vec_id asc.
# Every cosine and the composite score are rounded to 6 dp before each argmax
# on BOTH sides (round_dp=6 in the engine, round(...,6) in the SQL), so the
# greedy path is bit-reproducible. The oracle unrolls the k greedy steps as
# chained CTEs (one LIMIT-1 argmax per step) — no recursive CTE needed.

MMR_K = 10


MMR_CANDIDATES = 50


MMR_LAMBDA = 0.7


def knn_mmr_top10(sf_dir: str) -> pd.DataFrame:
    from ..similarity import knn_mmr

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    q0 = _query_vec(sf_dir, 0)
    out = knn_mmr(ds, q0, k=MMR_K, n_candidates=MMR_CANDIDATES,
                  lam=MMR_LAMBDA, exclude_ids=[0], round_dp=6)
    out = out.copy()
    out["cos"] = out["cos"].round(6)
    out["mmr"] = out["mmr"].round(6)
    return out[["rank", "vec_id", "cos", "mmr"]]


def _knn_mmr_sql() -> str:
    lam = MMR_LAMBDA
    # step CTEs: p1 = pure-relevance argmax; p_i adds the argmax of the
    # diversity-penalized score among the not-yet-selected candidates.
    steps = [f"""
p1 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS rank, vec_id, cos,
         round({lam}*cos, 6) AS mmr
  FROM cand ORDER BY round({lam}*cos, 6) DESC, vec_id LIMIT 1)"""]
    for i in range(2, MMR_K + 1):
        prev = f"p{i - 1}"
        steps.append(f"""
p{i} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  (SELECT CAST({i} AS BIGINT) AS rank, c.vec_id, c.cos,
          round({lam}*c.cos - (1.0 - {lam}) *
                (SELECT max(ps.sim) FROM ps
                 WHERE ps.ia = c.vec_id
                   AND ps.ib IN (SELECT vec_id FROM {prev})), 6) AS mmr
   FROM cand c
   WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
   ORDER BY mmr DESC, c.vec_id LIMIT 1))""")
    chain = ",".join(steps)
    return f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                      (SELECT qe FROM q)), 6) AS cos
  FROM embeddings WHERE vec_id <> 0
  ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                  (SELECT qe FROM q)) DESC, vec_id
  LIMIT {MMR_CANDIDATES}),
ps AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         round(list_cosine_similarity(a.e, b.e), 6) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),{chain}
SELECT rank, vec_id, cos, mmr FROM p{MMR_K} ORDER BY rank
"""


# --------------------------- hybrid retrieval (RRF) -------------------------
#
# Modern RAG-style retrieval: lexical BM25 top-N and dense cosine top-N are
# fused with reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
#   rrf(d) = sum over sides of 1 / (RRF_K + rank_side(d)), missing side -> 0.
# The synthetic corpus ties vec_id to doc_id 1:1, so embeddings.vec_id IS the
# document's embedding id; query q's dense query vector is doc q's embedding.
#
# Scale shape: each side is its own distributed top-N (shard-pinned BM25 pool /
# per-batch brute-force partials), so only 2 × N × n_queries rank rows ever
# leave the workers; fusion is a per-query merge of two k-lists (driver-side
# here, a groupby(query_id) map_groups when n_queries is large).

HYBRID_DEPTH = 20  # candidate depth per side before fusion


RRF_K = 60         # standard RRF damping constant


def _dense_ranked(sf_dir: str, queries, depth: int) -> pd.DataFrame:
    """Per-query dense ranks: cosine vs the query doc's own embedding,
    rounded to 6 dp, ranked (cos desc, doc_id asc), cut to ``depth``."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qids = [q for q, _ in queries]
    qm = np.stack([_query_vec(sf_dir, q) for q in qids])
    out = knn_brute_force(ds, qm, k=depth + _RANK_MARGIN)
    out = out.copy()
    out["query_id"] = pd.Series(qids, dtype=np.int64).to_numpy()[
        out["query_idx"].to_numpy(np.int64)
    ]
    out["cos"] = out["cos"].round(6)
    out = out.sort_values(["query_id", "cos", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= depth].reset_index(drop=True)
    return out.rename(columns={"vec_id": "doc_id"})[
        ["query_id", "doc_id", "rank"]
    ]


def hybrid_rrf_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 ⊕ dense retrieval fused with reciprocal-rank fusion; top-10 per
    query by (rrf desc, doc_id asc). rrf is round(1/(60+r_b) + 1/(60+r_v), 6)
    with a missing side contributing 0 — identical expression order in SQL."""
    idx = _build_docs_index(sf_dir)
    lex = _ranked_topk(idx, BM25_QUERIES, k=HYBRID_DEPTH)[
        ["query_id", "doc_id", "rank"]
    ]
    den = _dense_ranked(sf_dir, BM25_QUERIES, HYBRID_DEPTH)
    m = lex.merge(den, on=["query_id", "doc_id"], how="outer",
                  suffixes=("_lex", "_dense"))
    t_lex = np.where(m["rank_lex"].notna(),
                     1.0 / (RRF_K + m["rank_lex"].fillna(0).to_numpy(np.float64)),
                     0.0)
    t_dense = np.where(m["rank_dense"].notna(),
                       1.0 / (RRF_K + m["rank_dense"].fillna(0).to_numpy(np.float64)),
                       0.0)
    m["rrf"] = np.round(t_lex + t_dense, 6)
    m = m.sort_values(["query_id", "rrf", "doc_id"],
                      ascending=[True, False, True],
                      kind="mergesort", ignore_index=True)
    m["rank"] = (m.groupby("query_id").cumcount() + 1).astype(np.int64)
    m = m[m["rank"] <= BM25_K].reset_index(drop=True)
    m["doc_id"] = m["doc_id"].astype(np.int64)
    return m[["query_id", "rank", "doc_id", "rrf"]]


HYBRID_ALPHA = 0.5  # lexical weight in the min-max linear fusion


def hybrid_minmax_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 ⊕ dense fused by min-max score normalization + linear blend
    (the other standard hybrid besides RRF): each side's top-DEPTH scores
    normalize to [0,1] per query ((s-min)/(max-min); degenerate all-equal
    lists -> 1.0), fused = round(a*lex + (1-a)*dense, 6), missing side 0."""
    idx = _build_docs_index(sf_dir)
    lex = _ranked_topk(idx, BM25_QUERIES, k=HYBRID_DEPTH)[
        ["query_id", "doc_id", "score"]
    ]

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qids = [q for q, _ in BM25_QUERIES]
    qm = np.stack([_query_vec(sf_dir, q) for q in qids])
    den = knn_brute_force(ds, qm, k=HYBRID_DEPTH + _RANK_MARGIN).copy()
    den["query_id"] = pd.Series(qids, dtype=np.int64).to_numpy()[
        den["query_idx"].to_numpy(np.int64)
    ]
    den["cos"] = den["cos"].round(6)
    den = den.sort_values(["query_id", "cos", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    den["rank"] = (den.groupby("query_id").cumcount() + 1).astype(np.int64)
    den = den[den["rank"] <= HYBRID_DEPTH].rename(columns={"vec_id": "doc_id"})[
        ["query_id", "doc_id", "cos"]
    ]

    def norm(df: pd.DataFrame, col: str) -> pd.Series:
        g = df.groupby("query_id")[col]
        lo, hi = g.transform("min"), g.transform("max")
        rng = hi - lo
        return pd.Series(
            np.where(rng > 0, (df[col] - lo) / rng, 1.0), index=df.index
        )

    lex = lex.assign(nlex=norm(lex, "score"))[["query_id", "doc_id", "nlex"]]
    den = den.assign(ndense=norm(den, "cos"))[["query_id", "doc_id", "ndense"]]
    m = lex.merge(den, on=["query_id", "doc_id"], how="outer")
    fused = (HYBRID_ALPHA * m["nlex"].fillna(0.0).to_numpy(np.float64)
             + (1.0 - HYBRID_ALPHA) * m["ndense"].fillna(0.0).to_numpy(np.float64))
    m["fused"] = np.round(fused, 6)
    m = m.sort_values(["query_id", "fused", "doc_id"],
                      ascending=[True, False, True],
                      kind="mergesort", ignore_index=True)
    m["rank"] = (m.groupby("query_id").cumcount() + 1).astype(np.int64)
    m = m[m["rank"] <= BM25_K].reset_index(drop=True)
    m["doc_id"] = m["doc_id"].astype(np.int64)
    return m[["query_id", "rank", "doc_id", "fused"]]


def _hybrid_minmax_sql() -> str:
    qids = ", ".join(str(q) for q, _ in BM25_QUERIES)
    a = HYBRID_ALPHA
    return f"""
WITH lex0 AS (
  SELECT query_id, doc_id, score FROM ({_bm25_sql(k=HYBRID_DEPTH)})),
lex AS (
  SELECT query_id, doc_id,
         CASE WHEN max(score) OVER (PARTITION BY query_id)
                   > min(score) OVER (PARTITION BY query_id)
              THEN (score - min(score) OVER (PARTITION BY query_id))
                   / (max(score) OVER (PARTITION BY query_id)
                      - min(score) OVER (PARTITION BY query_id))
              ELSE 1.0 END AS nlex
  FROM lex0),
qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({qids})),
sims AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qe), 6) AS cos
  FROM embeddings e CROSS JOIN qv),
den0 AS (
  SELECT query_id, doc_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, doc_id) AS rank
  FROM sims
  QUALIFY rank <= {HYBRID_DEPTH}),
den AS (
  SELECT query_id, doc_id,
         CASE WHEN max(cos) OVER (PARTITION BY query_id)
                   > min(cos) OVER (PARTITION BY query_id)
              THEN (cos - min(cos) OVER (PARTITION BY query_id))
                   / (max(cos) OVER (PARTITION BY query_id)
                      - min(cos) OVER (PARTITION BY query_id))
              ELSE 1.0 END AS ndense
  FROM den0),
fusedt AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         round({a} * COALESCE(l.nlex, 0.0)
               + (1.0 - {a}) * COALESCE(d.ndense, 0.0), 6) AS fused
  FROM lex l FULL JOIN den d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY fused DESC, doc_id) AS BIGINT) AS rank,
       doc_id, fused
FROM fusedt
QUALIFY rank <= {BM25_K}
ORDER BY query_id, rank
"""


def _hybrid_sql() -> str:
    qids = ", ".join(str(q) for q, _ in BM25_QUERIES)
    return f"""
WITH ranked_lex AS (
  SELECT query_id, doc_id, rank FROM ({_bm25_sql(k=HYBRID_DEPTH)})),
qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({qids})),
sims AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qe), 6) AS cos
  FROM embeddings e CROSS JOIN qv),
ranked_dense AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, doc_id) AS rank
  FROM sims
  QUALIFY rank <= {HYBRID_DEPTH}),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         round(COALESCE(1.0 / ({RRF_K} + CAST(l.rank AS DOUBLE)), 0)
               + COALESCE(1.0 / ({RRF_K} + CAST(d.rank AS DOUBLE)), 0), 6) AS rrf
  FROM ranked_lex l
  FULL JOIN ranked_dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, rrf
FROM fused
QUALIFY rank <= {BM25_K}
"""


# --------------------------- dense re-ranking -------------------------------
#
# Two-stage retrieval (retrieve-then-rerank): BM25 recalls RERANK_DEPTH
# candidates cheaply; a dense scorer re-orders them and the top-10 by cosine
# wins. Unlike RRF (rank fusion), the second stage REPLACES the ordering —
# the cross-encoder pattern with a bi-encoder stand-in. Only depth x
# n_queries candidate embeddings are ever gathered (pushdown id filter), so
# stage 2 cost is independent of corpus size.

RERANK_DEPTH = 20


def bm25_rerank_dense(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    idx = _build_docs_index(sf_dir)
    lex = _ranked_topk(idx, BM25_QUERIES, k=RERANK_DEPTH)[
        ["query_id", "doc_id"]
    ]
    qids = [q for q, _ in BM25_QUERIES]
    qm = _normalize_rows(np.stack([_query_vec(sf_dir, q) for q in qids]))
    cand_ids = np.unique(lex["doc_id"].to_numpy(np.int64))
    # pushdown: only candidate embeddings leave storage
    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=pads.field("vec_id").isin(cand_ids.tolist()),
        columns=["vec_id", "embedding"],
    )
    mat = _normalize_rows(
        np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    )
    vid = t["vec_id"].to_numpy().astype(np.int64)
    sims = mat @ qm.T  # (n_cand, n_queries)
    col = {int(q): i for i, q in enumerate(qids)}
    row = {int(v): i for i, v in enumerate(vid)}
    # a candidate without an embedding reranks LAST (cos NULL/NaN — the SQL
    # side LEFT JOINs and sorts NULLS LAST), doc_id ties stay deterministic
    cos = np.array(
        [
            sims[row[int(d)], col[int(q)]] if int(d) in row else np.nan
            for q, d in zip(lex["query_id"], lex["doc_id"])
        ],
        dtype=np.float64,
    )
    out = lex.copy()
    out["cos"] = np.round(cos, 6)
    out = out.sort_values(["query_id", "cos", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", na_position="last",
                          ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "cos"]]


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    return mat / norm[:, None]


def _rerank_sql() -> str:
    qids = ", ".join(str(q) for q, _ in BM25_QUERIES)
    return f"""
WITH cand AS (
  SELECT query_id, doc_id FROM ({_bm25_sql(k=RERANK_DEPTH)})),
qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({qids})),
scored AS (
  SELECT c.query_id, c.doc_id,
         round(list_cosine_similarity(
           CAST(e.embedding AS DOUBLE[]), qv.qe), 6) AS cos
  FROM cand c
  JOIN qv ON qv.query_id = c.query_id
  LEFT JOIN embeddings e ON e.vec_id = c.doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC NULLS LAST, doc_id)
            AS BIGINT) AS rank,
       doc_id, cos
FROM scored
QUALIFY rank <= {BM25_K}
"""


def embedding_near_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup via hyperplane-LSH buckets + exact verify."""
    from ..dedup import embedding_near_dups

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # random embeddings top out near cos 0.51 — 0.4 keeps the pipeline's
    # verify stage non-trivially exercised on the driver table
    out = embedding_near_dups(ds, threshold=0.4, n_planes=4)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    if "cos" not in pdf.columns:  # zero pairs → empty typed frame
        pdf = pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                            "vec_b": pd.Series(dtype=np.int64),
                            "cos": pd.Series(dtype=np.float64)})
    pdf["cos"] = pdf["cos"].round(6)
    return pdf.sort_values(["vec_a", "vec_b"], ignore_index=True)


def _embedding_lsh_sql(threshold: float = 0.4, n_planes: int = 4,
                       seed: int = 11, dim: int = 64,
                       final: str = "pairs") -> str:
    """SQL reproduction of dedup.embedding_near_dups: the seeded hyperplane
    matrix is inlined as constants (repr(float64) round-trips exactly), the
    bucket is the sign pattern, the verify thresholds the 6-dp-rounded
    cosine — matching the engine's rounded compare bit-for-bit.
    ``final="keep"`` appends the recursive-CTE component closure and the
    left join back onto all vec_ids — the ``dedup.semantic_dedup``
    (vec_id, rep_id, keep) oracle."""
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    terms = []
    for j in range(n_planes):
        vec = "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(emb, {vec}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    body = f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
b AS (SELECT vec_id, emb, {bucket} AS bucket FROM e),
good AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         round(list_cosine_similarity(x.emb, y.emb), 6) AS cos
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
  WHERE round(list_cosine_similarity(x.emb, y.emb), 6) >= {threshold})"""
    if final == "pairs":
        return "WITH " + body + "\nSELECT vec_a, vec_b, cos FROM good"
    return "WITH RECURSIVE " + body + """,
sym AS (SELECT vec_a AS a, vec_b AS b FROM good
        UNION SELECT vec_b, vec_a FROM good),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS rep_id FROM reach GROUP BY a)
SELECT v.vec_id,
       coalesce(c.rep_id, v.vec_id) AS rep_id,
       coalesce(c.rep_id, v.vec_id) = v.vec_id AS keep
FROM embeddings v LEFT JOIN comp c ON c.vec_id = v.vec_id
ORDER BY v.vec_id"""


def semantic_dedup_keep(sf_dir: str):
    """SemDeDup-shaped semantic dedup: hyperplane-bucketed cosine pairs →
    connected components → keep the min-vec_id representative per component.
    One (vec_id, rep_id, keep) row per input vector. Threshold 0.4 for the
    same reason as embedding_near_dups: random bench embeddings top out
    near cos 0.51, so 0.4 keeps components non-degenerate."""
    from ..dedup import semantic_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = semantic_dedup(ds, threshold=0.4, n_planes=4)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    pdf["vec_id"] = pdf["vec_id"].astype(np.int64)
    pdf["rep_id"] = pdf["rep_id"].astype(np.int64)
    pdf["keep"] = pdf["keep"].astype(bool)
    return pdf.sort_values("vec_id", ignore_index=True)


def knn_ivf_top10(sf_dir: str):
    src = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(src)
    q0 = _query_vec(sf_dir, 0)
    st = os.stat(src)
    # persisted IVF layout, reused across runs while the corpus fingerprint
    # holds — queries only read the probed cell partitions
    out = knn_ivf(
        ds, np.asarray([q0], dtype=np.float64), k=10,
        index_dir=_index_dir_for(sf_dir) + "_ivf",
        source_tag=f"{src}:{st.st_mtime_ns}:{st.st_size}",
    )
    out["cos"] = out["cos"].round(6)
    return out[["rank", "vec_id", "cos"]]


def knn_pq_top10(sf_dir: str):
    """PQ-compressed kNN (rows-only by design, like knn_ivf_top10: the
    k-means++ codebooks ride Ray random_sample + numpy RNG, which no SQL
    reproduces — knn_pq_det_top10 is the hash-checked deterministic twin).
    ADC shortlist over packed
    int64 codes (8 bytes/vector scanned) -> exact cosine rerank, so the
    returned scores are bit-comparable to brute force; recall@10 is
    pinned ≥ 0.8 by test (measured 0.95 over 8 queries at sf0.01)."""
    from ..similarity import knn_pq

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = _query_vec(sf_dir, 0)
    out = knn_pq(ds, np.asarray([q0], dtype=np.float64), k=10)
    out["cos"] = out["cos"].round(6)
    return out[["rank", "vec_id", "cos"]]


def embedding_near_dups_exact_pairs(sf_dir: str):
    """Exact all-pairs cosine near-dup over the embeddings table — the
    oracle-checkable baseline for the LSH near-dup entry."""
    from ..dedup import embedding_near_dups_exact

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_dups_exact(ds, threshold=0.4)


SQL_EMBEDDING_NEAR_DUPS_EXACT = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
"""


def embedding_alignment_stats(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label", "embedding"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        lab = df["label"].to_numpy()
        out: dict[str, list] = {"label": [], "n": []}
        dims = mat.shape[1]
        sums: list[np.ndarray] = []
        for lb in np.unique(lab):
            m = lab == lb
            out["label"].append(int(lb))
            out["n"].append(int(m.sum()))
            sums.append(mat[m].sum(axis=0))
        res = pd.DataFrame({"label": pd.Series(out["label"], dtype=np.int64),
                            "n": pd.Series(out["n"], dtype=np.int64)})
        s = np.stack(sums) if sums else np.empty((0, dims))
        for j in range(dims):
            res[f"s{j}"] = s[:, j]
        return res

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    scols = [c for c in parts.columns if c.startswith("s")]
    agg = parts.groupby("label", as_index=False).sum()
    n = agg["n"].to_numpy(np.float64)
    s = agg[scols].to_numpy(np.float64)
    keep = n >= 2
    mean_cos = ((s[keep] ** 2).sum(axis=1) - n[keep]) / (n[keep] * (n[keep] - 1))
    out = pd.DataFrame({
        "label": agg.loc[keep, "label"].astype(np.int64).to_numpy(),
        "n": agg.loc[keep, "n"].astype(np.int64).to_numpy(),
        "mean_intra_cos": np.round(mean_cos, 6),
    })
    return out.sort_values("label", ignore_index=True)


SQL_ALIGNMENT = """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings),
pairs AS (
  SELECT a.label, list_cosine_similarity(a.v, b.v) AS cos
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY label)
SELECT cnt.label, cnt.n, round(avg(p.cos), 6) AS mean_intra_cos
FROM cnt JOIN pairs p USING (label)
GROUP BY cnt.label, cnt.n ORDER BY cnt.label
"""


def _second_moment_partial(df: pd.DataFrame) -> pd.DataFrame:
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n, d = X.shape
    P = X.T @ X
    iu, ju = np.triu_indices(d)
    i = np.concatenate([iu, np.arange(d), [-1]]).astype(np.int64)
    j = np.concatenate([ju, np.full(d, -1, dtype=np.int64), [-1]]).astype(np.int64)
    s = np.concatenate([P[iu, ju], X.sum(axis=0), [float(n)]])
    return pd.DataFrame({"i": i, "j": j, "s": s})


def _covariance_from_moments(sf_dir: str) -> np.ndarray:
    """Full symmetric covariance matrix (population, /n) from one
    tree-aggregated pass over the embedding table."""
    from ...state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["embedding"])
    agg = tree_aggregate(ds, ["i", "j"], _second_moment_partial,
                         {"s": "sum"}).to_pandas()
    n = float(agg.loc[(agg["i"] == -1) & (agg["j"] == -1), "s"].iloc[0])
    d = int(agg["i"].max()) + 1
    mu = np.zeros(d)
    sums = agg[(agg["i"] >= 0) & (agg["j"] == -1)]
    mu[sums["i"].to_numpy()] = sums["s"].to_numpy() / n
    C = np.zeros((d, d))
    pairs = agg[(agg["i"] >= 0) & (agg["j"] >= 0)]
    pi = pairs["i"].to_numpy()
    pj = pairs["j"].to_numpy()
    pv = pairs["s"].to_numpy() / n
    C[pi, pj] = pv
    C[pj, pi] = pv
    return C - np.outer(mu, mu)


def embedding_covariance(sf_dir: str) -> pd.DataFrame:
    C = _covariance_from_moments(sf_dir)
    d = C.shape[0]
    iu, ju = np.triu_indices(d)
    return pd.DataFrame({
        "i": iu.astype(np.int64),
        "j": ju.astype(np.int64),
        "cov": np.round(C[iu, ju], 6),
    })


SQL_EMBEDDING_COVARIANCE = """
WITH u AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings)
SELECT a.i AS i, b.i AS j,
       round(avg(a.v * b.v) - avg(a.v) * avg(b.v), 6) AS cov
FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
ORDER BY i, j
"""


PCA_ITERS = 4


def pca_top_component(sf_dir: str) -> pd.DataFrame:
    """Top principal component via fixed-iteration power iteration on the
    tree-aggregated covariance matrix (deterministic all-ones start, 4
    normalized iterations, Rayleigh-quotient eigenvalue as the dim=-1 row).
    The distributed part is the sufficient-statistics pass; the iteration
    itself is d×d driver math — at any corpus size."""
    C = _covariance_from_moments(sf_dir)
    d = C.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(PCA_ITERS):
        w = C @ v
        v = w / np.sqrt(float(w @ w))
    eig = float(v @ (C @ v))
    return pd.DataFrame({
        "dim": np.concatenate([np.arange(d), [-1]]).astype(np.int64),
        "loading": np.round(np.concatenate([v, [eig]]), 6),
    })


def _pca_sql() -> str:
    # the same 4 normalized power iterations, unrolled over the covariance
    # CTE; dim=-1 carries the Rayleigh-quotient eigenvalue
    it = """
w{k} AS (
  SELECT c.i, sum(c.cov * v{p}.v) AS w
  FROM cov c JOIN v{p} ON v{p}.i = c.j GROUP BY c.i),
v{k} AS (
  SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w{k}) AS v FROM w{k}),"""
    iters = "".join(it.format(k=k, p=k - 1) for k in range(1, PCA_ITERS + 1))
    last = f"v{PCA_ITERS}"
    return f"""
WITH u AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings),
cov AS (
  SELECT a.i AS i, b.i AS j,
         avg(a.v * b.v) - avg(a.v) * avg(b.v) AS cov
  FROM u a JOIN u b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i),
dims AS (SELECT DISTINCT i FROM u),
v0 AS (
  SELECT i, 1.0 / sqrt((SELECT CAST(count(*) AS DOUBLE) FROM dims)) AS v
  FROM dims),{iters}
wq AS (
  SELECT c.i, sum(c.cov * {last}.v) AS w
  FROM cov c JOIN {last} ON {last}.i = c.j GROUP BY c.i),
eig AS (
  SELECT CAST(-1 AS BIGINT) AS dim, round(sum(a.v * wq.w), 6) AS loading
  FROM {last} a JOIN wq ON wq.i = a.i)
SELECT dim, loading FROM (
  SELECT i AS dim, round(v, 6) AS loading FROM {last}
  UNION ALL SELECT dim, loading FROM eig)
ORDER BY dim
"""


# ---------------------------------------------------------------------------
# K-means document clustering (the SemDeDup / cluster-then-prune front half):
# deterministic init (embeddings of the K smallest vec_ids), fixed Lloyd
# iterations. Each iteration is ONE streaming pass emitting per-cluster
# sufficient statistics (sum vector + count) — k×(d+1) floats per batch —
# tree-merged; the centroid update is k×d driver math. Assignments are
# discrete, so the oracle match is exact-integer (float drift between
# engines would have to hit an exact distance tie to flip a label).
# ---------------------------------------------------------------------------

KMEANS_K = 8


KMEANS_ITERS = 2


def _kmeans_init(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(cids, C): embeddings of the K smallest vec_ids, cid = rank of the
    init vec_id. Per-block bottom-K partials, driver merge of ≤K×blocks."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("vec_id", kind="mergesort").head(KMEANS_K)

    small = ds.map_batches(bottomk, batch_format="pandas",
                           batch_size=None).to_pandas()
    small = small.sort_values("vec_id", kind="mergesort").head(KMEANS_K)
    C = np.stack(small["embedding"].to_numpy()).astype(np.float64)
    return np.arange(len(C), dtype=np.int64), C


def _kmeans_assign(X: np.ndarray, cids: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Labels for X given centroids C (rows ordered by ascending cid, so
    argmin's first-minimum tie rule == the oracle's ORDER BY dist, cid)."""
    d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    return cids[np.argmin(d2, axis=1)]


def kmeans_clusters(sf_dir: str) -> pd.DataFrame:
    from ...state.aggregates import tree_aggregate

    cids, C = _kmeans_init(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])

    for _ in range(KMEANS_ITERS):
        ref = ray.put((cids, C))

        def stats(df: pd.DataFrame) -> pd.DataFrame:
            cc, CC = ray.get(ref)
            X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            lab = _kmeans_assign(X, cc, CC)
            d = X.shape[1]
            frames = []
            for c in np.unique(lab):
                Xi = X[lab == c]
                frames.append(pd.DataFrame({
                    "cid": np.full(d + 1, c, dtype=np.int64),
                    "i": np.concatenate([np.arange(d), [-1]]).astype(np.int64),
                    "s": np.concatenate([Xi.sum(axis=0), [float(len(Xi))]]),
                }))
            return pd.concat(frames, ignore_index=True)

        agg = tree_aggregate(ds, ["cid", "i"], stats, {"s": "sum"}).to_pandas()
        # empty clusters drop (the oracle's join semantics drop them too)
        new_cids, rows = [], []
        for c in sorted(agg["cid"].unique()):
            g = agg[agg["cid"] == c]
            n = float(g.loc[g["i"] == -1, "s"].iloc[0])
            vec = g[g["i"] >= 0].sort_values("i")["s"].to_numpy() / n
            new_cids.append(c)
            rows.append(vec)
        cids, C = np.asarray(new_cids, dtype=np.int64), np.stack(rows)

    ref = ray.put((cids, C))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cc, CC = ray.get(ref)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(),
            "cluster": _kmeans_assign(X, cc, CC),
        })

    out = ds.map_batches(assign, batch_format="pandas").to_pandas()
    out["cluster"] = out["cluster"].astype(np.int64)
    return out.sort_values("vec_id", ignore_index=True)


def _kmeans_sql() -> str:
    it = """
d{k} AS (
  SELECT u.vec_id, c.cid, sum((u.v - c.v) * (u.v - c.v)) AS dist
  FROM u JOIN c{p} c ON c.i = u.i GROUP BY u.vec_id, c.cid),
a{k} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{k}) WHERE rn = 1),
c{k} AS (
  SELECT a.cid, u.i, avg(u.v) AS v
  FROM a{k} a JOIN u ON u.vec_id = a.vec_id GROUP BY a.cid, u.i),"""
    iters = "".join(it.format(k=k, p=k - 1) for k in range(1, KMEANS_ITERS + 1))
    last = f"c{KMEANS_ITERS}"
    return f"""
WITH u AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings),
init AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
  FROM (SELECT DISTINCT vec_id FROM u ORDER BY vec_id LIMIT {KMEANS_K})),
c0 AS (
  SELECT init.cid, u.i, u.v FROM u JOIN init ON init.vec_id = u.vec_id),{iters}
dfin AS (
  SELECT u.vec_id, c.cid, sum((u.v - c.v) * (u.v - c.v)) AS dist
  FROM u JOIN {last} c ON c.i = u.i GROUP BY u.vec_id, c.cid)
SELECT vec_id, cid AS cluster FROM (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM dfin) WHERE rn = 1
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Embedding label-outlier mining (mislabeled-example detection): the 3
# vectors per label FARTHEST from their label centroid. Two streaming
# passes: (1) per-(label, dim) sufficient sums tree-merge into centroids
# (L×d floats on the driver), (2) centroids broadcast back, each batch
# computes squared distances vectorized and emits only its per-label top-3
# candidates, so the driver's final cut sees 3 × labels × blocks rows.
# Ranked on ROUNDED distance with vec_id tie-break on both sides.
# ---------------------------------------------------------------------------

OUTLIER_TOPN = 3


def embedding_label_outliers(sf_dir: str) -> pd.DataFrame:
    from ...state.aggregates import tree_aggregate

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "label", "embedding"])

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        rows = []
        for lv in np.unique(lab):  # bounded by the label-space size
            m = lab == lv
            s = X[m].sum(axis=0)
            for j_, sj in enumerate(s):
                rows.append((int(lv), j_, float(sj)))
            rows.append((int(lv), -1, float(m.sum())))
        return pd.DataFrame(rows, columns=["label", "dim", "s"])

    agg = tree_aggregate(ds, ["label", "dim"], sums, {"s": "sum"}).to_pandas()
    d = int(agg["dim"].max()) + 1
    labels = np.sort(agg["label"].unique()).astype(np.int64)
    lmap = {int(lv): i for i, lv in enumerate(labels)}
    C = np.zeros((len(labels), d))
    for lv, i in lmap.items():
        rows = agg[(agg["label"] == lv) & (agg["dim"] >= 0)]
        n = float(agg.loc[(agg["label"] == lv) & (agg["dim"] == -1),
                          "s"].iloc[0])
        C[i, rows["dim"].to_numpy()] = rows["s"].to_numpy() / n
    cref = ray.put((C, lmap))

    def top_per_label(df: pd.DataFrame) -> pd.DataFrame:
        C_, lmap_ = ray.get(cref)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        li = np.asarray([lmap_[int(v)] for v in lab])
        d2 = np.round(((X - C_[li]) ** 2).sum(axis=1), 6)
        out = pd.DataFrame({"label": lab,
                            "vec_id": df["vec_id"].to_numpy(np.int64),
                            "dist2": d2})
        out = out.sort_values(["label", "dist2", "vec_id"],
                              ascending=[True, False, True], kind="mergesort")
        return out.groupby("label").head(OUTLIER_TOPN)

    cand = ds.map_batches(top_per_label, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["label", "dist2", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
    top = cand.groupby("label").head(OUTLIER_TOPN).reset_index(drop=True)
    top["rank"] = top.groupby("label").cumcount().to_numpy() + 1
    top["rank"] = top["rank"].astype(np.int64)
    return top[["label", "rank", "vec_id", "dist2"]]


def _label_outliers_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings),
c AS (SELECT label, dim, avg(v) AS m FROM e GROUP BY 1, 2),
d AS (SELECT e.vec_id, e.label,
             round(sum((e.v - c.m) * (e.v - c.m)), 6) AS dist2
      FROM e JOIN c ON c.label = e.label AND c.dim = e.dim
      GROUP BY e.vec_id, e.label),
r AS (SELECT label, vec_id, dist2,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist2 DESC, vec_id) AS rank
      FROM d)
SELECT label, CAST(rank AS BIGINT) AS rank, vec_id, dist2
FROM r WHERE rank <= {OUTLIER_TOPN}
ORDER BY label, rank
"""


def label_centroid_similarity(sf_dir: str) -> pd.DataFrame:
    from ...state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["label", "embedding"])

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        rows = []
        for lv in np.unique(lab):
            m = lab == lv
            s = X[m].sum(axis=0)
            for j_, sj in enumerate(s):
                rows.append((int(lv), j_, float(sj)))
            rows.append((int(lv), -1, float(m.sum())))
        return pd.DataFrame(rows, columns=["label", "dim", "s"])

    agg = tree_aggregate(ds, ["label", "dim"], sums, {"s": "sum"}).to_pandas()
    d = int(agg["dim"].max()) + 1
    labels = np.sort(agg["label"].unique()).astype(np.int64)
    C = np.zeros((len(labels), d))
    for i, lv in enumerate(labels):
        rows = agg[(agg["label"] == lv) & (agg["dim"] >= 0)]
        n = float(agg.loc[(agg["label"] == lv) & (agg["dim"] == -1),
                          "s"].iloc[0])
        C[i, rows["dim"].to_numpy()] = rows["s"].to_numpy() / n
    nrm = np.linalg.norm(C, axis=1)
    rows = []
    for i in range(len(labels)):
        for j_ in range(i + 1, len(labels)):
            cos = float(C[i] @ C[j_] / (nrm[i] * nrm[j_]))
            rows.append((int(labels[i]), int(labels[j_]), round(cos, 6)))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "cos"])


SQL_LABEL_CENTROID_SIM = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings),
c AS (SELECT label, dim, avg(v) AS m FROM e GROUP BY 1, 2),
n AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM c GROUP BY label),
p AS (SELECT a.label AS label_a, b.label AS label_b, sum(a.m * b.m) AS dot
      FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2)
SELECT p.label_a, p.label_b,
       round(p.dot / (na.nrm * nb.nrm), 6) AS cos
FROM p JOIN n na ON na.label = p.label_a
       JOIN n nb ON nb.label = p.label_b
ORDER BY p.label_a, p.label_b
"""


def label_silhouette(sf_dir: str) -> pd.DataFrame:
    from ...state.aggregates import tree_aggregate

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["label", "embedding"])

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        rows = []
        for lv in np.unique(lab):
            m = lab == lv
            s = X[m].sum(axis=0)
            for j_, sj in enumerate(s):
                rows.append((int(lv), j_, float(sj)))
            rows.append((int(lv), -1, float(m.sum())))
        return pd.DataFrame(rows, columns=["label", "dim", "s"])

    agg = tree_aggregate(ds, ["label", "dim"], sums, {"s": "sum"}).to_pandas()
    d = int(agg["dim"].max()) + 1
    labels = np.sort(agg["label"].unique()).astype(np.int64)
    C = np.zeros((len(labels), d))
    for i, lv in enumerate(labels):
        rows = agg[(agg["label"] == lv) & (agg["dim"] >= 0)]
        n = float(agg.loc[(agg["label"] == lv) & (agg["dim"] == -1),
                          "s"].iloc[0])
        C[i, rows["dim"].to_numpy()] = rows["s"].to_numpy() / n
    lmap = {int(lv): i for i, lv in enumerate(labels)}
    cref = ray.put((C, lmap))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        C_, lmap_ = ray.get(cref)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        li = np.asarray([lmap_[int(v)] for v in lab])
        # distances to every centroid: (n, L)
        d2 = ((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)
        dist = np.sqrt(d2)
        a = dist[np.arange(len(X)), li]
        masked = dist.copy()
        masked[np.arange(len(X)), li] = np.inf
        b = masked.min(axis=1)
        s = (b - a) / np.maximum(a, b)
        out = pd.DataFrame({"label": lab, "s": s, "n": np.int64(1)})
        return out.groupby("label", as_index=False).agg(
            s=("s", "sum"), n=("n", "sum"))

    agg2 = tree_aggregate(ds, ["label"], score,
                          {"s": "sum", "n": "sum"}).to_pandas()
    out = pd.DataFrame({
        "label": agg2["label"].astype(np.int64),
        "n": agg2["n"].astype(np.int64),
        "silhouette": np.round(agg2["s"].to_numpy(np.float64)
                               / agg2["n"].to_numpy(np.float64), 6),
    })
    return out.sort_values("label", ignore_index=True)


SQL_LABEL_SILHOUETTE = """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings),
c AS (SELECT label, dim, avg(v) AS m FROM e GROUP BY 1, 2),
dists AS (
  SELECT e.vec_id, e.label AS vlabel, c.label AS clabel,
         sqrt(sum((e.v - c.m) * (e.v - c.m))) AS dist
  FROM e JOIN c ON c.dim = e.dim
  GROUP BY e.vec_id, e.label, c.label),
ab AS (
  SELECT vec_id, vlabel,
         max(CASE WHEN clabel = vlabel THEN dist END) AS a,
         min(CASE WHEN clabel <> vlabel THEN dist END) AS b
  FROM dists GROUP BY 1, 2)
SELECT vlabel AS label, CAST(count(*) AS BIGINT) AS n,
       round(avg((b - a) / greatest(a, b)), 6) AS silhouette
FROM ab GROUP BY vlabel ORDER BY vlabel
"""



# ---------------------------------------------------------------------------
# Deterministic IVF / PQ — the hash-checked twins of knn_ivf_top10 /
# knn_pq_top10. The production trainers use Ray random_sample + numpy RNG
# (k-means++), which no SQL can reproduce — those entries stay rows-only,
# recall-gated. The *_det entries replace every random decision with a
# deterministic rule (md5-threshold sample, farthest-point seeding, fixed
# Lloyd rounds, id tie-breaks), so the ENTIRE ANN pipeline — train ->
# assign/encode -> probe/ADC-shortlist -> exact rerank — is reproduced in
# DuckDB as an unrolled CTE chain (the bpe_merges precedent) and
# hash-checked end to end.
# ---------------------------------------------------------------------------

_DET_SAMPLE_N = 4096  # >= embeddings rows at every gate SF -> all-rows branch


def _det_sample_cte(src: str, out: str, sample_n: int, salt: str) -> str:
    """md5-threshold Bernoulli sample over a long-form CTE — the same
    contract as `similarity.det_sample` (curation md5 idiom: keep iff
    md5_u64(salt:vec_id) < floor(round(frac, 6) * 2^64))."""
    frac = f"round(least(1.0, {sample_n}.0 / n), 6)"
    return f"""nrows AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
{out} AS MATERIALIZED (
  SELECT {src}.* FROM {src}, nrows
  WHERE CASE WHEN {frac} >= 1.0 THEN TRUE
        ELSE CAST(('0x' || substr(md5('{salt}:' || CAST(vec_id AS VARCHAR)), 1, 16)) AS UBIGINT)
             < CAST(floor({frac} * 18446744073709551616.0) AS UBIGINT) END)"""


_EL_CTE = """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
el AS MATERIALIZED (
  SELECT vec_id, dim, CASE WHEN nrm = 0 THEN raw ELSE raw / nrm END AS val
  FROM (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
               unnest(v) AS raw, sqrt(list_dot_product(v, v)) AS nrm
        FROM e) u)"""


def _ivf_det_sql(k: int = 10, n_cells: int = 8, iters: int = 4,
                 replicas: int = 3, n_probe: int = 3,
                 sample_n: int = _DET_SAMPLE_N, salt: str = "ivfdet",
                 qid: int = 0) -> str:
    """Unrolled-CTE oracle for `similarity.knn_ivf_det`: farthest-point
    seeding (seed0/c0/dm0 then seed{t}/c{t}/dm{t}), `iters` Lloyd rounds
    (asg/upd/un/cent), replica assignment + query probe + exact-cosine
    rerank. Mirrors the numpy path decision-for-decision; ties break on
    vec_id / cell everywhere."""
    parts = [_EL_CTE, _det_sample_cte("el", "samp", sample_n, salt)]
    parts.append("""seed0 AS (SELECT min(vec_id) AS sid FROM samp),
c0 AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS cell, s.dim, s.val
  FROM samp s, seed0 WHERE s.vec_id = seed0.sid),
dm0 AS MATERIALIZED (
  SELECT x.vec_id, 1.0 - sum(x.val * c.val) AS d
  FROM samp x JOIN c0 c ON c.dim = x.dim GROUP BY x.vec_id)""")
    for t in range(1, n_cells):
        parts.append(f"""seed{t} AS (SELECT vec_id AS sid FROM dm{t-1} ORDER BY d DESC, vec_id LIMIT 1),
c{t} AS MATERIALIZED (
  SELECT CAST({t} AS BIGINT) AS cell, s.dim, s.val
  FROM samp s, seed{t} WHERE s.vec_id = seed{t}.sid)""")
        if t < n_cells - 1:
            parts.append(f"""dm{t} AS MATERIALIZED (
  SELECT p.vec_id, CASE WHEN nd.d < p.d THEN nd.d ELSE p.d END AS d
  FROM dm{t-1} p JOIN (
    SELECT x.vec_id, 1.0 - sum(x.val * c.val) AS d
    FROM samp x JOIN c{t} c ON c.dim = x.dim GROUP BY x.vec_id) nd
  ON nd.vec_id = p.vec_id)""")
    union = "\n  UNION ALL ".join(f"SELECT * FROM c{t}" for t in range(n_cells))
    parts.append(f"cent0 AS MATERIALIZED (\n  {union})")
    for i in range(iters):
        parts.append(f"""asg{i} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT x.vec_id, c.cell,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY sum(x.val * c.val) DESC, c.cell) AS rn
    FROM samp x JOIN cent{i} c ON c.dim = x.dim
    GROUP BY x.vec_id, c.cell) z
  WHERE rn = 1),
upd{i} AS MATERIALIZED (
  SELECT a.cell, x.dim, avg(x.val) AS val
  FROM asg{i} a JOIN samp x ON x.vec_id = a.vec_id
  GROUP BY a.cell, x.dim),
un{i} AS (SELECT cell, sqrt(sum(val * val)) AS nrm FROM upd{i} GROUP BY cell),
cent{i+1} AS MATERIALIZED (
  SELECT c.cell, c.dim,
         CASE WHEN u.val IS NOT NULL AND n.nrm > 0 THEN u.val / n.nrm
              ELSE c.val END AS val
  FROM cent{i} c
  LEFT JOIN upd{i} u ON u.cell = c.cell AND u.dim = c.dim
  LEFT JOIN un{i} n ON n.cell = c.cell)""")
    parts.append(f"""fasg AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT x.vec_id, c.cell,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY sum(x.val * c.val) DESC, c.cell) AS rn
    FROM el x JOIN cent{iters} c ON c.dim = x.dim
    GROUP BY x.vec_id, c.cell) z
  WHERE rn <= {replicas}),
qprobe AS (
  SELECT cell FROM (
    SELECT c.cell,
           row_number() OVER (ORDER BY sum(q.val * c.val) DESC, c.cell) AS rn
    FROM el q JOIN cent{iters} c ON c.dim = q.dim
    WHERE q.vec_id = {qid}
    GROUP BY c.cell) z
  WHERE rn <= {n_probe}),
cand AS (SELECT DISTINCT f.vec_id FROM fasg f JOIN qprobe p ON p.cell = f.cell
         WHERE f.vec_id <> {qid}),
simsf AS (
  SELECT c.vec_id,
         round(list_cosine_similarity(e.v,
               (SELECT v FROM e WHERE vec_id = {qid})), 6) AS cos
  FROM cand c JOIN e ON e.vec_id = c.vec_id)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       vec_id, cos
FROM simsf ORDER BY cos DESC, vec_id LIMIT {k}""")


def _pq_det_sql(k: int = 10, m: int = 8, n_codes: int = 8, iters: int = 3,
                shortlist: int = 50, sample_n: int = _DET_SAMPLE_N,
                salt: str = "pqdet", qid: int = 0, dim: int = 64) -> str:
    """Unrolled-CTE oracle for `similarity.knn_pq_det`: per-subspace
    farthest-point seeding and Lloyd rounds run GROUPED BY subspace j (one
    CTE per step covers all m subspaces), then encode -> ADC distance table
    -> shortlist -> exact-cosine rerank."""
    dsub = dim // m
    parts = [_EL_CTE + f""",
esub AS MATERIALIZED (
  SELECT vec_id, CAST(floor((dim - 1) / {dsub}) AS BIGINT) AS j,
         CAST((dim - 1) % {dsub} AS BIGINT) AS sd, val
  FROM el)""", _det_sample_cte("esub", "ssub", sample_n, salt)]
    parts.append("""pc0 AS MATERIALIZED (
  SELECT j, CAST(0 AS BIGINT) AS code, sd, val
  FROM ssub WHERE vec_id = (SELECT min(vec_id) FROM ssub)),
pd0 AS MATERIALIZED (
  SELECT x.j, x.vec_id, sum((x.val - c.val) * (x.val - c.val)) AS d2
  FROM ssub x JOIN pc0 c ON c.j = x.j AND c.sd = x.sd
  GROUP BY x.j, x.vec_id)""")
    for t in range(1, n_codes):
        parts.append(f"""ps{t} AS (SELECT j, vec_id FROM (
    SELECT j, vec_id,
           row_number() OVER (PARTITION BY j ORDER BY d2 DESC, vec_id) AS rn
    FROM pd{t-1}) z WHERE rn = 1),
pc{t} AS MATERIALIZED (
  SELECT x.j, CAST({t} AS BIGINT) AS code, x.sd, x.val
  FROM ssub x JOIN ps{t} s ON s.j = x.j AND s.vec_id = x.vec_id)""")
        if t < n_codes - 1:
            parts.append(f"""pd{t} AS MATERIALIZED (
  SELECT p.j, p.vec_id, CASE WHEN nd.d2 < p.d2 THEN nd.d2 ELSE p.d2 END AS d2
  FROM pd{t-1} p JOIN (
    SELECT x.j, x.vec_id, sum((x.val - c.val) * (x.val - c.val)) AS d2
    FROM ssub x JOIN pc{t} c ON c.j = x.j AND c.sd = x.sd
    GROUP BY x.j, x.vec_id) nd ON nd.j = p.j AND nd.vec_id = p.vec_id)""")
    union = "\n  UNION ALL ".join(f"SELECT * FROM pc{t}" for t in range(n_codes))
    parts.append(f"book0 AS MATERIALIZED (\n  {union})")
    for i in range(iters):
        parts.append(f"""pa{i} AS MATERIALIZED (
  SELECT j, vec_id, code FROM (
    SELECT x.j, x.vec_id, c.code,
           row_number() OVER (PARTITION BY x.j, x.vec_id
             ORDER BY sum((x.val - c.val) * (x.val - c.val)) ASC, c.code) AS rn
    FROM ssub x JOIN book{i} c ON c.j = x.j AND c.sd = x.sd
    GROUP BY x.j, x.vec_id, c.code) z
  WHERE rn = 1),
pu{i} AS MATERIALIZED (
  SELECT a.j, a.code, x.sd, avg(x.val) AS val
  FROM pa{i} a JOIN ssub x ON x.j = a.j AND x.vec_id = a.vec_id
  GROUP BY a.j, a.code, x.sd),
book{i+1} AS MATERIALIZED (
  SELECT b.j, b.code, b.sd, coalesce(u.val, b.val) AS val
  FROM book{i} b
  LEFT JOIN pu{i} u ON u.j = b.j AND u.code = b.code AND u.sd = b.sd)""")
    parts.append(f"""enc AS MATERIALIZED (
  SELECT j, vec_id, code FROM (
    SELECT x.j, x.vec_id, c.code,
           row_number() OVER (PARTITION BY x.j, x.vec_id
             ORDER BY sum((x.val - c.val) * (x.val - c.val)) ASC, c.code) AS rn
    FROM esub x JOIN book{iters} c ON c.j = x.j AND c.sd = x.sd
    GROUP BY x.j, x.vec_id, c.code) z WHERE rn = 1),
adt AS MATERIALIZED (
  SELECT c.j, c.code, sum((q.val - c.val) * (q.val - c.val)) AS d2
  FROM esub q JOIN book{iters} c ON c.j = q.j AND c.sd = q.sd
  WHERE q.vec_id = {qid} GROUP BY c.j, c.code),
adc AS MATERIALIZED (
  SELECT en.vec_id, sum(t.d2) AS score
  FROM enc en JOIN adt t ON t.j = en.j AND t.code = en.code
  WHERE en.vec_id <> {qid}
  GROUP BY en.vec_id),
short AS (SELECT vec_id FROM adc ORDER BY score ASC, vec_id LIMIT {shortlist}),
simsf AS (
  SELECT s.vec_id,
         round(list_cosine_similarity(e.v,
               (SELECT v FROM e WHERE vec_id = {qid})), 6) AS cos
  FROM short s JOIN e ON e.vec_id = s.vec_id)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       vec_id, cos
FROM simsf ORDER BY cos DESC, vec_id LIMIT {k}""")


def _det_topk_frame(out: "pd.DataFrame") -> "pd.DataFrame":
    """knn output -> (rank, vec_id, cos): round to 6 dp FIRST, then rank on
    the rounded values with vec_id tie-break (the knn_cosine_top10 recipe,
    so oracle tie-order can't flip a rank boundary)."""
    out = out.copy()
    out["cos"] = out["cos"].round(6)
    out = out.sort_values(["cos", "vec_id"], ascending=[False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out[["rank", "vec_id", "cos"]]


def knn_ivf_det_top10(sf_dir: str):
    """Hash-checked IVF kNN: deterministic coarse quantizer (md5-threshold
    sample, farthest-point seeding, 4 Lloyd rounds), 3-replica assignment,
    3-cell probe, exact-cosine rerank — rank-identical to `_ivf_det_sql`'s
    unrolled CTE chain. The production knn_ivf_top10 (k-means++ / RNG,
    better recall) stays as the rows-only, recall-gated sibling."""
    from ..similarity import knn_ivf_det

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = _query_vec(sf_dir, 0)
    out = knn_ivf_det(ds, np.asarray([q0], dtype=np.float64), k=10,
                      exclude_ids=[0])
    return _det_topk_frame(out)


def knn_pq_det_top10(sf_dir: str):
    """Hash-checked PQ kNN: deterministic per-subspace codebooks (8
    subspaces x 8 codes, farthest-point seeding, 3 Lloyd rounds), ADC
    shortlist of 50, exact-cosine rerank — rank-identical to
    `_pq_det_sql`. knn_pq_top10 (k-means++ / RNG) stays rows-only."""
    from ..similarity import knn_pq_det

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = _query_vec(sf_dir, 0)
    out = knn_pq_det(ds, np.asarray([q0], dtype=np.float64), k=10,
                     exclude_ids=[0])
    return _det_topk_frame(out)

__all__ = [
    'HYBRID_ALPHA',
    'HYBRID_DEPTH',
    'KMEANS_ITERS',
    'KMEANS_K',
    'KNN_FILTER_QIDS',
    'MMR_CANDIDATES',
    'MMR_K',
    'MMR_LAMBDA',
    'OUTLIER_TOPN',
    'PCA_ITERS',
    'RERANK_DEPTH',
    'RRF_K',
    'SQL_ALIGNMENT',
    'SQL_EMBEDDING_COVARIANCE',
    'SQL_EMBEDDING_NEAR_DUPS_EXACT',
    'SQL_KNN_COSINE',
    'SQL_KNN_LABEL_CONFUSION',
    'SQL_LABEL_CENTROIDS',
    'SQL_LABEL_CENTROID_SIM',
    'SQL_LABEL_SILHOUETTE',
    'SQL_QUANTIZE',
    '_covariance_from_moments',
    '_dense_ranked',
    '_embedding_lsh_sql',
    '_hybrid_minmax_sql',
    '_hybrid_sql',
    '_kmeans_assign',
    '_kmeans_init',
    '_kmeans_sql',
    '_ivf_det_sql',
    '_knn_filtered_sql',
    '_knn_mmr_sql',
    '_label_outliers_sql',
    '_normalize_rows',
    '_pca_sql',
    '_pq_det_sql',
    '_query_vec',
    '_rerank_sql',
    '_second_moment_partial',
    'bm25_rerank_dense',
    'embedding_alignment_stats',
    'embedding_covariance',
    'embedding_label_centroids',
    'embedding_label_outliers',
    'embedding_near_dup_pairs',
    'embedding_near_dups_exact_pairs',
    'embedding_quantize_int8',
    'hybrid_minmax_topk',
    'hybrid_rrf_topk',
    'kmeans_clusters',
    'knn_cosine_top10',
    'knn_filtered_top10',
    'knn_ivf_det_top10',
    'knn_ivf_top10',
    'knn_label_confusion_matrix',
    'knn_mmr_top10',
    'knn_pq_det_top10',
    'knn_pq_top10',
    'label_centroid_similarity',
    'label_silhouette',
    'pca_top_component',
    'semantic_dedup_keep',
]
