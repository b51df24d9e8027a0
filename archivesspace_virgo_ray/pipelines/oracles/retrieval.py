"""Index / BM25 / retrieval-surface oracles (split from queries.py; see that module for the facade)."""

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


def bm25_topk_docs(sf_dir: str):
    """Flagship: full engine — index build (resumable) + distributed BM25."""
    return _ranked_topk(_build_docs_index(sf_dir))


LMD_MU = 2000.0


def lmd_topk_docs(sf_dir: str) -> pd.DataFrame:
    """LM-Dirichlet ranked retrieval (Lucene LMDirichletSimilarity, the
    second similarity next to BM25): same index, same scatter machinery,
    per-posting max(0, ln(1 + tf·total_len/(mu·cf)) + ln(mu/(dl+mu))).
    Zero-total docs are excluded on BOTH sides — the engine's block-max
    pruning legitimately never materializes docs whose every contribution
    clamps to 0, and a clamped sum of zeros is exactly 0.0 everywhere."""
    from ...index.query import lmd_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(BM25_QUERIES),
                      pa.int32()),
    })
    out = lmd_topk(idx, q, mu=LMD_MU).to_pandas()
    out["score"] = out["score"].round(6)
    out = out[out["score"] > 0]
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _lmd_sql() -> str:
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in BM25_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
  FROM toks WHERE term <> '' GROUP BY doc_id),
stats AS (SELECT (SELECT sum(dl) FROM dl) AS total_len),
cfreq AS (
  SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
q(query_id, term) AS (VALUES {vals}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(greatest(0.0,
             ln(1 + tf.tf * (stats.total_len / ({LMD_MU} * cfreq.cf)))
             + ln({LMD_MU} / (dl.dl + {LMD_MU})))) AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN cfreq ON cfreq.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores WHERE round(score, 6) > 0)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {BM25_K}
"""


def bm25_topk_conjunctive(sf_dir: str):
    """AND-semantics BM25 (Solr q.op=AND): rank only docs containing every
    query term; surviving scores identical to the unrestricted query. Runs
    through the distributed pool path (conjunctive whitelists shard-local)."""
    return _ranked_topk(_build_docs_index(sf_dir), require_all=True)


def _bm25_conjunctive_sql() -> str:
    base = _bm25_sql()
    # restrict ranking to docs matching EVERY query term of their query
    return base.replace(
        "  GROUP BY q.query_id, tf.doc_id),",
        "  GROUP BY q.query_id, tf.doc_id\n"
        "  HAVING count(DISTINCT tf.term) = (SELECT count(*) FROM q q2\n"
        "                                    WHERE q2.query_id = q.query_id)),",
    )


# exact-phrase queries: fixed phrases drawn from the synthetic corpus's
# shared vocabulary (distinct tokens within each phrase — the scoring side
# dedups query terms, as does the SQL). qid 6 intentionally never matches.
PHRASE_QUERIES = [
    (1, "part filter"),
    (2, "hash table"),
    (3, "merge group"),
    (4, "slow key column"),
    (5, "scan filter spark"),
    (6, "quantum banana"),
]


def bm25_phrase_topk(sf_dir: str):
    """Exact-phrase BM25 top-k (Solr phrase-query surface): conjunctive
    candidates from the postings, one distributed verification pass over
    candidate texts only, then whitelist-restricted BM25 scoring. Ranking
    contract identical to bm25_topk (rounded scores, k+margin cut)."""
    from ...index.phrase import phrase_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in PHRASE_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in PHRASE_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(PHRASE_QUERIES), pa.int32()),
    })
    out = phrase_topk(idx, os.path.join(sf_dir, "documents.parquet"), q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _phrase_sql() -> str:
    """bm25 SQL restricted to docs whose token stream contains the phrase
    consecutively — the space-joined-tokens LIKE trick mirrors
    ``index.phrase.phrase_needle`` exactly."""
    from ...index.phrase import phrase_needle

    base = _bm25_sql(queries=PHRASE_QUERIES)
    arms = "\n  UNION ALL ".join(
        f"SELECT {qid} AS query_id, doc_id FROM docstr "
        f"WHERE s LIKE '%{phrase_needle(p)}%'"
        for qid, p in PHRASE_QUERIES
    )
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    return base.replace(
        "scores AS (",
        f"""docstr AS (
  SELECT doc_id,
         ' ' || array_to_string({tok_nonempty}, ' ') || ' ' AS s
  FROM documents),
phrase AS (
  {arms}),
scores AS (""",
    ).replace(
        "  JOIN dl ON dl.doc_id = tf.doc_id",
        "  JOIN dl ON dl.doc_id = tf.doc_id\n"
        "  JOIN phrase ON phrase.query_id = q.query_id"
        " AND phrase.doc_id = tf.doc_id",
    )


# sloppy (ordered-proximity) phrase queries, Solr "a b"~N in-order: each
# adjacent pair may be separated by up to slop tokens. qid 2/3 only match
# BECAUSE of the slop ("hash ... table", "scan [filter] spark"); qid 5
# matches nothing at any slop.
SLOPPY_QUERIES = [
    (1, "part filter", 1),
    (2, "hash join table", 2),
    (3, "scan spark", 1),
    (4, "slow key column", 1),
    (5, "quantum banana", 3),
]


def bm25_sloppy_topk(sf_dir: str):
    """Ordered-proximity phrase BM25 top-k: same two-phase machinery as the
    exact phrase path with the verification needle swapped for the
    ``slop_pattern`` regex (a regular language — Python re and DuckDB RE2
    agree on existence)."""
    from ...index.phrase import phrase_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _, _ in SLOPPY_QUERIES], pa.int64()),
        "text": pa.array([t for _, t, _ in SLOPPY_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(SLOPPY_QUERIES), pa.int32()),
        "slop": pa.array([s for _, _, s in SLOPPY_QUERIES], pa.int32()),
    })
    out = phrase_topk(idx, os.path.join(sf_dir, "documents.parquet"), q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _sloppy_sql() -> str:
    from ...index.phrase import slop_pattern

    base = _bm25_sql(queries=[(qid, t) for qid, t, _ in SLOPPY_QUERIES])
    arms = "\n  UNION ALL ".join(
        f"SELECT {qid} AS query_id, doc_id FROM docstr "
        f"WHERE regexp_matches(s, '{slop_pattern(p, s_)}')"
        for qid, p, s_ in SLOPPY_QUERIES
    )
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    return base.replace(
        "scores AS (",
        f"""docstr AS (
  SELECT doc_id,
         ' ' || array_to_string({tok_nonempty}, ' ') || ' ' AS s
  FROM documents),
phrase AS (
  {arms}),
scores AS (""",
    ).replace(
        "  JOIN dl ON dl.doc_id = tf.doc_id",
        "  JOIN dl ON dl.doc_id = tf.doc_id\n"
        "  JOIN phrase ON phrase.query_id = q.query_id"
        " AND phrase.doc_id = tf.doc_id",
    )


# unordered proximity ("a b"~N matching either order — the Lucene sloppy
# behavior for two terms). Pairs chosen so order-flips matter: some docs
# only contain the reversed order within the window.
NEAR_QUERIES = [
    (1, "filter part", 1),
    (2, "table hash", 2),
    (3, "spark scan", 1),
    (4, "quantum banana", 3),
]


def bm25_near_topk(sf_dir: str):
    """Unordered proximity BM25 top-k: union of the two ordered-proximity
    matches (exactly |posA - posB| - 1 <= slop for two terms), positional
    in-index verification on the shared positional index."""
    from ...index.phrase import near_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _, _ in NEAR_QUERIES], pa.int64()),
        "text": pa.array([t for _, t, _ in NEAR_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(NEAR_QUERIES), pa.int32()),
        "slop": pa.array([s for _, _, s in NEAR_QUERIES], pa.int32()),
    })
    out = near_topk(idx, os.path.join(sf_dir, "documents.parquet"), q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _near_sql() -> str:
    """Oracle: regex match in EITHER direction on the space-joined token
    stream (slop_pattern is a regular language, RE2-compatible)."""
    from ...index.phrase import slop_pattern

    def rev(t: str) -> str:
        from ...functions.tokenize import tokenize_text

        return " ".join(reversed(tokenize_text(t)))

    base = _bm25_sql(queries=[(qid, t) for qid, t, _ in NEAR_QUERIES])
    arms = "\n  UNION ALL ".join(
        f"SELECT {qid} AS query_id, doc_id FROM docstr "
        f"WHERE regexp_matches(s, '{slop_pattern(p, s_)}')"
        f" OR regexp_matches(s, '{slop_pattern(rev(p), s_)}')"
        for qid, p, s_ in NEAR_QUERIES
    )
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    return base.replace(
        "scores AS (",
        f"""docstr AS (
  SELECT doc_id,
         ' ' || array_to_string({tok_nonempty}, ' ') || ' ' AS s
  FROM documents),
phrase AS (
  {arms}),
scores AS (""",
    ).replace(
        "  JOIN dl ON dl.doc_id = tf.doc_id",
        "  JOIN dl ON dl.doc_id = tf.doc_id\n"
        "  JOIN phrase ON phrase.query_id = q.query_id"
        " AND phrase.doc_id = tf.doc_id",
    )


# edismax pf (phrase boost): rank on BM25 over the terms PLUS a constant
# boost for docs containing the exact phrase — Solr's pf= behavior with a
# fixed phrase-field weight. Phrase membership is verified positionally
# in-index on a positional index (text-verify fallback otherwise).
PF_QUERIES = [
    (1, "hash join", 0.5),
    (2, "scan filter", 0.25),
    (3, "key column", 0.4),
]


def bm25_pf_topk(sf_dir: str):
    """Phrase-boosted BM25 (edismax pf): final = bm25(terms) + boost if the
    exact phrase occurs. Exact: every phrase-matched doc gets its true base
    score via the whitelist scoring path (phrase matching never changes the
    score math), unmatched docs keep the base ranking, and boost only ever
    RAISES matched docs — so base top-(k+margin) ∪ matched covers the final
    top-k."""
    from ...index.phrase import phrase_topk
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    qids = [q for q, _, _ in PF_QUERIES]
    texts = [t for _, t, _ in PF_QUERIES]
    boosts = {q: b for q, _, b in PF_QUERIES}
    kk = BM25_K + _RANK_MARGIN
    qt = pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "k": pa.array([kk] * len(qids), pa.int32()),
    })
    base = get_pool(idx).topk(qt).to_pandas()[["query_id", "doc_id", "score"]]
    qp = qt.set_column(2, "k", pa.array([1 << 30] * len(qids), pa.int32()))
    ph = phrase_topk(
        idx, os.path.join(sf_dir, "documents.parquet"), qp
    ).to_pandas()[["query_id", "doc_id", "score"]]
    ph["score"] = ph["score"] + ph["query_id"].map(boosts)
    both = pd.concat([ph, base], ignore_index=True).drop_duplicates(
        ["query_id", "doc_id"], keep="first"  # boosted row wins
    )
    both["score"] = both["score"].round(6)
    both = both.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort", ignore_index=True)
    both["rank"] = (both.groupby("query_id").cumcount() + 1).astype(np.int64)
    both = both[both["rank"] <= BM25_K].reset_index(drop=True)
    return both[["query_id", "rank", "doc_id", "score"]]


def _pf_sql() -> str:
    from ...index.phrase import phrase_needle

    base = _bm25_sql(queries=[(qid, t) for qid, t, _ in PF_QUERIES])
    arms = "\n  UNION ALL ".join(
        f"SELECT {qid} AS query_id, doc_id, {b} AS boost FROM docstr "
        f"WHERE s LIKE '%{phrase_needle(t)}%'"
        for qid, t, b in PF_QUERIES
    )
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    out = base.replace(
        "scores AS (",
        f"""docstr AS (
  SELECT doc_id,
         ' ' || array_to_string({tok_nonempty}, ' ') || ' ' AS s
  FROM documents),
phrase AS (
  {arms}),
scores AS (""",
    )
    return out.replace(
        """ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)""",
        """ranked AS (
  SELECT s.query_id, s.doc_id,
         round(s.score + coalesce(p.boost, 0), 6) AS score,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY round(s.score + coalesce(p.boost, 0), 6)
                                     DESC, s.doc_id) AS rank
  FROM scores s
  LEFT JOIN phrase p ON p.query_id = s.query_id AND p.doc_id = s.doc_id)""",
    )


# SpanFirst (Lucene SpanFirstQuery): the term must occur among the doc's
# first N tokens — the "title-ish lead position" heuristic. Positional
# indexes verify from the positions stream; the fallback tokenizes the
# candidate texts.
SPAN_FIRST_QUERIES = [(1, "hash", 12), (2, "filter", 8), (3, "column", 20)]


def bm25_span_first_topk(sf_dir: str):
    from ...index.phrase import _score_verified
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    pool = get_pool(idx)
    qids = [q for q, _, _ in SPAN_FIRST_QUERIES]
    texts = [t for _, t, _ in SPAN_FIRST_QUERIES]
    firsts = {q: n for q, _, n in SPAN_FIRST_QUERIES}
    if pool.has_positions:
        verified = pool.phrase_ids(
            {q: (t, 0, firsts[q]) for q, t in zip(qids, texts)}
        )
    else:
        # fallback: candidate docs (term present) → tokenize their text and
        # check the first-N window (column-pruned scan, id-filtered)
        import pyarrow.dataset as pads

        from ...functions.tokenize import tokenize_text as _tok

        verified = {}
        for q, t in zip(qids, texts):
            cand = pool.matching_doc_ids(t, mode="or")
            if len(cand) == 0:
                verified[q] = cand
                continue
            tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
                filter=pads.field("doc_id").isin(pa.array(cand, pa.int64())),
                columns=["doc_id", "text"],
            )
            ok = [
                int(d) for d, x in zip(tbl["doc_id"].to_pylist(),
                                       tbl["text"].to_pylist())
                if t in _tok(x)[: firsts[q]]
            ]
            verified[q] = np.sort(np.asarray(ok, dtype=np.int64))
    kk = BM25_K + _RANK_MARGIN
    out = _score_verified(
        pool, qids, texts, [kk] * len(qids), verified, "doc_id"
    ).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _span_first_sql() -> str:
    base = _bm25_sql(queries=[(qid, t) for qid, t, _ in SPAN_FIRST_QUERIES])
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    arms = "\n  UNION ALL ".join(
        f"SELECT {qid} AS query_id, doc_id FROM tokpos "
        f"WHERE term = '{t}' AND pos <= {n}"
        for qid, t, n in SPAN_FIRST_QUERIES
    )
    return base.replace(
        "scores AS (",
        f"""tokpos AS (
  SELECT doc_id, unnest({tok_nonempty}) AS term,
         generate_subscripts({tok_nonempty}, 1) AS pos
  FROM documents),
spanfirst AS (
  SELECT DISTINCT query_id, doc_id FROM ({arms})),
scores AS (""",
    ).replace(
        "  JOIN dl ON dl.doc_id = tf.doc_id",
        "  JOIN dl ON dl.doc_id = tf.doc_id\n"
        "  JOIN spanfirst ON spanfirst.query_id = q.query_id"
        " AND spanfirst.doc_id = tf.doc_id",
    )


# Lucene SpanNot: exact phrase whose span must not sit within `dist`
# tokens of the exclude term. qid 1/2 split their phrase match sets; qid 3
# excludes a term INSIDE the span (dist 0) so nothing survives; qid 4's
# phrase never matches.
SPAN_NOT_QUERIES = [
    (1, "hash join", "table", 3),
    (2, "data stream", "the", 2),
    (3, "hash join", "hash", 0),
    (4, "quantum banana", "x", 2),
]


def bm25_span_not_topk(sf_dir: str):
    """SpanNotQuery BM25 top-k: per-occurrence exclusion over the
    positional index (pre = post = dist), standard ranking contract."""
    from ...index.phrase import span_not_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, *_ in SPAN_NOT_QUERIES], pa.int64()),
        "text": pa.array([t for _, t, _, _ in SPAN_NOT_QUERIES], pa.string()),
        "excl": pa.array([e for _, _, e, _ in SPAN_NOT_QUERIES], pa.string()),
        "dist": pa.array([d for *_, d in SPAN_NOT_QUERIES], pa.int32()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(SPAN_NOT_QUERIES),
                      pa.int32()),
    })
    out = span_not_topk(
        idx, os.path.join(sf_dir, "documents.parquet"), q
    ).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _span_not_sql() -> str:
    base = _bm25_sql(queries=[(qid, t) for qid, t, _, _ in SPAN_NOT_QUERIES])
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    arms = []
    for qid, text, excl, dist in SPAN_NOT_QUERIES:
        toks = TOKEN_RE.findall(text.lower())
        L = len(toks)
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.p = p0.p + {i}"
            for i in range(1, L)
        )
        preds = " AND ".join(f"p{i}.tok = '{t}'" for i, t in enumerate(toks))
        arms.append(f"""SELECT DISTINCT {qid} AS query_id, p0.doc_id
  FROM pos p0 {joins}
  WHERE {preds}
    AND NOT EXISTS (
      SELECT 1 FROM pos c WHERE c.doc_id = p0.doc_id AND c.tok = '{excl}'
        AND c.p BETWEEN p0.p - {dist} AND p0.p + {L - 1} + {dist})""")
    arms_sql = "\n  UNION ALL ".join(arms)
    return base.replace(
        "scores AS (",
        f"""pos AS (
  SELECT doc_id, unnest({tok_nonempty}) AS tok,
         generate_subscripts({tok_nonempty}, 1) AS p
  FROM documents),
spannot AS (
  {arms_sql}),
scores AS (""",
    ).replace(
        "  JOIN dl ON dl.doc_id = tf.doc_id",
        "  JOIN dl ON dl.doc_id = tf.doc_id\n"
        "  JOIN spannot ON spannot.query_id = q.query_id"
        " AND spannot.doc_id = tf.doc_id",
    )


# prefix (wildcard) queries: 's' matches 6 vocabulary terms so the
# max-expansions cap actually cuts; 'zz' matches nothing.
PREFIX_QUERIES = [(1, "s"), (2, "c"), (3, "qu"), (4, "zz")]


PREFIX_MAX_EXP = 4


def bm25_prefix_topk(sf_dir: str):
    """Prefix/wildcard BM25 top-k (Solr's top-terms scoring rewrite): one
    distributed vocabulary scan expands every prefix to its top-df terms
    (capped), then each expansion runs as an OR query through the pool.
    Ranking contract identical to bm25_topk."""
    from ...index.prefix import prefix_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in PREFIX_QUERIES], pa.int64()),
        "prefix": pa.array([t for _, t in PREFIX_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(PREFIX_QUERIES), pa.int32()),
    })
    out = prefix_topk(idx, q, max_expansions=PREFIX_MAX_EXP).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _prefix_sql() -> str:
    """bm25 SQL with the q(term) list produced by prefix expansion instead
    of literal terms — top PREFIX_MAX_EXP matches by (df desc, term asc),
    exactly mirroring ``index.prefix.expand_prefixes``."""
    base = _bm25_sql(queries=PREFIX_QUERIES)
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in PREFIX_QUERIES)
    return base.replace(
        f"q(query_id, term) AS (VALUES {vals}),",
        f"""pq(query_id, prefix) AS (VALUES {vals}),
q AS (
  SELECT query_id, term FROM (
    SELECT pq.query_id, dfreq.term,
           row_number() OVER (PARTITION BY pq.query_id
                              ORDER BY dfreq.df DESC, dfreq.term) AS rn
    FROM pq JOIN dfreq ON dfreq.term LIKE pq.prefix || '%'
  ) AS e WHERE e.rn <= {PREFIX_MAX_EXP}),""",
    )


# regexp queries (Solr field:/re/ RegexpQuery): anchored full-term match
# over the vocabulary, top-terms scoring rewrite — the same two-stage shape
# as the prefix queries. Patterns stay in the RE2-portable subset so the
# DuckDB oracle (regexp_full_match) agrees with Python's re.fullmatch.
REGEX_QUERIES = [
    (1, "sc.*"),          # prefix-as-regex
    (2, "[jh]oin"),       # character class
    (3, "da(ta|te)s?"),   # alternation + optional suffix
    (4, "zzzz+"),         # matches nothing
]


REGEX_MAX_EXP = 25


def bm25_regex_topk(sf_dir: str):
    """Regexp BM25 top-k: one distributed vocabulary scan expands every
    pattern to its top-df fully-matching terms (capped), then each
    expansion runs as an OR query through the pool. Ranking contract
    identical to bm25_topk."""
    from ...index.prefix import regex_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in REGEX_QUERIES], pa.int64()),
        "pattern": pa.array([t for _, t in REGEX_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(REGEX_QUERIES), pa.int32()),
    })
    out = regex_topk(idx, q, max_expansions=REGEX_MAX_EXP).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _regex_sql() -> str:
    """bm25 SQL with q(term) produced by regex expansion — top REGEX_MAX_EXP
    full matches by (df desc, term asc), mirroring browse_terms_regex."""
    base = _bm25_sql(queries=REGEX_QUERIES)
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, text in REGEX_QUERIES
        for t in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    pvals = ", ".join(f"({qid}, '{p}')" for qid, p in REGEX_QUERIES)
    return base.replace(
        f"q(query_id, term) AS (VALUES {vals}),",
        f"""pq(query_id, pattern) AS (VALUES {pvals}),
q AS (
  SELECT query_id, term FROM (
    SELECT pq.query_id, dfreq.term,
           row_number() OVER (PARTITION BY pq.query_id
                              ORDER BY dfreq.df DESC, dfreq.term) AS rn
    FROM pq JOIN dfreq ON regexp_full_match(dfreq.term, pq.pattern)
  ) AS e WHERE e.rn <= {REGEX_MAX_EXP}),""",
    )


# result paging (Solr start/rows): page 2 of the flagship queries. In a
# scatter/merge engine deep pages ride the same per-shard heaps with
# k' = start + rows (+ margin) — WAND pruning stays active, unlike a
# cursor that would force full accumulation; the driver slices the rank
# window after the rounded re-rank.
PAGE_START = 10   # rows 11..20


PAGE_ROWS = 10


def bm25_page2(sf_dir: str):
    """Second result page: identical ranking contract to bm25_topk, rank
    window (PAGE_START, PAGE_START + PAGE_ROWS]."""
    from ...index.query import bm25_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array(
            [PAGE_START + PAGE_ROWS + _RANK_MARGIN] * len(BM25_QUERIES),
            pa.int32(),
        ),
    })
    out = bm25_topk(idx, q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[
        (out["rank"] > PAGE_START) & (out["rank"] <= PAGE_START + PAGE_ROWS)
    ].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _page2_sql() -> str:
    base = _bm25_sql(k=PAGE_START + PAGE_ROWS)
    return base.replace(
        f"FROM ranked WHERE rank <= {PAGE_START + PAGE_ROWS}",
        f"FROM ranked WHERE rank > {PAGE_START} "
        f"AND rank <= {PAGE_START + PAGE_ROWS}",
    )


# pseudo-relevance feedback (Rocchio-style query expansion): base top-F
# docs per query → each feedback doc's top tf*idf terms (the MLT selection
# contract) union the original terms → one expanded OR query. Two pool
# round-trips; term selection is driver-side over F x terms_per_doc rows.
PRF_FEEDBACK_DOCS = 3


PRF_TERMS_PER_DOC = 5


def bm25_prf_topk(sf_dir: str) -> pd.DataFrame:
    from ...index.mlt import fetch_texts, interesting_terms

    idx = _build_docs_index(sf_dir)
    base = _ranked_topk(idx, k=PRF_FEEDBACK_DOCS)
    fb = {
        qid: base[base["query_id"] == qid]["doc_id"].tolist()
        for qid, _ in BM25_QUERIES
    }
    all_ids = sorted({d for v in fb.values() for d in v})
    texts = fetch_texts(os.path.join(sf_dir, "documents.parquet"), all_ids)
    doc_terms = interesting_terms(
        idx, {i: texts.get(i, "") for i in all_ids}, PRF_TERMS_PER_DOC
    )
    rows = []
    for qid, text in BM25_QUERIES:
        terms = set(TOKEN_RE.findall(text.lower()))
        for d in fb.get(qid, []):
            terms.update(doc_terms.get(d, []))
        if terms:
            rows.append((qid, " ".join(sorted(terms))))
    q = pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(rows), pa.int32()),
    })
    from ...index.query import get_pool

    out = get_pool(idx).topk(q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _prf_sql() -> str:
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in BM25_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    score_expr = (
        "sum( ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)\n"
        "              * tf.tf * 2.2\n"
        "              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl "
        "/ stats.avgdl)) ) AS score"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
  FROM toks WHERE term <> '' GROUP BY doc_id),
stats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
q0(query_id, term) AS (VALUES {vals}),
scores0 AS (
  SELECT q0.query_id, tf.doc_id,
         {score_expr}
  FROM q0
  JOIN tf ON tf.term = q0.term
  JOIN dfreq ON dfreq.term = q0.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q0.query_id, tf.doc_id),
fb AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 6) DESC, doc_id) AS rank
    FROM scores0) WHERE rank <= {PRF_FEEDBACK_DOCS}),
mlt AS (
  SELECT fb.query_id, tf.term,
         row_number() OVER (
           PARTITION BY fb.query_id, fb.doc_id
           ORDER BY round(tf.tf * ln((stats.n - dfreq.df + 0.5)
                                     / (dfreq.df + 0.5) + 1.0), 6) DESC,
                    tf.term) AS rn
  FROM fb JOIN tf ON tf.doc_id = fb.doc_id
  JOIN dfreq ON dfreq.term = tf.term
  CROSS JOIN stats),
q AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, term FROM mlt WHERE rn <= {PRF_TERMS_PER_DOC}
    UNION ALL SELECT query_id, term FROM q0)),
scores AS (
  SELECT q.query_id, tf.doc_id,
         {score_expr}
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {BM25_K}
"""


# stored-field fetch (Solr fl=): the second phase of every distributed
# search — after the scatter/merge rank, fetch the hit docs' stored fields
# with ONE pushdown-filtered read of the doc table (id-pruned at the
# row-group level), never a full-table join for k x queries ids.
FL_FIELDS = ["lang", "source", "n_chars"]


def bm25_topk_fields(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    idx = _build_docs_index(sf_dir)
    ranked = _ranked_topk(idx)
    ids = sorted(set(ranked["doc_id"].tolist()))
    fields = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"] + FL_FIELDS,
            filter=pads.field("doc_id").isin(ids),
        )
        .to_pandas()
    )
    out = ranked.merge(fields, on="doc_id", how="left")
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out.sort_values(["query_id", "rank"], ignore_index=True)[
        ["query_id", "rank", "doc_id", "score"] + FL_FIELDS
    ]


def _bm25_fields_sql() -> str:
    base = _bm25_sql().rstrip()
    # wrap: join the ranked page to the stored fields
    return f"""
WITH base AS ({base})
SELECT base.query_id, base.rank, base.doc_id, base.score,
       d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM base JOIN documents d USING (doc_id)
ORDER BY query_id, rank
"""


# retrieval-quality evaluation (the trec_eval surface): MRR and binary
# nDCG@10 of the flagship BM25 run against deterministic qrels — relevant =
# the conjunctive (ALL terms) match set, computed distributed through the
# pool. The run is the normal rounded ranking; metrics are exact arithmetic
# both sides (log2 + round 6).
EVAL_K = 10


def _eval_qrels(sf_dir: str) -> dict[int, set]:
    """Deterministic graded qrels: a doc is relevant to a query iff EVERY
    query term occurs >= 2 times in it (strict enough that the run can
    actually miss — the metrics stay discriminative). One distributed
    tokenize pass for all queries together."""
    from ...functions.tokenize import batch_term_doc_tf

    qterms = {
        qid: sorted(set(TOKEN_RE.findall(text.lower())))
        for qid, text in BM25_QUERIES
    }

    def find(df: pd.DataFrame) -> pd.DataFrame:
        terms, doc_ids, tfs, _ = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        out_q, out_d = [], []
        tdf = pd.DataFrame({"term": terms, "doc_id": doc_ids, "tf": tfs})
        strong = tdf[tdf["tf"] >= 2]
        for qid, ts in qterms.items():
            sub = strong[strong["term"].isin(ts)]
            cnt = sub.groupby("doc_id")["term"].nunique()
            hit = cnt[cnt == len(ts)].index.to_numpy(np.int64)
            out_q.extend([qid] * len(hit))
            out_d.extend(hit.tolist())
        return pd.DataFrame({
            "query_id": pd.Series(out_q, dtype=np.int64),
            "doc_id": pd.Series(out_d, dtype=np.int64),
        })

    rel = (
        _docs(sf_dir).map_batches(find, batch_format="pandas").to_pandas()
    )
    return {
        qid: set(rel[rel["query_id"] == qid]["doc_id"].tolist())
        for qid, _ in BM25_QUERIES
    }


def bm25_eval_metrics(sf_dir: str) -> pd.DataFrame:
    idx = _build_docs_index(sf_dir)
    run = _ranked_topk(idx, k=EVAL_K)
    qrels = _eval_qrels(sf_dir)
    rows = []
    for qid, text in BM25_QUERIES:
        rel = qrels.get(qid, set())
        g = run[run["query_id"] == qid].sort_values("rank")
        ranks = g["rank"].to_numpy(np.int64)
        hits = np.array([int(d) in rel for d in g["doc_id"]], dtype=bool)
        mrr = float(1.0 / ranks[hits][0]) if hits.any() else 0.0
        dcg = float((1.0 / np.log2(ranks[hits] + 1.0)).sum()) if hits.any() else 0.0
        ideal_n = min(len(rel), EVAL_K)
        idcg = float((1.0 / np.log2(np.arange(1, ideal_n + 1) + 1.0)).sum())
        ndcg = dcg / idcg if idcg > 0 else 0.0
        rows.append((qid, len(rel), round(mrr, 6), round(ndcg, 6)))
    return pd.DataFrame(rows, columns=["query_id", "n_relevant", "mrr", "ndcg"]) \
        .astype({"query_id": np.int64, "n_relevant": np.int64}) \
        .sort_values("query_id", ignore_index=True)


HN_K = 50   # retrieval depth mined for negatives


HN_N = 5    # hard negatives kept per query


def bm25_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Hard-negative mining for retrieval-model training (the DPR/ANCE
    construction: top-ranked NON-relevant docs are the hardest negatives):
    run distributed BM25 to depth HN_K, drop the qrels positives, keep the
    first HN_N survivors per query in rank order. Retrieval and qrels are
    both distributed passes; the mining subtraction itself touches only
    query-result-sized frames (k rows per query)."""
    idx = _build_docs_index(sf_dir)
    run = _ranked_topk(idx, k=HN_K)
    qrels = _eval_qrels(sf_dir)
    outs = []
    for qid, _ in BM25_QUERIES:
        rel = qrels.get(qid, set())
        g = run[run["query_id"] == qid].sort_values("rank")
        neg = g[~g["doc_id"].astype(np.int64).isin(list(rel))].head(HN_N).copy()
        neg["neg_rank"] = np.arange(1, len(neg) + 1, dtype=np.int64)
        outs.append(neg[["query_id", "neg_rank", "doc_id", "score"]])
    return pd.concat(outs, ignore_index=True).sort_values(
        ["query_id", "neg_rank"], ignore_index=True)


def _hard_neg_sql() -> str:
    base = _bm25_sql(k=HN_K).rstrip()
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in BM25_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    return f"""
WITH run AS ({base}),
toks2 AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf2 AS (
  SELECT doc_id, term, count(*) AS cnt FROM toks2 WHERE term <> ''
  GROUP BY doc_id, term),
qr(query_id, term) AS (VALUES {vals}),
rel AS (
  SELECT qr.query_id, t.doc_id
  FROM tf2 t JOIN qr ON t.term = qr.term
  GROUP BY qr.query_id, t.doc_id
  HAVING count(DISTINCT CASE WHEN t.cnt >= 2 THEN t.term END)
         = (SELECT count(*) FROM qr q2 WHERE q2.query_id = qr.query_id)),
neg AS (
  SELECT r.query_id, r.rank, r.doc_id, r.score
  FROM run r LEFT JOIN rel
       ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
  WHERE rel.doc_id IS NULL),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY rank) AS neg_rank
  FROM neg)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neg_rank AS BIGINT) AS neg_rank, doc_id, score
FROM ranked WHERE neg_rank <= {HN_N}
ORDER BY query_id, neg_rank
"""


def _eval_sql() -> str:
    base = _bm25_sql(k=EVAL_K).rstrip()
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in BM25_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    qids = ", ".join(f"({qid})" for qid, _ in BM25_QUERIES)
    return f"""
WITH run AS ({base}),
toks2 AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf2 AS (
  SELECT doc_id, term, count(*) AS cnt FROM toks2 WHERE term <> ''
  GROUP BY doc_id, term),
qr(query_id, term) AS (VALUES {vals}),
rel AS (
  SELECT qr.query_id, t.doc_id
  FROM tf2 t JOIN qr ON t.term = qr.term
  GROUP BY qr.query_id, t.doc_id
  HAVING count(DISTINCT CASE WHEN t.cnt >= 2 THEN t.term END)
         = (SELECT count(*) FROM qr q2 WHERE q2.query_id = qr.query_id)),
nrel AS (SELECT query_id, count(*) AS n FROM rel GROUP BY query_id),
hits AS (
  SELECT r.query_id, r.rank
  FROM run r JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id),
perq AS (
  SELECT query_id,
         min(rank) AS first_rank,
         sum(1.0 / log2(rank + 1.0)) AS dcg
  FROM hits GROUP BY query_id),
allq(query_id) AS (VALUES {qids}),
ideal AS (
  SELECT a.query_id,
         coalesce(n.n, 0) AS n_relevant,
         (SELECT coalesce(sum(1.0 / log2(i + 1.0)), 0.0)
          FROM unnest(range(1, CAST(least(coalesce(n.n, 0), {EVAL_K}) AS BIGINT) + 1)) AS t(i))
           AS idcg
  FROM allq a LEFT JOIN nrel n ON n.query_id = a.query_id)
SELECT CAST(i.query_id AS BIGINT) AS query_id,
       CAST(i.n_relevant AS BIGINT) AS n_relevant,
       round(coalesce(1.0 / p.first_rank, 0.0), 6) AS mrr,
       round(CASE WHEN i.idcg > 0 THEN coalesce(p.dcg, 0.0) / i.idcg
                  ELSE 0.0 END, 6) AS ndcg
FROM ideal i LEFT JOIN perq p ON p.query_id = i.query_id
ORDER BY query_id
"""


def bm25_explain_top3(sf_dir: str) -> pd.DataFrame:
    from ...index.query import explain

    idx = _build_docs_index(sf_dir)
    qid, text = BM25_QUERIES[0]
    top = _ranked_topk(idx, queries=[(qid, text)], k=3)
    rows = []
    for d in top["doc_id"].tolist():
        ex = explain(idx, text, int(d))
        for t in ex["terms"]:
            rows.append((int(d), t["term"], int(t["tf"]), int(t["dl"]),
                         round(float(t["contribution"]), 6)))
    out = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "dl",
                                      "contribution"])
    out = out.astype({"doc_id": np.int64, "tf": np.int64, "dl": np.int64})
    return out.sort_values(["doc_id", "term"], ignore_index=True)


def _explain_sql() -> str:
    qid, text = BM25_QUERIES[0]
    terms = sorted(set(TOKEN_RE.findall(text.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
  FROM toks WHERE term <> '' GROUP BY doc_id),
stats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
q0(term) AS (VALUES {vals}),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS score
  FROM tf JOIN q0 ON q0.term = tf.term
  JOIN dfreq ON dfreq.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id),
fb AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
      ORDER BY round(score, 6) DESC, doc_id) AS rank FROM scores)
  WHERE rank <= 3)
SELECT fb.doc_id, t.term,
       CAST(t.tf AS BIGINT) AS tf, CAST(dl.dl AS BIGINT) AS dl,
       round( ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
              * t.tf * 2.2
              / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6)
         AS contribution
FROM fb
JOIN tf t ON t.doc_id = fb.doc_id AND t.term IN (SELECT term FROM q0)
JOIN dfreq ON dfreq.term = t.term
JOIN dl ON dl.doc_id = fb.doc_id
CROSS JOIN stats
ORDER BY fb.doc_id, t.term
"""


# facet.query (Solr): counts for ARBITRARY stored subqueries over the whole
# corpus — each facet is a boolean query (AND or OR of its terms) answered
# by the pool's distributed boolean retrieval (posting decode + set ops all
# inside the shard workers).
FACET_QUERY_DEFS = [
    ("data_and_model", "data model", "and"),
    ("nohit_term", "qzqzq", "and"),
    ("stream_or_join", "stream join", "or"),
]


def facet_query_counts(sf_dir: str) -> pd.DataFrame:
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    pool = get_pool(idx)
    names = [n for n, _, _ in FACET_QUERY_DEFS]
    counts = [
        len(pool.matching_doc_ids(text, mode))
        for _, text, mode in FACET_QUERY_DEFS
    ]
    return pd.DataFrame({
        "facet": pd.Series(names, dtype=object),
        "n_docs": pd.Series(counts, dtype=np.int64),
    }).sort_values("facet", ignore_index=True)


def _facet_query_sql() -> str:
    arms = []
    for name, text, mode in FACET_QUERY_DEFS:
        terms = sorted(set(TOKEN_RE.findall(text.lower())))
        in_list = ", ".join(f"'{t}'" for t in terms)
        having = (
            f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "and" else ""
        )
        arms.append(f"""
  SELECT '{name}' AS facet,
         (SELECT count(*) FROM (
            SELECT doc_id FROM tf WHERE term IN ({in_list})
            GROUP BY doc_id {having})) AS n_docs""")
    union = "\n  UNION ALL".join(arms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT DISTINCT doc_id, term FROM toks WHERE term <> '')
SELECT facet, CAST(n_docs AS BIGINT) AS n_docs FROM ({union})
ORDER BY facet
"""


def bm25_cursor_page2(sf_dir: str):
    """Deep paging via cursorMark (Solr search-after): page 1's last
    (rounded score, doc_id) becomes each query's cursor; the pool then
    ranks ONLY docs strictly after the mark — k rows per shard leave the
    workers regardless of page depth (vs start+rows for offset paging).
    Result contract identical to bm25_page2 (global ranks 11..20)."""
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    page1 = _ranked_topk(idx, k=PAGE_START)
    last = page1[page1["rank"] == PAGE_START].set_index("query_id")
    rows = [
        (qid, text, float(last.loc[qid, "score"]), int(last.loc[qid, "doc_id"]))
        for qid, text in BM25_QUERIES
        if qid in last.index  # a query with < PAGE_START hits has no page 2
    ]
    if not rows:
        return pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
        })
    q = pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "k": pa.array([PAGE_ROWS + _RANK_MARGIN] * len(rows), pa.int32()),
        "cursor_score": pa.array([r[2] for r in rows], pa.float64()),
        "cursor_doc": pa.array([r[3] for r in rows], pa.int64()),
    })
    out = get_pool(idx).topk(q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= PAGE_ROWS].reset_index(drop=True)
    out["rank"] = (out["rank"] + PAGE_START).astype(np.int64)
    return out[["query_id", "rank", "doc_id", "score"]]


# grouped search / field collapsing (Solr group.field=source): per query
# and per source value, the top-N docs by BM25.
GROUP_QUERIES = [(0, "join hash"), (1, "the data stream")]


GROUP_N = 3


def grouped_topk_by_source(sf_dir: str):
    """Field collapsing: per-(shard, group) heaps inside the query actors,
    exact per-group merge on the driver, rounded-rank contract per group."""
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in GROUP_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in GROUP_QUERIES], pa.string()),
        "k": pa.array([GROUP_N + _RANK_MARGIN] * len(GROUP_QUERIES), pa.int32()),
    })
    out = get_pool(idx).grouped_topk(q, "source")
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "source", "score", "doc_id"],
                          ascending=[True, True, False, True],
                          kind="mergesort", ignore_index=True)
    out["grp_rank"] = (
        out.groupby(["query_id", "source"]).cumcount() + 1
    ).astype(np.int64)
    out = out[out["grp_rank"] <= GROUP_N].reset_index(drop=True)
    return out[["query_id", "source", "grp_rank", "doc_id", "score"]]


def _grouped_sql() -> str:
    base = _bm25_sql(queries=GROUP_QUERIES)
    old_tail = """ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= 10
"""
    new_tail = f"""ranked AS (
  SELECT s.query_id, d.source, s.doc_id, round(s.score, 6) AS score,
         row_number() OVER (PARTITION BY s.query_id, d.source
                            ORDER BY round(s.score, 6) DESC, s.doc_id) AS grp_rank
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id, source,
       CAST(grp_rank AS BIGINT) AS grp_rank, doc_id, score
FROM ranked WHERE grp_rank <= {GROUP_N}
"""
    assert old_tail in base
    return base.replace(old_tail, new_tail)


def bm25_collapse_topk(sf_dir: str):
    """Solr collapse qparser ({!collapse field=source}): ONE result list
    with only each group's best doc, globally re-ranked. Rides the same
    per-(shard, group) heap machinery as grouping — per-group candidates
    with the rounded-tie margin, per-group winner = (rounded score desc,
    doc_id asc) first, then an exact global rank over ALL group winners."""
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array([1 + _RANK_MARGIN] * len(BM25_QUERIES), pa.int32()),
    })
    out = get_pool(idx).grouped_topk(q, "source")
    out = out.copy()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "source", "score", "doc_id"],
                          ascending=[True, True, False, True],
                          kind="mergesort", ignore_index=True)
    winners = out.drop_duplicates(["query_id", "source"], keep="first")
    winners = winners.sort_values(["query_id", "score", "doc_id"],
                                  ascending=[True, False, True],
                                  kind="mergesort", ignore_index=True)
    winners["rank"] = (winners.groupby("query_id").cumcount() + 1).astype(np.int64)
    winners = winners[winners["rank"] <= BM25_K].reset_index(drop=True)
    return winners[["query_id", "rank", "source", "doc_id", "score"]]


def _collapse_sql() -> str:
    base = _bm25_sql()
    old_tail = """ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= 10
"""
    new_tail = f"""collapsed AS (
  SELECT s.query_id, d.source, s.doc_id, round(s.score, 6) AS score,
         row_number() OVER (PARTITION BY s.query_id, d.source
                            ORDER BY round(s.score, 6) DESC, s.doc_id) AS rn
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id),
ranked AS (
  SELECT query_id, source, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM collapsed WHERE rn = 1)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       source, doc_id, score
FROM ranked WHERE rank <= {BM25_K}
"""
    assert old_tail in base
    return base.replace(old_tail, new_tail)


# fielded dismax search (Solr qf=title^2 text): title is a deterministic
# derived field (the doc's first 6 tokens — a synthetic headline contract
# the SQL oracle reproduces); each field is its own index with its own
# df/dl/avgdl; dismax score = max(2.0 * bm25_title, 1.0 * bm25_text).
DISMAX_QUERIES = [(0, "scan column"), (1, "join hash"), (2, "data stream")]


DISMAX_TITLE_W = 2.0


DISMAX_TITLE_TOKENS = 6


def _build_title_index(sf_dir: str) -> str:
    from ...functions.tokenize import tokenize_text
    from ...index.build import BuildConfig, build_index

    idx = _index_dir_for(sf_dir) + "_title"

    def derive(batch: pa.Table) -> pa.Table:
        titles = [
            " ".join(tokenize_text(t)[:DISMAX_TITLE_TOKENS])
            for t in batch["text"].to_pylist()
        ]
        return pa.table({
            "doc_id": batch["doc_id"],
            "title": pa.array(titles, pa.string()),
        })

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(derive, batch_format="pyarrow")
    cfg = BuildConfig(n_shards=4, n_buckets=8, text_col="title",
                      id_col="doc_id", meta_cols=())
    build_index(ds, idx, cfg, resume=True)
    return idx


def bm25_dismax_topk(sf_dir: str):
    """Fielded dismax top-k: per-field top-k heaps → candidate union →
    exact whitelist rescore in every field → max-combine. Ranking contract
    identical to bm25_topk (rounded 6 dp, margin cut)."""
    from ...index.multifield import dismax_topk

    text_idx = _build_docs_index(sf_dir)
    title_idx = _build_title_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in DISMAX_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in DISMAX_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(DISMAX_QUERIES), pa.int32()),
    })
    out = dismax_topk(
        [(title_idx, DISMAX_TITLE_W), (text_idx, 1.0)], q
    ).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _dismax_sql() -> str:
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in DISMAX_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
  FROM toks WHERE term <> '' GROUP BY doc_id),
stats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
ttoks AS (
  SELECT doc_id,
         unnest(list_slice(list_filter({TOK_SQL}, x -> x <> ''),
                           1, {DISMAX_TITLE_TOKENS})) AS term
  FROM documents),
ttf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM ttoks GROUP BY doc_id, term),
tdl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM ttoks GROUP BY doc_id),
tstats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT sum(dl) FROM tdl) / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl),
tdfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM ttf GROUP BY term),
q(query_id, term) AS (VALUES {vals}),
sx AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id),
st AS (
  SELECT q.query_id, ttf.doc_id,
         sum( ln((tstats.n - tdfreq.df + 0.5) / (tdfreq.df + 0.5) + 1.0)
              * ttf.tf * 2.2
              / (ttf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tdl.dl / tstats.avgdl)) ) AS score
  FROM q
  JOIN ttf ON ttf.term = q.term
  JOIN tdfreq ON tdfreq.term = q.term
  JOIN tdl ON tdl.doc_id = ttf.doc_id
  CROSS JOIN tstats
  GROUP BY q.query_id, ttf.doc_id),
comb AS (
  SELECT coalesce(sx.query_id, st.query_id) AS query_id,
         coalesce(sx.doc_id, st.doc_id) AS doc_id,
         greatest(coalesce(sx.score, 0) * 1.0,
                  coalesce(st.score, 0) * {DISMAX_TITLE_W}) AS score
  FROM sx FULL OUTER JOIN st
    ON sx.query_id = st.query_id AND sx.doc_id = st.doc_id),
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM comb)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {BM25_K}
"""


# more-like-this (Solr MLT): rank the corpus by similarity to a source doc.
# Source ids exist at every scale factor (sf0.001 has 500 docs).
MLT_QUERIES = [(0, 42), (1, 7), (2, 123)]


MLT_MAX_TERMS = 8


def bm25_mlt_topk(sf_dir: str):
    """More-like-this top-k: each source doc's top-tf*idf terms (rounded
    6 dp, ties term asc) run as an OR query through the distributed pool;
    the source doc is excluded. Ranking contract identical to bm25_topk."""
    from ...index.mlt import more_like_this

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in MLT_QUERIES], pa.int64()),
        "doc_id": pa.array([d for _, d in MLT_QUERIES], pa.int64()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(MLT_QUERIES), pa.int32()),
    })
    out = more_like_this(
        idx, os.path.join(sf_dir, "documents.parquet"), q,
        max_terms=MLT_MAX_TERMS,
    ).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _mlt_sql() -> str:
    """bm25 SQL with q(term) produced by the MLT term-selection contract:
    top tf*idf terms of the source doc (round 6 dp desc, term asc), source
    doc anti-joined out of the ranking."""
    base = _bm25_sql(queries=[(qid, str(src)) for qid, src in MLT_QUERIES])
    quoted = ", ".join(f"({qid}, '{src}')" for qid, src in MLT_QUERIES)
    ints = ", ".join(f"({qid}, {src})" for qid, src in MLT_QUERIES)
    return base.replace(
        f"q(query_id, term) AS (VALUES {quoted}),",
        f"""src(query_id, src_doc) AS (VALUES {ints}),
mlt AS (
  SELECT src.query_id, tf.term,
         row_number() OVER (
           PARTITION BY src.query_id
           ORDER BY round(tf.tf * ln((stats.n - dfreq.df + 0.5)
                                     / (dfreq.df + 0.5) + 1.0), 6) DESC,
                    tf.term) AS rn
  FROM src JOIN tf ON tf.doc_id = src.src_doc
  JOIN dfreq ON dfreq.term = tf.term
  CROSS JOIN stats),
q AS (SELECT query_id, term FROM mlt WHERE rn <= {MLT_MAX_TERMS}),""",
    ).replace(
        "  GROUP BY q.query_id, tf.doc_id),",
        """  WHERE NOT EXISTS (SELECT 1 FROM src
                    WHERE src.query_id = q.query_id
                      AND src.src_doc = tf.doc_id)
  GROUP BY q.query_id, tf.doc_id),""",
    )


# vocabulary browse (Solr terms component): top terms by df under a prefix.
TERMS_PREFIXES = ["sc", "d", "qz"]


TERMS_LIMIT = 10


def terms_browse(sf_dir: str):
    """Terms component: (prefix, term, df) from one range-filtered scan of
    the sealed termstats parquet — work proportional to vocabulary bytes."""
    from ...index.prefix import browse_terms

    idx = _build_docs_index(sf_dir)
    out = browse_terms(idx, TERMS_PREFIXES, limit=TERMS_LIMIT)
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values(["prefix", "df", "term"],
                           ascending=[True, False, True],
                           kind="mergesort", ignore_index=True)


# infix suggest (AnalyzingInfixSuggester): substring match over the
# vocabulary; "xyzzy" never matches
TERMS_NEEDLES = ["oin", "at", "xyzzy"]


def terms_infix(sf_dir: str):
    """Infix vocabulary suggest: (needle, term, df) — one column-pruned
    full termstats scan (no range pushdown exists for substring match)."""
    from ...index.prefix import browse_terms_infix

    idx = _build_docs_index(sf_dir)
    out = browse_terms_infix(idx, TERMS_NEEDLES, limit=TERMS_LIMIT)
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values(["needle", "df", "term"],
                           ascending=[True, False, True],
                           kind="mergesort", ignore_index=True)


def _terms_infix_sql() -> str:
    vals = ", ".join(f"('{s}')" for s in TERMS_NEEDLES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term FROM toks WHERE term <> '' GROUP BY doc_id, term),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term),
p(needle) AS (VALUES {vals}),
ranked AS (
  SELECT p.needle, dfreq.term, dfreq.df,
         row_number() OVER (PARTITION BY p.needle
                            ORDER BY dfreq.df DESC, dfreq.term) AS rn
  FROM p JOIN dfreq ON position(p.needle IN dfreq.term) > 0)
SELECT needle, term, CAST(df AS BIGINT) AS df
FROM ranked WHERE rn <= {TERMS_LIMIT}
ORDER BY needle, df DESC, term
"""


def _terms_browse_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in TERMS_PREFIXES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term FROM toks WHERE term <> '' GROUP BY doc_id, term),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term),
p(prefix) AS (VALUES {vals}),
ranked AS (
  SELECT p.prefix, dfreq.term, dfreq.df,
         row_number() OVER (PARTITION BY p.prefix
                            ORDER BY dfreq.df DESC, dfreq.term) AS rn
  FROM p JOIN dfreq ON dfreq.term LIKE p.prefix || '%')
SELECT prefix, term, CAST(df AS BIGINT) AS df
FROM ranked WHERE rn <= {TERMS_LIMIT}
"""


# boolean NOT queries (Solr `a b -c`): rank on the positive terms, exclude
# docs containing ANY negative term; surviving scores unchanged (the NOT is
# a filter, like Solr fq). qid 2's negative matches nothing → plain bm25.
NOT_QUERIES = [
    (0, "join hash", "scan"),
    (1, "batch scan filter", "window order"),
    (2, "the data stream", "qzqzqz"),
]


def bm25_not_topk(sf_dir: str):
    """BM25 top-k with NOT clauses: the exclusion set is computed
    shard-locally inside each query actor from the negative terms' postings
    (never driver-side), then applied like tombstones during scoring.
    Ranking contract identical to bm25_topk."""
    from ...index.query import bm25_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _, _ in NOT_QUERIES], pa.int64()),
        "text": pa.array([t for _, t, _ in NOT_QUERIES], pa.string()),
        "not_text": pa.array([n for _, _, n in NOT_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(NOT_QUERIES), pa.int32()),
    })
    out = bm25_topk(idx, q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _not_sql() -> str:
    """bm25 SQL plus an anti-join: a (query_id, doc_id) pair is dropped when
    the doc contains any of that query's negative terms."""
    base = _bm25_sql(queries=[(qid, t) for qid, t, _ in NOT_QUERIES])
    neg_vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, _, nt in NOT_QUERIES
        for term in sorted(set(TOKEN_RE.findall(nt.lower())))
    )
    pos_vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text, _ in NOT_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    return base.replace(
        f"q(query_id, term) AS (VALUES {pos_vals}),",
        f"""q(query_id, term) AS (VALUES {pos_vals}),
nq(query_id, term) AS (VALUES {neg_vals}),""",
    ).replace(
        "  GROUP BY q.query_id, tf.doc_id),",
        """  WHERE NOT EXISTS (SELECT 1 FROM toks t2
                    JOIN nq ON t2.term = nq.term AND nq.query_id = q.query_id
                    WHERE t2.doc_id = tf.doc_id)
  GROUP BY q.query_id, tf.doc_id),""",
    )


# minimum-should-match queries (Solr edismax mm): (qid, text, mm) — rank
# only docs matching >= mm distinct query terms; surviving scores are the
# plain OR-query BM25 scores (mm gates matching, never scoring). qid 2's
# mm equals its term count (degenerates to conjunctive); qid 3 mixes a
# common term with an absent one, so mm=2 requires both real terms.
MM_QUERIES = [
    (1, "join hash window", 2),
    (2, "batch scan filter", 3),
    (3, "stream quantum merge", 2),
]


def bm25_mm_topk(sf_dir: str):
    """BM25 top-k with minimum-should-match (Solr edismax ``mm``): the
    >=mm-of-n whitelist is computed shard-locally in each query actor from
    per-term posting membership counts (never driver-side). Ranking
    contract identical to bm25_topk."""
    from ...index.query import bm25_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _, _ in MM_QUERIES], pa.int64()),
        "text": pa.array([t for _, t, _ in MM_QUERIES], pa.string()),
        "min_match": pa.array([m for _, _, m in MM_QUERIES], pa.int32()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(MM_QUERIES), pa.int32()),
    })
    out = bm25_topk(idx, q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _mm_sql() -> str:
    """bm25 SQL with a per-query distinct-matched-terms floor."""
    base = _bm25_sql(queries=[(qid, t) for qid, t, _ in MM_QUERIES])
    mm_vals = ", ".join(f"({qid}, {m})" for qid, _, m in MM_QUERIES)
    return base.replace(
        "scores AS (",
        f"mmv(query_id, mm) AS (VALUES {mm_vals}),\nscores AS (",
    ).replace(
        "  GROUP BY q.query_id, tf.doc_id),",
        "  GROUP BY q.query_id, tf.doc_id\n"
        "  HAVING count(DISTINCT tf.term) >= (SELECT mm FROM mmv\n"
        "                                     WHERE mmv.query_id = q.query_id)),",
    )


# fuzzy queries (Solr term~2): misspellings one and two edits from
# vocabulary words; 'qzqzqz' is beyond distance 2 from everything.
FUZZY_QUERIES = [(1, "hashs"), (2, "scann"), (3, "tabel"), (4, "qzqzqz")]


FUZZY_MAX_D = 2


FUZZY_MAX_EXP = 4


def bm25_fuzzy_topk(sf_dir: str):
    """Fuzzy BM25 top-k (Solr term~d): one vocabulary scan expands each
    word to its closest terms (distance asc, df desc, term asc; capped),
    then each expansion scores as an OR query. Ranking contract identical
    to bm25_topk."""
    from ...index.fuzzy import fuzzy_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in FUZZY_QUERIES], pa.int64()),
        "word": pa.array([t for _, t in FUZZY_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(FUZZY_QUERIES), pa.int32()),
    })
    out = fuzzy_topk(idx, q, max_distance=FUZZY_MAX_D,
                     max_expansions=FUZZY_MAX_EXP).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _fuzzy_sql() -> str:
    """bm25 SQL with q(term) produced by Levenshtein expansion — DuckDB's
    ``levenshtein`` is the same unit-cost DP as ``index.fuzzy.levenshtein``."""
    base = _bm25_sql(queries=FUZZY_QUERIES)
    vals = ", ".join(f"({qid}, '{w}')" for qid, w in FUZZY_QUERIES)
    return base.replace(
        f"q(query_id, term) AS (VALUES {vals}),",
        f"""pq(query_id, word) AS (VALUES {vals}),
q AS (
  SELECT query_id, term FROM (
    SELECT pq.query_id, dfreq.term,
           row_number() OVER (PARTITION BY pq.query_id
                              ORDER BY levenshtein(dfreq.term, pq.word),
                                       dfreq.df DESC, dfreq.term) AS rn
    FROM pq JOIN dfreq ON levenshtein(dfreq.term, pq.word) <= {FUZZY_MAX_D}
  ) AS e WHERE e.rn <= {FUZZY_MAX_EXP}),""",
    )


# --------------------------- synonym expansion ------------------------------
#
# Query-time synonyms (Solr SynonymGraphFilter): each query token expands to
# itself ∪ its synonym set; scoring is the standard OR query over the
# deduped expanded terms — the same rewrite shape as prefix/fuzzy expansion,
# so no new engine machinery, just the mapping.

SYNONYMS = {
    "join": ["merge"],
    "scan": ["batch", "filter"],
    "fast": ["quick"],
}


SYN_QUERIES = [(1, "join data"), (2, "scan"), (3, "fast table")]


def _expand_synonyms(text: str) -> list[str]:
    toks = list(dict.fromkeys(TOKEN_RE.findall(text.lower())))
    out = []
    for t in toks:
        for w in [t, *SYNONYMS.get(t, [])]:
            if w not in out:
                out.append(w)
    return out


def bm25_synonym_topk(sf_dir: str) -> pd.DataFrame:
    idx = _build_docs_index(sf_dir)
    expanded = [(qid, " ".join(_expand_synonyms(t))) for qid, t in SYN_QUERIES]
    return _ranked_topk(idx, expanded)


def _synonym_sql() -> str:
    expanded = [(qid, " ".join(_expand_synonyms(t))) for qid, t in SYN_QUERIES]
    return _bm25_sql(queries=expanded)


# --------------------------- query elevation --------------------------------
#
# Solr QueryElevationComponent (forceElevation=true): configured doc ids are
# pinned to the top IN CONFIG ORDER; organic results follow, excluding the
# pinned ids, in the normal rounded-score order.

ELEVATE = {0: [42, 7], 1: [3], 2: []}


def bm25_elevated_topk(sf_dir: str) -> pd.DataFrame:
    idx = _build_docs_index(sf_dir)
    organic = _ranked_topk(idx, BM25_QUERIES, k=BM25_K + max(
        len(v) for v in ELEVATE.values()
    ))
    frames = []
    for qid, _ in BM25_QUERIES:
        pinned = ELEVATE.get(qid, [])
        g = organic[organic["query_id"] == qid]
        g = g[~g["doc_id"].isin(pinned)]
        rows = [
            {"query_id": qid, "doc_id": d, "elevated": True} for d in pinned
        ] + [
            {"query_id": qid, "doc_id": int(d), "elevated": False}
            for d in g["doc_id"]
        ]
        f = pd.DataFrame(rows[:BM25_K])
        f["rank"] = np.arange(1, len(f) + 1, dtype=np.int64)
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    out["query_id"] = out["query_id"].astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["query_id", "rank", "doc_id", "elevated"]]


def _elevated_sql() -> str:
    ev_rows = [
        (qid, d, i + 1)
        for qid, docs in ELEVATE.items()
        for i, d in enumerate(docs)
    ]
    ev_vals = ", ".join(f"({q}, {d}, {r})" for q, d, r in ev_rows) or "(NULL, NULL, NULL)"
    k_deep = BM25_K + max(len(v) for v in ELEVATE.values())
    return f"""
WITH organic AS (
  SELECT query_id, doc_id, rank AS orank
  FROM ({_bm25_sql(k=k_deep)})),
ev(query_id, doc_id, erank) AS (VALUES {ev_vals}),
merged AS (
  SELECT query_id, doc_id, TRUE AS elevated, erank AS sortkey, 0 AS tier
  FROM ev WHERE query_id IS NOT NULL
  UNION ALL
  SELECT o.query_id, o.doc_id, FALSE AS elevated, o.orank AS sortkey, 1 AS tier
  FROM organic o
  WHERE NOT EXISTS (SELECT 1 FROM ev
                    WHERE ev.query_id = o.query_id
                      AND ev.doc_id = o.doc_id)),
ranked AS (
  SELECT query_id, doc_id, elevated,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY tier, sortkey) AS rank
  FROM merged)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, elevated
FROM ranked WHERE rank <= {BM25_K}
ORDER BY query_id, rank
"""


# --------------------------- boost queries ----------------------------------
#
# Solr ``boost=`` with a categorical weight function of a doc field:
# boosted = bm25_score * w(lang). Weights are exactly-representable doubles
# so engine and oracle multiply identical values. A multiplicative boost can
# promote ANY matching doc, so shards score their full match set (same
# boundary as grouping/faceting) and cut on the BOOSTED order.

BOOST_WEIGHTS = {"en": 0.5, "fr": 2.0, "de": 1.5}


BOOST_DEFAULT = 1.0


def bm25_boosted_topk(sf_dir: str) -> pd.DataFrame:
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(BM25_QUERIES), pa.int32()),
    })
    out = get_pool(idx).boosted_topk(q, "lang", BOOST_WEIGHTS, BOOST_DEFAULT)
    out = out.copy()
    out["boosted"] = out["boosted"].round(6)
    out = out.sort_values(["query_id", "boosted", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "boosted"]]


def _boosted_sql() -> str:
    base = _bm25_sql()
    cases = " ".join(
        f"WHEN d.lang = '{g}' THEN {w}" for g, w in BOOST_WEIGHTS.items()
    )
    # re-rank the scores CTE on the boosted product instead of raw score
    return base.replace(
        """ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= 10""",
        f"""boosted0 AS (
  SELECT s.query_id, s.doc_id,
         round(s.score * CASE {cases} ELSE {BOOST_DEFAULT} END, 6) AS boosted
  FROM scores s JOIN documents d USING (doc_id)),
ranked AS (
  SELECT query_id, doc_id, boosted,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY boosted DESC, doc_id) AS rank
  FROM boosted0)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, boosted
FROM ranked WHERE rank <= {BM25_K}""",
    )


# additive boost queries (edismax bq): final = bm25(q) + w * bm25(bq) for
# docs matching the mandatory main query; a doc matching only bq never
# matches (the main query is required in edismax's +(q) (bq) shape).
# qid 3's bq matches nothing — degenerates to the plain ranking. Weights
# are exactly-representable floats so both sides' float64 math agrees.
BQ_QUERIES = [
    (1, "join hash", "window order", 0.5),
    (2, "batch scan filter", "merge group", 0.75),
    (3, "the data stream", "qzqzqz", 1.0),
]


def bm25_bq_topk(sf_dir: str):
    """Additive boost-query BM25 (edismax ``bq``). Exact: the bq match set
    gets true base scores via shard-local whitelist rescoring (scores are
    filter-invariant), unmatched docs keep the base ranking, and the boost
    only ever RAISES bq-matched docs — so base top-(k+margin) ∪ bq-matched
    covers the final top-k. The bq side scores its full match set (the same
    documented boundary as boosted_topk/pf: a boost can promote any match)."""
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    pool = get_pool(idx)
    qids = [q for q, _, _, _ in BQ_QUERIES]
    kk = BM25_K + _RANK_MARGIN
    qt = pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "text": pa.array([t for _, t, _, _ in BQ_QUERIES], pa.string()),
        "k": pa.array([kk] * len(qids), pa.int32()),
    })
    base = pool.topk(qt).to_pandas()[["query_id", "doc_id", "score"]]
    bq_t = pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "text": pa.array([b for _, _, b, _ in BQ_QUERIES], pa.string()),
        "k": pa.array([1 << 30] * len(qids), pa.int32()),
    })
    bsc = pool.topk(bq_t).to_pandas()[["query_id", "doc_id", "score"]]
    bsc = bsc.rename(columns={"score": "bscore"})
    # true base scores for every bq-matched doc that also matches q
    frames = [base]
    for qid, text, _, _ in BQ_QUERIES:
        ids = bsc.loc[bsc["query_id"] == qid, "doc_id"].tolist()
        if not ids:
            continue
        q1 = pa.table({
            "query_id": pa.array([qid], pa.int64()),
            "text": pa.array([text], pa.string()),
            "k": pa.array([len(ids)], pa.int32()),
        })
        r = pool.topk(q1, where=pc.field("doc_id").isin(ids)).to_pandas()
        frames.append(r[["query_id", "doc_id", "score"]])
    allq = pd.concat(frames, ignore_index=True).drop_duplicates(
        ["query_id", "doc_id"], ignore_index=True
    )
    out = allq.merge(bsc, on=["query_id", "doc_id"], how="left")
    wmap = {q: w for q, _, _, w in BQ_QUERIES}
    out["score"] = (
        out["score"].to_numpy(np.float64)
        + out["query_id"].map(wmap).to_numpy(np.float64)
        * out["bscore"].fillna(0.0).to_numpy(np.float64)
    )
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _bq_sql() -> str:
    """bm25 SQL plus a second per-query scoring CTE over the bq terms,
    left-joined additively into the ranking."""
    base = _bm25_sql(queries=[(qid, t) for qid, t, _, _ in BQ_QUERIES])
    bq_vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, _, bt, _ in BQ_QUERIES
        for term in sorted(set(TOKEN_RE.findall(bt.lower())))
    )
    w_vals = ", ".join(f"({qid}, {w})" for qid, _, _, w in BQ_QUERIES)
    out = base.replace(
        "ranked AS (",
        f"""bq(query_id, term) AS (VALUES {bq_vals}),
bweight(query_id, w) AS (VALUES {w_vals}),
bscores AS (
  SELECT bq.query_id, tf.doc_id,
         sum( ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS score
  FROM bq
  JOIN tf ON tf.term = bq.term
  JOIN dfreq ON dfreq.term = bq.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY bq.query_id, tf.doc_id),
ranked AS (""",
    )
    return out.replace(
        """  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)""",
        """  SELECT s.query_id, s.doc_id,
         round(s.score + bw.w * coalesce(b.score, 0), 6) AS score,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY round(s.score + bw.w * coalesce(b.score, 0), 6)
                                     DESC, s.doc_id) AS rank
  FROM scores s
  JOIN bweight bw ON bw.query_id = s.query_id
  LEFT JOIN bscores b ON b.query_id = s.query_id AND b.doc_id = s.doc_id)""",
    )


# numeric function boost (Solr boost=recip(...)): boosted = score *
# (1000 / (1000 + n_chars)) — the "prefer shorter documents" analog of
# Virgo's recency recip boost. The constant is exactly representable, the
# expression is one IEEE divide on both sides, so float64 agrees bitwise.
_RECIP_A = 1000.0


def bm25_recip_boost_topk(sf_dir: str) -> pd.DataFrame:
    """Function-query boost with a NUMERIC meta column: the vectorized
    boost callable ships to the shard actors; scoring and the boosted
    per-shard heaps stay worker-local (same machinery as the categorical
    boost)."""
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(BM25_QUERIES), pa.int32()),
    })

    def recip(v: np.ndarray) -> np.ndarray:
        return _RECIP_A / (_RECIP_A + v.astype(np.float64))

    out = get_pool(idx).boosted_topk(q, "n_chars", recip)
    out = out.copy()
    out["boosted"] = out["boosted"].round(6)
    out = out.sort_values(["query_id", "boosted", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "boosted"]]


def _recip_boost_sql() -> str:
    base = _bm25_sql()
    return base.replace(
        """ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= 10""",
        f"""boosted0 AS (
  SELECT s.query_id, s.doc_id,
         round(s.score * ({_RECIP_A} / ({_RECIP_A} + CAST(d.n_chars AS DOUBLE))), 6)
           AS boosted
  FROM scores s JOIN documents d USING (doc_id)),
ranked AS (
  SELECT query_id, doc_id, boosted,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY boosted DESC, doc_id) AS rank
  FROM boosted0)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, boosted
FROM ranked WHERE rank <= {BM25_K}""",
    )


# --------------------------- spellcheck / did-you-mean ----------------------
#
# Solr SpellCheckComponent: vocabulary words are "correct" (no rows); missing
# words get top-5 corrections by (edit distance asc, df desc, term asc) from
# ONE distributed termstats scan. qid 4 is in-vocabulary, qid 5 hopeless.

SPELL_QUERIES = [
    (1, "hashs"),
    (2, "scann"),
    (3, "tabel"),
    (4, "join"),
    (5, "qzqzqzqz"),
]


SPELL_MAX_D = 2


SPELL_N = 5


def spellcheck_suggest(sf_dir: str) -> pd.DataFrame:
    from ...index.spellcheck import spellcheck

    idx = _build_docs_index(sf_dir)
    sug = spellcheck(
        idx, [w for _, w in SPELL_QUERIES],
        max_distance=SPELL_MAX_D, max_suggestions=SPELL_N,
    )
    qid = pd.DataFrame({
        "query_id": pd.Series([q for q, _ in SPELL_QUERIES], dtype=np.int64),
        "word": pd.Series([w for _, w in SPELL_QUERIES], dtype=object),
    })
    out = qid.merge(sug, on="word", how="inner")
    out = out.sort_values(["query_id", "rank"], ignore_index=True)
    return out[["query_id", "word", "rank", "suggestion", "dist", "df"]]


def _spellcheck_sql() -> str:
    vals = ", ".join(f"({qid}, '{w}')" for qid, w in SPELL_QUERIES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM toks WHERE term <> '' GROUP BY term),
pq(query_id, word) AS (VALUES {vals}),
missing AS (
  SELECT * FROM pq WHERE word NOT IN (SELECT term FROM dfreq)),
sugg AS (
  SELECT m.query_id, m.word, d.term AS suggestion,
         levenshtein(d.term, m.word) AS dist, d.df,
         row_number() OVER (PARTITION BY m.query_id, m.word
                            ORDER BY levenshtein(d.term, m.word),
                                     d.df DESC, d.term) AS rank
  FROM missing m JOIN dfreq d ON levenshtein(d.term, m.word) <= {SPELL_MAX_D})
SELECT CAST(query_id AS BIGINT) AS query_id, word,
       CAST(rank AS BIGINT) AS rank, suggestion,
       CAST(dist AS BIGINT) AS dist, CAST(df AS BIGINT) AS df
FROM sugg WHERE rank <= {SPELL_N}
ORDER BY query_id, rank
"""


FACET_QUERY = "join hash"


def facet_lang_conjunctive(sf_dir: str):
    """Boolean AND retrieval + facet counting (the Solr facet surface):
    language facet counts over docs containing ALL terms of the query —
    computed as per-shard partials inside the pool workers."""
    from ...index.query import facet_counts

    return facet_counts(_build_docs_index(sf_dir), "lang", text=FACET_QUERY, mode="and")


def facet_source_disjunctive(sf_dir: str):
    """OR-mode boolean retrieval + facet: source facet counts over docs
    containing ANY term of the query."""
    from ...index.query import facet_counts

    out = facet_counts(_build_docs_index(sf_dir), "source", text=FACET_QUERY, mode="or")
    return out.rename(columns={"source": "source_name"})


def _facet_or_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(FACET_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM q))
SELECT source AS source_name, CAST(count(*) AS BIGINT) AS n_docs
FROM matched JOIN documents USING (doc_id)
GROUP BY source ORDER BY source
"""


def _facet_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(FACET_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT doc_id FROM toks
  WHERE term IN (SELECT term FROM q)
  GROUP BY doc_id
  HAVING count(DISTINCT term) = (SELECT count(*) FROM q))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
FROM matched JOIN documents USING (doc_id)
GROUP BY lang ORDER BY lang
"""


# --------------------------- percolation (reverse search) -------------------
#
# The Elasticsearch percolator surface: a small stored-query registry matched
# against the document stream — (doc_id, query_id) rows for every document
# that contains a stored query's FULL conjunctive term set. One streaming
# map_batches pass (registry compiled once per actor); no shuffle.

PERCOLATE_QUERIES = [
    (0, "the data model"),
    (1, "stream processing"),
    (2, "join"),
    (3, "qzqzq nohitterm"),
    (4, "index scan cost"),
]


def percolate_matches(sf_dir: str) -> pd.DataFrame:
    from ..percolate import percolate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = percolate(ds, PERCOLATE_QUERIES).to_pandas()
    return out.sort_values(["doc_id", "query_id"], ignore_index=True)


def _percolate_sql() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, text in PERCOLATE_QUERIES
        for t in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
q(query_id, term) AS (VALUES {vals}),
need AS (
  SELECT query_id, count(*) AS n FROM q GROUP BY query_id),
hit AS (
  SELECT t.doc_id, q.query_id, count(DISTINCT t.term) AS have
  FROM tf t JOIN q ON t.term = q.term
  GROUP BY t.doc_id, q.query_id)
SELECT CAST(h.doc_id AS BIGINT) AS doc_id,
       CAST(h.query_id AS BIGINT) AS query_id
FROM hit h JOIN need USING (query_id)
WHERE h.have = need.n
ORDER BY doc_id, query_id
"""


# stemmed-field search (the Solr analysis-chain surface): a derived
# stemmed corpus (Porter-lite suffix filter, functions.tokenize.stem_token)
# feeds its OWN index; queries stem through the same filter. Recall widens
# ("tables" matches "table"); df/avgdl are the stemmed field's own.
def _stemmed_corpus(sf_dir: str) -> str:
    import hashlib as _hl

    from ...functions.tokenize import stem_text

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    out = f"/tmp/avr_stem_corpus_{tag}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out

    def stem_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "text": [stem_text(t) for t in df["text"]],
        })

    import shutil

    shutil.rmtree(out, ignore_errors=True)
    (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(stem_batch, batch_format="pandas")
        .write_parquet(out)
    )
    with open(done, "w") as f:
        f.write("ok")
    return out


def bm25_stemmed_topk(sf_dir: str) -> pd.DataFrame:
    from ...index.build import BuildConfig, build_index
    from ...functions.tokenize import stem_token

    corpus = _stemmed_corpus(sf_dir)
    idx = f"{corpus}_idx"
    cfg = BuildConfig(n_shards=4, n_buckets=8, text_col="text",
                      id_col="doc_id", meta_cols=())
    build_index(corpus, idx, cfg, resume=True)
    stemmed_queries = [
        (qid, " ".join(stem_token(t) for t in TOKEN_RE.findall(text.lower())))
        for qid, text in BM25_QUERIES
    ]
    return _ranked_topk(idx, queries=stemmed_queries)


def _stemmed_sql() -> str:
    from ...functions.tokenize import STEM_SQL_CASE, stem_token

    base = _bm25_sql()
    stem_case = STEM_SQL_CASE.format(t="t")
    stemmed_tok = f"list_transform({TOK_SQL}, t -> {stem_case})"
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in BM25_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    stemmed_vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in BM25_QUERIES
        for term in sorted({stem_token(t) for t in TOKEN_RE.findall(text.lower())})
    )
    return base.replace(
        f"unnest({TOK_SQL})", f"unnest({stemmed_tok})"
    ).replace(
        f"q(query_id, term) AS (VALUES {vals}),",
        f"q(query_id, term) AS (VALUES {stemmed_vals}),",
    )


# identifier-field search (the WordDelimiter analysis surface for code
# corpora): a derived corpus of camelCase COMPOUNDS feeds an index built
# through the identifier-split analyzer (functions.tokenize.
# ident_pretokenize_arrow). The oracle is the IDENTITY ROUND TRIP: pairing
# adjacent tokens into compounds and then splitting them back yields the
# original token multiset (tf/dl/df unchanged -> BM25 unchanged), so the
# entry must match plain-field BM25 over the original documents exactly —
# any drift in the splitter (dropped tails, wrong boundary, missed
# underscore) breaks the match.
IDENT_QUERIES = [(0, "key agg"), (1, "row scan slow"), (2, "the value")]


def _ident_corpus(sf_dir: str) -> str:
    """documents -> camel-paired compound corpus (tokens 2i, 2i+1 join as
    ``tok + Tok``; odd tail stays plain) — simulates a raw source-code
    field whose identifiers the analyzer must split back."""
    import hashlib as _hl
    import shutil

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    out = f"/tmp/avr_ident_corpus_{tag}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out

    def pair(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        paired = []
        for s in texts:
            toks = TOKEN_RE.findall(s.lower())
            comp = [
                toks[i] + toks[i + 1][0].upper() + toks[i + 1][1:]
                if i + 1 < len(toks) else toks[i]
                for i in range(0, len(toks), 2)
            ]
            paired.append(" ".join(comp))
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array(paired, pa.string()),
        })

    shutil.rmtree(out, ignore_errors=True)
    (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(pair, batch_format="pyarrow")
        .write_parquet(out)
    )
    with open(done, "w") as f:
        f.write("ok")
    return out


def bm25_ident_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 over the compound corpus THROUGH the production analyzer knob
    (``BuildConfig(analyzer="ident")`` — build-side Arrow rewrite, stats
    record, query-side auto-analysis), pinned by the identity-round-trip
    oracle: results must equal plain-field BM25 over the original
    documents."""
    from ...index.build import BuildConfig, build_index

    corpus = _ident_corpus(sf_dir)
    idx = f"{corpus}_idx"
    cfg = BuildConfig(n_shards=4, n_buckets=8, text_col="text",
                      id_col="doc_id", meta_cols=(), analyzer="ident")
    build_index(corpus, idx, cfg, resume=True)
    return _ranked_topk(idx, queries=IDENT_QUERIES)


# phrase percolation: stored exact-phrase alerts against the doc stream —
# conjunctive candidates ride the same matmul, needle-verified per batch
# (the two-phase phrase contract, inverted). One term alert rides along to
# exercise both paths through one entry.
PERCOLATE_PHRASE_TERM = [(0, "sort merge")]


PERCOLATE_PHRASES = [
    (10, "hash join"),
    (11, "merge sort"),
    (12, "join hash"),   # same tokens as 10, different order — must differ
    (13, "the data"),
]


def percolate_phrase_matches(sf_dir: str) -> pd.DataFrame:
    from ..percolate import percolate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = percolate(ds, PERCOLATE_PHRASE_TERM,
                    phrase_queries=PERCOLATE_PHRASES).to_pandas()
    return out.sort_values(["doc_id", "query_id"], ignore_index=True)


def _percolate_phrase_sql() -> str:
    from ...index.phrase import phrase_needle

    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, text in PERCOLATE_PHRASE_TERM
        for t in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    phrase_arms = "\n  UNION ALL ".join(
        f"SELECT doc_id, CAST({qid} AS BIGINT) AS query_id FROM docstr "
        f"WHERE s LIKE '%{phrase_needle(p)}%'"
        for qid, p in PERCOLATE_PHRASES
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
docstr AS (
  SELECT doc_id,
         ' ' || array_to_string({tok_nonempty}, ' ') || ' ' AS s
  FROM documents),
q(query_id, term) AS (VALUES {vals}),
need AS (SELECT query_id, count(*) AS n FROM q GROUP BY query_id),
hit AS (
  SELECT t.doc_id, q.query_id, count(DISTINCT t.term) AS have
  FROM tf t JOIN q ON t.term = q.term
  GROUP BY t.doc_id, q.query_id),
matched AS (
  SELECT h.doc_id, CAST(h.query_id AS BIGINT) AS query_id
  FROM hit h JOIN need USING (query_id) WHERE h.have = need.n
  UNION ALL
  {phrase_arms})
SELECT CAST(doc_id AS BIGINT) AS doc_id, query_id
FROM matched ORDER BY doc_id, query_id
"""


def bm25_topk_lang_en(sf_dir: str):
    """Filtered BM25 (the Solr filter-query surface): restrict results to
    lang='en' docs; scores unchanged (global df/avgdl). The predicate is
    evaluated shard-locally inside the pool workers."""
    import pyarrow.dataset as pads

    return _ranked_topk(_build_docs_index(sf_dir), where=(pads.field("lang") == "en"))


def _bm25_filtered_sql() -> str:
    base = _bm25_sql()
    # same scoring CTEs; only the ranking restricts to lang='en' docs
    return base.replace(
        "ranked AS (\n  SELECT query_id, doc_id, round(score, 6) AS score,",
        "ranked AS (\n  SELECT query_id, doc_id, round(score, 6) AS score,",
    ).replace(
        "FROM scores)",
        "FROM scores JOIN documents USING (doc_id) WHERE documents.lang = 'en')",
    )


# Solr numeric-range filter query (fq=n_chars:[150 TO 400]): same global
# scoring, the range predicate evaluated shard-locally against the index's
# doc-metadata table (n_chars rides in meta_cols) — no corpus re-read.
RANGE_FQ_LO, RANGE_FQ_HI = 150, 400


def bm25_range_topk(sf_dir: str):
    import pyarrow.dataset as pads

    return _ranked_topk(
        _build_docs_index(sf_dir),
        where=(pads.field("n_chars") >= RANGE_FQ_LO)
        & (pads.field("n_chars") <= RANGE_FQ_HI),
    )


def _bm25_range_sql() -> str:
    return _bm25_sql().replace(
        "FROM scores)",
        "FROM scores JOIN documents USING (doc_id) "
        f"WHERE documents.n_chars BETWEEN {RANGE_FQ_LO} AND {RANGE_FQ_HI})",
    )


def top_terms_per_lang(sf_dir: str):
    """Grouped top-k: 5 most frequent terms per language (tf desc, term asc)."""
    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for lang, sub in df.groupby("lang"):
            terms, _, tfs, _ = batch_term_doc_tf(
                sub["doc_id"].to_numpy(), sub["text"].to_numpy()
            )
            f = pd.DataFrame({"term": terms, "tf": tfs})
            f = f.groupby("term", as_index=False)["tf"].sum()
            f["lang"] = lang
            frames.append(f)
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"lang": [], "term": [], "tf": []}
        )

    from ...state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["lang", "term"], partial, {"tf": "sum"}).to_pandas()
    agg = agg.sort_values(["lang", "tf", "term"], ascending=[True, False, True],
                          kind="mergesort")
    out = agg.groupby("lang").head(5).reset_index(drop=True)
    out["rank"] = out.groupby("lang").cumcount() + 1
    return out[["lang", "rank", "term", "tf"]].astype({"rank": np.int64, "tf": np.int64})


SQL_TOP_TERMS_PER_LANG = f"""
WITH tf AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT lang, unnest({TOK_SQL}) AS term FROM documents)
  WHERE term <> '' GROUP BY lang, term),
ranked AS (
  SELECT lang, term, tf,
         row_number() OVER (PARTITION BY lang ORDER BY tf DESC, term) AS rank
  FROM tf)
SELECT lang, CAST(rank AS BIGINT) AS rank, term, tf FROM ranked WHERE rank <= 5
"""


def docbuilder_flagship(sf_dir: str):
    """M3 flagship doc builder over records synthesized deterministically
    from the documents table (rows-only: the nested-record transform isn't
    SQL-expressible)."""
    from ..docbuilder import DimTables, build_solr_docs

    ds = _docs(sf_dir)

    def to_records(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in df.to_dict("records"):
            i = int(r["doc_id"])
            rows.append(
                {
                    "uri": f"/repositories/3/resources/{i}",
                    "record_type": "resource",
                    "lock_version": i % 7,
                    "title": r["text"][:60],
                    "publish": True,
                    "suppressed": False,
                    "content_description": None,
                    "id_0": "MSS", "id_1": str(i), "id_2": None, "id_3": None,
                    "id_4": None, "id_5": None,
                    "processing_status": "completed" if i % 3 else "in_progress",
                    "repository_ref": "/repositories/3",
                    "subjects": None,
                    "linked_agents": None,
                    "extents": [{"number": str(i % 9 + 1), "extent_type": "cubic_feet",
                                 "container_summary": None}],
                    "dates": [{"expression": str(1900 + i % 120)}],
                    "notes": None,
                    "instances": [{"top_container_ref": f"/tc/{i % 5}",
                                   "digital_object_ref": None}],
                    "related_resources": None,
                }
            )
        return pd.DataFrame(rows)

    records = ds.map_batches(to_records, batch_format="pandas")
    dims = DimTables(
        repositories={"/repositories/3": "Albert and Shirley Small Special Collections Library"},
        subjects={}, agents={},
        containers={f"/tc/{j}": {"display_string": f"Box {j}", "barcode": None,
                                 "room": None, "current_location": "L",
                                 "uri": f"/repositories/3/top_containers/{j}"}
                    for j in range(5)},
        digital_objects={}, manifests={}, use_rights={},
        published_resource_uris=set(),
    )
    docs, _errors = build_solr_docs(records, dims, now_year=NOW_YEAR)
    return docs


# SQL reproduction of the M3 flagship over the synthesized records
# (ASpaceObject.java:226-495 semantics; see docbuilder.build_record_fields):
# field-emission order is encoded as explicit pos arithmetic. For these
# records: call number "MSS-{i}", shadowed iff i%3==0 (processing_status),
# year 1900+i%120 against the pinned NOW_YEAR=2026 (age 7..126, so the
# cumulative buckets are "More than 50" XOR ["Last 50"(, "Last 10")]), one
# container "Box {i%5}" with the AS:3C{j} synthesized barcode, no digital
# objects (static thumbnail branch).
SQL_DOCBUILDER_FLAGSHIP = """
WITH base AS (
  SELECT 'as:3r' || CAST(doc_id AS VARCHAR) AS did,
         substr(text, 1, 60) AS title,
         CAST(doc_id % 7 AS VARCHAR) AS ver,
         'MSS-' || CAST(doc_id AS VARCHAR) AS callnum,
         (doc_id % 3 = 0) AS shadowed,
         CAST(doc_id % 9 + 1 AS VARCHAR) || ' cubic feet' AS extent,
         CAST(1900 + doc_id % 120 AS VARCHAR) AS yr,
         126 - doc_id % 120 AS age,
         CAST(doc_id % 5 AS VARCHAR) AS box,
         'https://archives.lib.virginia.edu/repositories/3/resources/'
           || CAST(doc_id AS VARCHAR) AS online_url
  FROM documents),
b AS (SELECT *,
         CASE WHEN age <= 10 THEN 2 ELSE 1 END AS nb,
         CASE WHEN shadowed THEN 0 ELSE 6 + CASE WHEN age <= 10 THEN 2 ELSE 1 END END AS sh
      FROM base)
SELECT did AS doc_id, field, CAST(pos AS BIGINT) AS pos, value FROM (
  SELECT did, 'id' AS field, 0 AS pos, did AS value FROM b
  UNION ALL SELECT did, 'aspace_version_facet', 1, ver FROM b
  UNION ALL SELECT did, 'call_number_facet', 2, callnum FROM b
  UNION ALL SELECT did, 'main_title_display', 3, title FROM b
  UNION ALL SELECT did, 'title_text', 4, title FROM b
  UNION ALL SELECT did, 'source_facet', 5, 'ArchivesSpace' FROM b
  UNION ALL SELECT did, 'format_facet', 6, 'Manuscript/Archive' FROM b
  UNION ALL SELECT did, 'shadowed_location_facet', 7,
           CASE WHEN shadowed THEN 'HIDDEN' ELSE 'VISIBLE' END FROM b
  UNION ALL SELECT did, 'library_facet', 8, 'Special Collections'
           FROM b WHERE NOT shadowed
  UNION ALL SELECT did, 'extent_display', 9, extent FROM b WHERE NOT shadowed
  UNION ALL SELECT did, 'date_multisort_i', 10, yr FROM b WHERE NOT shadowed
  UNION ALL SELECT did, 'published_date_facet', 11,
           CASE WHEN age > 50 THEN 'More than 50 years ago'
                ELSE 'Last 50 years' END FROM b WHERE NOT shadowed
  UNION ALL SELECT did, 'published_date_facet', 12, 'Last 10 years'
           FROM b WHERE NOT shadowed AND age <= 10
  UNION ALL SELECT did, 'date_display', 11 + nb, yr FROM b WHERE NOT shadowed
  UNION ALL SELECT did, 'special_collections_holding_display', 12 + nb,
           '[{"library":"Special Collections","location":"STACKS",'
           || '"call_number":"' || callnum || ' Box ' || box
           || '","barcode":"AS:3C' || box
           || '","special_collections_location":"L"}]'
           FROM b WHERE NOT shadowed
  UNION ALL SELECT did, 'thumbnail_url_display', 13 + nb,
           'http://iiif.lib.virginia.edu/iiif/static:6/full/!115,125/0/default.jpg'
           FROM b WHERE NOT shadowed
  UNION ALL SELECT did, 'online_url_display', 8 + sh, online_url FROM b
  UNION ALL SELECT did, 'feature_facet', 9 + sh, 'suppress_endnote_export' FROM b
  UNION ALL SELECT did, 'feature_facet', 10 + sh, 'suppress_refworks_export' FROM b
  UNION ALL SELECT did, 'feature_facet', 11 + sh, 'suppress_ris_export' FROM b
)
"""


def marc_records_docs(sf_dir: str):
    """K3/K4 MARC circulation records synthesized from documents (rows-only)."""
    from ..marc import circulation_records_batch

    ds = _docs(sf_dir)

    def to_marc(df: pd.DataFrame) -> pd.DataFrame:
        src = pd.DataFrame(
            {
                "uri": ["/repositories/3/resources/" + str(int(d)) for d in df["doc_id"]],
                "title": [t[:60] for t in df["text"]],
                "call_number": ["MSS " + str(int(d)) for d in df["doc_id"]],
                "containers": [
                    [{"display_string": "Box 1", "barcode": None,
                      "uri": f"/repositories/3/top_containers/{int(d)}"}]
                    for d in df["doc_id"]
                ],
            }
        )
        out = circulation_records_batch(src)
        out["marc21_len"] = out["marc21"].map(len).astype(np.int64)
        return out[["uri", "f001", "f245_ind2", "f590_a", "marc21_len"]]

    return ds.map_batches(to_marc, batch_format="pandas")


# reproduces the K3 serializer arithmetic: short-id codec, non-filing
# indicator, and the full ISO 2709 byte length (leader + 4-entry directory +
# field payloads with terminators) of each synthesized circulation record
SQL_MARC_RECORDS = """
WITH base AS (
  SELECT doc_id,
         '/repositories/3/resources/' || CAST(doc_id AS VARCHAR) AS uri,
         'as:3r' || CAST(doc_id AS VARCHAR) AS f001,
         substr(text, 1, 60) AS title,
         'From ArchivesSpace: /repositories/3/resources/' || CAST(doc_id AS VARCHAR) AS f590_a,
         'MSS ' || CAST(doc_id AS VARCHAR) || ' Box 1' AS a949,
         'AS:3C' || CAST(doc_id AS VARCHAR) AS i949
  FROM documents)
SELECT uri, f001,
       CASE WHEN title LIKE 'The %' THEN '4'
            WHEN title LIKE 'A %' THEN '2' ELSE '0' END AS f245_ind2,
       f590_a,
       CAST( (24 + 12*4 + 1)
           + (strlen(f001) + 1)
           + (2 + 2 + strlen(title) + 1)
           + (2 + 2 + strlen(f590_a) + 1)
           + (2 + 2 + strlen(a949) + 2 + 20 + 2 + strlen(i949) + 1)
           + 1 AS BIGINT) AS marc21_len
FROM base
"""


def bm25_snippets(sf_dir: str):
    """Top-k with highlighted best-window snippets (the Solr highlighting
    surface). ORACLE-CHECKABLE: the best-window selection (max distinct
    terms, then max total hits, then earliest) and the marked-up text
    reconstruction are reproduced in SQL from token/separator runs."""
    from ...index.snippets import attach_snippets

    res = bm25_topk_docs(sf_dir)
    corpus = _docs(sf_dir)
    out = attach_snippets(res, corpus, dict(BM25_QUERIES))
    return out


def _snippets_sql(window: int = 20) -> str:
    """SQL reproduction of index.snippets.make_snippet over the bm25 top-k:
    token spans become (token-run, separator-run) lists — the separator
    AFTER token i is seps[i(+1 with a leading separator)] — the sliding
    window is scored per start with (distinct hits, total hits, earliest)
    and the snippet re-concatenates original-case tokens (query hits
    wrapped in **) with the separators BETWEEN window tokens, plus the
    engine's ellipsis rules (text before/after the window chars)."""
    qvals = ", ".join(f"({qid}, '{text}')" for qid, text in BM25_QUERIES)
    w = window
    return f"""
WITH res AS ({_bm25_sql()}),
qmap(query_id, qtext) AS (VALUES {qvals}),
qterms AS (
  SELECT query_id,
         list_distinct(list_filter(
           string_split_regex(lower(qtext), '[^a-z0-9_]+'), x -> x <> '')) AS qt
  FROM qmap),
dtx AS (
  SELECT d.doc_id, d.text,
         regexp_extract_all(d.text, '[A-Za-z0-9_]+') AS toks,
         regexp_extract_all(d.text, '[^A-Za-z0-9_]+') AS seps,
         regexp_matches(d.text, '^[^A-Za-z0-9_]') AS lead_sep,
         regexp_matches(d.text, '[^A-Za-z0-9_]$') AS trail_sep
  FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM res)),
win AS (
  SELECT r.query_id, r.doc_id, qt, toks, seps, lead_sep, trail_sep, text,
         list_transform(toks, x -> lower(x)) AS lowtoks,
         len(toks) AS n, least({w}, len(toks)) AS w
  FROM (SELECT DISTINCT query_id, doc_id FROM res) r
  JOIN dtx USING (doc_id) JOIN qterms USING (query_id)),
starts AS (
  SELECT query_id, doc_id, unnest(range(1, n - w + 2)) AS s,
         n, w, qt, lowtoks
  FROM win WHERE n > 0),
scored AS (
  SELECT query_id, doc_id, s,
         len(list_distinct(list_filter(list_slice(lowtoks, s, s + w - 1),
             x -> list_contains(qt, x)))) AS dh,
         len(list_filter(list_slice(lowtoks, s, s + w - 1),
             x -> list_contains(qt, x))) AS th
  FROM starts),
best AS (
  SELECT query_id, doc_id, s FROM (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id, doc_id
                              ORDER BY dh DESC, th DESC, s ASC) AS rn
    FROM scored) WHERE rn = 1),
snip AS (
  SELECT v.query_id, v.doc_id,
    CASE WHEN v.n = 0 THEN substr(v.text, 1, {w * 8})
    ELSE
      (CASE WHEN b.s > 1 OR v.lead_sep THEN '… ' ELSE '' END)
      || array_to_string(list_transform(range(b.s, b.s + v.w), i ->
           (CASE WHEN list_contains(v.qt, v.lowtoks[i])
                 THEN '**' || v.toks[i] || '**' ELSE v.toks[i] END)
           || (CASE WHEN i < b.s + v.w - 1
                    THEN v.seps[i + CASE WHEN v.lead_sep THEN 1 ELSE 0 END]
                    ELSE '' END)), '')
      || (CASE WHEN b.s + v.w - 1 < v.n OR v.trail_sep THEN ' …' ELSE '' END)
    END AS snippet
  FROM win v LEFT JOIN best b
    ON b.query_id = v.query_id AND b.doc_id = v.doc_id)
SELECT res.query_id, res.rank, res.doc_id, res.score, snip.snippet
FROM res JOIN snip ON snip.query_id = res.query_id AND snip.doc_id = res.doc_id
"""


INC_QUERIES = [(0, "the data"), (1, "model training"), (2, "user analysis")]


def incremental_update_demo(sf_dir: str):
    """Incremental index lifecycle over the documents table: build on the
    first 80%, add the rest as a delta generation, merge with the actor
    pool, then query. ORACLE: after the merge the engine must be exactly
    the BM25 SQL over the UNION corpus (= the whole documents table)."""
    import shutil

    from ...index.build import BuildConfig, build_index
    from ...index.update import add_documents, merge_segments

    src = os.path.join(sf_dir, "documents.parquet")
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    n = t.num_rows
    split = (n * 4) // 5
    work = _index_dir_for(sf_dir) + "_inc"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    pq.write_table(t.slice(0, split), os.path.join(work, "base.parquet"))
    pq.write_table(t.slice(split), os.path.join(work, "delta.parquet"))
    cfg = BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                      meta_cols=("lang", "source"))
    idx = os.path.join(work, "idx")
    build_index(os.path.join(work, "base.parquet"), idx, cfg, resume=False)
    add_documents(os.path.join(work, "delta.parquet"), idx, cfg)
    merge_segments(idx, concurrency=2)
    return _ranked_topk(idx, INC_QUERIES)


def realtime_get_updated(sf_dir: str):
    """Solr /get (realtime get) lifecycle: build an index over the documents
    table, atomically update_fields lang='xx' on the 3 lowest doc ids,
    delete the 4th lowest, then RTG the 10 lowest — the get must reflect
    the update and the delete with NO merge or reopen. ORACLE: the same
    overlay as CASE/anti-join SQL over the raw table."""
    import shutil

    from ...index.build import BuildConfig, build_index
    from ...index.update import delete_documents, realtime_get, update_fields

    src = os.path.join(sf_dir, "documents.parquet")
    import pyarrow.parquet as pq

    ids = np.sort(
        pq.read_table(src, columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )[:10]
    work = _index_dir_for(sf_dir) + "_rtg"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cfg = BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                      meta_cols=("lang", "source"))
    idx = os.path.join(work, "idx")
    build_index(src, idx, cfg, resume=False)
    update_fields(idx, pd.DataFrame({"doc_id": ids[:3], "lang": ["xx"] * 3}))
    delete_documents(idx, [int(ids[3])])
    out = realtime_get(idx, ids, columns=["lang", "source"])
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)


SQL_REALTIME_GET = """
WITH tgt AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 10))
SELECT d.doc_id,
       CASE WHEN t.rn <= 3 THEN 'xx' ELSE d.lang END AS lang,
       d.source
FROM documents d JOIN tgt t ON t.doc_id = d.doc_id
WHERE t.rn <> 4
ORDER BY d.doc_id
"""


def fieldmap_project_docs(sf_dir: str):
    """M18 field-map over a long table derived from documents."""
    from ..fieldmap import aspace_field_map, field_map_dataset

    ds = _docs(sf_dir)

    def to_long(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ids = df["doc_id"].astype(str).to_numpy()
        lib = np.where(df["doc_id"] % 3 == 0, "Special Collections", "Law School")
        titles = df["text"].str.slice(0, 40).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": np.tile(ids, 4),
                "field": np.repeat(["id", "title_text", "library_facet", "unmapped_junk"], n),
                "pos": np.zeros(4 * n, dtype=np.int64),
                "value": np.concatenate([ids, titles, lib, df["source"].to_numpy()]),
            }
        )

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    long_ds = ds.map_batches(to_long, batch_format="pandas")
    return field_map_dataset(
        long_ds, aspace_field_map(), "2026-01-01T00:00:00Z", n_docs_hint=n_docs
    )


# the rename/special/drop-unmapped policy (aspace-solr-v3-to-v4.xsl:5-25) over
# the synthesized long table, plus the per-doc constant headers (no driver
# fields present -> the empty-doc_fields header branch)
SQL_FIELDMAP_PROJECT = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS did,
         substr(text, 1, 40) AS title,
         CASE WHEN doc_id % 3 = 0 THEN 'Special Collections' ELSE 'Law School' END AS lib
  FROM documents)
SELECT did AS doc_id, 'id' AS field, CAST(0 AS BIGINT) AS pos, did AS value FROM base
UNION ALL SELECT did, 'full_title_tsearchf_stored', 0, title FROM base
UNION ALL SELECT did, 'library_f_stored', 0, lib FROM base
UNION ALL SELECT did, 'source_f_stored', 0, lib FROM base WHERE lib = 'Special Collections'
UNION ALL SELECT did, 'pool_f', 0, 'archival' FROM base
UNION ALL SELECT did, 'circulating_f', 0, 'false' FROM base
UNION ALL SELECT did, 'record_date_stored', 0, '2026-01-01T00:00:00Z' FROM base
UNION ALL SELECT did, 'uva_availability_f_stored', 0, 'On shelf' FROM base
UNION ALL SELECT did, 'anon_availability_f_stored', 0, 'On shelf' FROM base
"""


def fieldmap_avalon_docs(sf_dir: str):
    """M19 avalon field map (avalon-solr-v3-to-v4.xsl:6-57) over a long table
    derived from documents — exercises the role-suffix renames, the catch-all
    ``avalon_tsearch`` policy (the OPPOSITE drop policy of aspace), the
    ``year_multisort_i`` special, and the audio/video header branches
    (pool_f / url_label / work_title*_key_ssort)."""
    from ..fieldmap import avalon_field_map, field_map_dataset

    ds = _docs(sf_dir)

    def to_long(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        i = df["doc_id"].to_numpy(np.int64)
        ids = df["doc_id"].astype(str).to_numpy()
        solr = np.char.add("avalon:", ids.astype(str))
        title = df["text"].str.slice(0, 30).to_numpy()
        actor = np.char.add("Actor ", (i % 7).astype(str))
        year = (1900 + i % 120).astype(str)
        fmt = np.where(i % 2 == 0, "Streaming Audio", "Online Video")
        tsort = np.char.add("Title ", (i % 50).astype(str))
        auth = np.char.add("Author ", (i % 13).astype(str))
        fields = [
            "id", "title_display", "act_display", "year_multisort_i",
            "mystery_field", "format_facet", "title_sort_facet", "author_facet",
        ]
        return pd.DataFrame(
            {
                "doc_id": np.tile(ids, len(fields)),
                "field": np.repeat(fields, n),
                "pos": np.zeros(len(fields) * n, dtype=np.int64),
                "value": np.concatenate(
                    [solr, title, actor, year, df["source"].to_numpy(),
                     fmt, tsort, auth]
                ),
            }
        )

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    long_ds = ds.map_batches(to_long, batch_format="pandas")
    return field_map_dataset(
        long_ds, avalon_field_map(), "2026-01-01T00:00:00Z", n_docs_hint=n_docs
    )


# the avalon rename/suffix/catch-all policy + constant and branch headers.
# title_sort_facet / author_facet are header DRIVERS but have no rename row,
# so under the catch-all policy they also surface as avalon_tsearch rows.
SQL_FIELDMAP_AVALON = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS did,
         doc_id AS i,
         substr(text, 1, 30) AS title,
         source,
         'Actor ' || CAST(doc_id % 7 AS VARCHAR) AS actor,
         CAST(1900 + doc_id % 120 AS VARCHAR) AS yr,
         CASE WHEN doc_id % 2 = 0 THEN 'Streaming Audio'
              ELSE 'Online Video' END AS fmt,
         'Title ' || CAST(doc_id % 50 AS VARCHAR) AS tsort,
         'Author ' || CAST(doc_id % 13 AS VARCHAR) AS auth
  FROM documents)
SELECT did AS doc_id, 'id' AS field, CAST(0 AS BIGINT) AS pos,
       'avalon:' || did AS value FROM base
UNION ALL SELECT did, 'title_tsearch_stored', 0, title FROM base
UNION ALL SELECT did, 'author_tsearchf_stored', 0, actor || ' (actor)' FROM base
UNION ALL SELECT did, 'published_date', 0, yr || '-01-01T00:00:00Z' FROM base
UNION ALL SELECT did, 'avalon_tsearch', 0, source FROM base
UNION ALL SELECT did, 'format_f_stored', 0, fmt FROM base
UNION ALL SELECT did, 'avalon_tsearch', 0, tsort FROM base
UNION ALL SELECT did, 'avalon_tsearch', 0, auth FROM base
UNION ALL SELECT did, 'circulating_f', 0, 'true' FROM base
UNION ALL SELECT did, 'source_f_stored', 0, 'Avalon' FROM base
UNION ALL SELECT did, 'source_f_stored', 0, 'UVA Library Digital Repository' FROM base
UNION ALL SELECT did, 'uva_availability_f_stored', 0, 'Online' FROM base
UNION ALL SELECT did, 'anon_availability_f_stored', 0, 'Online' FROM base
UNION ALL SELECT did, 'record_date_stored', 0, '2026-01-01T00:00:00Z' FROM base
UNION ALL SELECT did, 'url_str_stored', 0,
  'https://avalon.lib.virginia.edu/media_objects/avalon:' || did FROM base
UNION ALL SELECT did, 'data_source_str_stored', 0, 'avalon' FROM base
UNION ALL SELECT did, 'url_label_str_stored', 0,
  CASE WHEN i % 2 = 0 THEN 'Listen Online' ELSE 'Watch Online' END FROM base
UNION ALL SELECT did, 'pool_f', 0,
  CASE WHEN i % 2 = 0 THEN 'music_recordings' ELSE 'video' END FROM base
UNION ALL SELECT did, 'work_title3_key_ssort', 0,
  replace(tsort, ' ', '_') || '//'
    || CASE WHEN i % 2 = 0 THEN 'MusicRecording' ELSE 'video' END FROM base
UNION ALL SELECT did, 'work_title2_key_ssort', 0,
  replace(tsort, ' ', '_') || '/' || replace(auth, ' ', '_') || '/'
    || CASE WHEN i % 2 = 0 THEN 'MusicRecording' ELSE 'video' END FROM base
UNION ALL SELECT did, 'uva_availability_f_stored', 0, 'On shelf' FROM base
UNION ALL SELECT did, 'anon_availability_f_stored', 0, 'On shelf' FROM base
"""


def h264_keyframe_index(sf_dir: str):
    """H.264 Annex-B structure indexing (functions/h264.py): NAL
    segmentation + real SPS Exp-Golomb parse (profile/level/crop-corrected
    dimensions) + IDR keyframe seek index, as an actor-pool stage over the
    deterministic skeleton corpus. ORACLE-CHECKABLE the same way the video
    entry is: the oracle recomputes every expected field from the corpus
    RECIPE (generation params + encoder piece lengths) without ever calling
    the parser under test, so the hash compare verifies start-code
    scanning, type classification, SPS arithmetic and offsets end-to-end.
    Pixel decode stays behind RealDecodeUnavailable — honestly."""
    from ..multimodal import index_h264_streams, synthesize_h264_table

    tbl = synthesize_h264_table(48)
    out = index_h264_streams(
        ray.data.from_arrow(tbl), concurrency=2, batch_size=16
    ).to_pandas()
    return out.sort_values("item_id", ignore_index=True)


def _h264_sql(n: int = 48, seed: int = 11) -> str:
    """Fixture oracle for h264_keyframe_index: replay the seeded param
    recipe (same arithmetic as multimodal.synthesize_h264_table), compute
    expected NAL counts and the first-IDR byte offset from the encoder
    piece lengths, and inline expected rows as a VALUES table. The PARSER
    under test is never invoked here."""
    import hashlib as _hl

    from ...functions.h264 import encode_annexb_skeleton, write_sps

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(8, 64)) * 2
        h = int(rng.integers(8, 48)) * 2
        k = int(rng.integers(1, 6))
        inter = int(rng.integers(0, 4))
        profile = 100 if rng.integers(0, 2) else 66
        payload = encode_annexb_skeleton(w, h, k, inter, profile)
        sha = _hl.sha256(payload).hexdigest()
        n_nals = 2 + k * (1 + inter)
        # stream layout: sc + SPS, sc + PPS(2 bytes), then the first IDR's
        # start code begins right after
        first_kf = 4 + len(write_sps(w, h, profile)) + 4 + 2
        rows.append(
            f"({i}, {profile}, 30, {w}, {h}, {n_nals}, {k}, {first_kf}, "
            f"'{sha}')")
    cols = ("item_id, profile_idc, level_idc, width, height, n_nal_units, "
            "n_keyframes, first_kf_offset, payload_sha256")
    return f"SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols})"


# --------------------------- range facet + field sort -----------------------
#
# facet.range (Solr): bucket counts of a numeric field over the match set.
# sort=<field> desc (Solr): top-k of the match set by a doc field, not by
# score — per-batch partial top-k, k x n_batches rows merged on the driver.
# Both reuse the broadcast match-id set of the stats component.

RANGE_GAP = 200  # facet.range.gap on n_chars


FIELD_SORT_K = 10


def facet_range_chars(sf_dir: str) -> pd.DataFrame:
    """facet.range on n_chars (gap RANGE_GAP) over the OR match set."""
    from ...state.aggregates import tree_aggregate

    ds = _matched_docs_ds(sf_dir, ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lo = (df["n_chars"].to_numpy(np.int64) // RANGE_GAP) * RANGE_GAP
        return (
            pd.DataFrame({"bucket_lo": lo, "n_docs": np.int64(1)})
            .groupby("bucket_lo", as_index=False)["n_docs"].sum()
        )

    out = tree_aggregate(
        ds, ["bucket_lo"], partial, {"n_docs": "sum"}
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("bucket_lo", ignore_index=True)


def _facet_range_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(STATS_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM q))
SELECT (d.n_chars // {RANGE_GAP}) * {RANGE_GAP} AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs
FROM matched m JOIN documents d USING (doc_id)
GROUP BY bucket_lo ORDER BY bucket_lo
"""


# Solr facet.interval: arbitrary, possibly OVERLAPPING intervals with mixed
# open/closed bounds — each matched doc counts in EVERY interval containing
# it (unlike facet.range's disjoint gap buckets). (name, lo, hi, lo_incl,
# hi_incl); None = unbounded (Solr '*').
_FACET_INTERVALS = (
    ("upto299", None, 300, False, False),     # [*,300)
    ("mid150to450", 150, 450, True, True),    # [150,450]
    ("over400", 400, None, False, False),     # (400,*]
)


def facet_interval_counts(sf_dir: str) -> pd.DataFrame:
    """facet.interval on n_chars over the OR match set: per-batch interval
    membership counts (a doc can hit several intervals) tree-summed into a
    facet-config-sized table; zero-hit intervals report 0 like Solr."""
    from ...state.aggregates import tree_aggregate

    ds = _matched_docs_ds(sf_dir, ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["n_chars"].to_numpy(np.int64)
        rows = []
        for name, lo, hi, loi, hii in _FACET_INTERVALS:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= (v >= lo) if loi else (v > lo)
            if hi is not None:
                m &= (v <= hi) if hii else (v < hi)
            rows.append((name, np.int64(m.sum())))
        return pd.DataFrame(rows, columns=["facet_interval", "n_docs"])

    out = tree_aggregate(
        ds, ["facet_interval"], partial, {"n_docs": "sum"}
    ).to_pandas()
    out = out.set_index("facet_interval").reindex(
        [n for n, *_ in _FACET_INTERVALS], fill_value=0
    ).reset_index()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("facet_interval", ignore_index=True)


def _facet_interval_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(STATS_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    selects = []
    for name, lo, hi, loi, hii in _FACET_INTERVALS:
        preds = []
        if lo is not None:
            preds.append(f"n_chars >{'=' if loi else ''} {lo}")
        if hi is not None:
            preds.append(f"n_chars <{'=' if hii else ''} {hi}")
        where = " AND ".join(preds) if preds else "TRUE"
        selects.append(
            f"SELECT '{name}' AS facet_interval, "
            f"CAST(count(*) FILTER (WHERE {where}) AS BIGINT) AS n_docs FROM vals"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM q)),
vals AS (
  SELECT d.n_chars FROM matched m JOIN documents d USING (doc_id))
SELECT * FROM ({body}) ORDER BY facet_interval
"""


def facet_pivot_lang_source(sf_dir: str) -> pd.DataFrame:
    """facet.pivot=lang,source over the OR match set: two-level counts —
    the same streaming tree aggregation as the flat facet, keyed by both
    levels at once (one pass; the hierarchy is presentation, not execution)."""
    from ...state.aggregates import tree_aggregate

    ds = _matched_docs_ds(sf_dir, ["doc_id", "lang", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.assign(n_docs=np.int64(1))
            .groupby(["lang", "source"], as_index=False, dropna=False)["n_docs"]
            .sum()
        )

    out = tree_aggregate(
        ds, ["lang", "source"], partial, {"n_docs": "sum"}
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.rename(columns={"source": "source_name"}).sort_values(
        ["lang", "source_name"], ignore_index=True
    )


def _facet_pivot_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(STATS_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM q))
SELECT d.lang, d.source AS source_name, CAST(count(*) AS BIGINT) AS n_docs
FROM matched m JOIN documents d USING (doc_id)
GROUP BY d.lang, d.source ORDER BY d.lang, d.source
"""


def facet_nested_stats(sf_dir: str) -> pd.DataFrame:
    """Solr JSON Facet API nested shape (``json.facet`` buckets with
    sub-aggregations): per source bucket → doc count, avg chars, and the
    top-1 lang subfacet with its count. ONE distributed pass keyed by
    (source, lang) — the nesting is presentation; the driver folds the
    vocab-sized (source, lang) table (bucket-cardinality-bounded, never
    corpus-sized)."""
    from ...state.aggregates import tree_aggregate

    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False, dropna=False).agg(
            n=("doc_id", "size"), chars=("n_chars", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        g["chars"] = g["chars"].astype(np.int64)
        return g

    sl = tree_aggregate(
        ds, ["source", "lang"], partial, {"n": "sum", "chars": "sum"}
    ).to_pandas()
    per_src = sl.groupby("source", as_index=False).agg(
        count=("n", "sum"), chars=("chars", "sum")
    )
    per_src["avg_chars"] = (
        per_src["chars"].to_numpy(np.float64)
        / per_src["count"].to_numpy(np.float64)
    ).round(6)
    top = sl.sort_values(["source", "n", "lang"],
                         ascending=[True, False, True], kind="mergesort")
    top = top.drop_duplicates("source", keep="first")[["source", "lang", "n"]]
    top = top.rename(columns={"lang": "top_lang", "n": "top_lang_n"})
    out = per_src.merge(top, on="source")
    out["count"] = out["count"].astype(np.int64)
    out["top_lang_n"] = out["top_lang_n"].astype(np.int64)
    return out[["source", "count", "avg_chars", "top_lang", "top_lang_n"]] \
        .sort_values("source", ignore_index=True)


SQL_FACET_NESTED = """
WITH sl AS (
  SELECT source, lang, count(*) AS n, sum(n_chars) AS chars
  FROM documents GROUP BY source, lang),
s AS (
  SELECT source, sum(n) AS cnt,
         round(CAST(sum(chars) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
           AS avg_chars
  FROM sl GROUP BY source),
top AS (
  SELECT source, lang AS top_lang, n AS top_lang_n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, lang) AS rn
  FROM sl)
SELECT s.source, CAST(s.cnt AS BIGINT) AS count, s.avg_chars,
       top.top_lang, CAST(top.top_lang_n AS BIGINT) AS top_lang_n
FROM s JOIN top USING (source) WHERE top.rn = 1
ORDER BY s.source
"""


# significant terms (Elasticsearch significant_terms): vocabulary unusually
# frequent in the match set vs the corpus background. lift =
# (fg_df * bg_docs) / (bg_df * fg_docs) — integer products exact in int64,
# ONE double division, rounded 6 dp on both sides. min fg_df and top-N by
# (lift desc, term asc) keep the output stable.
SIGTERMS_MIN_FG = 3


SIGTERMS_N = 20


def significant_terms(sf_dir: str) -> pd.DataFrame:
    """Foreground df via one distinct-(doc,term) pass over the matched docs
    (tree-aggregated); background df comes straight from the index's SEALED
    TERMSTATS (the corpus-wide per-term document frequency the build
    already paid for) — re-tokenizing the whole corpus for bg would double
    the entry's cost for identical values. The fg/bg join is
    candidate-sliced (fg vocabulary only)."""
    from ...index.build import termstats_dir
    from ...state.aggregates import tree_aggregate

    idx0 = _build_docs_index(sf_dir)

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df["text"]:
            rows.append(sorted(set(TOKEN_RE.findall(t.lower()))))
        flat = [w for r in rows for w in r]
        return (
            pd.DataFrame({"term": pd.Series(flat, dtype=object),
                          "df": np.int64(1)})
            .groupby("term", as_index=False)["df"].sum()
        )

    ds_fg = _matched_docs_ds(sf_dir, ["doc_id", "text"])
    fg = tree_aggregate(ds_fg, ["term"], df_partial, {"df": "sum"}).to_pandas()
    fg = fg.rename(columns={"df": "fg_df"})
    fg = fg[fg["fg_df"] >= SIGTERMS_MIN_FG].copy()

    # bg df comes from the sealed termstats, but NEVER materialize the whole
    # vocabulary on the driver (the code-corpus target is 10^9+ terms): push
    # a semi-join against the (already computed, min-df-pruned) fg vocabulary
    # down into the Dataset, so only fg-sized rows reach to_pandas().
    fg_terms_ref = ray.put(fg["term"].to_numpy(dtype=object))

    def _bg_semijoin(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        vs = pa.array(ray.get(fg_terms_ref), type=pa.string())
        return t.filter(pc.is_in(t.column("term"), value_set=vs))

    bg = (
        ray.data.read_parquet(termstats_dir(idx0), columns=["term", "df"])
        .map_batches(_bg_semijoin, batch_format="pyarrow")
        .to_pandas()
        .rename(columns={"df": "bg_df"})
    )

    from ...index.query import matching_doc_ids

    idx = _build_docs_index(sf_dir)
    fg_docs = int(len(matching_doc_ids(idx, STATS_QUERY, mode="or")))
    bg_docs = int(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).count()
    )

    m = fg.merge(bg, on="term", how="inner")
    num = m["fg_df"].to_numpy(np.int64) * np.int64(bg_docs)
    den = m["bg_df"].to_numpy(np.int64) * np.int64(fg_docs)
    m["lift"] = np.round(num.astype(np.float64) / den.astype(np.float64), 6)
    m = m.sort_values(["lift", "term"], ascending=[False, True],
                      kind="mergesort", ignore_index=True).head(SIGTERMS_N)
    m = m.reset_index(drop=True)
    m.insert(0, "rank", np.arange(1, len(m) + 1, dtype=np.int64))
    m["fg_df"] = m["fg_df"].astype(np.int64)
    m["bg_df"] = m["bg_df"].astype(np.int64)
    return m[["rank", "term", "fg_df", "bg_df", "lift"]]


def _sigterms_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(STATS_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
dt AS (
  SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM dt WHERE term IN (SELECT term FROM q)),
fg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS fg_df
  FROM dt WHERE doc_id IN (SELECT doc_id FROM matched) GROUP BY term),
bg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS bg_df FROM dt GROUP BY term),
sizes AS (
  SELECT (SELECT count(*) FROM matched) AS fg_docs,
         (SELECT count(*) FROM documents) AS bg_docs),
lifted AS (
  SELECT fg.term, fg.fg_df, bg.bg_df,
         round(CAST(fg.fg_df * s.bg_docs AS DOUBLE)
               / CAST(bg.bg_df * s.fg_docs AS DOUBLE), 6) AS lift
  FROM fg JOIN bg USING (term) CROSS JOIN sizes s
  WHERE fg.fg_df >= {SIGTERMS_MIN_FG})
SELECT CAST(row_number() OVER (ORDER BY lift DESC, term) AS BIGINT) AS rank,
       term, fg_df, bg_df, lift
FROM lifted
ORDER BY lift DESC, term
LIMIT {SIGTERMS_N}
"""


def sort_by_field_topk(sf_dir: str) -> pd.DataFrame:
    """Solr sort=n_chars desc, doc_id asc tie — top-k of the match set."""
    ds = _matched_docs_ds(sf_dir, ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(FIELD_SORT_K)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                            kind="mergesort", ignore_index=True).head(FIELD_SORT_K)
    out = out.reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", "doc_id", "n_chars"]]


def _sort_by_field_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(STATS_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM q))
SELECT CAST(row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id) AS BIGINT)
         AS rank,
       d.doc_id, d.n_chars
FROM matched m JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, d.doc_id
LIMIT {FIELD_SORT_K}
"""


# Solr expand component ({!collapse}&expand=true&expand.rows=N): alongside
# the collapsed page (one winner per group), return each paged group's next
# N members. ONE grouped_topk call serves both — per-group candidates carry
# the rounded-tie margin past the (1 + EXPAND_ROWS) boundary; the head rank
# is the collapse entry's exact global contract.
EXPAND_ROWS = 2


def bm25_expand_topk(sf_dir: str) -> pd.DataFrame:
    from ...index.query import get_pool

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array([1 + EXPAND_ROWS + _RANK_MARGIN] * len(BM25_QUERIES),
                      pa.int32()),
    })
    out = get_pool(idx).grouped_topk(q, "source")
    out = out.copy()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "source", "score", "doc_id"],
                          ascending=[True, True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rn"] = (out.groupby(["query_id", "source"]).cumcount() + 1)
    heads = out[out["rn"] == 1].copy()
    heads = heads.sort_values(["query_id", "score", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort", ignore_index=True)
    heads["rank"] = (heads.groupby("query_id").cumcount() + 1).astype(np.int64)
    heads = heads[heads["rank"] <= BM25_K]
    members = out[(out["rn"] >= 2) & (out["rn"] <= 1 + EXPAND_ROWS)].copy()
    members["exp_rank"] = (members["rn"] - 1).astype(np.int64)
    exp = members.merge(heads[["query_id", "source", "rank"]],
                        on=["query_id", "source"], how="inner")
    exp = exp.sort_values(["query_id", "rank", "exp_rank"], ignore_index=True)
    exp["rank"] = exp["rank"].astype(np.int64)
    return exp[["query_id", "rank", "source", "exp_rank", "doc_id", "score"]]


def _expand_sql() -> str:
    base = _bm25_sql()
    old_tail = """ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= 10
"""
    new_tail = f"""collapsed AS (
  SELECT s.query_id, d.source, s.doc_id, round(s.score, 6) AS score,
         row_number() OVER (PARTITION BY s.query_id, d.source
                            ORDER BY round(s.score, 6) DESC, s.doc_id) AS rn
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id),
heads AS (
  SELECT query_id, source,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM collapsed WHERE rn = 1)
SELECT CAST(c.query_id AS BIGINT) AS query_id, CAST(h.rank AS BIGINT) AS rank,
       c.source, CAST(c.rn - 1 AS BIGINT) AS exp_rank, c.doc_id, c.score
FROM collapsed c
JOIN heads h ON h.query_id = c.query_id AND h.source = c.source
WHERE h.rank <= {BM25_K} AND c.rn BETWEEN 2 AND {1 + EXPAND_ROWS}
ORDER BY c.query_id, h.rank, c.rn
"""
    assert old_tail in base
    return base.replace(old_tail, new_tail)


# ES rare_terms aggregation: the long-tail complement of the terms facet —
# here over adjacent-token BIGRAMS (the synthetic corpus' unigram vocab is
# saturated: min unigram df is ~5% of docs, so the unigram variant is
# degenerate; bigrams have a real df=1 tail). df = distinct docs containing
# the bigram, at most RARE_MAX_DF, df ascending. The df partial is exact
# (distinct (bigram, doc) pairs never repeat across batches because a doc
# lives in one row); the HAVING cut happens after the tree merge, on the
# dictionary-sized df table.
RARE_MAX_DF = 4


RARE_LIMIT = 100


def rare_terms(sf_dir: str) -> pd.DataFrame:
    from ...functions.tokenize import tokenize_text

    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dfs: dict[str, int] = {}
        for t in df["text"]:
            toks = tokenize_text(t)
            for g in {a + " " + b for a, b in zip(toks, toks[1:])}:
                dfs[g] = dfs.get(g, 0) + 1
        return pd.DataFrame({
            "bigram": list(dfs.keys()),
            "df": pd.Series(list(dfs.values()), dtype=np.int64),
        })

    from ...state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["bigram"], partial, {"df": "sum"}).to_pandas()
    agg = agg[agg["df"] <= RARE_MAX_DF]
    agg = agg.sort_values(["df", "bigram"], ascending=[True, True],
                          kind="mergesort").head(RARE_LIMIT)
    agg["df"] = agg["df"].astype(np.int64)
    return agg.reset_index(drop=True)[["bigram", "df"]]


SQL_RARE_TERMS = f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
bg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2)
SELECT bigram, CAST(count(*) AS BIGINT) AS df
FROM bg GROUP BY bigram HAVING count(*) <= {RARE_MAX_DF}
ORDER BY df, bigram LIMIT {RARE_LIMIT}
"""


# Solr spellcheck.collate: the auto-corrected search loop — each
# out-of-vocabulary query term is replaced by its TOP-1 suggestion
# (edit distance asc, df desc, term asc — the spellcheck contract), then
# BM25 runs on the collated query. In-vocabulary terms pass through;
# unsuggestable terms stay (zero-df terms contribute nothing to scoring on
# either side). One distributed termstats scan serves every correction.
COLLATE_QUERIES = [
    (0, "hashs join"),
    (1, "scann tabel"),
    (2, "data strem"),
    (3, "qzqzqzqz merge"),
]


def bm25_collated_topk(sf_dir: str) -> pd.DataFrame:
    from ...index.spellcheck import spellcheck

    idx = _build_docs_index(sf_dir)
    words = sorted({
        w for _, text in COLLATE_QUERIES
        for w in TOKEN_RE.findall(text.lower())
    })
    sug = spellcheck(idx, words, max_distance=SPELL_MAX_D, max_suggestions=1)
    top1 = {w: s for w, s in zip(sug["word"], sug["suggestion"])}
    collated = []
    for qid, text in COLLATE_QUERIES:
        terms = sorted({
            top1.get(w, w) for w in TOKEN_RE.findall(text.lower())
        })
        collated.append((qid, " ".join(terms)))
    return _ranked_topk(idx, queries=collated)


def _collate_sql() -> str:
    base = _bm25_sql(queries=COLLATE_QUERIES)
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in COLLATE_QUERIES
        for term in sorted(set(TOKEN_RE.findall(text.lower())))
    )
    old = f"q(query_id, term) AS (VALUES {vals}),"
    new = f"""q0(query_id, word) AS (VALUES {vals}),
corr AS (
  SELECT query_id, word AS term FROM q0
  WHERE word IN (SELECT term FROM dfreq)
  UNION ALL
  SELECT query_id, word AS term FROM q0
  WHERE word NOT IN (SELECT term FROM dfreq)
    AND NOT EXISTS (SELECT 1 FROM dfreq d
                    WHERE levenshtein(d.term, q0.word) <= {SPELL_MAX_D})
  UNION ALL
  SELECT query_id, suggestion AS term FROM (
    SELECT q0.query_id, q0.word, d.term AS suggestion,
           row_number() OVER (PARTITION BY q0.query_id, q0.word
                              ORDER BY levenshtein(d.term, q0.word),
                                       d.df DESC, d.term) AS rn
    FROM q0 JOIN dfreq d ON levenshtein(d.term, q0.word) <= {SPELL_MAX_D}
    WHERE q0.word NOT IN (SELECT term FROM dfreq)) s
  WHERE rn = 1),
q AS (SELECT DISTINCT query_id, term FROM corr),"""
    assert old in base
    return base.replace(old, new)


# RAG context assembly: for each query, the top-3 retrieved docs packed
# into ONE context window of at most CTX_TOKENS tokens — docs concatenate
# in rank order, the straddling doc is token-truncated, later docs are
# dropped. The gather is a predicate-pushed read of the ≤ 3·|queries|
# winning ids, never a corpus scan; the window build is per-query driver
# work on a result-sized frame.
CTX_TOKENS = 64


RAG_K = 3


def rag_context_topk(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ...functions.tokenize import tokenize_text

    idx = _build_docs_index(sf_dir)
    top = _ranked_topk(idx, k=RAG_K)
    ids = sorted({int(d) for d in top["doc_id"]})
    texts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(ids),
        )
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    rows = []
    for qid, g in top.groupby("query_id"):
        g = g.sort_values("rank")
        budget = CTX_TOKENS
        parts, n_docs, n_tokens = [], 0, 0
        for did in g["doc_id"]:
            if budget <= 0:
                break
            toks = tokenize_text(texts.loc[int(did)])[:budget]
            if not toks:
                continue
            parts.append(" ".join(toks))
            n_docs += 1
            n_tokens += len(toks)
            budget -= len(toks)
        rows.append((int(qid), n_docs, n_tokens, " ".join(parts)))
    return pd.DataFrame({
        "query_id": pd.Series([r[0] for r in rows], dtype=np.int64),
        "n_docs": pd.Series([r[1] for r in rows], dtype=np.int64),
        "n_tokens": pd.Series([r[2] for r in rows], dtype=np.int64),
        "context": pd.Series([r[3] for r in rows], dtype=object),
    }).sort_values("query_id", ignore_index=True)


def _rag_sql() -> str:
    base = _bm25_sql(k=RAG_K)
    old_tail = f"""SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {RAG_K}
"""
    new_tail = f""",
dt AS (
  SELECT r.query_id, r.rank,
         list_filter({TOK_SQL}, x -> x <> '') AS t
  FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
  WHERE r.rank <= {RAG_K}),
cum AS (
  SELECT query_id, rank, t,
         sum(len(t)) OVER (PARTITION BY query_id ORDER BY rank) AS c
  FROM dt),
clipped AS (
  SELECT query_id, rank,
         CASE WHEN c <= {CTX_TOKENS} THEN t
              ELSE list_slice(t, 1, {CTX_TOKENS} - (c - len(t))) END AS kt
  FROM cum WHERE c - len(t) < {CTX_TOKENS}),
nonempty AS (SELECT * FROM clipped WHERE len(kt) > 0)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(kt)) AS BIGINT) AS n_tokens,
       string_agg(array_to_string(kt, ' '), ' ' ORDER BY rank) AS context
FROM nonempty GROUP BY query_id ORDER BY query_id
"""
    assert old_tail in base
    return base.replace(old_tail, new_tail)


# ---------------------------------------------------------------------------
# Weighted prefix suggester (the Solr /suggest surface with a popularity
# weight, vs terms_browse's lexicographic browse): per prefix, the top 8
# terms by corpus tf. The per-batch partial filters to prefix matches
# BEFORE the tree merge, so only candidate rows shuffle.
# ---------------------------------------------------------------------------

SUGGEST_PREFIXES = ("s", "c", "b")


SUGGEST_TOPN = 8


def suggest_topk(sf_dir: str) -> pd.DataFrame:
    from ...state.aggregates import tree_aggregate

    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, _docs_, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy())
        t = pd.DataFrame({"term": terms, "tf": tfs})
        outs = []
        for p in SUGGEST_PREFIXES:
            m = t[t["term"].str.startswith(p)]
            g = m.groupby("term", as_index=False)["tf"].sum()
            g.insert(0, "prefix", p)
            outs.append(g)
        return pd.concat(outs, ignore_index=True)

    agg = tree_aggregate(ds, ["prefix", "term"], partial,
                         {"tf": "sum"}).to_pandas()
    agg = agg.sort_values(["prefix", "tf", "term"],
                          ascending=[True, False, True], kind="mergesort")
    top = agg.groupby("prefix").head(SUGGEST_TOPN).reset_index(drop=True)
    top["rank"] = (top.groupby("prefix").cumcount() + 1).astype(np.int64)
    top["tf"] = top["tf"].astype(np.int64)
    return top[["prefix", "rank", "term", "tf"]]


def _suggest_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in SUGGEST_PREFIXES)
    return f"""
WITH t AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT unnest({TOK_SQL}) AS term FROM documents)
  WHERE term <> '' GROUP BY term),
p(prefix) AS (VALUES {vals}),
r AS (SELECT p.prefix, t.term, t.tf,
             row_number() OVER (PARTITION BY p.prefix
                                ORDER BY t.tf DESC, t.term) AS rn
      FROM p JOIN t ON t.term LIKE p.prefix || '%')
SELECT prefix, CAST(rn AS BIGINT) AS rank, term, tf
FROM r WHERE rn <= {SUGGEST_TOPN} ORDER BY prefix, rank
"""


def incremental_dedup_new_docs(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ..dedup import md5_hex

    path = os.path.join(sf_dir, "documents.parquet")
    # deterministic 80/20 split on doc_id rank; the id column (never text)
    # comes to the driver — at corpus scale use quantiles.exact_quantiles
    # on doc_id for the same cutoff without the pull
    ids = np.sort(np.asarray(
        ray.data.read_parquet(path, columns=["doc_id"]).unique("doc_id"),
        np.int64))
    cutoff = int(ids[(len(ids) * 4) // 5 - 1])

    base_hashes = (
        ray.data.read_parquet(
            path, columns=["text"],
            filter=(pads.field("doc_id") <= cutoff))
        .map_batches(
            lambda df: pd.DataFrame({"h": md5_hex(df["text"].to_numpy())}),
            batch_format="pandas")
        .unique("h")
    )
    base_ref = ray.put(np.sort(np.asarray(list(base_hashes), dtype="U32")))

    delta = ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        filter=(pads.field("doc_id") > cutoff))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)
        h = md5_hex(df["text"].to_numpy()).astype("U32")
        pos = np.searchsorted(b, h)
        ok = pos < len(b)
        in_base = np.zeros(len(h), dtype=bool)
        if len(b):
            in_base[ok] = b[pos[ok]] == h[ok]
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                            "h": h, "in_base": in_base})
        out["__b__"] = np.where(
            in_base, -1,
            (md5_u64_local(out["h"].to_numpy())
             % np.uint64(SESSION_BUCKETS)).astype(np.int64))
        return out

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        if (g["__b__"] < 0).any():
            # the dup_of_base shard — no grouping needed
            return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                                 "status": "dup_of_base"})
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        first = ~g["h"].duplicated()
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "status": np.where(first, "new", "dup_in_delta")})

    out = (
        delta.map_batches(classify, batch_format="pandas")
        .groupby("__b__")
        .map_groups(first_wins, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id", ignore_index=True)


def md5_u64_local(hexes: np.ndarray) -> np.ndarray:
    """First 16 hex chars of an md5 hex digest -> uint64 (bucketing only)."""
    return np.asarray([int(h[:16], 16) for h in hexes], dtype=np.uint64)


SQL_INCREMENTAL_DEDUP = """
WITH n AS (SELECT count(DISTINCT doc_id) AS c FROM documents),
r AS (SELECT doc_id, md5(text) AS h,
             row_number() OVER (ORDER BY doc_id) AS rn
      FROM documents),
base AS (SELECT h FROM r, n WHERE rn <= (c * 4) // 5),
delta AS (SELECT doc_id, h FROM r, n WHERE rn > (c * 4) // 5)
SELECT doc_id,
       CASE WHEN h IN (SELECT h FROM base) THEN 'dup_of_base'
            WHEN row_number() OVER (PARTITION BY h ORDER BY doc_id) > 1
              THEN 'dup_in_delta'
            ELSE 'new' END AS status
FROM delta ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Keyword-in-context concordance (the corpus-linguistics KWIC view, and the
# manual-inspection surface of a data-curation loop): every occurrence of a
# term with ±2 tokens of context. One stateless pass over the Arrow
# tokenize kernel — token positions come from the flat (doc_ord, code)
# arrays by index arithmetic with doc-boundary clamping; only matched
# windows (not the corpus) are ever materialized as strings.
# ---------------------------------------------------------------------------

KWIC_TERM = "hash"


KWIC_WIN = 2


def kwic_concordance(sf_dir: str):
    ds = _docs(sf_dir)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from ...functions.tokenize import _flat_tokens_arrow

        doc_ord, codes, vocab = _flat_tokens_arrow(df["text"].to_numpy())
        doc_ids = df["doc_id"].to_numpy(np.int64)
        vlist = np.asarray(vocab.to_pylist(), dtype=object)
        target = np.flatnonzero(vlist == KWIC_TERM)
        if not len(target) or not len(codes):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "pos": pd.Series(dtype=np.int64),
                                 "context": pd.Series(dtype=object)})
        # per-token position within its doc (flat order is doc order)
        starts = np.flatnonzero(np.r_[True, doc_ord[1:] != doc_ord[:-1]])
        doc_start_of = starts[
            np.searchsorted(doc_ord[starts], doc_ord)]
        pos = np.arange(len(codes), dtype=np.int64) - doc_start_of
        ends_of = np.r_[starts[1:], len(codes)][
            np.searchsorted(doc_ord[starts], doc_ord)]
        hits = np.flatnonzero(codes == target[0])
        lo = np.maximum(hits - KWIC_WIN, doc_start_of[hits])
        hi = np.minimum(hits + KWIC_WIN, ends_of[hits] - 1)
        toks = vlist[codes]
        ctx = [" ".join(toks[a:b + 1]) for a, b in zip(lo, hi)]
        return pd.DataFrame({"doc_id": doc_ids[doc_ord[hits]],
                             "pos": pos[hits] + 1, "context": ctx})

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "pos"], ignore_index=True)


SQL_KWIC_CONCORDANCE = f"""
WITH t AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS toks
  FROM documents),
m AS (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks))) AS j
      FROM t)
SELECT doc_id, CAST(j AS BIGINT) AS pos,
       array_to_string(
         toks[greatest(1, j - {KWIC_WIN}):least(len(toks), j + {KWIC_WIN})],
         ' ') AS context
FROM m WHERE toks[j] = '{KWIC_TERM}'
ORDER BY doc_id, pos
"""


def incremental_dedup_bloom(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ...state.bloom import BloomFilter
    from ..dedup import md5_hex

    path = os.path.join(sf_dir, "documents.parquet")
    ids = np.sort(np.asarray(
        ray.data.read_parquet(path, columns=["doc_id"]).unique("doc_id"),
        np.int64))
    n_base = (len(ids) * 4) // 5
    cutoff = int(ids[n_base - 1])

    base = ray.data.read_parquet(
        path, columns=["text"], filter=(pads.field("doc_id") <= cutoff))

    def partial_bloom(df: pd.DataFrame) -> pd.DataFrame:
        b = BloomFilter(n_base, fpr=0.005)
        b.add(md5_u64_local(md5_hex(df["text"].to_numpy())))
        return pd.DataFrame({"bits": [b.bits.tobytes()]})

    bloom = BloomFilter(n_base, fpr=0.005)
    for row in base.map_batches(
            partial_bloom, batch_format="pandas").to_pandas()["bits"]:
        bloom.merge_bits(np.frombuffer(row, dtype=np.uint8))
    bloom_ref = ray.put(bloom)

    delta = ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        filter=(pads.field("doc_id") > cutoff))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bloom_ref)
        h = md5_hex(df["text"].to_numpy()).astype("U32")
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "h": h,
                             "cand": b.contains(md5_u64_local(h))})

    delta_rows = delta.map_batches(probe, batch_format="pandas")

    def cand_only(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"h": np.unique(df["h"].to_numpy()[df["cand"].to_numpy()])})

    cand_h = np.unique(np.asarray(
        list(delta_rows.map_batches(cand_only, batch_format="pandas")
             .unique("h") or []), dtype="U32"))
    cand_ref = ray.put(cand_h)

    def base_hits(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cand_ref)
        h = md5_hex(df["text"].to_numpy()).astype("U32")
        pos = np.searchsorted(c, h)
        ok = pos < len(c)
        hit = np.zeros(len(h), dtype=bool)
        if len(c):
            hit[ok] = c[pos[ok]] == h[ok]
        return pd.DataFrame({"h": np.unique(h[hit])})

    confirmed = np.sort(np.asarray(
        list(base.map_batches(base_hits, batch_format="pandas")
             .unique("h") or []), dtype="U32"))
    conf_ref = ray.put(confirmed)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(conf_ref)
        h = df["h"].to_numpy()
        pos = np.searchsorted(c, h.astype("U32"))
        ok = pos < len(c)
        in_base = np.zeros(len(h), dtype=bool)
        if len(c):
            in_base[ok] = c[pos[ok]] == h[ok].astype("U32")
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                            "h": h, "in_base": in_base})
        out["__b__"] = np.where(
            in_base, -1,
            (md5_u64_local(out["h"].to_numpy())
             % np.uint64(SESSION_BUCKETS)).astype(np.int64))
        return out

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        if (g["__b__"] < 0).any():
            return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                                 "status": "dup_of_base"})
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        first = ~g["h"].duplicated()
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "status": np.where(first, "new", "dup_in_delta")})

    out = (
        delta_rows.map_batches(classify, batch_format="pandas")
        .groupby("__b__")
        .map_groups(first_wins, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id", ignore_index=True)


# ---------------------------------------------------------------------------
# Lucene query-string surface (the string a Solr user actually types):
# +must -prohibited "exact phrase" prefix* should — parsed once, executed
# as (must-match ∩ phrase-match) whitelists + NOT exclusion around one BM25
# scatter over the union of positive terms (index/qparser.py). The oracle
# reproduces every piece: literal terms ∪ top-df prefix expansions in the
# scoring term list, conjunctive HAVING for musts, the token-needle LIKE
# for phrases, NOT IN for prohibited.
# ---------------------------------------------------------------------------

QS_QUERIES = [
    (1, '+data stream "hash table" filt*'),
    (2, "join hash -scan"),
    (3, '+merge "part filter" qu*'),
    (4, '"quantum banana" rare'),  # phrase matches nothing -> empty
    (5, "data stream lang:en -source:src3"),  # metadata fq clauses
    (6, "stream -qu*"),   # prohibited prefix: expansions EXCLUDE
    (7, "+ha* data"),     # required prefix: ANY expansion must match
]


def bm25_querystring_topk(sf_dir: str) -> pd.DataFrame:
    from ...index.qparser import QS_MAX_EXPANSIONS, querystring_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([q for q, _ in QS_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in QS_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(QS_QUERIES), pa.int32()),
    })
    out = querystring_topk(idx, q, max_expansions=QS_MAX_EXPANSIONS
                           ).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _querystring_sql() -> str:
    from ...index.phrase import phrase_needle
    from ...index.qparser import QS_MAX_EXPANSIONS, parse_query

    parsed = {qid: parse_query(t) for qid, t in QS_QUERIES}
    lit_vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, pq in parsed.items()
        for term in pq.positive_terms({})
    )
    def _exp_frag(p: str) -> str:
        # top-N prefix expansion, same (df desc, term) order as the index
        return (
            "SELECT term FROM ("
            "SELECT dfreq.term, row_number() OVER "
            "(ORDER BY dfreq.df DESC, dfreq.term) AS rn "
            f"FROM dfreq WHERE dfreq.term LIKE '{p}%') "
            f"WHERE rn <= {QS_MAX_EXPANSIONS}")

    # should- AND must-prefixes score; must_not prefixes only exclude
    exp_arms = "".join(
        f"""
  UNION
  SELECT query_id, term FROM (
    SELECT {qid} AS query_id, dfreq.term,
           row_number() OVER (ORDER BY dfreq.df DESC, dfreq.term) AS rn
    FROM dfreq WHERE dfreq.term LIKE '{p}%') AS e{qid}_{i}
  WHERE rn <= {QS_MAX_EXPANSIONS}"""
        for qid, pq in parsed.items()
        for i, p in enumerate(pq.prefixes + pq.must_prefixes)
    )
    arms = []
    for qid, pq in parsed.items():
        clauses = []
        if pq.must:
            terms = ", ".join(f"'{t}'" for t in sorted(set(pq.must)))
            clauses.append(
                f"doc_id IN (SELECT doc_id FROM tf WHERE term IN ({terms}) "
                f"GROUP BY doc_id "
                f"HAVING count(DISTINCT term) = {len(set(pq.must))})")
        for p in pq.must_prefixes:  # ANY expansion present (disjunctive)
            clauses.append(
                f"doc_id IN (SELECT doc_id FROM tf "
                f"WHERE term IN ({_exp_frag(p)}))")
        for text, _slop in pq.phrases:
            clauses.append(
                "doc_id IN (SELECT doc_id FROM docstr WHERE s LIKE "
                f"'%{phrase_needle(text)}%')")
        if pq.must_not:
            terms = ", ".join(f"'{t}'" for t in sorted(set(pq.must_not)))
            clauses.append(
                f"doc_id NOT IN (SELECT doc_id FROM tf "
                f"WHERE term IN ({terms}))")
        for p in pq.must_not_prefixes:  # NO expansion may be present
            clauses.append(
                f"doc_id NOT IN (SELECT doc_id FROM tf "
                f"WHERE term IN ({_exp_frag(p)}))")
        for fld, val, neg in pq.filters:
            op = "<>" if neg else "="
            clauses.append(
                f"doc_id IN (SELECT doc_id FROM documents "
                f"WHERE {fld} {op} '{val}')")
        cond = " AND ".join(clauses) if clauses else "TRUE"
        arms.append(f"SELECT query_id, doc_id, score FROM scores "
                    f"WHERE query_id = {qid} AND {cond}")
    restricted = "\n  UNION ALL ".join(arms)
    tok_nonempty = f"list_filter({TOK_SQL}, t -> t <> '')"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
  FROM toks WHERE term <> '' GROUP BY doc_id),
stats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT sum(dl) FROM dl)
           / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
docstr AS (
  SELECT doc_id,
         ' ' || array_to_string({tok_nonempty}, ' ') || ' ' AS s
  FROM documents),
lit(query_id, term) AS (VALUES {lit_vals}),
q AS (
  SELECT query_id, term FROM lit{exp_arms}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) )
           AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id),
restricted AS (
  {restricted}),
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM restricted)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {BM25_K}
"""


def _fed_member_indexes(sf_dir: str) -> list[str]:
    """Two member indexes over disjoint doc-id halves with DIFFERENT
    layouts; cached in /tmp via build_index's fast-resume stamp."""
    from ...index.build import BuildConfig, build_index

    base = _index_dir_for(sf_dir)
    layouts = {"fed_even": (2, 4), "fed_odd": (4, 8)}
    dirs = []
    for name, (s, b) in layouts.items():
        want_even = name == "fed_even"
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang", "source"],
        ).map_batches(
            lambda t, we=want_even: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1),
                         0 if we else 1)),
            batch_format="pyarrow",
        )
        idx = f"{base}_{name}"
        cfg = BuildConfig(n_shards=s, n_buckets=b, text_col="text",
                          id_col="doc_id", meta_cols=("lang", "source"))
        build_index(ds, idx, cfg, resume=True)
        dirs.append(idx)
    return dirs


def bm25_topk_federated(sf_dir: str) -> pd.DataFrame:
    from ...index.federated import FederatedSearcher

    fed = FederatedSearcher(_fed_member_indexes(sf_dir))
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(BM25_QUERIES),
                      pa.int32()),
    })
    out = fed.topk(q).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def lmd_topk_federated(sf_dir: str) -> pd.DataFrame:
    """Federated LM-Dirichlet over the two member indexes — global
    cf/total_len merged per query; same oracle as the single-index
    lmd_topk (zero-total docs excluded on both sides, see lmd_topk_docs)."""
    from ...index.federated import FederatedSearcher

    fed = FederatedSearcher(_fed_member_indexes(sf_dir))
    q = pa.table({
        "query_id": pa.array([q for q, _ in BM25_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BM25_QUERIES], pa.string()),
        "k": pa.array([BM25_K + _RANK_MARGIN] * len(BM25_QUERIES),
                      pa.int32()),
    })
    out = fed.topk_lmd(q, mu=LMD_MU).to_pandas()
    out["score"] = out["score"].round(6)
    out = out[out["score"] > 0]
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= BM25_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def facet_lang_federated(sf_dir: str) -> pd.DataFrame:
    """Federated facet.field: per-member conjunctive-match facet partials
    summed on the driver — same oracle as the single-index facet entry
    (member doc sets are disjoint halves of the same corpus)."""
    from ...index.federated import FederatedSearcher

    fed = FederatedSearcher(_fed_member_indexes(sf_dir))
    out = fed.facet_counts("lang", text=FACET_QUERY, mode="and")
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Layout migration proof: reshard the shared positional index into a
# DIFFERENT (n_shards, n_buckets) layout — postings stream, corpus never
# re-tokenized (index/reshard.py) — and run the flagship BM25 batch on the
# RESHARDED index against the SAME oracle as bm25_topk. Byte-identity of
# reshard vs fresh build is pinned in tests/test_reshard.py; this entry
# proves the query path end-to-end on a migrated layout every gate run.
# ---------------------------------------------------------------------------

RESHARD_LAYOUT = (2, 16)


def bm25_topk_resharded(sf_dir: str) -> pd.DataFrame:
    import shutil

    from ...index.reshard import reshard_index
    from ...index.segments import read_stats

    src = _build_docs_index(sf_dir)
    s, b = RESHARD_LAYOUT
    dst = f"{src}_rs{s}x{b}"
    sstat = read_stats(src)
    reuse = False
    try:
        dstat = read_stats(dst)
        reuse = (
            dstat.get("n_postings") == sstat["n_postings"]
            and dstat.get("n_docs") == sstat["n_docs"]
            and dstat.get("pipeline_version") == sstat.get("pipeline_version")
            and (dstat.get("n_shards"), dstat.get("n_buckets")) == (s, b)
        )
    except (OSError, ValueError):
        reuse = False
    if not reuse:
        shutil.rmtree(dst, ignore_errors=True)
        reshard_index(src, dst, n_shards=s, n_buckets=b)
    return _ranked_topk(dst)


__all__ = [
    'BOOST_DEFAULT',
    'BOOST_WEIGHTS',
    'BQ_QUERIES',
    'COLLATE_QUERIES',
    'CTX_TOKENS',
    'DISMAX_QUERIES',
    'DISMAX_TITLE_TOKENS',
    'DISMAX_TITLE_W',
    'ELEVATE',
    'EVAL_K',
    'EXPAND_ROWS',
    'FACET_QUERY',
    'FACET_QUERY_DEFS',
    'FIELD_SORT_K',
    'FL_FIELDS',
    'FUZZY_MAX_D',
    'FUZZY_MAX_EXP',
    'FUZZY_QUERIES',
    'GROUP_N',
    'GROUP_QUERIES',
    'HN_K',
    'HN_N',
    'INC_QUERIES',
    'KWIC_TERM',
    'KWIC_WIN',
    'LMD_MU',
    'MLT_MAX_TERMS',
    'MLT_QUERIES',
    'MM_QUERIES',
    'NEAR_QUERIES',
    'NOT_QUERIES',
    'PAGE_ROWS',
    'PAGE_START',
    'PERCOLATE_PHRASES',
    'PERCOLATE_PHRASE_TERM',
    'PERCOLATE_QUERIES',
    'PF_QUERIES',
    'PHRASE_QUERIES',
    'PREFIX_MAX_EXP',
    'PREFIX_QUERIES',
    'PRF_FEEDBACK_DOCS',
    'PRF_TERMS_PER_DOC',
    'QS_QUERIES',
    'RAG_K',
    'RANGE_FQ_HI',
    'RANGE_FQ_LO',
    'RANGE_GAP',
    'RARE_LIMIT',
    'RARE_MAX_DF',
    'REGEX_MAX_EXP',
    'REGEX_QUERIES',
    'RESHARD_LAYOUT',
    'SIGTERMS_MIN_FG',
    'SIGTERMS_N',
    'SLOPPY_QUERIES',
    'SPAN_FIRST_QUERIES',
    'SPAN_NOT_QUERIES',
    'SPELL_MAX_D',
    'SPELL_N',
    'SPELL_QUERIES',
    'SQL_DOCBUILDER_FLAGSHIP',
    'SQL_FACET_NESTED',
    'SQL_FIELDMAP_AVALON',
    'SQL_FIELDMAP_PROJECT',
    'SQL_INCREMENTAL_DEDUP',
    'SQL_KWIC_CONCORDANCE',
    'SQL_MARC_RECORDS',
    'SQL_RARE_TERMS',
    'SQL_REALTIME_GET',
    'SQL_TOP_TERMS_PER_LANG',
    'SUGGEST_PREFIXES',
    'SUGGEST_TOPN',
    'SYNONYMS',
    'SYN_QUERIES',
    'TERMS_LIMIT',
    'TERMS_NEEDLES',
    'TERMS_PREFIXES',
    '_FACET_INTERVALS',
    '_RECIP_A',
    '_bm25_conjunctive_sql',
    '_bm25_fields_sql',
    '_bm25_filtered_sql',
    '_bm25_range_sql',
    '_boosted_sql',
    '_bq_sql',
    '_build_title_index',
    '_collapse_sql',
    '_collate_sql',
    '_dismax_sql',
    '_elevated_sql',
    '_eval_qrels',
    '_eval_sql',
    '_expand_sql',
    '_expand_synonyms',
    '_explain_sql',
    '_facet_interval_sql',
    '_facet_or_sql',
    '_facet_pivot_sql',
    '_facet_query_sql',
    '_facet_range_sql',
    '_facet_sql',
    '_fed_member_indexes',
    '_fuzzy_sql',
    '_grouped_sql',
    '_h264_sql',
    '_hard_neg_sql',
    '_lmd_sql',
    '_mlt_sql',
    '_mm_sql',
    '_near_sql',
    '_not_sql',
    '_page2_sql',
    '_percolate_phrase_sql',
    '_percolate_sql',
    '_pf_sql',
    '_phrase_sql',
    '_prefix_sql',
    '_prf_sql',
    '_querystring_sql',
    '_rag_sql',
    '_recip_boost_sql',
    '_regex_sql',
    '_sigterms_sql',
    '_sloppy_sql',
    '_snippets_sql',
    '_sort_by_field_sql',
    '_span_first_sql',
    '_span_not_sql',
    '_spellcheck_sql',
    '_stemmed_corpus',
    '_stemmed_sql',
    '_suggest_sql',
    '_synonym_sql',
    '_terms_browse_sql',
    '_terms_infix_sql',
    'bm25_boosted_topk',
    'bm25_bq_topk',
    'bm25_collapse_topk',
    'bm25_collated_topk',
    'bm25_cursor_page2',
    'bm25_dismax_topk',
    'bm25_elevated_topk',
    'bm25_eval_metrics',
    'bm25_expand_topk',
    'bm25_explain_top3',
    'bm25_fuzzy_topk',
    'bm25_hard_negatives',
    'bm25_mlt_topk',
    'bm25_mm_topk',
    'bm25_near_topk',
    'bm25_not_topk',
    'bm25_page2',
    'bm25_pf_topk',
    'bm25_phrase_topk',
    'bm25_prefix_topk',
    'bm25_prf_topk',
    'bm25_querystring_topk',
    'bm25_range_topk',
    'bm25_recip_boost_topk',
    'bm25_regex_topk',
    'bm25_sloppy_topk',
    'bm25_snippets',
    'bm25_span_first_topk',
    'bm25_span_not_topk',
    'IDENT_QUERIES',
    'bm25_ident_topk',
    'bm25_stemmed_topk',
    'bm25_synonym_topk',
    'bm25_topk_conjunctive',
    'boolean_tree_topk',
    '_boolean_tree_sql',
    'bm25_topk_docs',
    'bm25_topk_federated',
    'bm25_topk_fields',
    'bm25_topk_lang_en',
    'bm25_topk_resharded',
    'docbuilder_flagship',
    'facet_interval_counts',
    'facet_lang_conjunctive',
    'facet_lang_federated',
    'facet_nested_stats',
    'facet_pivot_lang_source',
    'facet_query_counts',
    'facet_range_chars',
    'facet_source_disjunctive',
    'fieldmap_avalon_docs',
    'fieldmap_project_docs',
    'grouped_topk_by_source',
    'h264_keyframe_index',
    'incremental_dedup_bloom',
    'incremental_dedup_new_docs',
    'incremental_update_demo',
    'kwic_concordance',
    'lmd_topk_docs',
    'lmd_topk_federated',
    'marc_records_docs',
    'md5_u64_local',
    'percolate_matches',
    'percolate_phrase_matches',
    'rag_context_topk',
    'rare_terms',
    'realtime_get_updated',
    'significant_terms',
    'sort_by_field_topk',
    'spellcheck_suggest',
    'suggest_topk',
    'terms_browse',
    'terms_infix',
    'top_terms_per_lang',
]


# ------------------- boolean query trees (Lucene BooleanQuery) --------------
#
# Gated scoring: a term leaf contributes to a doc iff the doc matches it
# AND matches every AND-ancestor of the leaf (NOT branches filter, never
# score). The SQL mirrors each leaf's gate as an EXISTS chain over the
# distinct (doc, term) containment view and sums the standard BM25
# contributions branch by branch — the same 6-dp rounding contract as
# every other retrieval entry.

BOOL_TREE_QUERIES = [
    (0, "(join AND hash) OR (data NOT model)"),
    (1, "(batch OR scan) AND filter"),
]


def boolean_tree_topk(sf_dir: str) -> pd.DataFrame:
    """Routes through querystring_topk so the tree auto-detection is the
    surface under test (reference analog: Solr lucene-syntax boolean
    queries, SolrHelper.java query construction)."""
    from ...index.qparser import querystring_topk

    idx = _build_docs_index(sf_dir)
    q = pa.table({
        "query_id": pa.array([i for i, _ in BOOL_TREE_QUERIES], pa.int64()),
        "text": pa.array([t for _, t in BOOL_TREE_QUERIES], pa.string()),
        "k": pa.array([BM25_K] * len(BOOL_TREE_QUERIES), pa.int32()),
    })
    return querystring_topk(idx, q).to_pandas()


def _boolean_tree_sql() -> str:
    has = ("EXISTS (SELECT 1 FROM contains x WHERE x.doc_id = c.doc_id "
           "AND x.term = '{t}')")

    def h(t):
        return has.format(t=t)

    branches = f"""
  SELECT 0 AS query_id, c.doc_id, c.s FROM contrib c
  WHERE c.term IN ('join', 'hash') AND {h('join')} AND {h('hash')}
  UNION ALL
  SELECT 0, c.doc_id, c.s FROM contrib c
  WHERE c.term = 'data' AND NOT {h('model')}
  UNION ALL
  SELECT 1, c.doc_id, c.s FROM contrib c
  WHERE c.term = 'batch' AND {h('filter')}
  UNION ALL
  SELECT 1, c.doc_id, c.s FROM contrib c
  WHERE c.term = 'scan' AND {h('filter')}
  UNION ALL
  SELECT 1, c.doc_id, c.s FROM contrib c
  WHERE c.term = 'filter' AND ({h('batch')} OR {h('scan')})"""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
  FROM toks WHERE term <> '' GROUP BY doc_id),
stats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
         (SELECT sum(dl) FROM dl)
         / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
contains AS (SELECT DISTINCT doc_id, term FROM tf),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
         * tf.tf * 2.2
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
  FROM tf
  JOIN dfreq ON dfreq.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats),
branch AS ({branches}),
total AS (
  SELECT query_id, doc_id, sum(s) AS score
  FROM branch GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM total)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {BM25_K}
"""
