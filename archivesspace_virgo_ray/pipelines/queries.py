"""Driver-contract queries: each Ray pipeline paired with a DuckDB oracle.

Every function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
pyarrow Table whose column names match the oracle SQL exactly (the driver
hashes values under sorted column names). Floating aggregates are rounded to
a fixed precision ON BOTH SIDES so IEEE summation-order noise can't flip the
hash. None of these call ``ray.init`` — the session is owned by the caller.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.tokenize import TOKEN_RE, batch_term_doc_tf
from .dedup import exact_dedup, minhash_dedup, simhash_near_dups
from .similarity import knn_brute_force, knn_ivf
from .textstats import LANG_PROFILES, lang_id_batch

TOK_SQL = "string_split_regex(lower(text), '[^a-z0-9_]+')"
NOW_YEAR = 2026  # pinned "now" (M10 determinism)


def _docs(sf_dir: str):
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


# ---------------------------------------------------------------------------


def term_tf_top100(sf_dir: str):
    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, docs, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        out = pd.DataFrame({"term": terms, "tf": tfs})
        return out.groupby("term", as_index=False)["tf"].sum()

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["term"], partial, {"tf": "sum"})
    pdf = agg.to_pandas()
    pdf = pdf.sort_values(["tf", "term"], ascending=[False, True], kind="mergesort").head(100)
    return pdf.reset_index(drop=True)[["term", "tf"]]


SQL_TERM_TF_TOP100 = f"""
SELECT term, CAST(count(*) AS BIGINT) AS tf
FROM (SELECT unnest({TOK_SQL}) AS term FROM documents)
WHERE term <> ''
GROUP BY term
ORDER BY tf DESC, term
LIMIT 100
"""


def term_df_top100(sf_dir: str):
    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, docs, _tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        out = pd.DataFrame({"term": terms, "doc_id": docs})
        g = out.groupby("term", as_index=False)["doc_id"].nunique()
        return g.rename(columns={"doc_id": "df"})

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["term"], partial, {"df": "sum"})
    pdf = agg.to_pandas()
    pdf = pdf.sort_values(["df", "term"], ascending=[False, True], kind="mergesort").head(100)
    return pdf.reset_index(drop=True)[["term", "df"]]


SQL_TERM_DF_TOP100 = f"""
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM (SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents)
WHERE term <> ''
GROUP BY term
ORDER BY df DESC, term
LIMIT 100
"""


def doc_token_counts(sf_dir: str):
    ds = _docs(sf_dir)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        findall = TOKEN_RE.findall
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": np.fromiter(
                    (len(findall(t.lower())) for t in df["text"]),
                    dtype=np.int64,
                    count=len(df),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


SQL_DOC_TOKEN_COUNTS = f"""
SELECT doc_id,
       CAST(len(list_filter({TOK_SQL}, x -> x <> '')) AS BIGINT) AS n_tokens
FROM documents
"""


def exact_dedup_docs(sf_dir: str):
    ds = _docs(sf_dir)
    # count() on a fresh parquet read is metadata-only; the hint lets the
    # distinct-hash reduction go straight to the keyed shuffle at scale
    return exact_dedup(ds, n_rows=ds.count())


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_md5,
       min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dupes
FROM documents
GROUP BY md5(text)
"""


def lang_source_stats(sf_dir: str):
    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("doc_id", "size"), total_chars=("n_chars", "sum")
        )
        return g

    from ..state.aggregates import tree_aggregate

    return tree_aggregate(
        ds, ["lang", "source"], partial, {"n_docs": "sum", "total_chars": "sum"}
    )


SQL_LANG_SOURCE_STATS = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang, source
"""


def quality_stats(sf_dir: str):
    ds = _docs(sf_dir)
    stop = frozenset(LANG_PROFILES["en"])  # hoisted: not per-token, not per-row

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import _flat_tokens_arrow

        texts = t["text"].to_pylist()
        n = len(texts)
        doc_ord, codes, vocab = _flat_tokens_arrow(texts)
        n_tokens = np.bincount(doc_ord, minlength=n).astype(np.int64)
        stop_code = np.isin(np.asarray(vocab.to_pylist(), dtype=object),
                            list(stop))
        n_stop = np.bincount(
            doc_ord[stop_code[codes]], minlength=n
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens),
                "n_stopwords": pa.array(n_stop),
                "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats(sf_dir: str):
    """Gopher-style repetition filters (dup-line / top-token / top-2-gram
    counts) — integer outputs, fractions derivable downstream."""
    from .textstats import repetition_batch

    return _docs(sf_dir).map_batches(repetition_batch, batch_format="pyarrow")


SQL_REPETITION_STATS = f"""
WITH base AS (
  SELECT doc_id, text, list_filter({TOK_SQL}, x -> x <> '') AS toksl
  FROM documents),
lstat AS (
  SELECT doc_id,
         len(list_filter(list_transform(string_split(text, chr(10)),
                                        x -> trim(x)), x -> x <> '')) AS n_lines,
         len(list_distinct(list_filter(list_transform(string_split(text, chr(10)),
                                                      x -> trim(x)), x -> x <> ''))) AS n_distinct
  FROM base),
tokpos AS (
  SELECT doc_id, unnest(toksl) AS term, generate_subscripts(toksl, 1) AS pos
  FROM base),
tokstat AS (
  SELECT doc_id, max(c) AS top_token_n, sum(c) AS n_tokens
  FROM (SELECT doc_id, term, count(*) AS c FROM tokpos GROUP BY doc_id, term)
  GROUP BY doc_id),
bg AS (
  SELECT doc_id,
         term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS pair
  FROM tokpos
  QUALIFY lead(term) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL),
bgstat AS (
  SELECT doc_id, max(c) AS top_bigram_n, sum(c) AS n_bigrams
  FROM (SELECT doc_id, pair, count(*) AS c FROM bg GROUP BY doc_id, pair)
  GROUP BY doc_id)
SELECT b.doc_id,
       CAST(l.n_lines AS BIGINT) AS n_lines,
       CAST(l.n_lines - l.n_distinct AS BIGINT) AS n_dup_lines,
       CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(t.top_token_n, 0) AS BIGINT) AS top_token_n,
       CAST(coalesce(g.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(g.top_bigram_n, 0) AS BIGINT) AS top_bigram_n
FROM base b
JOIN lstat l ON l.doc_id = b.doc_id
LEFT JOIN tokstat t ON t.doc_id = b.doc_id
LEFT JOIN bgstat g ON g.doc_id = b.doc_id
"""


_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES["en"]) + "]"
SQL_QUALITY_STATS = f"""
SELECT doc_id,
       CAST(len(list_filter({TOK_SQL}, x -> x <> '')) AS BIGINT) AS n_tokens,
       CAST(len(list_filter({TOK_SQL}, x -> list_contains({_STOP_SQL}, x))) AS BIGINT) AS n_stopwords,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def lang_id_docs(sf_dir: str):
    ds = _docs(sf_dir)
    out = ds.map_batches(lang_id_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "pred_lang", "hits_en", "hits_fr", "hits_de"])


def _hits_sql(lang: str) -> str:
    words = "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + "]"
    return f"CAST(len(list_filter({TOK_SQL}, x -> list_contains({words}, x))) AS BIGINT)"


SQL_LANG_ID = f"""
WITH h AS (
  SELECT doc_id,
         {_hits_sql('en')} AS hits_en,
         {_hits_sql('fr')} AS hits_fr,
         {_hits_sql('de')} AS hits_de
  FROM documents)
SELECT doc_id,
       CASE WHEN hits_en = 0 AND hits_fr = 0 AND hits_de = 0 THEN 'und'
            WHEN hits_en >= hits_fr AND hits_en >= hits_de THEN 'en'
            WHEN hits_fr >= hits_de THEN 'fr'
            ELSE 'de' END AS pred_lang,
       hits_en, hits_fr, hits_de
FROM h
"""


# --------------------------- BM25 flagship ---------------------------------

BM25_QUERIES = [(0, "join hash"), (1, "batch scan filter"), (2, "the data stream")]
BM25_K = 10


def _index_dir_for(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/avr_bm25_idx_{tag}"


# extra candidates fetched beyond k: ranking happens on 6-dp-ROUNDED scores
# (so the SQL oracle, whose float sum order differs, agrees bit-for-bit), and
# two docs tying at 6 dp but differing in full precision could straddle the
# unrounded rank-k boundary — the margin makes the rounded cut exact
_RANK_MARGIN = 10


def _build_docs_index(sf_dir: str) -> str:
    from ..index.build import BuildConfig, build_index

    idx = _index_dir_for(sf_dir)
    cfg = BuildConfig(
        n_shards=4, n_buckets=8, text_col="text", id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
        # positional: phrase/slop entries verify from the index's positions
        # stream (Lucene model) instead of re-reading candidate raw text
        store_positions=True,
    )
    build_index(os.path.join(sf_dir, "documents.parquet"), idx, cfg, resume=True)
    return idx


def _ranked_topk(
    idx: str, queries=None, *, where=None, require_all: bool = False,
    k: int | None = None,
) -> pd.DataFrame:
    """Distributed scatter → round(6 dp) → rank (score desc, doc_id asc) →
    cut to ``k`` (default BM25_K). Column names match the oracle SQL exactly."""
    from ..index.query import bm25_topk

    queries = BM25_QUERIES if queries is None else queries
    k = BM25_K if k is None else k
    q = pa.table(
        {
            "query_id": pa.array([q for q, _ in queries], pa.int64()),
            "text": pa.array([t for _, t in queries], pa.string()),
            "k": pa.array([k + _RANK_MARGIN] * len(queries), pa.int32()),
        }
    )
    out = bm25_topk(idx, q, where=where, require_all=require_all).to_pandas()
    out["score"] = out["score"].round(6)
    out = out.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= k].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def bm25_topk_docs(sf_dir: str):
    """Flagship: full engine — index build (resumable) + distributed BM25."""
    return _ranked_topk(_build_docs_index(sf_dir))


def _bm25_sql(queries=None, k: int | None = None) -> str:
    queries = BM25_QUERIES if queries is None else queries
    k = BM25_K if k is None else k
    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, text in queries
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
q(query_id, term) AS (VALUES {vals}),
scores AS (
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
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {k}
"""


LMD_MU = 2000.0


def lmd_topk_docs(sf_dir: str) -> pd.DataFrame:
    """LM-Dirichlet ranked retrieval (Lucene LMDirichletSimilarity, the
    second similarity next to BM25): same index, same scatter machinery,
    per-posting max(0, ln(1 + tf·total_len/(mu·cf)) + ln(mu/(dl+mu))).
    Zero-total docs are excluded on BOTH sides — the engine's block-max
    pruning legitimately never materializes docs whose every contribution
    clamps to 0, and a clamped sum of zeros is exactly 0.0 everywhere."""
    from ..index.query import lmd_topk

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
    from ..index.phrase import phrase_topk

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
    from ..index.phrase import phrase_needle

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
    from ..index.phrase import phrase_topk

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
    from ..index.phrase import slop_pattern

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
    from ..index.phrase import near_topk

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
    from ..index.phrase import slop_pattern

    def rev(t: str) -> str:
        from ..functions.tokenize import tokenize_text

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
    from ..index.phrase import phrase_topk
    from ..index.query import get_pool

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
    from ..index.phrase import phrase_needle

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
    from ..index.phrase import _score_verified
    from ..index.query import get_pool

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

        from ..functions.tokenize import tokenize_text as _tok

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
    from ..index.phrase import span_not_topk

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
    from ..index.prefix import prefix_topk

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
    from ..index.prefix import regex_topk

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
    from ..index.query import bm25_topk

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


# event funnel analysis (strict-order conversion): per user, the first
# signup, the first view strictly after it, the first purchase strictly
# after that; output = users reaching each stage. Same shuffle shape as
# sessionization: hash-bucket by user, ONE vectorized pass per bucket
# (merge + min, never a Python loop per user), then a tiny stage-count
# merge on the driver.
FUNNEL_STAGES = ["signup", "view", "purchase"]


def event_funnel(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        prev = (
            g[g["event_type"] == FUNNEL_STAGES[0]]
            .groupby("user_id")["ts"].min()
        )
        counts = [len(prev)]
        for stage in FUNNEL_STAGES[1:]:
            marks = prev.rename("t_prev").reset_index()
            ev = g[g["event_type"] == stage].reset_index(drop=True).merge(
                marks, on="user_id"
            )
            prev = ev[ev["ts"] > ev["t_prev"]].groupby("user_id")["ts"].min()
            counts.append(len(prev))
        return pd.DataFrame({
            "stage": pd.Series(range(1, len(FUNNEL_STAGES) + 1), dtype=np.int64),
            "event_type": pd.Series(FUNNEL_STAGES, dtype=object),
            "n_users": pd.Series(counts, dtype=np.int64),
        })

    parts = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(funnel_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby(["stage", "event_type"], as_index=False)["n_users"].sum()
    )
    out["stage"] = out["stage"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("stage", ignore_index=True)


def _funnel_sql() -> str:
    s1, s2, s3 = FUNNEL_STAGES
    return f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{s1}' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
  WHERE e.event_type = '{s2}' GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
  WHERE e.event_type = '{s3}' GROUP BY e.user_id)
SELECT stage, event_type, n_users FROM (
  SELECT CAST(1 AS BIGINT) AS stage, '{s1}' AS event_type,
         CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_users
  UNION ALL
  SELECT CAST(2 AS BIGINT), '{s2}',
         CAST((SELECT count(*) FROM t2) AS BIGINT)
  UNION ALL
  SELECT CAST(3 AS BIGINT), '{s3}',
         CAST((SELECT count(*) FROM t3) AS BIGINT))
ORDER BY stage
"""


# pseudo-relevance feedback (Rocchio-style query expansion): base top-F
# docs per query → each feedback doc's top tf*idf terms (the MLT selection
# contract) union the original terms → one expanded OR query. Two pool
# round-trips; term selection is driver-side over F x terms_per_doc rows.
PRF_FEEDBACK_DOCS = 3
PRF_TERMS_PER_DOC = 5


def bm25_prf_topk(sf_dir: str) -> pd.DataFrame:
    from ..index.mlt import fetch_texts, interesting_terms

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
    from ..index.query import get_pool

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


# retention cohorts: cohort = a user's first-activity day; for each
# (cohort_day, day_offset) the count of distinct cohort users active at
# that offset. Users hash-bucket once (each user's events colocate), so
# per-bucket distinct counts SUM exactly — the driver merges ≤ days² rows.


def retention_cohorts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    def cohort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True).copy()
        g["day"] = g["ts"].dt.floor("D")
        first = (
            g.groupby("user_id")["day"].min().rename("cohort").reset_index()
        )
        m = g.merge(first, on="user_id")
        m["day_offset"] = (m["day"] - m["cohort"]).dt.days.astype(np.int64)
        d = m.drop_duplicates(["user_id", "day_offset"])
        out = (
            d.groupby(["cohort", "day_offset"], as_index=False)
            .agg(n_users=("user_id", "size"))
        )
        out["cohort_day"] = out["cohort"].dt.strftime("%Y-%m-%d")
        return out[["cohort_day", "day_offset", "n_users"]].astype(
            {"day_offset": np.int64, "n_users": np.int64}
        )

    parts = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(cohort_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"]
        .sum()
    )
    out["day_offset"] = out["day_offset"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort_day", "day_offset"], ignore_index=True)


SQL_RETENTION = """
WITH f AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort FROM events
  GROUP BY user_id),
a AS (
  SELECT DISTINCT e.user_id, f.cohort,
         date_diff('day', f.cohort, date_trunc('day', e.ts)) AS day_offset
  FROM events e JOIN f USING (user_id))
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort, day_offset
ORDER BY cohort_day, day_offset
"""


# table profiling (data-quality report): per-column rows/nulls/min/max +
# md5-HLL distinct estimate, ONE tree-merged pass over lineitem.
PROFILE_INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]
PROFILE_STR_COLS = ["l_returnflag", "l_linestatus"]
PROFILE_P = 12


def profile_lineitem(sf_dir: str) -> pd.DataFrame:
    from .profile import profile_columns

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=PROFILE_INT_COLS + PROFILE_STR_COLS,
    )
    return profile_columns(ds, PROFILE_INT_COLS, PROFILE_STR_COLS, p=PROFILE_P)


def _hll_scalar_sql(table: str, col: str, p: int) -> str:
    """Scalar subquery computing the md5-HLL distinct estimate of
    ``table.col`` — the same register/rho/bias contract as _hll_sql."""
    from .sketches import _alpha

    m = 1 << p
    alpha = _alpha(m)
    return f"""(
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM {table} WHERE {col} IS NOT NULL),
rr AS (
  SELECT CAST(hv >> {64 - p} AS BIGINT) AS register,
         hv & CAST({(1 << (64 - p)) - 1} AS UBIGINT) AS low
  FROM h),
rho AS (
  SELECT register,
         max(CASE WHEN low = 0 THEN {64 - p + 1}
                  ELSE {64 - p} - length(bin(low)) + 1 END) AS rho
  FROM rr GROUP BY register),
agg AS (
  SELECT coalesce(sum(power(2.0, -rho)), 0) AS s_present,
         count(*) AS n_present FROM rho),
est AS (
  SELECT {m} - n_present AS zeros,
         CAST({alpha} AS DOUBLE) * {m} * {m}
           / (s_present + ({m} - n_present) * 1.0) AS raw
  FROM agg)
SELECT round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                  THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                  ELSE raw END, 6)
FROM est)"""


def _profile_sql() -> str:
    arms = []
    for c in PROFILE_INT_COLS + PROFILE_STR_COLS:
        is_int = c in PROFILE_INT_COLS
        mn = f"CAST(min({c}) AS VARCHAR)" if is_int else f"min({c})"
        mx = f"CAST(max({c}) AS VARCHAR)" if is_int else f"max({c})"
        arms.append(f"""
  SELECT '{c}' AS "column",
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
         {mn} AS min_v, {mx} AS max_v,
         {_hll_scalar_sql("lineitem", c, PROFILE_P)} AS distinct_hll
  FROM lineitem""")
    union = "\n  UNION ALL".join(arms)
    return f'SELECT * FROM ({union}) ORDER BY "column"'


# int8 embedding quantization: symmetric per-vector scale, floor(x+0.5)
# rounding (identical across numpy/SQL round-half conventions). The
# compression step before vectors enter a 100 TB cell layout.


def embedding_quantize_int8(sf_dir: str) -> pd.DataFrame:
    from .similarity import quantize_embeddings

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


# feature-hashed linear classifier scoring (fastText/VW inference shape):
# deterministic surrogate weights make the whole inference pass integer-
# exact and therefore hash-checkable in SQL — the "model scoring" template
# with an actual oracle instead of a rows-only check.
CLS_BUCKETS = 65536
CLS_BIAS = 0.1


def classifier_quality_scores(sf_dir: str) -> pd.DataFrame:
    from .curation import classifier_scores

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = classifier_scores(ds, n_buckets=CLS_BUCKETS, bias=CLS_BIAS).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def _classifier_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term),
feat AS (
  SELECT doc_id, tf,
         CAST(CAST(('0x' || substr(md5(term), 1, 16)) AS UBIGINT)
              % {CLS_BUCKETS} AS BIGINT) AS fi
  FROM tf),
agg AS (
  SELECT doc_id,
         sum((fi * 2654435761) % 2000001 * tf) AS s,
         sum(tf) AS n
  FROM feat GROUP BY doc_id),
scored AS (
  SELECT doc_id, n,
         {CLS_BIAS} + (s / 1000000.0 - n) / n AS z
  FROM agg)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n AS BIGINT) AS n_tokens,
       round(z, 6) AS z, round(1.0 / (1.0 + exp(-z)), 6) AS p
FROM scored ORDER BY doc_id
"""


# related documents (lexical recommendations): top-5 most similar docs to
# each source doc by SPARSE TF-IDF cosine — the exact version of what MLT
# approximates with its term cut. Source vectors broadcast (a handful of
# docs); ONE corpus pass computes dot products via searchsorted against
# each source's term array and the doc's own norm from its in-batch
# tokens; only per-source local top-k partials leave the workers.
RELATED_SRC_DOCS = [0, 7, 42]
RELATED_K = 5


def _idf_lookup(vocab: np.ndarray, idf: np.ndarray, terms: np.ndarray) -> np.ndarray:
    """idf per term with out-of-vocabulary terms weighted 0 — a term absent
    from (or sorting past) the sealed termstats vocab (stale seal vs a newer
    corpus) must not index past the end or borrow a neighbor's idf."""
    pos = np.searchsorted(vocab, terms)
    pos_c = np.clip(pos, 0, max(0, len(vocab) - 1))
    known = (pos < len(vocab)) & (vocab[pos_c] == terms) if len(vocab) else np.zeros(len(terms), bool)
    return np.where(known, idf[pos_c] if len(vocab) else 0.0, 0.0)


def related_docs_tfidf(sf_dir: str) -> pd.DataFrame:
    from ..functions.tokenize import batch_term_doc_tf
    from ..index.build import termstats_dir
    from ..index.segments import read_stats

    import ray as _ray

    idx = _build_docs_index(sf_dir)
    ts = (
        ray.data.read_parquet(termstats_dir(idx), columns=["term", "df"])
        .to_pandas().sort_values("term", ignore_index=True)
    )
    vocab = ts["term"].to_numpy(object)
    n_docs = int(read_stats(idx)["n_docs"])
    idf = np.log((n_docs + 1.0) / (ts["df"].to_numpy(np.int64) + 1.0))

    import pyarrow.dataset as pads

    src_tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        filter=pads.field("doc_id").isin(RELATED_SRC_DOCS),
        columns=["doc_id", "text"],
    ).to_pandas()
    src_vecs = {}
    for d, t in zip(src_tbl["doc_id"], src_tbl["text"]):
        terms, _, tfs, _ = batch_term_doc_tf(
            np.asarray([0]), np.asarray([t], dtype=object)
        )
        order = np.argsort(terms)  # searchsorted needs a SORTED term array
        terms, tfs = terms[order], tfs[order]
        w = tfs.astype(np.float64) * _idf_lookup(vocab, idf, terms)
        src_vecs[int(d)] = (terms, w, float(np.sqrt((w * w).sum())))
    src_ref = _ray.put((vocab, idf, src_vecs))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        voc, idfs, srcs = _ray.get(src_ref)
        terms, doc_ids, tfs, _ = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        if len(terms) == 0:
            return pd.DataFrame({
                "src": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "cos": pd.Series([], dtype=np.float64),
            })
        w = tfs.astype(np.float64) * _idf_lookup(voc, idfs, terms)
        docs, dinv = np.unique(doc_ids, return_inverse=True)
        norms = np.sqrt(np.bincount(dinv, weights=w * w, minlength=len(docs)))
        out_s, out_d, out_c = [], [], []
        for sid, (sterms, sw, snorm) in srcs.items():
            spos = np.searchsorted(sterms, terms)
            spos_c = np.clip(spos, 0, len(sterms) - 1)
            shared = sterms[spos_c] == terms
            dots = np.bincount(
                dinv[shared], weights=w[shared] * sw[spos_c[shared]],
                minlength=len(docs),
            )
            denom = norms * snorm
            cos = np.round(
                np.divide(dots, denom, out=np.zeros_like(dots),
                          where=denom > 0), 6,
            )
            keep = (docs != sid) & (cos > 0)
            order = np.lexsort((docs[keep], -cos[keep]))[:RELATED_K]
            out_s.extend([sid] * len(order))
            out_d.extend(docs[keep][order].tolist())
            out_c.extend(cos[keep][order].tolist())
        return pd.DataFrame({
            "src": pd.Series(out_s, dtype=np.int64),
            "doc_id": pd.Series(out_d, dtype=np.int64),
            "cos": pd.Series(out_c, dtype=np.float64),
        })

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    parts = parts.sort_values(["src", "cos", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort", ignore_index=True)
    parts["rank"] = (parts.groupby("src").cumcount() + 1).astype(np.int64)
    out = parts[parts["rank"] <= RELATED_K].reset_index(drop=True)
    return out[["src", "rank", "doc_id", "cos"]]


def _related_sql() -> str:
    srcs = ", ".join(str(s) for s in RELATED_SRC_DOCS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(((SELECT n FROM nd) + 1.0) / (dfreq.df + 1.0)) AS w
  FROM tf JOIN dfreq USING (term)),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT s.doc_id AS src, o.doc_id AS doc_id, sum(s.w * o.w) AS dot
  FROM w s JOIN w o ON o.term = s.term AND o.doc_id <> s.doc_id
  WHERE s.doc_id IN ({srcs})
  GROUP BY s.doc_id, o.doc_id),
cosd AS (
  SELECT d.src, d.doc_id,
         round(d.dot / (ns.nrm * no.nrm), 6) AS cos
  FROM dots d
  JOIN norms ns ON ns.doc_id = d.src
  JOIN norms no ON no.doc_id = d.doc_id
  WHERE ns.nrm > 0 AND no.nrm > 0)
SELECT CAST(src AS BIGINT) AS src,
       CAST(row_number() OVER (PARTITION BY src
                               ORDER BY cos DESC, doc_id) AS BIGINT) AS rank,
       doc_id, cos
FROM cosd WHERE cos > 0
QUALIFY rank <= {RELATED_K}
ORDER BY src, rank
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
    from ..functions.tokenize import batch_term_doc_tf

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


# explain / debugQuery: per-term score decomposition of the top-3 docs of
# the flagship query — every (doc, term) contribution hash-checked against
# the SQL rendition of the same BM25 expression.


def bm25_explain_top3(sf_dir: str) -> pd.DataFrame:
    from ..index.query import explain

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


# quality-weighted sampling: keep probability = the hashed classifier's
# per-doc score (integer-exact, so the WHOLE weighted-sampling decision is
# hash-checkable): keep iff md5(salt:id) < floor(p * 2^64). At scale this
# is a map_batches filter over the score stream; here the 6-dp-rounded p
# and the exact-power-of-two scaling make engine and SQL thresholds
# bit-identical doubles.
QWS_SALT = "qws1"

_DSIR_BUCKETS = 1024


def dsir_weights_lang_en(sf_dir: str) -> pd.DataFrame:
    """DSIR importance weights (hashed-unigram model), target = the lang='en'
    slice of the documents table. One row per doc: (doc_id, n_tokens,
    logratio, gkey) — gkey is the Gumbel-perturbed selection key, so the
    resample itself is just a sort on this hash-checked table."""
    from .curation import dsir_weights

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    out = dsir_weights(
        ds, lambda df: (df["lang"] == "en").to_numpy(),
        n_buckets=_DSIR_BUCKETS,
    )
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


def _dsir_sql(n_buckets: int = _DSIR_BUCKETS, salt: str = "dsir") -> str:
    """SQL reproduction of curation.dsir_weights: same md5 bucket hash, same
    0.5-additive smoothing, same rounded-then-perturbed key arithmetic
    ((h→DOUBLE + 0.5) / 2^64 matches numpy's astype(float64) rounding)."""
    u64f = "18446744073709551616.0"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter({TOK_SQL}, x -> x <> '')) AS term
  FROM documents),
bt AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(term), 1, 16)) AS UBIGINT)
              % {n_buckets} AS BIGINT) AS bucket
  FROM toks),
model AS (
  SELECT bucket, count(*) AS cf_raw,
         count(*) FILTER (
           WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
         ) AS cf_tgt
  FROM bt GROUP BY bucket),
tot AS (SELECT sum(cf_raw) AS nr, sum(cf_tgt) AS nt FROM model),
lr AS (
  SELECT bucket,
         ln((cf_tgt + 0.5) / (nt + 0.5 * {n_buckets}))
         - ln((cf_raw + 0.5) / (nr + 0.5 * {n_buckets})) AS lr
  FROM model, tot),
per_doc AS (
  SELECT b.doc_id, count(*) AS n_tokens, sum(l.lr) AS s
  FROM bt b JOIN lr l ON l.bucket = b.bucket GROUP BY b.doc_id),
g AS (
  SELECT d.doc_id,
         CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
         round(coalesce(p.s / p.n_tokens, 0.0), 6) AS logratio,
         -ln(-ln((CAST(CAST(('0x' || substr(md5('{salt}:' ||
             CAST(d.doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS DOUBLE)
             + 0.5) / {u64f})) AS gum
  FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id)
SELECT doc_id, n_tokens, logratio, round(logratio + gum, 6) AS gkey
FROM g ORDER BY doc_id
"""


def temperature_sample_by_source(sf_dir: str) -> pd.DataFrame:
    """UniMax-style temperature sampling over documents.source (τ=0.5,
    budget 50%): small domains sample at higher rates toward uniform; keep
    decisions are the md5-threshold Bernoulli, so the whole (doc_id, source,
    rate, keep) table hash-checks."""
    from .curation import temperature_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    out = temperature_sample(ds, group_col="source", tau=0.5, budget_frac=0.5)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


SQL_TEMPERATURE_SAMPLE = """
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
tot AS (SELECT sum(n) AS n_total, sum(pow(n, 0.5)) AS z FROM counts),
rates AS (
  SELECT source,
         round(least(1.0, (0.5 * n_total) * (pow(n, 0.5) / z) / n), 6) AS rate
  FROM counts, tot)
SELECT d.doc_id, d.source, r.rate,
       CASE WHEN r.rate >= 1.0 THEN TRUE
            ELSE CAST(('0x' || substr(md5('temp:' ||
                 CAST(d.doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)
                 < CAST(floor(r.rate * 18446744073709551616.0) AS UBIGINT)
       END AS keep
FROM documents d JOIN rates r ON r.source = d.source
ORDER BY d.doc_id
"""


def line_dedup_boilerplate(sf_dir: str) -> pd.DataFrame:
    """CCNet-style cross-document line dedup. The bench corpus has no
    newlines, so the entry derives a deterministic lined view first —
    ``replace(text, ' table ', '\\n')`` on BOTH engine and SQL sides — then
    drops every line occurring in ≥ 20 distinct docs."""
    from .curation import line_dedup

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_lines(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = [t.replace(" table ", "\n") for t in df["text"]]
        return df

    out = line_dedup(ds.map_batches(to_lines, batch_format="pandas"), min_df=20)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


SQL_LINE_DEDUP = """
WITH lined AS (
  SELECT doc_id, replace(text, ' table ', chr(10)) AS t FROM documents),
lines AS (
  SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM lined),
hashes AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(line), 1, 16)) AS UBIGINT) AS h
  FROM lines),
dfreq AS (SELECT h, count(*) AS df FROM hashes GROUP BY h),
bp AS (
  SELECT coalesce(list(h), CAST([] AS UBIGINT[])) AS l
  FROM dfreq WHERE df >= 20),
final AS (
  SELECT o.doc_id, string_split(o.t, chr(10)) AS ls,
         list_filter(string_split(o.t, chr(10)),
           x -> NOT list_contains(bp.l,
                CAST(('0x' || substr(md5(x), 1, 16)) AS UBIGINT))) AS kept
  FROM lined o, bp)
SELECT doc_id,
       array_to_string(kept, chr(10)) AS text,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(ls) - len(kept) AS BIGINT) AS n_dropped
FROM final ORDER BY doc_id
"""


def intra_doc_line_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Within-doc repeated-line removal. Same deterministic lined view as
    line_dedup_boilerplate (``replace(text, ' table ', '\\n')`` on both
    sides); every later repeat of a line inside one doc is dropped."""
    from .curation import intra_doc_line_dedup

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_lines(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = [t.replace(" table ", "\n") for t in df["text"]]
        return df

    out = intra_doc_line_dedup(ds.map_batches(to_lines, batch_format="pandas"))
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


SQL_INTRA_DOC_LINE_DEDUP = """
WITH lined AS (
  SELECT doc_id, replace(text, ' table ', chr(10)) AS t FROM documents),
lines AS (
  SELECT doc_id,
         unnest(string_split(t, chr(10))) AS line,
         unnest(range(1, len(string_split(t, chr(10))) + 1)) AS ord
  FROM lined),
firsts AS (
  SELECT doc_id, line, ord,
         min(ord) OVER (PARTITION BY doc_id, line) AS mn
  FROM lines),
agg AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY ord) FILTER (WHERE ord = mn)
           AS text,
         count(*) AS n_lines,
         count(*) FILTER (WHERE ord <> mn) AS n_dropped
  FROM firsts GROUP BY doc_id)
SELECT doc_id, coalesce(text, '') AS text,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_dropped AS BIGINT) AS n_dropped
FROM agg ORDER BY doc_id
"""


_SSD_K = 5
_SSD_MIN_DF = 2


def substring_dedup_rewrite(sf_dir: str) -> pd.DataFrame:
    """Lee et al. exact duplicated-substring removal: every token covered by
    a 5-token shingle occurring in ≥ 2 distinct docs is dropped; output text
    is the space-joined kept tokens under the shared tokenizer contract."""
    from .curation import substring_span_dedup

    out = substring_span_dedup(_docs(sf_dir), k=_SSD_K, min_df=_SSD_MIN_DF)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


def _substring_dedup_sql(k: int = _SSD_K, min_df: int = _SSD_MIN_DF) -> str:
    parts = " || ' ' || ".join(f"t[g.i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
sh AS (
  SELECT doc_id, g.i AS st,
         CAST(('0x' || substr(md5({parts}), 1, 16)) AS UBIGINT) AS h
  FROM toks CROSS JOIN LATERAL
       (SELECT unnest(range(1, len(t) - {k} + 2)) AS i) g
  WHERE len(t) >= {k}),
dup AS (
  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM sh GROUP BY h)
  WHERE df >= {min_df}),
cov AS (
  SELECT DISTINCT sh.doc_id, sh.st + o.o AS pos
  FROM sh JOIN dup USING (h)
  CROSS JOIN LATERAL (SELECT unnest(range({k})) AS o) o),
tok_rows AS (
  SELECT doc_id, g.i AS pos, t[g.i] AS tok
  FROM toks CROSS JOIN LATERAL
       (SELECT unnest(range(1, len(t) + 1)) AS i) g),
kept AS (
  SELECT tr.doc_id, tr.pos, tr.tok
  FROM tok_rows tr LEFT JOIN cov c
       ON c.doc_id = tr.doc_id AND c.pos = tr.pos
  WHERE c.pos IS NULL),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(a.text, '') AS text,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id
ORDER BY t.doc_id
"""


_CROP_L = 12
_CROP_SALT = "crop1"


def contrastive_crop_pairs(sf_dir: str) -> pd.DataFrame:
    """Contriever/SimCSE positive-pair crops: two deterministic
    non-overlapping 12-token windows per eligible doc."""
    from .curation import contrastive_crops

    out = contrastive_crops(_docs(sf_dir), crop_len=_CROP_L, salt=_CROP_SALT)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


def _crops_sql(L: int = _CROP_L, salt: str = _CROP_SALT) -> str:
    def h(sub: str) -> str:
        return (f"CAST(('0x' || substr(md5('{salt}:{sub}:' || "
                f"CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)")

    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
elig AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= {2 * L}),
offa AS (
  SELECT doc_id, t, n,
         CAST({h('a')} % CAST(n - {2 * L} + 1 AS UBIGINT) AS BIGINT) AS a
  FROM elig),
offb AS (
  SELECT doc_id, t, a,
         a + {L} + CAST({h('b')}
             % CAST(n - {L} - (a + {L}) + 1 AS UBIGINT) AS BIGINT) AS b
  FROM offa)
SELECT doc_id,
       array_to_string(t[a + 1 : a + {L}], ' ') AS crop_a,
       array_to_string(t[b + 1 : b + {L}], ' ') AS crop_b
FROM offb ORDER BY doc_id
"""


def ccnet_ppl_buckets_by_lang(sf_dir: str) -> pd.DataFrame:
    """CCNet head/middle/tail perplexity terciles per language over the
    corpus-trained bigram LM score; NTILE(3) semantics mirrored exactly
    (rounded-score rank, doc_id tie-break)."""
    from .curation import ccnet_ppl_buckets

    out = ccnet_ppl_buckets(_docs(sf_dir))
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


def _ccnet_buckets_sql() -> str:
    return f"""
WITH scored AS ({SQL_BIGRAM_QUALITY})
SELECT s.doc_id, d.lang, s.avg_logprob,
       CASE NTILE(3) OVER (PARTITION BY d.lang
                           ORDER BY s.avg_logprob DESC, s.doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS ppl_bucket
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY s.doc_id
"""


def quality_weighted_sample(sf_dir: str) -> pd.DataFrame:
    from .curation import _hash_u64_vec

    scores = classifier_quality_scores(sf_dir)
    h = _hash_u64_vec(QWS_SALT, scores["doc_id"].to_numpy(np.int64))
    thr = np.floor(scores["p"].to_numpy(np.float64) * 2.0 ** 64)
    kept = scores.loc[h < thr.astype(np.uint64)].reset_index(drop=True)
    return kept[["doc_id", "p"]].sort_values("doc_id", ignore_index=True)


def _qws_sql() -> str:
    base = _classifier_sql().rstrip()
    hash_expr = (
        "CAST(('0x' || substr(md5('" + QWS_SALT
        + ":' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)"
    )
    return f"""
WITH scored AS ({base})
SELECT doc_id, p FROM scored
WHERE {hash_expr}
      < CAST(floor(p * 18446744073709551616.0) AS UBIGINT)
ORDER BY doc_id
"""


# per-doc TF-IDF keyword extraction: every document's top-3 terms by
# tf * ln((N+1)/(df+1)) — the corpus-wide significant-terms-per-doc pass a
# training-data pipeline uses for topic tagging. The vocabulary (term, df)
# comes from the index's sealed termstats and broadcasts once; the corpus
# never shuffles.
TFIDF_K = 3


def tfidf_keywords_top3(sf_dir: str) -> pd.DataFrame:
    from ..index.build import termstats_dir
    from ..index.segments import read_stats
    from .textstats import tfidf_keywords

    idx = _build_docs_index(sf_dir)
    ts = (
        ray.data.read_parquet(termstats_dir(idx), columns=["term", "df"])
        .to_pandas()
        .sort_values("term", ignore_index=True)
    )
    n_docs = int(read_stats(idx)["n_docs"])
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = tfidf_keywords(
        ds, ts["term"].to_numpy(), ts["df"].to_numpy(np.int64), n_docs,
        k=TFIDF_K,
    ).to_pandas()
    return out.sort_values(["doc_id", "rank"], ignore_index=True)


def _tfidf_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term,
         round(t.tf * ln(((SELECT n FROM nd) + 1.0) / (d.df + 1.0)), 6)
           AS tfidf
  FROM tf t JOIN dfreq d USING (term)),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rank AS BIGINT) AS rank,
       term, tfidf
FROM ranked WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
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
    from ..index.query import get_pool

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


# Solr {!join from=user_id to=doc_id}: cross-table semi-join query — rank
# only documents whose id appears on the join side (purchase events). The
# join side is distilled DISTRIBUTED (column-pruned + predicate-pushed
# events read, distinct), and being orders of magnitude smaller than the
# corpus it broadcasts as a whitelist predicate evaluated shard-locally —
# a broadcast semi-join, never a corpus shuffle.
JOIN_EVENT_TYPE = "purchase"


def bm25_join_topk(sf_dir: str):
    import pyarrow.dataset as pads

    idx = _build_docs_index(sf_dir)
    ids = sorted(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id"],
            filter=(pads.field("event_type") == JOIN_EVENT_TYPE),
        ).unique("user_id")
    )
    return _ranked_topk(idx, where=pads.field("doc_id").isin(ids))


def _bm25_join_sql() -> str:
    return _bm25_sql().replace(
        "FROM scores)",
        "FROM scores WHERE doc_id IN (SELECT DISTINCT user_id FROM events "
        f"WHERE event_type = '{JOIN_EVENT_TYPE}'))",
    )


# Solr {!graph from= to= maxDepth=N}: expand a seed match set along an
# edge relation. The corpus has no explicit ref hierarchy, so the entry
# derives a deterministic containment tree on BOTH sides:
# parent(doc) = doc_id // 10 (docs < 10 are roots). Seeds are the
# conjunctive boolean match set of GRAPH_SEED_QUERY; traversal walks
# child -> parent (ancestor closure) for GRAPH_MAX_DEPTH hops.
GRAPH_SEED_QUERY = "data stream"
GRAPH_MAX_DEPTH = 3


def graph_expand_matches(sf_dir: str) -> pd.DataFrame:
    from ..index.query import get_pool
    from .components import graph_traverse

    idx = _build_docs_index(sf_dir)
    seeds = get_pool(idx).matching_doc_ids(GRAPH_SEED_QUERY, "and")

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        m = ids >= 10
        return pd.DataFrame({"src": ids[m], "dst": ids[m] // 10})

    edges = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(to_edges, batch_format="pandas")
    out = graph_traverse(edges, seeds, GRAPH_MAX_DEPTH)
    return out.rename(columns={"node": "doc_id"})


def _graph_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(GRAPH_SEED_QUERY.lower())))
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
seeds AS (
  SELECT doc_id FROM (SELECT DISTINCT doc_id, term FROM toks
                      WHERE term IN ({in_list}))
  GROUP BY doc_id HAVING count(*) = {len(terms)}),
reach(doc_id, depth) AS (
  SELECT doc_id, 0 AS depth FROM seeds
  UNION ALL
  SELECT doc_id // 10, depth + 1 FROM reach
  WHERE depth < {GRAPH_MAX_DEPTH} AND doc_id >= 10)
SELECT doc_id, CAST(min(depth) AS BIGINT) AS depth
FROM reach GROUP BY doc_id ORDER BY doc_id
"""


def bm25_cursor_page2(sf_dir: str):
    """Deep paging via cursorMark (Solr search-after): page 1's last
    (rounded score, doc_id) becomes each query's cursor; the pool then
    ranks ONLY docs strictly after the mark — k rows per shard leave the
    workers regardless of page depth (vs start+rows for offset paging).
    Result contract identical to bm25_page2 (global ranks 11..20)."""
    from ..index.query import get_pool

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
    from ..index.query import get_pool

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
    from ..index.query import get_pool

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
    from ..functions.tokenize import tokenize_text
    from ..index.build import BuildConfig, build_index

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
    from ..index.multifield import dismax_topk

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
    from ..index.mlt import more_like_this

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
    from ..index.prefix import browse_terms

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
    from ..index.prefix import browse_terms_infix

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
    from ..index.query import bm25_topk

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
    from ..index.query import bm25_topk

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
    from ..index.fuzzy import fuzzy_topk

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
    from ..index.query import get_pool

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
    from ..index.query import get_pool

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
    from ..index.query import get_pool

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
    from ..index.spellcheck import spellcheck

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
    from ..index.query import facet_counts

    return facet_counts(_build_docs_index(sf_dir), "lang", text=FACET_QUERY, mode="and")


def facet_source_disjunctive(sf_dir: str):
    """OR-mode boolean retrieval + facet: source facet counts over docs
    containing ANY term of the query."""
    from ..index.query import facet_counts

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


# --------------------------- similarity ------------------------------------


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
    from .similarity import label_centroids

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
    from .similarity import knn_label_confusion

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

    from .similarity import knn_filtered

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
    from .percolate import percolate

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

    from ..functions.tokenize import stem_text

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
    from ..index.build import BuildConfig, build_index
    from ..functions.tokenize import stem_token

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
    from ..functions.tokenize import STEM_SQL_CASE, stem_token

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
    from .percolate import percolate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = percolate(ds, PERCOLATE_PHRASE_TERM,
                    phrase_queries=PERCOLATE_PHRASES).to_pandas()
    return out.sort_values(["doc_id", "query_id"], ignore_index=True)


def _percolate_phrase_sql() -> str:
    from ..index.phrase import phrase_needle

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
    from .similarity import knn_mmr

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


# --------------------------- general engine ops -----------------------------


def events_hourly(sf_dir: str):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # unit-independent epoch seconds (ts may be us- or ns-resolution)
        hour = df["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        g = df.assign(hour_epoch=hour).groupby(["user_id", "hour_epoch"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return g

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(
        ds, ["user_id", "hour_epoch"], partial,
        {"n_events": "sum", "sum_value": "sum"},
    )
    pdf = agg.to_pandas()
    pdf["sum_value"] = pdf["sum_value"].round(6)
    return pdf


SQL_EVENTS_HOURLY = """
SELECT user_id,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


_COMPOSITE_PAGE = 10


def events_composite_page2(sf_dir: str) -> pd.DataFrame:
    """ES composite aggregation with after-key paging: buckets keyed
    (event_type, day) stream in ascending key order, size 10; page 2 is
    the 10 buckets strictly AFTER page 1's last key — the after_key round
    trip a client actually performs. The bucket table is one keyed tree
    aggregation (facet-sized); paging is key-comparison, never offset
    re-scan."""
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("D").astype("datetime64[s]").astype("int64")
        g = df.assign(day_epoch=day).groupby(
            ["event_type", "day_epoch"], as_index=False
        ).size().rename(columns={"size": "n_events"})
        return g

    pdf = tree_aggregate(
        ds, ["event_type", "day_epoch"], partial, {"n_events": "sum"}
    ).to_pandas().sort_values(["event_type", "day_epoch"], ignore_index=True)
    pdf["n_events"] = pdf["n_events"].astype(np.int64)
    P = _COMPOSITE_PAGE
    after_type, after_day = pdf.iloc[P - 1][["event_type", "day_epoch"]]
    later = pdf[
        (pdf["event_type"] > after_type)
        | ((pdf["event_type"] == after_type) & (pdf["day_epoch"] > after_day))
    ]
    return later.head(P).reset_index(drop=True)[
        ["event_type", "day_epoch", "n_events"]
    ]


SQL_EVENTS_COMPOSITE_PAGE2 = f"""
WITH buckets AS (
  SELECT event_type,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2),
ordered AS (
  SELECT *, row_number() OVER (ORDER BY event_type, day_epoch) AS rn
  FROM buckets)
SELECT event_type, day_epoch, n_events FROM ordered
WHERE rn > {_COMPOSITE_PAGE} AND rn <= {2 * _COMPOSITE_PAGE}
ORDER BY event_type, day_epoch
"""


def q1_pricing(sf_dir: str):
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    cutoff = pd.Timestamp("1997-01-01")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] < cutoff]
        df = df.assign(disc_price=df["l_extendedprice"] * (1 - df["l_discount"]))
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(
        ds, ["l_returnflag", "l_linestatus"], partial,
        {"sum_qty": "sum", "sum_base_price": "sum", "sum_disc_price": "sum",
         "count_order": "sum"},
    )
    pdf = agg.to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        pdf[c] = pdf[c].round(4)
    return pdf


SQL_Q1_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def top10_customers_revenue(sf_dir: str):
    """Broadcast join: customer (small side) shipped once via ray.put."""
    import ray

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(
        orders, ["o_custkey"], partial, {"revenue": "sum", "n_orders": "sum"}
    )
    pdf = agg.to_pandas()
    names = ray.get(cust_ref)
    pdf["c_name"] = pdf["o_custkey"].map(names)
    pdf["revenue"] = pdf["revenue"].round(4)
    pdf = pdf.sort_values(["revenue", "o_custkey"], ascending=[False, True],
                          kind="mergesort").head(10).reset_index(drop=True)
    return pdf.rename(columns={"o_custkey": "c_custkey"})[
        ["c_custkey", "c_name", "revenue", "n_orders"]
    ]


SQL_TOP10_CUSTOMERS = """
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


def dirty_refs(sf_dir: str):
    """A1/O5-style union + distinct over two discovery paths."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type"])
    clicks = ds.map_batches(
        lambda df: df.loc[df["event_type"] == "click", ["user_id"]].drop_duplicates(),
        batch_format="pandas",
    )
    errors = ds.map_batches(
        lambda df: df.loc[df["event_type"] == "error", ["user_id"]].drop_duplicates(),
        batch_format="pandas",
    )
    from .docpipe import distinct

    out = distinct(clicks.union(errors), "user_id")
    return out.map_batches(
        lambda df: df.rename(columns={"user_id": "ref"}), batch_format="pandas"
    )


SQL_DIRTY_REFS = """
SELECT DISTINCT user_id AS ref FROM events WHERE event_type IN ('click', 'error')
"""


def date_age_buckets(sf_dir: str):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_orderkey", "o_orderdate"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # .dt.year is int32; SQL side is BIGINT — match dtypes exactly
        year = df["o_orderdate"].dt.year.astype(np.int64)
        age = (NOW_YEAR - year).astype(np.int64)
        bucket = np.where(age > 50, "More than 50 years ago", "Last 50 years")
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"], "order_year": year, "age_bucket": bucket}
        )

    return ds.map_batches(fn, batch_format="pandas")


SQL_DATE_AGE_BUCKETS = f"""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CASE WHEN {NOW_YEAR} - year(o_orderdate) > 50
            THEN 'More than 50 years ago' ELSE 'Last 50 years' END AS age_bucket
FROM orders
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

    from ..state.aggregates import tree_aggregate

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


def doc_length_histogram(sf_dir: str):
    """Token-count histogram (50-token bins)."""
    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        findall = TOKEN_RE.findall
        n = np.fromiter(
            (len(findall(t.lower())) for t in df["text"]), dtype=np.int64,
            count=len(df),
        )
        b = (n // 50) * 50
        out = pd.DataFrame({"bin_lo": b})
        return out.groupby("bin_lo", as_index=False).size().rename(
            columns={"size": "n_docs"}
        )

    from ..state.aggregates import tree_aggregate

    return tree_aggregate(ds, ["bin_lo"], partial, {"n_docs": "sum"})


SQL_DOC_LENGTH_HISTOGRAM = f"""
SELECT (n_tokens // 50) * 50 AS bin_lo, CAST(count(*) AS BIGINT) AS n_docs
FROM (SELECT CAST(len(list_filter({TOK_SQL}, x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents)
GROUP BY 1
"""


def revenue_by_nation(sf_dir: str):
    """Two-hop broadcast join: orders → customer → nation (J1-style chain)."""
    import ray

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust_nation = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    nation_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put((cust_nation, nation_name))

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cn, nn = ray.get(ref)
        df = df.assign(
            n_name=df["o_custkey"].map(lambda c: nn[cn[c]])
        )
        return df.groupby("n_name", as_index=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )

    from ..state.aggregates import tree_aggregate

    out = tree_aggregate(orders, ["n_name"], partial,
                         {"revenue": "sum", "n_orders": "sum"}).to_pandas()
    out["revenue"] = out["revenue"].round(4)
    return out


SQL_REVENUE_BY_NATION = """
SELECT n_name, round(sum(o_totalprice), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


SESSION_GAP_MIN = 30
SESSION_BUCKETS = 64


def user_sessions(sf_dir: str):
    """Streaming-shaped sessionization: 30-min-gap sessions per user.

    Shuffles by a HASH BUCKET of the user id (one Python call per bucket,
    not per user — Ray's map_groups pays a call per group, the repo's
    measured worst cost) and computes every user's session count inside the
    bucket with one vectorized sort + diff pass."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        # a session starts at a user's first event or after a >30 min gap;
        # the user-boundary OR makes the cross-user diff irrelevant
        new_sess = g["user_id"].ne(g["user_id"].shift()) | (g["ts"].diff() > gap)
        out = (
            g.assign(__ns__=new_sess)
            .groupby("user_id", as_index=False)
            .agg(n_events=("__ns__", "size"), n_sessions=("__ns__", "sum"))
        )
        return out.astype({"n_events": np.int64, "n_sessions": np.int64})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Per-user event-type transition (Markov) counts — the behavioral
    matrix behind next-event prediction and funnel design: for every pair
    of CONSECUTIVE events of one user (ordered by ts, event_id tie-break),
    count (prev_type → next_type). Same bounded hash-bucket shuffle as
    ``user_sessions`` (never a per-user group), one vectorized sort + shift
    pass per bucket; each bucket emits at most |types|² rows."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    def trans_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        out = pd.DataFrame({
            "prev_type": g["event_type"].shift()[same],
            "next_type": g["event_type"][same],
        })
        c = out.groupby(["prev_type", "next_type"], as_index=False).size()
        return c.rename(columns={"size": "n"}).astype({"n": np.int64})

    parts = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(trans_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["prev_type", "next_type"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["prev_type", "next_type"], ignore_index=True)


SQL_EVENT_TRANSITIONS = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM ordered WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
"""


SQL_USER_SESSIONS = f"""
WITH marked AS (
  SELECT user_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(new_session) AS BIGINT) AS n_sessions
FROM marked GROUP BY user_id
"""


ROLLING_WINDOW_S = 3 * 3600


def events_rolling_3h(sf_dir: str):
    """Sliding-window aggregate (streaming window surface): per user, each
    hourly bucket with its TRAILING 3-hour event count and value sum.

    Two stages: the hourly pre-aggregate (tree merge — one row per
    (user, hour) leaves each batch), then a hash-bucket shuffle by user and
    a per-bucket vectorized pass: cumulative sums + searchsorted give every
    row's trailing-window total without a per-row Python loop."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hour = df["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        return df.assign(hour_epoch=hour).groupby(
            ["user_id", "hour_epoch"], as_index=False
        ).agg(n_events=("value", "size"), sv=("value", "sum"))

    from ..state.aggregates import tree_aggregate

    hourly = tree_aggregate(ds, ["user_id", "hour_epoch"], partial,
                            {"n_events": "sum", "sv": "sum"})

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "hour_epoch"], kind="mergesort",
                          ignore_index=True)
        h = g["hour_epoch"].to_numpy(np.int64)
        c = g["n_events"].to_numpy(np.int64)
        v = g["sv"].to_numpy(np.float64)
        uid = g["user_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(g)]
        n3 = np.empty(len(g), np.int64)
        v3 = np.empty(len(g), np.float64)
        for s_, e_ in zip(starts, ends):
            hh = h[s_:e_]
            cc = np.cumsum(c[s_:e_])
            vv = np.cumsum(v[s_:e_])
            lo = np.searchsorted(hh, hh - ROLLING_WINDOW_S, side="left")
            n3[s_:e_] = cc - np.where(lo > 0, cc[lo - 1], 0)
            v3[s_:e_] = vv - np.where(lo > 0, vv[lo - 1], 0.0)
        return pd.DataFrame(
            {"user_id": uid, "hour_epoch": h, "n_events": c,
             "n_events_3h": n3, "sum_value_3h": np.round(v3, 6)}
        )

    return (
        hourly.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(roll, batch_format="pandas")
    )


SQL_EVENTS_ROLLING_3H = f"""
WITH hourly AS (
  SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         CAST(count(*) AS BIGINT) AS n_events, sum(value) AS sv
  FROM events GROUP BY 1, 2)
SELECT user_id, hour_epoch, n_events,
       CAST(sum(n_events) OVER w AS BIGINT) AS n_events_3h,
       round(sum(sv) OVER w, 6) AS sum_value_3h
FROM hourly
WINDOW w AS (PARTITION BY user_id ORDER BY hour_epoch
             RANGE BETWEEN {ROLLING_WINDOW_S} PRECEDING AND CURRENT ROW)
"""


def q3_revenue_join(sf_dir: str):
    """Big×big bucketed hash join (no broadcast side): lineitem ⋈ orders on
    orderkey, revenue per 1996 order, top 10."""
    from .joins import hash_join

    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    ).map_batches(
        lambda df: df[
            (df["o_orderdate"] >= pd.Timestamp("1996-01-01"))
            & (df["o_orderdate"] < pd.Timestamp("1997-01-01"))
        ][["o_orderkey"]].reset_index(drop=True),
        batch_format="pandas",
    )
    joined = hash_join(lineitem, orders, on="o_orderkey", n_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1 - df["l_discount"]))
        return df.groupby("o_orderkey", as_index=False).agg(
            revenue=("rev", "sum"), n_items=("rev", "size")
        )

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(joined, ["o_orderkey"], partial,
                         {"revenue": "sum", "n_items": "sum"}).to_pandas()
    agg["revenue"] = agg["revenue"].round(4)
    agg = agg.sort_values(["revenue", "o_orderkey"], ascending=[False, True],
                          kind="mergesort").head(10).reset_index(drop=True)
    return agg


SQL_Q3_REVENUE_JOIN = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


QUANTILE_QS = [0.1, 0.5, 0.9, 0.99]


def value_quantiles(sf_dir: str):
    """Exact distributed quantiles of events.value — two streaming passes
    (histogram bracket + pruned collect), no global sort; matches
    quantile_cont / numpy linear interpolation exactly."""
    from .quantiles import exact_quantiles

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    out = exact_quantiles(ds, "value", QUANTILE_QS)
    out["value"] = out["value"].round(6)
    return out


SQL_VALUE_QUANTILES = f"""
WITH qv AS (SELECT quantile_cont(value, {QUANTILE_QS}) AS vs FROM events)
SELECT unnest({QUANTILE_QS}) AS q, round(unnest(vs), 6) AS value FROM qv
"""


def grouped_value_quantiles(sf_dir: str):
    """Per-event-type exact quantiles of events.value (Solr stats.facet /
    JSON-facet percentile sub-aggregation): the same histogram-bracket +
    pruned-collect passes, keyed by group — one histogram pass covers
    every group."""
    from .quantiles import grouped_quantiles

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    out = grouped_quantiles(ds, "event_type", "value", QUANTILE_QS)
    out["value"] = out["value"].round(6)
    return out


SQL_GROUPED_QUANTILES = f"""
WITH qv AS (
  SELECT event_type, quantile_cont(value, {QUANTILE_QS}) AS vs
  FROM events GROUP BY event_type)
SELECT event_type, unnest({QUANTILE_QS}) AS q, round(unnest(vs), 6) AS value
FROM qv ORDER BY event_type, q
"""


def customer_running_revenue(sf_dir: str):
    """Partitioned window function — SQL ``sum(cents) OVER (PARTITION BY
    custkey ORDER BY orderdate, orderkey)`` — as a distributed segmented
    scan (one sort shuffle + two streaming passes; driver state is the
    per-(block, partition) summary, ≈ n_parts + n_blocks rows). Money is
    summed in exact int64 cents on both sides."""
    from ..state.scan import grouped_prefix_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                    pa.int64())
        return t.append_column("cents", c)

    out = grouped_prefix_sum(
        ds.map_batches(cents, batch_format="pyarrow"),
        "o_custkey", ["o_orderdate", "o_orderkey"], "cents",
        out_col="run_cents",
    )
    return out.select_columns(["o_custkey", "o_orderkey", "run_cents"])


SQL_RUNNING_REVENUE = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS BIGINT) AS run_cents
FROM orders
"""


HLL_P = 12


def distinct_events_hll(sf_dir: str):
    """Approximate COUNT(DISTINCT event_id) via a tree-merged HyperLogLog
    sketch (p=12 → ~1.6% standard error). md5-based hashing makes the WHOLE
    sketch — registers, rho, estimator — reproducible in SQL, so even the
    approximate answer is hash-checked exactly."""
    from .sketches import hll_distinct

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id"])
    return hll_distinct(ds, "event_id", p=HLL_P)


def _hll_sql(p: int = HLL_P) -> str:
    from .sketches import _alpha

    m = 1 << p
    alpha = _alpha(m)  # shared with the engine — incl. small-m bias constants
    return f"""
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM events),
rr AS (
  SELECT CAST(hv >> {64 - p} AS BIGINT) AS register,
         hv & CAST({(1 << (64 - p)) - 1} AS UBIGINT) AS low
  FROM h),
rho AS (
  SELECT register,
         max(CASE WHEN low = 0 THEN {64 - p + 1}
                  ELSE {64 - p} - length(bin(low)) + 1 END) AS rho
  FROM rr GROUP BY register),
agg AS (
  SELECT coalesce(sum(power(2.0, -rho)), 0) AS s_present,
         count(*) AS n_present FROM rho),
est AS (
  SELECT {m} - n_present AS zeros,
         CAST({alpha} AS DOUBLE) * {m} * {m}
           / (s_present + ({m} - n_present) * 1.0) AS raw
  FROM agg)
SELECT CAST({m} AS BIGINT) AS n_registers,
       round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                  THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                  ELSE raw END, 6) AS estimate
FROM est
"""


def distinct_users_by_type_hll(sf_dir: str):
    """Per-event-type approximate COUNT(DISTINCT user_id): one HLL sketch
    per group, all register maxima tree-merged in ONE keyed pass; the md5
    contract hash makes every per-group estimate SQL-reproducible exactly."""
    from .sketches import hll_distinct_grouped

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "user_id"])
    return hll_distinct_grouped(ds, "user_id", "event_type", p=HLL_P)


def _hll_grouped_sql(p: int = HLL_P) -> str:
    from .sketches import _alpha

    m = 1 << p
    alpha = _alpha(m)
    return f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM events),
rr AS (
  SELECT event_type,
         CAST(hv >> {64 - p} AS BIGINT) AS register,
         hv & CAST({(1 << (64 - p)) - 1} AS UBIGINT) AS low
  FROM h),
rho AS (
  SELECT event_type, register,
         max(CASE WHEN low = 0 THEN {64 - p + 1}
                  ELSE {64 - p} - length(bin(low)) + 1 END) AS rho
  FROM rr GROUP BY event_type, register),
agg AS (
  SELECT event_type,
         coalesce(sum(power(2.0, -rho)), 0) AS s_present,
         count(*) AS n_present
  FROM rho GROUP BY event_type),
est AS (
  SELECT event_type, {m} - n_present AS zeros,
         CAST({alpha} AS DOUBLE) * {m} * {m}
           / (s_present + ({m} - n_present) * 1.0) AS raw
  FROM agg)
SELECT event_type,
       round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                  THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                  ELSE raw END, 6) AS estimate
FROM est ORDER BY event_type
"""


# Count-Min point queries: head terms, mid-frequency terms, an absent one.
CMS_D, CMS_W = 4, 1024
CMS_TERMS = ["the", "data", "hash", "window", "stream", "qzqzqz"]


def cms_term_counts(sf_dir: str):
    """Count-Min Sketch term-frequency estimates (Cormode & Muthukrishnan
    2005): the d×w counter table tree-merges in ONE keyed pass; estimates
    are min-over-rows point queries. md5-derived bucket hashes make the
    whole sketch SQL-reproducible — the approximate answer is checked
    exactly."""
    from .sketches import cms_build, cms_query

    counts = cms_build(_docs(sf_dir).select_columns(["text"]),
                       d=CMS_D, w=CMS_W)
    return cms_query(counts, CMS_TERMS, d=CMS_D, w=CMS_W)


def _cms_sql() -> str:
    rows_vals = ", ".join(f"({i})" for i in range(CMS_D))
    q_vals = ", ".join(f"('{t}')" for t in CMS_TERMS)
    bucket = (
        "CAST(CAST(('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' || {t}),"
        f" 1, 16)) AS UBIGINT) % {CMS_W} AS BIGINT)"
    )
    return f"""
WITH toks AS (
  SELECT unnest({TOK_SQL}) AS term FROM documents),
tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n
  FROM toks WHERE term <> '' GROUP BY term),
r(i) AS (VALUES {rows_vals}),
cells AS (
  SELECT r.i AS row,
         {bucket.format(i="r.i", t="tf.term")} AS bucket,
         sum(tf.n) AS n
  FROM tf CROSS JOIN r GROUP BY 1, 2),
q(term) AS (VALUES {q_vals}),
est AS (
  SELECT q.term, min(coalesce(c.n, 0)) AS estimate
  FROM q CROSS JOIN r
  LEFT JOIN cells c
    ON c.row = r.i AND c.bucket = {bucket.format(i="r.i", t="q.term")}
  GROUP BY q.term)
SELECT term, CAST(estimate AS BIGINT) AS estimate FROM est ORDER BY term
"""


def q_shipped_within_90d(sf_dir: str):
    """Range-predicate join: lineitem ⋈ orders on orderkey with
    l_shipdate ∈ [o_orderdate, o_orderdate + 90 days) — the equi-key carries
    the shuffle (bucketed hash join), the range predicate filters inside the
    joined batches, and a tree aggregate counts qualifying items per order
    month. The partitioning assumption is the join key's, not the range's."""
    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    )
    joined = hash_join(lineitem, orders, on="o_orderkey", n_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        inwin = (df["l_shipdate"] >= df["o_orderdate"]) & (
            df["l_shipdate"] < df["o_orderdate"] + pd.Timedelta(days=90)
        )
        d = df[inwin]
        month = d["o_orderdate"].dt.year * 100 + d["o_orderdate"].dt.month
        return (
            d.assign(order_month=month.astype(np.int64))
            .groupby("order_month", as_index=False)
            .agg(n_shipped_90d=("o_orderkey", "size"))
        )

    out = tree_aggregate(joined, ["order_month"], partial,
                         {"n_shipped_90d": "sum"}).to_pandas()
    return out.astype({"order_month": np.int64, "n_shipped_90d": np.int64})


SQL_SHIPPED_WITHIN_90D = """
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS order_month,
       CAST(count(*) AS BIGINT) AS n_shipped_90d
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
GROUP BY 1
"""


def asof_view_before_purchase(sf_dir: str):
    """As-of join: for each purchase event, the same user's most recent
    prior (or simultaneous) view event value; ties on ts break by highest
    event_id (deterministic)."""
    from .joins import asof_join_per_key

    ev = os.path.join(sf_dir, "events.parquet")
    purchases = ray.data.read_parquet(
        ev, columns=["user_id", "ts", "event_id", "value", "event_type"]
    ).map_batches(
        lambda df: df[df["event_type"] == "purchase"].drop(columns=["event_type"]).reset_index(drop=True),
        batch_format="pandas",
    )
    views = ray.data.read_parquet(
        ev, columns=["user_id", "ts", "event_id", "value", "event_type"]
    ).map_batches(
        lambda df: df[df["event_type"] == "view"]
        .drop(columns=["event_type"])
        .reset_index(drop=True),
        batch_format="pandas",
    )
    out = asof_join_per_key(
        purchases, views, key="user_id", ts="ts",
        value_cols=["value", "event_id"], tie_cols=["event_id"],
    ).to_pandas()
    res = pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "event_id": out["event_id"].astype(np.int64),
            "purchase_value": out["value"].round(6),
            "last_view_value": out["value_asof"].round(6),
        }
    )
    return res.sort_values("event_id", ignore_index=True)


SQL_ASOF_VIEW_BEFORE_PURCHASE = """
WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view')
SELECT p.user_id, p.event_id,
       round(p.value, 6) AS purchase_value,
       round((SELECT v.value FROM v
              WHERE v.user_id = p.user_id AND v.ts <= p.ts
              ORDER BY v.ts DESC, v.event_id DESC LIMIT 1), 6) AS last_view_value
FROM p
ORDER BY p.event_id
"""


# --------------------------- rows-only (no SQL oracle) ----------------------


def docbuilder_flagship(sf_dir: str):
    """M3 flagship doc builder over records synthesized deterministically
    from the documents table (rows-only: the nested-record transform isn't
    SQL-expressible)."""
    from .docbuilder import DimTables, build_solr_docs

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
    from .marc import circulation_records_batch

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


def embedding_near_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup via hyperplane-LSH buckets + exact verify."""
    from .dedup import embedding_near_dups

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
    from .dedup import semantic_dedup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = semantic_dedup(ds, threshold=0.4, n_planes=4)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    pdf["vec_id"] = pdf["vec_id"].astype(np.int64)
    pdf["rep_id"] = pdf["rep_id"].astype(np.int64)
    pdf["keep"] = pdf["keep"].astype(bool)
    return pdf.sort_values("vec_id", ignore_index=True)


def bm25_snippets(sf_dir: str):
    """Top-k with highlighted best-window snippets (the Solr highlighting
    surface). ORACLE-CHECKABLE: the best-window selection (max distinct
    terms, then max total hits, then earliest) and the marked-up text
    reconstruction are reproduced in SQL from token/separator runs."""
    from ..index.snippets import attach_snippets

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


def jaccard_pairs(sf_dir: str):
    """n-gram Jaccard near-dup pairs: minhash-LSH candidates verified with
    exact 3-gram shingle Jaccard (the standalone verifier entry).
    ORACLE-CHECKABLE: md5 shingle hashes + seeded permutation constants +
    FNV band mix are all SQL-reproducible (``_minhash_sql``)."""
    from .dedup import minhash_pairs

    out = minhash_pairs(_docs(sf_dir), threshold=0.5, n_perm=128, bands=32)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    pdf["sim"] = pdf["sim"].round(6)
    return pdf.sort_values(["doc_a", "doc_b"], ignore_index=True)


def _minhash_cte(
    threshold: float, bands: int, n_perm: int = 128, k_shingle: int = 3,
    seed: int = 7, source: str = "documents",
) -> str:
    """The shared minhash CTE chain (toks → … → good) over ``source`` —
    composable into pairs/components/corpus-clean oracles."""
    return _minhash_sql(
        threshold, bands, n_perm, k_shingle, seed, final="cte", source=source
    )


def _minhash_sql(
    threshold: float, bands: int, n_perm: int = 128, k_shingle: int = 3,
    seed: int = 7, final: str = "pairs", source: str = "documents",
) -> str:
    """SQL reproduction of dedup.minhash_pairs / minhash_dedup.

    Rebuilds, bit-for-bit against the engine: md5-derived shingle hashes
    (``dedup._shingle_hashes``), the seeded (a,b) permutation constants
    (inlined below), numpy's uint64-WRAPPING (a*h + b) %% Mersenne
    arithmetic, the per-band FNV-1a-style mix over perm order
    (``minhash_lsh_candidates.bandify``), banded candidate generation, and
    the exact shingle-Jaccard verify. The engine's MAX_BUCKET=256 skew cap
    is not modeled — bench-scale buckets are orders of magnitude smaller.
    ``final="components"`` adds a recursive-CTE transitive closure for the
    minhash_dedup (doc_id, rep_id) output.
    """
    from .dedup import _perm_params

    a_c, b_c = _perm_params(n_perm, seed)
    perm_rows = ", ".join(
        f"({i}, {int(a_c[i])}, {int(b_c[i])})" for i in range(n_perm)
    )
    rpb = n_perm // bands
    u64 = "18446744073709551616"
    mers = "2305843009213693951"
    fnv_off = "14695981039346656037"
    fnv_prime = "1099511628211"
    body = f"""
toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM {source}),
shing AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM (
    SELECT doc_id,
           CASE WHEN len(t) >= {k_shingle}
                THEN list_distinct(list_transform(range(1, len(t) - {k_shingle - 2}),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                ELSE [] END AS shingles
    FROM toks)),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 16)) AS UBIGINT) AS h
  FROM shing
  UNION ALL
  SELECT doc_id, CAST(0 AS UBIGINT) FROM toks WHERE len(t) = 0),
perm(pid, pa, pb) AS (VALUES {perm_rows}),
sig AS (
  SELECT doc_id, pid,
         min(CAST(((CAST(pa AS HUGEINT) * CAST(h AS HUGEINT)) % {u64}
                   + CAST(pb AS HUGEINT)) % {u64} % {mers} AS UBIGINT)) AS s
  FROM hashed CROSS JOIN perm GROUP BY doc_id, pid),
band AS (
  SELECT doc_id, pid // {rpb} AS band_id, list(s ORDER BY pid) AS sigs
  FROM sig GROUP BY doc_id, pid // {rpb}),
bh AS (
  SELECT doc_id, band_id,
         list_reduce(list_prepend(CAST({fnv_off} AS UBIGINT), sigs),
           (acc, v) -> CAST(CAST((CAST(xor(acc, v) AS HUGEINT) * {fnv_prime})
                            % {u64} AS HUGEINT) AS UBIGINT)) AS h
  FROM band),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bh x JOIN bh y
    ON x.band_id = y.band_id AND x.h = y.h AND x.doc_id < y.doc_id),
sizes AS (
  SELECT t.doc_id, CAST(count(p.shingle) AS BIGINT) AS n
  FROM toks t LEFT JOIN shing p ON p.doc_id = t.doc_id GROUP BY t.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN shing p1 ON p1.doc_id = c.doc_a
  JOIN shing p2 ON p2.doc_id = c.doc_b AND p2.shingle = p1.shingle
  GROUP BY c.doc_a, c.doc_b),
jac AS (
  SELECT c.doc_a, c.doc_b,
         CASE WHEN sa.n = 0 AND sb.n = 0 THEN 1.0
              ELSE CAST(coalesce(i.i, 0) AS DOUBLE)
                   / (sa.n + sb.n - coalesce(i.i, 0)) END AS sim
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b),
good AS (SELECT doc_a, doc_b, sim FROM jac WHERE sim >= {threshold})"""
    if final == "cte":
        return body
    if final == "pairs":
        return (
            "WITH " + body
            + "\nSELECT doc_a, doc_b, round(sim, 6) AS sim FROM good"
        )
    return (
        "WITH RECURSIVE " + body + f""",
sym AS (SELECT doc_a AS a, doc_b AS b FROM good
        UNION SELECT doc_b, doc_a FROM good),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a)
SELECT a AS doc_id, least(a, min(b)) AS rep_id FROM reach GROUP BY a"""
    )


INC_QUERIES = [(0, "the data"), (1, "model training"), (2, "user analysis")]


def incremental_update_demo(sf_dir: str):
    """Incremental index lifecycle over the documents table: build on the
    first 80%, add the rest as a delta generation, merge with the actor
    pool, then query. ORACLE: after the merge the engine must be exactly
    the BM25 SQL over the UNION corpus (= the whole documents table)."""
    import shutil

    from ..index.build import BuildConfig, build_index
    from ..index.update import add_documents, merge_segments

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

    from ..index.build import BuildConfig, build_index
    from ..index.update import delete_documents, realtime_get, update_fields

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


# --------------------------- rows-only (older entries) ----------------------


def natural_sort_parts(sf_dir: str):
    """O1: natural-order sort via key encoding. ORACLE: the same key
    encoding is expressible in DuckDB (regexp token split + zero-pad), so
    the top-50 natural ordering is fully SQL-checkable."""
    from ..functions.text import natural_sort_key

    ds = ray.data.read_parquet(os.path.join(sf_dir, "part.parquet"),
                               columns=["p_partkey", "p_name"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["nat_key"] = natural_sort_key(df["p_name"].to_numpy())
        return df

    out = (
        ds.map_batches(key, batch_format="pandas")
        .sort(["nat_key", "p_name", "p_partkey"])  # total order: exact LIMIT cut
        .limit(50)
    )
    return out.select_columns(["p_partkey", "p_name"])


# mirrors functions.text._nat_key_one: digit runs with a leading zero encode
# as '01'+digits+'!'; value runs as '02'+zero-padded-length+digits; other
# non-space chars uppercase; whitespace dropped
SQL_NATURAL_SORT_PARTS = r"""
WITH keyed AS (
  SELECT p_partkey, p_name,
         array_to_string(list_transform(regexp_extract_all(p_name, '[0-9]+|\S'),
           x -> CASE WHEN regexp_matches(x, '^[0-9]')
                     THEN CASE WHEN substr(x, 1, 1) = '0' THEN '01' || x || '!'
                          ELSE '02' || lpad(CAST(length(x) AS VARCHAR), 12, '0') || x END
                     ELSE upper(x) END), '') AS nat_key
  FROM part)
SELECT p_partkey, p_name FROM keyed
ORDER BY nat_key, p_name, p_partkey
LIMIT 50
"""


def minhash_dedup_docs(sf_dir: str):
    """MinHash near-dup clusters. ORACLE-CHECKABLE: SQL rebuilds the pair
    list (``_minhash_sql``) and closes components with a recursive CTE."""
    out = minhash_dedup(_docs(sf_dir), threshold=0.7, n_perm=128, bands=32)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values(["doc_id"], ignore_index=True)


def simhash_pairs_docs(sf_dir: str):
    """SimHash near-dup pairs. ORACLE-CHECKABLE: the 4×16-bit banding has
    recall 1.0 for Hamming ≤ 3 (pigeonhole) and the verify stage enforces
    precision, so the output is EXACTLY the set of pairs within Hamming 3 —
    which SQL reproduces with md5-derived simhashes over all pairs."""
    out = simhash_near_dups(_docs(sf_dir), max_hamming=3)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    # deterministic row order: block arrival order is not — and the driver's
    # content hash must be stable across runs
    return pdf.sort_values(["doc_a", "doc_b"], ignore_index=True)


# reproduces dedup.simhash64 bit-for-bit: md5-derived 64-bit token hashes,
# ±count per bit, strict >0 sign rule; the all-pairs join is the oracle's
# prerogative (the engine uses banding with guaranteed recall at ≤3)
SQL_SIMHASH_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter({TOK_SQL}, x -> x <> '')) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
hashed AS (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 16)) AS UBIGINT) AS h, c FROM tf),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> CAST(b.bit AS UBIGINT)) & 1 = 1 THEN c ELSE -c END) AS acc
  FROM hashed CROSS JOIN (SELECT unnest(range(64)) AS bit) b
  GROUP BY 1, 2),
sh0 AS (
  SELECT doc_id,
         CAST(CAST(sum(CASE WHEN acc > 0 THEN CAST(power(2, bit) AS HUGEINT) ELSE 0 END) AS HUGEINT) AS UBIGINT) AS simhash
  FROM bits GROUP BY doc_id),
sh AS (
  SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS UBIGINT) AS simhash
  FROM documents d LEFT JOIN sh0 s USING (doc_id)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
"""


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
    k-means codebooks aren't SQL-expressible). ADC shortlist over packed
    int64 codes (8 bytes/vector scanned) -> exact cosine rerank, so the
    returned scores are bit-comparable to brute force; recall@10 is
    pinned ≥ 0.8 by test (measured 0.95 over 8 queries at sf0.01)."""
    from .similarity import knn_pq

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = _query_vec(sf_dir, 0)
    out = knn_pq(ds, np.asarray([q0], dtype=np.float64), k=10)
    out["cos"] = out["cos"].round(6)
    return out[["rank", "vec_id", "cos"]]


def fingerprints_docs(sf_dir: str):
    """Rolling FNV-1a document fingerprints. ORACLE-CHECKABLE: FNV-1a over
    the token stream == FNV-1a over the space-joined normalized text (each
    token's bytes then a 0x20 separator), which SQL reproduces byte-for-byte
    with a list_reduce in HUGEINT mod-2^64 arithmetic."""
    from .textstats import fingerprint_batch

    return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")


SQL_FINGERPRINTS = f"""
WITH norm AS (
  SELECT doc_id,
         array_to_string(list_filter({TOK_SQL}, x -> x <> ''), ' ') AS s,
         len(list_filter({TOK_SQL}, x -> x <> '')) AS nt
  FROM documents),
fp AS (
  SELECT doc_id,
         CASE WHEN nt = 0 THEN CAST(14695981039346656037 AS UBIGINT)
              ELSE list_reduce(
                list_prepend(CAST(14695981039346656037 AS UBIGINT),
                  list_transform(string_split(s || ' ', ''), c -> CAST(ord(c) AS UBIGINT))),
                (acc, b) -> CAST(CAST((CAST(xor(acc, b) AS HUGEINT) * 1099511628211)
                                 % 18446744073709551616 AS HUGEINT) AS UBIGINT))
         END AS h
  FROM norm)
SELECT doc_id, CAST(CAST(h AS HUGEINT) - 9223372036854775808 AS BIGINT) AS fingerprint
FROM fp
"""


_WINNOW_K = 4
_WINNOW_W = 4


def winnow_fingerprints_docs(sf_dir: str) -> pd.DataFrame:
    """MOSS winnowing fingerprints (k=4-token shingles, window w=4,
    rightmost-min ties): the per-doc selected distinct 32-bit hashes."""
    from .textstats import winnow_fingerprints

    out = winnow_fingerprints(_docs(sf_dir), k=_WINNOW_K, w=_WINNOW_W)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values(["doc_id", "fp"], ignore_index=True)


def _winnow_sql(k: int = _WINNOW_K, w: int = _WINNOW_W) -> str:
    parts = " || ' ' || ".join(f"t[g.i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
kg AS (
  SELECT doc_id, g.i AS pos,
         CAST(('0x' || substr(md5({parts}), 1, 8)) AS UBIGINT) AS h
  FROM toks CROSS JOIN LATERAL
       (SELECT unnest(range(1, len(t) - {k} + 2)) AS i) g
  WHERE len(t) >= {k}),
comb AS (
  SELECT doc_id, pos, h * 1048576 + (1048575 - (pos - 1)) AS c FROM kg),
wins AS (
  SELECT doc_id, pos,
         min(c) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS mc
  FROM comb)
SELECT DISTINCT doc_id, CAST(mc // 1048576 AS BIGINT) AS fp
FROM wins WHERE pos >= {w}
ORDER BY doc_id, fp
"""


def fieldmap_project_docs(sf_dir: str):
    """M18 field-map over a long table derived from documents."""
    from .fieldmap import aspace_field_map, field_map_dataset

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
    from .fieldmap import avalon_field_map, field_map_dataset

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


def multimodal_features(sf_dir: str):
    """Actor-pool PNG decode → 16-dim features over the deterministic media
    corpus. ORACLE-CHECKABLE: the oracle recomputes the features from the
    RAW pixel stream (before any PNG encode), so the driver's hash compare
    verifies the encode→decode→summarize round trip end-to-end. The feature
    vector flattens to f00..f15 scalar columns (rounded 6 dp) so the value
    hash covers it."""
    from .multimodal import extract_image_features, synthesize_media_table

    tbl = synthesize_media_table(64)
    out = extract_image_features(
        ray.data.from_arrow(tbl), concurrency=2, batch_size=16
    ).to_pandas()
    feats = np.stack(out["feature"].to_numpy())
    cols: dict = {
        "item_id": out["item_id"].to_numpy(np.int64),
        "payload_sha256": out["payload_sha256"],
    }
    for j in range(feats.shape[1]):
        cols[f"f{j:02d}"] = np.round(feats[:, j], 6)
    return pd.DataFrame(cols).sort_values("item_id", ignore_index=True)


def _multimodal_sql(n: int = 64, seed: int = 5) -> str:
    """Fixture oracle for multimodal_features: regenerates the seeded pixel
    stream (same recipe as multimodal.synthesize_media_table), computes the
    expected features DIRECTLY from the raw pixels — never through the PNG
    decoder under test — and inlines them as a VALUES table."""
    from ..functions.png import encode_png
    from .multimodal import ImageFeatureStage, _pixel_summary, media_pixel_stream

    proj = np.random.default_rng(1234).standard_normal(
        (32, ImageFeatureStage.FEATURE_DIM)
    )
    rows = []
    for i, px in enumerate(media_pixel_stream(n, seed)):
        sha = hashlib.sha256(encode_png(px)).hexdigest()
        feat = np.round(_pixel_summary(px) @ proj, 6)
        rows.append(
            f"({i}, '{sha}', " + ", ".join(repr(float(x)) for x in feat) + ")"
        )
    cols = "item_id, payload_sha256, " + ", ".join(
        f"f{j:02d}" for j in range(ImageFeatureStage.FEATURE_DIM)
    )
    return f"SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols})"


def video_frame_features(sf_dir: str):
    """Actor-pool MJPEG-in-AVI decode → frame-sampled 16-dim features over
    the deterministic video corpus. ORACLE-CHECKABLE: the oracle regenerates
    the seeded raw frames and recomputes the expected features through the
    per-frame JPEG round trip DIRECTLY (never through the AVI container
    parser under test), so the hash compare verifies the RIFF walk, chunk
    framing, frame ordering and sampling end-to-end. JPEG itself is
    validated separately (tests/test_jpeg_codec.py) — it is lossy, so the
    oracle must mirror its round trip rather than use raw pixels."""
    from .multimodal import extract_video_features, synthesize_video_table

    tbl = synthesize_video_table(32)
    out = extract_video_features(
        ray.data.from_arrow(tbl), concurrency=2, batch_size=8
    ).to_pandas()
    feats = np.stack(out["feature"].to_numpy())
    cols: dict = {
        "item_id": out["item_id"].to_numpy(np.int64),
        "n_frames_decoded": out["n_frames_decoded"].to_numpy(np.int64),
        "payload_sha256": out["payload_sha256"],
    }
    for j in range(feats.shape[1]):
        cols[f"f{j:02d}"] = np.round(feats[:, j], 6)
    return pd.DataFrame(cols).sort_values("item_id", ignore_index=True)


def _video_sql(n: int = 32, seed: int = 8) -> str:
    """Fixture oracle for video_frame_features: regenerate the seeded frame
    recipe (same arithmetic as multimodal.synthesize_video_table), apply the
    per-frame JPEG round trip directly, sample/pool exactly like
    VideoFrameStage, and inline the expected rows as a VALUES table."""
    from ..functions.avi import encode_avi_mjpeg
    from ..functions.jpeg import decode_jpeg, encode_jpeg
    from .multimodal import VideoFrameStage, _pixel_summary

    proj = np.random.default_rng(5678).standard_normal(
        (32, VideoFrameStage.FEATURE_DIM)
    )
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h = int(rng.integers(16, 40))
        w = int(rng.integers(16, 48))
        k = int(rng.integers(3, 7))
        a, b, c = (int(v) for v in rng.integers(1, 6, 3))
        y, x = np.mgrid[0:h, 0:w]
        frames = [
            np.stack(
                [(x * a + fi * 9) % 256, (y * b + fi * 5) % 256,
                 ((x + y) * c) % 256],
                axis=-1,
            ).astype(np.uint8)
            for fi in range(k)
        ]
        sha = hashlib.sha256(encode_avi_mjpeg(frames, fps=5)).hexdigest()
        kk = min(4, k)
        idx = np.linspace(0, k - 1, kk).astype(int)
        summaries = np.stack(
            [_pixel_summary(decode_jpeg(encode_jpeg(frames[fi], 90))) for fi in idx]
        )
        feat = np.round(summaries.mean(axis=0) @ proj, 6)
        rows.append(
            f"({i}, {k}, '{sha}', "
            + ", ".join(repr(float(v)) for v in feat) + ")"
        )
    cols = "item_id, n_frames_decoded, payload_sha256, " + ", ".join(
        f"f{j:02d}" for j in range(VideoFrameStage.FEATURE_DIM)
    )
    return f"SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols})"


def embedding_near_dups_exact_pairs(sf_dir: str):
    """Exact all-pairs cosine near-dup over the embeddings table — the
    oracle-checkable baseline for the LSH near-dup entry."""
    from .dedup import embedding_near_dups_exact

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


# --------------------------- curation entries --------------------------------

_SAMPLE_P = 0.25
_SAMPLE_SALT = "s1"
_SPLIT_WEIGHTS = (("train", 0.8), ("val", 0.1), ("test", 0.1))
_SPLIT_SALT = "split1"


def _hash_sql(salt: str) -> str:
    return (
        "CAST(('0x' || substr(md5('" + salt + ":' || CAST(doc_id AS VARCHAR)), 1, 16))"
        " AS UBIGINT)"
    )


def deterministic_sample(sf_dir: str):
    """Deterministic Bernoulli sample over documents (hash-threshold keep).
    ORACLE: the salted md5-u64 primitive is a SQL builtin composition."""
    from .curation import hash_sample

    out = hash_sample(_docs(sf_dir), _SAMPLE_P, salt=_SAMPLE_SALT)
    return out.select_columns(["doc_id", "lang", "n_chars"])


def _deterministic_sample_sql() -> str:
    thresh = int(_SAMPLE_P * (1 << 64))
    return f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_hash_sql(_SAMPLE_SALT)} < CAST({thresh} AS UBIGINT)
"""


def bpe_merges(sf_dir: str):
    """BPE tokenizer training over the corpus (Sennrich et al. 2016): one
    distributed word-count aggregation, then the vocab-bounded incremental
    merge loop. Hash-checked: the deterministic merge order (count desc,
    left asc, right asc) is reproduced in SQL by `_bpe_merges_sql`'s
    unrolled CTE chain; determinism is ALSO pinned by tests (golden vs a
    naive recount reference plus partitioning invariance)."""
    from .bpe import learn_bpe, word_counts

    wc = word_counts(_docs(sf_dir).select_columns(["text"]))
    return learn_bpe(wc, n_merges=40, min_freq=2)


def _bpe_state_rebuild(prev: str, sel: str, out: str, carry_tf: bool) -> str:
    """One greedy merge application: selected positions concatenate with
    their right neighbor, the consumed neighbor drops, positions renumber."""
    tf = "s.tf," if carry_tf else ""
    tf_out = "tf," if carry_tf else ""
    return f"""{out} AS MATERIALIZED (
  SELECT word, {tf_out}
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
  FROM (
    SELECT s.word, {tf} s.pos,
           CASE WHEN m.pos IS NOT NULL THEN s.sym || nx.sym
                ELSE s.sym END AS sym
    FROM {prev} s
    LEFT JOIN {sel} m ON m.word = s.word AND m.pos = s.pos
    LEFT JOIN {sel} d ON d.word = s.word AND d.pos = s.pos - 1
    LEFT JOIN {prev} nx ON nx.word = s.word AND nx.pos = s.pos + 1
    WHERE d.pos IS NULL) u)"""


def _bpe_train_ctes(n_merges: int, min_freq: int) -> str:
    """The unrolled training chain: st0 (char state over the word-type
    table, tf-weighted) through st{n_merges}, one (pr, best, cand, sel, st)
    block per merge. Greedy non-overlap is the run-parity trick: candidate
    positions form consecutive runs only when left==right; keeping odd
    row_numbers within each run IS left-to-right non-overlapping matching."""
    parts = [f"""toks AS (
  SELECT unnest({TOK_SQL}) AS term FROM documents),
wc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf FROM toks WHERE term <> ''
  GROUP BY term),
st0 AS MATERIALIZED (
  SELECT word, tf, CAST(i AS BIGINT) AS pos,
         CASE WHEN i <= length(word) THEN substr(word, i, 1)
              ELSE '</w>' END AS sym
  FROM (SELECT term AS word, tf,
               unnest(generate_series(1, length(term) + 1)) AS i
        FROM wc) x)"""]
    for i in range(n_merges):
        parts.append(f"""pr{i} AS MATERIALIZED (
  SELECT s1.sym AS l, s2.sym AS r, CAST(sum(s1.tf) AS BIGINT) AS cnt
  FROM st{i} s1 JOIN st{i} s2 ON s2.word = s1.word AND s2.pos = s1.pos + 1
  GROUP BY 1, 2),
best{i} AS MATERIALIZED (
  SELECT l, r, cnt FROM pr{i} WHERE cnt >= {min_freq}
  ORDER BY cnt DESC, l, r LIMIT 1),
cand{i} AS MATERIALIZED (
  SELECT s1.word, s1.pos
  FROM st{i} s1 JOIN st{i} s2 ON s2.word = s1.word AND s2.pos = s1.pos + 1
  JOIN best{i} b ON s1.sym = b.l AND s2.sym = b.r),
sel{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS rnn
    FROM (SELECT word, pos,
                 row_number() OVER (PARTITION BY word ORDER BY pos) AS rn
          FROM cand{i}) c1) c2
  WHERE rnn % 2 = 1),
{_bpe_state_rebuild(f"st{i}", f"sel{i}", f"st{i + 1}", carry_tf=True)}""")
    return ",\n".join(parts)


def _bpe_merges_union(n_merges: int) -> str:
    arms = [
        f'SELECT CAST({i + 1} AS BIGINT) AS "rank", l AS "left", '
        f'r AS "right", cnt AS "count" FROM best{i}'
        for i in range(n_merges)
    ]
    return "\n  UNION ALL ".join(arms)


BPE_N_MERGES = 40
BPE_MIN_FREQ = 2


def _bpe_merges_sql(n_merges: int = BPE_N_MERGES,
                    min_freq: int = BPE_MIN_FREQ) -> str:
    """Hash-checkable oracle for ``bpe_merges``: the merge loop is
    deterministic (count desc, left asc, right asc), so the whole training
    run is reproducible as an UNROLLED CTE chain — one (pair-count, argmax,
    greedy-apply) block per merge. Early stop falls out for free: once no
    pair reaches min_freq, best{i} is empty and the state is a fixed point,
    so every later arm contributes zero rows."""
    return f"""
WITH {_bpe_train_ctes(n_merges, min_freq)}
SELECT * FROM (
  {_bpe_merges_union(n_merges)}
) ORDER BY "rank"
"""


BPE_ENCODE_UNROLL = 12  # >= max symbols per word (longest corpus token + 1)


def _bpe_token_counts_sql(n_merges: int = BPE_N_MERGES,
                          min_freq: int = BPE_MIN_FREQ,
                          unroll: int = BPE_ENCODE_UNROLL) -> str:
    """Oracle for the encode half: train the merge table (same unrolled
    chain), then apply it per distinct WORD — each unrolled step merges the
    single (lowest rank, then leftmost) applicable pair, exactly
    ``bpe_encode_word``'s loop. ``unroll`` must be >= the longest corpus
    token's symbol count (a word can take at most len(word) merges); the
    driver tables' longest token is 8 chars -> 9 symbols, so 12 is safe."""
    parts = [f"""merges AS MATERIALIZED (
  {_bpe_merges_union(n_merges)}),
dtoks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
dwc AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n FROM dtoks
  WHERE term <> '' GROUP BY doc_id, term),
est0 AS MATERIALIZED (
  SELECT word, CAST(i AS BIGINT) AS pos,
         CASE WHEN i <= length(word) THEN substr(word, i, 1)
              ELSE '</w>' END AS sym
  FROM (SELECT word, unnest(generate_series(1, length(word) + 1)) AS i
        FROM (SELECT DISTINCT term AS word FROM dwc) w) x)"""]
    for j in range(unroll):
        parts.append(f"""epick{j} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT e1.word, e1.pos,
           row_number() OVER (PARTITION BY e1.word
                              ORDER BY m."rank", e1.pos) AS rr
    FROM est{j} e1
    JOIN est{j} e2 ON e2.word = e1.word AND e2.pos = e1.pos + 1
    JOIN merges m ON m."left" = e1.sym AND m."right" = e2.sym) c
  WHERE rr = 1),
{_bpe_state_rebuild(f"est{j}", f"epick{j}", f"est{j + 1}", carry_tf=False)}""")
    body = ",\n".join(parts)
    return f"""
WITH {_bpe_train_ctes(n_merges, min_freq)},
{body},
units AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_units
  FROM est{unroll} GROUP BY word),
perdoc AS (
  SELECT d.doc_id,
         CAST(sum(d.n * u.n_units) AS BIGINT) AS n_bpe_tokens,
         CAST(sum(d.n) AS BIGINT) AS n_words
  FROM dwc d JOIN units u ON u.word = d.term GROUP BY d.doc_id)
SELECT a.doc_id,
       CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
       CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words
FROM (SELECT doc_id FROM documents) a
LEFT JOIN perdoc p ON p.doc_id = a.doc_id
ORDER BY a.doc_id
"""


_SHUFFLE_SEED = "ep0"


def shuffle_export(sf_dir: str):
    """Seeded deterministic global shuffle (training-export ordering):
    every doc's 1-based position under md5(seed:id) order. One sort
    shuffle + two streaming passes; positions via the distributed
    row-number scan (state.scan.ordered_row_number)."""
    from .curation import deterministic_shuffle

    out = deterministic_shuffle(_docs(sf_dir).select_columns(["doc_id"]),
                                seed=_SHUFFLE_SEED)
    return out.select_columns(["doc_id", "shuffle_pos"])


def _shuffle_export_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS shuffle_pos
FROM documents
"""


# domain mixing: downsample named sources to target rates (default for the
# rest) — the mixture-weight step of corpus construction
_MIX_SALT = "mix1"
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
_MIX_DEFAULT = 0.8


def domain_mix_sample(sf_dir: str):
    """Per-source deterministic Bernoulli sampling (stratified / domain
    mixing). ORACLE: CASE over the same salted md5-u64 primitive."""
    from .curation import stratified_sample

    out = stratified_sample(
        _docs(sf_dir), _MIX_RATES, group_col="source",
        salt=_MIX_SALT, default_p=_MIX_DEFAULT,
    )
    return out.select_columns(["doc_id", "source", "lang"])


def _domain_mix_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{g}' THEN CAST({min((1 << 64) - 1, int(p * (1 << 64)))} AS UBIGINT)"
        for g, p in _MIX_RATES.items()
    )
    dflt = min((1 << 64) - 1, int(_MIX_DEFAULT * (1 << 64)))
    return f"""
SELECT doc_id, source, lang FROM documents
WHERE {_hash_sql(_MIX_SALT)}
      < CASE {cases} ELSE CAST({dflt} AS UBIGINT) END
"""


# decontamination: docs 0..4 stand in for the benchmark/eval set
_DECON_W = 4
_DECON_EVAL_MAX = 5  # eval set = doc_id < 5


def decontamination_report(sf_dir: str):
    """n-gram-overlap decontamination: training docs sharing any
    ``_DECON_W``-token shingle with an eval doc, with shared-shingle
    counts. ORACLE: distinct-shingle self-join in SQL."""
    import pyarrow.dataset as pads

    from .curation import decontaminate

    t = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        filter=pads.field("doc_id") < _DECON_EVAL_MAX,
        columns=["doc_id", "text"],
    )
    eval_texts = dict(zip(
        t["doc_id"].to_pylist(), t["text"].to_pylist()
    ))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") >= _DECON_EVAL_MAX,
    )
    out = decontaminate(ds, eval_texts, shingle_w=_DECON_W).to_pandas()
    return out.sort_values(["doc_id", "eval_id"], ignore_index=True)


def _decontamination_sql() -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(_DECON_W))
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - {_DECON_W} + 2),
                               i -> {parts})) AS s
  FROM toks WHERE len(t) >= {_DECON_W}),
ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id < {_DECON_EVAL_MAX}),
tr AS (SELECT doc_id, s FROM sh WHERE doc_id >= {_DECON_EVAL_MAX})
SELECT tr.doc_id, ev.eval_id, CAST(count(*) AS BIGINT) AS n_shared
FROM tr JOIN ev USING (s)
GROUP BY tr.doc_id, ev.eval_id
ORDER BY tr.doc_id, ev.eval_id
"""


# corpus-wide exact shared-substring pairs (Lee et al. exact-substring
# duplication signal at shingle granularity)
_SHPAIR_W = 5


def shingle_dup_pairs(sf_dir: str):
    from .dedup import shingle_pairs

    out = shingle_pairs(_docs(sf_dir), shingle_w=_SHPAIR_W).to_pandas()
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True)


def _shingle_pairs_sql() -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(_SHPAIR_W))
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - {_SHPAIR_W} + 2),
                               i -> {parts})) AS s
  FROM toks WHERE len(t) >= {_SHPAIR_W})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
"""


def train_val_test_split(sf_dir: str):
    """Coordination-free split assignment by cumulative hash thresholds."""
    from .curation import split_assign

    out = split_assign(_docs(sf_dir), _SPLIT_WEIGHTS, salt=_SPLIT_SALT)
    return out.select_columns(["doc_id", "split"])


def _split_sql() -> str:
    # identical float arithmetic to curation.split_assign's cut computation
    cum = np.cumsum([w for _, w in _SPLIT_WEIGHTS])
    cases = []
    for (name, _w), c in zip(_SPLIT_WEIGHTS[:-1], cum[:-1]):
        cut = min((1 << 64) - 1, int(c * (1 << 64)))
        cases.append(f"WHEN {_hash_sql(_SPLIT_SALT)} < CAST({cut} AS UBIGINT) THEN '{name}'")
    last = _SPLIT_WEIGHTS[-1][0]
    return f"""
SELECT doc_id, CASE {' '.join(cases)} ELSE '{last}' END AS split FROM documents
"""


# leakage-safe split: near-dup cluster members MUST land in the same split
# (a train/test pair of near-duplicates is evaluation leakage). Split key =
# the doc's minhash cluster representative (itself when unclustered); the
# same coordination-free hash thresholds then apply to the key.
_LEAK_SALT = "leak1"


def leakage_safe_split(sf_dir: str) -> pd.DataFrame:
    import ray as _ray

    from .curation import split_assign
    from .dedup import minhash_dedup

    docs = _docs(sf_dir)
    clusters = minhash_dedup(docs, threshold=0.7, n_perm=128, bands=32)
    cl = clusters.to_pandas() if hasattr(clusters, "to_pandas") else clusters
    rep_ref = _ray.put(dict(zip(cl["doc_id"].astype(np.int64),
                                cl["rep_id"].astype(np.int64))))

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        rep = _ray.get(rep_ref)
        ids = df["doc_id"].to_numpy(np.int64)
        out = pd.DataFrame({"doc_id": ids})
        out["split_key"] = pd.Series(
            [rep.get(int(d), int(d)) for d in ids], dtype=np.int64
        )
        return out

    keyed = docs.map_batches(add_key, batch_format="pandas")
    out = split_assign(keyed, _SPLIT_WEIGHTS, id_col="split_key",
                       salt=_LEAK_SALT).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)[
        ["doc_id", "split_key", "split"]
    ]


def _leak_split_sql() -> str:
    mh = _minhash_sql(threshold=0.7, bands=32, final="components")
    cum = np.cumsum([w for _, w in _SPLIT_WEIGHTS])
    hash_expr = (
        "CAST(('0x' || substr(md5('" + _LEAK_SALT
        + ":' || CAST(split_key AS VARCHAR)), 1, 16)) AS UBIGINT)"
    )
    cases = []
    for (name, _w), c in zip(_SPLIT_WEIGHTS[:-1], cum[:-1]):
        cut = min((1 << 64) - 1, int(c * (1 << 64)))
        cases.append(f"WHEN {hash_expr} < CAST({cut} AS UBIGINT) THEN '{name}'")
    last = _SPLIT_WEIGHTS[-1][0]
    return f"""
SELECT doc_id, split_key,
       CASE {' '.join(cases)} ELSE '{last}' END AS split
FROM (
  SELECT d.doc_id,
         CAST(coalesce(c.rep_id, d.doc_id) AS BIGINT) AS split_key
  FROM documents d LEFT JOIN ({mh}) c ON c.doc_id = d.doc_id)
ORDER BY doc_id
"""


def corpus_clean_keep(sf_dir: str):
    """The full pretraining-data cleaning composition: exact dedup winner →
    minhash near-dup representative → quality floor. ORACLE: composes the
    exact-dedup SQL, the minhash component closure over the survivors, and
    the token-count floor."""
    from .curation import corpus_clean

    ds = _docs(sf_dir)
    out = corpus_clean(ds, min_tokens=10, near_threshold=0.7,
                       n_perm=128, bands=32, n_rows=ds.count())
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pdf.sort_values("doc_id", ignore_index=True)


def _corpus_clean_sql(min_tokens: int = 10) -> str:
    mh = _minhash_cte(threshold=0.7, bands=32, source="docs2")
    return f"""
WITH RECURSIVE keep0 AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
docs2 AS (
  SELECT d.doc_id, d.text FROM documents d JOIN keep0 k ON k.doc_id = d.doc_id),
{mh},
sym AS (SELECT doc_a AS a, doc_b AS b FROM good
        UNION SELECT doc_b, doc_a FROM good),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS rep_id FROM reach GROUP BY a),
dropped AS (SELECT doc_id FROM comp WHERE doc_id <> rep_id)
SELECT d.doc_id FROM docs2 d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
  AND len(list_filter(string_split_regex(lower(d.text), '[^a-z0-9_]+'),
          x -> x <> '')) >= {min_tokens}
"""


def pii_redaction(sf_dir: str):
    """PII scrub over documents seeded with deterministic synthetic PII
    (every third doc gains an email + IP + SSN-shaped id): placeholder
    substitution in fixed pattern order plus a redaction count.
    ORACLE: nested regexp_replace with the same RE2-safe patterns."""
    from .textstats import redact_pii_batch

    ds = _docs(sf_dir)

    def seed_pii(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        ids = df["doc_id"].to_numpy(np.int64)
        tails = np.where(
            ids % 3 == 0,
            [
                f" reach me at user{i}@example.com from 10.0.{i % 256}.7"
                f" ssn 123-45-{6000 + i % 1000:04d}"
                for i in ids
            ],
            "",
        )
        out["text"] = df["text"].to_numpy(object) + tails
        return out

    seeded = ds.map_batches(seed_pii, batch_format="pandas")
    return seeded.map_batches(redact_pii_batch, batch_format="pyarrow")


def _pii_sql() -> str:
    from .textstats import PII_PATTERNS

    # staged CTE chain so each pattern's count sees the PREVIOUS stage's
    # text — same sequential-substitution semantics as redact_pii_batch
    stages = []
    src = (
        "SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 THEN"
        " ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'"
        " || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-'"
        " || lpad(CAST(6000 + doc_id % 1000 AS VARCHAR), 4, '0')"
        " ELSE '' END AS t0 FROM documents"
    )
    stages.append(f"s0 AS ({src})")
    for i, (tag, pat) in enumerate(PII_PATTERNS):
        stages.append(
            f"s{i + 1} AS (SELECT doc_id,"
            f" regexp_replace(t{i}, '{pat}', '{tag}', 'g') AS t{i + 1},"
            f" len(regexp_extract_all(t{i}, '{pat}')) AS n{i}"
            + ("".join(f", n{j}" for j in range(i)))
            + f" FROM s{i})"
        )
    n = len(PII_PATTERNS)
    total = " + ".join(f"n{i}" for i in range(n))
    return (
        "WITH " + ", ".join(stages)
        + f"\nSELECT doc_id, t{n} AS redacted, CAST({total} AS BIGINT) AS n_redactions FROM s{n}"
    )


def unigram_quality(sf_dir: str):
    """Perplexity-proxy quality scoring: mean token log-probability under
    the corpus's own add-1-smoothed unigram model (the KenLM-style filter).
    ORACLE: counts + ln reproduce exactly; scores rounded 6 dp."""
    from .textstats import unigram_logprob

    return unigram_logprob(_docs(sf_dir))


def c4_filters(sf_dir: str):
    """C4-style heuristic cleaning signals + keep flag (see
    textstats.c4_signals_batch for the exact contract)."""
    from .textstats import c4_signals_batch

    return _docs(sf_dir).map_batches(c4_signals_batch, batch_format="pyarrow")


def gopher_filters(sf_dir: str):
    """Gopher quality rules (Rae et al. 2021 subset): word-count bounds,
    mean-word-length bounds, symbol ratio, alpha-word fraction, distinct
    stopword floor — one stateless vectorized pass, every signal + the keep
    flag hash-checked."""
    from .textstats import gopher_quality_batch

    return _docs(sf_dir).map_batches(gopher_quality_batch,
                                     batch_format="pyarrow")


def _gopher_sql() -> str:
    from .textstats import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_SYMBOL_FRAC,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOP_DISTINCT,
        GOPHER_MIN_WORDS,
    )

    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
t AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
agg AS (
  SELECT doc_id,
         sum(tf) AS n_words,
         sum(length(term) * tf) AS sum_chars,
         sum(CASE WHEN regexp_matches(term, '[a-z]') THEN tf ELSE 0 END)
           AS n_alpha,
         sum(CASE WHEN list_contains({_STOP_SQL}, term) THEN 1 ELSE 0 END)
           AS n_stop_distinct
  FROM t GROUP BY doc_id),
sym AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[^A-Za-z0-9_ \t\n\r]')) AS n_sym,
         length(text) AS n_chars
  FROM documents),
sig AS (
  SELECT s.doc_id,
         CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
         round(CASE WHEN coalesce(a.n_words, 0) > 0
               THEN CAST(a.sum_chars AS DOUBLE) / CAST(a.n_words AS DOUBLE)
               ELSE 0.0 END, 6) AS mean_word_len,
         round(CASE WHEN s.n_chars > 0
               THEN CAST(s.n_sym AS DOUBLE) / CAST(s.n_chars AS DOUBLE)
               ELSE 0.0 END, 6) AS symbol_frac,
         round(CASE WHEN coalesce(a.n_words, 0) > 0
               THEN CAST(a.n_alpha AS DOUBLE) / CAST(a.n_words AS DOUBLE)
               ELSE 0.0 END, 6) AS alpha_frac,
         CAST(coalesce(a.n_stop_distinct, 0) AS BIGINT) AS n_stop_distinct
  FROM sym s LEFT JOIN agg a USING (doc_id))
SELECT *,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND mean_word_len >= {GOPHER_MIN_MWL}
        AND mean_word_len <= {GOPHER_MAX_MWL}
        AND symbol_frac <= {GOPHER_MAX_SYMBOL_FRAC}
        AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
        AND n_stop_distinct >= {GOPHER_MIN_STOP_DISTINCT}) AS gopher_keep
FROM sig
"""


SQL_C4_FILTERS = """
WITH linel AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x <> '') AS ls
  FROM documents)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(list_filter(ls,
           x -> substring(x, length(x), 1) IN ('.', '!', '?', '"')))
           AS BIGINT) AS n_terminal_lines,
       CAST(len(list_filter(ls,
           x -> len(list_filter(string_split_regex(x, '\\s+'),
                                w -> w <> '')) < 3))
           AS BIGINT) AS n_short_lines,
       contains(text, '{') AS has_brace,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       (NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')
        AND len(ls) > 0) AS c4_keep
FROM linel
"""


# context-window chunking: split each doc into overlapping token windows —
# the standard pre-training chunker. Deterministic contract (mirrored by
# SQL): starts = 0, stride, 2*stride, ... while start < n_tokens; chunk =
# tokens[start : start+CHUNK] joined by single spaces.
CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
_CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def chunk_docs(sf_dir: str):
    """Overlapping token-window chunks: (doc_id, chunk_id, n_chunk_tokens,
    chunk_text). Pure per-batch flat transform — no shuffle, no state."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows_doc, rows_cid, rows_n, rows_txt = [], [], [], []
        findall = TOKEN_RE.findall
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = findall(text.lower())
            n = len(toks)
            for cid, start in enumerate(range(0, max(n, 1), _CHUNK_STRIDE)):
                if start >= n:
                    break
                piece = toks[start : start + CHUNK_TOKENS]
                rows_doc.append(doc_id)
                rows_cid.append(cid)
                rows_n.append(len(piece))
                rows_txt.append(" ".join(piece))
        return pd.DataFrame({
            "doc_id": np.array(rows_doc, dtype=np.int64),
            "chunk_id": np.array(rows_cid, dtype=np.int64),
            "n_chunk_tokens": np.array(rows_n, dtype=np.int64),
            "chunk_text": rows_txt,
        })

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


SQL_CHUNK_DOCS = f"""
WITH base AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS toksl
  FROM documents),
starts AS (
  SELECT doc_id, toksl,
         unnest(generate_series(0, len(toksl) - 1, {_CHUNK_STRIDE})) AS st
  FROM base WHERE len(toksl) > 0)
SELECT doc_id,
       CAST(st / {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(least(st + {CHUNK_TOKENS}, len(toksl)) - st AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(toksl, st + 1,
                                  least(st + {CHUNK_TOKENS}, len(toksl))),
                       ' ') AS chunk_text
FROM starts
"""


def text_normalize(sf_dir: str):
    """Canonical pre-tokenization cleanup (NFC, control strip, ASCII
    whitespace collapse). Control chars and odd whitespace are seeded
    deterministically so the scrub is non-trivially exercised."""
    from .textstats import normalize_text_batch

    ds = _docs(sf_dir)

    def seed_mess(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        ids = df["doc_id"].to_numpy(np.int64)
        texts = df["text"].to_numpy(object)
        messed = [
            ("\t " + t + "\x07\x01  trailing\t\tws \n") if i % 4 == 0 else t
            for i, t in zip(ids, texts)
        ]
        out["text"] = messed
        return out

    return ds.map_batches(seed_mess, batch_format="pandas").map_batches(
        normalize_text_batch, batch_format="pyarrow"
    )


SQL_TEXT_NORMALIZE = """
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN chr(9) || ' ' || text || chr(7) || chr(1) || '  trailing'
                   || chr(9) || chr(9) || 'ws ' || chr(10)
              ELSE text END AS t0
  FROM documents),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(nfc_normalize(t0),
              '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'),
              '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g'), ' ') AS normalized
  FROM seeded)
SELECT doc_id, normalized,
       CAST(length(normalized) AS BIGINT) AS n_chars_norm
FROM norm
"""


BIGRAM_TOP_K = 50


def bigram_top50(sf_dir: str):
    """Corpus-wide top-50 adjacent token pairs: per-batch partial counts →
    tree aggregate → exact top-k cut (count desc, bigram asc)."""
    from ..state.aggregates import tree_aggregate
    from .textstats import bigram_partial

    agg = tree_aggregate(_docs(sf_dir), ["bigram"], bigram_partial, {"n": "sum"})

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "bigram"], ascending=[False, True]
        ).head(BIGRAM_TOP_K)

    # per-block top-k BEFORE collecting: the driver sees ≤ k×blocks rows,
    # never the full distinct-bigram table (which outgrows the unigram
    # vocab fast). Exact: every global top-k row is in its block's top-k.
    pdf = agg.map_batches(cut, batch_format="pandas", batch_size=None).to_pandas()
    return cut(pdf).reset_index(drop=True)


SQL_BIGRAM_TOP50 = f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
bg AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT {BIGRAM_TOP_K}
"""


SQL_UNIGRAM_QUALITY = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter({TOK_SQL}, x -> x <> '')) AS term
  FROM documents),
cf AS (SELECT term, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY term),
tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM toks) AS total,
               (SELECT CAST(count(*) AS DOUBLE) FROM cf) AS v),
doc AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         sum(ln((cf.c + 1.0) / (tot.total + tot.v))) AS s
  FROM toks t JOIN cf ON cf.term = t.term CROSS JOIN tot
  GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(coalesce(doc.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(coalesce(doc.s / doc.n_tokens, 0.0), 6) AS avg_logprob
FROM documents d LEFT JOIN doc ON doc.doc_id = d.doc_id
"""


def bigram_quality(sf_dir: str):
    """Bigram-LM quality scoring (one rung above unigram_quality on the
    KenLM-proxy ladder): mean position log-probability under the corpus's
    own add-1-smoothed bigram model; first token scored by the unigram
    model. See textstats.bigram_logprob for the exact contract."""
    from .textstats import bigram_logprob

    return bigram_logprob(_docs(sf_dir))


SQL_BIGRAM_QUALITY = f"""
WITH tl AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS ts FROM documents),
toks AS (SELECT doc_id, unnest(ts) AS term FROM tl),
cf AS (SELECT term, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY term),
tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM toks) AS total,
               (SELECT CAST(count(*) AS DOUBLE) FROM cf) AS v),
pairs AS (
  SELECT tl.doc_id, tl.ts[g.i + 1] AS w1, tl.ts[g.i + 2] AS w2
  FROM tl CROSS JOIN LATERAL (SELECT unnest(range(len(ts) - 1)) AS i) g),
bc AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 FROM pairs GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY w1),
firsts AS (
  SELECT tl.doc_id, ln((cf.c + 1.0) / (tot.total + tot.v)) AS lp
  FROM tl JOIN cf ON cf.term = tl.ts[1] CROSS JOIN tot
  WHERE len(tl.ts) > 0),
pairlp AS (
  SELECT p.doc_id, sum(ln((bc.c12 + 1.0) / (ctx.c1 + tot.v))) AS lp
  FROM pairs p JOIN bc ON bc.w1 = p.w1 AND bc.w2 = p.w2
  JOIN ctx ON ctx.w1 = p.w1 CROSS JOIN tot
  GROUP BY p.doc_id),
doc AS (
  SELECT tl.doc_id, CAST(len(tl.ts) AS BIGINT) AS n_tokens,
         coalesce(f.lp, 0.0) + coalesce(pl.lp, 0.0) AS s
  FROM tl
  LEFT JOIN firsts f ON f.doc_id = tl.doc_id
  LEFT JOIN pairlp pl ON pl.doc_id = tl.doc_id)
SELECT doc_id, n_tokens,
       round(CASE WHEN n_tokens > 0 THEN s / n_tokens ELSE 0.0 END, 6)
         AS avg_logprob
FROM doc
"""


# --------------------------- registry ---------------------------------------

# --------------------------- sequence packing -------------------------------
#
# GPT-style packing: token streams concatenated in doc-id order, cut every
# SEQ_LEN tokens. Rides the distributed prefix scan (state/scan.py) — one
# sort shuffle + two streaming passes, driver state one row per BLOCK.

SEQ_LEN = 512


def pack_sequences(sf_dir: str):
    from .packing import pack_sequences as _pack

    out = _pack(_docs(sf_dir), SEQ_LEN)
    return out.to_pandas().sort_values("doc_id", ignore_index=True)


def _pack_sql() -> str:
    return f"""
WITH tc AS (
  SELECT doc_id,
         CAST(len(list_filter({TOK_SQL}, x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
p AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM tc)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {SEQ_LEN} AS seq_first,
       (tok_start + n_tokens - 1) // {SEQ_LEN} AS seq_last
FROM p WHERE n_tokens > 0
ORDER BY doc_id
"""


# --------------------------- stats component --------------------------------
#
# Solr StatsComponent (stats.field=n_chars, stats.facet=lang) over a boolean
# OR match set: count / missing / min / max / sum exact in int64, then
# mean & sample-stddev derived from the exact sums by ONE fixed float
# expression mirrored in the SQL — no accumulation-order nondeterminism.
#
# Scale shape: the match set leaves the pool as a sorted id array and is
# broadcast once (ray.put); the stats pass is a streaming column-pruned scan
# + tree_aggregate (one partial row per (batch, lang)). Boundary: a match
# set too large to broadcast (≫10⁸ ids) flips to joins.hash_join semi-join —
# same partial/merge shape after it.

STATS_QUERY = "join hash"


def field_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = _matched_docs_ds(sf_dir, ["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["n_chars"]
        g = df.assign(
            n_docs=np.int64(1),
            n_missing=v.isna().astype(np.int64),
            s=v.fillna(0).astype(np.int64),
            ss=(v.fillna(0).astype(np.int64) ** 2),
        ).groupby("lang", as_index=False, dropna=False).agg(
            n_docs=("n_docs", "sum"),
            n_missing=("n_missing", "sum"),
            s=("s", "sum"),
            ss=("ss", "sum"),
            mn=("n_chars", "min"),
            mx=("n_chars", "max"),
        )
        return g

    agg = tree_aggregate(
        ds, ["lang"], partial,
        {"n_docs": "sum", "n_missing": "sum", "s": "sum", "ss": "sum",
         "mn": "min", "mx": "max"},
    ).to_pandas()
    n = agg["n_docs"].to_numpy(np.float64)
    s = agg["s"].to_numpy(np.float64)
    ss = agg["ss"].to_numpy(np.float64)
    agg["mean_chars"] = np.round(s / n, 6)
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (ss - s * s / n) / (n - 1.0)
        agg["stddev_chars"] = np.where(
            n > 1.0, np.round(np.sqrt(np.maximum(var, 0.0)), 6), np.nan
        )
    agg = agg.rename(columns={"s": "sum_chars", "mn": "min_chars",
                              "mx": "max_chars"})
    agg["min_chars"] = agg["min_chars"].astype(np.int64)
    agg["max_chars"] = agg["max_chars"].astype(np.int64)
    out = agg[["lang", "n_docs", "n_missing", "min_chars", "max_chars",
               "sum_chars", "mean_chars", "stddev_chars"]]
    return out.sort_values("lang", ignore_index=True)


def _field_stats_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(STATS_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM q)),
j AS (
  SELECT d.lang, d.n_chars FROM matched m JOIN documents d USING (doc_id)),
agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) - count(n_chars) AS BIGINT) AS n_missing,
         CAST(min(n_chars) AS BIGINT) AS min_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS ssq
  FROM j GROUP BY lang)
SELECT lang, n_docs, n_missing, min_chars, max_chars, sum_chars,
       round(CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_chars,
       CASE WHEN n_docs > 1 THEN
         round(sqrt(greatest(
           (CAST(ssq AS DOUBLE)
            - CAST(sum_chars AS DOUBLE) * CAST(sum_chars AS DOUBLE)
              / CAST(n_docs AS DOUBLE))
           / (CAST(n_docs AS DOUBLE) - 1.0), 0.0)), 6)
       ELSE NULL END AS stddev_chars
FROM agg ORDER BY lang
"""


# --------------------------- range facet + field sort -----------------------
#
# facet.range (Solr): bucket counts of a numeric field over the match set.
# sort=<field> desc (Solr): top-k of the match set by a doc field, not by
# score — per-batch partial top-k, k x n_batches rows merged on the driver.
# Both reuse the broadcast match-id set of the stats component.

RANGE_GAP = 200  # facet.range.gap on n_chars
FIELD_SORT_K = 10


def _matched_docs_ds(sf_dir: str, columns: list):
    import ray as _ray

    from ..index.query import matching_doc_ids

    idx = _build_docs_index(sf_dir)
    ids = np.sort(matching_doc_ids(idx, STATS_QUERY, mode="or"))
    ids_ref = _ray.put(ids)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(df["doc_id"].to_numpy(np.int64), _ray.get(ids_ref))
        return df[m].reset_index(drop=True)

    return ds.map_batches(keep, batch_format="pandas")


def export_sorted_matches(sf_dir: str):
    """Solr /export handler analog: the ENTIRE match set of a boolean query
    streamed in a total sort order (n_chars desc, doc_id asc), each row
    carrying its global export position. Shape: shard-local boolean
    retrieval → id-pruned doc-table read → ONE global sort (the all-to-all
    any sorted export pays) + the row-number scan; nothing else touches
    the driver."""
    from ..state.scan import ordered_row_number

    ds = _matched_docs_ds(sf_dir, ["doc_id", "n_chars"])

    def key(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # fixed-width composite: (n_chars DESC, doc_id ASC) as one
        # ascending unique string key
        ks = [f"{10**9 - int(c):010d}-{int(i):012d}" for c, i in zip(nc, ids)]
        return t.append_column("_exp_key", pa.array(ks, pa.string()))

    out = ordered_row_number(
        ds.map_batches(key, batch_format="pyarrow"), "_exp_key", "export_pos"
    )
    return out.select_columns(["doc_id", "n_chars", "export_pos"])


def _export_sql() -> str:
    terms = sorted(set(TOKEN_RE.findall(STATS_QUERY.lower())))
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents),
q(term) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM q))
SELECT d.doc_id, d.n_chars,
       CAST(row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id)
            AS BIGINT) AS export_pos
FROM matched m JOIN documents d USING (doc_id)
"""


def facet_range_chars(sf_dir: str) -> pd.DataFrame:
    """facet.range on n_chars (gap RANGE_GAP) over the OR match set."""
    from ..state.aggregates import tree_aggregate

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
    from ..state.aggregates import tree_aggregate

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
    from ..state.aggregates import tree_aggregate

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
    from ..state.aggregates import tree_aggregate

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
    from ..index.build import termstats_dir
    from ..state.aggregates import tree_aggregate

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

    from ..index.query import matching_doc_ids

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


# ---------------------------------------------------------------------------
# PageRank over a derived link graph — the Common-Crawl-style host-rank pass
# used to prioritize crawl + curation order (RefinedWeb / CC-rank lineage).
# The corpus has no native hyperlinks, so the graph is DERIVED
# deterministically from the corpus itself: every doc v links to
# PAGERANK_OUT targets dst_i(v) = (v*A + i*B + C) mod N — a skew-free
# functional web-graph stand-in, same derivation on both sides (no external
# data). PAGERANK_ITERS synchronous power iterations at damping 0.85; every
# node has out-degree PAGERANK_OUT so there is no dangling mass.
#
# Scale shape: ranks stay a Dataset; one iteration = one map_batches (emit
# per-dst contributions, pre-summed by dst WITHIN the batch) + one bounded
# hash-bucket groupby (never a per-node group — vocab-cardinality keys are
# summed vectorized inside each of SESSION_BUCKETS groups). A zero self-row
# per node keeps in-link-free nodes alive without a join against the node
# list. At 10^12 nodes each iteration is one all-to-all of (1+OUT)·N tiny
# int64/f64 rows — PageRank's irreducible shuffle — and the final top-N is a
# per-block partial top-N, never a full sort.
PAGERANK_OUT = 3
PAGERANK_ITERS = 5
PAGERANK_D = 0.85
PAGERANK_A, PAGERANK_B, PAGERANK_C = 2654435761, 40503, 7
PAGERANK_TOPN = 100


def pagerank_top100(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    path = os.path.join(sf_dir, "documents.parquet")
    n = pq_.read_metadata(path).num_rows
    teleport = (1.0 - PAGERANK_D) / n

    ranks = ray.data.read_parquet(path, columns=["doc_id"]).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "pr": pa.array(np.full(t.num_rows, 1.0 / n), pa.float64()),
        }),
        batch_format="pyarrow",
    )

    def contribs(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        c = df["pr"].to_numpy(np.float64) * (PAGERANK_D / PAGERANK_OUT)
        dsts = [
            (v * PAGERANK_A + i * PAGERANK_B + PAGERANK_C) % n
            for i in range(PAGERANK_OUT)
        ]
        out = pd.DataFrame({
            "doc_id": np.concatenate(dsts + [v]),
            "c": np.concatenate([c] * PAGERANK_OUT
                                + [np.zeros(len(v), np.float64)]),
        })
        out = out.groupby("doc_id", as_index=False)["c"].sum()
        out["__b__"] = (out["doc_id"].to_numpy(np.int64)
                        % SESSION_BUCKETS).astype(np.int64)
        return out

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", as_index=False)["c"].sum()
        return pd.DataFrame({
            "doc_id": s["doc_id"].astype(np.int64),
            "pr": teleport + s["c"].to_numpy(np.float64),
        })

    for _ in range(PAGERANK_ITERS):
        ranks = (
            ranks.map_batches(contribs, batch_format="pandas")
            .groupby("__b__")
            .map_groups(reduce_bucket, batch_format="pandas")
        )

    def block_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pr"] = df["pr"].round(8)
        return df.sort_values(["pr", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(PAGERANK_TOPN)

    parts = ranks.map_batches(block_topn, batch_format="pandas").to_pandas()
    out = parts.sort_values(["pr", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(PAGERANK_TOPN)
    # empty pandas blocks union as schema-less and NaN-pad doc_id to float64
    # (seen at 10M-node scale); re-pin the contract dtype
    out = out.astype({"doc_id": np.int64})
    return out.reset_index(drop=True)[["doc_id", "pr"]]


def _pagerank_sql() -> str:
    nn = "(SELECT CAST(count(*) AS BIGINT) FROM documents)"
    outs = ", ".join(str(i) for i in range(PAGERANK_OUT))
    parts = [f"""nodes AS (SELECT doc_id FROM documents),
edges AS (
  SELECT doc_id AS src,
         (doc_id * {PAGERANK_A} + li.i * {PAGERANK_B} + {PAGERANK_C})
           % {nn} AS dst
  FROM nodes CROSS JOIN (SELECT unnest([{outs}]) AS i) li),
r0 AS (SELECT doc_id, 1.0 / {nn} AS pr FROM nodes)"""]
    for t in range(PAGERANK_ITERS):
        parts.append(f"""r{t + 1} AS (
  SELECT nd.doc_id,
         {1.0 - PAGERANK_D} / {nn}
           + {PAGERANK_D} * coalesce(sum(r.pr / {PAGERANK_OUT}), 0) AS pr
  FROM nodes nd
  LEFT JOIN edges e ON e.dst = nd.doc_id
  LEFT JOIN r{t} r ON r.doc_id = e.src
  GROUP BY nd.doc_id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT doc_id, round(pr, 8) AS pr FROM r{PAGERANK_ITERS}
ORDER BY round(pr, 8) DESC, doc_id LIMIT {PAGERANK_TOPN}
"""
    )


# Solr expand component ({!collapse}&expand=true&expand.rows=N): alongside
# the collapsed page (one winner per group), return each paged group's next
# N members. ONE grouped_topk call serves both — per-group candidates carry
# the rounded-tie margin past the (1 + EXPAND_ROWS) boundary; the head rank
# is the collapse entry's exact global contract.
EXPAND_ROWS = 2


def bm25_expand_topk(sf_dir: str) -> pd.DataFrame:
    from ..index.query import get_pool

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


# Solr TermVectorsComponent (tv=true&tv.tf=true): the per-doc term-frequency
# vectors for the current page's documents — here the top-3 docs of
# TV_QUERY under the standard rounded-rank contract. The doc fetch is a
# predicate-pushed corpus read (3 ids), never a corpus scan; tokenization is
# the same equivalence-pinned kernel the index build uses.
TV_QUERY = "data stream"
TV_K = 3


def term_vectors_top3(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    idx = _build_docs_index(sf_dir)
    top = _ranked_topk(idx, queries=[(0, TV_QUERY)], k=TV_K)
    ids = sorted(int(d) for d in top["doc_id"])

    def vectors(df: pd.DataFrame) -> pd.DataFrame:
        terms, docs, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        return pd.DataFrame({"doc_id": docs.astype(np.int64), "term": terms,
                             "tf": tfs.astype(np.int64)})

    out = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(ids),
        )
        .map_batches(vectors, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_id", "term"], ignore_index=True)


def _term_vectors_sql() -> str:
    base = _bm25_sql(queries=[(0, TV_QUERY)], k=TV_K)
    old_tail = f"""SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {TV_K}
"""
    new_tail = f"""SELECT t.doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
FROM toks t JOIN (SELECT doc_id FROM ranked WHERE rank <= {TV_K}) p
  USING (doc_id)
WHERE t.term <> ''
GROUP BY t.doc_id, t.term
ORDER BY t.doc_id, t.term
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
    from ..functions.tokenize import tokenize_text

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

    from ..state.aggregates import tree_aggregate

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


# Per-source unigram KL divergence vs the corpus distribution — the
# domain-similarity signal behind data-mixing decisions (which sources are
# distributionally far from the pool they're mixed into). One tree-merged
# (source, term) pass over the corpus (the corpus never shuffles); the KL
# sum runs on the dictionary-sized aggregate. Every source term exists in
# the corpus distribution, so q > 0 always.


def source_unigram_kl(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, docs, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        src = df.set_index("doc_id")["source"]
        out = pd.DataFrame({
            "source": src.loc[docs].to_numpy(),
            "term": terms,
            "n": tfs.astype(np.int64),
        })
        return out.groupby(["source", "term"], as_index=False)["n"].sum()

    from ..state.aggregates import tree_aggregate

    st = tree_aggregate(ds, ["source", "term"], partial,
                        {"n": "sum"}).to_pandas()
    s_tot = st.groupby("source")["n"].sum()
    c_n = st.groupby("term")["n"].sum()
    c_tot = float(st["n"].sum())
    p = st["n"].to_numpy(np.float64) / s_tot.loc[st["source"]].to_numpy(np.float64)
    q = c_n.loc[st["term"]].to_numpy(np.float64) / c_tot
    st = st.assign(term_kl=p * np.log(p / q))
    out = st.groupby("source", as_index=False).agg(
        kl=("term_kl", "sum"), n_tokens=("n", "sum"))
    out["kl"] = out["kl"].round(6)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out.sort_values("source", ignore_index=True)


SQL_SOURCE_KL = f"""
WITH toks AS (
  SELECT source, unnest({TOK_SQL}) AS term FROM documents),
st AS (
  SELECT source, term, CAST(count(*) AS DOUBLE) AS n
  FROM toks WHERE term <> '' GROUP BY source, term),
s_tot AS (SELECT source, sum(n) AS tot FROM st GROUP BY source),
c AS (SELECT term, sum(n) AS cn FROM st GROUP BY term),
c_tot AS (SELECT sum(cn) AS ctot FROM c)
SELECT st.source,
       round(sum((st.n / s_tot.tot)
                 * ln((st.n / s_tot.tot) / (c.cn / c_tot.ctot))), 6) AS kl,
       CAST(s_tot.tot AS BIGINT) AS n_tokens
FROM st
JOIN s_tot USING (source)
JOIN c USING (term)
CROSS JOIN c_tot
GROUP BY st.source, s_tot.tot
ORDER BY st.source
"""


# Per-document novelty score (Lee et al. 2022 §5 measure): fraction of a
# doc's distinct 5-token shingles appearing in no other doc. The scoring
# complement of substring_dedup_rewrite — same md5 shingle contract, same
# two-pass shape (df tree pass + dup-set broadcast).
_NOV_K = 5


def doc_novelty_stats(sf_dir: str) -> pd.DataFrame:
    from .curation import doc_novelty

    out = doc_novelty(_docs(sf_dir), k=_NOV_K).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def _novelty_sql(k: int = _NOV_K) -> str:
    parts = " || ' ' || ".join(f"t[g.i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5({parts}), 1, 16)) AS UBIGINT) AS h
  FROM toks CROSS JOIN LATERAL
       (SELECT unnest(range(1, len(t) - {k} + 2)) AS i) g
  WHERE len(t) >= {k}),
dfreq AS (SELECT h, count(*) AS df FROM sh GROUP BY h)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (WHERE dfreq.df >= 2) AS BIGINT) AS n_dup,
       round(1.0 - count(*) FILTER (WHERE dfreq.df >= 2)
                   / CAST(count(*) AS DOUBLE), 6) AS novel_frac
FROM sh JOIN dfreq USING (h)
GROUP BY sh.doc_id ORDER BY sh.doc_id
"""


# ES pipeline aggregations over a zero-filled global date_histogram:
# moving_fn (window-3 trailing moving average) + derivative. The hourly
# bucket table is one tree pass (facet-sized); zero-fill + the two window
# functions run on that bucket table, never on raw events.


def events_hourly_ma3(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hour = df["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        g = pd.DataFrame({"hour_epoch": hour}).groupby(
            "hour_epoch", as_index=False).size()
        return g.rename(columns={"size": "n_events"}).astype(
            {"n_events": np.int64})

    from ..state.aggregates import tree_aggregate

    hourly = tree_aggregate(ds, ["hour_epoch"], partial,
                            {"n_events": "sum"}).to_pandas()
    hourly = hourly.set_index("hour_epoch")["n_events"]
    grid = np.arange(hourly.index.min(), hourly.index.max() + 3600, 3600)
    n = hourly.reindex(grid, fill_value=0).astype(np.int64)
    ma3 = n.astype(np.float64).rolling(3, min_periods=1).mean().round(6)
    deriv = n.diff().fillna(0).astype(np.int64)
    return pd.DataFrame({
        "hour_epoch": grid.astype(np.int64),
        "n_events": n.to_numpy(),
        "ma3": ma3.to_numpy(),
        "deriv": deriv.to_numpy(),
    })


SQL_HOURLY_MA3 = """
WITH hourly AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         count(*) AS n
  FROM events GROUP BY 1),
grid AS (
  SELECT unnest(range((SELECT min(hour_epoch) FROM hourly),
                      (SELECT max(hour_epoch) FROM hourly) + 3600,
                      3600)) AS hour_epoch),
filled AS (
  SELECT g.hour_epoch, coalesce(h.n, 0) AS n
  FROM grid g LEFT JOIN hourly h USING (hour_epoch)),
win AS (
  SELECT hour_epoch, n,
         avg(CAST(n AS DOUBLE)) OVER (ORDER BY hour_epoch
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3,
         n - lag(n) OVER (ORDER BY hour_epoch) AS deriv
  FROM filled)
SELECT hour_epoch, CAST(n AS BIGINT) AS n_events, round(ma3, 6) AS ma3,
       CAST(coalesce(deriv, 0) AS BIGINT) AS deriv
FROM win ORDER BY hour_epoch
"""


# ES percentile_ranks: for fixed thresholds, the percentage of events.value
# at or below each — the inverse of the quantiles surface. One vectorized
# partial (4 counters per batch) + tree merge; CDF contract (fraction <= v),
# documented against ES's interpolating estimator.
PCT_RANK_VALUES = (10.0, 50.0, 100.0, 250.0)


def value_percentile_ranks(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    thr = np.asarray(PCT_RANK_VALUES, np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "threshold": thr,
            "c": (v[None, :] <= thr[:, None]).sum(axis=1).astype(np.int64),
            "n": np.full(len(thr), len(v), np.int64),
        })

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["threshold"], partial,
                         {"c": "sum", "n": "sum"}).to_pandas()
    agg["pct_rank"] = (100.0 * agg["c"] / agg["n"]).round(6)
    out = agg.sort_values("threshold", ignore_index=True)
    return out[["threshold", "pct_rank"]]


SQL_PCT_RANKS = f"""
WITH t(v) AS (SELECT unnest([{", ".join(str(v) for v in PCT_RANK_VALUES)}]))
SELECT t.v AS threshold,
       round(100.0 * sum(CASE WHEN e.value <= t.v THEN 1 ELSE 0 END)
             / count(*), 6) AS pct_rank
FROM t CROSS JOIN events e
GROUP BY t.v ORDER BY threshold
"""


# Embedding alignment (Wang & Isola 2020): per-label mean pairwise cosine
# of the L2-normalized vectors — the representation-quality signal behind
# contrastive-training evals. NEVER the O(n²) pair join at scale: with
# normalized u, mean pairwise cos = (||Σu||² − n) / (n(n−1)), so one
# streaming pass of per-label (n, Σu) partials suffices; the SQL oracle IS
# the O(n²) pair join, proving the algebra. Labels with n < 2 have no pairs
# and are omitted on both sides.


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


# BPE tokenizer APPLICATION (the encode half of the bpe_merges training
# entry): per-doc token counts under the learned merge table — the "how
# many tokens will this corpus cost" pass. Hash-checked via
# `_bpe_token_counts_sql` (train chain + per-word unrolled encode); the
# encode is also golden-tested.


def bpe_token_counts_docs(sf_dir: str) -> pd.DataFrame:
    from .bpe import bpe_token_counts, learn_bpe, word_counts

    docs = _docs(sf_dir)
    wc = word_counts(docs.select_columns(["text"]))
    merges = learn_bpe(wc, n_merges=40, min_freq=2)
    out = bpe_token_counts(docs, merges).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


# Dedup REPORTING: the cluster-size histogram a curation run publishes
# ("how much of the corpus is duplicated, in what size clusters"). Rides
# the full minhash_dedup output; per-rep sizes go through the bounded
# hash-bucket shuffle (cluster count is corpus-order at 100 TB — never a
# per-rep Python group), the histogram itself is facet-sized.


def minhash_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    clusters = minhash_dedup(_docs(sf_dir), threshold=0.7, n_perm=128,
                             bands=32)
    if isinstance(clusters, pd.DataFrame):
        # minhash_dedup's threshold-gated small path already returned the
        # driver-sized cluster table; histogram it directly
        c = clusters.groupby("rep_id", as_index=False).size() \
            .rename(columns={"size": "cluster_size"})
        h = c.groupby("cluster_size", as_index=False).size()
        out = pd.DataFrame({
            "cluster_size": h["cluster_size"].astype(np.int64),
            "n_clusters": h["size"].astype(np.int64),
        })
        return out.sort_values("cluster_size", ignore_index=True)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (df["rep_id"].to_numpy(np.int64)
                       % SESSION_BUCKETS).astype(np.int64)
        return df

    def sizes(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("rep_id", as_index=False).size() \
            .rename(columns={"size": "cluster_size"})
        h = c.groupby("cluster_size", as_index=False).size()
        return pd.DataFrame({
            "cluster_size": h["cluster_size"].astype(np.int64),
            "n_clusters": h["size"].astype(np.int64),
        })

    parts = (
        clusters.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(sizes, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("cluster_size", as_index=False)["n_clusters"].sum()
    out["n_clusters"] = out["n_clusters"].astype(np.int64)
    return out.sort_values("cluster_size", ignore_index=True)


def _minhash_cluster_sizes_sql() -> str:
    comp = _minhash_sql(threshold=0.7, bands=32, final="components")
    return f"""
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM (SELECT rep_id, CAST(count(*) AS BIGINT) AS cluster_size
      FROM ({comp}) comp GROUP BY rep_id)
GROUP BY cluster_size ORDER BY cluster_size
"""


# Argmin join (TPC-H Q2 shape without partsupp): per order, THE cheapest
# lineitem (price asc, linenumber tie-break). The reduce key is
# row-cardinality (one group per order), so it goes through the bounded
# hash-bucket shuffle with a vectorized sort + drop-duplicates per bucket —
# the per-key argmin never becomes a per-key Python call.


def cheapest_lineitem_per_order(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["l_orderkey"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "l_extendedprice", "l_linenumber"],
                          kind="mergesort")
        w = g.drop_duplicates("l_orderkey", keep="first")
        return w[["l_orderkey", "l_linenumber", "l_extendedprice"]]

    out = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(argmin, batch_format="pandas")
        .to_pandas()
    )
    out["l_linenumber"] = out["l_linenumber"].astype(np.int64)
    return out.sort_values("l_orderkey", ignore_index=True)


SQL_CHEAPEST_LINEITEM = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_extendedprice
FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice, l_linenumber) AS rn
      FROM lineitem)
WHERE rn = 1 ORDER BY l_orderkey
"""


# TPC-H Q13 (customer distribution): aggregate-of-aggregate — orders per
# customer (zero-order customers included via the left side), then the
# histogram. Per-customer counts ride the bounded bucket shuffle; the
# zero bucket is arithmetic (|customers| − |customers with orders|), never
# a customer×orders join.


def orders_per_customer_histogram(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    n_customers = pq_.read_metadata(
        os.path.join(sf_dir, "customer.parquet")).num_rows
    ds = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_custkey"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("o_custkey", as_index=False).size()
        c["__b__"] = (
            pd.util.hash_array(c["o_custkey"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return c

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("o_custkey", as_index=False)["size"].sum()
        h = c.groupby("size", as_index=False).agg(
            n_customers=("o_custkey", "size"))
        return h.rename(columns={"size": "n_orders"})

    parts = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(per_cust, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("n_orders", as_index=False)["n_customers"].sum()
    # every customer with ≥1 order is counted exactly once across buckets
    zero = n_customers - int(out["n_customers"].sum())
    if zero > 0:
        out = pd.concat([pd.DataFrame({"n_orders": [0],
                                       "n_customers": [zero]}), out],
                        ignore_index=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out.sort_values("n_orders", ignore_index=True)


SQL_ORDERS_PER_CUSTOMER = """
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM c_orders GROUP BY n_orders ORDER BY n_orders
"""


# Per-doc character-entropy (the gibberish/binary-noise heuristic in
# CCNet/RedPajama-class quality filters): Shannon entropy in nats over the
# doc's codepoints. Map-only; the per-doc histogram is one np.unique over
# the codepoint array (never a Python loop over characters).


def char_entropy_stats(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        ids, ents, lens = [], [], []
        for i, t in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            if not len(cp):
                continue
            _u, cnt = np.unique(cp, return_counts=True)
            p = cnt / len(cp)
            ids.append(int(i))
            ents.append(float(-(p * np.log(p)).sum()))
            lens.append(len(cp))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=np.int64),
            "n_chars_exact": pd.Series(lens, dtype=np.int64),
            "char_entropy": np.round(np.asarray(ents, np.float64), 6),
        })

    out = ds.map_batches(entropy, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
  FROM documents WHERE length(text) > 0),
freq AS (
  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
  FROM chars WHERE ch <> '' GROUP BY doc_id, ch),
tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id)
SELECT f.doc_id, CAST(t.n AS BIGINT) AS n_chars_exact,
       round(-sum((f.c / t.n) * ln(f.c / t.n)), 6) AS char_entropy
FROM freq f JOIN tot t USING (doc_id)
GROUP BY f.doc_id, t.n ORDER BY f.doc_id
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
    from ..index.spellcheck import spellcheck

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

    from ..functions.tokenize import tokenize_text

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


# Label-noise audit: confusion matrix of the n-gram lang-ID heuristic vs
# the corpus' lang metadata — the "which labels disagree with the signal"
# table a curation run reviews before trusting either. Per-batch vectorized
# counts (pred from the same kernel as lang_id), facet-sized tree merge.


def lang_confusion_matrix(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pred = lang_id_batch(pa.Table.from_pandas(df[["doc_id", "text"]]))
        out = pd.DataFrame({
            "lang": df["lang"].to_numpy(),
            "pred_lang": pred["pred_lang"].to_numpy(),
        })
        c = out.groupby(["lang", "pred_lang"], as_index=False).size()
        return c.rename(columns={"size": "n"}).astype({"n": np.int64})

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["lang", "pred_lang"], partial,
                         {"n": "sum"}).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    return agg.sort_values(["lang", "pred_lang"], ignore_index=True)


SQL_LANG_CONFUSION = f"""
SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
FROM ({SQL_LANG_ID}) p JOIN documents d USING (doc_id)
GROUP BY d.lang, p.pred_lang
ORDER BY d.lang, p.pred_lang
"""


# Broadcast anti-join: viewers who NEVER made a big purchase (value ≥
# BIG_PURCHASE_MIN) — the high-value-conversion drop-off cohort (the plain
# "never purchased any" variant is degenerate on this corpus: every user
# has every event type). Both distinct sets distill distributed
# (column-pruned, predicate-pushed reads); the big-buyer set (small side)
# broadcasts as an exclusion predicate — never an event-table shuffle.
BIG_PURCHASE_MIN = 250.0


def viewers_never_purchased(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "events.parquet")
    buyers = np.sort(np.asarray(
        ray.data.read_parquet(
            path, columns=["user_id"],
            filter=((pads.field("event_type") == "purchase")
                    & (pads.field("value") >= BIG_PURCHASE_MIN)),
        ).unique("user_id"),
        np.int64,
    ))
    import ray as _ray

    buyers_ref = _ray.put(buyers)

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        b = _ray.get(buyers_ref)
        u = df["user_id"].unique()
        pos = np.searchsorted(b, u)
        ok = pos < len(b)
        is_buyer = np.zeros(len(u), dtype=bool)
        if len(b):
            is_buyer[ok] = b[pos[ok]] == u[ok]
        return pd.DataFrame({"user_id": pd.Series(u[~is_buyer],
                                                  dtype=np.int64)})

    out = (
        ray.data.read_parquet(
            path, columns=["user_id"],
            filter=(pads.field("event_type") == "view"),
        )
        .map_batches(anti, batch_format="pandas")
        .unique("user_id")
    )
    return pd.DataFrame({
        "user_id": pd.Series(sorted(int(u) for u in (out or [])),
                             dtype=np.int64)
    })


SQL_VIEWERS_NEVER_PURCHASED = f"""
SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
  AND user_id NOT IN (SELECT user_id FROM events
                      WHERE event_type = 'purchase'
                        AND value >= {BIG_PURCHASE_MIN})
ORDER BY user_id
"""


# Conversion latency: per user with BOTH a view and a purchase, seconds
# from first view to first purchase (negative when the purchase predates
# any view — kept raw, the analyst's call). Two conditional mins per user
# in one bounded bucket shuffle.


def time_to_first_purchase(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
        filter=(pads.field("event_type").isin(["view", "purchase"])),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        e = df.assign(
            t=df["ts"].astype("datetime64[us]").astype("int64"))
        g = e.pivot_table(index="user_id", columns="event_type", values="t",
                          aggfunc="min")
        g = g.reindex(columns=["view", "purchase"])
        out = pd.DataFrame({
            "user_id": g.index.to_numpy(np.int64),
            "first_view": g["view"].to_numpy(np.float64),
            "first_purchase": g["purchase"].to_numpy(np.float64),
        })
        return out

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["user_id"], partial,
                         {"first_view": "min", "first_purchase": "min"}
                         ).to_pandas()
    agg = agg.dropna(subset=["first_view", "first_purchase"])
    out = pd.DataFrame({
        "user_id": agg["user_id"].astype(np.int64),
        "delta_s": ((agg["first_purchase"] - agg["first_view"])
                    / 1_000_000.0).round(6),
    })
    return out.sort_values("user_id", ignore_index=True)


SQL_TIME_TO_FIRST_PURCHASE = """
WITH m AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view') AS fv,
         min(ts) FILTER (WHERE event_type = 'purchase') AS fp
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id)
SELECT user_id, round(CAST(epoch_us(fp) - epoch_us(fv) AS DOUBLE)
                      / 1000000.0, 6) AS delta_s
FROM m WHERE fv IS NOT NULL AND fp IS NOT NULL
ORDER BY user_id
"""


# Zipf fit: OLS slope of ln(tf) on ln(rank) over the top-100 terms — the
# one-number corpus-health statistic (natural corpora sit near −1; synthetic
# or template-heavy corpora flatten). Reuses the term_tf tree pass; the
# regression runs on the 100-row table with the exact regr_slope definition.
ZIPF_TOP = 100


def zipf_slope(sf_dir: str) -> pd.DataFrame:
    top = term_tf_top100(sf_dir)  # (term, tf) — tf desc, term asc
    y = np.log(top["tf"].to_numpy(np.float64))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    slope = (((x - x.mean()) * (y - y.mean())).sum()
             / ((x - x.mean()) ** 2).sum())
    return pd.DataFrame({
        "n_terms": pd.Series([len(top)], dtype=np.int64),
        "zipf_slope": pd.Series([round(float(slope), 6)], dtype=np.float64),
    })


SQL_ZIPF_SLOPE = f"""
WITH top AS (
  SELECT term, tf, row_number() OVER (ORDER BY tf DESC, term) AS rank
  FROM ({SQL_TERM_TF_TOP100}))
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(ln(CAST(tf AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
         AS zipf_slope
FROM top
"""


# PMI collocations: top bigrams by pointwise mutual information
# ln(n_ab·T / (c_a·c_b)) among pairs with n_ab ≥ PMI_MIN_N — the classic
# collocation-mining pass (phrase-vocabulary induction for tokenizers).
# Reuses the bigram and unigram tree passes; PMI math runs on the
# dictionary-sized aggregates. T = total bigram windows, c_x = unigram
# occurrences, both under the shared tokenizer contract.
PMI_MIN_N = 5
PMI_TOP = 20


def pmi_top_bigrams(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate
    from .textstats import bigram_partial

    docs = _docs(sf_dir)
    big = tree_aggregate(docs, ["bigram"], bigram_partial,
                         {"n": "sum"}).to_pandas()

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, _docs_, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        out = pd.DataFrame({"term": terms, "c": tfs.astype(np.int64)})
        return out.groupby("term", as_index=False)["c"].sum()

    uni = tree_aggregate(docs, ["term"], uni_partial,
                         {"c": "sum"}).to_pandas().set_index("term")["c"]
    t_total = float(big["n"].sum())
    big = big[big["n"] >= PMI_MIN_N].copy()
    parts = big["bigram"].str.split(" ", n=1, expand=True)
    ca = uni.loc[parts[0]].to_numpy(np.float64)
    cb = uni.loc[parts[1]].to_numpy(np.float64)
    big["pmi"] = np.round(
        np.log(big["n"].to_numpy(np.float64) * t_total / (ca * cb)), 6)
    big["n"] = big["n"].astype(np.int64)
    out = big.sort_values(["pmi", "bigram"], ascending=[False, True],
                          kind="mergesort").head(PMI_TOP)
    return out.reset_index(drop=True)[["bigram", "n", "pmi"]]


SQL_PMI_BIGRAMS = f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
bg AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2),
bgc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY bigram),
uni AS (
  SELECT unnest(t) AS term FROM toks),
unic AS (SELECT term, CAST(count(*) AS DOUBLE) AS c FROM uni GROUP BY term),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM bgc)
SELECT b.bigram, b.n,
       round(ln(CAST(b.n AS DOUBLE) * tot.t
                / (ua.c * ub.c)), 6) AS pmi
FROM bgc b
JOIN unic ua ON ua.term = string_split(b.bigram, ' ')[1]
JOIN unic ub ON ub.term = string_split(b.bigram, ' ')[2]
CROSS JOIN tot
WHERE b.n >= {PMI_MIN_N}
ORDER BY pmi DESC, b.bigram
LIMIT {PMI_TOP}
"""


# Dedup reporting by domain: per-source exact-duplicate rate — the "which
# sources are template farms" table. One (source, md5) keyed pass; rates
# computed on the facet-sized aggregate. A doc counts as a dupe when its
# content hash appears more than once WITHIN its source (cross-source
# equality is the decontamination entry's business).


def dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import md5_hex

        out = pd.DataFrame({
            "source": df["source"].to_numpy(),
            "h": md5_hex(df["text"].to_numpy()),
        })
        g = out.groupby(["source", "h"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": np.int64})

    from ..state.aggregates import tree_aggregate

    agg = tree_aggregate(ds, ["source", "h"], partial,
                         {"n": "sum"}).to_pandas()
    g = agg.groupby("source").agg(
        n_docs=("n", "sum"), n_distinct=("h", "size"))
    out = pd.DataFrame({
        "source": g.index.to_numpy(),
        "n_docs": g["n_docs"].astype(np.int64).to_numpy(),
        "n_dupes": (g["n_docs"] - g["n_distinct"]).astype(np.int64).to_numpy(),
    })
    out["dup_rate"] = (out["n_dupes"] / out["n_docs"]).round(6)
    return out.sort_values("source", ignore_index=True)


SQL_DUP_RATE_BY_SOURCE = """
WITH h AS (
  SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, md5(text))
SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(n) - count(*) AS BIGINT) AS n_dupes,
       round((sum(n) - count(*)) / CAST(sum(n) AS DOUBLE), 6) AS dup_rate
FROM h GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 (large-volume orders): aggregate-HAVING on the fact table, then
# join the rare winners back to their order/customer rows. Per-order sums
# ride the bounded bucket shuffle (never a per-order Ray group call); only
# orders past the threshold — the top ~percentile by construction — leave
# the reduce, so both join-backs are broadcast semi-joins, not shuffles.
# ---------------------------------------------------------------------------

Q18_MIN_QTY = 250.0


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        g["__b__"] = (
            pd.util.hash_array(g["l_orderkey"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return g

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        return s[s["l_quantity"] > Q18_MIN_QTY]

    big = (
        li.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(winners, batch_format="pandas")
        .to_pandas()
    )
    okeys_ref = ray.put(set(big["l_orderkey"].tolist()))

    def pick_orders(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(okeys_ref)
        return df[df["o_orderkey"].isin(ks)]

    orders = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(pick_orders, batch_format="pandas")
        .to_pandas()
    )
    ckeys_ref = ray.put(set(orders["o_custkey"].tolist()))

    def pick_cust(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ckeys_ref)
        return df[df["c_custkey"].isin(ks)]

    cust = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name"],
        )
        .map_batches(pick_cust, batch_format="pandas")
        .to_pandas()
    )
    out = orders.merge(
        big.rename(columns={"l_orderkey": "o_orderkey"}), on="o_orderkey"
    ).merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = out["l_quantity"].round().astype(np.int64)
    out["o_orderdate"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
    out["o_totalprice"] = out["o_totalprice"].round(4)
    out = out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
               "o_totalprice", "sum_qty"]]
    return out.sort_values("o_orderkey", ignore_index=True)


SQL_Q18_LARGE_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {Q18_MIN_QTY})
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o.o_totalprice, 4) AS o_totalprice,
       CAST(round(b.qty) AS BIGINT) AS sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_orderkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q16-style supplier variety: distinct suppliers per (brand, size)
# excluding blacklisted suppliers. part and the blacklist are dimensions —
# broadcast once; the fact scan maps partkey→(brand,size) in place and
# dedups per batch, so the only aggregation is over the bounded
# (brand × size × supplier) triple table, never the fact rows.
# ---------------------------------------------------------------------------


def part_supplier_variety(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    part = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    ).to_pandas()
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"],
    ).to_pandas()
    dims_ref = ray.put((
        dict(zip(part["p_partkey"], part["p_brand"])),
        dict(zip(part["p_partkey"], part["p_size"].astype(np.int64))),
        set(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"].tolist()),
    ))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bmap, smap, bad = ray.get(dims_ref)
        df = df[~df["l_suppkey"].isin(bad)]
        out = pd.DataFrame({
            "p_brand": df["l_partkey"].map(bmap),
            "p_size": df["l_partkey"].map(smap).astype(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(),
        }).drop_duplicates()
        out["one"] = np.int64(1)
        return out

    agg = tree_aggregate(
        li, ["p_brand", "p_size", "l_suppkey"], partial, {"one": "max"}
    ).to_pandas()
    out = agg.groupby(["p_brand", "p_size"], as_index=False).agg(
        supplier_cnt=("l_suppkey", "size"))
    out["p_size"] = out["p_size"].astype(np.int64)
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_size"],
        ascending=[False, True, True], ignore_index=True)


SQL_PART_SUPPLIER_VARIETY = """
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# ---------------------------------------------------------------------------
# Distributed second moments → covariance matrix and PCA. The corpus pass
# emits per-batch sufficient statistics (X^T X upper triangle, column sums,
# count) as (i, j, s) rows — d(d+1)/2 + d + 1 floats per batch, independent
# of batch rows — tree-merged exactly. Everything downstream (covariance,
# power iteration) runs on the driver over the d×d matrix: the classic
# pattern where the DATA never moves, only sufficient statistics do.
# ---------------------------------------------------------------------------


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
    from ..state.aggregates import tree_aggregate

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
# N-gram diversity per source (self-repetition / memorization risk metric):
# distinct word trigrams over total trigrams. Trigram strings are deduped
# per batch, then shuffled into BOUNDED hash buckets (never a per-trigram
# group) for the exact global distinct; totals are a scalar partial. At
# 100 TB the exact distinct swaps for the HLL sketch used elsewhere.
# ---------------------------------------------------------------------------


def ngram_diversity_by_source(sf_dir: str) -> pd.DataFrame:
    from ..functions.tokenize import tokenize_text

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts: dict[tuple[str, str], int] = {}
        for src, t in zip(df["source"], df["text"]):
            toks = tokenize_text(t)
            for a, b, c in zip(toks, toks[1:], toks[2:]):
                k = (src, a + " " + b + " " + c)
                counts[k] = counts.get(k, 0) + 1
        ks = list(counts.keys())
        out = pd.DataFrame({
            "source": [k[0] for k in ks],
            "g": [k[1] for k in ks],
            "n": np.fromiter(counts.values(), dtype=np.int64, count=len(ks)),
        })
        out["__b__"] = (
            pd.util.hash_array(out["g"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("source", as_index=False).agg(
            n_trigrams=("n", "sum"), n_distinct=("g", "nunique"))
        return s

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b__")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("source", as_index=False).agg(
        n_trigrams=("n_trigrams", "sum"), n_distinct=("n_distinct", "sum"))
    out["n_trigrams"] = out["n_trigrams"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    out["diversity"] = (out["n_distinct"] / out["n_trigrams"]).round(6)
    return out.sort_values("source", ignore_index=True)


SQL_NGRAM_DIVERSITY = f"""
WITH toks AS (
  SELECT source, list_filter({TOK_SQL}, x -> x <> '') AS t FROM documents),
tg AS (
  SELECT source,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM toks WHERE len(t) >= 3)
SELECT source, CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       round(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 6) AS diversity
FROM tg GROUP BY source ORDER BY source
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
    from ..state.aggregates import tree_aggregate

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
# ROLLUP revenue (OLAP grouping sets): finest (nation, year) cells come from
# ONE tree-merged pass in exact int64 cents; the coarser levels are derived
# from that facet-sized table on the driver — rollups never rescan the fact
# table. Sentinel '*ALL*' / -1 instead of NULL keeps the hash compare exact.
# ---------------------------------------------------------------------------


def rollup_revenue(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put((dict(zip(cust["c_custkey"], cust["c_nationkey"])),
                   dict(zip(nation["n_nationkey"], nation["n_name"]))))

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cn, nn = ray.get(ref)
        out = pd.DataFrame({
            "n_name": df["o_custkey"].map(lambda c: nn[cn[c]]),
            "order_year": df["o_orderdate"].dt.year.astype(np.int64),
            "cents": np.round(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64),
        })
        return out.groupby(["n_name", "order_year"], as_index=False).agg(
            revenue_cents=("cents", "sum"))

    fine = tree_aggregate(orders, ["n_name", "order_year"], partial,
                          {"revenue_cents": "sum"}).to_pandas()
    by_nation = fine.groupby("n_name", as_index=False).agg(
        revenue_cents=("revenue_cents", "sum"))
    by_nation["order_year"] = np.int64(-1)
    total = pd.DataFrame({"n_name": ["*ALL*"], "order_year": [np.int64(-1)],
                          "revenue_cents": [fine["revenue_cents"].sum()]})
    out = pd.concat([fine, by_nation, total], ignore_index=True)
    out["order_year"] = out["order_year"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values(["n_name", "order_year"], ignore_index=True)


SQL_ROLLUP_REVENUE = """
SELECT COALESCE(n_name, '*ALL*') AS n_name,
       CAST(COALESCE(yr, -1) AS BIGINT) AS order_year,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM (SELECT n_name, year(o_orderdate) AS yr, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey)
GROUP BY ROLLUP(n_name, yr)
ORDER BY n_name, order_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q10-style returned-item report: revenue lost to returns per customer
# in one quarter, top 20. Shape: fact-side filter PUSHED TO THE READ (only
# 'R' rows ever leave parquet), per-orderkey partial aggregation shrinks the
# fact stream to <= |orders| rows BEFORE the one bucketed hash join with the
# windowed orders slice, then a bounded per-customer aggregation. The final
# customer/nation decoration reads only the 20 winning custkeys (pushdown
# isin filter), so the customer table never streams in full.
# ---------------------------------------------------------------------------

Q10_WINDOW = ("1996-01-01", "1996-04-01")


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"),
    )

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1 - df["l_discount"]))
        out = df.groupby("l_orderkey", as_index=False).agg(
            revenue=("rev", "sum"), n_items=("rev", "size"))
        return out.rename(columns={"l_orderkey": "o_orderkey"})

    order_rev = tree_aggregate(li, ["o_orderkey"], per_order,
                               {"revenue": "sum", "n_items": "sum"})

    lo, hi = (pd.Timestamp(d) for d in Q10_WINDOW)
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=((pads.field("o_orderdate") >= lo.to_pydatetime())
                & (pads.field("o_orderdate") < hi.to_pydatetime())),
    )
    joined = hash_join(order_rev, orders, on="o_orderkey", n_buckets=16)

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("n_items", "sum"))

    agg = tree_aggregate(joined, ["o_custkey"], per_cust,
                         {"revenue": "sum", "n_items": "sum"}).to_pandas()
    agg["revenue"] = agg["revenue"].round(4)
    top = agg.sort_values(["revenue", "o_custkey"], ascending=[False, True],
                          kind="mergesort").head(20)

    import pyarrow.parquet as pq_

    keys = top["o_custkey"].astype("int64").tolist()
    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", keys)],
    ).to_pandas()
    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = top.rename(columns={"o_custkey": "c_custkey"}).merge(
        cust[["c_custkey", "c_name", "n_name"]], on="c_custkey")
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    out["n_items"] = out["n_items"].astype(np.int64)
    out = out[["c_custkey", "c_name", "n_name", "revenue", "n_items"]]
    return out.sort_values(["revenue", "c_custkey"],
                           ascending=[False, True], kind="mergesort",
                           ignore_index=True)


SQL_Q10_RETURNED_ITEMS = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{Q10_WINDOW[0]}'
  AND o.o_orderdate <  TIMESTAMP '{Q10_WINDOW[1]}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q14-style promotion effect: per ship-month, the revenue share of
# PROMO-type parts. part is the broadcast dimension (partkey→is_promo bit
# shipped once via ray.put); the fact pass pre-aggregates to one row per
# month per batch, so the tree merge moves O(months) rows.
# ---------------------------------------------------------------------------

Q14_YEAR = 1996


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    part = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(
        set(part.loc[part["p_type"] == "PROMO", "p_partkey"].tolist()))

    lo = pd.Timestamp(f"{Q14_YEAR}-01-01").to_pydatetime()
    hi = pd.Timestamp(f"{Q14_YEAR + 1}-01-01").to_pydatetime()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        promo = ray.get(promo_ref)
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        is_promo = df["l_partkey"].isin(promo).to_numpy()
        out = pd.DataFrame({
            "ship_month": df["l_shipdate"].dt.strftime("%Y-%m"),
            "promo_rev": np.where(is_promo, rev, 0.0),
            "total_rev": rev,
        })
        return out.groupby("ship_month", as_index=False).agg(
            promo_rev=("promo_rev", "sum"), total_rev=("total_rev", "sum"))

    agg = tree_aggregate(li, ["ship_month"], partial,
                         {"promo_rev": "sum", "total_rev": "sum"}).to_pandas()
    out = pd.DataFrame({
        "ship_month": agg["ship_month"],
        "promo_share_pct": np.round(
            100.0 * agg["promo_rev"] / agg["total_rev"], 6),
        "total_revenue": agg["total_rev"].round(2),
    })
    return out.sort_values("ship_month", ignore_index=True)


SQL_Q14_PROMO_REVENUE = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_YEAR}-01-01'
  AND l_shipdate <  TIMESTAMP '{Q14_YEAR + 1}-01-01'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q19-style bracketed revenue: three OR'd predicate groups, each a
# conjunction over a part attribute (broadcast dim) and a lineitem range.
# The whole disjunction evaluates vectorized inside one fact pass; output is
# one row per bracket (revenue + matched-row count), merged by tree.
# ---------------------------------------------------------------------------

Q19_BRACKETS = (
    # (name, p_type, max p_size, qty lo, qty hi)
    ("small", "SMALL", 10, 1.0, 15.0),
    ("medium", "MEDIUM", 25, 10.0, 30.0),
    ("large", "LARGE", 50, 20.0, 50.0),
)


def q19_bracket_revenue(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    part = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type", "p_size"]).to_pandas()
    dims_ref = ray.put((
        dict(zip(part["p_partkey"], part["p_type"])),
        dict(zip(part["p_partkey"], part["p_size"].astype(np.int64))),
    ))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tmap, smap = ray.get(dims_ref)
        ptype = df["l_partkey"].map(tmap).to_numpy()
        psize = df["l_partkey"].map(smap).to_numpy(np.int64)
        qty = df["l_quantity"].to_numpy()
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        rows = []
        for name, typ, max_size, qlo, qhi in Q19_BRACKETS:
            m = (ptype == typ) & (psize <= max_size) & (qty >= qlo) & (qty <= qhi)
            rows.append((name, float(rev[m].sum()), int(m.sum())))
        return pd.DataFrame(rows, columns=["bracket", "revenue", "n_items"])

    agg = tree_aggregate(li, ["bracket"], partial,
                         {"revenue": "sum", "n_items": "sum"}).to_pandas()
    agg["revenue"] = agg["revenue"].round(4)
    agg["n_items"] = agg["n_items"].astype(np.int64)
    agg = agg[agg["n_items"] > 0]
    return agg.sort_values("bracket", ignore_index=True)


def _q19_sql() -> str:
    arms = []
    for name, typ, max_size, qlo, qhi in Q19_BRACKETS:
        arms.append(
            f"SELECT '{name}' AS bracket,"
            f" round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,"
            f" CAST(count(*) AS BIGINT) AS n_items"
            f" FROM lineitem JOIN part ON l_partkey = p_partkey"
            f" WHERE p_type = '{typ}' AND p_size <= {max_size}"
            f" AND l_quantity BETWEEN {qlo} AND {qhi}"
            f" HAVING count(*) > 0"
        )
    return " UNION ALL ".join(arms) + " ORDER BY bracket"


# ---------------------------------------------------------------------------
# TPC-H Q22-style idle-balance report: CHURNED customers — no orders since
# the cutoff — whose balance beats the positive-balance average, counted per
# market segment. The global average is a broadcast SCALAR held in exact
# integer form (cents_sum, n) so the > comparison is integer arithmetic on
# both sides — no float-threshold flakiness. The recent-orders set is a
# broadcast sorted array anti-join (searchsorted per batch, and the order
# scan is date-pruned at the read); at 100 TB swap the broadcast for
# joins.hash_join(how='left') + null-filter, same downstream.
# ---------------------------------------------------------------------------

Q22_ACTIVE_SINCE = "2000-01-01"


def q22_idle_balance(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ..state.aggregates import tree_aggregate

    cust_path = os.path.join(sf_dir, "customer.parquet")

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        pos = cents[cents > 0]
        return pd.DataFrame({"k": [0], "cents": [int(pos.sum())],
                             "n": [int(len(pos))]})

    bal = tree_aggregate(
        ray.data.read_parquet(cust_path, columns=["c_acctbal"]),
        ["k"], bal_partial, {"cents": "sum", "n": "sum"}).to_pandas()
    cents_sum, n_pos = int(bal["cents"].iloc[0]), int(bal["n"].iloc[0])

    cut = pd.Timestamp(Q22_ACTIVE_SINCE).to_pydatetime()
    have_orders = np.sort(np.asarray(
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"],
            filter=(pads.field("o_orderdate") >= cut),
        ).unique("o_custkey"),
        np.int64))
    have_ref = ray.put(have_orders)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(have_ref)
        cents = np.round(df["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        # integer-exact "cents > avg_cents": cents * n_pos > cents_sum
        rich = cents * n_pos > cents_sum
        keys = df["c_custkey"].to_numpy(np.int64)
        pos = np.searchsorted(h, keys)
        ok = pos < len(h)
        has = np.zeros(len(keys), dtype=bool)
        if len(h):
            has[ok] = h[pos[ok]] == keys[ok]
        keep = rich & ~has
        out = pd.DataFrame({"c_mktsegment": df["c_mktsegment"].to_numpy()[keep],
                            "cents": cents[keep]})
        return out.groupby("c_mktsegment", as_index=False).agg(
            numcust=("cents", "size"), totacctbal_cents=("cents", "sum"))

    agg = tree_aggregate(
        ray.data.read_parquet(
            cust_path, columns=["c_custkey", "c_acctbal", "c_mktsegment"]),
        ["c_mktsegment"], pick,
        {"numcust": "sum", "totacctbal_cents": "sum"}).to_pandas()
    agg["numcust"] = agg["numcust"].astype(np.int64)
    agg["totacctbal_cents"] = agg["totacctbal_cents"].astype(np.int64)
    return agg.sort_values("c_mktsegment", ignore_index=True)


SQL_Q22_IDLE_BALANCE = f"""
WITH pos AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cents_sum,
         count(*) AS n FROM customer WHERE round(c_acctbal * 100) > 0)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM pos)
        > (SELECT cents_sum FROM pos)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '{Q22_ACTIVE_SINCE}')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Per-customer inter-order gaps: SQL lag() OVER (PARTITION BY custkey ORDER
# BY date) re-expressed as a hash-bucket shuffle + per-bucket vectorized
# segment diff (the user_sessions / rolling-window pattern — the sort is per
# bucket, never global). Only customers with >= 2 orders emit a row.
# ---------------------------------------------------------------------------


def customer_order_gaps(sf_dir: str) -> pd.DataFrame:
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["o_custkey"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort", ignore_index=True)
        cust = g["o_custkey"].to_numpy(np.int64)
        days = (g["o_orderdate"].astype("datetime64[s]").astype("int64")
                .to_numpy() // 86400)
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        ends = np.r_[starts[1:], len(g)]
        keep = (ends - starts) >= 2
        s2, e2 = starts[keep], ends[keep]
        if not len(s2):
            return pd.DataFrame({
                "c_custkey": pd.Series(dtype=np.int64),
                "n_orders": pd.Series(dtype=np.int64),
                "avg_gap_days": pd.Series(dtype=np.float64),
                "max_gap_days": pd.Series(dtype=np.int64)})
        n_gaps = e2 - s2 - 1
        # consecutive-gap sums telescope: sum = last - first
        avg = np.round((days[e2 - 1] - days[s2]) / n_gaps, 6)
        # per-segment max gap, fully vectorized: mask cross-customer diffs
        # to -1 (real gaps are >= 0), then reduceat at segment starts — the
        # masked positions between kept segments can never win the max
        dd = np.where(cust[1:] == cust[:-1], np.diff(days), -1)
        mx = np.maximum.reduceat(dd, s2)
        return pd.DataFrame({
            "c_custkey": cust[s2], "n_orders": (e2 - s2).astype(np.int64),
            "avg_gap_days": avg, "max_gap_days": mx.astype(np.int64)})

    out = (
        orders.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(gaps, batch_format="pandas")
        .to_pandas()
    )
    for c in ("c_custkey", "n_orders", "max_gap_days"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("c_custkey", ignore_index=True)


SQL_CUSTOMER_ORDER_GAPS = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders)
SELECT o_custkey AS c_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(gap), 6) AS avg_gap_days,
       CAST(max(gap) AS BIGINT) AS max_gap_days
FROM g GROUP BY o_custkey HAVING count(gap) >= 1
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Canonical-document selection per near-duplicate cluster: the standard
# "keep the best copy" curation step after MinHash dedup. The cluster table
# (doc_id, rep_id — dup-cluster members only) hash-joins with the pruned
# (doc_id, n_chars) projection of the corpus, then one rep_id-bucketed pass
# picks argmax(n_chars, tie doc_id asc) and the cluster size vectorized —
# the corpus text never moves, and no per-cluster Python call is made.
# ---------------------------------------------------------------------------


def cluster_canonical_docs(sf_dir: str) -> pd.DataFrame:
    from .joins import hash_join

    clusters = minhash_dedup(_docs(sf_dir), threshold=0.7, n_perm=128,
                             bands=32)
    empty = pd.DataFrame({
        "rep_id": pd.Series(dtype=np.int64),
        "canonical_doc_id": pd.Series(dtype=np.int64),
        "cluster_size": pd.Series(dtype=np.int64),
        "canonical_n_chars": pd.Series(dtype=np.int64)})
    if isinstance(clusters, pd.DataFrame):
        if not len(clusters):
            return empty
        clusters = ray.data.from_pandas(clusters)

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "n_chars"])
    j = hash_join(clusters, docs, on="doc_id", n_buckets=16)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (df["rep_id"].to_numpy(np.int64)
                       % SESSION_BUCKETS).astype(np.int64)
        return df

    def canon(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rep_id", "n_chars", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.assign(cluster_size=g.groupby("rep_id")["doc_id"]
                     .transform("size"))
        w = g.drop_duplicates("rep_id", keep="first")
        return pd.DataFrame({
            "rep_id": w["rep_id"].to_numpy(np.int64),
            "canonical_doc_id": w["doc_id"].to_numpy(np.int64),
            "cluster_size": w["cluster_size"].to_numpy(np.int64),
            "canonical_n_chars": w["n_chars"].to_numpy(np.int64)})

    out = (
        j.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(canon, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return empty
    return out.sort_values("rep_id", ignore_index=True)


def _cluster_canonical_sql() -> str:
    comp = _minhash_sql(threshold=0.7, bands=32, final="components")
    return f"""
WITH j AS (
  SELECT c.rep_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.rep_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn,
         count(*) OVER (PARTITION BY c.rep_id) AS csize
  FROM ({comp}) c JOIN documents d ON d.doc_id = c.doc_id)
SELECT CAST(rep_id AS BIGINT) AS rep_id,
       CAST(doc_id AS BIGINT) AS canonical_doc_id,
       CAST(csize AS BIGINT) AS cluster_size,
       CAST(n_chars AS BIGINT) AS canonical_n_chars
FROM j WHERE rn = 1 ORDER BY rep_id
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
    from ..state.aggregates import tree_aggregate

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


# ---------------------------------------------------------------------------
# Per-document lexical diversity (type-token ratio + hapax counts): a
# standard corpus-quality signal. One stateless vectorized pass — the
# (term, doc, tf) triple builder already used by the index build gives
# distinct/hapax/total counts per doc without any cross-batch state.
# ---------------------------------------------------------------------------


def doc_ttr_stats(sf_dir: str):
    ds = _docs(sf_dir)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        _terms, docs, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy())
        t = pd.DataFrame({"doc_id": docs, "tf": tfs,
                          "h": (tfs == 1).astype(np.int64)})
        g = t.groupby("doc_id", as_index=False).agg(
            n_tokens=("tf", "sum"), distinct_terms=("tf", "size"),
            hapax_terms=("h", "sum"))
        g["ttr"] = np.round(g["distinct_terms"] / g["n_tokens"], 6)
        for c in ("doc_id", "n_tokens", "distinct_terms", "hapax_terms"):
            g[c] = g[c].astype(np.int64)
        return g

    return ds.map_batches(fn, batch_format="pandas")


SQL_DOC_TTR_STATS = f"""
WITH t AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents)
  WHERE term <> '' GROUP BY 1, 2)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS distinct_terms,
       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_terms,
       round(CAST(count(*) AS DOUBLE) / sum(tf), 6) AS ttr
FROM t GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# TPC-H Q5-style local-supplier volume: the six-table star join. The one
# big×big edge (lineitem ⋈ windowed orders) goes through the bucketed hash
# join; every other table is a bounded dimension broadcast once via ray.put
# (nation/region always; supplier/customer maps here too — at 100 TB the
# customer map becomes a second hash_join, same downstream). The
# same-nation predicate evaluates vectorized inside the fact pass.
# ---------------------------------------------------------------------------

Q5_YEAR = 1996
Q5_REGION = "EUROPE"


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq_.read_table(
        os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = set(region.loc[region["r_name"] == Q5_REGION,
                          "r_regionkey"].tolist())
    in_region = set(
        nation.loc[nation["n_regionkey"].isin(rkey), "n_nationkey"].tolist())
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"]).to_pandas()
    dims_ref = ray.put((
        dict(zip(sup["s_suppkey"], sup["s_nationkey"])),
        dict(zip(cust["c_custkey"], cust["c_nationkey"])),
        in_region, nname,
    ))

    lo = pd.Timestamp(f"{Q5_YEAR}-01-01").to_pydatetime()
    hi = pd.Timestamp(f"{Q5_YEAR + 1}-01-01").to_pydatetime()
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=((pads.field("o_orderdate") >= lo)
                & (pads.field("o_orderdate") < hi)),
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(li, orders, on="o_orderkey", n_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        smap, cmap, reg, names = ray.get(dims_ref)
        sn = df["l_suppkey"].map(smap).to_numpy(np.int64)
        cn = df["o_custkey"].map(cmap).to_numpy(np.int64)
        keep = (sn == cn) & np.isin(sn, list(reg))
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        out = pd.DataFrame({
            "n_name": [names[int(v)] for v in sn[keep]],
            "revenue": rev[keep], "n_items": np.int64(1)})
        return out.groupby("n_name", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("n_items", "sum"))

    agg = tree_aggregate(joined, ["n_name"], partial,
                         {"revenue": "sum", "n_items": "sum"}).to_pandas()
    agg["revenue"] = agg["revenue"].round(4)
    agg["n_items"] = agg["n_items"].astype(np.int64)
    return agg.sort_values(["revenue", "n_name"], ascending=[False, True],
                           kind="mergesort", ignore_index=True)


SQL_Q5_LOCAL_SUPPLIER = f"""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_YEAR}-01-01'
  AND o_orderdate <  TIMESTAMP '{Q5_YEAR + 1}-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q4-style order-priority count: orders in one quarter having EXISTS a
# late-shipping lineitem (l_shipdate > o_orderdate). The EXISTS semi-join:
# bucketed hash join of the (pushdown-pruned) lineitem scan with the
# windowed orders, predicate filter, then per-batch (orderkey, priority)
# dedup → orderkey-bucketed distinct → tiny per-priority sum. The distinct
# set never lands on one worker.
# ---------------------------------------------------------------------------

Q4_WINDOW = ("1996-07-01", "1996-10-01")


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    lo, hi = (pd.Timestamp(d) for d in Q4_WINDOW)
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=((pads.field("o_orderdate") >= lo.to_pydatetime())
                & (pads.field("o_orderdate") < hi.to_pydatetime())),
    )
    # any qualifying lineitem ships strictly after its order date, which is
    # >= the window's lower bound — pushdown prunes the fact scan
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
        filter=(pads.field("l_shipdate") > lo.to_pydatetime()),
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(li, orders, on="o_orderkey", n_buckets=16)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > df["o_orderdate"]]
        out = df[["o_orderkey", "o_orderpriority"]].drop_duplicates()
        out = out.copy()
        out["__b__"] = (
            pd.util.hash_array(
                out["o_orderkey"].to_numpy(np.int64), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return out

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        w = g.drop_duplicates("o_orderkey")
        out = w.groupby("o_orderpriority", as_index=False).agg(
            order_count=("o_orderkey", "size"))
        return out

    parts = (
        joined.map_batches(dedup, batch_format="pandas")
        .groupby("__b__")
        .map_groups(count_distinct, batch_format="pandas")
    )

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["o_orderpriority", "order_count"]]

    agg = tree_aggregate(parts, ["o_orderpriority"], ident,
                         {"order_count": "sum"}).to_pandas()
    agg["order_count"] = agg["order_count"].astype(np.int64)
    return agg.sort_values("o_orderpriority", ignore_index=True)


SQL_Q4_ORDER_PRIORITY = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_WINDOW[0]}'
  AND o_orderdate <  TIMESTAMP '{Q4_WINDOW[1]}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Winsorized statistics (outlier clipping, the standard robust-mean step
# before normalizing a numeric feature): exact distributed p01/p99 via the
# two-pass histogram quantile, thresholds ROUNDED to 6 dp so both sides clip
# at bit-identical boundaries, then one streaming clipped-moment pass.
# ---------------------------------------------------------------------------

WINSOR_QS = (0.01, 0.99)


def winsorized_value_stats(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate
    from .quantiles import exact_quantiles

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["value"])
    qs = exact_quantiles(ds, "value", list(WINSOR_QS))
    lo = round(float(qs.loc[qs["q"] == WINSOR_QS[0], "value"].iloc[0]), 6)
    hi = round(float(qs.loc[qs["q"] == WINSOR_QS[1], "value"].iloc[0]), 6)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        c = np.clip(v, lo, hi)
        return pd.DataFrame({
            "k": [0], "s": [float(c.sum())], "n": [len(c)],
            "n_low": [int((v < lo).sum())], "n_high": [int((v > hi).sum())]})

    agg = tree_aggregate(
        ray.data.read_parquet(path, columns=["value"]),
        ["k"], partial,
        {"s": "sum", "n": "sum", "n_low": "sum", "n_high": "sum"},
    ).to_pandas()
    return pd.DataFrame({
        "lo": [lo], "hi": [hi],
        "winsorized_mean": [round(float(agg["s"].iloc[0])
                                  / float(agg["n"].iloc[0]), 6)],
        "n_clipped_low": [np.int64(agg["n_low"].iloc[0])],
        "n_clipped_high": [np.int64(agg["n_high"].iloc[0])],
    })


SQL_WINSORIZED_VALUE_STATS = f"""
WITH q AS (SELECT quantile_cont(value, [{WINSOR_QS[0]}, {WINSOR_QS[1]}]) AS v
           FROM events),
b AS (SELECT round(v[1], 6) AS lo, round(v[2], 6) AS hi FROM q)
SELECT b.lo, b.hi,
       round(avg(CASE WHEN value < b.lo THEN b.lo
                      WHEN value > b.hi THEN b.hi ELSE value END), 6)
         AS winsorized_mean,
       CAST(sum(CASE WHEN value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high
FROM events, b GROUP BY b.lo, b.hi
"""


# ---------------------------------------------------------------------------
# Weighted prefix suggester (the Solr /suggest surface with a popularity
# weight, vs terms_browse's lexicographic browse): per prefix, the top 8
# terms by corpus tf. The per-batch partial filters to prefix matches
# BEFORE the tree merge, so only candidate rows shuffle.
# ---------------------------------------------------------------------------

SUGGEST_PREFIXES = ("s", "c", "b")
SUGGEST_TOPN = 8


def suggest_topk(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

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


# ---------------------------------------------------------------------------
# Incremental dedup against an existing corpus (the "nightly crawl delta"
# shape): the last 20% of docs (by id) are the delta; each delta doc is
# classified 'dup_of_base' (content hash already in the base 80%),
# 'dup_in_delta' (an earlier delta doc has the same hash), or 'new'.
# Base hashes are a broadcast sorted array (searchsorted per batch); the
# within-delta first-wins pass is a bounded hash-bucket shuffle keyed by
# content hash. md5 is the documented oracle contract (SQL md5()).
# ---------------------------------------------------------------------------


def incremental_dedup_new_docs(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from .dedup import md5_hex

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
# Co-purchase pair mining (market-basket self-join): top 20 part pairs by
# the number of orders containing both. The self-join happens INSIDE each
# orderkey hash bucket (per-order part lists are tiny, so the pair blowup
# is bounded), pair counts pre-aggregate per bucket, and the tree merge
# reduces over the pair domain — the fact table shuffles exactly once.
# ---------------------------------------------------------------------------

COPURCHASE_TOPN = 20


def copurchase_top_pairs(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        u = df[["l_orderkey", "l_partkey"]].drop_duplicates().copy()
        u["__b__"] = (
            pd.util.hash_array(u["l_orderkey"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return u

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        u = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = u.merge(u, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        c = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return c.rename(columns={"l_partkey_x": "part_a",
                                 "l_partkey_y": "part_b",
                                 "size": "n_orders"})

    counts = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(pairs, batch_format="pandas")
    )

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["part_a", "part_b", "n_orders"]]

    agg = tree_aggregate(counts, ["part_a", "part_b"], ident,
                         {"n_orders": "sum"}).to_pandas()
    agg = agg.sort_values(["n_orders", "part_a", "part_b"],
                          ascending=[False, True, True], kind="mergesort")
    agg = agg.head(COPURCHASE_TOPN).reset_index(drop=True)
    for c in ("part_a", "part_b", "n_orders"):
        agg[c] = agg[c].astype(np.int64)
    return agg


SQL_COPURCHASE_TOP_PAIRS = f"""
WITH u AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM u a JOIN u b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {COPURCHASE_TOPN}
"""


# ---------------------------------------------------------------------------
# Semi-structured (JSON) field extraction + aggregate: events.props is a
# JSON string column; extract $.k and aggregate per event type. The hot
# path uses a compiled vectorized regex (exact for this single-key integer
# schema — generic nested JSON would go through a json.loads actor stage);
# the DuckDB oracle uses real json_extract, so the shortcut is verified.
# ---------------------------------------------------------------------------


def props_k_stats_by_type(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                            "k": pd.to_numeric(k)})
        out = out.dropna(subset=["k"])
        out["k"] = out["k"].astype(np.int64)
        g = out.groupby("event_type", as_index=False).agg(
            n=("k", "size"), s=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"))
        return g

    agg = tree_aggregate(ds, ["event_type"], partial,
                         {"n": "sum", "s": "sum",
                          "min_k": "min", "max_k": "max"}).to_pandas()
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype(np.int64),
        "avg_k": np.round(agg["s"] / agg["n"], 6),
        "min_k": agg["min_k"].astype(np.int64),
        "max_k": agg["max_k"].astype(np.int64),
    })
    return out.sort_values("event_type", ignore_index=True)


SQL_PROPS_K_STATS = """
WITH e AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT event_type, CAST(count(k) AS BIGINT) AS n,
       round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k,
       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
FROM e WHERE k IS NOT NULL
GROUP BY event_type ORDER BY event_type
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
        from ..functions.tokenize import _flat_tokens_arrow

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


# ---------------------------------------------------------------------------
# Label-centroid similarity matrix (domain/class geometry diagnostics —
# which classes are entangled in embedding space): one sufficient-sums pass
# builds all centroids, every pairwise cosine is driver-side L×L math.
# ---------------------------------------------------------------------------


def label_centroid_similarity(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

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


# ---------------------------------------------------------------------------
# Bloom-composed incremental dedup: the SAME contract as
# incremental_dedup_new_docs, but nothing base-corpus-sized is ever
# broadcast — the base membership structure is a fixed-size Bloom filter
# built DISTRIBUTED (per-batch partial bit arrays, OR-reduced on the
# driver), delta docs probe it vectorized, and the rare positives
# (true dups + fpr) are verified EXACTLY by one candidate-broadcast base
# re-scan (the minhash-verify lesson: broadcast the candidate list, never
# join the corpus). Bloom misses are guaranteed misses, so the output is
# bit-identical to the exact-broadcast path and shares its SQL oracle.
# ---------------------------------------------------------------------------


def incremental_dedup_bloom(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ..state.bloom import BloomFilter
    from .dedup import md5_hex

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
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES): an
# exact-size weighted sample via the key ln(u)/w with deterministic
# u = md5(doc_id)/2^64 — coordination-free (each row's key is computable
# anywhere), so the "sample" is just a distributed top-n by computed key:
# per-batch top-n partials, driver final cut. Rank on ROUNDED keys with
# doc_id tie-break on both sides.
# ---------------------------------------------------------------------------

ES_SAMPLE_N = 10


def es_weighted_sample(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "n_chars"])

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        h = np.asarray(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:16], 16)
             for i in ids], dtype=np.uint64)
        u = h.astype(np.float64) / float(2 ** 64)
        w = df["n_chars"].to_numpy(np.float64)
        out = pd.DataFrame({"doc_id": ids,
                            "es_key": np.round(np.log(u) / w, 9)})
        return out.sort_values(["es_key", "doc_id"],
                               ascending=[False, True],
                               kind="mergesort").head(ES_SAMPLE_N)

    cand = ds.map_batches(keys, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["es_key", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(ES_SAMPLE_N)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand[["rank", "doc_id", "es_key"]].reset_index(drop=True)


SQL_ES_WEIGHTED_SAMPLE = f"""
WITH k AS (
  SELECT doc_id,
         round(ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                       AS UBIGINT) / 18446744073709551616.0)
               / n_chars, 9) AS es_key
  FROM documents)
SELECT CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, es_key
FROM k ORDER BY es_key DESC, doc_id LIMIT {ES_SAMPLE_N}
"""


# ---------------------------------------------------------------------------
# Stratified exact-n sampling (n docs per source, deterministic): order
# within each stratum by the md5 hex STRING — string comparison, so the
# rank has zero float risk — and keep the first 3. Per-batch per-source
# top-3 partials bound what leaves each batch.
# ---------------------------------------------------------------------------

STRAT_N = 3


def stratified_sample_per_source(sf_dir: str) -> pd.DataFrame:
    from .dedup import md5_hex

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "source", "text"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"source": df["source"].to_numpy(),
                            "doc_id": df["doc_id"].to_numpy(np.int64),
                            "h": md5_hex(df["text"].to_numpy())})
        out = out.sort_values(["source", "h", "doc_id"], kind="mergesort")
        return out.groupby("source").head(STRAT_N)

    cand = ds.map_batches(pick, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["source", "h", "doc_id"], kind="mergesort")
    top = cand.groupby("source").head(STRAT_N).reset_index(drop=True)
    top["rank"] = (top.groupby("source").cumcount() + 1).astype(np.int64)
    return top[["source", "rank", "doc_id", "h"]]


SQL_STRATIFIED_SAMPLE = f"""
WITH k AS (
  SELECT source, doc_id, md5(text) AS h,
         row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id)
           AS rn
  FROM documents)
SELECT source, CAST(rn AS BIGINT) AS rank, doc_id, h
FROM k WHERE rn <= {STRAT_N} ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# Chi-square independence test (order priority × order-value bucket): the
# contingency table is one facet-sized tree pass; the statistic is driver
# arithmetic over the tiny table. The "is this feature correlated with
# that label" screen of a data-curation loop.
# ---------------------------------------------------------------------------

CHI2_VALUE_EDGES = (170_000.0, 340_000.0)  # ~terciles of o_totalprice


def priority_value_chi2(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_orderpriority", "o_totalprice"])
    e0, e1 = CHI2_VALUE_EDGES

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"].to_numpy(np.float64)
        bucket = np.where(v < e0, "low", np.where(v < e1, "mid", "high"))
        out = pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                            "bucket": bucket})
        g = out.groupby(["o_orderpriority", "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    cells = tree_aggregate(ds, ["o_orderpriority", "bucket"], partial,
                           {"n": "sum"}).to_pandas()
    total = float(cells["n"].sum())
    row = cells.groupby("o_orderpriority")["n"].sum()
    col = cells.groupby("bucket")["n"].sum()
    full = (
        pd.MultiIndex.from_product([sorted(row.index), sorted(col.index)],
                                   names=["o_orderpriority", "bucket"])
        .to_frame(index=False)
        .merge(cells, how="left").fillna({"n": 0})
    )
    e = (full["o_orderpriority"].map(row).to_numpy(np.float64)
         * full["bucket"].map(col).to_numpy(np.float64) / total)
    chi2 = float(((full["n"].to_numpy(np.float64) - e) ** 2 / e).sum())
    dof = (len(row) - 1) * (len(col) - 1)
    return pd.DataFrame({"chi2": [round(chi2, 6)],
                         "dof": [np.int64(dof)],
                         "n": [np.int64(total)]})


def _chi2_sql() -> str:
    e0, e1 = CHI2_VALUE_EDGES
    return f"""
WITH cells AS (
  SELECT o_orderpriority,
         CASE WHEN o_totalprice < {e0} THEN 'low'
              WHEN o_totalprice < {e1} THEN 'mid' ELSE 'high' END AS bucket,
         CAST(count(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1, 2),
rows_ AS (SELECT o_orderpriority, sum(n) AS rn FROM cells GROUP BY 1),
cols_ AS (SELECT bucket, sum(n) AS cn FROM cells GROUP BY 1),
tot AS (SELECT sum(n) AS t FROM cells),
full_ AS (
  SELECT r.o_orderpriority, c.bucket, COALESCE(cells.n, 0) AS n,
         r.rn * c.cn / (SELECT t FROM tot) AS e
  FROM rows_ r CROSS JOIN cols_ c
  LEFT JOIN cells ON cells.o_orderpriority = r.o_orderpriority
                 AND cells.bucket = c.bucket)
SELECT round(sum((n - e) * (n - e) / e), 6) AS chi2,
       CAST((SELECT count(*) - 1 FROM rows_)
            * (SELECT count(*) - 1 FROM cols_) AS BIGINT) AS dof,
       CAST((SELECT t FROM tot) AS BIGINT) AS n
FROM full_
"""


# ---------------------------------------------------------------------------
# Ordered string aggregation (SQL string_agg / the reference's notes-
# concatenation shape M14, as an oracle-checked entry): per source, the
# sorted distinct languages joined ','. Distinct (source, lang) pairs
# pre-aggregate per batch; the join happens on the facet-sized table.
# ---------------------------------------------------------------------------


def source_lang_concat(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["source", "lang"]].drop_duplicates().copy()
        out["one"] = np.int64(1)
        return out

    pairs = tree_aggregate(ds, ["source", "lang"], partial,
                           {"one": "max"}).to_pandas()
    pairs = pairs.sort_values(["source", "lang"], kind="mergesort")
    out = pairs.groupby("source", as_index=False).agg(
        langs=("lang", ",".join), n_langs=("lang", "size"))
    out["n_langs"] = out["n_langs"].astype(np.int64)
    return out.sort_values("source", ignore_index=True)


SQL_SOURCE_LANG_CONCAT = """
SELECT source,
       string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Grouped median absolute deviation (the robust scale estimator used to
# normalize / outlier-screen numeric features): two exact grouped-quantile
# rounds — the per-group median, broadcast back for the deviation pass,
# then the median of deviations. Both rounds are the histogram-bracket
# quantile (no global sort at any scale).
# ---------------------------------------------------------------------------


def value_mad_by_type(sf_dir: str) -> pd.DataFrame:
    from .quantiles import grouped_quantiles

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])
    med = grouped_quantiles(ds, "event_type", "value", [0.5])
    med_map = dict(zip(med["event_type"], med["value"]))
    med_ref = ray.put(med_map)

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(med_ref)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "value": np.abs(df["value"].to_numpy(np.float64)
                            - df["event_type"].map(m).to_numpy(np.float64)),
        })

    devs = ray.data.read_parquet(
        path, columns=["event_type", "value"]
    ).map_batches(dev, batch_format="pandas")
    mad = grouped_quantiles(devs, "event_type", "value", [0.5])
    mad_map = dict(zip(mad["event_type"], mad["value"]))
    out = pd.DataFrame({
        "event_type": sorted(med_map),
        "median": [round(float(med_map[t]), 6) for t in sorted(med_map)],
        "mad": [round(float(mad_map[t]), 6) for t in sorted(med_map)],
    })
    return out


SQL_VALUE_MAD = """
WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY 1)
SELECT e.event_type,
       round(any_value(m.med), 6) AS median,
       round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


# ---------------------------------------------------------------------------
# Pareto frontier selection (multi-objective data curation: the documents
# no other doc beats on BOTH lexical diversity and length): local frontiers
# per batch, then frontier-of-frontiers on the driver — exact, because a
# globally non-dominated point is non-dominated in its own batch too.
# ---------------------------------------------------------------------------


def doc_pareto_frontier(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        _terms, docs, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy())
        t = pd.DataFrame({"doc_id": docs, "tf": tfs})
        g = t.groupby("doc_id", as_index=False).agg(
            n_tokens=("tf", "sum"), distinct=("tf", "size"))
        g["ttr"] = np.round(g["distinct"] / g["n_tokens"], 6)
        g = g.merge(df[["doc_id", "n_chars"]], on="doc_id")
        return _frontier_final(g[["doc_id", "ttr", "n_chars"]])

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    out = _frontier_final(cand)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)


def _frontier_final(df: pd.DataFrame) -> pd.DataFrame:
    """Exact 2-D maximization frontier (maximize ttr AND n_chars), fully
    vectorized: descending-ttr sweep where a point survives iff it carries
    its ttr-group's max n_chars and that max strictly beats every
    higher-ttr group's max."""
    df = df.sort_values(["ttr", "n_chars", "doc_id"],
                        ascending=[False, False, True], kind="mergesort")
    nc = df["n_chars"].to_numpy(np.int64)
    grp_max = df.groupby("ttr", sort=False)["n_chars"] \
        .transform("max").to_numpy(np.int64)
    # max n_chars among STRICTLY higher ttr: running cummax of group maxima,
    # shifted one group back (first row per group carries the group max
    # because n_chars sorts descending within ttr)
    first = ~df["ttr"].duplicated().to_numpy()
    gmax_per_group = nc[first]
    best_prev_group = np.r_[-1, np.maximum.accumulate(gmax_per_group)[:-1]]
    best_prev = best_prev_group[np.cumsum(first) - 1]
    keep = (nc == grp_max) & (grp_max > best_prev)
    return df[keep]


SQL_DOC_PARETO = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents)
  WHERE term <> '' GROUP BY 1, 2),
t AS (
  SELECT d.doc_id,
         round(CAST(count(*) AS DOUBLE) / sum(f.tf), 6) AS ttr,
         CAST(any_value(d.n_chars) AS BIGINT) AS n_chars
  FROM tf f JOIN documents d ON d.doc_id = f.doc_id
  GROUP BY d.doc_id)
SELECT p.doc_id, p.ttr, p.n_chars FROM t p
WHERE NOT EXISTS (
  SELECT 1 FROM t q
  WHERE q.ttr >= p.ttr AND q.n_chars >= p.n_chars
    AND (q.ttr > p.ttr OR q.n_chars > p.n_chars))
ORDER BY p.doc_id
"""


# ---------------------------------------------------------------------------
# Token-budget allocation across sources (the data-mixture "water-filling"
# step: give every source its proportional share of a token budget, capped
# at what the source actually has, redistributing the excess). One
# facet-sized token-count pass; the closed-form breakpoint solve (sort by
# capacity, cumulative sums, one λ) runs on the tiny per-source table and
# is reproduced exactly by the SQL window-function oracle.
# ---------------------------------------------------------------------------

BUDGET_FRACTION = 0.5  # allocate half the corpus's tokens


def token_budget_allocation(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        _t, docs, tfs, _d = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy())
        per_doc = pd.DataFrame({"doc_id": docs, "tokens": tfs}).groupby(
            "doc_id", as_index=False).sum()
        smap = dict(zip(df["doc_id"], df["source"]))
        per_doc["source"] = per_doc["doc_id"].map(smap)
        return per_doc.groupby("source", as_index=False)["tokens"].sum()

    cap = tree_aggregate(ds, ["source"], partial,
                         {"tokens": "sum"}).to_pandas()
    cap = cap.sort_values(["tokens", "source"], kind="mergesort",
                          ignore_index=True)
    c = cap["tokens"].to_numpy(np.float64)
    n = len(c)
    budget = BUDGET_FRACTION * c.sum()
    # water-filling with equal weights: sources with capacity below the
    # level λ keep everything; the rest get λ = (B - smaller caps) / count
    csum = np.cumsum(c)
    alloc = None
    for i in range(n):
        lam = (budget - (csum[i - 1] if i else 0.0)) / (n - i)
        if c[i] >= lam:
            alloc = np.minimum(c, lam)
            break
    if alloc is None:  # budget >= total capacity
        alloc = c.copy()
    out = pd.DataFrame({
        "source": cap["source"],
        "capacity": cap["tokens"].astype(np.int64),
        "allocated": np.round(alloc, 6),
    })
    return out.sort_values("source", ignore_index=True)


SQL_TOKEN_BUDGET = f"""
WITH cap AS (
  SELECT source, CAST(count(*) AS BIGINT) AS tokens
  FROM (SELECT doc_id, source, unnest({TOK_SQL}) AS term FROM documents)
  WHERE term <> '' GROUP BY source),
ordered AS (
  SELECT source, tokens,
         row_number() OVER (ORDER BY tokens, source) AS rn,
         sum(tokens) OVER (ORDER BY tokens, source
                           ROWS UNBOUNDED PRECEDING) AS csum,
         count(*) OVER () AS n,
         {BUDGET_FRACTION} * sum(tokens) OVER () AS budget
  FROM cap),
lam AS (
  SELECT (budget - (csum - tokens)) / (n - rn + 1) AS level
  FROM ordered
  WHERE tokens >= (budget - (csum - tokens)) / (n - rn + 1)
  ORDER BY rn LIMIT 1)
SELECT source, tokens AS capacity,
       round(least(CAST(tokens AS DOUBLE),
                   COALESCE((SELECT level FROM lam),
                            CAST(tokens AS DOUBLE))), 6) AS allocated
FROM ordered ORDER BY source
"""


# ---------------------------------------------------------------------------
# TPC-H Q15: top supplier(s) by quarterly revenue — the argmax-over-an-
# aggregate shape where EVERY tie at the max is kept. Per-supplier revenue
# is one fact pass with read-pushdown on the quarter; the max + tie filter
# runs on the supplier-sized table.
# ---------------------------------------------------------------------------

Q15_QUARTER = ("1996-01-01", "1996-04-01")


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    lo, hi = (pd.Timestamp(t).to_pydatetime() for t in Q15_QUARTER)
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1 - df["l_discount"]))
        return df.groupby("l_suppkey", as_index=False).agg(
            total_revenue=("rev", "sum"))

    agg = tree_aggregate(li, ["l_suppkey"], partial,
                         {"total_revenue": "sum"}).to_pandas()
    agg["total_revenue"] = agg["total_revenue"].round(4)
    best = agg["total_revenue"].max()
    top = agg[agg["total_revenue"] == best]
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", top["l_suppkey"].astype("int64").tolist())],
    ).to_pandas()
    out = top.rename(columns={"l_suppkey": "s_suppkey"}).merge(
        sup, on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return out[["s_suppkey", "s_name", "total_revenue"]].sort_values(
        "s_suppkey", ignore_index=True)


SQL_Q15_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_QUARTER[0]}'
    AND l_shipdate <  TIMESTAMP '{Q15_QUARTER[1]}'
  GROUP BY 1)
SELECT r.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s USING (s_suppkey)
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY r.s_suppkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity revenue for one brand — the correlated scalar
# subquery (per-part average quantity) DECORRELATED into a broadcast map:
# pass 1 aggregates (sum, count) per part for the brand's parts only, pass
# 2 re-scans the brand's fact rows comparing each against 0.5 × its part's
# average. Both passes prune to the brand's partkeys at the read via an
# isin pushdown of the (dimension-sized) key list.
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#1"


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    part = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    keys = part.loc[part["p_brand"] == Q17_BRAND, "p_partkey"] \
        .astype("int64").tolist()
    empty = pd.DataFrame({"avg_yearly": pd.Series([0.0])})
    if not keys:
        return empty
    flt = pads.field("l_partkey").isin(keys)
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", as_index=False).agg(
            s=("l_quantity", "sum"), n=("l_quantity", "size"))

    agg = tree_aggregate(
        ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                              columns=li_cols, filter=flt),
        ["l_partkey"], stats, {"s": "sum", "n": "sum"}).to_pandas()
    thr = dict(zip(agg["l_partkey"].astype(np.int64),
                   0.2 * agg["s"].to_numpy(np.float64)
                   / agg["n"].to_numpy(np.float64)))
    thr_ref = ray.put(thr)

    def small(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        cut = df["l_partkey"].map(t).to_numpy(np.float64)
        keep = df["l_quantity"].to_numpy(np.float64) < cut
        return pd.DataFrame({"k": [0],
                             "rev": [float(df["l_extendedprice"]
                                           .to_numpy()[keep].sum())]})

    tot = tree_aggregate(
        ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                              columns=li_cols, filter=flt),
        ["k"], small, {"rev": "sum"}).to_pandas()
    return pd.DataFrame({
        "avg_yearly": [round(float(tot["rev"].iloc[0]) / 7.0, 4)]})


SQL_Q17_SMALL_QUANTITY = f"""
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------------------
# TPC-H Q6: the canonical filtered-scan revenue forecast — pure read
# pushdown (year + discount band + quantity cap never leave parquet) and a
# one-float tree reduce.
# ---------------------------------------------------------------------------


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    from ..state.aggregates import tree_aggregate

    lo = pd.Timestamp("1996-01-01").to_pydatetime()
    hi = pd.Timestamp("1997-01-01").to_pydatetime()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)
                & (pads.field("l_discount") >= 0.05)
                & (pads.field("l_discount") <= 0.07)
                & (pads.field("l_quantity") < 24.0)),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": [0],
            "revenue": [float((df["l_extendedprice"]
                               * df["l_discount"]).sum())],
            "n_items": [len(df)]})

    agg = tree_aggregate(ds, ["k"], partial,
                         {"revenue": "sum", "n_items": "sum"}).to_pandas()
    return pd.DataFrame({
        "revenue": [round(float(agg["revenue"].iloc[0]), 4)],
        "n_items": [np.int64(agg["n_items"].iloc[0])]})


SQL_Q6_FORECAST = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Per-group feature standardization (z-scores of doc length within each
# language — the classic ML-prep normalize step): one tree pass of exact
# integer sufficient statistics (n, Σx, Σx²) per group, moments broadcast
# back, stateless scoring pass. Population σ, matching stddev_pop.
# ---------------------------------------------------------------------------


def zscore_nchars_by_lang(sf_dir: str):
    from ..state.aggregates import tree_aggregate

    path = os.path.join(sf_dir, "documents.parquet")
    ds = ray.data.read_parquet(path, columns=["lang", "n_chars"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        out = pd.DataFrame({"lang": df["lang"].to_numpy(),
                            "n": np.int64(1), "s": x, "ss": x * x})
        return out.groupby("lang", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"))

    m = tree_aggregate(ds, ["lang"], moments,
                       {"n": "sum", "s": "sum", "ss": "sum"}).to_pandas()
    mu = m["s"].to_numpy(np.float64) / m["n"].to_numpy(np.float64)
    var = m["ss"].to_numpy(np.float64) / m["n"].to_numpy(np.float64) - mu * mu
    stats_ref = ray.put((dict(zip(m["lang"], mu)),
                         dict(zip(m["lang"], np.sqrt(np.maximum(var, 0.0))))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        mus, sds = ray.get(stats_ref)
        x = df["n_chars"].to_numpy(np.float64)
        mu_ = df["lang"].map(mus).to_numpy(np.float64)
        sd_ = df["lang"].map(sds).to_numpy(np.float64)
        z = np.where(sd_ > 0, (x - mu_) / np.where(sd_ > 0, sd_, 1.0), 0.0)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "lang": df["lang"].to_numpy(),
                             "z_chars": np.round(z, 6)})

    return ray.data.read_parquet(
        path, columns=["doc_id", "lang", "n_chars"]
    ).map_batches(score, batch_format="pandas")


SQL_ZSCORE_NCHARS = """
WITH m AS (
  SELECT lang,
         CAST(sum(n_chars) AS DOUBLE) / count(*) AS mu,
         sqrt(greatest(CAST(sum(n_chars * n_chars) AS DOUBLE) / count(*)
                       - (CAST(sum(n_chars) AS DOUBLE) / count(*))
                         * (CAST(sum(n_chars) AS DOUBLE) / count(*)),
                       0.0)) AS sd
  FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang,
       round(CASE WHEN m.sd > 0 THEN (d.n_chars - m.mu) / m.sd
                  ELSE 0.0 END, 6) AS z_chars
FROM documents d JOIN m USING (lang)
"""


# ---------------------------------------------------------------------------
# Actor-pool WAV decode → audio features (closes the image/audio/video
# trio as oracle entries). WAV is lossless, so the oracle recomputes the
# features from the RAW sample stream — never through the RIFF/PCM16
# codec under test — and the hash compare verifies the encode→decode
# round trip end-to-end.
# ---------------------------------------------------------------------------

AUDIO_N = 48


def audio_features(sf_dir: str) -> pd.DataFrame:
    from .multimodal import AudioFeatureStage, synthesize_audio_table

    tbl = synthesize_audio_table(AUDIO_N)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(AudioFeatureStage, batch_format="pyarrow",
                     batch_size=16, concurrency=2, num_cpus=1)
        .to_pandas()
    )
    feats = np.stack(out["feature"].to_numpy())
    cols: dict = {"item_id": out["item_id"].to_numpy(np.int64)}
    for j in range(feats.shape[1]):
        cols[f"f{j:02d}"] = np.round(feats[:, j], 6)
    return pd.DataFrame(cols).sort_values("item_id", ignore_index=True)


def _audio_sql(n: int = AUDIO_N, seed: int = 6) -> str:
    from .multimodal import (
        AudioFeatureStage,
        _audio_summary,
        audio_sample_stream,
    )

    proj = np.random.default_rng(4321).standard_normal(
        (32, AudioFeatureStage.FEATURE_DIM))
    rows = []
    for i, (rate, samples) in enumerate(audio_sample_stream(n, seed)):
        feat = np.round(_audio_summary(rate, samples) @ proj, 6)
        rows.append(f"({i}, " + ", ".join(repr(float(x)) for x in feat) + ")")
    cols = "item_id, " + ", ".join(
        f"f{j:02d}" for j in range(AudioFeatureStage.FEATURE_DIM))
    return f"SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols})"


# ---------------------------------------------------------------------------
# Revenue concentration: Gini coefficient + top-1% share over per-customer
# revenue. The per-customer reduce is the usual keyed tree pass in exact
# int64 cents; the Gini rank sum runs on the customer-sized table (sorted
# once) — ties in revenue are order-invariant for Σ i·x, and the top-1%
# cut breaks ties (rev desc, custkey asc) identically on both sides.
# ---------------------------------------------------------------------------


def customer_revenue_gini(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        out = pd.DataFrame({"o_custkey": df["o_custkey"].to_numpy(np.int64),
                            "cents": cents})
        return out.groupby("o_custkey", as_index=False)["cents"].sum()

    rev = tree_aggregate(ds, ["o_custkey"], partial,
                         {"cents": "sum"}).to_pandas()
    rev = rev.sort_values(["cents", "o_custkey"], kind="mergesort",
                          ignore_index=True)
    x = rev["cents"].to_numpy(np.float64)
    n = len(x)
    tot = x.sum()
    gini = (2.0 * np.sum(np.arange(1, n + 1) * x)) / (n * tot) - (n + 1) / n
    k = int(np.ceil(n / 100.0))
    top = rev.sort_values(["cents", "o_custkey"], ascending=[False, True],
                          kind="mergesort").head(k)
    return pd.DataFrame({
        "n_customers": [np.int64(n)],
        "total_cents": [np.int64(tot)],
        "gini": [round(float(gini), 6)],
        "top1pct_share": [round(float(top["cents"].sum()) / tot, 6)],
    })


SQL_CUSTOMER_REVENUE_GINI = """
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
params AS (
  SELECT count(*) AS n, sum(cents) AS tot,
         ceil(count(*) / 100.0) AS k
  FROM rev),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS i,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS ri
  FROM rev)
SELECT CAST(p.n AS BIGINT) AS n_customers,
       CAST(p.tot AS BIGINT) AS total_cents,
       round(2.0 * sum(CAST(i AS DOUBLE) * cents) / (p.n * p.tot)
             - (p.n + 1.0) / p.n, 6) AS gini,
       round(sum(CASE WHEN ri <= p.k THEN CAST(cents AS DOUBLE) ELSE 0 END)
             / p.tot, 6) AS top1pct_share
FROM ranked, params p GROUP BY p.n, p.tot, p.k
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit (the classic fabricated-data screen): observed
# first-significant-digit shares of order totals vs Benford expectation.
# Digit extraction goes through the integer STRING on both sides — zero
# float-boundary risk — and the reduce domain is 9 rows.
# ---------------------------------------------------------------------------


def benford_totalprice(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                               columns=["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(df["o_totalprice"].to_numpy(np.float64)).astype(np.int64)
        d = pd.Series(v).astype(str).str[0].astype(np.int64)
        out = pd.DataFrame({"digit": d})
        g = out.groupby("digit", as_index=False).size()
        return g.rename(columns={"size": "n"})

    agg = tree_aggregate(ds, ["digit"], partial, {"n": "sum"}).to_pandas()
    agg = agg[agg["digit"] > 0]
    tot = float(agg["n"].sum())
    out = pd.DataFrame({
        "digit": agg["digit"].astype(np.int64),
        "n": agg["n"].astype(np.int64),
        "share": np.round(agg["n"].to_numpy(np.float64) / tot, 6),
        "benford_p": np.round(
            np.log10(1.0 + 1.0 / agg["digit"].to_numpy(np.float64)), 6),
    })
    return out.sort_values("digit", ignore_index=True)


SQL_BENFORD = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d
      WHERE digit > 0 GROUP BY digit)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / (SELECT sum(n) FROM c), 6) AS share,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_p
FROM c ORDER BY digit
"""


# ---------------------------------------------------------------------------
# A/B conversion z-test (two-proportion pooled z over a deterministic
# user-id split): per-user conversion flags reduce through one keyed tree
# pass (max over events), the 2×2 table and the z statistic are driver
# arithmetic. The "did the experiment move the metric" primitive.
# ---------------------------------------------------------------------------


def ab_conversion_ztest(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "conv": (df["event_type"].to_numpy() == "purchase")
            .astype(np.int64)})
        return out.groupby("user_id", as_index=False)["conv"].max()

    users = tree_aggregate(ds, ["user_id"], partial,
                           {"conv": "max"}).to_pandas()
    grp = users["user_id"].to_numpy(np.int64) % 2
    conv = users["conv"].to_numpy(np.int64)
    na, nb = int((grp == 0).sum()), int((grp == 1).sum())
    ca, cb = int(conv[grp == 0].sum()), int(conv[grp == 1].sum())
    pa_, pb_ = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    z = (pa_ - pb_) / np.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    return pd.DataFrame({
        "n_a": [np.int64(na)], "n_b": [np.int64(nb)],
        "rate_a": [round(pa_, 6)], "rate_b": [round(pb_, 6)],
        "z": [round(float(z), 6)],
    })


SQL_AB_ZTEST = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1),
g AS (
  SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS ca,
         sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS cb
  FROM u)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(CAST(ca AS DOUBLE) / na, 6) AS rate_a,
       round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b,
       round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
             / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 6) AS z
FROM g
"""


# ---------------------------------------------------------------------------
# Per-event session-id assignment (the materialized sessionization a
# training pipeline joins everything else against): 30-min-gap sessions,
# session_id = per-user running count of gap breaks. One user-bucketed
# shuffle, one vectorized sort + diff + segmented cumsum per bucket — the
# user_sessions machinery exporting row-level ids instead of counts.
# ---------------------------------------------------------------------------


def event_session_ids(sf_dir: str):
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)
        ).astype(np.int64)
        return df

    gap_s = SESSION_GAP_MIN * 60

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                          ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("datetime64[s]").astype("int64").to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap_s] & ~new_user
        # session_id restarts at 1 per user: cumsum of breaks, minus the
        # running value at each user's first row
        brk = (new_user | gap_break).astype(np.int64)
        run = np.cumsum(brk)
        base = run[new_user][np.cumsum(new_user) - 1]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "session_id": (run - base + 1).astype(np.int64)})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(assign, batch_format="pandas")
    )


SQL_EVENT_SESSION_IDS = f"""
SELECT event_id, user_id,
       CAST(1 + sum(CASE WHEN gap_s > {SESSION_GAP_MIN * 60} THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (SELECT event_id, user_id, ts,
             date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id), ts) AS gap_s
      FROM events)
"""


# ---------------------------------------------------------------------------
# Session conversion rate (the product-analytics headline number): fraction
# of 30-min-gap sessions containing a purchase. Reuses event_session_ids'
# exact session semantics (second-truncated gaps, (ts, event_id) order);
# per-bucket (n_sessions, n_converting) partials are all that leave the
# user-bucketed groups.
# ---------------------------------------------------------------------------

CONVERSION_EVENT = "purchase"


def session_conversion_rate(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (
            pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return df

    gap_s = SESSION_GAP_MIN * 60

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                          ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("datetime64[s]").astype("int64").to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap_s] & ~new_user
        run = np.cumsum((new_user | gap_break).astype(np.int64))
        conv = (g["event_type"].to_numpy() == CONVERSION_EVENT)
        n_sessions = int(run[-1]) if len(run) else 0
        n_conv = int(pd.Series(conv).groupby(run).max().sum()) \
            if len(run) else 0
        return pd.DataFrame({"k": ["all"],
                             "n_sessions": np.int64(n_sessions),
                             "n_converting": np.int64(n_conv)})

    parts = (ds.map_batches(bucketize, batch_format="pandas")
             .groupby("__b__")
             .map_groups(per_bucket, batch_format="pandas"))

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["k", "n_sessions", "n_converting"]]

    a = tree_aggregate(parts, ["k"], ident,
                       {"n_sessions": "sum", "n_converting": "sum"}
                       ).to_pandas()
    ns = int(a["n_sessions"].iloc[0])
    nc = int(a["n_converting"].iloc[0])
    return pd.DataFrame({
        "n_sessions": pd.Series([ns], dtype=np.int64),
        "n_converting": pd.Series([nc], dtype=np.int64),
        "conversion_rate": [round(nc / ns, 6)] if ns else [0.0],
    })


def _session_conversion_sql() -> str:
    return f"""
WITH lagged AS (
  SELECT event_id, user_id, ts, event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id), ts) AS gap_s
  FROM events),
s AS (
  SELECT user_id, event_type,
         1 + sum(CASE WHEN gap_s > {SESSION_GAP_MIN * 60} THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM lagged),
per AS (
  SELECT user_id, session_id,
         max(CASE WHEN event_type = '{CONVERSION_EVENT}'
                  THEN 1 ELSE 0 END) AS conv
  FROM s GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(conv) AS BIGINT) AS n_converting,
       round(sum(conv) / CAST(count(*) AS DOUBLE), 6) AS conversion_rate
FROM per
"""


# ---------------------------------------------------------------------------
# Skip-gram PMI (the word2vec-style co-occurrence matrix construction, vs
# pmi_top_bigrams' adjacent-only pairs): unordered token pairs within a
# ±4-token window, counted vectorized per batch over the flat Arrow token
# arrays (one shifted comparison per offset, never a Python token loop),
# tree-merged over the vocab²-bounded pair domain.
# PMI(a,b) = ln(4·N·n_ab / (c_a·c_b)) with N total pairs and c_t the count
# of t over both pair slots.
# ---------------------------------------------------------------------------

SKIPGRAM_WINDOW = 4
SKIPGRAM_MIN_N = 5
SKIPGRAM_TOPN = 20


def skipgram_pmi_top20(sf_dir: str) -> pd.DataFrame:
    from ..functions.tokenize import _flat_tokens_arrow
    from ..state.aggregates import tree_aggregate

    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doc_ord, codes, vocab = _flat_tokens_arrow(df["text"].to_numpy())
        v = np.asarray(vocab.to_pylist(), dtype=object)
        nv = np.int64(len(v))
        # canonicalize pairs LEXICOGRAPHICALLY (the oracle's least/greatest
        # on strings), not by dictionary code order — codes are per-batch
        # arbitrary and would split a pair's counts across two keys
        order = np.argsort(v, kind="stable")
        lex = np.empty(int(nv), dtype=np.int64)
        lex[order] = np.arange(int(nv))
        sv = v[order]
        frames = []
        for d in range(1, SKIPGRAM_WINDOW + 1):
            if len(codes) <= d:
                break
            same = doc_ord[d:] == doc_ord[:-d]
            a, b = lex[codes[:-d][same]], lex[codes[d:][same]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            key, n = np.unique(lo * nv + hi, return_counts=True)
            frames.append(pd.DataFrame({
                "a": sv[(key // nv)], "b": sv[(key % nv)],
                "n": n.astype(np.int64)}))
        if not frames:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["a", "b"], as_index=False)["n"].sum()

    pairs = tree_aggregate(ds, ["a", "b"], partial, {"n": "sum"}).to_pandas()
    N = float(pairs["n"].sum())
    sides = pd.concat([
        pairs[["a", "n"]].rename(columns={"a": "t"}),
        pairs[["b", "n"]].rename(columns={"b": "t"}),
    ]).groupby("t")["n"].sum()
    keep = pairs[pairs["n"] >= SKIPGRAM_MIN_N].copy()
    ca = keep["a"].map(sides).to_numpy(np.float64)
    cb = keep["b"].map(sides).to_numpy(np.float64)
    keep["pmi"] = np.round(
        np.log(4.0 * N * keep["n"].to_numpy(np.float64) / (ca * cb)), 6)
    keep = keep.sort_values(["pmi", "a", "b"],
                            ascending=[False, True, True], kind="mergesort")
    out = keep.head(SKIPGRAM_TOPN).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out[["a", "b", "n", "pmi"]]


SQL_SKIPGRAM_PMI = f"""
WITH tok AS (
  SELECT doc_id, j, toks[j] AS term
  FROM (SELECT doc_id, list_filter({TOK_SQL}, x -> x <> '') AS toks
        FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS j) s),
p AS (
  SELECT least(t1.term, t2.term) AS a, greatest(t1.term, t2.term) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM tok t1 JOIN tok t2
    ON t1.doc_id = t2.doc_id
   AND t2.j BETWEEN t1.j + 1 AND t1.j + {SKIPGRAM_WINDOW}
  GROUP BY 1, 2),
tot AS (SELECT sum(n) AS nn FROM p),
sides AS (
  SELECT t, sum(n) AS c FROM (
    SELECT a AS t, n FROM p UNION ALL SELECT b AS t, n FROM p)
  GROUP BY t)
SELECT p.a, p.b, p.n,
       round(ln(4.0 * (SELECT nn FROM tot) * p.n / (sa.c * sb.c)), 6) AS pmi
FROM p JOIN sides sa ON sa.t = p.a JOIN sides sb ON sb.t = p.b
WHERE p.n >= {SKIPGRAM_MIN_N}
ORDER BY pmi DESC, p.a, p.b
LIMIT {SKIPGRAM_TOPN}
"""


# ---------------------------------------------------------------------------
# Windowed percent_rank within a group (feature engineering: a supplier's
# balance standing within its nation): the group domain is dimension-sized,
# so ranks compute per nation-bucket vectorized; SQL percent_rank ties
# (shared min rank) are matched with pandas rank(method='min').
# ---------------------------------------------------------------------------


def supplier_balance_pctrank(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    sup = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b__"] = (df["s_nationkey"].to_numpy(np.int64)
                       % SESSION_BUCKETS).astype(np.int64)
        return df

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _nk, grp in g.groupby("s_nationkey"):
            r = grp["s_acctbal"].rank(method="min").to_numpy(np.float64)
            n = len(grp)
            pct = (r - 1) / (n - 1) if n > 1 else np.zeros(n)
            out.append(pd.DataFrame({
                "s_suppkey": grp["s_suppkey"].to_numpy(np.int64),
                "s_nationkey": grp["s_nationkey"].to_numpy(np.int64),
                "pct_rank": np.round(pct, 6)}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame({
            "s_suppkey": pd.Series(dtype=np.int64),
            "s_nationkey": pd.Series(dtype=np.int64),
            "pct_rank": pd.Series(dtype=np.float64)})

    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"),
                            columns=["n_nationkey", "n_name"]).to_pandas()
    out = (
        sup.map_batches(bucketize, batch_format="pandas")
        .groupby("__b__")
        .map_groups(rank, batch_format="pandas")
        .to_pandas()
    )
    out = out.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    return out[["s_suppkey", "n_name", "pct_rank"]].sort_values(
        "s_suppkey", ignore_index=True)


SQL_SUPPLIER_PCTRANK = """
SELECT s_suppkey, n_name,
       round(percent_rank() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal), 6) AS pct_rank
FROM supplier JOIN nation ON n_nationkey = s_nationkey
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Term burstiness (Church–Gale dispersion): variance-to-mean ratio of a
# term's per-doc tf over ALL docs (zeros included — they ride free through
# the sufficient statistics: only Σtf and Σtf² over PRESENT docs move, N
# comes from metadata). VMR ≈ 1 means Poisson scatter; ≫ 1 means the term
# "bursts" in few docs — a topicality signal.
# ---------------------------------------------------------------------------

BURST_TOPN = 20


def term_burstiness_top20(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq_.read_metadata(path).num_rows
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, _docs_, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy())
        t = pd.DataFrame({"term": terms, "s": tfs,
                          "ss": tfs.astype(np.int64) ** 2,
                          "df_": np.int64(1)})
        return t.groupby("term", as_index=False).agg(
            s=("s", "sum"), ss=("ss", "sum"), df_=("df_", "sum"))

    agg = tree_aggregate(ds, ["term"], partial,
                         {"s": "sum", "ss": "sum", "df_": "sum"}).to_pandas()
    mean = agg["s"].to_numpy(np.float64) / n_docs
    var = agg["ss"].to_numpy(np.float64) / n_docs - mean * mean
    agg["vmr"] = np.round(var / mean, 6)
    agg = agg.sort_values(["df_", "term"], ascending=[False, True],
                          kind="mergesort").head(BURST_TOPN)
    out = pd.DataFrame({
        "term": agg["term"],
        "df": agg["df_"].astype(np.int64),
        "total_tf": agg["s"].astype(np.int64),
        "vmr": agg["vmr"],
    })
    return out.sort_values(["df", "term"], ascending=[False, True],
                           kind="mergesort", ignore_index=True)


SQL_TERM_BURSTINESS = f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents)
  WHERE term <> '' GROUP BY 1, 2),
n AS (SELECT count(*) AS nd FROM documents),
stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS total_tf,
         sum(tf) AS s, sum(tf * tf) AS ss
  FROM tf GROUP BY term)
SELECT term, df, total_tf,
       round((CAST(ss AS DOUBLE) / (SELECT nd FROM n)
              - (CAST(s AS DOUBLE) / (SELECT nd FROM n))
                * (CAST(s AS DOUBLE) / (SELECT nd FROM n)))
             / (CAST(s AS DOUBLE) / (SELECT nd FROM n)), 6) AS vmr
FROM stats
ORDER BY df DESC, term LIMIT {BURST_TOPN}
"""


# ---------------------------------------------------------------------------
# Simplified silhouette per label (clustering-quality diagnostic): for each
# vector, a = distance to its own label centroid, b = distance to the
# nearest OTHER centroid, s = (b − a)/max(a, b); report the per-label mean.
# Centroids come from the sufficient-sums pass; the scoring pass emits one
# (label, Σs, n) row per batch. The centroid-based form is O(n·L), not the
# O(n²) exact silhouette — the standard large-corpus substitute.
# ---------------------------------------------------------------------------


def label_silhouette(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

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
# TPC-H Q7-style volume shipping: revenue flowing between two nations (either
# direction, supplier nation x customer nation) by ship year. The fact-side
# join is the bucketed big x big hash_join; nation lookups ride a broadcast
# (suppkey -> nationkey, custkey -> nationkey) exactly like Q5 — at true
# scale the customer map becomes a third hash_join, the shape is unchanged.
# ---------------------------------------------------------------------------

Q7_NATIONS = ("NATION_1", "NATION_2")
Q7_SHIP_WINDOW = ("1996-01-01", "1998-01-01")


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"]).to_pandas()
    dims_ref = ray.put((
        dict(zip(sup["s_suppkey"], sup["s_nationkey"])),
        dict(zip(cust["c_custkey"], cust["c_nationkey"])),
        nname,
    ))
    pair = {nation.loc[nation["n_name"] == n, "n_nationkey"].iloc[0]
            for n in Q7_NATIONS}

    lo, hi = (pd.Timestamp(d).to_pydatetime() for d in Q7_SHIP_WINDOW)
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)),
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(li, orders, on="o_orderkey", n_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        smap, cmap, names = ray.get(dims_ref)
        sn = df["l_suppkey"].map(smap).to_numpy(np.int64)
        cn = df["o_custkey"].map(cmap).to_numpy(np.int64)
        a, b = sorted(pair)
        keep = ((sn == a) & (cn == b)) | ((sn == b) & (cn == a))
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        out = pd.DataFrame({
            "supp_nation": [names[int(v)] for v in sn[keep]],
            "cust_nation": [names[int(v)] for v in cn[keep]],
            "l_year": df["l_shipdate"].dt.year.to_numpy(np.int64)[keep],
            "revenue": rev[keep],
        })
        return out.groupby(["supp_nation", "cust_nation", "l_year"],
                           as_index=False).agg(revenue=("revenue", "sum"))

    agg = tree_aggregate(joined, ["supp_nation", "cust_nation", "l_year"],
                         partial, {"revenue": "sum"}).to_pandas()
    if agg.empty:  # tiny samples can have no suppliers in the nation pair
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype=object),
            "cust_nation": pd.Series([], dtype=object),
            "l_year": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64)})
    agg["revenue"] = agg["revenue"].round(4)
    agg["l_year"] = agg["l_year"].astype(np.int64)
    return agg.sort_values(["supp_nation", "cust_nation", "l_year"],
                           kind="mergesort", ignore_index=True)


SQL_Q7_VOLUME_SHIPPING = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = '{Q7_NATIONS[0]}' AND cn.n_name = '{Q7_NATIONS[1]}')
    OR (sn.n_name = '{Q7_NATIONS[1]}' AND cn.n_name = '{Q7_NATIONS[0]}'))
  AND l_shipdate >= TIMESTAMP '{Q7_SHIP_WINDOW[0]}'
  AND l_shipdate <  TIMESTAMP '{Q7_SHIP_WINDOW[1]}'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q8-style market share: of all PROMO-part volume sold to customers in
# one region over two order years, the share supplied by one nation, by year.
# TWO chained bucketed hash_joins (lineitem x part on partkey, then x orders
# on orderkey — the chained-join int-key canonicalization in joins.py keeps
# the second key exact); supplier/customer nation maps ride a broadcast.
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_TYPE = "PROMO"
Q8_ORDER_WINDOW = ("1996-01-01", "1998-01-01")


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq_.read_table(
        os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = set(region.loc[region["r_name"] == Q8_REGION,
                          "r_regionkey"].tolist())
    in_region = set(
        nation.loc[nation["n_regionkey"].isin(rkey), "n_nationkey"].tolist())
    share_nkey = int(
        nation.loc[nation["n_name"] == Q8_NATION, "n_nationkey"].iloc[0])
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"]).to_pandas()
    dims_ref = ray.put((
        dict(zip(sup["s_suppkey"], sup["s_nationkey"])),
        dict(zip(cust["c_custkey"], cust["c_nationkey"])),
        in_region, share_nkey,
    ))

    lo, hi = (pd.Timestamp(d).to_pydatetime() for d in Q8_ORDER_WINDOW)
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey"],
        filter=(pads.field("p_type") == Q8_TYPE),
    ).map_batches(
        lambda df: df.rename(columns={"p_partkey": "l_partkey"}),
        batch_format="pandas",
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
    li_part = hash_join(li, part, on="l_partkey", n_buckets=16).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pads.field("o_orderdate") >= lo)
                & (pads.field("o_orderdate") < hi)),
    )
    joined = hash_join(li_part, orders, on="o_orderkey", n_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        smap, cmap, reg, share = ray.get(dims_ref)
        cn = df["o_custkey"].map(cmap).to_numpy(np.int64)
        keep = np.isin(cn, list(reg))
        sn = df["l_suppkey"].map(smap).to_numpy(np.int64)[keep]
        vol = (df["l_extendedprice"]
               * (1 - df["l_discount"])).to_numpy()[keep]
        out = pd.DataFrame({
            "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64)[keep],
            "num": np.where(sn == share, vol, 0.0),
            "den": vol,
        })
        return out.groupby("o_year", as_index=False).agg(
            num=("num", "sum"), den=("den", "sum"))

    agg = tree_aggregate(joined, ["o_year"], partial,
                         {"num": "sum", "den": "sum"}).to_pandas()
    out = pd.DataFrame({
        "o_year": agg["o_year"].astype(np.int64),
        "mkt_share": np.round(agg["num"].to_numpy(np.float64)
                              / agg["den"].to_numpy(np.float64), 6),
    })
    return out.sort_values("o_year", ignore_index=True)


SQL_Q8_MARKET_SHARE = f"""
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{Q8_ORDER_WINDOW[0]}'
    AND o_orderdate <  TIMESTAMP '{Q8_ORDER_WINDOW[1]}')
SELECT CAST(o_year AS BIGINT) AS o_year,
       round(sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume
                      ELSE 0 END) / sum(volume), 6) AS mkt_share
FROM vol GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q9-style product-type profit by (supplier nation, order year). The
# test tables carry no partsupp, so supply cost is proxied as
# 0.5 * p_retailprice * l_quantity — the join/aggregate SHAPE (two chained
# fact joins + nation map + two-level group) is Q9's; only the cost column
# differs, and the oracle applies the identical formula.
# ---------------------------------------------------------------------------

Q9_NAME_SUBSTR = "red"
Q9_COST_FACTOR = 0.5


def q9_profit_by_nation_year(sf_dir: str) -> pd.DataFrame:
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    dims_ref = ray.put((dict(zip(sup["s_suppkey"], sup["s_nationkey"])),
                        nname))

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"],
    ).map_batches(
        lambda t: t.filter(pc_.match_substring(t["p_name"], Q9_NAME_SUBSTR))
        .drop_columns(["p_name"])
        .rename_columns(["l_partkey", "p_retailprice"]),
        batch_format="pyarrow",
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"])
    li_part = hash_join(li, part, on="l_partkey", n_buckets=16).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])
    joined = hash_join(li_part, orders, on="o_orderkey", n_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        smap, names = ray.get(dims_ref)
        sn = df["l_suppkey"].map(smap).to_numpy(np.int64)
        profit = (df["l_extendedprice"] * (1 - df["l_discount"])
                  - Q9_COST_FACTOR * df["p_retailprice"] * df["l_quantity"]
                  ).to_numpy()
        out = pd.DataFrame({
            "n_name": [names[int(v)] for v in sn],
            "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            "profit": profit,
        })
        return out.groupby(["n_name", "o_year"], as_index=False).agg(
            profit=("profit", "sum"))

    agg = tree_aggregate(joined, ["n_name", "o_year"], partial,
                         {"profit": "sum"}).to_pandas()
    agg["profit"] = agg["profit"].round(4)
    agg["o_year"] = agg["o_year"].astype(np.int64)
    return agg.sort_values(["n_name", "o_year"],
                           ascending=[True, False],
                           kind="mergesort", ignore_index=True)


SQL_Q9_PROFIT = f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - {Q9_COST_FACTOR} * p_retailprice * l_quantity), 4)
           AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NAME_SUBSTR}%'
GROUP BY 1, 2 ORDER BY n_name, o_year DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q2-style minimum-cost supplier: for every part of one size, the
# supplier(s) achieving the minimum observed unit price (extendedprice /
# quantity — the lineitem-derived stand-in for the missing partsupp
# supplycost). Correlated-min via orderkey-free partkey bucketing: all rows
# of a part land in one hash bucket, the per-group argmin is exact, and the
# equality join back to the winners never leaves the group. Unit prices are
# raw IEEE doubles on both sides — same dividend/divisor, same quotient —
# so min/equality match bit-for-bit; only the published column is rounded.
# ---------------------------------------------------------------------------

Q2_SIZE = 15


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from .joins import hash_join

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet")).to_pandas()
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    sup_ref = ray.put({
        int(r.s_suppkey): (r.s_name, float(r.s_acctbal),
                           nname[int(r.s_nationkey)])
        for r in sup.itertuples()})

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey"],
        filter=(pads.field("p_size") == Q2_SIZE),
    ).map_batches(
        lambda df: df.rename(columns={"p_partkey": "l_partkey"}),
        batch_format="pandas",
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    joined = hash_join(li, part, on="l_partkey", n_buckets=16)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "p_partkey": df["l_partkey"].to_numpy(np.int64),
            "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "unit": (df["l_extendedprice"]
                     / df["l_quantity"]).to_numpy(np.float64),
        })
        out["__b__"] = (
            pd.util.hash_array(out["p_partkey"].to_numpy(np.int64),
                               categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return out

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        mn = g.groupby("p_partkey")["unit"].transform("min")
        w = g[g["unit"] == mn]
        return (w[["p_partkey", "s_suppkey", "unit"]]
                .drop_duplicates(["p_partkey", "s_suppkey"]))

    winners = (
        joined.map_batches(bucketed, batch_format="pandas")
        .groupby("__b__")
        .map_groups(argmin, batch_format="pandas")
    ).to_pandas()

    smap = ray.get(sup_ref)
    info = [smap[int(k)] for k in winners["s_suppkey"]]
    out = pd.DataFrame({
        "s_acctbal": [round(v[1], 2) for v in info],
        "s_name": [v[0] for v in info],
        "n_name": [v[2] for v in info],
        "p_partkey": winners["p_partkey"].astype(np.int64),
        "s_suppkey": winners["s_suppkey"].astype(np.int64),
        "min_price": winners["unit"].round(6),
    })
    return out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey", "s_suppkey"],
        ascending=[False, True, True, True, True],
        kind="mergesort", ignore_index=True).head(100)


SQL_Q2_MIN_COST_SUPPLIER = f"""
WITH u AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         l_extendedprice / l_quantity AS unit
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = {Q2_SIZE}),
w AS (
  SELECT DISTINCT p_partkey, s_suppkey, unit
  FROM (SELECT p_partkey, s_suppkey, unit,
               min(unit) OVER (PARTITION BY p_partkey) AS mn FROM u)
  WHERE unit = mn)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       w.p_partkey AS p_partkey, w.s_suppkey AS s_suppkey,
       round(unit, 6) AS min_price
FROM w
JOIN supplier ON w.s_suppkey = supplier.s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_acctbal DESC, n_name, s_name, w.p_partkey, w.s_suppkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q11-style important parts: per-part supply value from one nation's
# suppliers, filtered by a GLOBAL scalar threshold. The threshold is a
# fraction of the MAX part value (not the sum): max is summation-order-
# independent, so the broadcast scalar is bit-identical no matter how the
# distributed partials merged — a sum-based threshold could flip a boundary
# part between engines on the last ulp. Per-part values round to 4 dp
# BEFORE the max/filter so both sides cut on the same grid.
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_7"
Q11_FRACTION = 0.2


def q11_important_parts(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    nkey = int(
        nation.loc[nation["n_name"] == Q11_NATION, "n_nationkey"].iloc[0])
    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = ray.put(set(
        sup.loc[sup["s_nationkey"] == nkey, "s_suppkey"].astype(int)))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keep_sup = ray.get(skeys)
        m = df["l_suppkey"].isin(keep_sup).to_numpy()
        out = pd.DataFrame({
            "p_partkey": df["l_partkey"].to_numpy(np.int64)[m],
            "value": (df["l_extendedprice"]
                      * df["l_quantity"]).to_numpy()[m],
        })
        return out.groupby("p_partkey", as_index=False).agg(
            value=("value", "sum"))

    pv = tree_aggregate(li, ["p_partkey"], partial, {"value": "sum"})
    pv = pv.map_batches(
        lambda df: df.assign(value=df["value"].round(4)),
        batch_format="pandas")
    mx = pv.max("value")
    if mx is None:  # no suppliers from the nation in a tiny sample
        return pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                             "value": pd.Series([], dtype=np.float64)})
    thr = float(mx) * Q11_FRACTION
    # per-block partial top-100 (rounded-value desc, partkey tiebreak), then
    # one driver merge of <=100-row blocks — the filtered table never lands
    # whole on the driver
    tops = pv.map_batches(
        lambda df: df[df["value"] > thr]
        .sort_values(["value", "p_partkey"], ascending=[False, True])
        .head(100),
        batch_format="pandas").to_pandas()
    out = tops.sort_values(["value", "p_partkey"], ascending=[False, True],
                           kind="mergesort", ignore_index=True).head(100)
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    return out[["p_partkey", "value"]]


SQL_Q11_IMPORTANT_PARTS = f"""
WITH pv AS (
  SELECT l_partkey AS p_partkey,
         round(sum(l_extendedprice * l_quantity), 4) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY 1)
SELECT p_partkey, value FROM pv
WHERE value > (SELECT max(value) FROM pv) * {Q11_FRACTION}
ORDER BY value DESC, p_partkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q21-style waiting suppliers: on finished multi-supplier orders, the
# supplier who was the ONLY one to ship late (> 60 days after the order
# date), counted per supplier. The per-order EXISTS / NOT-EXISTS pair
# collapses to one bucketed pass: hash(orderkey) buckets keep every order's
# lineitems in one group, and the group computes (distinct suppliers,
# distinct late suppliers, min late supplier) vectorized.
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 60


def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"]).to_pandas()
    sname = ray.put(dict(zip(sup["s_suppkey"].astype(int), sup["s_name"])))

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
        filter=(pads.field("o_orderstatus") == "F"))
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(li, orders, on="o_orderkey", n_buckets=16)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        late = ((df["l_shipdate"] - df["o_orderdate"]).dt.days
                > Q21_LATE_DAYS)
        out = pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "late": late.to_numpy(),
        })
        out["__b__"] = (
            pd.util.hash_array(out["o_orderkey"].to_numpy(np.int64),
                               categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return out

    def lone_late(g: pd.DataFrame) -> pd.DataFrame:
        nsupp = g.groupby("o_orderkey")["l_suppkey"].nunique()
        lt = g[g["late"]]
        if lt.empty:
            return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                                 "numwait": pd.Series([], dtype=np.int64)})
        per = lt.groupby("o_orderkey")["l_suppkey"].agg(["nunique", "min"])
        ok = per.index[(per["nunique"] == 1)
                       & (nsupp.reindex(per.index) >= 2)]
        w = per.loc[ok, "min"].astype(np.int64)
        out = w.value_counts().rename_axis("s_suppkey").reset_index(
            name="numwait")
        out["numwait"] = out["numwait"].astype(np.int64)
        return out

    parts = (
        joined.map_batches(bucketed, batch_format="pandas")
        .groupby("__b__")
        .map_groups(lone_late, batch_format="pandas")
    )

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["s_suppkey", "numwait"]]

    agg = tree_aggregate(parts, ["s_suppkey"], ident,
                         {"numwait": "sum"}).to_pandas()
    names = ray.get(sname)
    out = pd.DataFrame({
        "s_name": [names[int(k)] for k in agg["s_suppkey"]],
        "numwait": agg["numwait"].astype(np.int64),
    })
    return out.sort_values(["numwait", "s_name"], ascending=[False, True],
                           kind="mergesort", ignore_index=True).head(20)


SQL_Q21_WAITING_SUPPLIERS = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS nsupp,
         count(DISTINCT CASE WHEN l_shipdate
                  > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN l_suppkey END) AS nlate,
         min(CASE WHEN l_shipdate
                  > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN l_suppkey END) AS lsupp
  FROM li GROUP BY 1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per JOIN supplier ON lsupp = s_suppkey
WHERE nsupp >= 2 AND nlate = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""


# ---------------------------------------------------------------------------
# Per-type linear trend (drift detection over a metric stream): least-squares
# slope/intercept of value vs time from ONE pass of exact sufficient
# statistics (n, Σx, Σy, Σx², Σxy) per event type. x is DAYS since a fixed
# epoch so x² stays ~1e3 — well inside float64's exact-integer range; epoch
# seconds squared (~1e18) would not be. The oracle states the same closed
# form over SQL sums rather than regr_slope so both sides share one formula
# and only the (6-dp-absorbed) summation order differs.
# ---------------------------------------------------------------------------

TREND_EPOCH = "2024-01-01"


def value_trend_by_type(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"])
    epoch = pd.Timestamp(TREND_EPOCH)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = ((df["ts"] - epoch).dt.total_seconds() / 86400.0).to_numpy()
        y = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "n": np.int64(1), "sx": x, "sy": y, "sxx": x * x, "sxy": x * y,
        })
        return g.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxx=("sxx", "sum"), sxy=("sxy", "sum"))

    a = tree_aggregate(ds, ["event_type"], partial,
                       {"n": "sum", "sx": "sum", "sy": "sum",
                        "sxx": "sum", "sxy": "sum"}).to_pandas()
    n = a["n"].to_numpy(np.float64)
    sx, sy = a["sx"].to_numpy(), a["sy"].to_numpy()
    sxx, sxy = a["sxx"].to_numpy(), a["sxy"].to_numpy()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    out = pd.DataFrame({
        "event_type": a["event_type"],
        "n": a["n"].astype(np.int64),
        "slope": np.round(slope, 6),
        "intercept": np.round((sy - slope * sx) / n, 6),
    })
    return out.sort_values("event_type", ignore_index=True)


SQL_VALUE_TREND = f"""
WITH s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(value) AS sy,
         sum(x * x) AS sxx, sum(x * value) AS sxy
  FROM (SELECT event_type, value,
               date_diff('microsecond', TIMESTAMP '{TREND_EPOCH}', ts)
                 / 86400000000.0 AS x
        FROM events)
  GROUP BY 1)
SELECT event_type, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Windowed event dedup rate (stream hygiene: the same user re-firing the
# same event within the window is a duplicate): LAG-vs-previous-raw-event
# semantics, diffs compared in EXACT integer microseconds so neither side
# truncates. One user-bucketed shuffle; inside a bucket the lag is a
# vectorized shifted comparison over the (user, type, ts, event_id) sort.
# ---------------------------------------------------------------------------

EVENT_DEDUP_WINDOW_US = 3600 * 1_000_000


def event_dedup_rate(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"])

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "ts", "user_id", "event_type"]].copy()
        out["__b__"] = (
            pd.util.hash_array(out["user_id"].to_numpy(np.int64),
                               categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same[1:] = ((g["user_id"].to_numpy()[1:]
                         == g["user_id"].to_numpy()[:-1])
                        & (g["event_type"].to_numpy()[1:]
                           == g["event_type"].to_numpy()[:-1]))
        diff = np.empty(len(g), dtype=np.int64)
        diff[0] = np.iinfo(np.int64).max
        if len(g) > 1:
            diff[1:] = us[1:] - us[:-1]
        dropped = same & (diff <= EVENT_DEDUP_WINDOW_US)
        out = pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            "n_events": np.int64(1),
            "n_dropped": dropped.astype(np.int64),
        })
        return out.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), n_dropped=("n_dropped", "sum"))

    parts = (ds.map_batches(bucketed, batch_format="pandas")
             .groupby("__b__")
             .map_groups(per_bucket, batch_format="pandas"))

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_type", "n_events", "n_dropped"]]

    a = tree_aggregate(parts, ["event_type"], ident,
                       {"n_events": "sum", "n_dropped": "sum"}).to_pandas()
    out = pd.DataFrame({
        "event_type": a["event_type"],
        "n_events": a["n_events"].astype(np.int64),
        "n_dropped": a["n_dropped"].astype(np.int64),
        "drop_rate": np.round(a["n_dropped"].to_numpy(np.float64)
                              / a["n_events"].to_numpy(np.float64), 6),
    })
    return out.sort_values("event_type", ignore_index=True)


SQL_EVENT_DEDUP_RATE = f"""
WITH lagged AS (
  SELECT event_type,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id), ts) AS d
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN d IS NOT NULL
                      AND d <= {EVENT_DEDUP_WINDOW_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       round(sum(CASE WHEN d IS NOT NULL
                       AND d <= {EVENT_DEDUP_WINDOW_US}
                      THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
           AS drop_rate
FROM lagged GROUP BY 1 ORDER BY 1
"""


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
    from ..index.qparser import QS_MAX_EXPANSIONS, querystring_topk

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
    from ..index.phrase import phrase_needle
    from ..index.qparser import QS_MAX_EXPANSIONS, parse_query

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


# ---------------------------------------------------------------------------
# Day-of-week × hour activity heatmap: the dashboard aggregate with a
# numbering trap — pandas weekday (Mon=0) vs DuckDB dow (Sun=0) — dodged by
# contracting on strftime('%a') NAMES (C locale on both engines).
# ---------------------------------------------------------------------------


def events_dow_hour_heatmap(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "dow": df["ts"].dt.strftime("%a"),
            "hour": df["ts"].dt.hour.astype(np.int64),
            "n_events": np.int64(1),
        })
        return out.groupby(["dow", "hour"], as_index=False).agg(
            n_events=("n_events", "sum"))

    agg = tree_aggregate(ds, ["dow", "hour"], partial,
                         {"n_events": "sum"}).to_pandas()
    agg["n_events"] = agg["n_events"].astype(np.int64)
    agg["hour"] = agg["hour"].astype(np.int64)
    return agg.sort_values(["dow", "hour"], ignore_index=True)


SQL_DOW_HOUR_HEATMAP = """
SELECT strftime(ts, '%a') AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Corpus version diff (nightly-recrawl ops report): FULL-OUTER-JOIN shape
# over doc_id comparing text between version A (the corpus) and a
# deterministically derived version B (drop doc_id%41==0, edit %37==0,
# clone-with-new-id %53==0) — classified added / removed / changed /
# unchanged, counted per status. One doc_id-bucketed shuffle classifies
# each id inside its bucket (both sides of an id land together); only
# status counts leave the buckets. The oracle derives B with identical SQL
# arithmetic.
# ---------------------------------------------------------------------------

DIFF_DROP, DIFF_EDIT, DIFF_CLONE = 41, 37, 53
DIFF_CLONE_OFFSET = 1_000_000


def corpus_version_diff(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])

    def both_sides(df: pd.DataFrame):
        ids = df["doc_id"].to_numpy(np.int64)
        text = df["text"].to_numpy()
        a = pd.DataFrame({"doc_id": ids, "side": "a", "text": text})
        keep = ids % DIFF_DROP != 0
        edit = ids % DIFF_EDIT == 0
        btext = np.where(edit, np.char.add(text.astype(str), " v2"), text)
        b = pd.DataFrame({"doc_id": ids[keep], "side": "b",
                          "text": btext[keep]})
        clones = ids % DIFF_CLONE == 0
        c = pd.DataFrame({
            "doc_id": ids[clones] + DIFF_CLONE_OFFSET, "side": "b",
            "text": text[clones]})
        out = pd.concat([a, b, c], ignore_index=True)
        out["__b__"] = (
            pd.util.hash_array(out["doc_id"].to_numpy(np.int64),
                               categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return out

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(index="doc_id", columns="side", values="text",
                          aggfunc="first")
        has_a = p["a"].notna() if "a" in p else pd.Series(False, p.index)
        has_b = p["b"].notna() if "b" in p else pd.Series(False, p.index)
        status = np.where(
            has_a & has_b,
            np.where(p.get("a") == p.get("b"), "unchanged", "changed"),
            np.where(has_a, "removed", "added"))
        out = pd.DataFrame({"status": status, "n_docs": np.int64(1)})
        return out.groupby("status", as_index=False).agg(
            n_docs=("n_docs", "sum"))

    parts = (ds.map_batches(both_sides, batch_format="pandas")
             .groupby("__b__")
             .map_groups(classify, batch_format="pandas"))

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["status", "n_docs"]]

    agg = tree_aggregate(parts, ["status"], ident,
                         {"n_docs": "sum"}).to_pandas()
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    return agg.sort_values("status", ignore_index=True)


SQL_CORPUS_DIFF = f"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_EDIT} = 0 THEN text || ' v2'
              ELSE text END AS text
  FROM documents WHERE doc_id % {DIFF_DROP} <> 0
  UNION ALL
  SELECT doc_id + {DIFF_CLONE_OFFSET}, text
  FROM documents WHERE doc_id % {DIFF_CLONE} = 0),
j AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.text = b.text THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT status, CAST(count(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Hourly anomaly detection (ops-dashboard shape): per event type, z-score of
# each hour's event count against that type's own hourly mean/stddev
# (population). Counts are integers, so the (n, Σc, Σc²) moments are EXACT
# on both engines regardless of merge order — the z only sees one float
# division at the end, rounded to 6 dp. One tree pass for hourly counts
# (hour-type cardinality is bounded), driver arithmetic on the tiny table.
# ---------------------------------------------------------------------------

ANOMALY_Z = 3.0


def events_anomaly_zscore(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "hour": df["ts"].dt.floor("h"),
            "n": np.int64(1),
        })
        return out.groupby(["event_type", "hour"], as_index=False).agg(
            n=("n", "sum"))

    hc = tree_aggregate(ds, ["event_type", "hour"], partial,
                        {"n": "sum"}).to_pandas()
    hc["n"] = hc["n"].astype(np.int64)
    g = hc.groupby("event_type")["n"]
    mean = g.transform("mean")
    # population stddev from exact integer moments
    sq = hc.groupby("event_type")["n"].transform(
        lambda s: np.sqrt((np.square(s.to_numpy(np.float64))).mean()
                          - s.to_numpy(np.float64).mean() ** 2))
    z = (hc["n"] - mean) / sq
    out = pd.DataFrame({
        "event_type": hc["event_type"],
        "hour": hc["hour"],
        "n": hc["n"],
        "z": np.round(z.to_numpy(np.float64), 6),
    })
    out = out[np.abs(out["z"]) > ANOMALY_Z]
    return out.sort_values(["event_type", "hour"], ignore_index=True)


SQL_EVENTS_ANOMALY = f"""
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, avg(n) AS mu,
         sqrt(avg(n * n) - avg(n) * avg(n)) AS sd
  FROM hc GROUP BY 1)
SELECT hc.event_type, hour, n, round((n - mu) / sd, 6) AS z
FROM hc JOIN m ON hc.event_type = m.event_type
WHERE abs((n - mu) / sd) > {ANOMALY_Z}
ORDER BY hc.event_type, hour
"""


# ---------------------------------------------------------------------------
# Month-over-month revenue growth (LAG over a month-sized table): monthly
# sums round to 4 dp FIRST, then the growth ratio divides the ROUNDED
# values — both engines see identical dividends, so the 6-dp ratio can't
# straddle an ulp.
# ---------------------------------------------------------------------------


def orders_monthly_growth(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "month": df["o_orderdate"].dt.to_period("M").dt.to_timestamp(),
            "revenue": df["o_totalprice"].to_numpy(np.float64),
        })
        return out.groupby("month", as_index=False).agg(
            revenue=("revenue", "sum"))

    m = tree_aggregate(ds, ["month"], partial,
                       {"revenue": "sum"}).to_pandas()
    m = m.sort_values("month", ignore_index=True)
    m["revenue"] = m["revenue"].round(4)
    prev = m["revenue"].shift(1)
    growth = (m["revenue"] - prev) / prev
    out = pd.DataFrame({
        "month": m["month"],
        "revenue": m["revenue"],
        "mom_growth": np.round(growth.to_numpy(np.float64), 6),
    })
    # the first month has no predecessor — dropped on both sides
    return out[prev.notna().to_numpy()].reset_index(drop=True)


SQL_MONTHLY_GROWTH = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         round(sum(o_totalprice), 4) AS revenue
  FROM orders GROUP BY 1),
g AS (
  SELECT month, revenue, lag(revenue) OVER (ORDER BY month) AS prev
  FROM m)
SELECT month, revenue, round((revenue - prev) / prev, 6) AS mom_growth
FROM g WHERE prev IS NOT NULL ORDER BY month
"""


# ---------------------------------------------------------------------------
# Federated search with GLOBAL statistics (Solr ExactStatsCache model): the
# corpus splits into two member indexes with DIFFERENT layouts, and the
# federated scatter — merged df/max_tf/min_dl, global n_docs/avgdl, local
# bucket maps (index/federated.py) — must reproduce the single-index BM25
# oracle bit-for-bit. Member indexes cache in /tmp with build_index's own
# fast-resume stamp, so gate re-runs skip the split+build.
# ---------------------------------------------------------------------------


def _fed_member_indexes(sf_dir: str) -> list[str]:
    """Two member indexes over disjoint doc-id halves with DIFFERENT
    layouts; cached in /tmp via build_index's fast-resume stamp."""
    from ..index.build import BuildConfig, build_index

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
    from ..index.federated import FederatedSearcher

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
    from ..index.federated import FederatedSearcher

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
    from ..index.federated import FederatedSearcher

    fed = FederatedSearcher(_fed_member_indexes(sf_dir))
    out = fed.facet_counts("lang", text=FACET_QUERY, mode="and")
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# TPC-H Q20-style dominant suppliers: suppliers who shipped MORE THAN HALF
# of a matching part's total shipped quantity in one year (the
# partsupp-availqty test re-expressed over the lineitem-derived supply
# relation). Both aggregation levels — per-(part, supplier) and per-part —
# key on partkey, so ONE hash-bucket shuffle computes numerator and
# denominator in the same group with no second exchange; quantities are
# exact integers (l_quantity is whole-valued), so share > 0.5 compares
# 2*sup_qty > part_qty in int64 with no float boundary at all.
# ---------------------------------------------------------------------------

Q20_NAME_SUBSTR = "blue"
Q20_WINDOW = ("1997-01-01", "1997-07-01")


def q20_dominant_suppliers(sf_dir: str) -> pd.DataFrame:
    import pyarrow.compute as pc_
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from .joins import hash_join

    sup = pq_.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"]).to_pandas()
    sname = ray.put(dict(zip(sup["s_suppkey"].astype(int), sup["s_name"])))

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
    ).map_batches(
        lambda t: t.filter(pc_.match_substring(t["p_name"], Q20_NAME_SUBSTR))
        .drop_columns(["p_name"])
        .rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )
    lo, hi = (pd.Timestamp(d).to_pydatetime() for d in Q20_WINDOW)
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)),
    )
    joined = hash_join(li, part, on="l_partkey", n_buckets=16)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "p_partkey": df["l_partkey"].to_numpy(np.int64),
            "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "qty": df["l_quantity"].to_numpy(np.float64).astype(np.int64),
        })
        out["__b__"] = (
            pd.util.hash_array(out["p_partkey"].to_numpy(np.int64),
                               categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return out

    def dominant(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["p_partkey", "s_suppkey"], as_index=False).agg(
            sup_qty=("qty", "sum"))
        tot = g.groupby("p_partkey")["qty"].sum()
        ps["part_qty"] = ps["p_partkey"].map(tot).astype(np.int64)
        w = ps[2 * ps["sup_qty"] > ps["part_qty"]]
        out = w[["s_suppkey"]].drop_duplicates()
        return out

    winners = (
        joined.map_batches(bucketed, batch_format="pandas")
        .groupby("__b__")
        .map_groups(dominant, batch_format="pandas")
    ).to_pandas()
    if winners.empty or "s_suppkey" not in winners.columns:
        return pd.DataFrame({"s_name": pd.Series([], dtype=object)})
    winners = winners.drop_duplicates()
    names = ray.get(sname)
    out = pd.DataFrame({
        "s_name": sorted({names[int(k)] for k in winners["s_suppkey"]})})
    return out.reset_index(drop=True)


SQL_Q20_DOMINANT_SUPPLIERS = f"""
WITH f AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{Q20_NAME_SUBSTR}%'
    AND l_shipdate >= TIMESTAMP '{Q20_WINDOW[0]}'
    AND l_shipdate <  TIMESTAMP '{Q20_WINDOW[1]}'),
ps AS (SELECT p_partkey, s_suppkey, sum(qty) AS sup_qty
       FROM f GROUP BY 1, 2),
pt AS (SELECT p_partkey, sum(qty) AS part_qty FROM f GROUP BY 1)
SELECT DISTINCT s_name
FROM ps JOIN pt ON ps.p_partkey = pt.p_partkey
JOIN supplier ON ps.s_suppkey = supplier.s_suppkey
WHERE 2 * sup_qty > part_qty
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Sliding-window distinct (7-day active users per day): the exact
# COUNT(DISTINCT) OVER a range window, distributed without re-scanning per
# window. Distinct (user, day) pairs are user-bucketed; inside a bucket each
# active day expands to the <=7 window days it covers, (user, window-day)
# dedups VECTORIZED within the bucket (a user's pairs all live in one
# bucket, so the dedup is exact), and only (window-day, count) partials —
# O(#days) rows — leave the bucket. Window days are then restricted to days
# that actually occur, matching the oracle's day list.
# ---------------------------------------------------------------------------

ROLLING_DAU_WINDOW_DAYS = 7


def rolling_7d_active_users(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"])
    w = ROLLING_DAU_WINDOW_DAYS

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "day": df["ts"].dt.floor("D"),
            "user_id": df["user_id"].to_numpy(np.int64),
        }).drop_duplicates()
        out["__b__"] = (
            pd.util.hash_array(out["user_id"].to_numpy(np.int64),
                               categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return out

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["day", "user_id"]].drop_duplicates()
        days = g["day"].to_numpy("datetime64[D]")
        users = g["user_id"].to_numpy(np.int64)
        cov_day = (np.repeat(days, w)
                   + np.tile(np.arange(w, dtype="timedelta64[D]"),
                             len(days)))
        cov_user = np.repeat(users, w)
        pairs = pd.DataFrame({"day": cov_day.astype("datetime64[us]"),
                              "user_id": cov_user}).drop_duplicates()
        out = pairs.groupby("day", as_index=False).agg(
            active_users_7d=("user_id", "size"))
        out["active_users_7d"] = out["active_users_7d"].astype(np.int64)
        return out

    parts = (ds.map_batches(bucketed, batch_format="pandas")
             .groupby("__b__")
             .map_groups(expand, batch_format="pandas"))

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["day", "active_users_7d"]]

    agg = tree_aggregate(parts, ["day"], ident,
                         {"active_users_7d": "sum"}).to_pandas()
    # restrict to days that occur in the data (the window's anchor set)
    present = ds.map_batches(
        lambda df: pd.DataFrame({"day": df["ts"].dt.floor("D")})
        .drop_duplicates(),
        batch_format="pandas").to_pandas().drop_duplicates()
    agg = agg[agg["day"].isin(set(present["day"]))]
    agg["active_users_7d"] = agg["active_users_7d"].astype(np.int64)
    return agg.sort_values("day", ignore_index=True)


SQL_ROLLING_DAU = f"""
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM du)
SELECT days.d AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_users_7d
FROM days JOIN du
  ON du.d BETWEEN days.d - INTERVAL {ROLLING_DAU_WINDOW_DAYS - 1} DAY
              AND days.d
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Churn-label training table (ML dataset construction from an event log):
# per-user feature vector (event counts per type before the cutoff) plus the
# churn label (no activity on/after the cutoff). One keyed pass — per-batch
# pivoted partials merge by sum, the label rides as max(post-cutoff flag)
# inverted at the end. Emits one row per user, including users whose only
# activity is post-cutoff (all-zero features, label 0).
# ---------------------------------------------------------------------------

CHURN_CUTOFF = "2024-01-24"
CHURN_TYPES = ("click", "error", "purchase", "signup", "view")


def churn_training_table(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "event_type"])
    cutoff = pd.Timestamp(CHURN_CUTOFF)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pre = df["ts"] < cutoff
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64)})
        et = df["event_type"].to_numpy()
        for t in CHURN_TYPES:
            out[f"n_{t}"] = ((et == t) & pre.to_numpy()).astype(np.int64)
        out["post"] = (~pre).to_numpy().astype(np.int64)
        return out.groupby("user_id", as_index=False).agg(
            {**{f"n_{t}": "sum" for t in CHURN_TYPES}, "post": "max"})

    spec = {f"n_{t}": "sum" for t in CHURN_TYPES}
    spec["post"] = "max"
    a = tree_aggregate(ds, ["user_id"], partial, spec).to_pandas()
    out = pd.DataFrame({"user_id": a["user_id"].astype(np.int64)})
    for t in CHURN_TYPES:
        out[f"n_{t}"] = a[f"n_{t}"].astype(np.int64)
    out["churned"] = (1 - a["post"]).astype(np.int64)
    return out.sort_values("user_id", ignore_index=True)


SQL_CHURN_TABLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(sum(CASE WHEN event_type = '{t}' AND ts < TIMESTAMP "
           f"'{CHURN_CUTOFF}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
           for t in CHURN_TYPES)},
       CAST(CASE WHEN max(CASE WHEN ts >= TIMESTAMP '{CHURN_CUTOFF}'
                               THEN 1 ELSE 0 END) = 1
                 THEN 0 ELSE 1 END AS BIGINT) AS churned
FROM events GROUP BY user_id ORDER BY user_id
"""


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

    from ..index.reshard import reshard_index
    from ..index.segments import read_stats

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


# ---------------------------------------------------------------------------
# TPC-H Q12-style shipping-delay audit: each order's WORST lineitem delay
# (max ship lag in days), bucketed late/ontime, counted by high/low order
# priority. Per-order max rides the same hash(orderkey) bucketing as Q21;
# day diffs are exact integers so no float contract is needed.
# ---------------------------------------------------------------------------

Q12_LATE_DAYS = 45
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_by_delay(sf_dir: str) -> pd.DataFrame:
    from ..state.aggregates import tree_aggregate
    from .joins import hash_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(li, orders, on="o_orderkey", n_buckets=16)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "delay": (df["l_shipdate"]
                      - df["o_orderdate"]).dt.days.to_numpy(np.int64),
            "high": df["o_orderpriority"].isin(Q12_HIGH).to_numpy(),
        })
        out["__b__"] = (
            pd.util.hash_array(out["o_orderkey"].to_numpy(np.int64),
                               categorize=False)
            % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return out

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("o_orderkey").agg(
            delay=("delay", "max"), high=("high", "first"))
        out = pd.DataFrame({
            "delay_bucket": np.where(per["delay"] > Q12_LATE_DAYS,
                                     "late", "ontime"),
            "priority_class": np.where(per["high"], "high", "low"),
            "order_count": np.int64(1),
        })
        return out.groupby(["delay_bucket", "priority_class"],
                           as_index=False).agg(
            order_count=("order_count", "sum"))

    parts = (
        joined.map_batches(bucketed, batch_format="pandas")
        .groupby("__b__")
        .map_groups(per_order, batch_format="pandas")
    )

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df[["delay_bucket", "priority_class", "order_count"]]

    agg = tree_aggregate(parts, ["delay_bucket", "priority_class"], ident,
                         {"order_count": "sum"}).to_pandas()
    agg["order_count"] = agg["order_count"].astype(np.int64)
    return agg.sort_values(["delay_bucket", "priority_class"],
                           kind="mergesort", ignore_index=True)


SQL_Q12_PRIORITY_BY_DELAY = f"""
WITH per AS (
  SELECT o_orderkey,
         max(date_diff('day', o_orderdate, l_shipdate)) AS delay,
         min(o_orderpriority) AS pr
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1)
SELECT CASE WHEN delay > {Q12_LATE_DAYS} THEN 'late' ELSE 'ontime' END
           AS delay_bucket,
       CASE WHEN pr IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}') THEN 'high'
            ELSE 'low' END AS priority_class,
       CAST(count(*) AS BIGINT) AS order_count
FROM per GROUP BY 1, 2 ORDER BY 1, 2
"""


# Dict ORDER is part of the external contract: the driver's correctness gate
# checks the FIRST 50 entries, so the flagship surface (index build + BM25,
# the doc-builder port, MARC, dedup families, ANN, curation) leads and the
# long tail of BM25/facet/join variants follows.
QUERIES = {
    # -- flagship index + retrieval surface -------------------------------
    "bm25_topk": bm25_topk_docs,
    "docbuilder_flagship": docbuilder_flagship,
    "marc_records": marc_records_docs,
    "fieldmap_project": fieldmap_project_docs,
    "fieldmap_avalon": fieldmap_avalon_docs,
    "incremental_update": incremental_update_demo,
    "realtime_get_updated": realtime_get_updated,
    "natural_sort_parts": natural_sort_parts,
    "term_tf_top100": term_tf_top100,
    "doc_token_counts": doc_token_counts,
    # -- dedup families ----------------------------------------------------
    "exact_dedup": exact_dedup_docs,
    "minhash_dedup": minhash_dedup_docs,
    "simhash_pairs": simhash_pairs_docs,
    "shingle_dup_pairs": shingle_dup_pairs,
    "embedding_near_dups": embedding_near_dup_pairs,
    "semantic_dedup_keep": semantic_dedup_keep,
    "corpus_clean_keep": corpus_clean_keep,
    # -- similarity search -------------------------------------------------
    "knn_cosine_top10": knn_cosine_top10,
    "embedding_label_centroids": embedding_label_centroids,
    "knn_label_confusion": knn_label_confusion_matrix,
    "knn_ivf_top10": knn_ivf_top10,
    "knn_filtered_top10": knn_filtered_top10,
    "hybrid_rrf_topk": hybrid_rrf_topk,
    "bm25_rerank_dense": bm25_rerank_dense,
    "embedding_quantize_int8": embedding_quantize_int8,
    # -- text analysis + curation ------------------------------------------
    "lang_id": lang_id_docs,
    "quality_stats": quality_stats,
    "repetition_stats": repetition_stats,
    "classifier_quality_scores": classifier_quality_scores,
    "tfidf_keywords_top3": tfidf_keywords_top3,
    "fingerprints": fingerprints_docs,
    "winnow_fingerprints": winnow_fingerprints_docs,
    "pii_redaction": pii_redaction,
    "decontamination_report": decontamination_report,
    "bm25_topk_federated": bm25_topk_federated,
    "bm25_topk_resharded": bm25_topk_resharded,
    "train_val_test_split": train_val_test_split,
    "leakage_safe_split": leakage_safe_split,
    "quality_weighted_sample": quality_weighted_sample,
    "dsir_weights_lang_en": dsir_weights_lang_en,
    "temperature_sample_by_source": temperature_sample_by_source,
    "chunk_docs": chunk_docs,
    "pack_sequences": pack_sequences,
    "c4_filters": c4_filters,
    "gopher_filters": gopher_filters,
    # -- alerting / streaming-shaped ----------------------------------------
    "distinct_events_hll": distinct_events_hll,
    "profile_lineitem": profile_lineitem,
    "q1_pricing": q1_pricing,
    "multimodal_features": multimodal_features,
    "video_frame_features": video_frame_features,
    # ======= driver 50-entry window boundary (everything above is the
    # flagship surface; below is the wide variant tail) =====================
    "percolate_matches": percolate_matches,
    "customer_running_revenue": customer_running_revenue,
    "value_quantiles": value_quantiles,
    "shuffle_export": shuffle_export,
    "bpe_merges": bpe_merges,
    "term_df_top100": term_df_top100,
    "events_hourly": events_hourly,
    "events_composite_page2": events_composite_page2,
    "line_dedup_boilerplate": line_dedup_boilerplate,
    "intra_doc_line_dedup": intra_doc_line_dedup_docs,
    "substring_dedup_rewrite": substring_dedup_rewrite,
    "ccnet_ppl_buckets": ccnet_ppl_buckets_by_lang,
    "contrastive_crop_pairs": contrastive_crop_pairs,
    "deterministic_sample": deterministic_sample,
    "domain_mix_sample": domain_mix_sample,
    "lang_source_stats": lang_source_stats,
    "distinct_users_by_type_hll": distinct_users_by_type_hll,
    "cms_term_counts": cms_term_counts,
    "embedding_near_dups_exact": embedding_near_dups_exact_pairs,
    "jaccard_pairs": jaccard_pairs,
    "knn_mmr_top10": knn_mmr_top10,
    "knn_pq_top10": knn_pq_top10,
    "percolate_phrase_matches": percolate_phrase_matches,
    "events_rolling_3h": events_rolling_3h,
    "grouped_value_quantiles": grouped_value_quantiles,
    "top10_customers_revenue": top10_customers_revenue,
    "dirty_refs": dirty_refs,
    "date_age_buckets": date_age_buckets,
    "bm25_topk_lang_en": bm25_topk_lang_en,
    "bm25_range_topk": bm25_range_topk,
    "facet_lang_conjunctive": facet_lang_conjunctive,
    "bm25_topk_conjunctive": bm25_topk_conjunctive,
    "bm25_phrase_topk": bm25_phrase_topk,
    "bm25_sloppy_topk": bm25_sloppy_topk,
    "bm25_near_topk": bm25_near_topk,
    "bm25_pf_topk": bm25_pf_topk,
    "bm25_span_first_topk": bm25_span_first_topk,
    "bm25_span_not_topk": bm25_span_not_topk,
    "bm25_prefix_topk": bm25_prefix_topk,
    "bm25_regex_topk": bm25_regex_topk,
    "bm25_fuzzy_topk": bm25_fuzzy_topk,
    "spellcheck_suggest": spellcheck_suggest,
    "bm25_not_topk": bm25_not_topk,
    "bm25_mm_topk": bm25_mm_topk,
    "bm25_mlt_topk": bm25_mlt_topk,
    "bm25_dismax_topk": bm25_dismax_topk,
    "bm25_boosted_topk": bm25_boosted_topk,
    "bm25_bq_topk": bm25_bq_topk,
    "bm25_recip_boost_topk": bm25_recip_boost_topk,
    "bm25_synonym_topk": bm25_synonym_topk,
    "bm25_elevated_topk": bm25_elevated_topk,
    "grouped_topk_by_source": grouped_topk_by_source,
    "bm25_collapse_topk": bm25_collapse_topk,
    "bm25_page2": bm25_page2,
    "bm25_cursor_page2": bm25_cursor_page2,
    "bm25_join_topk": bm25_join_topk,
    "graph_expand_matches": graph_expand_matches,
    "facet_query_counts": facet_query_counts,
    "event_funnel": event_funnel,
    "retention_cohorts": retention_cohorts,
    "bm25_topk_fields": bm25_topk_fields,
    "bm25_prf_topk": bm25_prf_topk,
    "bm25_stemmed_topk": bm25_stemmed_topk,
    "terms_browse": terms_browse,
    "terms_infix": terms_infix,
    "facet_source_disjunctive": facet_source_disjunctive,
    "field_stats_by_lang": field_stats_by_lang,
    "facet_range_chars": facet_range_chars,
    "facet_interval_counts": facet_interval_counts,
    "facet_pivot_lang_source": facet_pivot_lang_source,
    "facet_nested_stats": facet_nested_stats,
    "export_sorted_matches": export_sorted_matches,
    "significant_terms": significant_terms,
    "sort_by_field_topk": sort_by_field_topk,
    "top_terms_per_lang": top_terms_per_lang,
    "doc_length_histogram": doc_length_histogram,
    "revenue_by_nation": revenue_by_nation,
    "user_sessions": user_sessions,
    "event_transitions": event_transitions,
    "q3_revenue_join": q3_revenue_join,
    "q_shipped_within_90d": q_shipped_within_90d,
    "asof_view_before_purchase": asof_view_before_purchase,
    "bm25_snippets": bm25_snippets,
    "bm25_explain_top3": bm25_explain_top3,
    "bm25_eval_metrics": bm25_eval_metrics,
    "bm25_hard_negatives": bm25_hard_negatives,
    "hybrid_minmax_topk": hybrid_minmax_topk,
    "related_docs_tfidf": related_docs_tfidf,
    "unigram_quality": unigram_quality,
    "bigram_quality": bigram_quality,
    "text_normalize": text_normalize,
    "bigram_top50": bigram_top50,
    "pagerank_top100": pagerank_top100,
    "bm25_expand_topk": bm25_expand_topk,
    "term_vectors_top3": term_vectors_top3,
    "rare_terms": rare_terms,
    "source_unigram_kl": source_unigram_kl,
    "doc_novelty_stats": doc_novelty_stats,
    "events_hourly_ma3": events_hourly_ma3,
    "value_percentile_ranks": value_percentile_ranks,
    "embedding_alignment_stats": embedding_alignment_stats,
    "bpe_token_counts": bpe_token_counts_docs,
    "minhash_cluster_sizes": minhash_cluster_sizes,
    "cheapest_lineitem_per_order": cheapest_lineitem_per_order,
    "orders_per_customer_histogram": orders_per_customer_histogram,
    "char_entropy_stats": char_entropy_stats,
    "bm25_collated_topk": bm25_collated_topk,
    "rag_context_topk": rag_context_topk,
    "lang_confusion_matrix": lang_confusion_matrix,
    "viewers_never_purchased": viewers_never_purchased,
    "time_to_first_purchase": time_to_first_purchase,
    "zipf_slope": zipf_slope,
    "pmi_top_bigrams": pmi_top_bigrams,
    "dup_rate_by_source": dup_rate_by_source,
    "q18_large_orders": q18_large_orders,
    "part_supplier_variety": part_supplier_variety,
    "embedding_covariance": embedding_covariance,
    "pca_top_component": pca_top_component,
    "ngram_diversity_by_source": ngram_diversity_by_source,
    "kmeans_clusters": kmeans_clusters,
    "rollup_revenue": rollup_revenue,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q19_bracket_revenue": q19_bracket_revenue,
    "q22_idle_balance": q22_idle_balance,
    "customer_order_gaps": customer_order_gaps,
    "cluster_canonical_docs": cluster_canonical_docs,
    "embedding_label_outliers": embedding_label_outliers,
    "doc_ttr_stats": doc_ttr_stats,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q4_order_priority": q4_order_priority,
    "winsorized_value_stats": winsorized_value_stats,
    "suggest_topk": suggest_topk,
    "incremental_dedup_new_docs": incremental_dedup_new_docs,
    "copurchase_top_pairs": copurchase_top_pairs,
    "props_k_stats_by_type": props_k_stats_by_type,
    "kwic_concordance": kwic_concordance,
    "label_centroid_similarity": label_centroid_similarity,
    "incremental_dedup_bloom": incremental_dedup_bloom,
    "es_weighted_sample": es_weighted_sample,
    "stratified_sample_per_source": stratified_sample_per_source,
    "priority_value_chi2": priority_value_chi2,
    "source_lang_concat": source_lang_concat,
    "value_mad_by_type": value_mad_by_type,
    "doc_pareto_frontier": doc_pareto_frontier,
    "token_budget_allocation": token_budget_allocation,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "zscore_nchars_by_lang": zscore_nchars_by_lang,
    "audio_features": audio_features,
    "customer_revenue_gini": customer_revenue_gini,
    "benford_totalprice": benford_totalprice,
    "ab_conversion_ztest": ab_conversion_ztest,
    "event_session_ids": event_session_ids,
    "skipgram_pmi_top20": skipgram_pmi_top20,
    "supplier_balance_pctrank": supplier_balance_pctrank,
    "term_burstiness_top20": term_burstiness_top20,
    "label_silhouette": label_silhouette,
    # (bm25_topk_federated / bm25_topk_resharded live in the flagship
    # window above)
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q12_priority_by_delay": q12_priority_by_delay,
    "value_trend_by_type": value_trend_by_type,
    "event_dedup_rate": event_dedup_rate,
    "rolling_7d_active_users": rolling_7d_active_users,
    "churn_training_table": churn_training_table,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "events_anomaly_zscore": events_anomaly_zscore,
    "orders_monthly_growth": orders_monthly_growth,
    "facet_lang_federated": facet_lang_federated,
    "lmd_topk": lmd_topk_docs,
    "corpus_version_diff": corpus_version_diff,
    "bm25_querystring_topk": bm25_querystring_topk,
    "events_dow_hour_heatmap": events_dow_hour_heatmap,
    "lmd_topk_federated": lmd_topk_federated,
    "session_conversion_rate": session_conversion_rate,
}


def oracle_sql_map() -> dict[str, str]:
    return {
        "term_tf_top100": SQL_TERM_TF_TOP100,
        "term_df_top100": SQL_TERM_DF_TOP100,
        "doc_token_counts": SQL_DOC_TOKEN_COUNTS,
        "exact_dedup": SQL_EXACT_DEDUP,
        "lang_source_stats": SQL_LANG_SOURCE_STATS,
        "quality_stats": SQL_QUALITY_STATS,
        "repetition_stats": SQL_REPETITION_STATS,
        "lang_id": SQL_LANG_ID,
        "bm25_topk": _bm25_sql(),
        "knn_cosine_top10": SQL_KNN_COSINE,
        "embedding_label_centroids": SQL_LABEL_CENTROIDS,
        "knn_label_confusion": SQL_KNN_LABEL_CONFUSION,
        "knn_filtered_top10": _knn_filtered_sql(),
        "knn_mmr_top10": _knn_mmr_sql(),
        "percolate_matches": _percolate_sql(),
        "percolate_phrase_matches": _percolate_phrase_sql(),
        "hybrid_rrf_topk": _hybrid_sql(),
        "bm25_rerank_dense": _rerank_sql(),
        "events_hourly": SQL_EVENTS_HOURLY,
        "events_composite_page2": SQL_EVENTS_COMPOSITE_PAGE2,
        "events_rolling_3h": SQL_EVENTS_ROLLING_3H,
        "value_quantiles": SQL_VALUE_QUANTILES,
        "grouped_value_quantiles": SQL_GROUPED_QUANTILES,
        "customer_running_revenue": SQL_RUNNING_REVENUE,
        "distinct_events_hll": _hll_sql(),
        "distinct_users_by_type_hll": _hll_grouped_sql(),
        "cms_term_counts": _cms_sql(),
        "q1_pricing": SQL_Q1_PRICING,
        "top10_customers_revenue": SQL_TOP10_CUSTOMERS,
        "dirty_refs": SQL_DIRTY_REFS,
        "date_age_buckets": SQL_DATE_AGE_BUCKETS,
        "bm25_topk_lang_en": _bm25_filtered_sql(),
        "bm25_range_topk": _bm25_range_sql(),
        "facet_lang_conjunctive": _facet_sql(),
        "bm25_topk_conjunctive": _bm25_conjunctive_sql(),
        "bm25_phrase_topk": _phrase_sql(),
        "bm25_sloppy_topk": _sloppy_sql(),
        "bm25_near_topk": _near_sql(),
        "bm25_pf_topk": _pf_sql(),
        "bm25_span_first_topk": _span_first_sql(),
        "bm25_span_not_topk": _span_not_sql(),
        "bm25_prefix_topk": _prefix_sql(),
        "bm25_regex_topk": _regex_sql(),
        "bm25_fuzzy_topk": _fuzzy_sql(),
        "spellcheck_suggest": _spellcheck_sql(),
        "bm25_not_topk": _not_sql(),
        "bm25_mm_topk": _mm_sql(),
        "bm25_mlt_topk": _mlt_sql(),
        "bm25_dismax_topk": _dismax_sql(),
        "bm25_boosted_topk": _boosted_sql(),
        "bm25_bq_topk": _bq_sql(),
        "bm25_recip_boost_topk": _recip_boost_sql(),
        "bm25_synonym_topk": _synonym_sql(),
        "bm25_elevated_topk": _elevated_sql(),
        "grouped_topk_by_source": _grouped_sql(),
        "bm25_collapse_topk": _collapse_sql(),
        "bm25_page2": _page2_sql(),
        "bm25_cursor_page2": _page2_sql(),
        "bm25_join_topk": _bm25_join_sql(),
        "graph_expand_matches": _graph_sql(),
        "facet_query_counts": _facet_query_sql(),
        "tfidf_keywords_top3": _tfidf_sql(),
        "classifier_quality_scores": _classifier_sql(),
        "embedding_quantize_int8": SQL_QUANTIZE,
        "profile_lineitem": _profile_sql(),
        "event_funnel": _funnel_sql(),
        "retention_cohorts": SQL_RETENTION,
        "bm25_topk_fields": _bm25_fields_sql(),
        "bm25_prf_topk": _prf_sql(),
        "bm25_stemmed_topk": _stemmed_sql(),
        "terms_browse": _terms_browse_sql(),
        "terms_infix": _terms_infix_sql(),
        "facet_source_disjunctive": _facet_or_sql(),
        "field_stats_by_lang": _field_stats_sql(),
        "facet_range_chars": _facet_range_sql(),
        "facet_interval_counts": _facet_interval_sql(),
        "facet_pivot_lang_source": _facet_pivot_sql(),
        "facet_nested_stats": SQL_FACET_NESTED,
        "export_sorted_matches": _export_sql(),
        "significant_terms": _sigterms_sql(),
        "sort_by_field_topk": _sort_by_field_sql(),
        "top_terms_per_lang": SQL_TOP_TERMS_PER_LANG,
        "doc_length_histogram": SQL_DOC_LENGTH_HISTOGRAM,
        "revenue_by_nation": SQL_REVENUE_BY_NATION,
        "user_sessions": SQL_USER_SESSIONS,
        "event_transitions": SQL_EVENT_TRANSITIONS,
        "q3_revenue_join": SQL_Q3_REVENUE_JOIN,
        "q_shipped_within_90d": SQL_SHIPPED_WITHIN_90D,
        "asof_view_before_purchase": SQL_ASOF_VIEW_BEFORE_PURCHASE,
        # formerly rows-only, now oracle-checked
        "bpe_merges": _bpe_merges_sql(),
        "bpe_token_counts": _bpe_token_counts_sql(),
        "incremental_update": _bm25_sql(INC_QUERIES),
        "natural_sort_parts": SQL_NATURAL_SORT_PARTS,
        "simhash_pairs": SQL_SIMHASH_PAIRS,
        "fieldmap_project": SQL_FIELDMAP_PROJECT,
        "fieldmap_avalon": SQL_FIELDMAP_AVALON,
        "fingerprints": SQL_FINGERPRINTS,
        "winnow_fingerprints": _winnow_sql(),
        "embedding_near_dups_exact": SQL_EMBEDDING_NEAR_DUPS_EXACT,
        "marc_records": SQL_MARC_RECORDS,
        "docbuilder_flagship": SQL_DOCBUILDER_FLAGSHIP,
        "embedding_near_dups": _embedding_lsh_sql(),
        "semantic_dedup_keep": _embedding_lsh_sql(final="keep"),
        "jaccard_pairs": _minhash_sql(threshold=0.5, bands=32, final="pairs"),
        "minhash_dedup": _minhash_sql(threshold=0.7, bands=32, final="components"),
        "bm25_snippets": _snippets_sql(),
        "multimodal_features": _multimodal_sql(),
        "video_frame_features": _video_sql(),
        "deterministic_sample": _deterministic_sample_sql(),
        "shuffle_export": _shuffle_export_sql(),
        "domain_mix_sample": _domain_mix_sql(),
        "decontamination_report": _decontamination_sql(),
        "shingle_dup_pairs": _shingle_pairs_sql(),
        "train_val_test_split": _split_sql(),
        "leakage_safe_split": _leak_split_sql(),
        "quality_weighted_sample": _qws_sql(),
        "dsir_weights_lang_en": _dsir_sql(),
        "realtime_get_updated": SQL_REALTIME_GET,
        "temperature_sample_by_source": SQL_TEMPERATURE_SAMPLE,
        "line_dedup_boilerplate": SQL_LINE_DEDUP,
        "intra_doc_line_dedup": SQL_INTRA_DOC_LINE_DEDUP,
        "substring_dedup_rewrite": _substring_dedup_sql(),
        "ccnet_ppl_buckets": _ccnet_buckets_sql(),
        "contrastive_crop_pairs": _crops_sql(),
        "bm25_explain_top3": _explain_sql(),
        "bm25_eval_metrics": _eval_sql(),
        "bm25_hard_negatives": _hard_neg_sql(),
        "hybrid_minmax_topk": _hybrid_minmax_sql(),
        "related_docs_tfidf": _related_sql(),
        "corpus_clean_keep": _corpus_clean_sql(),
        "pii_redaction": _pii_sql(),
        "unigram_quality": SQL_UNIGRAM_QUALITY,
        "bigram_quality": SQL_BIGRAM_QUALITY,
        "text_normalize": SQL_TEXT_NORMALIZE,
        "chunk_docs": SQL_CHUNK_DOCS,
        "pack_sequences": _pack_sql(),
        "c4_filters": SQL_C4_FILTERS,
        "gopher_filters": _gopher_sql(),
        "bigram_top50": SQL_BIGRAM_TOP50,
        "pagerank_top100": _pagerank_sql(),
        "bm25_expand_topk": _expand_sql(),
        "term_vectors_top3": _term_vectors_sql(),
        "rare_terms": SQL_RARE_TERMS,
        "source_unigram_kl": SQL_SOURCE_KL,
        "doc_novelty_stats": _novelty_sql(),
        "events_hourly_ma3": SQL_HOURLY_MA3,
        "value_percentile_ranks": SQL_PCT_RANKS,
        "embedding_alignment_stats": SQL_ALIGNMENT,
        # bpe_token_counts: rows-only by design (iterative encode)
        "minhash_cluster_sizes": _minhash_cluster_sizes_sql(),
        "cheapest_lineitem_per_order": SQL_CHEAPEST_LINEITEM,
        "orders_per_customer_histogram": SQL_ORDERS_PER_CUSTOMER,
        "char_entropy_stats": SQL_CHAR_ENTROPY,
        "bm25_collated_topk": _collate_sql(),
        "rag_context_topk": _rag_sql(),
        "lang_confusion_matrix": SQL_LANG_CONFUSION,
        "viewers_never_purchased": SQL_VIEWERS_NEVER_PURCHASED,
        "time_to_first_purchase": SQL_TIME_TO_FIRST_PURCHASE,
        "zipf_slope": SQL_ZIPF_SLOPE,
        "pmi_top_bigrams": SQL_PMI_BIGRAMS,
        "dup_rate_by_source": SQL_DUP_RATE_BY_SOURCE,
        "q18_large_orders": SQL_Q18_LARGE_ORDERS,
        "part_supplier_variety": SQL_PART_SUPPLIER_VARIETY,
        "embedding_covariance": SQL_EMBEDDING_COVARIANCE,
        "pca_top_component": _pca_sql(),
        "ngram_diversity_by_source": SQL_NGRAM_DIVERSITY,
        "kmeans_clusters": _kmeans_sql(),
        "rollup_revenue": SQL_ROLLUP_REVENUE,
        "q10_returned_items": SQL_Q10_RETURNED_ITEMS,
        "q14_promo_revenue": SQL_Q14_PROMO_REVENUE,
        "q19_bracket_revenue": _q19_sql(),
        "q22_idle_balance": SQL_Q22_IDLE_BALANCE,
        "customer_order_gaps": SQL_CUSTOMER_ORDER_GAPS,
        "cluster_canonical_docs": _cluster_canonical_sql(),
        "embedding_label_outliers": _label_outliers_sql(),
        "doc_ttr_stats": SQL_DOC_TTR_STATS,
        "q5_local_supplier_volume": SQL_Q5_LOCAL_SUPPLIER,
        "q4_order_priority": SQL_Q4_ORDER_PRIORITY,
        "winsorized_value_stats": SQL_WINSORIZED_VALUE_STATS,
        "suggest_topk": _suggest_sql(),
        "incremental_dedup_new_docs": SQL_INCREMENTAL_DEDUP,
        "copurchase_top_pairs": SQL_COPURCHASE_TOP_PAIRS,
        "props_k_stats_by_type": SQL_PROPS_K_STATS,
        "kwic_concordance": SQL_KWIC_CONCORDANCE,
        "label_centroid_similarity": SQL_LABEL_CENTROID_SIM,
        # exactness preserved by candidate verification — same oracle as
        # the broadcast path
        "incremental_dedup_bloom": SQL_INCREMENTAL_DEDUP,
        "es_weighted_sample": SQL_ES_WEIGHTED_SAMPLE,
        "stratified_sample_per_source": SQL_STRATIFIED_SAMPLE,
        "priority_value_chi2": _chi2_sql(),
        "source_lang_concat": SQL_SOURCE_LANG_CONCAT,
        "value_mad_by_type": SQL_VALUE_MAD,
        "doc_pareto_frontier": SQL_DOC_PARETO,
        "token_budget_allocation": SQL_TOKEN_BUDGET,
        "q15_top_supplier": SQL_Q15_TOP_SUPPLIER,
        "q17_small_quantity_revenue": SQL_Q17_SMALL_QUANTITY,
        "q6_forecast_revenue": SQL_Q6_FORECAST,
        "zscore_nchars_by_lang": SQL_ZSCORE_NCHARS,
        "audio_features": _audio_sql(),
        "customer_revenue_gini": SQL_CUSTOMER_REVENUE_GINI,
        "benford_totalprice": SQL_BENFORD,
        "ab_conversion_ztest": SQL_AB_ZTEST,
        "event_session_ids": SQL_EVENT_SESSION_IDS,
        "skipgram_pmi_top20": SQL_SKIPGRAM_PMI,
        "supplier_balance_pctrank": SQL_SUPPLIER_PCTRANK,
        "term_burstiness_top20": SQL_TERM_BURSTINESS,
        "label_silhouette": SQL_LABEL_SILHOUETTE,
        "q7_volume_shipping": SQL_Q7_VOLUME_SHIPPING,
        "q8_market_share": SQL_Q8_MARKET_SHARE,
        "q9_profit_by_nation_year": SQL_Q9_PROFIT,
        "q2_min_cost_supplier": SQL_Q2_MIN_COST_SUPPLIER,
        "q11_important_parts": SQL_Q11_IMPORTANT_PARTS,
        "q21_waiting_suppliers": SQL_Q21_WAITING_SUPPLIERS,
        "q12_priority_by_delay": SQL_Q12_PRIORITY_BY_DELAY,
        # same oracle as bm25_topk: reshard is a pure layout change
        "bm25_topk_resharded": _bm25_sql(),
        "value_trend_by_type": SQL_VALUE_TREND,
        "event_dedup_rate": SQL_EVENT_DEDUP_RATE,
        "rolling_7d_active_users": SQL_ROLLING_DAU,
        "churn_training_table": SQL_CHURN_TABLE,
        "q20_dominant_suppliers": SQL_Q20_DOMINANT_SUPPLIERS,
        # global-stats federation reproduces the single-index oracle exactly
        "bm25_topk_federated": _bm25_sql(),
        "events_anomaly_zscore": SQL_EVENTS_ANOMALY,
        "orders_monthly_growth": SQL_MONTHLY_GROWTH,
        # disjoint members sum to the single-index facet oracle
        "facet_lang_federated": _facet_sql(),
        "lmd_topk": _lmd_sql(),
        "corpus_version_diff": SQL_CORPUS_DIFF,
        "bm25_querystring_topk": _querystring_sql(),
        "events_dow_hour_heatmap": SQL_DOW_HOUR_HEATMAP,
        # federation with merged cf/total_len reproduces the single-index
        # LM-Dirichlet oracle exactly
        "lmd_topk_federated": _lmd_sql(),
        "session_conversion_rate": _session_conversion_sql(),
    }

