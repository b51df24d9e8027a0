"""Dedup / text-quality / sampling / curation oracles (split from queries.py; see that module for the facade)."""

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


def term_tf_top100(sf_dir: str):
    ds = _docs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, docs, tfs, _dls = batch_term_doc_tf(
            df["doc_id"].to_numpy(), df["text"].to_numpy()
        )
        out = pd.DataFrame({"term": terms, "tf": tfs})
        return out.groupby("term", as_index=False)["tf"].sum()

    from ...state.aggregates import tree_aggregate

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

    from ...state.aggregates import tree_aggregate

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

    from ...state.aggregates import tree_aggregate

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

        from ...functions.tokenize import _flat_tokens_arrow

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
    from ..textstats import repetition_batch

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


# feature-hashed linear classifier scoring (fastText/VW inference shape):
# deterministic surrogate weights make the whole inference pass integer-
# exact and therefore hash-checkable in SQL — the "model scoring" template
# with an actual oracle instead of a rows-only check.
CLS_BUCKETS = 65536


CLS_BIAS = 0.1


def classifier_quality_scores(sf_dir: str) -> pd.DataFrame:
    from ..curation import classifier_scores

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
    from ...functions.tokenize import batch_term_doc_tf
    from ...index.build import termstats_dir
    from ...index.segments import read_stats

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
    from ..curation import dsir_weights

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
    from ..curation import temperature_sample

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
    from ..curation import line_dedup

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
    from ..curation import intra_doc_line_dedup

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
    from ..curation import substring_span_dedup

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
    from ..curation import contrastive_crops

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
    from ..curation import ccnet_ppl_buckets

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
    from ..curation import _hash_u64_vec

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
    from ...index.build import termstats_dir
    from ...index.segments import read_stats
    from ..textstats import tfidf_keywords

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


# Solr {!graph from= to= maxDepth=N}: expand a seed match set along an
# edge relation. The corpus has no explicit ref hierarchy, so the entry
# derives a deterministic containment tree on BOTH sides:
# parent(doc) = doc_id // 10 (docs < 10 are roots). Seeds are the
# conjunctive boolean match set of GRAPH_SEED_QUERY; traversal walks
# child -> parent (ancestor closure) for GRAPH_MAX_DEPTH hops.
GRAPH_SEED_QUERY = "data stream"


GRAPH_MAX_DEPTH = 3


def graph_expand_matches(sf_dir: str) -> pd.DataFrame:
    from ...index.query import get_pool
    from ..components import graph_traverse

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

    from ...state.aggregates import tree_aggregate

    return tree_aggregate(ds, ["bin_lo"], partial, {"n_docs": "sum"})


SQL_DOC_LENGTH_HISTOGRAM = f"""
SELECT (n_tokens // 50) * 50 AS bin_lo, CAST(count(*) AS BIGINT) AS n_docs
FROM (SELECT CAST(len(list_filter({TOK_SQL}, x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents)
GROUP BY 1
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
    from ..sketches import cms_build, cms_query

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


def jaccard_pairs(sf_dir: str):
    """n-gram Jaccard near-dup pairs: minhash-LSH candidates verified with
    exact 3-gram shingle Jaccard (the standalone verifier entry).
    ORACLE-CHECKABLE: md5 shingle hashes + seeded permutation constants +
    FNV band mix are all SQL-reproducible (``_minhash_sql``)."""
    from ..dedup import minhash_pairs

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
    from ..dedup import _perm_params

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


def fingerprints_docs(sf_dir: str):
    """Rolling FNV-1a document fingerprints. ORACLE-CHECKABLE: FNV-1a over
    the token stream == FNV-1a over the space-joined normalized text (each
    token's bytes then a 0x20 separator), which SQL reproduces byte-for-byte
    with a list_reduce in HUGEINT mod-2^64 arithmetic."""
    from ..textstats import fingerprint_batch

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
    from ..textstats import winnow_fingerprints

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


def multimodal_features(sf_dir: str):
    """Actor-pool PNG decode → 16-dim features over the deterministic media
    corpus. ORACLE-CHECKABLE: the oracle recomputes the features from the
    RAW pixel stream (before any PNG encode), so the driver's hash compare
    verifies the encode→decode→summarize round trip end-to-end. The feature
    vector flattens to f00..f15 scalar columns (rounded 6 dp) so the value
    hash covers it."""
    from ..multimodal import extract_image_features, synthesize_media_table

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
    from ...functions.png import encode_png
    from ..multimodal import ImageFeatureStage, _pixel_summary, media_pixel_stream

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
    from ..multimodal import extract_video_features, synthesize_video_table

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
    from ...functions.avi import encode_avi_mjpeg
    from ...functions.jpeg import decode_jpeg, encode_jpeg
    from ..multimodal import VideoFrameStage, _pixel_summary

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
    from ..curation import hash_sample

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
    from ..bpe import learn_bpe, word_counts

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
    from ..curation import deterministic_shuffle

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
    from ..curation import stratified_sample

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


# corpus-wide exact shared-substring pairs (Lee et al. exact-substring
# duplication signal at shingle granularity)
_SHPAIR_W = 5


def shingle_dup_pairs(sf_dir: str):
    from ..dedup import shingle_pairs

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
    from ..curation import split_assign

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

    from ..curation import split_assign
    from ..dedup import minhash_dedup

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
    from ..curation import corpus_clean

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
    from ..textstats import redact_pii_batch

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
    from ..textstats import PII_PATTERNS

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
    from ..textstats import unigram_logprob

    return unigram_logprob(_docs(sf_dir))


def c4_filters(sf_dir: str):
    """C4-style heuristic cleaning signals + keep flag (see
    textstats.c4_signals_batch for the exact contract)."""
    from ..textstats import c4_signals_batch

    return _docs(sf_dir).map_batches(c4_signals_batch, batch_format="pyarrow")


def gopher_filters(sf_dir: str):
    """Gopher quality rules (Rae et al. 2021 subset): word-count bounds,
    mean-word-length bounds, symbol ratio, alpha-word fraction, distinct
    stopword floor — one stateless vectorized pass, every signal + the keep
    flag hash-checked."""
    from ..textstats import gopher_quality_batch

    return _docs(sf_dir).map_batches(gopher_quality_batch,
                                     batch_format="pyarrow")


def _gopher_sql() -> str:
    from ..textstats import (
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
    from ..textstats import normalize_text_batch

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
    from ...state.aggregates import tree_aggregate
    from ..textstats import bigram_partial

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
    from ..textstats import bigram_logprob

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
    from ..packing import pack_sequences as _pack

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


def field_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    from ...state.aggregates import tree_aggregate

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


def export_sorted_matches(sf_dir: str):
    """Solr /export handler analog: the ENTIRE match set of a boolean query
    streamed in a total sort order (n_chars desc, doc_id asc), each row
    carrying its global export position. Shape: shard-local boolean
    retrieval → id-pruned doc-table read → ONE global sort (the all-to-all
    any sorted export pays) + the row-number scan; nothing else touches
    the driver."""
    from ...state.scan import ordered_row_number

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

    from ...state.aggregates import tree_aggregate

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
    from ..curation import doc_novelty

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


def bpe_token_counts_docs(sf_dir: str) -> pd.DataFrame:
    from ..bpe import bpe_token_counts, learn_bpe, word_counts

    docs = _docs(sf_dir)
    wc = word_counts(docs.select_columns(["text"]))
    merges = learn_bpe(wc, n_merges=40, min_freq=2)
    out = bpe_token_counts(docs, merges).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


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

    from ...state.aggregates import tree_aggregate

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
    from ...state.aggregates import tree_aggregate
    from ..textstats import bigram_partial

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


def dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..dedup import md5_hex

        out = pd.DataFrame({
            "source": df["source"].to_numpy(),
            "h": md5_hex(df["text"].to_numpy()),
        })
        g = out.groupby(["source", "h"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": np.int64})

    from ...state.aggregates import tree_aggregate

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


def ngram_diversity_by_source(sf_dir: str) -> pd.DataFrame:
    from ...functions.tokenize import tokenize_text

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


def cluster_canonical_docs(sf_dir: str) -> pd.DataFrame:
    from ..joins import hash_join

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
    from ..dedup import md5_hex

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


def source_lang_concat(sf_dir: str) -> pd.DataFrame:
    from ...state.aggregates import tree_aggregate

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


def zscore_nchars_by_lang(sf_dir: str):
    from ...state.aggregates import tree_aggregate

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
    from ..multimodal import AudioFeatureStage, synthesize_audio_table

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
    from ..multimodal import (
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
    from ...functions.tokenize import _flat_tokens_arrow
    from ...state.aggregates import tree_aggregate

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
# Term burstiness (Church–Gale dispersion): variance-to-mean ratio of a
# term's per-doc tf over ALL docs (zeros included — they ride free through
# the sufficient statistics: only Σtf and Σtf² over PRESENT docs move, N
# comes from metadata). VMR ≈ 1 means Poisson scatter; ≫ 1 means the term
# "bursts" in few docs — a topicality signal.
# ---------------------------------------------------------------------------

BURST_TOPN = 20


def term_burstiness_top20(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    from ...state.aggregates import tree_aggregate

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
    from ...state.aggregates import tree_aggregate

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


__all__ = [
    'AUDIO_N',
    'BIGRAM_TOP_K',
    'BPE_ENCODE_UNROLL',
    'BPE_MIN_FREQ',
    'BPE_N_MERGES',
    'BURST_TOPN',
    'CHUNK_OVERLAP',
    'CHUNK_TOKENS',
    'CLS_BIAS',
    'CLS_BUCKETS',
    'CMS_D',
    'CMS_TERMS',
    'CMS_W',
    'DIFF_CLONE',
    'DIFF_CLONE_OFFSET',
    'DIFF_DROP',
    'DIFF_EDIT',
    'ES_SAMPLE_N',
    'GRAPH_MAX_DEPTH',
    'GRAPH_SEED_QUERY',
    'PAGERANK_A',
    'PAGERANK_B',
    'PAGERANK_C',
    'PAGERANK_D',
    'PAGERANK_ITERS',
    'PAGERANK_OUT',
    'PAGERANK_TOPN',
    'PMI_MIN_N',
    'PMI_TOP',
    'QWS_SALT',
    'RELATED_K',
    'RELATED_SRC_DOCS',
    'SEQ_LEN',
    'SKIPGRAM_MIN_N',
    'SKIPGRAM_TOPN',
    'SKIPGRAM_WINDOW',
    'SQL_BIGRAM_QUALITY',
    'SQL_BIGRAM_TOP50',
    'SQL_C4_FILTERS',
    'SQL_CHAR_ENTROPY',
    'SQL_CHUNK_DOCS',
    'SQL_CORPUS_DIFF',
    'SQL_DOC_LENGTH_HISTOGRAM',
    'SQL_DOC_PARETO',
    'SQL_DOC_TOKEN_COUNTS',
    'SQL_DOC_TTR_STATS',
    'SQL_DUP_RATE_BY_SOURCE',
    'SQL_ES_WEIGHTED_SAMPLE',
    'SQL_EXACT_DEDUP',
    'SQL_FINGERPRINTS',
    'SQL_INTRA_DOC_LINE_DEDUP',
    'SQL_LANG_CONFUSION',
    'SQL_LANG_ID',
    'SQL_LANG_SOURCE_STATS',
    'SQL_LINE_DEDUP',
    'SQL_NGRAM_DIVERSITY',
    'SQL_PMI_BIGRAMS',
    'SQL_QUALITY_STATS',
    'SQL_REPETITION_STATS',
    'SQL_SIMHASH_PAIRS',
    'SQL_SKIPGRAM_PMI',
    'SQL_SOURCE_KL',
    'SQL_SOURCE_LANG_CONCAT',
    'SQL_STRATIFIED_SAMPLE',
    'SQL_TEMPERATURE_SAMPLE',
    'SQL_TERM_BURSTINESS',
    'SQL_TERM_DF_TOP100',
    'SQL_TERM_TF_TOP100',
    'SQL_TEXT_NORMALIZE',
    'SQL_UNIGRAM_QUALITY',
    'SQL_ZIPF_SLOPE',
    'SQL_ZSCORE_NCHARS',
    'STRAT_N',
    'TFIDF_K',
    'TV_K',
    'TV_QUERY',
    '_CHUNK_STRIDE',
    '_CROP_L',
    '_CROP_SALT',
    '_DSIR_BUCKETS',
    '_LEAK_SALT',
    '_MIX_DEFAULT',
    '_MIX_RATES',
    '_MIX_SALT',
    '_NOV_K',
    '_SAMPLE_P',
    '_SAMPLE_SALT',
    '_SHPAIR_W',
    '_SHUFFLE_SEED',
    '_SPLIT_SALT',
    '_SPLIT_WEIGHTS',
    '_SSD_K',
    '_SSD_MIN_DF',
    '_STOP_SQL',
    '_WINNOW_K',
    '_WINNOW_W',
    '_audio_sql',
    '_bpe_merges_sql',
    '_bpe_merges_union',
    '_bpe_state_rebuild',
    '_bpe_token_counts_sql',
    '_bpe_train_ctes',
    '_ccnet_buckets_sql',
    '_classifier_sql',
    '_cluster_canonical_sql',
    '_cms_sql',
    '_corpus_clean_sql',
    '_crops_sql',
    '_deterministic_sample_sql',
    '_domain_mix_sql',
    '_dsir_sql',
    '_export_sql',
    '_field_stats_sql',
    '_frontier_final',
    '_gopher_sql',
    '_graph_sql',
    '_hash_sql',
    '_hits_sql',
    '_idf_lookup',
    '_leak_split_sql',
    '_minhash_cluster_sizes_sql',
    '_minhash_cte',
    '_minhash_sql',
    '_multimodal_sql',
    '_novelty_sql',
    '_pack_sql',
    '_pagerank_sql',
    '_pii_sql',
    '_qws_sql',
    '_related_sql',
    '_shingle_pairs_sql',
    '_shuffle_export_sql',
    '_split_sql',
    '_substring_dedup_sql',
    '_term_vectors_sql',
    '_tfidf_sql',
    '_video_sql',
    '_winnow_sql',
    'audio_features',
    'bigram_quality',
    'bigram_top50',
    'bpe_merges',
    'bpe_token_counts_docs',
    'c4_filters',
    'ccnet_ppl_buckets_by_lang',
    'char_entropy_stats',
    'chunk_docs',
    'classifier_quality_scores',
    'cluster_canonical_docs',
    'cms_term_counts',
    'contrastive_crop_pairs',
    'corpus_clean_keep',
    'corpus_version_diff',
    'deterministic_sample',
    'doc_length_histogram',
    'doc_novelty_stats',
    'doc_pareto_frontier',
    'doc_token_counts',
    'doc_ttr_stats',
    'domain_mix_sample',
    'dsir_weights_lang_en',
    'dup_rate_by_source',
    'es_weighted_sample',
    'exact_dedup_docs',
    'export_sorted_matches',
    'field_stats_by_lang',
    'fingerprints_docs',
    'gopher_filters',
    'graph_expand_matches',
    'intra_doc_line_dedup_docs',
    'jaccard_pairs',
    'lang_confusion_matrix',
    'lang_id_docs',
    'lang_source_stats',
    'leakage_safe_split',
    'line_dedup_boilerplate',
    'minhash_cluster_sizes',
    'minhash_dedup_docs',
    'multimodal_features',
    'ngram_diversity_by_source',
    'pack_sequences',
    'pagerank_top100',
    'pii_redaction',
    'pmi_top_bigrams',
    'quality_stats',
    'quality_weighted_sample',
    'related_docs_tfidf',
    'repetition_stats',
    'shingle_dup_pairs',
    'shuffle_export',
    'simhash_pairs_docs',
    'skipgram_pmi_top20',
    'source_lang_concat',
    'source_unigram_kl',
    'stratified_sample_per_source',
    'substring_dedup_rewrite',
    'temperature_sample_by_source',
    'term_burstiness_top20',
    'term_df_top100',
    'term_tf_top100',
    'term_vectors_top3',
    'text_normalize',
    'tfidf_keywords_top3',
    'train_val_test_split',
    'unigram_quality',
    'video_frame_features',
    'winnow_fingerprints_docs',
    'zipf_slope',
    'zscore_nchars_by_lang',
]
