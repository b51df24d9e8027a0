"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All deterministic, all vectorized-per-batch, all
defined so a DuckDB oracle can reproduce them where SQL allows."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.tokenize import TOKEN_RE, tokenize_text

# stopword profiles for the n-gram-free language heuristic (deterministic,
# SQL-reproducible: counts of profile words, argmax with fixed tie order)
LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "en", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "eine", "mit", "zu"),
}
LANG_ORDER = ("en", "fr", "de")  # tie-break priority

STOPWORDS_EN = frozenset(LANG_PROFILES["en"])

_PUNCT_RE = re.compile(r"[^\w\s]")
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_ISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def lang_id_batch(batch, text_col: str = "text"):
    """Adds pred_lang: argmax profile-hit count, ties broken en > fr > de,
    'und' (undetermined) when zero hits.

    Arrow-native (zero-copy batch in, appended columns out); also accepts a
    pandas frame (direct/test callers) and answers in kind."""
    import pyarrow as pa

    from ..functions.tokenize import _flat_tokens_arrow

    is_pandas = isinstance(batch, pd.DataFrame)
    texts = batch[text_col].tolist() if is_pandas else batch[text_col].to_pylist()
    n = len(texts)
    doc_ord, codes, vocab = _flat_tokens_arrow(texts)
    vocab_np = np.asarray(vocab.to_pylist(), dtype=object)
    counts = {}
    for lang, words in LANG_PROFILES.items():
        mask = np.isin(vocab_np, list(words))
        counts[lang] = np.bincount(doc_ord[mask[codes]], minlength=n).astype(np.int64)
    best = np.full(n, "und", dtype=object)
    best_count = np.zeros(n, dtype=np.int64)
    for lang in LANG_ORDER:
        c = counts[lang]
        better = c > best_count
        best[better] = lang
        best_count[better] = c[better]
    if is_pandas:
        out = batch.copy()
        out["pred_lang"] = best
        for lang in LANG_ORDER:
            out[f"hits_{lang}"] = counts[lang]
        return out
    out = batch.append_column("pred_lang", pa.array(best, pa.string()))
    for lang in LANG_ORDER:
        out = out.append_column(f"hits_{lang}", pa.array(counts[lang]))
    return out


def quality_batch(batch, text_col: str = "text"):
    """Quality-scoring features per doc: token count, mean token length,
    stopword ratio, punctuation ratio, alpha ratio — the usual pre-training
    quality filters, defined with integer counts so oracles match exactly.
    Arrow-native; also accepts a pandas frame and answers in kind."""
    import pyarrow as pa

    is_pandas = isinstance(batch, pd.DataFrame)
    texts = batch[text_col].tolist() if is_pandas else batch[text_col].to_pylist()
    doc_ids = (
        batch["doc_id"].to_numpy()
        if is_pandas else batch["doc_id"].to_numpy(zero_copy_only=False)
    )
    toks_list = [TOKEN_RE.findall(t.lower()) for t in texts]
    cols = {
        "doc_id": doc_ids,
        "n_tokens": np.array([len(t) for t in toks_list], dtype=np.int64),
        "n_stopwords": np.array(
            [sum(t in STOPWORDS_EN for t in toks) for toks in toks_list],
            dtype=np.int64,
        ),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        "n_punct": np.array([len(_PUNCT_RE.findall(t)) for t in texts], dtype=np.int64),
        "n_alpha": np.array(
            [sum(c.isalpha() for c in t) for t in texts], dtype=np.int64
        ),
        "tok_chars": np.array(
            [sum(len(w) for w in toks) for toks in toks_list], dtype=np.int64
        ),
    }
    return pd.DataFrame(cols) if is_pandas else pa.table(cols)


def repetition_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Gopher-style repetition signals per doc, as INTEGER counts so the
    DuckDB oracle matches exactly (callers derive the fractions):

    - n_lines / n_dup_lines: non-empty space-trimmed lines and how many are
      repeats of an earlier line (duplicate-line fraction filter);
    - n_tokens / top_token_n: occurrences of the most frequent token
      (most-common-word fraction filter);
    - n_bigrams / top_bigram_n: occurrences of the most frequent adjacent
      token pair (top-2-gram fraction filter).

    Trim contract: lines are split on \\n and stripped of SPACES only —
    DuckDB ``trim``'s default character set.

    Arrow-native; also accepts a pandas frame and answers in kind."""
    import pyarrow as pa

    from ..functions.tokenize import _flat_tokens_arrow

    is_pandas = isinstance(df, pd.DataFrame)
    texts = df[text_col].tolist() if is_pandas else df[text_col].to_pylist()
    n = len(texts)
    n_lines = np.zeros(n, dtype=np.int64)
    n_dup = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        lines = [ln.strip(" ") for ln in t.split("\n")]
        lines = [ln for ln in lines if ln]
        n_lines[i] = len(lines)
        n_dup[i] = len(lines) - len(set(lines))
    # token + bigram stats vectorized over the whole batch: one Arrow
    # tokenize, then int-code keyed uniques (a bigram is the int pair
    # code[i]*V + code[i+1] within a doc — string concat never happens)
    doc_ord, codes, vocab = _flat_tokens_arrow(texts)
    n_tok = np.bincount(doc_ord, minlength=n).astype(np.int64)
    top_tok = np.zeros(n, dtype=np.int64)
    n_big = np.zeros(n, dtype=np.int64)
    top_big = np.zeros(n, dtype=np.int64)
    if len(codes):
        V = np.int64(len(vocab))
        key = doc_ord * V + codes
        uk, tf = np.unique(key, return_counts=True)
        np.maximum.at(top_tok, uk // V, tf)
        same_doc = doc_ord[:-1] == doc_ord[1:]
        if same_doc.any():
            d2 = doc_ord[:-1][same_doc]
            bg = codes[:-1][same_doc] * V + codes[1:][same_doc]
            n_big = np.bincount(d2, minlength=n).astype(np.int64)
            # (doc, bigram) counts: lexsort-free via unique on the pair key
            pk = d2 * (V * V) + bg
            upk, bf = np.unique(pk, return_counts=True)
            np.maximum.at(top_big, (upk // (V * V)).astype(np.int64), bf)
    cols = {
        "doc_id": df["doc_id"].to_numpy()
        if is_pandas else df["doc_id"].to_numpy(zero_copy_only=False),
        "n_lines": n_lines,
        "n_dup_lines": n_dup,
        "n_tokens": n_tok,
        "top_token_n": top_tok,
        "n_bigrams": n_big,
        "top_bigram_n": top_big,
    }
    return pd.DataFrame(cols) if is_pandas else pa.table(cols)


_TERMINAL = (".", "!", "?", '"')


def _texts_ids(batch, text_col: str, id_col: str = "doc_id"):
    """Dual-mode batch I/O: (is_pandas, texts list, doc_id ndarray). Every
    kernel below is Arrow-native at the Ray boundary (zero-copy blocks in,
    ``pa.table`` out) and still answers pandas in kind for direct/test
    callers — the lang_id_batch pattern."""
    if isinstance(batch, pd.DataFrame):
        return True, list(batch[text_col]), batch[id_col].to_numpy()
    return (False, batch[text_col].to_pylist(),
            batch[id_col].to_numpy(zero_copy_only=False))


def _wrap(is_pandas: bool, cols: dict):
    import pyarrow as pa

    return pd.DataFrame(cols) if is_pandas else pa.table(cols)


def c4_signals_batch(df, text_col: str = "text"):
    """C4-style heuristic cleaning signals per doc (integer/boolean so the
    DuckDB oracle matches exactly): non-empty line count, lines ending in
    terminal punctuation, short lines (< 3 whitespace words), curly-brace
    presence (code detector), 'lorem ipsum' presence, and the composed
    ``c4_keep`` flag (no brace, no lorem, at least one line).

    Line contract identical to ``repetition_batch``: split on \\n, strip
    SPACES only (DuckDB ``trim`` default)."""
    is_pandas, texts, doc_ids = _texts_ids(df, text_col)
    n_lines = np.zeros(len(texts), dtype=np.int64)
    n_term = np.zeros(len(texts), dtype=np.int64)
    n_short = np.zeros(len(texts), dtype=np.int64)
    has_brace = np.zeros(len(texts), dtype=bool)
    has_lorem = np.zeros(len(texts), dtype=bool)
    for i, t in enumerate(texts):
        lines = [ln for ln in (x.strip(" ") for x in t.split("\n")) if ln]
        n_lines[i] = len(lines)
        n_term[i] = sum(ln.endswith(_TERMINAL) for ln in lines)
        n_short[i] = sum(len(ln.split()) < 3 for ln in lines)
        has_brace[i] = "{" in t
        has_lorem[i] = "lorem ipsum" in t.lower()
    return _wrap(is_pandas, {
        "doc_id": doc_ids,
        "n_lines": n_lines,
        "n_terminal_lines": n_term,
        "n_short_lines": n_short,
        "has_brace": has_brace,
        "has_lorem": has_lorem,
        "c4_keep": (~has_brace) & (~has_lorem) & (n_lines > 0),
    })


def token_count_batch(df, text_col: str = "text"):
    """Whitespace token count + BPE-ish piece count per doc."""
    is_pandas, texts, doc_ids = _texts_ids(df, text_col)
    return _wrap(is_pandas, {
        "doc_id": doc_ids,
        "ws_tokens": np.array([len(t.split()) for t in texts], dtype=np.int64),
        "bpe_ish_tokens": np.array(
            [len(BPE_ISH_RE.findall(t)) for t in texts], dtype=np.int64
        ),
    })


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)


# ---------------------------------------------------------------------------
# PII redaction: the standard pre-training scrub (emails, phone numbers,
# IPv4, SSN-shaped ids) with fixed placeholder tokens. Patterns are chosen
# to be regexp_replace-reproducible in DuckDB (RE2 syntax, no lookaround),
# so the whole scrub is oracle-checkable.
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("<SSN>", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("<PHONE>", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)
_PII_COMPILED = tuple((tag, re.compile(pat)) for tag, pat in PII_PATTERNS)


def redact_pii_batch(df, text_col: str = "text"):
    """(doc_id, redacted, n_redactions): placeholder substitution applied in
    PII_PATTERNS order (order matters: an SSN-shaped string inside an email
    must already be gone). Counts = total replacements across patterns."""
    is_pandas, texts, doc_ids = _texts_ids(df, text_col)
    out_text = []
    n_red = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        total = 0
        for tag, rx in _PII_COMPILED:
            t, k = rx.subn(tag, t)
            total += k
        out_text.append(t)
        n_red[i] = total
    return _wrap(is_pandas, {
        "doc_id": doc_ids,
        "redacted": out_text,
        "n_redactions": n_red,
    })


# ---------------------------------------------------------------------------
# Text normalization: unicode NFC + control-char strip + ASCII-whitespace
# collapse — the canonical pre-tokenization cleanup pass. The whitespace
# class is pinned to ASCII ([ \t\n\r\f\v]) on BOTH sides so python-re and
# RE2 (DuckDB regexp_replace) agree; \s would disagree on unicode spaces.
# ---------------------------------------------------------------------------

_CTRL_RE = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


def normalize_text_batch(df, text_col: str = "text"):
    import unicodedata

    is_pandas, texts, doc_ids = _texts_ids(df, text_col)
    out_text = []
    for t in texts:
        t = unicodedata.normalize("NFC", t)
        t = _CTRL_RE.sub("", t)
        t = _WS_RE.sub(" ", t).strip(" ")
        out_text.append(t)
    return _wrap(is_pandas, {
        "doc_id": doc_ids,
        "normalized": out_text,
        "n_chars_norm": np.fromiter(
            (len(t) for t in out_text), dtype=np.int64, count=len(out_text)
        ),
    })


def bigram_partial(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-batch partial counts of adjacent token pairs — the n-gram
    analogue of the term_tf partial, feeding tree_aggregate."""
    counts: dict[str, int] = {}
    for t in df[text_col]:
        toks = tokenize_text(t)
        for a, b in zip(toks, toks[1:]):
            g = a + " " + b
            counts[g] = counts.get(g, 0) + 1
    return pd.DataFrame(
        {"bigram": list(counts.keys()),
         "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts))}
    )


# ---------------------------------------------------------------------------
# Unigram language-model scoring: the classic perplexity-proxy quality
# filter (KenLM stand-in) — train a smoothed unigram model ON the corpus,
# score every doc by its mean token log-probability. Both phases are
# SQL-reproducible (counts + ln), so the whole scorer is oracle-checkable.
# ---------------------------------------------------------------------------


def unigram_model(ds, text_col: str = "text"):
    """Distributed corpus pass -> (sorted term array, logp array, total,
    vocab). Counts via tree_aggregate partials (vocab-sized result on the
    driver — the model IS the broadcast side); add-1 smoothing:
    p(t) = (cf(t) + 1) / (total + |V|)."""
    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in df[text_col]:
            for tok in tokenize_text(t):
                counts[tok] = counts.get(tok, 0) + 1
        return pd.DataFrame(
            {"term": list(counts.keys()),
             "cf": np.fromiter(counts.values(), dtype=np.int64, count=len(counts))}
        )

    model = tree_aggregate(ds, ["term"], partial, {"cf": "sum"}).to_pandas()
    model = model.sort_values("term", ignore_index=True)
    terms = model["term"].to_numpy(object)
    cf = model["cf"].to_numpy(np.int64)
    total = int(cf.sum())
    vocab = len(terms)
    logp = np.log((cf + 1.0) / (total + float(vocab)))
    return terms, logp, total, vocab


def unigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id"):
    """-> Dataset (doc_id, n_tokens, avg_logprob): mean ln p(token) under
    the corpus's own smoothed unigram model (0.0 for empty docs). The model
    broadcasts once (ray.put); lookups are vectorized searchsorted."""
    import ray

    terms, logp, _total, _vocab = unigram_model(ds, text_col)
    model_ref = ray.put((terms, logp))

    def score(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        ts, lp = ray.get(model_ref)
        texts = t[text_col].to_pylist()
        n = np.zeros(len(texts), dtype=np.int64)
        s = np.zeros(len(texts), dtype=np.float64)
        for i, x in enumerate(texts):
            toks = tokenize_text(x)
            n[i] = len(toks)
            if toks:
                idx = np.searchsorted(ts, np.asarray(toks, dtype=object))
                s[i] = lp[idx].sum()
        avg = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        return pa.table({
            "doc_id": t[id_col],
            "n_tokens": pa.array(n),
            "avg_logprob": pa.array(np.round(avg, 6)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


_FP_MASK = 0xFFFFFFFFFFFFFFFF


def fingerprint64(text: str) -> int:
    """Deterministic rolling (FNV-1a over token stream) document fingerprint.

    Identity used everywhere (incl. the SQL oracle): hashing each token's
    bytes followed by a 0x20 separator == hashing the bytes of
    ``" ".join(tokens) + " "`` (empty token stream hashes to the offset).
    """
    stream = " ".join(tokenize_text(text))
    h = int(_FP_OFF)
    base = int(_FP_BASE)
    if stream:
        for b in (stream + " ").encode():
            h = ((h ^ b) * base) & _FP_MASK
    return h


def _fingerprint_vec(texts) -> np.ndarray:
    """FNV-1a fingerprints vectorized ACROSS documents: the recurrence
    h = (h ^ byte) * prime is inherently sequential per doc, so the loop
    runs over byte POSITIONS while each step is a numpy gather over the
    docs still active at that position (uint64 wrap is numpy's native
    array overflow behavior).

    Docs are sorted by stream length descending so the active set is a
    shrinking PREFIX: total work and memory are O(total bytes), not
    O(n_docs × longest_doc) — one 10 MB outlier in a 1k-doc batch must not
    inflate a padded matrix to gigabytes."""
    streams = []
    for t in texts:
        s = " ".join(tokenize_text(t))
        streams.append((s + " ").encode() if s else b"")
    n = len(streams)
    lens = np.fromiter((len(s) for s in streams), dtype=np.int64, count=n)
    h = np.full(n, int(_FP_OFF), dtype=np.uint64)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return h
    order = np.argsort(-lens, kind="stable")
    lens_d = lens[order]
    buf = np.frombuffer(b"".join(streams[i] for i in order), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens_d[:-1])])
    # active-doc count per position: docs with len > i, precomputed from a
    # length histogram (lens_d is non-increasing, so they form a prefix)
    hist = np.bincount(lens_d, minlength=maxlen + 1)
    n_le = np.cumsum(hist)  # docs with len <= i
    base = np.uint64(int(_FP_BASE))
    hs = h[order].copy()
    for i in range(maxlen):
        k = n - int(n_le[i])
        if k == 0:
            break
        col = buf[starts[:k] + i].astype(np.uint64)
        hs[:k] = (hs[:k] ^ col) * base
    h[order] = hs
    return h


def fingerprint_batch(df, text_col: str = "text"):
    is_pandas, texts, doc_ids = _texts_ids(df, text_col)
    fp = _fingerprint_vec(texts)
    return _wrap(is_pandas, {
        "doc_id": doc_ids,
        # fp - 2^63 ≡ fp + 2^63 (mod 2^64); the bit-reinterpretation as
        # int64 equals the python-int subtraction the oracle mirrors
        "fingerprint": (fp + np.uint64(1 << 63)).view(np.int64),
    })


def tfidf_keywords(ds, vocab: "np.ndarray", dfs: "np.ndarray", n_docs: int,
                   k: int = 3, id_col: str = "doc_id", text_col: str = "text",
                   round_dp: int = 6):
    """Per-document keyword extraction: each doc's top-``k`` terms by
    tf-idf, idf = ln((N+1)/(df+1)), ties by (score desc, term asc) on
    ``round_dp``-rounded scores (reproducible by an external oracle).

    ``vocab`` (sorted term array) and ``dfs`` are the corpus document
    frequencies — vocabulary-sized, orders of magnitude smaller than the
    corpus, so they broadcast ONCE (``ray.put``) and every batch does one
    tokenize + searchsorted + lexsort; the corpus itself never shuffles.
    -> Dataset (doc_id, rank, term, tfidf)."""
    import ray

    from ..functions.tokenize import batch_term_doc_tf

    idf = np.log((float(n_docs) + 1.0) / (dfs.astype(np.float64) + 1.0))
    vocab_ref = ray.put(np.asarray(vocab, dtype=object))
    idf_ref = ray.put(idf)

    def batch(tb: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tfidf": pa.array([], pa.float64()),
        })
        if tb.num_rows == 0:
            return empty
        voc = ray.get(vocab_ref)
        idfs = ray.get(idf_ref)
        terms, doc_ids, tfs, _ = batch_term_doc_tf(
            tb[id_col].to_numpy(zero_copy_only=False),
            np.asarray(tb[text_col].to_pylist(), dtype=object),
        )
        if len(terms) == 0:
            return empty
        pos = np.clip(np.searchsorted(voc, terms), 0, len(voc) - 1)
        in_vocab = voc[pos] == terms
        terms, doc_ids, tfs, pos = (
            terms[in_vocab], doc_ids[in_vocab], tfs[in_vocab], pos[in_vocab]
        )
        if len(terms) == 0:
            return empty
        score = np.round(tfs.astype(np.float64) * idfs[pos], round_dp)
        # per-doc top-k: one lexsort by (doc, -score, term), then a
        # vectorized within-group ordinal via group-start offsets
        order = np.lexsort((terms, -score, doc_ids))
        d, s, t = doc_ids[order], score[order], terms[order]
        starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
        ordinal = np.arange(len(d)) - np.repeat(starts, np.diff(np.r_[starts, len(d)]))
        keep = ordinal < k
        return pa.table({
            "doc_id": pa.array(d[keep].astype(np.int64)),
            "rank": pa.array((ordinal[keep] + 1).astype(np.int64)),
            "term": pa.array(t[keep], pa.string()),
            "tfidf": pa.array(s[keep].astype(np.float64)),
        })

    return ds.map_batches(batch, batch_format="pyarrow")


def bigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                   keep_cols: tuple = ()):
    """Bigram LM quality scoring (the next rung of the KenLM-proxy ladder
    above ``unigram_logprob``): train add-1-smoothed bigram probabilities
    ON the corpus, score each doc by its mean position log-probability —

        lp(doc) = [ ln p1(w_0) + sum_{i>0} ln p(w_i | w_{i-1}) ] / n
        p(w2|w1) = (c(w1 w2) + 1) / (c1(w1) + V),  c1 = sum_w2 c(w1 w2)

    p1 is the unigram model. Both model tables are vocab/bigram-vocab-sized
    and broadcast once; scoring is vectorized searchsorted per batch. Since
    train and score run on the SAME corpus, every scored n-gram exists in
    the tables — the SQL oracle reproduces each ln exactly.
    -> Dataset (doc_id, n_tokens, avg_logprob), empty docs -> 0.0."""
    import ray

    from ..state.aggregates import tree_aggregate

    terms, uni_logp, _total, vocab = unigram_model(ds, text_col)
    big = tree_aggregate(
        ds, ["bigram"], lambda df: bigram_partial(df, text_col), {"n": "sum"}
    ).to_pandas().sort_values("bigram", ignore_index=True)
    bi_keys = big["bigram"].to_numpy(object)
    bi_n = big["n"].to_numpy(np.int64)
    ctx = big.assign(w1=big["bigram"].str.split(" ").str[0]) \
        .groupby("w1", as_index=False)["n"].sum() \
        .sort_values("w1", ignore_index=True)
    ctx_keys = ctx["w1"].to_numpy(object)
    ctx_n = ctx["n"].to_numpy(np.int64)
    model_ref = ray.put((terms, uni_logp, bi_keys, bi_n, ctx_keys, ctx_n,
                         float(vocab)))

    def score(tb: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        ts, ulp, bk, bn, ck, cn, V = ray.get(model_ref)
        texts = tb[text_col].to_pylist()
        n = np.zeros(len(texts), dtype=np.int64)
        s = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = tokenize_text(t)
            n[i] = len(toks)
            if not toks:
                continue
            first = ulp[np.searchsorted(ts, toks[0])]
            acc = float(first)
            if len(toks) > 1:
                pair_keys = np.asarray(
                    [a + " " + b for a, b in zip(toks, toks[1:])], dtype=object
                )
                c12 = bn[np.searchsorted(bk, pair_keys)].astype(np.float64)
                c1 = cn[np.searchsorted(ck, np.asarray(toks[:-1], dtype=object))]
                acc += float(np.log((c12 + 1.0) / (c1 + V)).sum())
            s[i] = acc
        avg = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        cols = {
            "doc_id": tb[id_col],
            "n_tokens": pa.array(n),
            "avg_logprob": pa.array(np.round(avg, 6)),
        }
        for c in keep_cols:
            cols[c] = tb[c]
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


# Gopher quality rules (Rae et al. 2021, Table A1 subset applicable to
# unstructured text): word-count bounds, mean-word-length bounds, symbol
# ratio, alpha-word fraction, distinct-stopword floor. Thresholds are the
# paper's where the corpus shape permits.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MAX_SYMBOL_FRAC = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_DISTINCT = 1  # corpus-shape-tuned (synthetic vocab carries few English stopwords)
_GOPHER_SYMBOL_RE = r"[^A-Za-z0-9_ \t\n\r]"  # explicit ASCII ws (RE2 parity)


def gopher_quality_batch(df, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Vectorized Gopher rule signals + keep flag per doc. All counts are
    exact integers; the three fractions are ONE double division each,
    rounded 6 dp (SQL-identical)."""
    from ..functions.tokenize import batch_term_doc_tf

    is_pandas, _texts, _ids = _texts_ids(df, text_col, id_col=id_col)
    ids = np.asarray(_ids, dtype=np.int64)
    texts = np.asarray(_texts, dtype=object)
    terms, docs, tfs, _dls = batch_term_doc_tf(ids, texts)
    t = pd.DataFrame({"doc_id": docs, "term": terms, "tf": tfs})
    tl = t["term"].str.len().to_numpy(np.int64)
    t["chars"] = tl * t["tf"].to_numpy(np.int64)
    t["alpha"] = np.where(
        t["term"].str.contains("[a-z]", regex=True), t["tf"], 0
    ).astype(np.int64)
    t["stop"] = t["term"].isin(LANG_PROFILES["en"]).astype(np.int64)
    g = t.groupby("doc_id").agg(
        n_words=("tf", "sum"), sum_chars=("chars", "sum"),
        n_alpha=("alpha", "sum"), n_stop_distinct=("stop", "sum"),
    )
    base = pd.DataFrame({
        "doc_id": ids,
        "n_sym": pd.Series(texts).str.count(_GOPHER_SYMBOL_RE).to_numpy(np.int64),
        "n_chars": pd.Series(texts).str.len().to_numpy(np.int64),
    })
    out = base.merge(g, left_on="doc_id", right_index=True, how="left")
    for c in ("n_words", "sum_chars", "n_alpha", "n_stop_distinct"):
        out[c] = out[c].fillna(0).astype(np.int64)
    nw = out["n_words"].to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mwl = np.where(nw > 0, out["sum_chars"].to_numpy(np.float64) / nw, 0.0)
        af = np.where(nw > 0, out["n_alpha"].to_numpy(np.float64) / nw, 0.0)
        nc = out["n_chars"].to_numpy(np.float64)
        sf = np.where(nc > 0, out["n_sym"].to_numpy(np.float64) / nc, 0.0)
    out["mean_word_len"] = np.round(mwl, 6)
    out["alpha_frac"] = np.round(af, 6)
    out["symbol_frac"] = np.round(sf, 6)
    out["gopher_keep"] = (
        (out["n_words"] >= GOPHER_MIN_WORDS)
        & (out["n_words"] <= GOPHER_MAX_WORDS)
        & (out["mean_word_len"] >= GOPHER_MIN_MWL)
        & (out["mean_word_len"] <= GOPHER_MAX_MWL)
        & (out["symbol_frac"] <= GOPHER_MAX_SYMBOL_FRAC)
        & (out["alpha_frac"] >= GOPHER_MIN_ALPHA_FRAC)
        & (out["n_stop_distinct"] >= GOPHER_MIN_STOP_DISTINCT)
    )
    out = out[["doc_id", "n_words", "mean_word_len", "symbol_frac",
               "alpha_frac", "n_stop_distinct", "gopher_keep"]]
    if is_pandas:
        return out
    import pyarrow as pa

    return pa.Table.from_pandas(out, preserve_index=False)


def winnow_fingerprints(ds, k: int = 4, w: int = 4,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS local-sampling scheme): hash every k-token shingle, slide a
    window of ``w`` consecutive hashes, and select each window's minimum
    (rightmost occurrence on ties — the robust-winnowing rule). The selected
    distinct hashes are the doc's fingerprint set; any shared token run of
    length ≥ w + k - 1 between two docs is GUARANTEED to share a
    fingerprint, which is what makes the sample safe for overlap detection.

    Hash contract (shared with the SQL oracle): the shingle's 32-bit hash is
    the first 8 hex chars of md5(space-joined tokens). The tie rule rides in
    one integer — ``combined = h32 * 2^20 + (2^20 - 1 - pos)`` — so a plain
    windowed MIN picks (smallest hash, then rightmost position) and
    ``combined >> 20`` recovers the hash. Docs are capped at 2^20 k-grams
    (1M tokens) by the packing; docs with fewer than ``w`` k-grams have no
    full window and emit nothing (both sides agree).

    Map-only — no shuffle, no broadcast state; the windowed min is one
    numpy sliding-window reduction per doc.
    -> Dataset ``(doc_id, fp)`` distinct rows, fp int64 < 2^32."""
    import hashlib

    from numpy.lib.stride_tricks import sliding_window_view

    from ..functions.tokenize import TOKEN_RE

    findall = TOKEN_RE.findall
    md5 = hashlib.md5

    def fps(tb: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        out_doc: list[np.ndarray] = []
        out_fp: list[np.ndarray] = []
        for did, t in zip(tb[id_col].to_numpy(zero_copy_only=False),
                          tb[text_col].to_pylist()):
            toks = findall(t.lower())
            n = len(toks) - k + 1
            if n < w:
                continue
            if n > (1 << 20):
                raise ValueError("winnow_fingerprints: doc exceeds 2^20 k-grams")
            h32 = np.fromiter(
                (int(md5(" ".join(toks[i:i + k]).encode()).hexdigest()[:8], 16)
                 for i in range(n)),
                np.int64, n,
            )
            pos = np.arange(n, dtype=np.int64)
            combined = (h32 << 20) + ((1 << 20) - 1 - pos)
            sel = np.unique(sliding_window_view(combined, w).min(axis=1) >> 20)
            out_doc.append(np.full(len(sel), did, np.int64))
            out_fp.append(sel)
        if not out_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_doc)),
                         "fp": pa.array(np.concatenate(out_fp))})

    return ds.map_batches(fps, batch_format="pyarrow")
