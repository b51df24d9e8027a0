"""Lucene-style query-string parser over the existing query primitives.

Grammar (the subset of Solr's lucene/edismax syntax the reference's users
actually type, SolrHelper.java query construction):

    term            SHOULD — scores, never restricts
    +term           MUST   — doc must contain it (still scores)
    -term           MUST_NOT — doc must not contain it
    "a b"           exact phrase (MUST; its terms also score)
    "a b"~N         sloppy phrase, max N intervening/reordered positions
    pref*           prefix — expands to the top-df matching vocabulary
                    terms (capped), added as SHOULD; +pref* requires ANY
                    expansion (disjunctive MUST, still scores); -pref*
                    EXCLUDES every expansion (never scores)
    field:value     metadata filter over the index's ``_docs`` meta columns
                    (Solr fq; restricts, never scores); -field:value
                    excludes. The field must exist in _docs — unknown
                    fields raise rather than silently matching nothing.

Semantics: the candidate set is (docs containing ALL must terms) ∩ (docs
matching every phrase) minus (docs containing ANY must-not term); ranking
is plain BM25 over the UNION of positive terms (should + must + phrase
tokens + prefix expansions) — restriction never changes scores, exactly
like Solr filter queries. Everything executes through the warm pool:
must-matching and phrase matching are shard-local id computations, the
final ranking is one ``topk`` scatter with a doc-id whitelist.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions.tokenize import tokenize_text

_CLAUSE = re.compile(r'([+-]?)"([^"]*)"(?:~(\d+))?|([+-]?)(\S+)')

QS_MAX_EXPANSIONS = 5


_FIELD = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$")


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[tuple[str, int]] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)
    must_prefixes: list[str] = field(default_factory=list)
    must_not_prefixes: list[str] = field(default_factory=list)
    filters: list[tuple[str, str, bool]] = field(default_factory=list)
    """(field, value, negated) metadata equality filters."""

    def all_prefixes(self) -> list[str]:
        return sorted(set(self.prefixes) | set(self.must_prefixes)
                      | set(self.must_not_prefixes))

    def positive_terms(self, expansions: dict[str, list[str]]) -> list[str]:
        terms = set(self.should) | set(self.must)
        for text, _slop in self.phrases:
            terms |= set(tokenize_text(text))
        # must-prefix expansions score like must terms; must_not expansions
        # never score (they only exclude)
        for p in self.prefixes + self.must_prefixes:
            terms |= set(expansions.get(p, []))
        return sorted(terms)


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    for m in _CLAUSE.finditer(q):
        sign_p, phrase, slop, sign_t, word = m.groups()
        if phrase is not None:
            if sign_p == "-":
                # prohibited phrases would need positional NOT — out of the
                # supported subset; treat the tokens as prohibited terms
                out.must_not.extend(tokenize_text(phrase))
            else:
                out.phrases.append((phrase, int(slop) if slop else 0))
            continue
        fm = _FIELD.match(word)
        if fm is not None:
            out.filters.append((fm.group(1), fm.group(2), sign_t == "-"))
            continue
        if word.endswith("*") and len(word) > 1:
            stem = tokenize_text(word[:-1])
            if stem:
                # clause sign carries through (Lucene semantics): -pref*
                # EXCLUDES its expansions, +pref* requires at least one
                if sign_t == "-":
                    out.must_not_prefixes.append(stem[-1])
                elif sign_t == "+":
                    out.must_prefixes.append(stem[-1])
                else:
                    out.prefixes.append(stem[-1])
            continue
        toks = tokenize_text(word)
        if not toks:
            continue
        if sign_t == "+":
            out.must.extend(toks)
        elif sign_t == "-":
            out.must_not.extend(toks)
        else:
            out.should.extend(toks)
    return out


def querystring_topk(
    index_dir: str,
    queries: pa.Table,
    max_expansions: int = QS_MAX_EXPANSIONS,
) -> pa.Table:
    """(query_id:int64, text:string query string, k:int32) → (query_id,
    rank, doc_id, score)."""
    import pyarrow.dataset as pads

    from .prefix import expand_prefixes
    from .query import QueryPool, get_pool

    pool = get_pool(index_dir)
    qids = [int(v) for v in queries["query_id"].to_pylist()]
    texts = queries["text"].to_pylist()
    ks = [int(v) for v in queries["k"].to_pylist()]
    parsed = {qid: parse_query(t) for qid, t in zip(qids, texts)}

    if any(pq.filters for pq in parsed.values()):
        import os as _os

        from .segments import DOCS
        from .update import _docs_columns

        meta_cols = set(_docs_columns(_os.path.join(index_dir, DOCS)))
        for pq in parsed.values():
            for fld, _val, _neg in pq.filters:
                if fld not in meta_cols:
                    raise ValueError(
                        f"unknown filter field {fld!r}; _docs has "
                        f"{sorted(meta_cols)}")

    all_prefixes = sorted({p for pq in parsed.values()
                           for p in pq.all_prefixes()})
    expansions = (expand_prefixes(index_dir, all_prefixes, max_expansions)
                  if all_prefixes else {})

    # batch every phrase across every query through ONE positional pass
    phrase_specs: dict[int, tuple] = {}
    phrase_owner: dict[int, int] = {}
    pid = 0
    for qid, pq in parsed.items():
        for text, slop in pq.phrases:
            phrase_specs[pid] = (text, slop)
            phrase_owner[pid] = qid
            pid += 1
    if phrase_specs and not pool.has_positions:
        raise ValueError(
            "query-string phrases need a positional index "
            "(BuildConfig(store_positions=True)); for non-positional "
            "indexes use index.phrase.phrase_topk's text-verify path")
    phrase_hits = pool.phrase_ids(phrase_specs) if phrase_specs else {}

    parts = []
    for qid, k in zip(qids, ks):
        pq = parsed[qid]
        positive = pq.positive_terms(expansions)
        if not positive:
            continue
        allowed: np.ndarray | None = None
        if pq.must:
            allowed = pool.matching_doc_ids(" ".join(pq.must), mode="and")
        for p in pq.must_prefixes:
            # +pref* is a disjunctive must: the doc needs ANY expansion.
            # An empty expansion set means no doc can satisfy the clause.
            exp = expansions.get(p, [])
            ids = (pool.matching_doc_ids(" ".join(exp), mode="or")
                   if exp else np.empty(0, dtype=np.int64))
            ids = np.sort(np.asarray(ids, dtype=np.int64))
            allowed = ids if allowed is None else np.intersect1d(
                allowed, ids, assume_unique=True)
        for p, owner in phrase_owner.items():
            if owner != qid:
                continue
            ids = np.sort(np.asarray(phrase_hits.get(p, []), dtype=np.int64))
            allowed = ids if allowed is None else np.intersect1d(
                allowed, ids, assume_unique=True)
        if allowed is not None and len(allowed) == 0:
            continue
        not_terms = set(pq.must_not)
        for p in pq.must_not_prefixes:  # -pref*: exclude the expansions
            not_terms |= set(expansions.get(p, []))
        q1 = pa.table({
            "query_id": pa.array([qid], pa.int64()),
            "text": pa.array([" ".join(positive)], pa.string()),
            "k": pa.array([k], pa.int32()),
            **({"not_text": pa.array([" ".join(sorted(not_terms))],
                                     pa.string())}
               if not_terms else {}),
        })
        where = (pads.field("doc_id").isin(allowed.tolist())
                 if allowed is not None else None)
        for fld, val, neg in pq.filters:
            e = (pads.field(fld) != val) if neg else (pads.field(fld) == val)
            where = e if where is None else (where & e)
        parts.append(pool.topk(q1, where=where))
    if not parts:
        return QueryPool._EMPTY_TOPK
    return pa.concat_tables(parts)
