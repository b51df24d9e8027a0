"""BM25 top-k query engine over the segment store.

Replaces the reference's Solr query path (SolrHelper.getRecordsForQuery,
SolrHelper.java:39-80): parse query → global df/stats lookup → scatter across
doc-shard index partitions → per-shard MaxScore with block-max/range skipping
→ merge per-shard heaps → final (score desc, doc_id asc) top-k.

Exactness + float determinism contract (must be bit-identical to
``oracle.OracleIndex.score_query``):

- terms are processed in the canonical order (descending global upper bound,
  tie ascending term), and every surviving candidate accumulates its per-term
  contributions in exactly that order → per-doc float sums are bit-identical
  to the oracle's;
- pruning is conservative: a doc is only dropped when its best possible score
  is strictly below the current kth best, so top-k membership and scores are
  exact, not approximate.

MaxScore recap: once the remaining terms' summed upper bounds fall below the
current threshold θ, no unseen doc can enter the top-k, so remaining
(non-essential) terms only update existing candidates — and the block-max
skip table lets us decode only the blocks whose doc-id range intersects a
candidate.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.tokenize import stable_hash_strings, tokenize_text
from ..oracle import B, K1, bm25_idf, term_upper_bound
from .postings import decode_posting_list
from .segments import SegmentReader, list_complete_segments, read_stats


@dataclass
class TermPlan:
    term: str
    bucket: int
    idf: float
    ub: float


class TermStatsStore:
    """Global per-term stats (df, max_tf, min_dl) from _global/termstats."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self._buckets: dict[int, dict[str, tuple[int, int, int]]] = {}

    def _load_bucket(self, bucket: int) -> dict[str, tuple[int, int, int]]:
        if bucket not in self._buckets:
            path = os.path.join(self.index_dir, "_global", "termstats", f"bucket={bucket}")
            d: dict[str, tuple[int, int, int]] = {}
            if os.path.isdir(path):
                t = pq.read_table(path, columns=["term", "df", "max_tf", "min_dl"])
                terms = t["term"].to_pylist()
                dfs = t["df"].to_numpy()
                mtf = t["max_tf"].to_numpy()
                mdl = t["min_dl"].to_numpy()
                d = {
                    term: (int(dfs[i]), int(mtf[i]), int(mdl[i]))
                    for i, term in enumerate(terms)
                }
            self._buckets[bucket] = d
        return self._buckets[bucket]

    def plan_query(self, text: str) -> list[TermPlan]:
        """Tokenize + canonical-order term plans (missing terms dropped)."""
        n_buckets = self.stats["n_buckets"]
        n_docs = self.stats["n_docs"]
        avgdl = self.stats["avgdl"]
        terms = sorted(set(tokenize_text(text)))
        if not terms:
            return []
        buckets = (stable_hash_strings(terms) % np.uint64(n_buckets)).astype(int)
        plans = []
        for term, bucket in zip(terms, buckets):
            st = self._load_bucket(int(bucket)).get(term)
            if st is None:
                continue
            df, max_tf, min_dl = st
            idf = bm25_idf(df, n_docs)
            ub = term_upper_bound(idf, max_tf, min_dl, avgdl)
            plans.append(TermPlan(term, int(bucket), idf, ub))
        plans.sort(key=lambda p: (-p.ub, p.term))
        return plans


def _mask_postings(docs, tfs, dls, allowed, tombstones):
    """Apply whitelist (facet filter) and tombstone exclusion to decoded
    postings; both arrays are sorted for searchsorted membership tests."""
    keep = None
    if allowed is not None:
        pos = np.searchsorted(allowed, docs)
        pos_ok = pos < len(allowed)
        keep = np.zeros(len(docs), dtype=bool)
        keep[pos_ok] = allowed[pos[pos_ok]] == docs[pos_ok]
    if tombstones is not None and len(tombstones):
        pos = np.searchsorted(tombstones, docs)
        pos_ok = pos < len(tombstones)
        dead = np.zeros(len(docs), dtype=bool)
        dead[pos_ok] = tombstones[pos[pos_ok]] == docs[pos_ok]
        keep = ~dead if keep is None else (keep & ~dead)
    if keep is None:
        return docs, tfs, dls
    return docs[keep], tfs[keep], dls[keep]


class ShardScorer:
    """Scores queries against ONE doc shard (all its term buckets, every
    live segment generation, minus tombstoned docs)."""

    def __init__(self, index_dir: str, shard: int, buckets: list[int] | None = None):
        from .update import (
            list_segment_generations,
            live_gens,
            load_tombstones,
            open_segment,
        )

        self.stats = read_stats(index_dir)
        self.avgdl = self.stats["avgdl"]
        self.tombstones = load_tombstones(index_dir)
        gens = list_segment_generations(index_dir)
        # bucket -> [reader per live generation, base first]
        self.readers: dict[int, list] = {}
        for (s, b), names in gens.items():
            if s != shard or (buckets is not None and b not in buckets):
                continue
            self.readers[b] = [
                open_segment(index_dir, n) for n in live_gens(index_dir, names)
            ]

    def _contrib(self, idf: float, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        tfs = tfs.astype(np.float64)
        dls = dls.astype(np.float64)
        # expression shape MUST mirror oracle.OracleIndex.score_query exactly
        return idf * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / self.avgdl))

    def score(
        self,
        plans: list[TermPlan],
        k: int,
        allowed: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact shard-local top-k -> (doc_ids, scores), score desc / doc asc.

        ``allowed``: optional SORTED int64 doc-id whitelist (the facet/range
        filter of the reference's Solr queries, IndexRecords.java:124-132,
        :174). Like Solr filter queries, filtering restricts the result set
        but does NOT change df/avgdl — scores of surviving docs are identical
        to the unfiltered query's."""
        acc_docs = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        n = len(plans)
        ubs = np.array([p.ub for p in plans], dtype=np.float64)
        suffix_ub = np.cumsum(ubs[::-1])[::-1] if n else np.empty(0)
        for i, p in enumerate(plans):
            theta = -np.inf
            if k > 0 and len(acc_docs) >= k:
                theta = np.partition(acc_scores, len(acc_scores) - k)[
                    len(acc_scores) - k
                ]
                # prune accumulator entries that can never reach theta:
                # score + everything left (incl. this term) < theta. A pruned
                # doc may reappear with a partial score, but its maximum total
                # is below theta, so it can never displace a top-k doc.
                keep = acc_scores + suffix_ub[i] >= theta
                acc_docs, acc_scores = acc_docs[keep], acc_scores[keep]
            suffix_next = suffix_ub[i] - ubs[i]
            # a (term, doc) posting lives in exactly ONE generation, so
            # iterating generations preserves one-contribution-per-term-
            # per-doc and the oracle's accumulation order
            for reader in self.readers.get(p.bucket, ()):
                entry = reader.term_entry(p.term)
                if entry is None:
                    continue
                btab = entry["block_table"]
                mask = None
                if theta > -np.inf:
                    # block-max WAND: decode a block only if (a) a doc NEW to
                    # the accumulator could still reach theta through it
                    # (block upper bound + remaining terms' bounds), or
                    # (b) its doc range holds a surviving accumulator entry.
                    mtf = btab["max_tf"].astype(np.float64)
                    mdl = btab["min_dl"].astype(np.float64)
                    block_ub = (
                        p.idf * mtf * (K1 + 1.0)
                        / (mtf + K1 * (1.0 - B + B * mdl / self.avgdl))
                    )
                    new_doc_possible = block_ub + suffix_next >= theta
                    last = btab["last_doc"]
                    first = np.empty_like(last)
                    first[0] = 0
                    first[1:] = last[:-1] + 1
                    lo = np.searchsorted(acc_docs, first, side="left")
                    hi = np.searchsorted(acc_docs, last, side="right")
                    mask = new_doc_possible | (hi > lo)
                    if not mask.any():
                        continue
                docs, tfs, dls = decode_posting_list(entry["payload"], btab, mask)
                docs, tfs, dls = _mask_postings(
                    docs, tfs, dls, allowed, self.tombstones
                )
                if len(docs) == 0:
                    continue
                s = self._contrib(p.idf, tfs, dls)
                all_docs = np.concatenate([acc_docs, docs])
                all_scores = np.concatenate([acc_scores, s])
                acc_docs, inverse = np.unique(all_docs, return_inverse=True)
                # bincount accumulates in array order: existing acc value
                # first, then this term's contribution — oracle's += order.
                acc_scores = np.bincount(
                    inverse, weights=all_scores, minlength=len(acc_docs)
                )
        if len(acc_docs) == 0 or k <= 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        order = np.lexsort((acc_docs, -acc_scores))[:k]
        return acc_docs[order], acc_scores[order]


class LocalSearcher:
    """All shards in one process — used for conformance tests and per-query
    latency measurement. At cluster scale each shard scorer lives in its own
    actor and ``bm25_topk`` (below) is the scatter/merge path."""

    def __init__(self, index_dir: str):
        from .update import list_segment_generations

        self.index_dir = index_dir
        self.store = TermStatsStore(index_dir)
        shards = sorted({s for s, _ in list_segment_generations(index_dir)})
        self.scorers = [ShardScorer(index_dir, s) for s in shards]

    def search(
        self, text: str, k: int, where=None, require_all: bool = False
    ) -> list[tuple[int, float]]:
        """``where``: optional pyarrow dataset filter expression over the
        forward doc table's meta columns (e.g. ``pc.field("lang") == "py"``)
        — the facet/range-filter query surface (S6/J8).
        ``require_all``: conjunctive (AND) ranking — only docs containing
        every query term are scored; scores identical to the unrestricted
        query's (a Solr q.op=AND analog)."""
        allowed = None
        if where is not None:
            allowed = filter_doc_ids(self.index_dir, where)
        if require_all:
            conj = matching_doc_ids(self.index_dir, text, "and")
            allowed = conj if allowed is None else np.intersect1d(allowed, conj)
        plans = self.store.plan_query(text)
        if not plans:
            return []
        parts = [sc.score(plans, k, allowed=allowed) for sc in self.scorers]
        docs = np.concatenate([d for d, _ in parts]) if parts else np.empty(0, np.int64)
        scores = np.concatenate([s for _, s in parts]) if parts else np.empty(0)
        if len(docs) == 0:
            return []
        order = np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]), float(scores[i])) for i in order]


class Bm25SearchActor:
    """Actor-pool query server (T5): segments + global stats loaded ONCE per
    actor in ``__init__``, then batches of queries score against warm state
    via ``map_batches(Bm25SearchActor, fn_constructor_args=(index_dir,))``.

    In this sandbox each actor holds every shard; on a real cluster each
    actor pins one shard (placement group per node) and the scatter path
    (``bm25_topk``) fans queries out instead."""

    def __init__(self, index_dir: str):
        self.searcher = LocalSearcher(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, text, k in zip(
            batch["query_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["k"].to_pylist(),
        ):
            for rank, (doc_id, score) in enumerate(self.searcher.search(text, int(k)), 1):
                out_q.append(int(qid))
                out_r.append(rank)
                out_d.append(doc_id)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def bm25_serve(index_dir: str, queries_ds, concurrency: int = 2, batch_size: int = 8):
    """Serve a query Dataset through the warm actor pool."""
    return queries_ds.map_batches(
        Bm25SearchActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_args=(index_dir,),
    )


def matching_doc_ids(index_dir: str, text: str, mode: str = "and") -> np.ndarray:
    """Boolean retrieval: sorted doc ids containing ALL ("and") or ANY
    ("or") of the query's terms — the reference's conjunctive facet
    predicate surface (`... AND types:repository`, IndexRecords.java:174).
    Tombstones are excluded."""
    from .update import list_segment_generations, load_tombstones, open_segment

    store = TermStatsStore(index_dir)
    plans = store.plan_query(text)
    n_query_terms = len(set(tokenize_text(text)))
    if not plans or (mode == "and" and len(plans) < n_query_terms):
        return np.empty(0, dtype=np.int64)  # an absent term empties an AND
    gens = list_segment_generations(index_dir)
    per_term: dict[str, list[np.ndarray]] = {p.term: [] for p in plans}
    from .update import live_gens

    for (s, b), names in gens.items():
        for name in live_gens(index_dir, names):
            rdr = open_segment(index_dir, name)
            for p in plans:
                if p.bucket != b:
                    continue
                e = rdr.term_entry(p.term)
                if e is not None:
                    docs, _, _ = decode_posting_list(e["payload"], e["block_table"])
                    per_term[p.term].append(docs)
    sets = [
        np.unique(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.int64)
        for chunks in per_term.values()
    ]
    if mode == "and":
        out = sets[0]
        for s_ in sets[1:]:
            out = out[np.isin(out, s_, assume_unique=True)]
    else:
        out = np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
    tomb = load_tombstones(index_dir)
    if len(tomb):
        out = out[~np.isin(out, tomb)]
    return out


def facet_counts(
    index_dir: str, facet_col: str, text: str | None = None, mode: str = "and"
) -> "pd.DataFrame":
    """Facet counting over the (optionally query-restricted) doc set — the
    Solr ``facet.field`` surface. Counts come from a column-pruned read of
    the forward doc table joined against the match set."""
    import pyarrow.dataset as pads

    d = pads.dataset(os.path.join(index_dir, "_docs"))
    t = d.to_table(columns=["doc_id", facet_col])
    df = t.to_pandas()
    if text is not None:
        matches = matching_doc_ids(index_dir, text, mode)
        df = df[np.isin(df["doc_id"].to_numpy(), matches)]
    out = (
        df.groupby(facet_col, as_index=False)
        .agg(n_docs=("doc_id", "nunique"))
        .sort_values([facet_col], ignore_index=True)
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


def filter_doc_ids(index_dir: str, where) -> np.ndarray:
    """Sorted doc ids passing a pyarrow filter expression over _docs
    (column-pruned, row-group-pushdown read of the forward table)."""
    import pyarrow.dataset as pads

    d = pads.dataset(os.path.join(index_dir, "_docs"))
    t = d.to_table(filter=where, columns=["doc_id"])
    return np.sort(t["doc_id"].to_numpy())


def explain(index_dir: str, text: str, doc_id: int) -> dict:
    """Per-term score breakdown for one document (Solr debugQuery analog):
    for each query term present in the doc — tf, dl, df, idf, contribution —
    plus the total. Sums in canonical term order, so ``total`` is
    bit-identical to the ranked score."""
    from .update import list_segment_generations, live_gens, open_segment

    store = TermStatsStore(index_dir)
    plans = store.plan_query(text)
    stats = store.stats
    shard = int(doc_id) % stats["n_shards"]
    gens = list_segment_generations(index_dir)
    terms_out = []
    total = 0.0
    for p in plans:
        names = gens.get((shard, p.bucket), [])
        for name in live_gens(index_dir, names):
            e = open_segment(index_dir, name).term_entry(p.term)
            if e is None:
                continue
            docs, tfs, dls = decode_posting_list(e["payload"], e["block_table"])
            pos = np.searchsorted(docs, doc_id)
            if pos < len(docs) and docs[pos] == doc_id:
                tf, dl = int(tfs[pos]), int(dls[pos])
                contrib = float(
                    p.idf * float(tf) * (K1 + 1.0)
                    / (float(tf) + K1 * (1.0 - B + B * float(dl) / stats["avgdl"]))
                )
                total += contrib
                terms_out.append(
                    {"term": p.term, "tf": tf, "dl": dl, "idf": p.idf,
                     "upper_bound": p.ub, "contribution": contrib}
                )
                break
    return {
        "doc_id": int(doc_id),
        "query": text,
        "k1": K1, "b": B,
        "n_docs": stats["n_docs"], "avgdl": stats["avgdl"],
        "terms": terms_out,
        "total": total,
    }


def bm25_topk(
    index_dir: str,
    queries: pa.Table,
    *,
    where=None,
    concurrency: int | None = None,
) -> pa.Table:
    """Distributed scatter/merge BM25 over a queries table
    ``(query_id:int64, text:string, k:int32)`` → ``(query_id, rank, doc_id,
    score)``.

    Dataset-native: one group per shard scores every query against that shard
    (per-shard heaps), then a groupby(query_id) merges heaps. Query planning
    (global df / ub lookup) happens once on the driver and is broadcast via
    ``ray.put`` — never re-read per task.
    """
    import ray
    import ray.data

    store = TermStatsStore(index_dir)
    qids = queries["query_id"].to_pylist()
    texts = queries["text"].to_pylist()
    ks = queries["k"].to_pylist()
    plans = {
        int(qid): (int(k), store.plan_query(text))
        for qid, text, k in zip(qids, texts, ks)
    }
    plans_ref = ray.put(plans)
    allowed_ref = ray.put(filter_doc_ids(index_dir, where) if where is not None else None)
    from .update import list_segment_generations

    shards = sorted({s for s, _ in list_segment_generations(index_dir)})

    live_qids = [q for q in qids if plans[int(q)][1]]  # zero-hit queries
    if not live_qids or not shards:                    # produce no rows
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    scatter = ray.data.from_items(
        [{"shard": s, "query_id": int(q)} for s in shards for q in live_qids]
    )

    def score_shard(group: pd.DataFrame) -> pd.DataFrame:
        shard = int(group["shard"].iloc[0])
        local_plans = ray.get(plans_ref)
        allowed = ray.get(allowed_ref)
        scorer = ShardScorer(index_dir, shard)
        out_q, out_d, out_s = [], [], []
        for qid in group["query_id"]:
            k, qplans = local_plans[int(qid)]
            if not qplans:
                continue
            docs, scores = scorer.score(qplans, k, allowed=allowed)
            out_q.extend([int(qid)] * len(docs))
            out_d.extend(docs.tolist())
            out_s.extend(scores.tolist())
        return pd.DataFrame(
            {"query_id": pd.Series(out_q, dtype=np.int64),
             "doc_id": pd.Series(out_d, dtype=np.int64),
             "score": pd.Series(out_s, dtype=np.float64)}
        )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["query_id"].iloc[0])
        k, _ = ray.get(plans_ref)[qid]
        g = group.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "doc_id", "score"]]

    per_shard = scatter.groupby("shard").map_groups(score_shard, batch_format="pandas")
    merged = per_shard.groupby("query_id").map_groups(merge_topk, batch_format="pandas")
    out = merged.to_pandas()
    out = out.sort_values(["query_id", "rank"], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)
