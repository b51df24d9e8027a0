"""Federated BM25 search over N independent indexes with GLOBAL statistics.

Solr's distributed search scores each shard with its own local IDF unless
distributed IDF (the ExactStatsCache) is enabled — the classic source of
cross-shard rank skew. This module implements the exact-stats model on Ray:
the driver merges per-term (df, max_tf, min_dl) across every member index
(df sums — member doc sets must be disjoint — max_tf max, min_dl min) and
corpus stats (n_docs/total_len sum; avgdl recomputed from the sums), plans
every query ONCE with those global values, and scatters to each member's
warm ``QueryPool`` actors with the global avgdl override
(``ShardWorker.score(avgdl_override=...)``).

Because a document lives in exactly one member index, per-doc contributions
accumulate in the same canonical term order (desc global upper bound, tie
asc term) with the same idf/avgdl floats as one combined index would use —
federated results are BIT-IDENTICAL to building a single index over the
union corpus (pinned by test). Member layouts may differ: each member's
plans carry ITS OWN term→bucket mapping; global idf/ub ride along.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import stable_hash_strings, tokenize_text
from ..oracle import bm25_idf, term_upper_bound
from .query import (
    TermPlan,
    TermStatsStore,
    _merge_topk_parts,
    get_pool,
    get_pool_and_sig,
)


class FederatedSearcher:
    """Query N indexes as one. Members must hold disjoint doc-id sets (the
    natural state for a corpus partitioned at build time)."""

    def __init__(self, index_dirs: list[str]):
        if len(index_dirs) < 1:
            raise ValueError("FederatedSearcher needs at least one index")
        self.index_dirs = list(index_dirs)
        self._load_members()

    def _load_members(self) -> None:
        self.stores = [TermStatsStore(d) for d in self.index_dirs]
        self.n_docs = sum(st.stats["n_docs"] for st in self.stores)
        self.total_len = sum(st.stats["total_len"] for st in self.stores)
        self.avgdl = self.total_len / self.n_docs if self.n_docs else 0.0
        ans = {st.stats.get("analyzer", "plain") for st in self.stores}
        if len(ans) > 1:
            raise ValueError(
                f"federated members disagree on analyzer: {sorted(ans)} — "
                "global term stats would merge mixed token streams")
        self.analyzer = ans.pop() if ans else "plain"
        self.pools, self._sigs = zip(
            *(get_pool_and_sig(d) for d in self.index_dirs))

    def _ensure_fresh(self) -> None:
        """Re-resolve member pools and RELOAD the merged global stats when
        any member changed. get_pool refreshes a cached pool IN PLACE on
        index change (Lucene reopen), so a long-lived federated searcher
        must not keep scoring with construction-time df/avgdl against
        refreshed postings — the stats snapshot follows the pools."""
        pools, sigs = zip(*(get_pool_and_sig(d) for d in self.index_dirs))
        if sigs != self._sigs:
            self._load_members()
        else:
            self.pools = pools

    def _merged_stats(self, text: str):
        """(per-member term→bucket maps, term → merged [df, max_tf, min_dl,
        cf]) for the query's terms — the ExactStatsCache exchange, O(query
        terms × members)."""
        from ..functions.tokenize import apply_analyzer

        terms = sorted(set(tokenize_text(apply_analyzer(self.analyzer, text))))
        per_member_bucket: list[dict[str, int]] = []
        merged: dict[str, list[int]] = {}
        if not terms:
            return per_member_bucket, merged
        for st in self.stores:
            n_buckets = st.stats["n_buckets"]
            buckets = (stable_hash_strings(np.asarray(terms, dtype=object))
                       % np.uint64(n_buckets)).astype(int)
            bmap = dict(zip(terms, (int(b) for b in buckets)))
            per_member_bucket.append(bmap)
            for term in terms:
                s = st._load_bucket(bmap[term]).get(term)
                if s is None:
                    continue
                df, max_tf, min_dl, cf = s
                m = merged.get(term)
                if m is None:
                    merged[term] = [df, max_tf, min_dl, cf]
                else:
                    m[0] += df
                    m[1] = max(m[1], max_tf)
                    m[2] = min(m[2], min_dl)
                    m[3] += cf
        return per_member_bucket, merged

    def plan_query(self, text: str) -> list[list[TermPlan]]:
        """One global plan per member index: merged-stat idf/ub, member-local
        bucket ids, canonical (desc ub, asc term) order shared by all."""
        per_member_bucket, merged = self._merged_stats(text)
        if not per_member_bucket:
            return [[] for _ in self.stores]
        order = []
        for term, (df, max_tf, min_dl, _cf) in merged.items():
            idf = bm25_idf(df, self.n_docs)
            ub = term_upper_bound(idf, max_tf, min_dl, self.avgdl)
            order.append((term, idf, ub))
        order.sort(key=lambda t: (-t[2], t[0]))
        return [
            [TermPlan(term, bmap[term], idf, ub) for term, idf, ub in order]
            for bmap in per_member_bucket
        ]

    def plan_query_lmd(self, text: str, mu: float) -> list[list[TermPlan]]:
        """LM-Dirichlet federated plans: global rate = total_len_g/(µ·cf_g),
        ub from merged (max_tf, min_dl) — mirrors
        TermStatsStore.plan_query_lmd with merged stats."""
        per_member_bucket, merged = self._merged_stats(text)
        if not per_member_bucket:
            return [[] for _ in self.stores]
        order = []
        for term, (_df, max_tf, min_dl, cf) in merged.items():
            rate = self.total_len / (mu * cf)
            ub = max(
                0.0,
                float(np.log(1.0 + max_tf * rate)
                      + np.log(mu / (min_dl + mu))),
            )
            order.append((term, rate, ub))
        order.sort(key=lambda t: (-t[2], t[0]))
        return [
            [TermPlan(term, bmap[term], rate, ub) for term, rate, ub in order]
            for bmap in per_member_bucket
        ]

    def topk(self, queries: pa.Table, where=None) -> pa.Table:
        """(query_id, text, k) → (query_id, rank, doc_id, score), the global
        top-k across every member; scores identical to a single combined
        index. ``where``: optional pyarrow filter over the members' ``_docs``
        meta columns, evaluated shard-locally (Solr fq semantics — restricts
        the result set, never the stats). Scatter fan-out = Σ members' actor
        counts; each actor returns only its per-shard k-heaps."""
        self._ensure_fresh()
        import ray

        qids = queries["query_id"].to_pylist()
        texts = queries["text"].to_pylist()
        ks = queries["k"].to_pylist()
        member_live: list[dict] = [{} for _ in self.pools]
        any_live: dict = {}
        for qid, text, k in zip(qids, texts, ks):
            plans_by_member = self.plan_query(text)
            if not any(plans_by_member):
                continue
            any_live[int(qid)] = (int(k), plans_by_member[0])
            for i, plans in enumerate(plans_by_member):
                member_live[i][int(qid)] = (int(k), plans)
        futures = []
        for pool, live in zip(self.pools, member_live):
            if not live:
                continue
            for a in pool.actors:
                futures.append(a.score.remote(
                    live, where, False, None, None, None, None, self.avgdl))
        if not futures:
            from .query import QueryPool

            return QueryPool._EMPTY_TOPK
        return _merge_topk_parts(any_live, ray.get(futures))

    def topk_lmd(self, queries: pa.Table, mu: float = 2000.0) -> pa.Table:
        """Federated LM-Dirichlet: global cf/total_len, member-local buckets,
        sim=("lmd", µ) threaded to the scorers — bit-identical to
        ``QueryPool.topk_lmd`` on one combined index."""
        self._ensure_fresh()
        import ray

        qids = queries["query_id"].to_pylist()
        texts = queries["text"].to_pylist()
        ks = queries["k"].to_pylist()
        member_live: list[dict] = [{} for _ in self.pools]
        any_live: dict = {}
        for qid, text, k in zip(qids, texts, ks):
            plans_by_member = self.plan_query_lmd(text, mu)
            if not any(plans_by_member):
                continue
            any_live[int(qid)] = (int(k), plans_by_member[0])
            for i, plans in enumerate(plans_by_member):
                member_live[i][int(qid)] = (int(k), plans)
        futures = []
        for pool, live in zip(self.pools, member_live):
            if not live:
                continue
            for a in pool.actors:
                futures.append(a.score.remote(
                    live, None, False, None, None, None, None, None,
                    ("lmd", float(mu))))
        if not futures:
            from .query import QueryPool

            return QueryPool._EMPTY_TOPK
        return _merge_topk_parts(any_live, ray.get(futures))

    def facet_counts(self, facet_col: str, text: str | None = None,
                     mode: str = "and"):
        """Federated facet: member partials sum (doc sets are disjoint).
        Term MATCHING needs no global stats — member-local plans suffice —
        so this delegates to each member's pool and merges the facet-sized
        tables on the driver."""
        self._ensure_fresh()
        import pandas as pd

        from .query import facet_counts as _member_facets

        parts = [_member_facets(d, facet_col, text=text, mode=mode)
                 for d in self.index_dirs]
        out = pd.concat(parts, ignore_index=True)
        out = out.groupby(facet_col, as_index=False, dropna=False)[
            "n_docs"].sum()
        out["n_docs"] = out["n_docs"].astype("int64")
        return out.sort_values(facet_col, ignore_index=True)
