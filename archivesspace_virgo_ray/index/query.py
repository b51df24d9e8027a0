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
    """Global per-term stats (df, max_tf, min_dl) from _global/termstats.

    Self-healing: the seal records which committed generations it covers
    (``termstats/_SEALED.json``); if that set no longer matches the on-disk
    committed set (a crash between gen commit and seal), the store reseals
    before serving — queries never plan with stale df."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self._ensure_sealed()
        self.stats = read_stats(index_dir)
        self._buckets: dict[int, dict[str, tuple[int, int, int]]] = {}

    def qtext(self, text: str) -> str:
        """Apply the index's recorded analyzer to QUERY text (Solr applies
        the schema's analysis chain at query time; so does this) — user text
        tokenizes exactly like the build did, e.g. 'keyAgg' finds the split
        parts on an analyzer='ident' index."""
        from ..functions.tokenize import apply_analyzer

        return apply_analyzer(self.stats.get("analyzer", "plain"), text)

    def _ensure_sealed(self) -> None:
        import json

        from .build import termstats_dir
        from .update import committed_gens

        p = os.path.join(termstats_dir(self.index_dir), "_SEALED.json")
        want = sorted(committed_gens(self.index_dir))
        try:
            with open(p) as f:
                have = sorted(json.load(f).get("sealed_gens", []))
        except (OSError, ValueError):
            have = None
        if have != want:
            from .build import _seal_termstats

            _seal_termstats(self.index_dir)
        # pin ONE resolved version for this store's lifetime: every bucket
        # load reads the same seal, even if a reseal flips the pointer
        # mid-query (the pinned dir is age-gated, never deleted under us)
        self._ts_dir = termstats_dir(self.index_dir)

    def _ensure_current(self) -> None:
        """If the pinned seal version outlived the age-gated GC (store held
        warm across later reseals), re-resolve/reseal and refresh the WHOLE
        snapshot rather than silently treating vanished buckets as an empty
        vocabulary. The pointer only moves when the committed gens changed
        (or a concurrent identical reseal won), so cached buckets and stats
        may describe a different index version — mixing old-seal df with
        new-seal stats would break the bit-identical BM25 contract."""
        if not os.path.isdir(self._ts_dir):
            self._ensure_sealed()
            self._buckets = {}
            self.stats = read_stats(self.index_dir)

    def _load_bucket(
        self, bucket: int
    ) -> dict[str, tuple[int, int, int, int]]:
        """term -> (df, max_tf, min_dl, cf). cf rides along for the
        LM-Dirichlet planner; BM25 planning ignores it."""
        if bucket not in self._buckets:
            self._ensure_current()
            path = os.path.join(self._ts_dir, f"bucket={bucket}")
            d: dict[str, tuple[int, int, int, int]] = {}
            if os.path.isdir(path):
                t = pq.read_table(
                    path, columns=["term", "df", "max_tf", "min_dl", "cf"])
                terms = t["term"].to_pylist()
                dfs = t["df"].to_numpy()
                mtf = t["max_tf"].to_numpy()
                mdl = t["min_dl"].to_numpy()
                cfs = t["cf"].to_numpy()
                d = {
                    term: (int(dfs[i]), int(mtf[i]), int(mdl[i]), int(cfs[i]))
                    for i, term in enumerate(terms)
                }
            self._buckets[bucket] = d
        return self._buckets[bucket]

    def plan_query(self, text: str) -> list[TermPlan]:
        """Tokenize + canonical-order term plans (missing terms dropped)."""
        self._ensure_current()  # BEFORE stats are read into locals below
        n_buckets = self.stats["n_buckets"]
        n_docs = self.stats["n_docs"]
        avgdl = self.stats["avgdl"]
        terms = sorted(set(tokenize_text(self.qtext(text))))
        if not terms:
            return []
        buckets = (stable_hash_strings(terms) % np.uint64(n_buckets)).astype(int)
        plans = []
        for term, bucket in zip(terms, buckets):
            st = self._load_bucket(int(bucket)).get(term)
            if st is None:
                continue
            df, max_tf, min_dl, _cf = st
            idf = bm25_idf(df, n_docs)
            ub = term_upper_bound(idf, max_tf, min_dl, avgdl)
            plans.append(TermPlan(term, int(bucket), idf, ub))
        plans.sort(key=lambda p: (-p.ub, p.term))
        return plans

    def plan_query_lmd(self, text: str, mu: float) -> list[TermPlan]:
        """LM-Dirichlet term plans (Lucene LMDirichletSimilarity): the
        TermPlan's ``idf`` slot carries the per-term rate
        ``total_len / (mu * cf)`` (what tf multiplies inside log) and ``ub``
        the per-posting maximum ``max(0, ln(1 + max_tf*rate) +
        ln(mu/(min_dl+mu)))`` — a true upper bound because the contribution
        rises in tf and falls in dl, and is clamped at 0 exactly like the
        per-posting score."""
        self._ensure_current()
        n_buckets = self.stats["n_buckets"]
        total_len = self.stats["total_len"]
        terms = sorted(set(tokenize_text(self.qtext(text))))
        if not terms:
            return []
        buckets = (stable_hash_strings(terms) % np.uint64(n_buckets)).astype(int)
        plans = []
        for term, bucket in zip(terms, buckets):
            st = self._load_bucket(int(bucket)).get(term)
            if st is None:
                continue
            _df, max_tf, min_dl, cf = st
            rate = total_len / (mu * cf)
            ub = max(
                0.0,
                float(np.log(1.0 + max_tf * rate)
                      + np.log(mu / (min_dl + mu))),
            )
            plans.append(TermPlan(term, int(bucket), rate, ub))
        plans.sort(key=lambda p: (-p.ub, p.term))
        return plans


def _mask_postings(docs, tfs, dls, allowed, tombstones, blocked=None):
    """Apply whitelist (facet filter), tombstone exclusion, and NOT-clause
    blacklist to decoded postings; all three arrays are sorted for
    searchsorted membership tests."""
    keep = None
    if allowed is not None:
        pos = np.searchsorted(allowed, docs)
        pos_ok = pos < len(allowed)
        keep = np.zeros(len(docs), dtype=bool)
        keep[pos_ok] = allowed[pos[pos_ok]] == docs[pos_ok]
    for excl in (tombstones, blocked):
        if excl is not None and len(excl):
            pos = np.searchsorted(excl, docs)
            pos_ok = pos < len(excl)
            dead = np.zeros(len(docs), dtype=bool)
            dead[pos_ok] = excl[pos[pos_ok]] == docs[pos_ok]
            keep = ~dead if keep is None else (keep & ~dead)
    if keep is None:
        return docs, tfs, dls
    return docs[keep], tfs[keep], dls[keep]


def _expression_key(where) -> bytes:
    """CONTENT-exact cache key bytes for a pyarrow filter expression.
    Never ``repr``/``str``: pyarrow elides long literal lists ("...") so
    two distinct doc-id whitelists sharing head and tail alias to one key
    — the soak caught a stale whitelist served from exactly that
    collision. ``to_substrait`` needs the real schema, so pickle (exact,
    and these keys never leave the process) is the canonical form."""
    import pickle

    try:
        return pickle.dumps(where)
    except Exception:  # exotic expression: fall back, prefix to disambiguate
        return b"repr:" + repr(where).encode()


class _StaleIndexRead(Exception):
    """A maintenance commit landed between a reader's marker snapshot and
    its directory listing — re-read from a fresh snapshot."""


class ShardScorer:
    """Scores queries against ONE doc shard (all its term buckets, every
    live segment generation, minus tombstoned docs)."""

    def __init__(self, index_dir: str, shard: int,
                 buckets: list[int] | None = None,
                 reader_cache: dict | None = None):
        # ``reader_cache``: {(segment name, manifest mtime_ns): reader}
        # from a previous scorer over the same shard — segments are
        # immutable once complete (a base rewrite lands via os.replace and
        # changes the manifest mtime), so matching keys can reuse the
        # already-mmapped reader. This is the Lucene IndexReader.reopen
        # economics: a refresh after a small delta add only opens the new
        # generation's dirs.
        self._reader_cache_in = reader_cache or {}
        # Once constructed, a scorer is immune to concurrent maintenance:
        # term dicts are in memory and postings are mmapped, so a merge
        # rmtree'ing a folded dir leaves our open inodes intact (POSIX).
        # The only race is DURING construction — list the generations, a
        # fold commits, open a now-removed dir. Mutations are atomic
        # (marker/rename commits), so a bounded re-list + re-open always
        # converges on a consistent committed state.
        last_err: Exception | None = None
        for _attempt in range(4):
            try:
                self._load(index_dir, shard, buckets)
                return
            # OSError, not just FileNotFoundError: pyarrow surfaces a
            # vanished-mid-rmtree segment file as a generic OSError
            except (OSError, _StaleIndexRead) as e:
                last_err = e
        raise last_err

    def _load(self, index_dir: str, shard: int, buckets: list[int] | None):
        from .update import (
            _committed_markers,
            folded_gens,
            list_segment_generations,
            live_gens,
            load_tombstone_thresholds,
            open_segment,
            segment_mask_gen,
        )

        self.stats = read_stats(index_dir)
        self.avgdl = self.stats["avgdl"]
        # ONE marker snapshot drives every visibility decision (committed
        # set, folded set, replace thresholds) — reading them separately
        # opens a window where a replace/fold committing in between shows
        # both or neither version of a doc.
        markers = _committed_markers(index_dir)
        committed = set(markers)
        folded = folded_gens(index_dir, markers=markers)
        # generation-thresholded tombstones: a posting from generation g is
        # masked iff g < masked_below_gen(doc) — covers plain deletes AND
        # replaced-away document versions (update.add_documents "replace")
        self.tomb_ids, self.tomb_thr = load_tombstone_thresholds(
            index_dir, markers=markers)
        self._gen_masks: dict[int, np.ndarray] = {}
        gens = list_segment_generations(index_dir)

        def _open(n: str):
            try:
                mt = os.stat(os.path.join(index_dir, "segments", n,
                                          "manifest.json")).st_mtime_ns
            except OSError:
                mt = 0
            r = self._reader_cache_in.get((n, mt))
            if r is None:
                r = open_segment(index_dir, n)
            self.reader_cache[(n, mt)] = r
            return r

        # bucket -> [(gen, reader) per live generation, base first]
        self.reader_cache: dict = {}  # handed to the NEXT scorer on refresh
        self.readers: dict[int, list] = {}
        for (s, b), names in gens.items():
            if s != shard or (buckets is not None and b not in buckets):
                continue
            self.readers[b] = [
                # mask gen, not visibility gen: a tiered-merge combined
                # segment reads its tombstone thresholds at max(source gens)
                (segment_mask_gen(index_dir, n), _open(n))
                for n in live_gens(index_dir, names, folded=folded,
                                   committed=committed)
            ]
        # validation read (optimistic concurrency): if a fold committed
        # between our snapshot and the dir listing, its source dirs may
        # have been removed before we listed them while our snapshot still
        # expects them visible — retry from a fresh snapshot.
        if set(_committed_markers(index_dir)) != committed:
            raise _StaleIndexRead(index_dir)

    def masked_for_gen(self, gen: int) -> np.ndarray | None:
        """Sorted doc ids whose postings are masked when read from a segment
        of this generation (cached per distinct gen)."""
        if not len(self.tomb_ids):
            return None
        if gen not in self._gen_masks:
            self._gen_masks[gen] = self.tomb_ids[self.tomb_thr > gen]
        m = self._gen_masks[gen]
        return m if len(m) else None

    def _contrib(
        self, idf: float, tfs: np.ndarray, dls: np.ndarray,
        avgdl: float | None = None,
    ) -> np.ndarray:
        tfs = tfs.astype(np.float64)
        dls = dls.astype(np.float64)
        # federated scatter passes the GLOBAL avgdl (index/federated.py);
        # None means this index's own — same expression either way
        a = self.avgdl if avgdl is None else avgdl
        # expression shape MUST mirror oracle.OracleIndex.score_query exactly
        return idf * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / a))

    def score(
        self,
        plans: list[TermPlan],
        k: int,
        allowed: np.ndarray | None = None,
        blocked: np.ndarray | None = None,
        cursor: tuple[float, int, int] | None = None,
        avgdl: float | None = None,
        sim: tuple | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact shard-local top-k -> (doc_ids, scores), score desc / doc asc.

        ``allowed``: optional SORTED int64 doc-id whitelist (the facet/range
        filter of the reference's Solr queries, IndexRecords.java:124-132,
        :174). Like Solr filter queries, filtering restricts the result set
        but does NOT change df/avgdl — scores of surviving docs are identical
        to the unfiltered query's.
        ``blocked``: optional SORTED int64 doc-id blacklist (the NOT clause
        of a boolean query, Solr ``a -b``); applied exactly like tombstones,
        so a blocked doc never enters the accumulator.
        ``cursor``: optional ``(score, doc_id, dp)`` search-after mark (Solr
        cursorMark): only docs STRICTLY after the mark in the
        (round(score, dp) desc, doc_id asc) total order are returned — the
        top-k among them. The cursor predicate is on the FINAL accumulated
        score, which a term-at-a-time pass only knows at the end, so WAND
        pruning is disabled for cursor queries (full postings accumulation,
        the oracle's cost shape); what stays k-sized is everything that
        LEAVES the shard. Deep pages therefore trade per-shard compute for
        constant network — the Solr cursorMark/export trade."""
        acc_docs = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        avgdl_eff = self.avgdl if avgdl is None else float(avgdl)
        # sim=None is BM25 (the bit-identical oracle contract); ("lmd", mu)
        # is Lucene-style LM Dirichlet: per-posting
        # max(0, ln(1 + tf*rate) + ln(mu/(dl+mu))) with rate in plan.idf
        lmd_mu = float(sim[1]) if sim is not None and sim[0] == "lmd" else None
        n = len(plans)
        ubs = np.array([p.ub for p in plans], dtype=np.float64)
        suffix_ub = np.cumsum(ubs[::-1])[::-1] if n else np.empty(0)
        for i, p in enumerate(plans):
            theta = -np.inf
            if cursor is None and k > 0 and len(acc_docs) >= k:
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
            # a (term, doc) posting is LIVE in exactly ONE generation (older
            # versions are gen-masked), so iterating generations preserves
            # one-contribution-per-term-per-doc and the oracle's order
            for gen, reader in self.readers.get(p.bucket, ()):
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
                    if lmd_mu is not None:
                        block_ub = np.maximum(
                            0.0,
                            np.log(1.0 + mtf * p.idf)
                            + np.log(lmd_mu / (mdl + lmd_mu)),
                        )
                    else:
                        block_ub = (
                            p.idf * mtf * (K1 + 1.0)
                            / (mtf + K1 * (1.0 - B + B * mdl / avgdl_eff))
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
                    docs, tfs, dls, allowed, self.masked_for_gen(gen), blocked
                )
                if len(docs) == 0:
                    continue
                if lmd_mu is not None:
                    s = np.maximum(
                        0.0,
                        np.log(1.0 + tfs.astype(np.float64) * p.idf)
                        + np.log(lmd_mu / (dls.astype(np.float64) + lmd_mu)),
                    )
                else:
                    s = self._contrib(p.idf, tfs, dls, avgdl_eff)
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
        if cursor is not None:
            cs, cd, dp = cursor
            r = np.round(acc_scores, dp)
            keep = (r < cs) | ((r == cs) & (acc_docs > cd))
            acc_docs, acc_scores, r = acc_docs[keep], acc_scores[keep], r[keep]
            if len(acc_docs) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
            # select in the SAME rounded total order the cursor lives in, so
            # the page boundary can never straddle an unrounded tie
            order = np.lexsort((acc_docs, -r))[:k]
            return acc_docs[order], acc_scores[order]
        order = np.lexsort((acc_docs, -acc_scores))[:k]
        return acc_docs[order], acc_scores[order]


class ShardWorker:
    """Query-side state for a SUBSET of doc shards, loaded ONCE (T5): segment
    readers + tombstones per shard, and — lazily, only when a facet/filter
    query needs it — that shard's column-pruned slice of the forward
    ``_docs`` table. Used in-process by ``LocalSearcher`` and as a Ray actor
    by ``QueryPool``; on a real cluster each actor is placed on the node
    holding its shards (the always-warm per-shard analog of the reference's
    long-lived Solr server, SolrHelper.java:39-80).

    Everything corpus-scale (posting decode, boolean set ops, facet
    counting, predicate evaluation over ``_docs``) happens HERE, inside the
    worker — the driver only ever receives per-shard top-k heaps, facet
    count partials, or final match-id arrays."""

    def __init__(self, index_dir: str, shards: list[int] | None = None):
        from .update import list_segment_generations

        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        all_shards = sorted({s for s, _ in list_segment_generations(index_dir)})
        self.shards = sorted(shards) if shards is not None else all_shards
        self.scorers = {s: ShardScorer(index_dir, s) for s in self.shards}
        self._docs_cache: dict = {}   # (shard, cols) -> pa.Table slice
        self._filter_cache: dict = {}  # (shard, _expression_key(where)) -> ids
        self._docs_has_gen: bool | None = None

    def ready(self) -> bool:
        """Barrier: as an actor method this only returns once ``__init__``
        finished, i.e. every scorer's segment state is loaded — the hook
        ``get_pool`` uses to validate a pool against concurrent writers."""
        return True

    def refresh(self) -> bool:
        """Reopen against the index's CURRENT committed state, reusing
        unchanged segment readers (keyed by name + manifest mtime) — the
        Lucene ``IndexReader.reopen`` analog. After a small delta add only
        the new generation's dirs are opened; after a merge the rewritten
        bases miss the cache and reload. Superseded readers drop out of
        the cache and release their mmaps with the old scorer."""
        self.stats = read_stats(self.index_dir)
        self.scorers = {
            s: ShardScorer(self.index_dir, s,
                           reader_cache=old.reader_cache)
            for s, old in self.scorers.items()
        }
        self._docs_cache.clear()
        self._filter_cache.clear()
        self._docs_has_gen = None
        return True

    def ping(self) -> list[int]:
        return self.shards

    def _has_gen(self) -> bool:
        if self._docs_has_gen is None:
            from .update import _docs_columns

            self._docs_has_gen = "gen" in _docs_columns(
                os.path.join(self.index_dir, "_docs")
            )
        return self._docs_has_gen

    def _docs_slice(self, shard: int, columns: tuple[str, ...]) -> pa.Table:
        """Column-pruned, shard-predicate-pushdown read of _docs (cached)."""
        import pyarrow.dataset as pads

        key = (shard, columns)
        if key not in self._docs_cache:
            d = pads.dataset(os.path.join(self.index_dir, "_docs"))
            self._docs_cache[key] = d.to_table(
                filter=pads.field("shard") == shard, columns=list(columns)
            )
        return self._docs_cache[key]

    def _latest_live_docs(self, shard: int, extra_cols: tuple[str, ...] = ()) -> pd.DataFrame:
        """This shard's forward rows resolved to each doc's CURRENT version
        (max-gen row under replace semantics), minus docs whose current
        version is tombstone-masked."""
        cols = ("doc_id",) + (("gen",) if self._has_gen() else ()) + tuple(extra_cols)
        df = self._docs_slice(shard, cols).to_pandas()
        if self._has_gen():
            df = df.sort_values("gen", kind="mergesort").drop_duplicates(
                "doc_id", keep="last"
            )
            row_gen = df["gen"].to_numpy(np.int64)
        else:
            df = df.drop_duplicates("doc_id")
            row_gen = np.zeros(len(df), dtype=np.int64)
        sc = self.scorers[shard]
        if len(sc.tomb_ids):
            d = df["doc_id"].to_numpy(np.int64)
            pos = np.searchsorted(sc.tomb_ids, d)
            ok = pos < len(sc.tomb_ids)
            hit = np.zeros(len(d), dtype=bool)
            hit[ok] = sc.tomb_ids[pos[ok]] == d[ok]
            dead = np.zeros(len(d), dtype=bool)
            dead[hit] = sc.tomb_thr[np.searchsorted(sc.tomb_ids, d[hit])] > row_gen[hit]
            df = df[~dead]
        return df.reset_index(drop=True)

    def _filter_ids(self, shard: int, where) -> np.ndarray:
        """Sorted doc ids of THIS shard whose CURRENT version passes a
        pyarrow expression (old generations of a replaced doc don't count)."""
        import pyarrow.dataset as pads

        key = (shard, _expression_key(where))
        if key not in self._filter_cache:
            d = pads.dataset(os.path.join(self.index_dir, "_docs"))
            if self._has_gen():
                t = d.to_table(
                    filter=(pads.field("shard") == shard) & where,
                    columns=["doc_id", "gen"],
                )
                hits = t.to_pandas().groupby("doc_id")["gen"].max()
                latest = self._latest_live_docs(shard)
                lat = pd.Series(
                    latest["gen"].to_numpy(np.int64) if "gen" in latest.columns
                    else np.zeros(len(latest), np.int64),
                    index=latest["doc_id"].to_numpy(np.int64),
                )
                # a doc passes iff its LATEST live row matched the predicate
                common = hits.index.intersection(lat.index)
                ids = common[hits.loc[common] >= lat.loc[common]].to_numpy(np.int64)
            else:
                t = d.to_table(
                    filter=(pads.field("shard") == shard) & where, columns=["doc_id"]
                )
                ids = t["doc_id"].to_numpy()
            if len(self._filter_cache) > 64:
                self._filter_cache.clear()
            self._filter_cache[key] = np.sort(np.unique(ids))
        return self._filter_cache[key]

    def _match_ids(
        self, shard: int, plans: list[TermPlan], mode: str, n_query_terms: int
    ) -> np.ndarray:
        """Shard-local boolean retrieval (sorted ids). Correct per shard
        because a doc's postings live wholly inside its shard; masked
        generations (deletes / replaced-away versions) are excluded
        per-reader, so a replaced doc matches only via its live version."""
        scorer = self.scorers[shard]
        sets = []
        for p in plans:
            chunks = []
            for gen, reader in scorer.readers.get(p.bucket, ()):
                e = reader.term_entry(p.term)
                if e is None:
                    continue
                docs, _, _ = decode_posting_list(e["payload"], e["block_table"])
                m = scorer.masked_for_gen(gen)
                if m is not None:
                    docs = docs[~np.isin(docs, m, assume_unique=True)]
                if len(docs):
                    chunks.append(docs)
            sets.append(
                np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
            )
        if mode == "and":
            if len(plans) < n_query_terms or not sets:
                return np.empty(0, np.int64)  # an absent term empties an AND
            out = sets[0]
            for s_ in sets[1:]:
                out = out[np.isin(out, s_, assume_unique=True)]
        elif mode == "atleast":
            # Solr edismax mm: docs matching >= n_query_terms of the query's
            # clauses. Each set is per-term-unique, so per-doc occurrence
            # counts across the concatenation = distinct matched terms.
            # Absent terms contribute no set, so mm > len(plans) empties.
            if n_query_terms > len(plans) or not sets:
                return np.empty(0, np.int64)
            ids, counts = np.unique(np.concatenate(sets), return_counts=True)
            out = ids[counts >= n_query_terms]
        else:
            out = (
                np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
            )
        return out

    def match(self, plans: list[TermPlan], mode: str, n_query_terms: int) -> np.ndarray:
        parts = [self._match_ids(s, plans, mode, n_query_terms) for s in self.shards]
        return (
            np.concatenate(parts) if parts else np.empty(0, np.int64)
        )

    def _term_docs_positions(
        self, shard: int, plan: TermPlan, within: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One term's merged (docs, tfs, flat positions) in one shard —
        doc-sorted across generations, tombstone-masked (masked postings drop
        their position slices too, keeping the flat stream aligned).

        ``within``: optional SORTED doc-id whitelist — only blocks whose
        doc range intersects it are decoded (the skip-table analog of
        block-max WAND for phrase terms: a head term riding along in a
        phrase never pays a full posting decode once the rarest term has
        bounded the candidates)."""
        from .postings import decode_positions

        scorer = self.scorers[shard]
        d_chunks, t_chunks, p_chunks = [], [], []
        for gen, reader in scorer.readers.get(plan.bucket, ()):
            e = reader.term_entry(plan.term)
            if e is None or "pos_payload" not in e:
                continue
            bmask = None
            if within is not None:
                btab = e["block_table"]
                last = btab["last_doc"]
                first = np.empty_like(last)
                if len(last):
                    first[0] = 0
                    first[1:] = last[:-1] + 1
                lo = np.searchsorted(within, first, side="left")
                hi = np.searchsorted(within, last, side="right")
                bmask = hi > lo
                if not bmask.any():
                    continue
            docs, tfs, _dls = decode_posting_list(
                e["payload"], e["block_table"], bmask
            )
            pos = decode_positions(
                e["pos_payload"], e["block_table"]["pos_bytes"], tfs, bmask
            )
            m = scorer.masked_for_gen(gen)
            if m is not None:
                keep = ~np.isin(docs, m, assume_unique=True)
                pos = pos[np.repeat(keep, tfs)]
                docs, tfs = docs[keep], tfs[keep]
            if len(docs):
                d_chunks.append(docs)
                t_chunks.append(tfs)
                p_chunks.append(pos)
        if not d_chunks:
            e_ = np.empty(0, np.int64)
            return e_, e_.copy(), e_.copy()
        docs = np.concatenate(d_chunks)
        tfs = np.concatenate(t_chunks)
        pos = np.concatenate(p_chunks)
        if len(d_chunks) > 1:
            # a (term, doc) posting is live in exactly ONE generation, so a
            # doc-sort of the concatenation is a true merge; the flat
            # position stream is re-gathered per posting (segmented take)
            order = np.argsort(docs, kind="stable")
            starts = np.zeros(len(tfs), np.int64)
            np.cumsum(tfs[:-1], out=starts[1:])
            tfs_o = tfs[order]
            new_starts = np.zeros(len(tfs_o), np.int64)
            np.cumsum(tfs_o[:-1], out=new_starts[1:])
            total = int(tfs.sum())
            inner = np.arange(total, dtype=np.int64) - np.repeat(new_starts, tfs_o)
            pos = pos[np.repeat(starts[order], tfs_o) + inner]
            docs, tfs = docs[order], tfs_o
        return docs, tfs, pos

    def phrase_ids(
        self, queries: dict[int, tuple[list[TermPlan], list[str], int]]
    ) -> pa.Table:
        """Positional phrase / ordered-proximity matching over this worker's
        shards — no raw-text access. ``queries``: qid → (plans for the
        phrase's DISTINCT terms, phrase tokens in order, slop).

        Per (query, shard): decode each distinct term's postings+positions
        once, intersect doc sets (conjunctive bound), then a vectorized
        feasible-set sweep over ``candidate_ordinal * 2^32 + position`` keys:
        slot i+1 keeps a position q iff some kept slot-i position p of the
        same doc satisfies ``p < q <= p + slop + 1`` (slop=0 ⇒ exact
        adjacency — the same language as ``phrase.slop_pattern``). No
        per-doc Python loop; in-doc positions must fit in 32 bits (>4B-token
        docs don't exist)."""
        out_q: list[int] = []
        out_d: list[np.ndarray] = []
        for qid, spec in queries.items():
            # (plans, tokens, slop) or (plans, tokens, slop, max_start):
            # max_start bounds the FIRST token's 0-based position — the
            # Lucene SpanFirst predicate (span must begin within the first
            # max_start tokens)
            plans, tokens, slop = spec[0], spec[1], spec[2]
            max_start = spec[3] if len(spec) > 3 else None
            for s in self.shards:
                cand, S = self._occurrence_keys(s, plans, tokens, slop,
                                                max_start)
                if cand is not None and len(S):
                    ids = cand[np.unique(S >> np.int64(32))]
                    out_q.extend([int(qid)] * len(ids))
                    out_d.append(ids)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.int64)
                ),
            }
        )

    def _occurrence_keys(self, s, plans, tokens, slop, max_start=None):
        """One shard's phrase-occurrence sweep (the shared core of
        ``phrase_ids`` / ``span_not_ids``): returns (cand, S) where ``cand``
        is the sorted conjunctive candidate doc-id array and ``S`` the
        ascending ``candidate_ordinal * 2^32 + position`` keys of the FINAL
        slot of every surviving occurrence; (None, empty) when the shard
        cannot match."""
        K = np.int64(1) << np.int64(32)
        MASK32 = np.int64(0xFFFFFFFF)
        empty = np.empty(0, np.int64)
        by_term = {p.term: p for p in plans}
        if not tokens or any(t not in by_term for t in tokens):
            return None, empty  # a term absent from the vocab empties the AND
        # rarest term first (highest idf = lowest df): it bounds the
        # candidate set, and every later term decodes only the blocks
        # whose doc range intersects the running candidates — a head
        # term in a phrase never pays a full posting decode
        distinct = sorted(
            dict.fromkeys(tokens), key=lambda t: (-by_term[t].idf, t)
        )
        w = np.int64(int(slop) + 1)
        postings: dict[str, tuple] = {}
        cand: np.ndarray | None = None
        for t in distinct:
            dtp = self._term_docs_positions(s, by_term[t], within=cand)
            if len(dtp[0]) == 0:
                return None, empty
            postings[t] = dtp
            cand = (
                dtp[0] if cand is None
                else np.intersect1d(cand, dtp[0], assume_unique=True)
            )
            if len(cand) == 0:
                return None, empty

        def slot_keys(t: str) -> np.ndarray:
            docs, tfs, pos = postings[t]
            pidx = np.searchsorted(cand, docs)
            ok = pidx < len(cand)
            hit = np.zeros(len(docs), dtype=bool)
            hit[ok] = cand[pidx[ok]] == docs[ok]
            flat_ord = np.repeat(np.where(hit, pidx, -1), tfs)
            kept = flat_ord >= 0
            return flat_ord[kept] * K + pos[kept]

        S = slot_keys(tokens[0])
        if max_start is not None:
            S = S[(S & MASK32) < np.int64(max_start)]
        for t in tokens[1:]:
            if len(S) == 0:
                break
            Q = slot_keys(t)
            hi = np.searchsorted(S, Q, side="left")
            feas = hi > 0
            prev = S[np.maximum(hi - 1, 0)]
            feas &= (prev >> np.int64(32)) == (Q >> np.int64(32))
            feas &= (prev & MASK32) >= (Q & MASK32) - w
            S = Q[feas]
        return cand, S

    def span_not_ids(
        self, queries: dict[int, tuple]
    ) -> pa.Table:
        """Lucene SpanNotQuery over this worker's shards: docs with at least
        one EXACT-phrase occurrence not within ``dist`` tokens of any
        occurrence of the exclude term. ``queries``: qid → (plans, tokens,
        excl_plan_or_None, dist). excl_plan None (term not in vocabulary)
        means nothing is excluded. Exclusion is per-OCCURRENCE (a doc with
        one excluded and one clean occurrence still matches) — the Lucene
        include/exclude span semantics with pre = post = dist."""
        K = np.int64(1) << np.int64(32)
        MASK32 = np.int64(0xFFFFFFFF)
        out_q: list[int] = []
        out_d: list[np.ndarray] = []
        for qid, spec in queries.items():
            plans, tokens, excl_plan, dist = spec
            L = np.int64(len(tokens))
            d = np.int64(int(dist))
            for s in self.shards:
                cand, S = self._occurrence_keys(s, plans, tokens, 0)
                if cand is None or len(S) == 0:
                    continue
                if excl_plan is not None:
                    docs, tfs, pos = self._term_docs_positions(
                        s, excl_plan, within=cand
                    )
                    pidx = np.searchsorted(cand, docs)
                    ok = pidx < len(cand)
                    hit = np.zeros(len(docs), dtype=bool)
                    hit[ok] = cand[pidx[ok]] == docs[ok]
                    flat_ord = np.repeat(np.where(hit, pidx, -1), tfs)
                    kept = flat_ord >= 0
                    E = flat_ord[kept] * K + pos[kept]
                    if len(E):
                        ordv = S >> np.int64(32)
                        end = S & MASK32
                        start = end - (L - 1)
                        lo = ordv * K + np.maximum(start - d, 0)
                        hi = ordv * K + np.minimum(end + d, MASK32)
                        n_excl = (
                            np.searchsorted(E, hi, side="right")
                            - np.searchsorted(E, lo, side="left")
                        )
                        S = S[n_excl == 0]
                if len(S):
                    ids = cand[np.unique(S >> np.int64(32))]
                    out_q.extend([int(qid)] * len(ids))
                    out_d.append(ids)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.int64)
                ),
            }
        )

    def filter_ids(self, where) -> np.ndarray:
        parts = [self._filter_ids(s, where) for s in self.shards]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def facet_counts(
        self,
        facet_col: str,
        plans: list[TermPlan] | None,
        mode: str,
        n_query_terms: int,
    ) -> pd.DataFrame:
        """Facet-count PARTIAL over this worker's shards: (facet value,
        n_docs) — null facet values are a real group (dropna=False), matching
        SQL GROUP BY semantics."""
        frames = []
        for s in self.shards:
            df = self._latest_live_docs(s, extra_cols=(facet_col,))
            if plans is not None:
                m = self._match_ids(s, plans, mode, n_query_terms)
                df = df[np.isin(df["doc_id"].to_numpy(), m, assume_unique=True)]
            frames.append(
                df.groupby(facet_col, as_index=False, dropna=False).agg(
                    n_docs=("doc_id", "size")
                )
            )
        if not frames:
            return pd.DataFrame({facet_col: [], "n_docs": []})
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(facet_col, as_index=False, dropna=False)["n_docs"].sum()

    def grouped_partials(
        self,
        plans_by_qid: dict[int, tuple[int, list[TermPlan]]],
        group_col: str,
    ) -> pd.DataFrame:
        """Field-collapsing partials (Solr group.field): per (query, shard,
        group value) top-``n`` scored docs, n = the per-qid k. All scoring
        and the group join happen shard-locally against this worker's
        column-pruned ``_docs`` slice; only (groups x n) rows per shard
        reach the driver, which re-merges per-group heaps exactly.

        Boundary: grouping needs every matching doc scored (no top-k cut),
        so a stop-word query scores its full match set — same cost shape as
        facet counting over the match set."""
        frames = []
        for s in self.shards:
            scorer = self.scorers[s]
            meta = self._latest_live_docs(s, extra_cols=(group_col,))
            for qid, (n, plans) in plans_by_qid.items():
                if not plans:
                    continue
                docs, scores = scorer.score(plans, k=1 << 62)
                if len(docs) == 0:
                    continue
                df = pd.DataFrame({"doc_id": docs, "score": scores})
                df = df.merge(meta[["doc_id", group_col]], on="doc_id")
                df = df.sort_values(["score", "doc_id"],
                                    ascending=[False, True], kind="mergesort")
                df = df.groupby(group_col, dropna=False, sort=False).head(n)
                df.insert(0, "query_id", np.int64(qid))
                frames.append(df)
        if not frames:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
                group_col: pd.Series([], dtype=object),
            })
        return pd.concat(frames, ignore_index=True)

    def boosted_partials(
        self,
        plans_by_qid: dict[int, tuple[int, list[TermPlan]]],
        boost_col: str,
        weights: dict,
        default_w: float,
    ) -> pd.DataFrame:
        """Function-query boost partials (Solr ``boost=``): full-match-set
        BM25 scoring (same boundary as grouped_partials — a multiplicative
        boost can promote any matching doc, so no top-k cut before the
        boost), then ``boosted = score * w(meta[boost_col])`` and a
        per-shard top-``n`` heap on (boosted desc, doc_id asc). Only
        n x shards rows leave the worker."""
        frames = []
        for s in self.shards:
            scorer = self.scorers[s]
            meta = self._latest_live_docs(s, extra_cols=(boost_col,))
            for qid, (n, plans) in plans_by_qid.items():
                if not plans:
                    continue
                docs, scores = scorer.score(plans, k=1 << 62)
                if len(docs) == 0:
                    continue
                df = pd.DataFrame({"doc_id": docs, "score": scores})
                df = df.merge(meta[["doc_id", boost_col]], on="doc_id")
                if callable(weights):
                    # numeric function query (Solr recip()/linear() style):
                    # weights is a vectorized fn over the meta column
                    w = np.asarray(
                        weights(df[boost_col].to_numpy()), dtype=np.float64
                    )
                else:
                    w = (
                        df[boost_col]
                        .map(lambda v: weights.get(v, default_w))
                        .to_numpy(np.float64)
                    )
                df["boosted"] = df["score"].to_numpy(np.float64) * w
                df = df.sort_values(["boosted", "doc_id"],
                                    ascending=[False, True],
                                    kind="mergesort").head(n)
                df.insert(0, "query_id", np.int64(qid))
                frames.append(df[["query_id", "doc_id", "score", "boosted"]])
        if not frames:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
                "boosted": pd.Series([], dtype=np.float64),
            })
        return pd.concat(frames, ignore_index=True)

    def score(
        self,
        plans_by_qid: dict[int, tuple[int, list[TermPlan]]],
        where=None,
        require_all: bool = False,
        n_terms_by_qid: dict[int, int] | None = None,
        neg_plans_by_qid: dict[int, list[TermPlan]] | None = None,
        cursor_by_qid: dict[int, tuple[float, int, int]] | None = None,
        min_match_by_qid: dict[int, int] | None = None,
        avgdl_override: float | None = None,
        sim: tuple | None = None,
    ) -> pa.Table:
        """Score every query against this worker's shards → per-shard top-k
        partials as one (query_id, doc_id, score) table. Filter (``where``)
        and conjunctive (``require_all``) whitelists — and the NOT-clause
        blacklist (``neg_plans_by_qid``: docs matching ANY negative term are
        excluded, Solr ``a -b``) — are computed SHARD-LOCAL — nothing
        corpus-sized leaves the worker. ``cursor_by_qid`` carries per-query
        search-after marks (see ``ShardScorer.score``). ``avgdl_override``:
        the GLOBAL avgdl a federated scatter plans with (distributed-IDF
        semantics, index/federated.py); None = this index's own."""
        return self._score_impl(
            plans_by_qid, where, require_all, n_terms_by_qid,
            neg_plans_by_qid, cursor_by_qid, min_match_by_qid, None,
            avgdl_override, sim,
        )[0]

    def score_partial(
        self,
        plans_by_qid: dict[int, tuple[int, list[TermPlan]]],
        deadline_epoch: float,
        where=None,
        require_all: bool = False,
        n_terms_by_qid: dict[int, int] | None = None,
        neg_plans_by_qid: dict[int, list[TermPlan]] | None = None,
        cursor_by_qid: dict[int, tuple[float, int, int]] | None = None,
        min_match_by_qid: dict[int, int] | None = None,
    ) -> tuple[pa.Table, list[int]]:
        """Deadline-bounded variant (the Solr ``timeAllowed`` surface): stop
        scoring once ``time.time()`` passes ``deadline_epoch`` and ALSO
        return the list of query ids this worker fully scored (across all
        of its shards). The driver treats a query as exact only if EVERY
        worker completed it — partially-scored queries are dropped and
        reported, never returned with silently-wrong ranks. The deadline is
        an absolute epoch (single-node contract; a multi-node deployment
        would ship a per-call budget and re-anchor on actor-local clocks)."""
        return self._score_impl(
            plans_by_qid, where, require_all, n_terms_by_qid,
            neg_plans_by_qid, cursor_by_qid, min_match_by_qid,
            deadline_epoch, None,
        )

    def _score_impl(
        self,
        plans_by_qid,
        where,
        require_all,
        n_terms_by_qid,
        neg_plans_by_qid,
        cursor_by_qid,
        min_match_by_qid,
        deadline_epoch,
        avgdl_override=None,
        sim=None,
    ) -> tuple[pa.Table, list[int]]:
        import time as _time

        n_done: dict[int, int] = {int(q): 0 for q in plans_by_qid}
        expired = False
        out_q: list[int] = []
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for s in self.shards:
            if expired:
                break
            scorer = self.scorers[s]
            w_allowed = self._filter_ids(s, where) if where is not None else None
            for qid, (k, plans) in plans_by_qid.items():
                if deadline_epoch is not None and _time.time() >= deadline_epoch:
                    expired = True
                    break
                if not plans:
                    n_done[int(qid)] += 1
                    continue
                allowed = w_allowed
                if require_all:
                    nq = (n_terms_by_qid or {}).get(qid, len(plans))
                    conj = self._match_ids(s, plans, "and", nq)
                    allowed = (
                        conj if allowed is None
                        else np.intersect1d(allowed, conj, assume_unique=True)
                    )
                mm = (min_match_by_qid or {}).get(qid, 0)
                if mm > 1 and not require_all:
                    # edismax minimum-should-match: whitelist docs matching
                    # >= mm distinct query terms, shard-locally; surviving
                    # scores unchanged (mm gates matching, not scoring)
                    sub = self._match_ids(s, plans, "atleast", mm)
                    allowed = (
                        sub if allowed is None
                        else np.intersect1d(allowed, sub, assume_unique=True)
                    )
                if allowed is not None and len(allowed) == 0:
                    n_done[int(qid)] += 1
                    continue
                blocked = None
                neg = (neg_plans_by_qid or {}).get(qid)
                if neg:
                    blocked = np.sort(self._match_ids(s, neg, "or", len(neg)))
                docs, scores = scorer.score(
                    plans, k, allowed=allowed, blocked=blocked,
                    cursor=(cursor_by_qid or {}).get(qid),
                    avgdl=avgdl_override, sim=sim,
                )
                n_done[int(qid)] += 1
                if len(docs):
                    out_q.extend([int(qid)] * len(docs))
                    out_d.append(docs)
                    out_s.append(scores)
        n_shards = len(self.shards)
        done = sorted(q for q, c in n_done.items() if c == n_shards)
        table = pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(out_s) if out_s else np.empty(0, np.float64)
                ),
            }
        )
        return table, done


class LocalSearcher:
    """All shards in one process — conformance tests and per-query latency.
    At cluster scale the same state lives in ``QueryPool``'s shard-pinned
    actors and ``bm25_topk`` is the scatter/merge path."""

    def __init__(self, index_dir: str, shards: list[int] | None = None):
        self.index_dir = index_dir
        self.store = TermStatsStore(index_dir)
        self.worker = ShardWorker(index_dir, shards)

    def search(
        self, text: str, k: int, where=None, require_all: bool = False,
        not_text: str | None = None,
    ) -> list[tuple[int, float]]:
        """``where``: optional pyarrow dataset filter expression over the
        forward doc table's meta columns (e.g. ``pc.field("lang") == "py"``)
        — the facet/range-filter query surface (S6/J8).
        ``require_all``: conjunctive (AND) ranking — only docs containing
        every query term are scored; scores identical to the unrestricted
        query's (a Solr q.op=AND analog).
        ``not_text``: NOT clause (Solr ``a -b``) — docs containing ANY of
        its terms are excluded; surviving scores unchanged. All three
        restrictions are computed shard-locally inside the worker."""
        plans = self.store.plan_query(text)
        if not plans:
            return []
        nq = len(set(tokenize_text(self.store.qtext(text))))
        neg = self.store.plan_query(not_text) if not_text else []
        t = self.worker.score(
            {0: (k, plans)}, where=where, require_all=require_all,
            n_terms_by_qid={0: nq},
            neg_plans_by_qid={0: neg} if neg else None,
        )
        docs = t["doc_id"].to_numpy()
        scores = t["score"].to_numpy()
        if len(docs) == 0:
            return []
        order = np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]), float(scores[i])) for i in order]


class Bm25SearchActor:
    """Actor-pool query server (T5): segments + global stats loaded ONCE per
    actor in ``__init__``, then batches of queries score against warm state
    via ``map_batches(Bm25SearchActor, fn_constructor_args=(index_dir,))``.

    ``shards``: optional shard subset — on a real cluster each actor pins
    the shards co-located on its node (placement group per node) and the
    scatter path (``QueryPool``) fans queries out instead."""

    def __init__(self, index_dir: str, shards: list[int] | None = None):
        self.searcher = LocalSearcher(index_dir, shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_d, out_s = [], [], [], []
        nots = (
            batch["not_text"].to_pylist()
            if "not_text" in batch.column_names
            else [None] * batch.num_rows
        )
        for qid, text, k, nt in zip(
            batch["query_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["k"].to_pylist(),
            nots,
        ):
            for rank, (doc_id, score) in enumerate(
                self.searcher.search(text, int(k), not_text=nt), 1
            ):
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


class Bm25ServeStage:
    """Dataset-serve stage that REUSES the warm shard-pinned ``QueryPool``
    workers instead of loading every shard's segments per map_batches actor
    (which made the old path 4-5x slower than ``QueryPool.serve``).

    Per-actor ``__init__`` needs only the query-PLANNING state. When the
    caller passes ``snapshot_ref`` (``bm25_serve`` does — the warm pool's
    already-loaded term stats, ``ray.put`` once), the actor reconstructs the
    store from the object store instead of re-reading every termstats
    parquet bucket per actor (which made stage-actor startup dominate the
    serve pipeline at real vocab sizes)."""

    def __init__(self, index_dir: str, workers: list, snapshot_ref=None):
        if snapshot_ref is not None:
            import ray

            stats, buckets, ts_dir = ray.get(snapshot_ref)
            store = TermStatsStore.__new__(TermStatsStore)
            store.index_dir = index_dir
            store.stats = stats
            store._buckets = dict(buckets)
            store._ts_dir = ts_dir
            self.store = store
        else:
            self.store = TermStatsStore(index_dir)
        self.workers = workers

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        qids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        ks = batch["k"].to_pylist()
        plans_by_qid = {
            int(qid): (int(k), self.store.plan_query(text))
            for qid, text, k in zip(qids, texts, ks)
        }
        neg_plans_by_qid: dict[int, list] = {}
        if "not_text" in batch.column_names:
            for qid, nt in zip(qids, batch["not_text"].to_pylist()):
                neg = self.store.plan_query(nt) if nt else []
                if neg:
                    neg_plans_by_qid[int(qid)] = neg
        live = {q: v for q, v in plans_by_qid.items() if v[1]}
        if not live or not self.workers:
            return QueryPool._EMPTY_TOPK
        parts = ray.get(
            [
                w.score.remote(live, None, False, None,
                               neg_plans_by_qid or None, None)
                for w in self.workers
            ]
        )
        return _merge_topk_parts(live, parts)


# process-level cache for broadcast planning snapshots: a Ray worker process
# survives across tasks, so each process deserializes a given snapshot ONCE
# (keyed by the ObjectRef) no matter how many serve batches it executes
_SERVE_SNAP_CACHE: dict = {}


def _serve_snapshot_store(index_dir: str, snap_ref) -> TermStatsStore:
    key = snap_ref.hex()
    store = _SERVE_SNAP_CACHE.get(key)
    if store is None:
        import ray

        stats, buckets, ts_dir = ray.get(snap_ref)
        store = TermStatsStore.__new__(TermStatsStore)
        store.index_dir = index_dir
        store.stats = stats
        store._buckets = dict(buckets)
        store._ts_dir = ts_dir
        if len(_SERVE_SNAP_CACHE) > 8:
            _SERVE_SNAP_CACHE.clear()
        _SERVE_SNAP_CACHE[key] = store
    return store


def bm25_serve(index_dir: str, queries_ds, concurrency: int = 2, batch_size: int = 32):
    """Serve a query Dataset through the session's warm shard-pinned pool.

    TASK-based stage (not an actor pool): per-pipeline actor spawn was the
    dominant cost of the old path. Segment state lives in the cached pool's
    ``ShardWorker`` actors (handles ride the closure); planning state is the
    pool's force-loaded termstats broadcast once via ``ray.put`` and cached
    per worker PROCESS (``_SERVE_SNAP_CACHE``), so a serve batch pays one
    plan + one scatter and zero per-pipeline setup. ``concurrency`` caps
    in-flight batch tasks (each is a scatter across every shard worker —
    more in-flight than worker parallelism just queues)."""
    import ray

    pool = get_pool(index_dir)
    store = pool.store
    for b in range(int(store.stats["n_buckets"])):
        store._load_bucket(b)
    snap_ref = ray.put((store.stats, store._buckets, store._ts_dir))
    workers = list(pool.actors)

    def serve_batch(batch: pa.Table) -> pa.Table:
        stage = Bm25ServeStage.__new__(Bm25ServeStage)
        stage.store = _serve_snapshot_store(index_dir, snap_ref)
        stage.workers = workers
        return stage(batch)

    return queries_ds.map_batches(
        serve_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# QueryPool: shard-pinned actor pool + the distributed boolean/facet path
# ---------------------------------------------------------------------------

def _merge_topk_parts(live: dict, parts: list) -> pa.Table:
    """Merge per-shard score tables into per-query (rank, doc_id, score)
    top-k — ties break (score desc, doc_id asc), k from ``live[qid][0]``.
    Shared by ``QueryPool.topk_collect`` and ``Bm25ServeStage``."""
    merged = pa.concat_tables(parts).to_pandas()
    if len(merged) == 0:
        return QueryPool._EMPTY_TOPK
    frames = []
    for qid in sorted(live):
        k = live[qid][0]
        g = merged[merged["query_id"] == qid]
        if len(g) == 0:
            continue
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        frames.append(g[["query_id", "rank", "doc_id", "score"]])
    if not frames:
        return QueryPool._EMPTY_TOPK
    out = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


DEFAULT_POOL_ACTORS = 4
_POOL_CACHE_MAX = 3


class QueryPool:
    """Reusable pool of shard-pinned ``ShardWorker`` actors — scorer /
    reader / tombstone state loads ONCE per actor (T5), then every query
    batch, boolean match, facet count, or filter evaluation reuses it.

    Shards are assigned round-robin across ``n_actors`` actors; on a real
    cluster each actor would additionally carry a placement-group constraint
    pinning it to the node that holds its shards' segment files. Actors are
    created with ``num_cpus=0`` so a long-lived pool can never starve the
    Dataset tasks sharing the session of logical CPUs (the OS still
    schedules the real cores); a cluster deployment would use ``num_cpus=1``
    + placement groups instead."""

    # Solr queryResultCache analog: results cache on the POOL INSTANCE, so
    # invalidation rides the existing staleness machinery for free —
    # ``get_pool`` fingerprints the index (stats/tombstones/manifest
    # mtimes) and hands out a NEW pool after any mutation, which starts
    # with an empty cache. Capacity-bounded LRU; exact-key hits only.
    RESULT_CACHE_CAP = 128

    def __init__(self, index_dir: str, n_actors: int | None = None):
        from collections import OrderedDict

        from .update import list_segment_generations

        self.index_dir = index_dir
        self.store = TermStatsStore(index_dir)
        self.shards = sorted({s for s, _ in list_segment_generations(index_dir)})
        self.n_actors = min(n_actors or DEFAULT_POOL_ACTORS, max(1, len(self.shards)))
        self.actors: list = []
        self._result_cache: "OrderedDict[tuple, pa.Table]" = OrderedDict()
        self.cache_hits = 0
        self.cache_misses = 0
        self._spawn()

    def _spawn(self) -> None:
        """(Re)create the actor set — also the one-shot recovery path when
        an actor dies (OOM, node loss): every shard's state reloads from the
        durable segment store, so a respawn is always safe."""
        import ray

        self.shutdown()
        if not self.shards:
            return
        from .placement import pool_actor_options

        Worker = ray.remote(num_cpus=0)(ShardWorker)
        self.actors = [
            Worker.options(
                **pool_actor_options(self.index_dir,
                                     self.shards[i :: self.n_actors])
            ).remote(self.index_dir, self.shards[i :: self.n_actors])
            for i in range(self.n_actors)
        ]

    def wait_ready(self) -> None:
        """Block until every actor finished loading its shard state."""
        import ray

        if self.actors:
            ray.get([a.ready.remote() for a in self.actors])

    def refresh(self) -> None:
        """Reopen every shard actor in place against the index's current
        committed state (unchanged segment readers reused — see
        ShardWorker.refresh) and reload the driver-side planning store.
        Orders of magnitude cheaper than a teardown+respawn after a small
        delta add; falls back to a respawn if an actor died."""
        import ray

        from collections import OrderedDict

        self.store = TermStatsStore(self.index_dir)
        self._result_cache = OrderedDict()  # results may change: drop all
        self.cache_hits = 0
        self.cache_misses = 0
        try:
            ray.get([a.refresh.remote() for a in self.actors])
        except ray.exceptions.RayActorError:
            self._spawn()
            self.wait_ready()

    def _retrying(self, fn):
        """Run fn; on an actor failure respawn the pool and retry ONCE."""
        import ray

        try:
            return fn()
        except ray.exceptions.RayActorError:
            self._spawn()
            self.wait_ready()
            return fn()

    # -- BM25 scatter/merge --------------------------------------------------

    _EMPTY_TOPK = pa.table(
        {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
         "doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )

    def topk_submit(self, queries: pa.Table, where=None, require_all: bool = False):
        """Plan one query batch and dispatch it to every actor WITHOUT
        waiting — returns a handle for ``topk_collect``. Submitting several
        batches before collecting keeps every actor's queue full (the
        serving path).

        An optional ``not_text`` string column on ``queries`` carries each
        query's NOT clause (Solr ``a -b``): docs containing ANY of its terms
        are excluded from that query's ranking; surviving scores are
        unchanged. Exclusion sets are computed shard-locally in the actors.

        Optional ``cursor_score`` (float64) / ``cursor_doc`` (int64) columns
        carry a per-query search-after mark (Solr cursorMark): only docs
        strictly after (round(score, 6) desc, doc_id asc) = (cursor_score,
        cursor_doc) are ranked. Null cursor_score → no cursor for that row."""
        live, extras = self._plan_batch(queries)
        if not live or not self.actors:
            return (live, [])
        futures = [
            a.score.remote(
                live, where, require_all, extras["n_terms"],
                extras["neg"] or None, extras["cursor"] or None,
                extras["min_match"] or None,
            )
            for a in self.actors
        ]
        return (live, futures)

    def _plan_batch(self, queries: pa.Table):
        """Driver-side planning shared by the exact and deadline-bounded
        scatter paths: per-query term plans plus the optional NOT / cursor /
        min-match side channels."""
        qids = queries["query_id"].to_pylist()
        texts = queries["text"].to_pylist()
        ks = queries["k"].to_pylist()
        plans_by_qid = {
            int(qid): (int(k), self.store.plan_query(text))
            for qid, text, k in zip(qids, texts, ks)
        }
        n_terms_by_qid = {
            int(qid): len(set(tokenize_text(self.store.qtext(text))))
            for qid, text in zip(qids, texts)
        }
        neg_plans_by_qid: dict[int, list] = {}
        if "not_text" in queries.column_names:
            for qid, nt in zip(qids, queries["not_text"].to_pylist()):
                neg = self.store.plan_query(nt) if nt else []
                if neg:
                    neg_plans_by_qid[int(qid)] = neg
        min_match_by_qid: dict[int, int] = {}
        if "min_match" in queries.column_names:
            # Solr edismax mm: rank only docs matching >= min_match distinct
            # query terms (null/0/1 → no restriction)
            for qid, mm in zip(qids, queries["min_match"].to_pylist()):
                if mm is not None and int(mm) > 1:
                    min_match_by_qid[int(qid)] = int(mm)
        cursor_by_qid: dict[int, tuple[float, int, int]] = {}
        if "cursor_score" in queries.column_names:
            for qid, cs, cd in zip(
                qids,
                queries["cursor_score"].to_pylist(),
                queries["cursor_doc"].to_pylist(),
            ):
                if cs is not None:
                    cursor_by_qid[int(qid)] = (float(cs), int(cd), 6)
        live = {q: v for q, v in plans_by_qid.items() if v[1]}
        return live, {"n_terms": n_terms_by_qid, "neg": neg_plans_by_qid,
                      "cursor": cursor_by_qid, "min_match": min_match_by_qid}

    def topk_time_allowed(
        self, queries: pa.Table, time_allowed_s: float, where=None,
        require_all: bool = False,
    ) -> tuple[pa.Table, list[int]]:
        """Deadline-bounded scatter (Solr ``timeAllowed`` + partialResults):
        returns ``(topk_table, partial_qids)``. A query appears in the table
        only if EVERY worker finished it before the deadline (those rows are
        bit-identical to the exact path); the rest are listed in
        ``partial_qids`` — dropped, never returned with silently-wrong
        ranks. ``time_allowed_s <= 0`` degenerates to all-partial."""
        import time as _time

        live, extras = self._plan_batch(queries)
        if not live or not self.actors:
            return self._EMPTY_TOPK, sorted(int(q) for q in live)

        def run():
            import pyarrow.compute as pc_
            import ray

            deadline = _time.time() + max(0.0, float(time_allowed_s))
            futures = [
                a.score_partial.remote(
                    live, deadline, where, require_all, extras["n_terms"],
                    extras["neg"] or None, extras["cursor"] or None,
                    extras["min_match"] or None,
                )
                for a in self.actors
            ]
            results = ray.get(futures)
            done: set[int] = set(live)
            for _t, d in results:
                done &= set(d)
            parts = []
            for t, _d in results:
                if t.num_rows:
                    mask = pc_.is_in(t["query_id"],
                                     value_set=pa.array(sorted(done),
                                                        pa.int64()))
                    parts.append(t.filter(mask))
            if parts and done:
                merged = _merge_topk_parts(
                    {q: v for q, v in live.items() if q in done}, parts)
            else:
                merged = self._EMPTY_TOPK
            partial = sorted(int(q) for q in live if q not in done)
            return merged, partial

        return self._retrying(run)

    def topk_collect(self, handle) -> pa.Table:
        import ray

        live, futures = handle
        if not futures:
            return self._EMPTY_TOPK
        return _merge_topk_parts(live, ray.get(futures))

    @staticmethod
    def _cache_key(queries: pa.Table, where) -> str:
        """Fixed-size digest of the query table's serialized BYTES plus the
        filter expression's canonical string — not Python ``repr`` of either
        (a ``where`` object with a non-content-bearing repr would alias
        distinct filters, and repr of the table is O(total query text)
        rebuilt per call)."""
        import hashlib

        import pyarrow.ipc as ipc

        h = hashlib.sha256()
        sink = pa.BufferOutputStream()
        with ipc.new_stream(sink, queries.schema) as w:
            w.write_table(queries)
        h.update(sink.getvalue())
        if where is not None:
            h.update(_expression_key(where))
        return h.hexdigest()

    def topk(
        self, queries: pa.Table, where=None, require_all: bool = False
    ) -> pa.Table:
        """(query_id:int64, text:string, k:int32) → (query_id, rank, doc_id,
        score). Planning happens once on the driver; each actor returns only
        per-shard top-k heaps (k × n_shards rows per query), merged here.
        A dead actor triggers one pool respawn + retry. Results LRU-cache on
        the pool (see RESULT_CACHE_CAP) — an index mutation produces a new
        pool via ``get_pool``'s fingerprint, so stale hits can't happen."""
        key = (self._cache_key(queries, where), bool(require_all))
        hit = self._result_cache.get(key)
        if hit is not None:
            self._result_cache.move_to_end(key)
            self.cache_hits += 1
            return hit
        self.cache_misses += 1
        out = self._retrying(
            lambda: self.topk_collect(self.topk_submit(queries, where, require_all))
        )
        self._result_cache[key] = out
        while len(self._result_cache) > self.RESULT_CACHE_CAP:
            self._result_cache.popitem(last=False)
        return out

    def topk_lmd(self, queries: pa.Table, mu: float = 2000.0) -> pa.Table:
        """LM-Dirichlet ranked retrieval (Lucene LMDirichletSimilarity):
        same scatter/merge and block-max machinery as BM25, different
        per-posting contribution — planned via ``plan_query_lmd`` and
        executed with the ``sim=("lmd", mu)`` branch in the scorers."""
        import ray

        qids = queries["query_id"].to_pylist()
        texts = queries["text"].to_pylist()
        ks = queries["k"].to_pylist()
        live = {}
        for qid, text, k in zip(qids, texts, ks):
            plans = self.store.plan_query_lmd(text, mu)
            if plans:
                live[int(qid)] = (int(k), plans)
        if not live or not self.actors:
            return self._EMPTY_TOPK

        def run():
            futures = [
                a.score.remote(live, None, False, None, None, None, None,
                               None, ("lmd", float(mu)))
                for a in self.actors
            ]
            return _merge_topk_parts(live, ray.get(futures))

        return self._retrying(run)

    def serve(self, queries: pa.Table, chunk_size: int = 32) -> pa.Table:
        """High-throughput serving: split the query table into chunks and
        submit ALL of them before collecting any — actors pipeline their
        queues, driver merges stay off the critical path."""

        def run():
            chunks = [
                queries.slice(i, chunk_size)
                for i in range(0, queries.num_rows, chunk_size)
            ]
            handles = [self.topk_submit(c) for c in chunks]
            parts = [self.topk_collect(h) for h in handles]
            return pa.concat_tables(parts) if parts else self._EMPTY_TOPK

        return self._retrying(run)

    # -- boolean / facet / filter -------------------------------------------

    def _plan_boolean(self, text: str, mode: str):
        plans = self.store.plan_query(text)
        nq = len(set(tokenize_text(self.store.qtext(text))))
        if not plans or (mode == "and" and len(plans) < nq):
            return None, nq
        return plans, nq

    def matching_doc_ids(self, text: str, mode: str = "and") -> np.ndarray:
        import ray

        plans, nq = self._plan_boolean(text, mode)
        if plans is None or not self.actors:
            return np.empty(0, np.int64)

        def run():
            parts = ray.get([a.match.remote(plans, mode, nq) for a in self.actors])
            return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)

        return self._retrying(run)

    @property
    def has_positions(self) -> bool:
        """True iff the index stores per-posting token positions (built with
        ``BuildConfig(store_positions=True)``) — phrase queries then verify
        inside the index instead of re-reading candidate raw text."""
        return bool(self.store.stats.get("positions", False))

    def phrase_ids(
        self, phrases: dict[int, tuple]
    ) -> dict[int, np.ndarray]:
        """Positional phrase matching: ``phrases`` maps qid → (phrase text,
        slop) or (phrase text, slop, max_start) — ``max_start`` restricts
        the match to spans whose first token sits among the doc's first
        ``max_start`` tokens (Lucene SpanFirst). Returns qid → sorted
        matching doc ids (empty arrays for no-match / unplannable phrases).
        One scatter for ALL queries; each actor returns only
        (query_id, doc_id) pairs (bounded by the rarest term's df), and
        shards are disjoint doc populations so the merge is a
        concatenation."""
        import ray

        planned: dict[int, tuple] = {}
        for qid, spec in phrases.items():
            text, slop = spec[0], spec[1]
            toks = tokenize_text(self.store.qtext(text))
            entry = (self.store.plan_query(text), toks, int(slop))
            if len(spec) > 2 and spec[2] is not None:
                entry = entry + (int(spec[2]),)
            planned[int(qid)] = entry
        out = {int(q): np.empty(0, np.int64) for q in phrases}
        if not planned or not self.actors:
            return out

        def run():
            parts = ray.get([a.phrase_ids.remote(planned) for a in self.actors])
            merged = pa.concat_tables(parts)
            if merged.num_rows:
                df = merged.to_pandas()
                for qid, g in df.groupby("query_id"):
                    out[int(qid)] = np.sort(g["doc_id"].to_numpy(np.int64))
            return out

        return self._retrying(run)

    def span_not_ids(
        self, queries: dict[int, tuple]
    ) -> dict[int, np.ndarray]:
        """Lucene SpanNot matching: ``queries`` maps qid → (phrase text,
        exclude term, dist). Returns qid → sorted doc ids having at least
        one exact-phrase occurrence with no exclude-term occurrence within
        ``dist`` tokens of the span (pre = post = dist). Same scatter/merge
        shape as ``phrase_ids``."""
        import ray

        planned: dict[int, tuple] = {}
        for qid, (text, excl, dist) in queries.items():
            toks = tokenize_text(self.store.qtext(text))
            excl_toks = tokenize_text(self.store.qtext(excl))
            if len(excl_toks) != 1:
                raise ValueError(
                    f"span_not_ids wants a single exclude term, got {excl!r}"
                )
            eplans = self.store.plan_query(excl_toks[0])
            planned[int(qid)] = (
                self.store.plan_query(text), toks,
                eplans[0] if eplans else None, int(dist),
            )
        out = {int(q): np.empty(0, np.int64) for q in queries}
        if not planned or not self.actors:
            return out

        def run():
            parts = ray.get(
                [a.span_not_ids.remote(planned) for a in self.actors]
            )
            merged = pa.concat_tables(parts)
            if merged.num_rows:
                df = merged.to_pandas()
                for qid, g in df.groupby("query_id"):
                    out[int(qid)] = np.sort(g["doc_id"].to_numpy(np.int64))
            return out

        return self._retrying(run)

    def facet_counts(
        self, facet_col: str, text: str | None = None, mode: str = "and"
    ) -> pd.DataFrame:
        import ray

        plans: list[TermPlan] | None = None
        nq = 0
        if text is None:
            # whole-corpus facet: a streaming Dataset aggregation — never a
            # per-worker shard-slice materialization (the query-restricted
            # path below is bounded by the match set instead)
            return facet_counts_all_docs(self.index_dir, facet_col)
        if text is not None:
            plans, nq = self._plan_boolean(text, mode)
            if plans is None:  # zero-match query → empty facet table
                return pd.DataFrame({facet_col: [], "n_docs": []}).astype(
                    {"n_docs": np.int64}
                )
        parts = self._retrying(
            lambda: ray.get(
                [a.facet_counts.remote(facet_col, plans, mode, nq)
                 for a in self.actors]
            )
        ) if self.actors else []
        if not parts:
            return pd.DataFrame({facet_col: [], "n_docs": []}).astype(
                {"n_docs": np.int64}
            )
        out = (
            pd.concat(parts, ignore_index=True)
            .groupby(facet_col, as_index=False, dropna=False)["n_docs"].sum()
            .sort_values([facet_col], ignore_index=True)
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    def filter_doc_ids(self, where) -> np.ndarray:
        import ray

        if not self.actors:
            return np.empty(0, np.int64)
        parts = self._retrying(
            lambda: ray.get([a.filter_ids.remote(where) for a in self.actors])
        )
        return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)

    def grouped_topk(
        self, queries: pa.Table, group_col: str
    ) -> pd.DataFrame:
        """Field collapsing (Solr group.field): per query and per distinct
        ``group_col`` value, the top-k docs by (score desc, doc_id asc) —
        k from each query's ``k`` column. Returns (query_id, <group_col>,
        grp_rank, doc_id, score). Each actor ships per-(shard, group) heaps
        only; the exact per-group merge happens here."""
        import ray

        qids = queries["query_id"].to_pylist()
        texts = queries["text"].to_pylist()
        ks = queries["k"].to_pylist()
        plans_by_qid = {
            int(qid): (int(k), self.store.plan_query(text))
            for qid, text, k in zip(qids, texts, ks)
        }
        live = {q: v for q, v in plans_by_qid.items() if v[1]}
        empty = pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int64),
            group_col: pd.Series([], dtype=object),
            "grp_rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
        })
        if not live or not self.actors:
            return empty
        parts = self._retrying(
            lambda: ray.get(
                [a.grouped_partials.remote(live, group_col) for a in self.actors]
            )
        )
        merged = pd.concat(parts, ignore_index=True)
        if len(merged) == 0:
            return empty
        frames = []
        for qid in sorted(live):
            n = live[qid][0]
            g = merged[merged["query_id"] == qid]
            if len(g) == 0:
                continue
            g = g.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="mergesort")
            g = g.groupby(group_col, dropna=False, sort=False).head(n).copy()
            g["grp_rank"] = g.groupby(group_col, dropna=False).cumcount() + 1
            frames.append(g[["query_id", group_col, "grp_rank", "doc_id", "score"]])
        if not frames:
            return empty
        out = pd.concat(frames, ignore_index=True)
        out["grp_rank"] = out["grp_rank"].astype(np.int64)
        return out.sort_values(
            ["query_id", group_col, "grp_rank"], ignore_index=True
        )

    def boosted_topk(
        self,
        queries: pa.Table,
        boost_col: str,
        weights: dict,
        default_w: float = 1.0,
    ) -> pd.DataFrame:
        """Boost query (Solr ``boost=``): top-k per query by
        ``score * w(boost_col)``. ``weights`` is either a categorical
        ``{value: w}`` dict (with ``default_w``) or a VECTORIZED callable
        over the meta column (numeric function queries — recip()/linear());
        the callable ships to the actors once per call. Returns
        (query_id, doc_id, score, boosted)."""
        import ray

        qids = queries["query_id"].to_pylist()
        texts = queries["text"].to_pylist()
        ks = queries["k"].to_pylist()
        plans_by_qid = {
            int(qid): (int(k), self.store.plan_query(text))
            for qid, text, k in zip(qids, texts, ks)
        }
        live = {q: v for q, v in plans_by_qid.items() if v[1]}
        empty = pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
            "boosted": pd.Series([], dtype=np.float64),
        })
        if not live or not self.actors:
            return empty
        parts = self._retrying(
            lambda: ray.get([
                a.boosted_partials.remote(live, boost_col, weights, default_w)
                for a in self.actors
            ])
        )
        merged = pd.concat(parts, ignore_index=True)
        if len(merged) == 0:
            return empty
        frames = []
        for qid in sorted(live):
            n = live[qid][0]
            g = merged[merged["query_id"] == qid]
            if len(g) == 0:
                continue
            g = g.sort_values(["boosted", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(n)
            frames.append(g)
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True).reset_index(drop=True)

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        self.actors = []


def facet_counts_all_docs(index_dir: str, facet_col: str) -> pd.DataFrame:
    """Whole-corpus facet counts as a STREAMING Dataset aggregation.

    The only docs whose forward rows need version resolution are those in
    the (small) tombstone/replace threshold set — every other doc has
    exactly one live row. So: a vectorized per-batch count over the cold
    rows (tree-merged), plus a driver-side resolution of the hot rows
    (bounded by the threshold set, collected via a distributed filter)."""
    import ray
    import ray.data

    from ..state.aggregates import tree_aggregate
    from .update import _docs_columns, load_tombstone_thresholds

    docs_dir = os.path.join(index_dir, "_docs")
    has_gen = "gen" in _docs_columns(docs_dir)
    cols = ["doc_id", facet_col] + (["gen"] if has_gen else [])
    tomb_ids, tomb_thr = load_tombstone_thresholds(index_dir)
    tomb_ref = ray.put(tomb_ids)

    def _hot_mask(ids: np.ndarray) -> np.ndarray:
        tomb = ray.get(tomb_ref)
        if not len(tomb):
            return np.zeros(len(ids), dtype=bool)
        pos = np.searchsorted(tomb, ids)
        ok = pos < len(tomb)
        hit = np.zeros(len(ids), dtype=bool)
        hit[ok] = tomb[pos[ok]] == ids[ok]
        return hit

    def cold_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        cold = df[~_hot_mask(ids)]
        return cold.groupby(facet_col, as_index=False, dropna=False).agg(
            n_docs=("doc_id", "size")
        )

    ds = ray.data.read_parquet(docs_dir, columns=cols)
    counts = tree_aggregate(ds, [facet_col], cold_partial, {"n_docs": "sum"}).to_pandas()

    if len(tomb_ids):
        hot = ds.map_batches(
            lambda df: df[_hot_mask(df["doc_id"].to_numpy(np.int64))],
            batch_format="pandas",
        ).to_pandas()  # bounded by the threshold set × generations
        if len(hot):
            if has_gen:
                hot = hot.sort_values("gen", kind="mergesort").drop_duplicates(
                    "doc_id", keep="last"
                )
                row_gen = hot["gen"].to_numpy(np.int64)
            else:
                hot = hot.drop_duplicates("doc_id")
                row_gen = np.zeros(len(hot), dtype=np.int64)
            thr = tomb_thr[np.searchsorted(tomb_ids, hot["doc_id"].to_numpy(np.int64))]
            live = hot[thr <= row_gen]
            if len(live):
                extra = live.groupby(facet_col, as_index=False, dropna=False).agg(
                    n_docs=("doc_id", "size")
                )
                counts = (
                    pd.concat([counts, extra], ignore_index=True)
                    .groupby(facet_col, as_index=False, dropna=False)["n_docs"].sum()
                )
    counts = counts.sort_values([facet_col], ignore_index=True)
    counts["n_docs"] = counts["n_docs"].astype(np.int64)
    return counts


def _index_signature(index_dir: str) -> tuple:
    """Cheap staleness fingerprint: stats/tombstones mtimes + per-segment
    manifest mtimes (catches adds, deletes, AND in-place merges)."""
    sig: list = []
    for rel in ("_global/stats.json", "_global/tombstones.json"):
        p = os.path.join(index_dir, rel)
        try:
            st = os.stat(p)
            sig.append((rel, st.st_mtime_ns, st.st_size))
        except OSError:
            sig.append((rel, 0, 0))
    seg_root = os.path.join(index_dir, "segments")
    names = sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []
    for n in names:
        try:
            sig.append((n, os.stat(os.path.join(seg_root, n, "manifest.json")).st_mtime_ns))
        except OSError:
            sig.append((n, 0))
    # committed-generation markers: catches metadata-only generations
    # (update_fields) that touch neither stats nor any segment manifest
    gen_root = os.path.join(index_dir, "_global", "gens")
    if os.path.isdir(gen_root):
        sig.extend(("gen:" + n) for n in sorted(os.listdir(gen_root)))
    return tuple(sig)


_POOLS: dict[str, tuple[tuple, "QueryPool"]] = {}


def get_pool(index_dir: str, n_actors: int | None = None) -> QueryPool:
    """Cached pool per index dir; rebuilt when the index changes on disk.
    The cache is a small LRU so long test sessions over many scratch indexes
    don't accumulate actors. ``n_actors`` only applies at creation."""
    sig = _index_signature(index_dir)
    cached = _POOLS.get(index_dir)
    if cached is not None and cached[0] == sig:
        _POOLS[index_dir] = _POOLS.pop(index_dir)  # refresh LRU order
        return cached[1]
    if cached is not None:
        # the index changed under a live pool: REOPEN it in place
        # (unchanged segment readers reused, actors kept warm) instead of
        # paying a full teardown + respawn — Lucene reopen economics.
        pool = _POOLS.pop(index_dir)[1]
        refresh = pool.refresh
    else:
        while len(_POOLS) >= _POOL_CACHE_MAX:
            oldest = next(iter(_POOLS))
            _POOLS.pop(oldest)[1].shutdown()
        pool = None
        refresh = None
    # snapshot-consistent build/refresh: every shard actor (re)loads its
    # state, then the signature is re-read — if a writer committed DURING
    # the (re)build, different actors may hold different committed states,
    # so go again. Bounded retries: with a continuously-committing writer
    # the last attempt is still per-shard consistent (each scorer snapshot
    # is atomic), just not cross-shard identical — the steady-state pool
    # self-heals on the next get_pool call anyway.
    for _attempt in range(3):
        if refresh is not None:
            refresh()
        else:
            pool = QueryPool(index_dir, n_actors)
            refresh = pool.refresh
            pool.wait_ready()
        sig_after = _index_signature(index_dir)
        if sig_after == sig or _attempt == 2:
            break
        sig = sig_after
    _POOLS[index_dir] = (sig, pool)
    return pool


def get_pool_and_sig(index_dir: str, n_actors: int | None = None):
    """(pool, the index signature it reflects) — consumers that snapshot
    derived state alongside a pool (FederatedSearcher's merged global
    stats) compare signatures to know when their snapshot went stale,
    since the pool object itself is refreshed in place."""
    pool = get_pool(index_dir, n_actors)
    return pool, _POOLS[index_dir][0]


def shutdown_pools() -> None:
    for _sig, pool in _POOLS.values():
        pool.shutdown()
    _POOLS.clear()


def matching_doc_ids(index_dir: str, text: str, mode: str = "and") -> np.ndarray:
    """Boolean retrieval: sorted doc ids containing ALL ("and") or ANY
    ("or") of the query's terms — the reference's conjunctive facet
    predicate surface (`... AND types:repository`, IndexRecords.java:174).
    Tombstones excluded. Posting decode + set ops run inside the shard
    workers; the driver receives only the final id array."""
    return get_pool(index_dir).matching_doc_ids(text, mode)


def facet_counts(
    index_dir: str, facet_col: str, text: str | None = None, mode: str = "and"
) -> "pd.DataFrame":
    """Facet counting over the (optionally query-restricted) doc set — the
    Solr ``facet.field`` surface. Distributed: each shard worker computes its
    shard-local match set and counts facet values against its own
    column-pruned ``_docs`` slice; only (facet value, count) partials reach
    the driver. Null facet values form a real group (SQL GROUP BY parity)."""
    return get_pool(index_dir).facet_counts(facet_col, text, mode)


def lmd_topk(index_dir: str, queries: pa.Table, mu: float = 2000.0) -> pa.Table:
    """LM-Dirichlet top-k over the warm pool (see ``QueryPool.topk_lmd``)."""
    return get_pool(index_dir).topk_lmd(queries, mu)


def filter_doc_ids(index_dir: str, where) -> np.ndarray:
    """Sorted doc ids passing a pyarrow filter expression over _docs —
    evaluated shard-locally in the workers (column-pruned, predicate
    pushdown); prefer passing ``where=`` to the query paths directly, which
    keeps even the id arrays inside the workers."""
    return get_pool(index_dir).filter_doc_ids(where)


def explain(index_dir: str, text: str, doc_id: int) -> dict:
    """Per-term score breakdown for one document (Solr debugQuery analog):
    for each query term present in the doc — tf, dl, df, idf, contribution —
    plus the total. Sums in canonical term order, so ``total`` is
    bit-identical to the ranked score."""
    from .update import (
        folded_gens,
        list_segment_generations,
        live_gens,
        load_tombstone_thresholds,
        open_segment,
        segment_mask_gen,
    )

    store = TermStatsStore(index_dir)
    plans = store.plan_query(text)
    stats = store.stats
    shard = int(doc_id) % stats["n_shards"]
    gens = list_segment_generations(index_dir)
    tomb_ids, tomb_thr = load_tombstone_thresholds(index_dir)
    pos = np.searchsorted(tomb_ids, int(doc_id))
    doc_thr = (
        int(tomb_thr[pos])
        if pos < len(tomb_ids) and tomb_ids[pos] == int(doc_id)
        else -1
    )
    terms_out = []
    total = 0.0
    folded = folded_gens(index_dir)
    for p in plans:
        names = gens.get((shard, p.bucket), [])
        for name in live_gens(index_dir, names, folded=folded):
            if segment_mask_gen(index_dir, name) < doc_thr:
                continue  # this generation of the doc is masked (replaced/deleted)
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
    require_all: bool = False,
    concurrency: int | None = None,
) -> pa.Table:
    """Distributed scatter/merge BM25 over a queries table
    ``(query_id:int64, text:string, k:int32)`` → ``(query_id, rank, doc_id,
    score)``. An optional ``not_text`` column carries per-query NOT clauses
    (docs matching any negative term are excluded, scores unchanged).

    Routed through the cached shard-pinned ``QueryPool`` (T5): scorer state
    loads once per actor and is reused across calls; query planning happens
    once on the driver; each actor ships back only per-shard top-k heaps
    (k × n_shards rows per query) merged driver-side. ``where`` (a pyarrow
    expression over _docs meta columns) and ``require_all`` (conjunctive
    AND semantics) are evaluated shard-locally inside the actors — no
    corpus-sized whitelist ever reaches the driver."""
    pool = get_pool(index_dir, n_actors=concurrency)
    return pool.topk(queries, where=where, require_all=require_all)
