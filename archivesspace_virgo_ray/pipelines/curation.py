"""Corpus curation operators for training-data pipelines.

All decisions derive from the SQL-reproducible md5 64-bit hash primitive
(``functions.hashing.md5_u64``) or from already-oracled operators, so every
operator here is hash-checkable against DuckDB:

- ``hash_sample``: deterministic Bernoulli sampling — keep iff
  ``md5_u64(f"{salt}:{id}") < p * 2^64``. Stable across runs, cluster
  sizes, and partitionings (unlike ``Dataset.random_sample``), which is
  what reproducible corpus construction needs.
- ``split_assign``: train/val/test assignment from the same primitive with
  cumulative thresholds — every worker computes the same split for the
  same id, no coordination.
- ``corpus_clean``: the composition a pretraining-data pipeline actually
  runs — exact dedup (content winner) → minhash near-dup dedup over the
  survivors (cluster representative wins) → quality floor — returning the
  kept doc ids. Removal sets are broadcast (``ray.put``): they are
  distinct-hash/cluster-sized, orders of magnitude below the corpus; the
  hash-join swap for a pathological dup-rate is ``joins.hash_join`` on
  doc_id (same pattern as dedup.minhash_pairs' scale path). The exact-dedup
  broadcast carries only the DUPLICATED content hashes (dup-rate-sized),
  never the winner id set (which is ~corpus-sized on low-dup corpora).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_U64 = 1 << 64


def _hash_u64_vec(salt: str, ids: np.ndarray) -> np.ndarray:
    md5 = hashlib.md5
    pre = f"{salt}:".encode()
    return np.fromiter(
        (
            int.from_bytes(md5(pre + str(int(i)).encode()).digest()[:8], "big")
            for i in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def hash_sample(ds, p: float, id_col: str = "doc_id", salt: str = "s1"):
    """Deterministic Bernoulli sample: keep rows whose salted id hash falls
    below ``p`` of the 64-bit space. -> filtered Dataset (same schema)."""
    thresh = np.uint64(min(_U64 - 1, int(p * _U64)))

    def keep(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        h = _hash_u64_vec(salt, t[id_col].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_assign(
    ds,
    weights: tuple = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    id_col: str = "doc_id",
    salt: str = "split1",
):
    """Adds a ``split`` column by cumulative hash thresholds. Weights must
    sum to 1; the last split absorbs the rounding remainder."""
    names = [n for n, _ in weights]
    cum = np.cumsum([w for _, w in weights])
    cuts = [np.uint64(min(_U64 - 1, int(c * _U64))) for c in cum[:-1]]

    def assign(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        h = _hash_u64_vec(salt, t[id_col].to_numpy(zero_copy_only=False))
        split = np.full(len(h), names[-1], dtype=object)
        # assign from the last cut downward so earlier (lower) ranges win
        for name, cut in zip(reversed(names[:-1]), reversed(cuts)):
            split[h < cut] = name
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(
    ds,
    rates: dict,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix1",
    default_p: float = 1.0,
):
    """Per-group deterministic Bernoulli sampling — the "domain mixing" step
    of corpus construction (downsample over-represented domains to a target
    mixture, cf. The Pile / DoReMi mixture weights). Keep iff
    ``md5_u64(f"{salt}:{id}") < rates[group] * 2^64``; groups absent from
    ``rates`` use ``default_p``. Same primitive as ``hash_sample``, so the
    decision is partition-, cluster-size- and run-invariant, and a row kept
    at rate p stays kept at any rate >= p (nested samples for free).

    Scale: stateless per-batch filter; the rates map is closure-captured
    (tiny — one entry per domain), never shuffled."""
    items = {
        k: np.uint64(min(_U64 - 1, int(p * _U64))) for k, p in rates.items()
    }
    dthresh = np.uint64(min(_U64 - 1, int(default_p * _U64)))

    def keep(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        h = _hash_u64_vec(salt, t[id_col].to_numpy(zero_copy_only=False))
        groups = t[group_col].to_pylist()
        th = np.fromiter(
            (items.get(g, dthresh) for g in groups),
            dtype=np.uint64, count=len(groups),
        )
        return t.filter(pa.array(h < th))

    return ds.map_batches(keep, batch_format="pyarrow")


def decontaminate(
    ds,
    eval_texts: dict,
    shingle_w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Benchmark decontamination (the n-gram-overlap check run before LM
    training, cf. GPT-2/3 and The Pile appendices): report every training
    doc sharing at least one ``shingle_w``-token shingle with an eval/
    benchmark document. -> Dataset (doc_id, eval_id, n_shared) with
    n_shared = distinct shared shingles.

    Scale shape: benchmarks are tiny by definition, so the inverted
    shingle -> eval-ids map is built once and broadcast (``ray.put``); the
    corpus pass is a stateless per-batch lookup — no shuffle. A
    pathologically large eval set would flip to a shingle hash join
    (``joins.hash_join``), same downstream shape."""
    import ray

    from ..functions.tokenize import TOKEN_RE

    def shingles(text: str) -> set:
        toks = TOKEN_RE.findall(text.lower())
        toks = [t for t in toks if t]
        return {
            " ".join(toks[i:i + shingle_w])
            for i in range(len(toks) - shingle_w + 1)
        }

    inv: dict = {}
    for eid, text in eval_texts.items():
        for s in shingles(text):
            inv.setdefault(s, []).append(int(eid))
    inv = {s: sorted(set(v)) for s, v in inv.items()}
    inv_ref = ray.put(inv)

    def check(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        m = ray.get(inv_ref)
        out_doc, out_eval, out_n = [], [], []
        for did, text in zip(
            t[id_col].to_numpy(zero_copy_only=False), t[text_col].to_pylist()
        ):
            counts: dict = {}
            for s in shingles(text):
                for eid in m.get(s, ()):
                    counts[eid] = counts.get(eid, 0) + 1
            for eid in sorted(counts):
                out_doc.append(int(did))
                out_eval.append(eid)
                out_n.append(counts[eid])
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "eval_id": pa.array(out_eval, pa.int64()),
            "n_shared": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(check, batch_format="pyarrow")


# Above this many rows corpus_clean stops materializing the exact-dedup
# survivor slice (re-reading the source three times beats spilling a
# near-corpus-sized materialization through the object store). ~5M docs ×
# ~2 KB text ≈ 10 GB — the cluster-RAM knee on the bench box.
CORPUS_CLEAN_MATERIALIZE_MAX_ROWS = 5_000_000


def corpus_clean(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    near_threshold: float = 0.7,
    n_perm: int = 128,
    bands: int = 32,
    n_rows: int | None = None,
    materialize_survivors: bool | None = None,
):
    """Exact dedup → near-dup dedup → quality floor. -> Dataset of kept
    ``(doc_id,)`` rows.

    Stage order matters and is part of the contract (and the oracle): the
    minhash pass runs over the EXACT-dedup survivors only, so a pile of
    byte-identical boilerplate can't blow up LSH buckets, and the quality
    floor applies last (a dropped near-dup never resurrects a low-quality
    doc)."""
    import ray

    from ..functions.tokenize import token_counts_batch
    from .dedup import exact_dedup, md5_hex, minhash_dedup

    # broadcast only the DUPLICATED content hashes (dup-rate-sized — the
    # winner set itself is ~corpus-sized on low-dup corpora and must never
    # be the broadcast side): a doc survives iff its content hash is
    # unduplicated OR it is the group's winner. The n_dupes>1 filter runs
    # INSIDE the Dataset so only the dup-rate-sized slice ever reaches the
    # driver — the distinct-hash table itself stays distributed (and, with
    # ``n_rows`` past the threshold, multi-block via the keyed shuffle).
    dups = (
        exact_dedup(ds, text_col=text_col, id_col=id_col, n_rows=n_rows)
        .map_batches(
            lambda df: df.loc[df["n_dupes"] > 1].reset_index(drop=True),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if "content_md5" not in dups.columns:  # all blocks empty: no dupes
        dups = pd.DataFrame({"content_md5": [], "keep_doc_id": []})
    dup_map = dict(zip(dups["content_md5"], dups["keep_doc_id"].astype(np.int64)))
    dup_ref = ray.put(dup_map)

    def filter_exact(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(dup_ref)
        ids = df[id_col].to_numpy(np.int64)
        if not m:
            return df.reset_index(drop=True)
        hashes = md5_hex(df[text_col].to_numpy())
        keep = np.fromiter(
            (h not in m or m[h] == i for h, i in zip(hashes, ids)),
            dtype=bool, count=len(ids),
        )
        return df.loc[keep].reset_index(drop=True)

    # the survivor slice is consumed three times downstream (minhash
    # signatures, candidate text slice, final keep pass) — materialize once
    # so the corpus scan + broadcast filter don't re-execute per consumer.
    # Scale switch: past CORPUS_CLEAN_MATERIALIZE_MAX_ROWS the re-read wins —
    # three cheap parallel parquet scans beat spilling the filtered corpus
    # through the object store; at bench/cluster-RAM scale the
    # materialization wins. Auto-decided from n_rows when the caller knows
    # it; pass materialize_survivors explicitly to force either path.
    if materialize_survivors is None:
        materialize_survivors = (
            n_rows is None or n_rows <= CORPUS_CLEAN_MATERIALIZE_MAX_ROWS
        )
    survivors = ds.map_batches(filter_exact, batch_format="pandas")
    if materialize_survivors:
        survivors = survivors.materialize()

    # near-dup clusters over the survivors; drop everyone but the rep
    clusters = minhash_dedup(
        survivors, threshold=near_threshold, n_perm=n_perm, bands=bands
    )
    cl = clusters.to_pandas() if hasattr(clusters, "to_pandas") else clusters
    dropped = np.sort(
        cl.loc[cl["doc_id"] != cl["rep_id"], "doc_id"].to_numpy(np.int64)
    )
    dropped_ref = ray.put(dropped)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        d = ray.get(dropped_ref)
        pos = np.searchsorted(d, ids)
        is_dropped = (pos < len(d)) & (d[np.clip(pos, 0, max(len(d) - 1, 0))] == ids) if len(d) else np.zeros(len(ids), bool)
        ntok = token_counts_batch(df[text_col].to_numpy())
        ok = (~is_dropped) & (ntok >= min_tokens)
        return pd.DataFrame({id_col: pd.Series(ids[ok], dtype=np.int64)})

    return survivors.map_batches(final, batch_format="pandas")


class HashedLinearScorerStage:
    """Feature-hashed linear text classifier scoring (the fastText /
    Vowpal-Wabbit inference shape): actor-pool stage whose weight table is
    materialized ONCE per actor (T1 pattern), scoring each batch with one
    tokenize + factorize + integer dot product.

    The weight for feature bucket ``i`` (token md5 mod ``n_buckets``) is
    ``((i * 2654435761) % 2000001) / 1e6 - 1`` — a deterministic surrogate
    for a trained artifact (swap in real weights via ``weights=``; the
    plumbing — hashing, broadcast-sized table, batched scoring — is the
    template). With surrogate weights every piece is integer arithmetic
    until the final divide, so the doc score is EXACTLY order-independent
    and bit-reproducible by a SQL oracle:

        z = bias + (S/1e6 - n_tokens) / n_tokens,  S = sum_i k[h(t_i)]*tf_i
        p = 1 / (1 + exp(-z))

    Docs with zero tokens emit no row."""

    def __init__(self, n_buckets: int = 65536, bias: float = 0.1,
                 weights: np.ndarray | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.n_buckets = n_buckets
        self.bias = float(bias)
        self.id_col, self.text_col = id_col, text_col
        if weights is not None:
            self.k = None
            self.w = np.asarray(weights, dtype=np.float64)
        else:
            i = np.arange(n_buckets, dtype=np.int64)
            self.k = (i * 2654435761) % 2000001  # int weight numerators
            self.w = None

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import md5_u64
        from ..functions.tokenize import batch_term_doc_tf

        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_tokens": pd.Series([], dtype=np.int64),
            "z": pd.Series([], dtype=np.float64),
            "p": pd.Series([], dtype=np.float64),
        })
        if len(df) == 0:
            return empty
        terms, doc_ids, tfs, _ = batch_term_doc_tf(
            df[self.id_col].to_numpy(), df[self.text_col].to_numpy()
        )
        if len(terms) == 0:
            return empty
        uniq, inv = np.unique(terms, return_inverse=True)
        fi = np.fromiter(
            (int(md5_u64(t)) % self.n_buckets for t in uniq),
            dtype=np.int64, count=len(uniq),
        )[inv]
        docs, dinv = np.unique(doc_ids, return_inverse=True)
        n_tok = np.bincount(dinv, weights=tfs.astype(np.float64),
                            minlength=len(docs)).astype(np.int64)
        if self.k is not None:
            s_int = np.bincount(
                dinv, weights=(self.k[fi] * tfs).astype(np.float64),
                minlength=len(docs),
            )
            # exact while S < 2^53 (n_buckets*2e6 per token; fine per doc)
            z = self.bias + (s_int / 1e6 - n_tok) / n_tok
        else:
            s = np.bincount(dinv, weights=self.w[fi] * tfs, minlength=len(docs))
            z = self.bias + s / n_tok
        p = 1.0 / (1.0 + np.exp(-z))
        return pd.DataFrame({
            "doc_id": pd.Series(docs, dtype=np.int64),
            "n_tokens": pd.Series(n_tok, dtype=np.int64),
            "z": pd.Series(np.round(z, 6), dtype=np.float64),
            "p": pd.Series(np.round(p, 6), dtype=np.float64),
        })


def classifier_scores(ds, n_buckets: int = 65536, bias: float = 0.1,
                      weights: np.ndarray | None = None,
                      id_col: str = "doc_id", text_col: str = "text",
                      concurrency: int = 4):
    """documents Dataset -> (doc_id, n_tokens, z, p): one streaming
    actor-pool pass; weight table built once per actor; no shuffle."""
    return ds.map_batches(
        HashedLinearScorerStage,
        fn_constructor_args=(n_buckets, bias, weights, id_col, text_col),
        batch_format="pandas",
        concurrency=(1, concurrency),
    )


def deterministic_shuffle(ds, id_col: str = "doc_id", seed: str = "42",
                          out_col: str = "shuffle_pos"):
    """Seeded global shuffle for training export (the "randomize example
    order before sharding to trainers" step): every row gets
    ``shuffle_pos`` = its 1-based rank under ``md5(f"{seed}:{id}")`` order
    (id tiebreak via a fixed-width suffix, making the sort key unique).
    Deterministic across runs, cluster sizes, and partitionings — unlike
    ``Dataset.random_shuffle``. Cost: one sort shuffle + two streaming
    passes (``state.scan.ordered_row_number``); driver state is one row
    per block. Reshuffling between epochs = a new ``seed``."""
    from ..state.scan import ordered_row_number

    md5 = hashlib.md5
    pre = f"{seed}:".encode()

    def key(t):
        import pyarrow as pa

        ids = t[id_col].to_numpy(zero_copy_only=False)
        ks = [
            md5(pre + str(int(i)).encode()).hexdigest() + f"{int(i):020d}"
            for i in ids
        ]
        return t.append_column("_shuffle_key", pa.array(ks, pa.string()))

    out = ordered_row_number(
        ds.map_batches(key, batch_format="pyarrow"), "_shuffle_key", out_col
    )
    return out.drop_columns(["_shuffle_key"])


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023 shape)
# ---------------------------------------------------------------------------


def dsir_weights(
    ds,
    target_mask_fn,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
):
    """DSIR importance weights over hashed unigram features.

    Pass 1 (model): ONE distributed pass accumulates per-bucket token counts
    for the whole corpus (raw) and for the rows where ``target_mask_fn(df)``
    is True (target); the keyed tree aggregation returns the
    ``n_buckets``-sized count table to the driver — the model IS the
    broadcast side, the corpus never shuffles. Token → bucket is
    ``md5_u64(token) % n_buckets`` (the repo's SQL-reproducible hash
    contract), hashed once per batch-distinct token.

    Pass 2 (score): per-doc AVG log importance ratio — the doc's bucket
    counts dotted with the broadcast ``ln p_target(b) - ln p_raw(b)`` vector
    (0.5/half-vocab additive smoothing on both sides) — plus the
    deterministic Gumbel selection key DSIR's sampling-without-replacement
    uses: ``g = -ln(-ln(u))``, ``u = (md5_u64(salt:id) + 0.5) / 2^64``.

    -> Dataset ``(doc_id, n_tokens, logratio, gkey)``; ``logratio`` is
    6-dp-rounded and ``gkey = round(logratio + g, 6)``, so selection =
    sort by (gkey desc, doc_id) — fully reproducible in SQL."""
    import ray

    from ..functions.hashing import md5_u64
    from ..functions.tokenize import tokenize_text
    from ..state.aggregates import tree_aggregate

    def bucket_counts(texts, cache: dict) -> tuple[np.ndarray, np.ndarray]:
        """(per-doc dense bucket-count matrix is never built — returns the
        flat (doc_ord, bucket) stream for one batch)."""
        doc_ord, buckets = [], []
        for i, t in enumerate(texts):
            for tok in tokenize_text(t):
                b = cache.get(tok)
                if b is None:
                    b = int(md5_u64(tok) % np.uint64(n_buckets))
                    cache[tok] = b
                doc_ord.append(i)
                buckets.append(b)
        return (np.asarray(doc_ord, dtype=np.int64),
                np.asarray(buckets, dtype=np.int64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tgt = np.asarray(target_mask_fn(df), dtype=bool)
        doc_ord, buckets = bucket_counts(df[text_col].to_numpy(object), {})
        braw = np.bincount(buckets, minlength=n_buckets)
        btgt = (np.bincount(buckets[tgt[doc_ord]], minlength=n_buckets)
                if len(buckets) else np.zeros(n_buckets, np.int64))
        nz = np.flatnonzero(braw)
        return pd.DataFrame(
            {"bucket": nz.astype(np.int64),
             "cf_raw": braw[nz].astype(np.int64),
             "cf_tgt": btgt[nz].astype(np.int64)}
        )

    model = tree_aggregate(
        ds, ["bucket"], partial, {"cf_raw": "sum", "cf_tgt": "sum"}
    ).to_pandas()
    cf_raw = np.zeros(n_buckets, np.int64)
    cf_tgt = np.zeros(n_buckets, np.int64)
    bidx = model["bucket"].to_numpy(np.int64)
    cf_raw[bidx] = model["cf_raw"].to_numpy(np.int64)
    cf_tgt[bidx] = model["cf_tgt"].to_numpy(np.int64)
    nr, nt = float(cf_raw.sum()), float(cf_tgt.sum())
    lr = (np.log((cf_tgt + 0.5) / (nt + 0.5 * n_buckets))
          - np.log((cf_raw + 0.5) / (nr + 0.5 * n_buckets)))
    lr_ref = ray.put(lr)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lrv = ray.get(lr_ref)
        ids = df[id_col].to_numpy(np.int64)
        doc_ord, buckets = bucket_counts(df[text_col].to_numpy(object), {})
        n = (np.bincount(doc_ord, minlength=len(df)).astype(np.int64)
             if len(doc_ord) else np.zeros(len(df), np.int64))
        s = (np.bincount(doc_ord, weights=lrv[buckets], minlength=len(df))
             if len(doc_ord) else np.zeros(len(df), np.float64))
        logratio = np.round(
            np.where(n > 0, s / np.maximum(n, 1), 0.0), 6
        )
        u = (_hash_u64_vec(salt, ids).astype(np.float64) + 0.5) / float(_U64)
        gum = -np.log(-np.log(u))
        return pd.DataFrame(
            {"doc_id": ids,
             "n_tokens": n,
             "logratio": logratio,
             "gkey": np.round(logratio + gum, 6)}
        )

    return ds.map_batches(score, batch_format="pandas")


def dsir_sample(ds, target_mask_fn, n_keep: int, **kw):
    """DSIR selection: the ``n_keep`` docs with the largest Gumbel-perturbed
    importance keys (= sampling without replacement proportional to the
    importance weights). Per-batch partial top-k; only ~n_keep rows per
    block reach the driver merge. -> pandas (doc_id, n_tokens, logratio,
    gkey) in selection order."""
    w = dsir_weights(ds, target_mask_fn, **kw)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["gkey", "doc_id"], ascending=[False, True]
        ).head(n_keep)

    top = w.map_batches(part, batch_format="pandas").to_pandas()
    return top.sort_values(
        ["gkey", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(n_keep)


def temperature_sample(
    ds,
    group_col: str = "source",
    tau: float = 0.5,
    budget_frac: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp",
):
    """UniMax-style temperature-balanced domain sampling (single-pass
    variant): per-group keep rate ``r_d = min(1, T·w_d / n_d)`` with
    ``w_d = n_d^τ / Σ n^τ`` and budget ``T = budget_frac · n_total``; τ < 1
    upweights small domains toward uniform. Budget freed by rate-capped
    groups is NOT redistributed (that iterative water-filling refinement is
    deliberately out of contract — the single-pass rule stays exactly
    SQL-checkable).

    ONE keyed tree pass counts the groups (the group-count model broadcasts;
    the corpus never shuffles); keep decisions are the repo's
    coordination-free md5-threshold Bernoulli — the 6-dp-rounded rate scales
    by the exact power of two 2^64 and compares as INTEGERS against the
    salted id hash, so engine and DuckDB agree bit-for-bit (rate ≥ 1 keeps
    unconditionally, avoiding the 2^64 overflow lane).

    -> Dataset ``(doc_id, <group_col>, rate, keep)``, one row per input."""
    import math

    import ray

    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False).size()
        return pd.DataFrame(
            {group_col: g.index.to_numpy(object), "n": g.to_numpy(np.int64)}
        )

    counts = tree_aggregate(ds, [group_col], partial, {"n": "sum"}).to_pandas()
    n = counts["n"].to_numpy(np.float64)
    n_total = float(n.sum())
    z = float((n ** tau).sum())
    rate = np.round(
        np.minimum(1.0, (budget_frac * n_total) * (n ** tau / z) / n), 6
    )
    table = {
        g: (float(r), np.uint64(min(_U64 - 1, int(math.floor(r * 2.0 ** 64)))))
        for g, r in zip(counts[group_col].tolist(), rate.tolist())
    }
    ref = ray.put(table)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        ids = df[id_col].to_numpy(np.int64)
        grp = df[group_col].to_numpy(object)
        r = np.fromiter((m[g][0] for g in grp), np.float64, len(df))
        thr = np.fromiter((m[g][1] for g in grp), np.uint64, len(df))
        h = _hash_u64_vec(salt, ids)
        return pd.DataFrame(
            {"doc_id": ids, group_col: grp, "rate": r,
             "keep": (r >= 1.0) | (h < thr)}
        )

    return ds.map_batches(keep, batch_format="pandas")


def line_dedup(
    ds,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    expected_lines: int | None = None,
):
    """CCNet-style cross-document line deduplication (boilerplate removal):
    drop every line whose md5 line-hash occurs in ≥ ``min_df`` DISTINCT
    documents (headers, footers, navigation chrome — the lines that repeat
    across a crawl).

    Pass 1: per-doc DISTINCT line hashes → keyed tree aggregation of doc
    frequencies (``expected_lines`` hints the distinct-line cardinality so
    the keyed bucket shuffle engages past the driver threshold — at corpus
    scale the line-hash table must never land on one worker). Only the
    ≥ min_df slice (boilerplate-sized, orders below the line table)
    broadcasts. Pass 2 rewrites each doc keeping non-boilerplate lines in
    order. Matching is BY HASH on both engine and oracle, so md5 collisions
    (negligible) cannot diverge the two sides.

    -> Dataset ``(doc_id, text, n_lines, n_dropped)``."""
    import ray

    from ..functions.hashing import md5_u64
    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hashes = []
        for t in df[text_col]:
            seen = {int(md5_u64(ln)) for ln in t.split("\n")}
            hashes.extend(seen)
        arr = np.asarray(hashes, dtype=np.uint64).astype(np.int64)
        uniq, cnt = np.unique(arr, return_counts=True)
        return pd.DataFrame({"line_hash": uniq, "df": cnt.astype(np.int64)})

    dfreq = tree_aggregate(
        ds, ["line_hash"], partial, {"df": "sum"}, expected_rows=expected_lines
    )
    bp_parts = dfreq.map_batches(
        lambda d: d.loc[d["df"] >= min_df, ["line_hash"]].reset_index(drop=True),
        batch_format="pandas",
    ).to_pandas()
    bp = np.sort(bp_parts["line_hash"].to_numpy(np.int64)) if len(bp_parts) \
        else np.empty(0, np.int64)
    bp_ref = ray.put(bp)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(bp_ref)
        ids = df[id_col].to_numpy(np.int64)
        texts, n_lines, n_dropped = [], [], []
        for t in df[text_col]:
            lines = t.split("\n")
            if len(bset):
                h = np.fromiter(
                    (int(md5_u64(ln)) for ln in lines), np.uint64, len(lines)
                ).astype(np.int64)
                pos = np.searchsorted(bset, h)
                ok = pos < len(bset)
                drop = np.zeros(len(lines), dtype=bool)
                drop[ok] = bset[pos[ok]] == h[ok]
            else:
                drop = np.zeros(len(lines), dtype=bool)
            texts.append("\n".join(ln for ln, d in zip(lines, drop) if not d))
            n_lines.append(len(lines))
            n_dropped.append(int(drop.sum()))
        return pd.DataFrame(
            {"doc_id": ids, "text": texts,
             "n_lines": pd.Series(n_lines, dtype=np.int64),
             "n_dropped": pd.Series(n_dropped, dtype=np.int64)}
        )

    return ds.map_batches(rewrite, batch_format="pandas")


def intra_doc_line_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """WITHIN-document repeated-line removal (the intra-doc half of CCNet
    line dedup; `line_dedup` handles the cross-document boilerplate half):
    keep the FIRST occurrence of each line inside a document, drop later
    repeats. Purely map-shaped — each doc is wholly inside its batch, no
    shuffle, no broadcast state — so it scales with input bytes alone.

    -> Dataset ``(doc_id, text, n_lines, n_dropped)``.
    """

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        texts, n_lines, n_dropped = [], [], []
        for t in df[text_col]:
            lines = t.split("\n")
            seen: set[str] = set()
            kept = []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            texts.append("\n".join(kept))
            n_lines.append(len(lines))
            n_dropped.append(len(lines) - len(kept))
        return pd.DataFrame(
            {"doc_id": ids, "text": texts,
             "n_lines": pd.Series(n_lines, dtype=np.int64),
             "n_dropped": pd.Series(n_dropped, dtype=np.int64)}
        )

    return ds.map_batches(rewrite, batch_format="pandas")


def substring_span_dedup(
    ds,
    k: int = 5,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    expected_shingles: int | None = None,
):
    """Exact duplicated-substring REMOVAL (the rewrite half of Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better";
    ``dedup.shingle_pairs`` is the detection half): drop every token covered
    by a ``k``-token shingle whose md5 hash occurs in ≥ ``min_df`` DISTINCT
    documents. Output text is the single-space join of the kept tokens —
    the tokenizer contract (lowercase, split on ``[^a-z0-9_]+``) is shared
    with the SQL oracle, so the rewrite is hash-checkable end to end.

    Same two-pass shape as ``line_dedup`` one level down the granularity
    ladder: pass 1 tree-aggregates per-doc DISTINCT shingle-hash doc
    frequencies (``expected_shingles`` engages the keyed bucket shuffle past
    the driver threshold — at corpus scale the shingle table must never land
    on one worker); only the ≥ min_df slice (dup-rate-sized) broadcasts.
    Pass 2 re-tokenizes each doc, marks covered positions with a
    difference-array sweep (O(tokens), overlap-safe), and rewrites. Matching
    is BY HASH on both sides, so md5 collisions (negligible) cannot diverge
    engine and oracle.

    -> Dataset ``(doc_id, text, n_tokens, n_removed)``."""
    import ray

    from ..functions.hashing import md5_u64
    from ..functions.tokenize import TOKEN_RE
    from ..state.aggregates import tree_aggregate

    findall = TOKEN_RE.findall

    def _shingle_hashes(toks: list[str]) -> np.ndarray:
        n = len(toks) - k + 1
        if n <= 0:
            return np.empty(0, np.int64)
        return np.fromiter(
            (int(md5_u64(" ".join(toks[i : i + k]))) for i in range(n)),
            np.uint64,
            n,
        ).astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hashes: list[np.ndarray] = []
        for t in df[text_col]:
            h = _shingle_hashes(findall(t.lower()))
            if len(h):
                hashes.append(np.unique(h))
        arr = (
            np.concatenate(hashes) if hashes else np.empty(0, np.int64)
        )
        uniq, cnt = np.unique(arr, return_counts=True)
        return pd.DataFrame({"sh_hash": uniq, "df": cnt.astype(np.int64)})

    dfreq = tree_aggregate(
        ds, ["sh_hash"], partial, {"df": "sum"}, expected_rows=expected_shingles
    )
    dup_parts = dfreq.map_batches(
        lambda d: d.loc[d["df"] >= min_df, ["sh_hash"]].reset_index(drop=True),
        batch_format="pandas",
    ).to_pandas()
    dup = np.sort(dup_parts["sh_hash"].to_numpy(np.int64)) if len(dup_parts) \
        else np.empty(0, np.int64)
    dup_ref = ray.put(dup)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        dset = ray.get(dup_ref)
        ids = df[id_col].to_numpy(np.int64)
        texts, n_tokens, n_removed = [], [], []
        for t in df[text_col]:
            toks = findall(t.lower())
            n = len(toks)
            removed = 0
            if n >= k and len(dset):
                h = _shingle_hashes(toks)
                pos = np.searchsorted(dset, h)
                ok = pos < len(dset)
                is_dup = np.zeros(len(h), dtype=bool)
                is_dup[ok] = dset[pos[ok]] == h[ok]
                starts = np.flatnonzero(is_dup)
                if len(starts):
                    # difference-array coverage sweep: +1 at each dup start,
                    # -1 past its span end; covered = running sum > 0
                    diff = np.zeros(n + 1, np.int64)
                    np.add.at(diff, starts, 1)
                    np.add.at(diff, starts + k, -1)
                    covered = np.cumsum(diff[:n]) > 0
                    removed = int(covered.sum())
                    toks = [tk for tk, c in zip(toks, covered) if not c]
            texts.append(" ".join(toks))
            n_tokens.append(n)
            n_removed.append(removed)
        return pd.DataFrame(
            {"doc_id": ids, "text": texts,
             "n_tokens": pd.Series(n_tokens, dtype=np.int64),
             "n_removed": pd.Series(n_removed, dtype=np.int64)}
        )

    return ds.map_batches(rewrite, batch_format="pandas")


def ccnet_ppl_buckets(ds, text_col: str = "text", id_col: str = "doc_id",
                      lang_col: str = "lang"):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020: the head /
    middle / tail split that decides which crawl slices are kept for LM
    training): score every doc with the corpus-trained bigram LM (this
    repo's KenLM proxy — ``textstats.bigram_logprob``), then cut each
    language into three equal-count buckets by score rank. head = highest
    avg log-prob (lowest perplexity).

    Ranking uses the ROUNDED (6 dp) score with a doc_id tie-break on BOTH
    engine and oracle, so IEEE summation noise cannot flip a bucket
    boundary; bucket sizes mirror SQL ``NTILE(3)`` exactly (the first
    ``n % 3`` buckets of a language take the extra row). The per-language
    rank is a distributed segmented scan (``state/scan.grouped_prefix_sum``
    — the one sort shuffle any per-language window pays; driver state is
    one row per (block, language-in-block)); per-language totals are a
    facet-sized keyed aggregation broadcast into the final map.

    -> Dataset ``(doc_id, lang, avg_logprob, ppl_bucket)``."""
    import ray

    from ..state.aggregates import tree_aggregate
    from ..state.scan import grouped_prefix_sum
    from .textstats import bigram_logprob

    scored = bigram_logprob(ds, text_col=text_col, id_col=id_col,
                            keep_cols=(lang_col,))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, lang_col, "avg_logprob"]].copy()
        out["neg_lp"] = -out["avg_logprob"].to_numpy(np.float64)
        out["one"] = np.int64(1)
        return out

    prepped = scored.map_batches(prep, batch_format="pandas")
    ranked = grouped_prefix_sum(
        prepped, lang_col, ["neg_lp", id_col], "one", out_col="rnk"
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(lang_col).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    totals = tree_aggregate(
        prepped, [lang_col], count_partial, {"n": "sum"}
    ).to_pandas()
    n_ref = ray.put(dict(zip(totals[lang_col], totals["n"].astype(np.int64))))
    names = np.array(["head", "middle", "tail"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        nb = ray.get(n_ref)
        n = df[lang_col].map(nb).to_numpy(np.int64)
        r = df["rnk"].to_numpy(np.int64)
        q, rem = n // 3, n % 3
        cut = rem * (q + 1)
        # NTILE(3): first `rem` buckets hold q+1 rows, the rest q
        tile = np.where(
            r <= cut,
            (r - 1) // np.maximum(q + 1, 1) + 1,
            rem + (r - cut - 1) // np.maximum(q, 1) + 1,
        )
        out = df[[id_col, lang_col, "avg_logprob"]].copy()
        out["ppl_bucket"] = names[tile - 1]
        return out

    return ranked.map_batches(bucketize, batch_format="pandas")


def contrastive_crops(ds, crop_len: int = 12, text_col: str = "text",
                      id_col: str = "doc_id", salt: str = "crop1"):
    """Contrastive positive-pair construction (the Contriever / SimCSE-style
    independent-cropping recipe: two spans of one document form a positive
    training pair): for every doc with ≥ 2·crop_len tokens, emit two
    deterministic NON-overlapping crop_len-token windows. Offsets derive
    from the SQL-reproducible md5 hash of the salted doc id — crop A starts
    at ``hA % (n − 2L + 1)``, crop B uniformly in the region right of A —
    so pairs are stable across runs, partitionings and cluster sizes
    (auditable training data, same contract as ``hash_sample``). Map-only.

    -> Dataset ``(doc_id, crop_a, crop_b)`` (space-joined lowercase tokens,
    the shared tokenizer contract)."""
    from ..functions.tokenize import TOKEN_RE

    findall = TOKEN_RE.findall
    L = int(crop_len)

    def crops(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        out_id, out_a, out_b = [], [], []
        if len(df):
            ha = _hash_u64_vec(f"{salt}:a", ids)
            hb = _hash_u64_vec(f"{salt}:b", ids)
            for i, t in enumerate(df[text_col]):
                toks = findall(t.lower())
                n = len(toks)
                if n < 2 * L:
                    continue
                a = int(ha[i] % np.uint64(n - 2 * L + 1))
                lo_b = a + L
                b = lo_b + int(hb[i] % np.uint64(n - L - lo_b + 1))
                out_id.append(int(ids[i]))
                out_a.append(" ".join(toks[a:a + L]))
                out_b.append(" ".join(toks[b:b + L]))
        return pd.DataFrame({
            "doc_id": pd.Series(out_id, dtype=np.int64),
            "crop_a": pd.Series(out_a, dtype=object),
            "crop_b": pd.Series(out_b, dtype=object),
        })

    return ds.map_batches(crops, batch_format="pandas")


def doc_novelty(
    ds,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    expected_shingles: int | None = None,
):
    """Per-document novelty score: the fraction of a doc's DISTINCT
    ``k``-token shingles that appear in NO other document — the
    memorization/novelty signal that separates boilerplate-heavy docs from
    genuinely new text (the scoring complement of ``substring_span_dedup``'s
    rewrite; Lee et al. 2022 §5 measure).

    Same two-pass shape: pass 1 tree-aggregates distinct shingle-hash doc
    frequencies (``expected_shingles`` engages the keyed bucket shuffle past
    the driver threshold); the ≥2-df slice (dup-rate-sized) broadcasts once
    via ``ray.put``. Pass 2 re-shingles each doc and counts members of the
    dup set with one searchsorted — no per-shingle Python in the hot loop
    beyond the documented md5 contract. Docs shorter than ``k`` tokens have
    no shingles and are omitted (mirrored by the oracle's ``len(t) >= k``).

    -> Dataset ``(doc_id, n_shingles, n_dup, novel_frac)``."""
    import ray

    from ..functions.hashing import md5_u64
    from ..functions.tokenize import TOKEN_RE
    from ..state.aggregates import tree_aggregate

    findall = TOKEN_RE.findall

    def _shingle_hashes(toks: list[str]) -> np.ndarray:
        n = len(toks) - k + 1
        if n <= 0:
            return np.empty(0, np.int64)
        return np.fromiter(
            (int(md5_u64(" ".join(toks[i : i + k]))) for i in range(n)),
            np.uint64,
            n,
        ).astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hashes: list[np.ndarray] = []
        for t in df[text_col]:
            h = _shingle_hashes(findall(t.lower()))
            if len(h):
                hashes.append(np.unique(h))
        arr = np.concatenate(hashes) if hashes else np.empty(0, np.int64)
        uniq, cnt = np.unique(arr, return_counts=True)
        return pd.DataFrame({"sh_hash": uniq, "df": cnt.astype(np.int64)})

    dfreq = tree_aggregate(
        ds, ["sh_hash"], partial, {"df": "sum"}, expected_rows=expected_shingles
    )
    dup_parts = dfreq.map_batches(
        lambda d: d.loc[d["df"] >= 2, ["sh_hash"]].reset_index(drop=True),
        batch_format="pandas",
    ).to_pandas()
    dup = np.sort(dup_parts["sh_hash"].to_numpy(np.int64)) if len(dup_parts) \
        else np.empty(0, np.int64)
    dup_ref = ray.put(dup)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dset = ray.get(dup_ref)
        ids, n_sh, n_dup = [], [], []
        for i, t in zip(df[id_col].to_numpy(np.int64), df[text_col]):
            h = np.unique(_shingle_hashes(findall(t.lower())))
            if not len(h):
                continue
            pos = np.searchsorted(dset, h)
            ok = pos < len(dset)
            d = int((dset[pos[ok]] == h[ok]).sum()) if len(dset) else 0
            ids.append(int(i))
            n_sh.append(len(h))
            n_dup.append(d)
        n_sh_a = np.asarray(n_sh, np.int64)
        n_dup_a = np.asarray(n_dup, np.int64)
        frac = np.round(1.0 - n_dup_a / np.maximum(n_sh_a, 1), 6) \
            if len(n_sh_a) else np.empty(0, np.float64)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=np.int64),
            "n_shingles": pd.Series(n_sh_a, dtype=np.int64),
            "n_dup": pd.Series(n_dup_a, dtype=np.int64),
            "novel_frac": pd.Series(frac, dtype=np.float64),
        })

    return ds.map_batches(score, batch_format="pandas")
