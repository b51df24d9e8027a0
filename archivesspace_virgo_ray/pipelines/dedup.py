"""Deduplication operators for large-scale training-data pipelines.

All are Dataset-shaped: vectorized signature computation in ``map_batches``,
bucketing via groupby shuffles of SMALL signature tables (never the raw
text), verification only on candidate pairs. Families:

- exact: content-hash partition + per-group min-doc_id winner
- MinHash + LSH: shingle → minhash signature → banded buckets → candidate
  pairs → exact Jaccard verify → min-label connected components
- SimHash: 64-bit fingerprints, banded buckets, Hamming verify
- n-gram Jaccard: the pairwise verifier, also usable standalone
- embedding cosine near-dup: random-hyperplane LSH buckets + cosine verify
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..functions.hashing import md5_u64
from ..functions.tokenize import tokenize_text

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def md5_hex(texts) -> np.ndarray:
    h = hashlib.md5
    return np.fromiter(
        (h(t.encode("utf-8")).hexdigest() for t in texts),
        dtype=object,
        count=len(texts),
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                n_rows: int | None = None,
                keyed_fallback_rows: int | None = None):
    """-> Dataset (content_md5, keep_doc_id, n_dupes). Winner = min id.

    Pre-aggregates per batch (min id + count per hash) before the shuffle, so
    the groupby moves one row per distinct hash per batch, not per doc.

    Scale path: content hashes are ~unique, so the distinct-hash table is
    CORPUS-sized — pass ``n_rows`` (the input row count, free from parquet
    metadata) and past ``keyed_fallback_rows`` the reduction goes straight to
    a keyed bucket shuffle (multi-block output, no single-worker — or even
    fanin-worker — funnel). Without the hint, ``tree_aggregate`` still flips
    to the keyed shuffle once the materialized level-1 table exceeds the
    threshold; the hint just avoids concentrating corpus-sized partials on
    ``fanin`` workers first.
    """

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"content_md5": md5_hex(df[text_col].to_numpy()), id_col: df[id_col]}
        )
        g = out.groupby("content_md5", as_index=False).agg(
            keep_doc_id=(id_col, "min"), n_dupes=(id_col, "size")
        )
        return g

    from ..state.aggregates import KEYED_FALLBACK_ROWS, tree_aggregate

    # tree merge instead of groupby().map_groups: one Python call per
    # DISTINCT HASH (~n_docs calls) is Ray's per-group overhead worst case.
    return tree_aggregate(
        ds, ["content_md5"], sig, {"keep_doc_id": "min", "n_dupes": "sum"},
        keyed_fallback_rows=(
            KEYED_FALLBACK_ROWS if keyed_fallback_rows is None
            else keyed_fallback_rows
        ),
        expected_rows=n_rows,
    )


# ---------------------------------------------------------------------------
# shingles + exact Jaccard (the verifier)
# ---------------------------------------------------------------------------


def word_shingles(text: str, k: int = 3) -> set[str]:
    toks = tokenize_text(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit shingle hashes via the first 16 hex chars of md5 — chosen
    (like simhash64's token hash) because the DuckDB oracle reproduces it
    exactly, making the whole minhash/LSH surface oracle-checkable."""
    sh = word_shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    return np.fromiter((md5_u64(s) for s in sh), dtype=np.uint64, count=len(sh))


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    """n_perm minhash values; vectorized (n_shingles × n_perm via broadcast)."""
    hv = _shingle_hashes(text, k)
    # (a*x + b) mod p, computed in python-int free numpy via uint64 with
    # modular reduction on 61-bit Mersenne prime
    x = hv.astype(np.uint64)
    prod = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return prod.min(axis=0)


# slab bound for the batched signature kernel: 2048 shingles × 128 perms
# × 8 B = 2 MB per temporary — keeps the (mul, add, mod) intermediates
# L2-resident; measured 3-4× faster than a whole-batch slab, which is
# memory-bandwidth-bound on three ~27 MB temporaries
_SIG_SLAB_SHINGLES = 2048
# per-actor shingle→hash cache bound; cleared (not LRU'd) when exceeded —
# duplicate docs and boilerplate shingles dominate well before this
_SIG_CACHE_MAX = 2_000_000


_FNV_BASIS = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _shingle_hashes_fast(text: str, k: int, token_cache: dict) -> np.ndarray:
    """The CODED 100-TB swap point for the md5-per-shingle contract hash:
    one md5 per unique TOKEN (cached across docs — vocabulary is Zipfian,
    so almost every lookup hits) + a vectorized FNV rolling combine over
    each k-token window. ~20× fewer Python hash calls than hashing every
    shingle string; different hash VALUES than `_shingle_hashes` (so NOT
    oracle-checkable — opt-in via ``hash_kind="fast"``), but the same LSH
    collision statistics, and the exact-Jaccard verify downstream is
    hash-independent."""
    toks = tokenize_text(text)
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    th = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        v = token_cache.get(t)
        if v is None:
            v = md5_u64(t)
            token_cache[t] = v
        th[i] = v
    n_sh = len(toks) - k + 1
    if n_sh < 1:
        h = _FNV_BASIS
        for v in th:
            h = (h ^ v) * _FNV_PRIME
        return np.array([h], dtype=np.uint64)
    h = np.full(n_sh, _FNV_BASIS, dtype=np.uint64)
    for j in range(k):
        h = (h ^ th[j : j + n_sh]) * _FNV_PRIME
    return np.unique(h)  # set semantics, same as word_shingles' set


# auto-gate for the fast shingle hash: inputs this large put the md5-per-
# shingle contract hash on the critical path (measured: 1.1M realistic docs
# 211 s md5 vs 146 s fast, identical verified pairs — SCALE.md). Every
# oracle-gated entry reads sf-dir parquet far below this, so "auto" keeps
# the md5/DuckDB signature parity exactly where it is checked.
_FAST_HASH_INPUT_BYTES = 1 << 28  # 256 MiB


def _resolve_hash_kind(hash_kind: str, ds) -> str:
    """Resolve ``hash_kind="auto"`` from the input size WITHOUT executing:
    probe ``size_bytes()`` only where it is metadata-cheap (a bare read or a
    MaterializedDataset — a transformed lazy plan would run the whole
    pipeline under it) and fall back to the md5 contract when unknown."""
    if hash_kind != "auto":
        return hash_kind
    est = None
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            est = ds.size_bytes()
        elif type(ds._logical_plan.dag).__name__ == "Read":
            est = ds.size_bytes()
    except Exception:
        est = None
    return "fast" if est and est >= _FAST_HASH_INPUT_BYTES else "md5"


def minhash_signatures_batch(
    texts,
    a: np.ndarray,
    b: np.ndarray,
    k: int = 3,
    cache: dict | None = None,
    hash_kind: str = "md5",
) -> np.ndarray:
    """Batched ``minhash_signature``: bit-identical output, one md5 per
    UNIQUE shingle (min over a set ignores duplicates, and ``cache`` carries
    hashes across docs/batches within an actor), and one
    ``np.minimum.reduceat`` per slab instead of a Python loop over docs.
    ``hash_kind="fast"`` swaps the shingle-string md5 for the cached
    token-hash rolling combine (`_shingle_hashes_fast`) — the scale path,
    not oracle-checkable."""
    n = len(texts)
    n_perm = len(a)
    out = np.empty((n, n_perm), dtype=np.uint64)
    if n == 0:
        return out
    if cache is not None and len(cache) > _SIG_CACHE_MAX:
        cache.clear()
    zero1 = np.zeros(1, dtype=np.uint64)
    hv_list = []
    if hash_kind == "fast":
        tok_cache = cache if cache is not None else {}
        hv_list = [_shingle_hashes_fast(t, k, tok_cache) for t in texts]
    else:
        for t in texts:
            sh = word_shingles(t, k)
            if not sh:
                hv_list.append(zero1)  # mirrors _shingle_hashes' empty-doc row
                continue
            arr = np.empty(len(sh), dtype=np.uint64)
            if cache is None:
                for i, s in enumerate(sh):
                    arr[i] = md5_u64(s)
            else:
                for i, s in enumerate(sh):
                    v = cache.get(s)
                    if v is None:
                        v = md5_u64(s)
                        cache[s] = v
                    arr[i] = v
            hv_list.append(arr)
    mersenne = np.uint64(_MERSENNE)
    start = 0
    while start < n:
        end, tot = start, 0
        while end < n and (tot == 0 or tot + len(hv_list[end]) <= _SIG_SLAB_SHINGLES):
            tot += len(hv_list[end])
            end += 1
        hv = np.concatenate(hv_list[start:end])
        lens = np.fromiter((len(h) for h in hv_list[start:end]), dtype=np.int64)
        offs = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        prod = (hv[:, None] * a[None, :] + b[None, :]) % mersenne
        out[start:end] = np.minimum.reduceat(prod, offs, axis=0)
        start = end
    return out


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor (T1 analog)."""

    def __init__(self, n_perm: int = 128, k: int = 3, seed: int = 7):
        self.a, self.b = _perm_params(n_perm, seed)
        self.k = k
        self.n_perm = n_perm
        self._cache: dict = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = minhash_signatures_batch(
            list(df["text"]), self.a, self.b, self.k, self._cache
        )
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        out["sig"] = list(sigs)
        return out


def minhash_lsh_candidates(
    ds,
    n_perm: int = 128,
    bands: int = 16,
    k: int = 3,
    seed: int = 7,
    concurrency: int = 4,
    hash_kind: str = "auto",
):
    """documents(doc_id, text) -> candidate pair Dataset (doc_a, doc_b).

    Signature rows explode to (band_id, band_hash, doc_id); a groupby on the
    banded hash yields buckets; pairs are emitted per bucket (bucket sizes
    are bounded in practice; a skew guard caps pathological buckets and logs
    them — a bucket of identical boilerplate is better handled by exact
    dedup upstream).
    """
    rows_per_band = n_perm // bands
    hash_kind = _resolve_hash_kind(hash_kind, ds)

    stage = MinHashStage(n_perm, k, seed)

    def bandify(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        texts = t["text"].to_pylist()
        n = len(texts)
        sig = minhash_signatures_batch(
            texts, stage.a, stage.b, stage.k, stage._cache, hash_kind
        )
        chunks = sig.reshape(n, bands, rows_per_band)
        # vectorized FNV-style band mixing (wrapping uint64 arithmetic) —
        # one hash per (doc, band) without a Python loop over docs
        h = np.full((n, bands), 14695981039346656037, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for j in range(rows_per_band):
            h = (h ^ chunks[:, :, j]) * prime
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), bands)
                ),
                "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_hash": pa.array(h.reshape(-1).astype(np.int64)),
            }
        )

    banded = ds.map_batches(bandify, batch_format="pyarrow")
    # banded rows = n_docs × bands exactly; deciding the path from the input
    # count (parquet metadata) avoids executing the pipeline twice
    return _pairs_from_banded(
        banded, key_cols=["band_id", "band_hash"], n_rows=ds.count() * bands
    )


MAX_BUCKET = 256  # skew guard: cap pathological buckets (boilerplate should
                  # be handled by exact dedup upstream)
_SMALL_BANDED_ROWS = 5_000_000
# below this many candidate doc ids the text slice merges driver-side;
# above it the distributed verify engages (module-level so tests can
# force the scale path on small data)
_SMALL_CANDIDATES = 100_000
# driver-side verify bound: the small-candidate path jaccard-verifies on
# the driver at ~1 ms/pair; past this many pairs the distributed
# broadcast-pair verify is faster despite its shuffle fixed cost
_SMALL_VERIFY_PAIRS = 2_000
# candidate-pair lists up to this size broadcast driver-side (16 B/pair →
# ~320 MB at the cap) so verification is ONE corpus pass + ONE bucketed
# shuffle of exactly 2 texts/pair; past it the chained hash_join fallback
# engages (ships text ~3× but never holds the pair list in one place)
_PAIR_BROADCAST_ROWS = 20_000_000
_VERIFY_BUCKETS = 64


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    # int64-typed even for empty/zero-pair buckets: an untyped-list frame
    # defaults to float64 and a later concat would upcast every bucket's ids
    ids = sorted(set(g["doc_id"].tolist()))[:MAX_BUCKET]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame(
        {"doc_a": pd.Series(a, dtype=np.int64), "doc_b": pd.Series(b, dtype=np.int64)}
    )


def _group_pairs(dup: pd.DataFrame, key_cols, pair_fn) -> pd.DataFrame:
    """All-pairs within each key group of ``dup`` (rows pre-filtered to
    duplicated keys). For the default ``_bucket_pairs`` builder this is
    fully vectorized — sort by (key, doc_id), find group boundaries with
    array compares, pair size-2 groups (the overwhelming majority under
    LSH banding: one dup pair collides once per band) in one shot and the
    rare larger groups via ``np.triu_indices`` — because a Python call per
    collision group was the measured hot spot (200k docs / 10%% dups →
    ~320k groups → 113 s in the per-group loop, ~1 s vectorized). Custom
    ``pair_fn``s (simhash's hamming filter) keep the per-group loop."""
    if pair_fn is not _bucket_pairs:
        out = [pair_fn(sub) for _, sub in dup.groupby(key_cols, sort=False)]
        out = [o for o in out if len(o)]
        if not out:
            return None
        return pd.concat(out, ignore_index=True)
    if not len(dup):
        return None
    s = dup.sort_values([*key_cols, "doc_id"], kind="stable")
    ids = s["doc_id"].to_numpy()
    n = len(ids)
    newgrp = np.zeros(n, dtype=bool)
    newgrp[0] = True
    for c in key_cols:
        a = s[c].to_numpy()
        newgrp[1:] |= a[1:] != a[:-1]
    # unique ids within a group (ids are sorted within it): drop rows equal
    # to their predecessor — mirrors _bucket_pairs' sorted(set(...))
    same_as_prev = np.zeros(n, dtype=bool)
    same_as_prev[1:] = (~newgrp[1:]) & (ids[1:] == ids[:-1])
    if same_as_prev.any():
        keep = ~same_as_prev
        ids, newgrp = ids[keep], newgrp[keep]
        n = len(ids)
    gid = np.cumsum(newgrp) - 1
    sizes = np.bincount(gid)
    starts = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    st2 = starts[sizes == 2]
    out_a, out_b = [ids[st2]], [ids[st2 + 1]]
    for g in np.flatnonzero(sizes > 2):
        grp = ids[starts[g] : starts[g] + min(int(sizes[g]), MAX_BUCKET)]
        i, j = np.triu_indices(len(grp), 1)
        out_a.append(grp[i])
        out_b.append(grp[j])
    a = np.concatenate(out_a)
    if not len(a):
        return None
    return pd.DataFrame(
        {
            "doc_a": a.astype(np.int64),
            "doc_b": np.concatenate(out_b).astype(np.int64),
        }
    )


def _pairs_from_banded(
    banded, key_cols, pair_fn=None, out_cols=("doc_a", "doc_b"), n_rows=None
):
    """(key_cols..., doc_id) rows -> distinct candidate pairs.

    Most buckets are singletons, and Ray's groupby().map_groups pays a
    Python call per group — so below ``_SMALL_BANDED_ROWS`` the banded table
    (doc_id + hash only, never the text) is reduced in one task after
    dropping singletons vectorized. Above it, the keyed-groupby shuffle is
    the scale path (same semantics)."""
    pair_fn = pair_fn or _bucket_pairs
    n = n_rows if n_rows is not None else banded.count()
    if n <= _SMALL_BANDED_ROWS:
        df = banded.to_pandas()
        dup = df[df.duplicated(key_cols, keep=False)]
        pairs = _group_pairs(dup, key_cols, pair_fn)
        if pairs is None:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out_cols})
        return pairs.drop_duplicates(["doc_a", "doc_b"], ignore_index=True)
    # scale path: hash the LSH key into a BOUNDED number of groups first
    # (the shingle_dup_pairs pattern) — grouping by the raw key would pay
    # Ray's per-group Python call on ~n_docs × bands mostly-SINGLETON
    # buckets (measured: a 1M-doc / 32M-row banded table ground for >20 min
    # in map_groups before this). Each of the _BAND_BUCKETS groups drops
    # its singleton keys VECTORIZED and pair-generates only over keys that
    # actually collide (dup-rate-sized work). Then the BUCKETED pair-dedup:
    # a pair found in several bands emits identical rows, which hash to the
    # same pair-bucket — local drop_duplicates per block, hash shuffle on
    # (doc_a, doc_b), vectorized drop_duplicates per group. Multi-block
    # output, no single-worker funnel, never a per-pair Python call.
    _BAND_BUCKETS = 256
    pair_cols = list(out_cols)
    _PAIR_BUCKETS = 32

    def band_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # hash_pandas_object on the key FRAME combines columns vectorized
        h = pd.util.hash_pandas_object(df[key_cols], index=False)
        df = df.copy()
        df["__bb__"] = (h.to_numpy(np.uint64)
                        % np.uint64(_BAND_BUCKETS)).astype(np.int64)
        return df

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated(key_cols, keep=False)]
        pairs = _group_pairs(dup, key_cols, pair_fn)
        if pairs is None:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in pair_cols}
            )
        return pairs[pair_cols]

    pairs = (
        banded.map_batches(band_bucket, batch_format="pandas")
        .groupby("__bb__")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"])[pair_cols]

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = dd(df).copy()
        h = pd.util.hash_pandas_object(df[["doc_a", "doc_b"]], index=False)
        df["__pb__"] = (h.to_numpy(np.uint64) % np.uint64(_PAIR_BUCKETS)).astype(
            np.int64
        )
        return df

    def dd_group(g: pd.DataFrame) -> pd.DataFrame:
        return dd(g)

    return (
        pairs.map_batches(pair_bucket, batch_format="pandas")
        .groupby("__pb__")
        .map_groups(dd_group, batch_format="pandas")
    )


def minhash_pairs(
    ds,
    threshold: float = 0.7,
    n_perm: int = 128,
    bands: int = 16,
    k: int = 3,
    seed: int = 7,
    hash_kind: str = "auto",
):
    """LSH candidates verified with exact shingle Jaccard -> pair list
    (doc_a, doc_b, sim) with sim >= threshold. pandas on the small path, a
    Dataset on the scale path.

    ORACLE-CHECKABLE end-to-end: shingle hashes are md5-derived
    (``_shingle_hashes``), the permutation constants are seeded, and the
    band mix is the same FNV the fingerprint oracle already reproduces — so
    DuckDB can rebuild signatures, bands, candidates, and the Jaccard
    verify exactly (``queries._minhash_sql``).

    Pair verification never materializes corpus TEXT on the driver: only the
    candidate doc-ID/pair set (bounded by the LSH collisions) is collected.
    Up to ``_PAIR_BROADCAST_ROWS`` pairs the verify is ONE corpus pass that
    looks each doc up in the broadcast (doc -> pair, side) inverted table and
    emits its text per pair membership, then ONE bounded-bucket group pass
    pivots sides and Jaccard-verifies (text ships exactly once per side).
    Past that the chained ``joins.hash_join`` fallback engages: semi-join the
    corpus down to candidate docs, join the pairs on doc_a then doc_b."""
    import ray
    import ray.data

    from .joins import hash_join

    empty = pd.DataFrame(
        {"doc_a": pd.Series(dtype=np.int64), "doc_b": pd.Series(dtype=np.int64),
         "sim": pd.Series(dtype=np.float64)}
    )
    cand = minhash_lsh_candidates(ds, n_perm, bands, k, seed,
                                  hash_kind=hash_kind)
    if isinstance(cand, pd.DataFrame):  # small fast path
        if len(cand) == 0:
            return empty
        cand_ids = np.unique(
            np.concatenate([cand["doc_a"].to_numpy(np.int64),
                            cand["doc_b"].to_numpy(np.int64)])
        )
        cand_ds = ray.data.from_pandas(cand)
        n_pairs = len(cand)
    else:
        # materialize ONCE: the pair blocks feed both the id scan below and
        # the verify join/broadcast — a lazy cand would re-execute the whole
        # banding+pairing pipeline a second time inside the verify
        cand = cand.materialize()
        id_parts = cand.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": np.unique(np.concatenate(
                    [df["doc_a"].to_numpy(np.int64), df["doc_b"].to_numpy(np.int64)]
                ))}
            ),
            batch_format="pandas",
        ).to_pandas()
        if len(id_parts) == 0:
            return empty
        cand_ids = np.unique(id_parts["doc_id"].to_numpy(np.int64))
        cand_ds = cand
        n_pairs = cand.count()
    ids_ref = ray.put(np.sort(cand_ids))  # ids only — never the text

    def slice_texts(col_id: str, col_text: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ids = ray.get(ids_ref)
            keep = np.isin(df["doc_id"].to_numpy(np.int64), ids)
            out = df.loc[keep, ["doc_id", "text"]].rename(
                columns={"doc_id": col_id, "text": col_text}
            )
            return out.reset_index(drop=True)

        return fn

    if n_pairs <= _SMALL_VERIFY_PAIRS and len(cand_ids) <= _SMALL_CANDIDATES:
        # the text SLICE is bounded by the candidate set (2×pairs), not the
        # corpus — one streaming scan collects it, pairs merge driver-side.
        # Same join semantics, none of the shuffle fixed costs. Gated on the
        # PAIR count, not just the id count: the driver-side jaccard is
        # ~1 ms/pair single-core, so past _SMALL_VERIFY_PAIRS the broadcast
        # verify's ~0.5 s shuffle fixed cost wins (22k pairs: 35 s -> ~3 s).
        texts_sub = ds.map_batches(
            slice_texts("doc_a", "text_a"), batch_format="pandas"
        ).to_pandas()
        cand_pdf = cand if isinstance(cand, pd.DataFrame) else cand.to_pandas()
        joined_pdf = cand_pdf.merge(texts_sub, on="doc_a").merge(
            texts_sub.rename(columns={"doc_a": "doc_b", "text_a": "text_b"}),
            on="doc_b",
        )
        joined = None
    elif n_pairs <= _PAIR_BROADCAST_ROWS:
        # broadcast-pair verify: the PAIR LIST (2 int64/pair — bounded by the
        # LSH collisions, orders of magnitude smaller than the text) is
        # broadcast once; ONE corpus pass looks each doc up in the inverted
        # (doc → pair,side) table and emits its text per membership; ONE
        # bounded-bucket group pass pivots the two sides of each pair and
        # verifies. The chained hash_join fallback below ships text ~3×
        # (slice, join-1 output, join-2) — measured 68.7 s → this path's
        # single shipment at 200k docs/10% dups.
        pair_pdf = cand if isinstance(cand, pd.DataFrame) else cand_ds.to_pandas()
        a_ids = pair_pdf["doc_a"].to_numpy(np.int64)
        b_ids = pair_pdf["doc_b"].to_numpy(np.int64)
        np_pairs = len(a_ids)
        docs_flat = np.concatenate([a_ids, b_ids])
        pidx_flat = np.concatenate(
            [np.arange(np_pairs, dtype=np.int64)] * 2
        )
        side_flat = np.concatenate(
            [np.zeros(np_pairs, np.int8), np.ones(np_pairs, np.int8)]
        )
        order = np.argsort(docs_flat, kind="stable")
        inv_ref = ray.put(
            (docs_flat[order], pidx_flat[order], side_flat[order])
        )

        def emit_sides(df: pd.DataFrame) -> pd.DataFrame:
            d_sorted, p_idx, p_side = ray.get(inv_ref)
            ids = df["doc_id"].to_numpy(np.int64)
            lo = np.searchsorted(d_sorted, ids, side="left")
            hi = np.searchsorted(d_sorted, ids, side="right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total == 0:
                return pd.DataFrame(
                    {"pair_idx": pd.Series(dtype=np.int64),
                     "side": pd.Series(dtype=np.int8),
                     "doc_id": pd.Series(dtype=np.int64),
                     "text": pd.Series(dtype=object),
                     "__vb__": pd.Series(dtype=np.int64)}
                )
            # flat positions into the inverted table, fully vectorized
            start = np.repeat(lo, cnt)
            offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            pos = start + offs
            row_sel = np.repeat(np.arange(len(ids)), cnt)
            pix = p_idx[pos]
            return pd.DataFrame(
                {"pair_idx": pix,
                 "side": p_side[pos],
                 "doc_id": ids[row_sel],
                 "text": df["text"].to_numpy(object)[row_sel],
                 "__vb__": (pix.astype(np.uint64)
                            % np.uint64(_VERIFY_BUCKETS)).astype(np.int64)}
            )

        def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
            pi = g["pair_idx"].to_numpy(np.int64)
            sd = g["side"].to_numpy(np.int8)
            did = g["doc_id"].to_numpy(np.int64)
            txt = g["text"].to_numpy(object)
            order = np.lexsort((sd, pi))
            pi, sd, did, txt = pi[order], sd[order], did[order], txt[order]
            _, first, counts = np.unique(
                pi, return_index=True, return_counts=True
            )
            cache: dict[int, set] = {}

            def sh(d, t):
                if d not in cache:
                    cache[d] = word_shingles(t, k)
                return cache[d]

            keep_a, keep_b, sims = [], [], []
            for f, c in zip(first, counts):
                if c != 2:  # a pair doc missing from the corpus: skip
                    continue
                a_, b_ = int(did[f]), int(did[f + 1])
                s = jaccard(sh(a_, txt[f]), sh(b_, txt[f + 1]))
                if s >= threshold:
                    keep_a.append(a_)
                    keep_b.append(b_)
                    sims.append(s)
            return pd.DataFrame(
                {"doc_a": pd.Series(keep_a, dtype=np.int64),
                 "doc_b": pd.Series(keep_b, dtype=np.int64),
                 "sim": pd.Series(sims, dtype=np.float64)}
            )

        return (
            ds.map_batches(emit_sides, batch_format="pandas")
            .groupby("__vb__")
            .map_groups(verify_bucket, batch_format="pandas")
        )
    else:
        # ONE corpus scan builds the candidate text slice (bounded by the
        # candidate set); materialize it so the two join sides are column
        # renames of the same blocks, not two re-executions of the scan
        texts_sub = ds.map_batches(
            slice_texts("doc_a", "text_a"), batch_format="pandas"
        ).materialize()
        texts_b = texts_sub.map_batches(
            lambda df: df.rename(columns={"doc_a": "doc_b", "text_a": "text_b"}),
            batch_format="pandas",
        )
        joined = hash_join(
            hash_join(cand_ds, texts_sub, on="doc_a", n_buckets=8),
            texts_b, on="doc_b", n_buckets=8,
        )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        keep_a, keep_b, sims = [], [], []
        cache: dict[int, set] = {}

        def sh(d, t):
            if d not in cache:
                cache[d] = word_shingles(t, k)
            return cache[d]

        for a_, b_, ta, tb in zip(
            df["doc_a"], df["doc_b"], df["text_a"], df["text_b"]
        ):
            s = jaccard(sh(a_, ta), sh(b_, tb))
            if s >= threshold:
                keep_a.append(int(a_))
                keep_b.append(int(b_))
                sims.append(s)
        return pd.DataFrame(
            {"doc_a": pd.Series(keep_a, dtype=np.int64),
             "doc_b": pd.Series(keep_b, dtype=np.int64),
             "sim": pd.Series(sims, dtype=np.float64)}
        )

    return (
        verify(joined_pdf)
        if joined is None
        else joined.map_batches(verify, batch_format="pandas")
    )


def minhash_dedup(
    ds,
    threshold: float = 0.7,
    n_perm: int = 128,
    bands: int = 16,
    k: int = 3,
    seed: int = 7,
    hash_kind: str = "auto",
):
    """Full near-dup pipeline -> (doc_id, rep_id) for docs in some duplicate
    cluster (rep_id = min doc_id of the connected component).

    Components via ``components.connected_components``: driver-side
    union-find below its edge threshold, distributed large-star/small-star
    rounds (bucketed shuffles, edge list never on the driver) above it."""
    edges = minhash_pairs(ds, threshold, n_perm, bands, k, seed, hash_kind)
    if isinstance(edges, pd.DataFrame) and len(edges) == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64), "rep_id": pd.Series(dtype=np.int64)}
        )
    from .components import connected_components

    out = connected_components(edges)
    if isinstance(out, pd.DataFrame):
        return out.sort_values(["doc_id"], ignore_index=True)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over token counts. The per-token hash is the first 16
    hex chars of md5 — chosen (over blake2b) because the DuckDB oracle can
    reproduce it exactly (md5() is a SQL builtin), making the whole
    near-dup-pair surface oracle-checkable."""
    toks = tokenize_text(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    for t, c in zip(uniq, counts):
        h = md5_u64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), c, -c)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v


def simhash_batch(t: "pa.Table") -> "pa.Table":
    """Arrow-native signature stage (the r2 dtype-leak class — float64 via a
    pandas union — is impossible in Arrow: int64 stays int64)."""
    import pyarrow as pa

    texts = t["text"].to_pylist()
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "simhash": pa.array(
                np.fromiter(
                    (simhash64(x) for x in texts), dtype=np.uint64, count=len(texts)
                ).astype(np.int64)
            ),
        }
    )


def simhash_near_dups(ds, max_hamming: int = 3):
    """Banded (4×16-bit) SimHash blocking: any pair within Hamming distance 3
    shares at least one of the 4 bands (pigeonhole) → candidates → verify."""
    import pyarrow as pa

    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def bandify(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        bands = np.empty((4, n), dtype=np.int64)
        for b in range(4):
            bands[b] = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(doc_ids, 4)),
                "band_id": pa.array(np.repeat(np.arange(4, dtype=np.int64), n)),
                "band_val": pa.array(bands.reshape(-1)),
                "simhash": pa.array(np.tile(h.astype(np.int64), 4)),
            }
        )

    banded = sigs.map_batches(bandify, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = u["doc_id"].tolist()
        hs = u["simhash"].to_numpy(np.uint64)
        a, b, d = [], [], []
        for i in range(len(ids)):
            x = np.bitwise_xor(hs[i], hs[i + 1 :])
            ham = np.array([bin(int(v)).count("1") for v in x])
            for off in np.flatnonzero(ham <= max_hamming):
                a.append(ids[i])
                b.append(ids[i + 1 + off])
                d.append(int(ham[off]))
        # int64-typed: zero-pair buckets must not upcast the concat to float64
        return pd.DataFrame(
            {"doc_a": pd.Series(a, dtype=np.int64),
             "doc_b": pd.Series(b, dtype=np.int64),
             "hamming": pd.Series(d, dtype=np.int64)}
        )

    return _pairs_from_banded(
        banded, ["band_id", "band_val"], pair_fn=pairs,
        out_cols=("doc_a", "doc_b", "hamming"), n_rows=ds.count() * 4,
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (random-hyperplane LSH buckets + verify)
# ---------------------------------------------------------------------------


class PlaneBucketStage:
    """Actor-pool stage: the random-hyperplane matrix is built ONCE per actor
    (T1 pattern — same as ``MinHashStage``), lazily on the first batch when
    the embedding dim isn't known up front, then reused for every batch."""

    def __init__(self, n_planes: int = 12, seed: int = 11, dim: int | None = None):
        self.n_planes = n_planes
        self.seed = seed
        self.planes = (
            np.random.default_rng(seed).standard_normal((dim, n_planes))
            if dim is not None
            else None
        )
        self._shift = np.arange(n_planes, dtype=np.uint32)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        if self.planes is None:
            self.planes = np.random.default_rng(self.seed).standard_normal(
                (mat.shape[1], self.n_planes)
            )
        signs = (mat @ self.planes) > 0
        key = (signs.astype(np.uint32) << self._shift).sum(axis=1)
        out = pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy(), "bucket": key.astype(np.int64)}
        )
        out["embedding"] = list(mat)
        return out


def embedding_near_dups(
    ds, threshold: float = 0.95, n_planes: int = 12, seed: int = 11,
    dim: int | None = None, concurrency: int = 4,
):
    """embeddings(vec_id, embedding:list<float>) -> (vec_a, vec_b, cos).

    Sign-pattern of ``n_planes`` random hyperplanes buckets the vectors; only
    same-bucket pairs are verified with exact cosine. Recall is tunable via
    multiple plane sets at scale; one set suffices for the 0.95+ regime.

    ORACLE-CHECKABLE: the plane matrix is deterministic (seeded rng), so SQL
    reproduces the buckets by inlining the plane constants and the verify by
    thresholding the 6-dp-ROUNDED cosine — the same rounding used here, so
    float noise at the threshold can't flip pair membership between engine
    and oracle.
    """
    buckets = ds.map_batches(
        PlaneBucketStage,
        fn_constructor_args=(n_planes, seed, dim),
        batch_format="pandas",
        concurrency=(1, concurrency),
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:  # noqa: D401 — bucket verify
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy())
        norm = np.linalg.norm(mat, axis=1)
        norm[norm == 0] = 1.0
        matn = mat / norm[:, None]
        sims = np.round(matn @ matn.T, 6)  # rounded compare: oracle parity
        a, b, c = [], [], []
        n = len(ids)
        for i in range(n):
            hits = np.flatnonzero(sims[i, i + 1 :] >= threshold)
            for off in hits:
                a.append(int(ids[i]))
                b.append(int(ids[i + 1 + off]))
                c.append(float(sims[i, i + 1 + off]))
        return pd.DataFrame(
            {"vec_a": pd.Series(a, dtype=np.int64),
             "vec_b": pd.Series(b, dtype=np.int64),
             "cos": pd.Series(c, dtype=np.float64)}
        )

    return buckets.groupby("bucket").map_groups(verify, batch_format="pandas")


def semantic_dedup(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    dim: int | None = None,
    driver_max_edges: int | None = None,
):
    """SemDeDup-shaped semantic dedup over ``(vec_id, embedding)`` rows:
    keep ONE representative per embedding-space near-dup component, drop the
    rest. -> ``(vec_id, rep_id, keep)`` for EVERY input vector (rep_id =
    component min, self when unduplicated; keep = vec_id == rep_id).

    The paper's k-means cells serve only to bound the pairwise cosine
    verify; here the seeded hyperplane-LSH buckets play that role (making
    the whole operator SQL-reproducible — the IVF coarse quantizer in
    ``pipelines/similarity.py`` is the drop-in clustering alternative when
    recall matters more than oracle checkability). Composition:
    ``embedding_near_dups`` pairs → ``connected_components`` → one corpus
    pass assigning representatives. The component table is dup-rate-sized:
    below the components driver threshold it broadcasts as a dict; above it
    the assignment is a bucketed left ``hash_join`` (no driver funnel)."""
    import ray

    from .components import connected_components
    from .joins import hash_join

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                 "doc_b": pd.Series(dtype=np.int64)})
        return df.rename(columns={"vec_a": "doc_a", "vec_b": "doc_b"})[
            ["doc_a", "doc_b"]
        ]

    edges = embedding_near_dups(ds, threshold, n_planes, seed, dim).map_batches(
        to_edges, batch_format="pandas"
    )
    kw = {} if driver_max_edges is None else {"driver_max_edges": driver_max_edges}
    comp = connected_components(edges, **kw)
    ids_only = ds.select_columns(["vec_id"])

    if isinstance(comp, pd.DataFrame):
        rep_map = dict(zip(comp["doc_id"].astype(np.int64).tolist(),
                           comp["rep_id"].astype(np.int64).tolist()))
        ref = ray.put(rep_map)

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(ref)
            ids = df["vec_id"].to_numpy(np.int64)
            reps = (np.fromiter((m.get(int(i), int(i)) for i in ids),
                                np.int64, len(ids))
                    if m else ids)
            return pd.DataFrame(
                {"vec_id": ids, "rep_id": reps, "keep": reps == ids}
            )

        return ids_only.map_batches(assign, batch_format="pandas")

    # scale path: the component table is itself a Dataset — assignment is a
    # bucketed left join, misses filled with self
    comp_r = comp.map_batches(
        lambda df: df.rename(columns={"doc_id": "vec_id"}),
        batch_format="pandas",
    )
    joined = hash_join(ids_only, comp_r, on="vec_id", how="left")
    _MISS = np.iinfo(np.int64).min

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        rep_s = df["rep_id"]
        if str(rep_s.dtype) == "Int64":
            rep = rep_s.to_numpy(dtype=np.int64, na_value=_MISS)
        else:
            rep = rep_s.to_numpy()
            rep = np.where(np.isnan(rep), float(_MISS), rep).astype(np.int64) \
                if rep.dtype.kind == "f" else rep.astype(np.int64)
        rep = np.where(rep == _MISS, ids, rep)
        return pd.DataFrame({"vec_id": ids, "rep_id": rep, "keep": rep == ids})

    return joined.map_batches(finish, batch_format="pandas")


def embedding_near_dups_exact(ds, threshold: float = 0.4):
    """EXACT all-pairs cosine near-dup — the oracle-checkable baseline the
    LSH variant (``embedding_near_dups``) approximates.

    The normalized vector matrix broadcasts once (``ray.put``); each batch
    computes its rows × all-vectors block of the similarity matrix and emits
    only (vec_a < vec_b, cos ≥ threshold) pairs, so the O(n²) compute is
    distributed across batches while nothing quadratic ever materializes.
    Thresholding happens on the 6-dp-ROUNDED cosine on both engine and SQL
    sides so float noise at the boundary can't flip pair membership.
    Scale note: all-pairs is inherently O(n²) — at 100 TB use the bucketed
    LSH variant; this one is the exactness contract."""
    import ray

    ref_pdf = ds.to_pandas()  # vec_id + embedding only — the broadcast side
    ids = ref_pdf["vec_id"].to_numpy(np.int64)
    mat = np.stack(ref_pdf["embedding"].to_numpy()).astype(np.float64)
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    ref = ray.put((ids, mat / norm[:, None]))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        aids, amat = ray.get(ref)
        rids = df["vec_id"].to_numpy(np.int64)
        rmat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        rn = np.linalg.norm(rmat, axis=1)
        rn[rn == 0] = 1.0
        sims = np.round((rmat / rn[:, None]) @ amat.T, 6)
        ii, jj = np.nonzero((sims >= threshold) & (rids[:, None] < aids[None, :]))
        return pd.DataFrame(
            {"vec_a": rids[ii].astype(np.int64),
             "vec_b": aids[jj].astype(np.int64),
             "cos": sims[ii, jj]}
        )

    return ds.map_batches(block, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact shared-substring pairs (Lee et al.-style exact-substring signal)
# ---------------------------------------------------------------------------


def shingle_pairs(ds, shingle_w: int = 5, n_buckets: int = 64,
                  max_bucket: int | None = None,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Every doc pair sharing at least one ``shingle_w``-token shingle, with
    the count of distinct shared shingles -> Dataset (doc_a, doc_b,
    n_shared), doc_a < doc_b. The exact-substring duplication signal of
    "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
    ACL'22), at shingle granularity.

    Shape: docs flatten to DISTINCT (shingle, doc) rows; shingles co-locate
    via a hash-bucket groupby (n_buckets groups — NEVER one Ray group per
    shingle, which pays a per-group Python call); inside a bucket a
    vectorized pandas pass finds multi-doc shingles and emits their pairs;
    a second keyed reduction sums per-pair counts. ``max_bucket`` caps a
    pathological shingle's doc list (boilerplate guard, same knob as the
    LSH MAX_BUCKET); None = exact (the oracle contract)."""
    import ray.data  # noqa: F401  (ds comes in ready)

    def flat(df: pd.DataFrame) -> pd.DataFrame:
        out_s, out_d = [], []
        for did, text in zip(df[id_col].to_numpy(np.int64), df[text_col]):
            toks = tokenize_text(text)
            if len(toks) < shingle_w:
                continue
            seen = {
                " ".join(toks[i:i + shingle_w])
                for i in range(len(toks) - shingle_w + 1)
            }
            out_s.extend(seen)
            out_d.extend([int(did)] * len(seen))
        h = pd.util.hash_array(np.asarray(out_s, dtype=object)).astype(np.uint64)
        return pd.DataFrame({
            "s": pd.Series(out_s, dtype=object),
            "doc_id": pd.Series(out_d, dtype=np.int64),
            "bucket": (h % np.uint64(n_buckets)).astype(np.int64),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        sizes = g.groupby("s")["doc_id"].size()
        multi = sizes[sizes > 1].index
        if len(multi):
            sub = g[g["s"].isin(multi)]
            for _, grp in sub.groupby("s"):
                ids = np.sort(grp["doc_id"].to_numpy(np.int64))
                if max_bucket is not None:
                    ids = ids[:max_bucket]
                ia, ib = np.triu_indices(len(ids), k=1)
                a_out.extend(ids[ia].tolist())
                b_out.extend(ids[ib].tolist())
        out = pd.DataFrame({
            "doc_a": pd.Series(a_out, dtype=np.int64),
            "doc_b": pd.Series(b_out, dtype=np.int64),
        })
        return (
            out.assign(n_shared=np.int64(1))
            .groupby(["doc_a", "doc_b"], as_index=False)["n_shared"].sum()
        )

    from ..state.aggregates import tree_aggregate

    pairs = (
        ds.map_batches(flat, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # per-bucket partials may repeat a pair (pair shares shingles landing in
    # different buckets) — one more keyed reduction makes counts global
    return tree_aggregate(
        pairs, ["doc_a", "doc_b"], lambda df: df, {"n_shared": "sum"}
    )
