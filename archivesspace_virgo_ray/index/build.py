"""Distributed inverted-index build — the flagship Ray Data pipeline.

Replaces the reference's post-to-Solr sink (SolrHelper.postFileToSolr,
SolrHelper.java:82-96) with a from-scratch index build:

    read_parquet (pruned cols)
      → map_batches(tokenize → (term, doc_id, tf, dl) triples, zero-copy Arrow)
      → groupby(shard, bucket)            # THE wide shuffle
      → map_groups(write_segment)         # checkpointed, atomic, resumable
      → seal: global term stats + corpus stats

Scale notes (designed for 10^12 docs / many-node clusters, tested locally):

- **Skew / salting**: doc-sharding IS the head-term salt — a head term's
  postings split across ``n_shards`` groups, each bounded by its doc shard.
  Because the salt is the doc-shard (disjoint doc_id populations), the global
  posting list for a term is the concatenation of its per-shard lists — no
  merge pass is ever needed, and query-time fan-out is the standard
  document-sharded scatter/merge.
- **dl rides with the triple**: a document lives wholly inside one input
  batch, so its token length is computed at tokenize time and carried in the
  triple — the per-posting BM25 length norm needs no doc-length join at
  query time (the J8 analog is eliminated).
- **Resume**: completed (shard, bucket) segments are detected from manifests
  before the run and their triples are dropped at the tokenize stage, so a
  restart re-shuffles only missing segments.
- **Two concurrent passes** over the corpus: pass 1 writes the forward doc
  table (doc_id, sha256, meta — the per-row invariant vs the source,
  input_hint) WITHOUT tokenizing; pass 2 builds postings, tokenizing exactly
  once (doc lengths ride in the triples; corpus totals come from segment
  manifest counters). Both stream; nothing materializes the corpus.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from .. import PIPELINE_VERSION
from ..functions.hashing import doc_id_from_key, sha256_hex
from .locking import locked_on, nonlock_contents, wipe_index_dir
from ..functions.tokenize import (
    batch_term_doc_tf,
    batch_term_doc_tf_pos,
    stable_hash_strings,
)
from .segments import (
    DOCS,
    GLOBAL,
    list_complete_segments,
    read_stats,
    write_segment,
    write_stats,
)


_TARGET_GROUP_BYTES = 256 << 20  # max raw text a segment-writer task holds
_RAW_EXPANSION = 3.0             # parquet-bytes → in-memory text estimate


def auto_shards_buckets(
    input_bytes: int, total_cpus: int | None = None
) -> tuple[int, int]:
    """Derive (n_shards, n_buckets) so ONE map_groups segment-writer task
    holds at most ~``_TARGET_GROUP_BYTES`` of raw corpus text (each group is
    ~corpus/(n_shards×n_buckets)), with a CPU floor so small corpora still
    fan out (≥2 groups per core). Shards are a power of two ≥ √groups —
    doc routing is ``doc_id % n_shards`` and query fan-out scales with
    shards — buckets cover the remainder.

    At 100 TB this lands around 1024 shards × ~1100 buckets: ~4 shards per
    node on a 256-node cluster, no reducer ever materializing more than a
    few hundred MB."""
    import math

    if total_cpus is None:
        total_cpus = 8
        try:
            import ray

            if ray.is_initialized():
                total_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            pass
    by_bytes = math.ceil(max(1, input_bytes) * _RAW_EXPANSION / _TARGET_GROUP_BYTES)
    n_groups = max(by_bytes, 2 * total_cpus, 16)
    n_shards = 1 << max(2, math.ceil(math.log2(math.sqrt(n_groups))))
    n_buckets = max(4, math.ceil(n_groups / n_shards))
    return n_shards, n_buckets


def _estimate_input_bytes(source) -> int:
    """On-disk bytes of the input (metadata only — nothing is read)."""
    import glob as _glob

    if isinstance(source, str):
        if os.path.isdir(source):
            return sum(
                os.path.getsize(f)
                for f in _glob.glob(os.path.join(source, "**", "*.parquet"),
                                    recursive=True)
            )
        return os.path.getsize(source) if os.path.exists(source) else 0
    try:
        return int(source.size_bytes() or 0)
    except Exception:
        return 0


@dataclass
class BuildConfig:
    # None → auto-sized from input bytes + cluster CPUs (auto_shards_buckets)
    n_shards: int | None = 8
    n_buckets: int | None = 8
    text_col: str = "content"
    id_col: str | None = None            # None → derive from key_cols via sha256
    key_cols: tuple = ("repo", "path", "commit")
    meta_cols: tuple = ("repo", "path", "commit", "lang")
    batch_size: int = 256                # docs per tokenize batch (large text rows)
    # store per-posting token positions (Lucene-style positional index):
    # phrase / ordered-proximity queries then verify inside the index instead
    # of re-reading candidate raw text. Costs ~1 varbyte per token occurrence
    # in segment bytes + shuffle volume.
    store_positions: bool = False
    # wide-shuffle strategy for the triples → segment exchange:
    # - "groupby": Ray Data sort-based groupby (default below the size gate)
    # - "staged": hash-partitioned parquet staging on disk, then one task per
    #   (shard, bucket). The groupby's sort is pure overhead here
    #   (write_segment re-sorts deterministically anyway), and past the
    #   object-store size the sort shuffle SPILLS raw Arrow at disk speed —
    #   staging writes compressed parquet once instead (measured 2M docs /
    #   385M postings: spill path 218.8 s vs staged path, see BASELINE.md)
    # - "auto": staged when the input's on-disk bytes exceed
    #   _STAGED_SHUFFLE_INPUT_BYTES, else groupby
    shuffle: str = "auto"
    # pre-tokenize analysis rewrite applied to the text column (Solr
    # analysis-chain analog): "plain" = none; "ident" = identifier split
    # (camelCase + snake_case -> parts) for source-code fields. Recorded in
    # stats.json — query planning reads it back and rewrites QUERY text the
    # same way, so callers never pre-analyze by hand.
    analyzer: str = "plain"
    lineage: dict = field(default_factory=dict)


def _assign_ids(batch: pa.Table, cfg: BuildConfig) -> np.ndarray:
    if cfg.id_col is not None:
        return batch[cfg.id_col].to_numpy()
    cols = [batch[c].to_pylist() for c in cfg.key_cols]
    return doc_id_from_key(*cols)


def make_doc_stats_fn(cfg: BuildConfig, gen: int = 0):
    """Pass-1 batch fn: forward doc table (sha256 per-row invariant + meta).

    Deliberately does NOT tokenize — doc lengths ride inside the posting
    triples (pass 2) and corpus totals come from the segment manifests, so
    the corpus text is tokenized exactly once.

    ``gen``: the generation the rows belong to (0 = base build) — readers
    resolve a doc's CURRENT version as its max-gen row (replace-by-id
    semantics, update.add_documents)."""

    def doc_stats(batch: pa.Table) -> pa.Table:
        texts = np.asarray(batch[cfg.text_col].to_pylist(), dtype=object)
        ids = _assign_ids(batch, cfg)
        out = {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "sha256": pa.array(sha256_hex(texts), pa.string()),
            "shard": pa.array(
                (np.asarray(ids, dtype=np.int64) % cfg.n_shards).astype(np.int32)
            ),
            "gen": pa.array(np.full(len(ids), gen, dtype=np.int64)),
        }
        for c in cfg.meta_cols:
            if c in batch.column_names:
                out[c] = batch[c]
        return pa.table(out)

    return doc_stats


def make_triples_fn(cfg: BuildConfig, completed_gkeys: frozenset[int]):
    """Pass-2 batch fn: (term, doc_id, tf, dl, gkey) triples; resume-filtered."""

    def triples(batch: pa.Table) -> pa.Table:
        # the Arrow column feeds the C++ tokenize kernel directly — never
        # round-trip through Python strings on the build hot path
        texts = batch[cfg.text_col]
        if cfg.analyzer != "plain":
            from ..functions.tokenize import apply_analyzer_arrow

            texts = apply_analyzer_arrow(cfg.analyzer, texts)
        ids = np.asarray(_assign_ids(batch, cfg), dtype=np.int64)
        if cfg.store_positions:
            terms, doc_ids, tfs, dls, pos = batch_term_doc_tf_pos(ids, texts)
        else:
            terms, doc_ids, tfs, dls = batch_term_doc_tf(ids, texts)
            pos = None
        if len(terms) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int32()),
                    "dl": pa.array([], pa.int32()),
                    **({"pos": pa.array([], pa.binary())} if cfg.store_positions else {}),
                    "gkey": pa.array([], pa.int32()),
                }
            )
        shard = (doc_ids % cfg.n_shards).astype(np.int64)
        bucket = (stable_hash_strings(terms) % np.uint64(cfg.n_buckets)).astype(np.int64)
        gkey = (shard * cfg.n_buckets + bucket).astype(np.int32)
        if completed_gkeys:
            keep = ~np.isin(gkey, np.fromiter(completed_gkeys, dtype=np.int64))
            terms, doc_ids, tfs, dls, gkey = (
                terms[keep], doc_ids[keep], tfs[keep], dls[keep], gkey[keep]
            )
            if pos is not None:
                pos = pos.filter(pa.array(keep))
        # tf/dl/gkey ride the wide shuffle as int32: a doc never exceeds
        # 2^31 tokens and gkey is bounded by shards*buckets — 12 fewer bytes
        # per posting is ~27% of the shuffle at code-corpus posting widths
        # (the 2M-doc smoke showed this shuffle is what spills at scale).
        # write_segment re-widens to int64 at encode time; values identical.
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(doc_ids),
                "tf": pa.array(tfs.astype(np.int32)),
                "dl": pa.array(dls.astype(np.int32)),
                **({"pos": pos} if pos is not None else {}),
                "gkey": pa.array(gkey),
            }
        )

    return triples


# auto-gate for the staged shuffle: inputs this large produce triple volumes
# that exceed a single node's object store share and would spill raw Arrow
_STAGED_SHUFFLE_INPUT_BYTES = 2 << 30


def _build_segments_staged(
    triples, index_dir: str, cfg: BuildConfig, on_staged=None
) -> pd.DataFrame:
    """Disk-staged hash shuffle: write the triples hash-partitioned by gkey
    as compressed parquet (one streaming pass — no sort, no object-store
    materialization), then run ONE Ray task per (shard, bucket) that reads
    its partition and writes the segment. Output is byte-identical to the
    groupby path (write_segment sorts deterministically either way).

    On a multi-node cluster this is the classic external shuffle: map-side
    writers stream to shared storage, reduce-side segment writers read only
    their partition. Staging is rebuilt per run (completed segments were
    already dropped at the tokenize stage, so it only ever holds the
    missing groups); a crash mid-staging just re-stages on retry."""
    import shutil as _shutil

    import ray

    staging = os.path.join(index_dir, "_staging")
    _shutil.rmtree(staging, ignore_errors=True)
    triples.write_parquet(staging, partition_cols=["gkey"])
    if on_staged is not None:
        on_staged()  # e.g. start pass 1 — see build_index's race note

    os.makedirs(staging, exist_ok=True)  # empty triples write nothing
    gkeys = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(staging)
        if name.startswith("gkey=")
    )
    writer = make_segment_writer(index_dir, cfg)

    @ray.remote(num_cpus=1)
    def write_one(gkey: int) -> dict:
        import pyarrow.parquet as pq_

        t = pq_.read_table(os.path.join(staging, f"gkey={gkey}"))
        group = t.to_pandas()
        group["gkey"] = np.int32(gkey)  # partition col lives in the dir name
        return writer(group).to_dict("records")[0]

    rows = ray.get([write_one.remote(g) for g in gkeys])
    _shutil.rmtree(staging, ignore_errors=True)
    if not rows:
        return pd.DataFrame({"skipped": pd.Series([], dtype=bool)})
    return pd.DataFrame(rows)


def make_segment_writer(index_dir: str, cfg: BuildConfig):
    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        gkey = int(group["gkey"].iloc[0])
        shard, bucket = divmod(gkey, cfg.n_buckets)
        m = write_segment(
            index_dir,
            shard,
            bucket,
            group,
            lineage={**cfg.lineage, "pipeline_version": PIPELINE_VERSION},
        )
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "bucket": bucket,
                    "n_terms": m["n_terms"],
                    "n_postings": m["n_postings"],
                    "n_tokens": m["n_tokens"],
                    "skipped": bool(m.get("skipped", False)),
                }
            ]
        )

    return write_group


@locked_on("index_dir")
def build_index(
    source: str | ray.data.Dataset,
    index_dir: str,
    cfg: BuildConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume) the index. Returns the global stats dict.

    ``cfg.n_shards`` / ``cfg.n_buckets`` of None are auto-sized from the
    input's on-disk bytes and the cluster's CPU count; the chosen values are
    recorded in lineage (and, as always, in _global/stats.json — adds must
    reuse them)."""
    cfg = cfg or BuildConfig()
    from ..functions.tokenize import ANALYZERS

    if cfg.analyzer not in ANALYZERS:
        raise ValueError(
            f"unknown analyzer {cfg.analyzer!r} (known: {ANALYZERS})")
    if resume:
        # resume is crash recovery of the SAME build — a different analyzer
        # would silently mix token streams across segments
        try:
            prev_an = read_stats(index_dir).get("analyzer", "plain")
        except (OSError, ValueError, KeyError):
            prev_an = None
        if prev_an is not None and prev_an != cfg.analyzer:
            raise ValueError(
                f"build_index(resume=True): index {index_dir!r} was built "
                f"with analyzer {prev_an!r}, requested {cfg.analyzer!r} — "
                "rebuild with resume=False")
    if cfg.n_shards is None or cfg.n_buckets is None:
        est = _estimate_input_bytes(source)
        s_auto, b_auto = auto_shards_buckets(est)
        cfg.n_shards = cfg.n_shards or s_auto
        cfg.n_buckets = cfg.n_buckets or b_auto
        cfg.lineage.setdefault(
            "auto_sized",
            {"input_bytes": est, "n_shards": cfg.n_shards, "n_buckets": cfg.n_buckets},
        )
    if not resume and os.path.isdir(index_dir) and nonlock_contents(index_dir):
        # full rebuild: a dirty target dir would otherwise contribute stale
        # segments (from an older corpus or a different shard/bucket config)
        # to query results with no error. Only wipe a dir that actually
        # LOOKS like an index — a misconfigured path (e.g. pointing at the
        # corpus) must never be silently and irrecoverably deleted.
        looks_like_index = (
            os.path.isdir(os.path.join(index_dir, "segments"))
            or os.path.exists(os.path.join(index_dir, GLOBAL, "stats.json"))
            or os.path.isdir(os.path.join(index_dir, DOCS))
            or os.path.isdir(os.path.join(index_dir, DOCS + ".tmp"))
        )
        if not looks_like_index:
            raise ValueError(
                f"build_index(resume=False): refusing to delete {index_dir!r} — "
                "it is non-empty but has no index signature (segments/, "
                "_global/stats.json or _docs/). Point index_dir at a fresh or "
                "existing index directory, or remove it manually."
            )
        wipe_index_dir(index_dir)  # preserves the held write.lock file
    os.makedirs(index_dir, exist_ok=True)

    read_cols = list(
        dict.fromkeys(
            ([cfg.id_col] if cfg.id_col else list(cfg.key_cols))
            + list(cfg.meta_cols)
            + [cfg.text_col]
        )
    )
    if isinstance(source, str):
        docs = ray.data.read_parquet(source, columns=read_cols)
        lineage_input = source
    else:
        docs = source
        lineage_input = "<dataset>"
    cfg.lineage.setdefault("input", lineage_input)

    # ---- pass 1 (doc table) + pass 2 (segments) run CONCURRENTLY -----------
    # Two independent Dataset pipelines share the cluster; the streaming
    # executor interleaves them, so wall time ≈ max, not sum. Pass 1 writes
    # to a tmp dir + rename so a crash mid-write is never mistaken for a
    # completed pass on resume (the reference's commit-after-publish
    # ordering, IndexRecordsForV4.java:116-125).
    import shutil
    import threading

    docs_dir = os.path.join(index_dir, DOCS)
    pass1_error: list[BaseException] = []

    def run_pass1():
        try:
            if resume and os.path.isdir(docs_dir):
                from .update import _docs_columns

                cols = _docs_columns(docs_dir)
                if "gen" in cols and all(c in cols for c in cfg.meta_cols):
                    return  # complete doc table covering this config's schema
                # pre-gen-column or narrower-meta table: rebuild
                shutil.rmtree(docs_dir)
            tmp = docs_dir + ".tmp"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            docs.map_batches(
                make_doc_stats_fn(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
            ).write_parquet(tmp)
            if os.path.isdir(docs_dir):
                shutil.rmtree(docs_dir)
            os.replace(tmp, docs_dir)
        except BaseException as e:  # surfaced after join
            pass1_error.append(e)

    t1 = threading.Thread(target=run_pass1, daemon=True)

    completed = (
        list_complete_segments(index_dir, positions=cfg.store_positions)
        if resume else set()
    )
    completed_gkeys = frozenset(s * cfg.n_buckets + b for s, b in completed)

    # Fast resume: a finished build stamps (pipeline_version, layout,
    # n_groups) into stats.json — written LAST, so its presence proves the
    # prior build ran to completion. When the stamp matches this config AND
    # every stamped group is still complete on disk, skip the triples pass
    # entirely. Without this a no-op resume still streamed the whole corpus
    # through the tokenizer just to drop every group pre-shuffle (~5 s per
    # resume check at 100k docs — paid by EVERY query entry that re-verifies
    # the shared index). Groups can be empty-by-content (no term hashes into
    # them), which is why "all shard x bucket combos complete" is the wrong
    # test — the stamp records how many groups the finished build produced.
    prior_complete = False
    if resume:
        try:
            prev = read_stats(index_dir)
            prior_complete = (
                prev.get("pipeline_version") == PIPELINE_VERSION
                and prev.get("n_shards") == cfg.n_shards
                and prev.get("n_buckets") == cfg.n_buckets
                and bool(prev.get("positions", False)) == cfg.store_positions
                and prev.get("analyzer", "plain") == cfg.analyzer
                and prev.get("n_groups") is not None
                and prev.get("n_groups") == len(completed)
            )
        except (OSError, ValueError, KeyError):
            prior_complete = False
    if prior_complete:
        t1.start()
        seg_rows = pd.DataFrame({"skipped": pd.Series([], dtype=bool)})
    else:
        triples = docs.map_batches(
            make_triples_fn(cfg, completed_gkeys),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        mode = cfg.shuffle
        if mode == "auto":
            mode = (
                "staged"
                if _estimate_input_bytes(source) >= _STAGED_SHUFFLE_INPUT_BYTES
                else "groupby"
            )
        if mode == "staged":
            # pass 1 starts AFTER the staging Dataset write: two concurrent
            # driver-side write_parquet constructions race on ray's lazy
            # fsspec-http probe (a failed import is never cached, so every
            # overlapping pair can see a partially initialized module and
            # die with "cannot import name HTTPFileSystem"). Pass 1 instead
            # overlaps the reduce phase (per-gkey segment tasks), which
            # never touches a Dataset datasink — same wall-clock shape.
            seg_rows = _build_segments_staged(
                triples, index_dir, cfg, on_staged=t1.start
            )
        else:
            t1.start()
            manifests = triples.groupby("gkey").map_groups(
                make_segment_writer(index_dir, cfg), batch_format="pandas"
            )
            seg_rows = manifests.to_pandas()  # tiny: one row per segment
    t1.join()
    if pass1_error:
        raise pass1_error[0]

    n_docs = int(ray.data.read_parquet(docs_dir, columns=["doc_id"]).count())
    # total token count = sum of per-segment token counters (manifest K7
    # analog) — no second tokenization pass needed
    total_len = sum(m["n_tokens"] for m in _all_manifests(index_dir))

    # ---- seal: global term stats + corpus stats ----------------------------
    _seal_termstats(index_dir)
    stats = {
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": total_len / n_docs if n_docs else 0.0,
        "n_shards": cfg.n_shards,
        "n_buckets": cfg.n_buckets,
        # skipped = segments already complete before this run (their triples
        # were dropped pre-shuffle, so they never reach the writer)
        "n_segments_written": int((~seg_rows["skipped"]).sum()) if len(seg_rows) else 0,
        "n_segments_skipped": len(completed)
        + (int(seg_rows["skipped"].sum()) if len(seg_rows) else 0),
        "n_postings": sum(
            m["n_postings"] for m in _all_manifests(index_dir)
        ),
        "positions": cfg.store_positions,
        "analyzer": cfg.analyzer,
        # build-complete stamp for the fast-resume check: the number of
        # segment groups this finished build left complete on disk
        "n_groups": len(
            list_complete_segments(index_dir, positions=cfg.store_positions)
        ),
    }
    write_stats(index_dir, stats)
    return stats


def _all_manifests(index_dir: str) -> list[dict]:
    import glob
    import json

    out = []
    for p in sorted(glob.glob(os.path.join(index_dir, "segments", "s*_b*", "manifest.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out


_SEAL_DRIVER_MAX_BYTES = 256 * 1024 * 1024


_TERMSTATS_PTR = "termstats.CURRENT"


def termstats_dir(index_dir: str) -> str:
    """Resolve the CURRENT sealed termstats directory.

    Seals publish into a fresh versioned dir (``_global/termstats-<id>``)
    and then atomically replace a pointer file — readers resolving through
    the pointer never observe a half-deleted directory (the old
    rmtree-then-replace swap had a window where a term silently vanished
    from planning). Falls back to the legacy unversioned path for indexes
    sealed before the pointer existed.
    """
    root = os.path.join(index_dir, GLOBAL)
    try:
        with open(os.path.join(root, _TERMSTATS_PTR)) as f:
            name = os.path.basename(f.read().strip())
        p = os.path.join(root, name)
        if name.startswith("termstats") and os.path.isdir(p):
            return p
    except OSError:
        pass
    return os.path.join(root, "termstats")


def _seal_termstats(index_dir: str) -> None:
    """Aggregate per-segment term dictionaries into global per-term stats.

    Only VISIBLE segments are sealed — the base plus COMMITTED, unmerged
    delta generations (update.live_gens) — and the committed-gen set is
    recorded in ``termstats*/_SEALED.json`` so readers (TermStatsStore) can
    detect a stale seal after a crash between gen commit and seal and
    self-heal by resealing.

    Publication is a versioned dir + atomic pointer replace (see
    ``termstats_dir``): concurrent readers keep resolving the previous
    version until the pointer flips; superseded versions are reclaimed
    age-gated, never while they could still be mid-read.

    Vocab-sized, not corpus-sized. Two paths with identical output layout
    (termstats-<id>/bucket=N/):
    - small vocab (term files < 256 MB): single pandas reduction — the Ray
      groupby's fixed cost would dominate;
    - large vocab (unbounded identifier space at code-corpus scale): Ray
      Data groupby shuffle.
    """
    import json
    import shutil

    from .update import (
        committed_gens,
        folded_gens,
        list_segment_generations,
        live_gens,
    )

    # snapshot the committed set BEFORE listing inputs: a generation that
    # commits mid-seal must NOT be claimed by this seal's _SEALED.json
    # (claiming it without its term files would make the stale-seal check
    # pass while df silently misses the gen; claiming LESS than aggregated
    # only triggers a harmless reseal)
    sealed = sorted(committed_gens(index_dir))
    _folded = folded_gens(index_dir)
    term_files = sorted(
        os.path.join(index_dir, "segments", name, "terms.parquet")
        for _key, names in list_segment_generations(index_dir).items()
        for name in live_gens(index_dir, names, folded=_folded)
    )
    term_files = [f for f in term_files if os.path.exists(f)]
    root = os.path.join(index_dir, GLOBAL)
    if not term_files:
        return
    # unique versioned dir per sealer: concurrent reseals (e.g. several
    # query actors self-healing the same stale seal) never touch each
    # other's staging dirs. Superseded/crashed versions are reclaimed
    # age-gated (a live concurrent seal lasts seconds, never an hour) and
    # never the version the pointer currently names.
    import glob as _glob
    import time as _time
    import uuid as _uuid

    tmp = os.path.join(root, f"termstats-{_uuid.uuid4().hex[:8]}")

    total_bytes = sum(os.path.getsize(f) for f in term_files)
    cols = ["term", "bucket", "df", "cf", "max_tf", "min_dl"]
    if total_bytes < _SEAL_DRIVER_MAX_BYTES:
        import pyarrow.parquet as pq

        df = pd.concat(
            [pq.read_table(f, columns=cols).to_pandas() for f in term_files],
            ignore_index=True,
        )
        g = df.groupby(["bucket", "term"], as_index=False).agg(
            df=("df", "sum"), cf=("cf", "sum"),
            max_tf=("max_tf", "max"), min_dl=("min_dl", "min"),
        )
        for bucket, sub in g.groupby("bucket"):
            bdir = os.path.join(tmp, f"bucket={int(bucket)}")
            os.makedirs(bdir, exist_ok=True)
            out = sub.drop(columns=["bucket"]).sort_values("term", ignore_index=True)
            import pyarrow as pa_

            pq.write_table(pa_.Table.from_pandas(out, preserve_index=False),
                           os.path.join(bdir, "part-0.parquet"))
    else:
        from ray.data.aggregate import Max, Min, Sum

        ds = ray.data.read_parquet(term_files, columns=cols)
        g = ds.groupby(["bucket", "term"]).aggregate(
            Sum("df", alias_name="df"),
            Sum("cf", alias_name="cf"),
            Max("max_tf", alias_name="max_tf"),
            Min("min_dl", alias_name="min_dl"),
        )
        g.write_parquet(tmp, partition_cols=["bucket"])
    _publish_termstats(index_dir, tmp, sealed)


def _publish_termstats(index_dir: str, tmp: str, sealed: list[int]) -> None:
    """Stamp ``_SEALED.json`` into the staged versioned dir and flip the
    pointer atomically (write-tmp + os.replace). Two concurrent sealers
    compute identical content — last writer wins and the loser's version
    is reclaimed by the age-gated sweep."""
    import glob as _glob
    import json
    import shutil
    import time as _time
    import uuid as _uuid

    root = os.path.join(index_dir, GLOBAL)
    with open(os.path.join(tmp, "_SEALED.json"), "w") as f:
        json.dump({"sealed_gens": sealed}, f)
    ptr = os.path.join(root, _TERMSTATS_PTR)
    ptr_tmp = f"{ptr}.tmp-{_uuid.uuid4().hex[:8]}"
    with open(ptr_tmp, "w") as f:
        f.write(os.path.basename(tmp))
    os.replace(ptr_tmp, ptr)
    current = termstats_dir(index_dir)
    now = _time.time()
    for old in _glob.glob(os.path.join(root, "termstats-*")) + [
        os.path.join(root, "termstats")  # legacy unversioned layout
    ] + _glob.glob(os.path.join(root, "termstats.tmp-*")):
        if os.path.abspath(old) == os.path.abspath(current):
            continue
        try:
            if os.path.isdir(old) and now - os.path.getmtime(old) > 3600:
                shutil.rmtree(old, ignore_errors=True)
        except OSError:
            pass
    for stale in _glob.glob(ptr + ".tmp-*"):  # crashed sealers' pointer tmps
        try:
            if now - os.path.getmtime(stale) > 3600:
                os.unlink(stale)
        except OSError:
            pass


def _seal_termstats_incremental(index_dir: str, gen: int) -> bool:
    """Delta-sized seal refresh after ``add_documents``: merge generation
    ``gen``'s term stats into the CURRENT seal instead of re-aggregating
    every live segment's term file. Exact by construction — df/cf are
    sums and max_tf/min_dl are max/min, so combine(prev_agg, delta) equals
    the full aggregation, bucket by bucket (the full-reseal parity test
    pins this). Returns False (caller must full-reseal) when:

    - the current seal does not cover exactly committed − {gen} (stale
      seal, crashed prior add — merging into it would compound the gap);
    - the seal is past the driver-path size bound (the Ray groupby path
      owns that regime; at 10^9 terms a distributed incremental merge
      would be the next step, and the full path is already distributed).
    """
    import glob as _glob
    import json
    import uuid as _uuid

    from .update import committed_gens

    committed_now = sorted(committed_gens(index_dir))
    if gen not in committed_now:
        return False
    cur = termstats_dir(index_dir)
    try:
        with open(os.path.join(cur, "_SEALED.json")) as f:
            cur_gens = sorted(json.load(f).get("sealed_gens", []))
    except (OSError, ValueError):
        return False
    if cur_gens != sorted(set(committed_now) - {gen}):
        return False
    cur_bytes = sum(
        os.path.getsize(p)
        for p in _glob.glob(os.path.join(cur, "bucket=*", "*.parquet"))
    )
    if cur_bytes >= _SEAL_DRIVER_MAX_BYTES:
        return False
    import pyarrow.parquet as pq

    cols = ["term", "bucket", "df", "cf", "max_tf", "min_dl"]
    delta_files = sorted(
        _glob.glob(os.path.join(index_dir, "segments", f"*_g{gen:04d}",
                                "terms.parquet")))
    if not delta_files:
        # empty generation (e.g. metadata-only): content unchanged, only
        # the claimed gen list grows — restamp in place
        tmp = os.path.join(cur, "_SEALED.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"sealed_gens": committed_now}, f)
        os.replace(tmp, os.path.join(cur, "_SEALED.json"))
        return True
    delta = pd.concat(
        [pq.read_table(f, columns=cols).to_pandas() for f in delta_files],
        ignore_index=True,
    )
    root = os.path.join(index_dir, GLOBAL)
    tmp = os.path.join(root, f"termstats-{_uuid.uuid4().hex[:8]}")
    import pyarrow as pa_
    import shutil as _shutil

    seen_buckets = set()
    for bdir in sorted(_glob.glob(os.path.join(cur, "bucket=*"))):
        b = int(os.path.basename(bdir).split("=", 1)[1])
        seen_buckets.add(b)
        out_bdir = os.path.join(tmp, f"bucket={b}")
        sub = delta[delta["bucket"] == b]
        if not len(sub):
            _shutil.copytree(bdir, out_bdir)  # untouched bucket rides along
            continue
        prev = pq.read_table(bdir).to_pandas()
        prev["bucket"] = np.int64(b)
        merged = (
            pd.concat([prev[cols], sub[cols]], ignore_index=True)
            .groupby(["bucket", "term"], as_index=False)
            .agg(df=("df", "sum"), cf=("cf", "sum"),
                 max_tf=("max_tf", "max"), min_dl=("min_dl", "min"))
            .drop(columns=["bucket"])
            .sort_values("term", ignore_index=True)
        )
        os.makedirs(out_bdir, exist_ok=True)
        pq.write_table(pa_.Table.from_pandas(merged, preserve_index=False),
                       os.path.join(out_bdir, "part-0.parquet"))
    for b, sub in delta.groupby("bucket"):  # buckets new to the vocabulary
        b = int(b)
        if b in seen_buckets:
            continue
        out_bdir = os.path.join(tmp, f"bucket={b}")
        os.makedirs(out_bdir, exist_ok=True)
        merged = (
            sub.groupby(["bucket", "term"], as_index=False)
            .agg(df=("df", "sum"), cf=("cf", "sum"),
                 max_tf=("max_tf", "max"), min_dl=("min_dl", "min"))
            .drop(columns=["bucket"])
            .sort_values("term", ignore_index=True)
        )
        pq.write_table(pa_.Table.from_pandas(merged, preserve_index=False),
                       os.path.join(out_bdir, "part-0.parquet"))
    _publish_termstats(index_dir, tmp, committed_now)
    return True
