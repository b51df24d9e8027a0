"""Reshard: rewrite an index into a new (n_shards, n_buckets) layout by
streaming POSTINGS, never the corpus.

Growing a cluster (or fixing a mis-sized layout) must not cost a full
rebuild: at 100 TB the dominant build cost is reading + tokenizing the
corpus, while the index itself is ~an order of magnitude smaller. Reshard
decodes each existing segment back into its (term, doc_id, tf, dl[, pos])
triples — one Ray task per segment — recomputes the new gkey exactly the
way the build does (``doc_id % n_shards``, ``stable_hash(term) %
n_buckets``, build.py:204-206), and feeds the same ``gkey`` shuffle +
``write_segment`` path. Because ``write_segment`` is deterministic over its
triple set (segments.py:100) and the position codec is canonical
(re-encode(decode(bytes)) == bytes), the resharded index is BYTE-IDENTICAL
to a fresh build at the target layout — tested, not assumed.

Scope: base segments only. An index with committed delta generations or
tombstones must be ``merge_segments``-ed first (the merge already folds
deltas + deletes into the base); reshard refuses otherwise rather than
silently dropping updates.

Reference parity: the reference re-posts every document through Solr to
change its collection layout (SolrHelper.java posts doc-by-doc); this is
the index-level equivalent that skips the document pipeline entirely.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenize import stable_hash_strings
from .build import BuildConfig, _all_manifests, _seal_termstats, make_segment_writer
from .postings import decode_posting_list, decode_positions, position_bytes_array
from .segments import (
    DOCS,
    SegmentReader,
    list_complete_segments,
    read_stats,
    write_stats,
)
from .locking import locked_on, nonlock_contents
from .update import committed_gens, load_tombstone_thresholds


def segment_to_triples(
    src_dir: str,
    shard: int,
    bucket: int,
    n_shards: int,
    n_buckets: int,
    positions: bool,
) -> pa.Table:
    """Decode one source segment into triples keyed by the TARGET layout.

    Per-term decode (the repo's one-varbyte-call-per-term pattern,
    postings.py:231); term/bucket hashes are computed once per unique term
    and repeated by df — never per posting.
    """
    r = SegmentReader(src_dir, shard, bucket)
    terms = np.asarray(r.terms["term"].to_pylist(), dtype=object)
    n_terms = len(terms)
    doc_parts, tf_parts, dl_parts, pos_parts = [], [], [], []
    dfs = np.zeros(n_terms, dtype=np.int64)
    for i, term in enumerate(terms):
        e = r.term_entry(term)
        doc_ids, tfs, dls = decode_posting_list(e["payload"], e["block_table"])
        dfs[i] = len(doc_ids)
        doc_parts.append(doc_ids)
        tf_parts.append(tfs)
        dl_parts.append(dls)
        if positions:
            flat = decode_positions(
                e["pos_payload"], e["block_table"]["pos_bytes"], tfs
            )
            pos_parts.append(position_bytes_array(tfs, flat))
    if n_terms == 0:
        return pa.table({
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int32()),
            "dl": pa.array([], pa.int32()),
            **({"pos": pa.array([], pa.binary())} if positions else {}),
            "gkey": pa.array([], pa.int32()),
        })
    doc_ids = np.concatenate(doc_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    term_col = np.repeat(terms, dfs)
    bucket_u = (stable_hash_strings(terms) % np.uint64(n_buckets)).astype(np.int64)
    new_bucket = np.repeat(bucket_u, dfs)
    new_shard = doc_ids % n_shards
    gkey = (new_shard * n_buckets + new_bucket).astype(np.int32)
    return pa.table({
        "term": pa.array(term_col, pa.string()),
        "doc_id": pa.array(doc_ids),
        "tf": pa.array(tfs.astype(np.int32)),
        "dl": pa.array(dls.astype(np.int32)),
        **(
            {"pos": pa.concat_arrays(pos_parts)
             if len(pos_parts) > 1 else pos_parts[0]}
            if positions else {}
        ),
        "gkey": pa.array(gkey),
    })


@locked_on("dst_dir")
def reshard_index(
    src_dir: str, dst_dir: str, n_shards: int, n_buckets: int,
    resume: bool = False,
) -> dict:
    """Rewrite ``src_dir`` into ``dst_dir`` at (n_shards, n_buckets).

    ``resume=True`` continues into a partially-written ``dst_dir`` from a
    crashed run: complete target segments are skipped by ``write_segment``'s
    manifest check (their triples still decode and shuffle — the reshard
    input is the index, not the corpus, so the re-decode is cheap), and the
    ``_docs`` rewrite is tmp+rename idempotent. The result is byte-identical
    to an uninterrupted run.

    Returns the new stats dict (same shape as ``build_index``'s)."""
    stats = read_stats(src_dir)
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("reshard_index: src and dst must differ (the source "
                         "stays readable until the new layout is sealed)")
    gens = committed_gens(src_dir)
    tomb_ids, _ = load_tombstone_thresholds(src_dir)
    if gens or len(tomb_ids):
        raise ValueError(
            "reshard_index: source has delta generations or tombstones — "
            "run merge_segments(expunge=True) first so the base segments "
            "are the whole index")
    positions = bool(stats.get("positions", False))
    segs = sorted(list_complete_segments(src_dir, positions=positions))
    if not segs:
        raise ValueError(f"reshard_index: no complete segments in {src_dir!r}")

    if not resume and os.path.isdir(dst_dir) and nonlock_contents(dst_dir):
        raise ValueError(f"reshard_index: {dst_dir!r} is not empty "
                         "(pass resume=True to continue a crashed reshard)")
    os.makedirs(dst_dir, exist_ok=True)

    # ---- postings: one decode task per source segment -> one gkey shuffle --
    def emit(batch: pd.DataFrame):
        for s, b in zip(batch["shard"], batch["bucket"]):
            yield segment_to_triples(
                src_dir, int(s), int(b), n_shards, n_buckets, positions)

    src_items = ray.data.from_items(
        [{"shard": s, "bucket": b} for s, b in segs])
    triples = src_items.map_batches(emit, batch_format="pandas", batch_size=1)
    cfg = BuildConfig(
        n_shards=n_shards, n_buckets=n_buckets, store_positions=positions,
        lineage={"reshard_from": src_dir,
                 "src_layout": [stats["n_shards"], stats["n_buckets"]]},
    )
    manifests = triples.groupby("gkey").map_groups(
        make_segment_writer(dst_dir, cfg), batch_format="pandas")
    seg_rows = manifests.to_pandas()

    # ---- forward doc table: only the routing column changes ----------------
    def redoc(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return t.set_column(
            t.schema.get_field_index("shard"), "shard",
            pa.array((ids % n_shards).astype(np.int32)))

    docs_dst = os.path.join(dst_dir, DOCS)
    docs_tmp = docs_dst + ".tmp"
    # Resume-safe: the rename below is atomic, so an existing _docs IS a
    # completed rewrite — skip it (a crash between the rename and
    # write_stats would otherwise hit os.replace onto a non-empty dir).
    # A crash DURING the write leaves partial files in _docs.tmp; rmtree
    # first so the re-run's write_parquet can't add UUID-named files next
    # to them and silently duplicate rows.
    if not os.path.isdir(docs_dst):
        shutil.rmtree(docs_tmp, ignore_errors=True)
        ray.data.read_parquet(os.path.join(src_dir, DOCS)).map_batches(
            redoc, batch_format="pyarrow").write_parquet(docs_tmp)
        os.replace(docs_tmp, docs_dst)

    # ---- seal (same fields build_index writes) ------------------------------
    _seal_termstats(dst_dir)
    n_docs = int(ray.data.read_parquet(
        os.path.join(dst_dir, DOCS), columns=["doc_id"]).count())
    total_len = sum(m["n_tokens"] for m in _all_manifests(dst_dir))
    out = {
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": total_len / n_docs if n_docs else 0.0,
        "n_shards": n_shards,
        "n_buckets": n_buckets,
        "n_segments_written": int((~seg_rows["skipped"]).sum()) if len(seg_rows) else 0,
        "n_segments_skipped": int(seg_rows["skipped"].sum()) if len(seg_rows) else 0,
        "n_postings": sum(m["n_postings"] for m in _all_manifests(dst_dir)),
        "positions": positions,
        "n_groups": len(list_complete_segments(dst_dir, positions=positions)),
    }
    write_stats(dst_dir, out)
    return out


def _tree_bytes(d: str) -> dict[str, bytes]:
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, d)] = open(p, "rb").read()
    return out


def segments_equal(a: str, b: str) -> bool:
    """Byte-compare the segments/ trees of two indexes (manifests excluded —
    lineage differs by construction; terms/blocks/postings must match)."""
    ta, tb = _tree_bytes(os.path.join(a, "segments")), _tree_bytes(
        os.path.join(b, "segments"))
    ka = {k for k in ta if not k.endswith("manifest.json")}
    kb = {k for k in tb if not k.endswith("manifest.json")}
    if ka != kb:
        return False
    return all(ta[k] == tb[k] for k in ka)
