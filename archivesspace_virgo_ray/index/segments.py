"""Segment store: atomic segment writes, manifests, lineage, resume.

Index layout on disk (partitioned so a failed run skips finished work — the
Ray analog of the reference's idempotent per-ref output files + hash-gated
full-reindex, SolrHelper.java:98-100, IndexRecordsForV4.java:44-69,116-125):

    index_dir/
      segments/s{shard:04d}_b{bucket:04d}/
        terms.parquet      # term-ordered dictionary: term, df, cf, max_tf,
                           #   min_dl, n_blocks, block_start, payload_off,
                           #   payload_len, shard, bucket
        blocks.parquet     # block-max skip table, concatenated in term order
                           #   (+ pos_bytes per block when positional)
        postings.bin       # delta+varbyte block payloads
        positions.bin      # optional per-posting token positions stream
                           #   (store_positions=True; terms carry pos_off/len)
        manifest.json      # lineage + counters + pipeline_version + status
      _docs/               # forward doc table: doc_id, dl, sha256, meta cols
      _global/
        stats.json         # N, total_len, avgdl, n_shards, n_buckets, version
        termstats/bucket=N # global per-term df/cf/max_tf/min_dl (query-time)

A segment is visible only once its manifest says ``complete`` and carries the
current PIPELINE_VERSION — the write is tmp-dir + ``os.replace`` (manifest
written before the rename, so a crash never leaves a half segment visible).

Doc sharding doubles as the head-term salting (north_rule): a head term's
postings are split across the ``n_shards`` doc shards, so no single reducer
ever materializes a corpus-sized posting list; each (shard, bucket) group is
bounded by shard_size × bucket_share.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import PIPELINE_VERSION
from .postings import encode_posting_list

SEGMENTS = "segments"
GLOBAL = "_global"
DOCS = "_docs"


def segment_name(shard: int, bucket: int) -> str:
    return f"s{shard:04d}_b{bucket:04d}"


def segment_dir(index_dir: str, shard: int, bucket: int) -> str:
    return os.path.join(index_dir, SEGMENTS, segment_name(shard, bucket))


def segment_is_complete(
    index_dir: str, shard: int, bucket: int, positions: bool | None = None
) -> bool:
    """``positions``: when given, a segment only counts as complete if its
    manifest's positions flag matches — a resume with a different
    ``store_positions`` config must rebuild rather than silently mix
    positional and non-positional segments."""
    mpath = os.path.join(segment_dir(index_dir, shard, bucket), "manifest.json")
    try:
        with open(mpath) as f:
            m = json.load(f)
        ok = m.get("status") == "complete" and m.get("pipeline_version") == PIPELINE_VERSION
        if ok and positions is not None:
            ok = bool(m.get("positions", False)) == bool(positions)
        return ok
    except (OSError, json.JSONDecodeError):
        return False


def list_complete_segments(
    index_dir: str, positions: bool | None = None
) -> set[tuple[int, int]]:
    seg_root = os.path.join(index_dir, SEGMENTS)
    done: set[tuple[int, int]] = set()
    if not os.path.isdir(seg_root):
        return done
    for name in os.listdir(seg_root):
        if not name.startswith("s") or "_b" not in name:
            continue
        try:
            s, b = name[1:].split("_b")
            shard, bucket = int(s), int(b)
        except ValueError:
            continue
        if segment_is_complete(index_dir, shard, bucket, positions):
            done.add((shard, bucket))
    return done


def write_segment(
    index_dir: str,
    shard: int,
    bucket: int,
    group: pd.DataFrame,
    lineage: dict | None = None,
) -> dict:
    """Build + atomically publish one segment from its (term, doc_id, tf, dl)
    triples. Deterministic: terms sorted ascending, postings doc_id-ascending,
    so the same triple set yields byte-identical files regardless of upstream
    partitioning (resume test relies on this).

    Returns the manifest dict (also written to disk).
    """
    if segment_is_complete(index_dir, shard, bucket, positions="pos" in group.columns):
        with open(os.path.join(segment_dir(index_dir, shard, bucket), "manifest.json")) as f:
            m = json.load(f)
        m["skipped"] = True
        return m

    # (term, doc_id) sort via factorize + lexsort: ~5x faster than an
    # object-dtype mergesort on large groups, same deterministic order
    raw_terms = group["term"].to_numpy()
    codes, uniq_terms = pd.factorize(raw_terms, sort=True)
    order = np.lexsort((group["doc_id"].to_numpy(np.int64), codes))
    codes = codes[order]
    doc_ids = group["doc_id"].to_numpy(np.int64)[order]
    tfs = group["tf"].to_numpy(np.int64)[order]
    dls = group["dl"].to_numpy(np.int64)[order]
    # optional positions: per-posting pre-encoded delta+varbyte bytes
    # (tokenize.batch_term_doc_tf_pos) — the writer only reorders and
    # concatenates them, never re-encodes
    has_pos = "pos" in group.columns
    pos_sorted = group["pos"].to_numpy()[order] if has_pos else None
    pos_lens = (
        np.fromiter((len(b) for b in pos_sorted), dtype=np.int64, count=len(pos_sorted))
        if has_pos else None
    )

    # term boundaries
    first = np.ones(len(codes), dtype=bool)
    first[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(first)
    ends = np.concatenate([starts[1:], [len(codes)]])
    uniq_terms = np.asarray(uniq_terms, dtype=object)

    term_rows = {
        "term": uniq_terms,
        "df": (ends - starts).astype(np.int64),
        "cf": np.add.reduceat(tfs, starts).astype(np.int64) if len(tfs) else np.empty(0, np.int64),
        "max_tf": np.maximum.reduceat(tfs, starts).astype(np.int64) if len(tfs) else np.empty(0, np.int64),
        "min_dl": np.minimum.reduceat(dls, starts).astype(np.int64) if len(dls) else np.empty(0, np.int64),
    }
    n_blocks_l, block_start_l, payload_off_l, payload_len_l = [], [], [], []
    block_cols: dict[str, list] = {
        k: [] for k in ("last_doc", "n", "max_tf", "min_dl", "doc_bytes", "tf_bytes", "dl_bytes")
    }
    if has_pos:
        block_cols["pos_bytes"] = []
        pos_off_l, pos_len_l = [], []
        pos_payload = bytearray()
    payload = bytearray()
    block_cursor = 0
    for s, e in zip(starts, ends):
        body, btab = encode_posting_list(doc_ids[s:e], tfs[s:e], dls[s:e])
        n_blocks_l.append(len(btab["n"]))
        block_start_l.append(block_cursor)
        payload_off_l.append(len(payload))
        payload_len_l.append(len(body))
        block_cursor += len(btab["n"])
        payload += body
        if has_pos:
            from .postings import BLOCK_SIZE

            bounds = np.arange(0, e - s, BLOCK_SIZE)
            block_cols["pos_bytes"].append(
                np.add.reduceat(pos_lens[s:e], bounds).astype(np.int64)
            )
            pos_off_l.append(len(pos_payload))
            term_pos = b"".join(pos_sorted[s:e].tolist())
            pos_len_l.append(len(term_pos))
            pos_payload += term_pos
        for k in block_cols:
            if k != "pos_bytes":
                block_cols[k].append(btab[k])

    n_terms = len(uniq_terms)
    terms_tbl = pa.table(
        {
            **{k: pa.array(v) for k, v in term_rows.items()},
            "n_blocks": pa.array(n_blocks_l, pa.int32()),
            "block_start": pa.array(block_start_l, pa.int64()),
            "payload_off": pa.array(payload_off_l, pa.int64()),
            "payload_len": pa.array(payload_len_l, pa.int64()),
            **(
                {
                    "pos_off": pa.array(pos_off_l, pa.int64()),
                    "pos_len": pa.array(pos_len_l, pa.int64()),
                }
                if has_pos else {}
            ),
            "shard": pa.array([shard] * n_terms, pa.int32()),
            "bucket": pa.array([bucket] * n_terms, pa.int32()),
        }
    )
    blocks_tbl = pa.table(
        {k: pa.array(np.concatenate(v) if v else np.empty(0, np.int64)) for k, v in block_cols.items()}
    )

    final_dir = segment_dir(index_dir, shard, bucket)
    tmp_dir = os.path.join(
        index_dir, SEGMENTS, f".tmp-{segment_name(shard, bucket)}-{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(tmp_dir, exist_ok=True)
    try:
        pq.write_table(terms_tbl, os.path.join(tmp_dir, "terms.parquet"))
        pq.write_table(blocks_tbl, os.path.join(tmp_dir, "blocks.parquet"))
        with open(os.path.join(tmp_dir, "postings.bin"), "wb") as f:
            f.write(bytes(payload))
        if has_pos:
            with open(os.path.join(tmp_dir, "positions.bin"), "wb") as f:
                f.write(bytes(pos_payload))
        manifest = {
            "shard": shard,
            "bucket": bucket,
            "status": "complete",
            "pipeline_version": PIPELINE_VERSION,
            "n_terms": int(n_terms),
            "n_postings": int(len(doc_ids)),
            "n_tokens": int(tfs.sum()) if len(tfs) else 0,
            "payload_bytes": len(payload),
            "positions": bool(has_pos),
            "positions_bytes": len(pos_payload) if has_pos else 0,
            "lineage": lineage or {},
        }
        with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        os.makedirs(os.path.dirname(final_dir), exist_ok=True)
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)  # stale / version-mismatched segment
        os.replace(tmp_dir, final_dir)
    finally:
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir, ignore_errors=True)
    return manifest


class SegmentReader:
    """Read-side view of one segment: term dict in memory, postings mmapped.

    Accepts either (index_dir, shard, bucket) for a base segment or
    (index_dir, name=...) for any segment directory (delta generations)."""

    def __init__(
        self,
        index_dir: str,
        shard: int | None = None,
        bucket: int | None = None,
        name: str | None = None,
    ):
        d = (
            os.path.join(index_dir, SEGMENTS, name)
            if name is not None
            else segment_dir(index_dir, shard, bucket)
        )
        self.terms = pq.read_table(os.path.join(d, "terms.parquet"))
        btab = pq.read_table(os.path.join(d, "blocks.parquet"))
        self.blocks = {name: btab[name].to_numpy() for name in btab.column_names}
        ppath = os.path.join(d, "postings.bin")
        self.payload = (
            np.memmap(ppath, dtype=np.uint8, mode="r")
            if os.path.getsize(ppath)
            else np.empty(0, np.uint8)
        )
        xpath = os.path.join(d, "positions.bin")
        self.has_positions = os.path.exists(xpath)
        self.pos_payload = (
            np.memmap(xpath, dtype=np.uint8, mode="r")
            if self.has_positions and os.path.getsize(xpath)
            else np.empty(0, np.uint8)
        )
        t = self.terms
        self._lookup = {
            term: i for i, term in enumerate(t["term"].to_pylist())
        }
        self._np = {
            name: t[name].to_numpy() for name in (
                "df", "cf", "max_tf", "min_dl", "n_blocks", "block_start",
                "payload_off", "payload_len",
            )
        }
        if self.has_positions and "pos_off" in t.column_names:
            self._np["pos_off"] = t["pos_off"].to_numpy()
            self._np["pos_len"] = t["pos_len"].to_numpy()
        else:
            self.has_positions = False

    def term_entry(self, term: str) -> dict | None:
        i = self._lookup.get(term)
        if i is None:
            return None
        e = {k: int(v[i]) for k, v in self._np.items()}
        bs, nb = e["block_start"], e["n_blocks"]
        e["block_table"] = {k: v[bs : bs + nb] for k, v in self.blocks.items()}
        e["payload"] = bytes(
            self.payload[e["payload_off"] : e["payload_off"] + e["payload_len"]]
        )
        if self.has_positions:
            e["pos_payload"] = bytes(
                self.pos_payload[e["pos_off"] : e["pos_off"] + e["pos_len"]]
            )
        return e


def write_stats(index_dir: str, stats: dict) -> None:
    gdir = os.path.join(index_dir, GLOBAL)
    os.makedirs(gdir, exist_ok=True)
    tmp = os.path.join(gdir, f".stats-{uuid.uuid4().hex[:8]}.json")
    with open(tmp, "w") as f:
        json.dump({**stats, "pipeline_version": PIPELINE_VERSION}, f)
    os.replace(tmp, os.path.join(gdir, "stats.json"))


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, GLOBAL, "stats.json")) as f:
        return json.load(f)
