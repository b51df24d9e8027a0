"""Incremental index maintenance: generational segments, merger actors,
delete tombstones.

The reference maintains its Solr index incrementally — an mtime-window dirty
set (IndexRecords.java:124-132) re-posts changed docs, and Solr handles
segment merging internally. Here both halves are explicit:

- ``add_documents``: tokenizes ONLY the new docs and writes **delta
  segments** ``s####_b####_g####`` next to the base segments; global stats
  (N, total_len) and per-term stats (df/cf/max_tf/min_dl) are merged in.
  Because doc ids are content-derived and shard = doc_id % n_shards, a doc's
  postings land in the same shard forever — queries stay doc-sharded
  scatter/merge, reading base + deltas per (shard, bucket).
- ``merge_segments``: an actor-pool stage (``map_batches(MergerActor)``)
  that k-way-merges all generations of a (shard, bucket) into a single base
  segment. Merging is deterministic (terms ascending, postings
  doc_id-ascending), so a merged index is **byte-identical** to a full
  rebuild over the union corpus — the conformance test asserts exactly that.
- ``delete_documents``: tombstone doc ids (Lucene-style): masked at query
  time, df/avgdl unchanged until a rebuild — same visibility semantics as
  Solr deletes before an optimize.
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from .build import BuildConfig, _all_manifests, make_doc_stats_fn, make_triples_fn
from .segments import GLOBAL, SEGMENTS, segment_name, write_segment
from .segments import read_stats, write_stats

_GEN_RE = re.compile(r"^s(\d+)_b(\d+)(?:_g(\d+))?$")


def list_segment_generations(index_dir: str) -> dict[tuple[int, int], list[str]]:
    """(shard, bucket) -> [dir names, base first then gens ascending]."""
    root = os.path.join(index_dir, SEGMENTS)
    out: dict[tuple[int, int], list[str]] = {}
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        m = _GEN_RE.match(name)
        if not m:
            continue
        if not os.path.exists(os.path.join(root, name, "manifest.json")):
            continue
        key = (int(m.group(1)), int(m.group(2)))
        out.setdefault(key, []).append(name)
    return out


def _gen_marker_dir(index_dir: str) -> str:
    return os.path.join(index_dir, GLOBAL, "gens")


def committed_gens(index_dir: str) -> set[int]:
    d = _gen_marker_dir(index_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        m = re.match(r"^g(\d+)\.json$", name)
        if m:
            out.add(int(m.group(1)))
    return out


def _commit_gen(index_dir: str, gen: int, info: dict) -> None:
    d = _gen_marker_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".g{gen:04d}.tmp")
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, os.path.join(d, f"g{gen:04d}.json"))


def _cleanup_uncommitted_gens(index_dir: str) -> bool:
    """Remove delta segment dirs / doc-table parts from generations whose
    commit marker never landed (a crashed or abandoned add_documents) —
    makes add_documents safely retryable (no double indexing). Returns True
    if anything was removed (caller must reseal term stats)."""
    import shutil

    removed = False
    committed = committed_gens(index_dir)
    root = os.path.join(index_dir, SEGMENTS)
    if os.path.isdir(root):
        for name in os.listdir(root):
            m = _GEN_RE.match(name)
            if m and m.group(3) and int(m.group(3)) not in committed:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
                removed = True
    docs_dir = os.path.join(index_dir, "_docs")
    if os.path.isdir(docs_dir):
        for name in os.listdir(docs_dir):
            m = re.match(r"^gen=(\d+)$", name)
            if m and int(m.group(1)) not in committed:
                shutil.rmtree(os.path.join(docs_dir, name), ignore_errors=True)
                removed = True
    return removed


def live_gens(index_dir: str, names: list[str]) -> list[str]:
    """Visible segment dirs for one (shard, bucket): the base plus delta
    generations that are (a) committed (gen marker landed) and (b) not yet
    folded into the base (``merged_through_gen`` in the base manifest)."""
    merged_through = -1
    base = [n for n in names if "_g" not in n]
    if base:
        mpath = os.path.join(index_dir, SEGMENTS, base[0], "manifest.json")
        try:
            with open(mpath) as f:
                merged_through = json.load(f).get("merged_through_gen", -1)
        except (OSError, ValueError):
            pass
    committed = committed_gens(index_dir)
    out = list(base)
    for n in names:
        m = re.search(r"_g(\d+)$", n)
        if m and int(m.group(1)) > merged_through and int(m.group(1)) in committed:
            out.append(n)
    return out


def _next_gen(index_dir: str) -> int:
    gens = {
        int(m.group(3))
        for names in list_segment_generations(index_dir).values()
        for m in (_GEN_RE.match(n) for n in names)
        if m and m.group(3)
    } | committed_gens(index_dir)
    return (max(gens) + 1) if gens else 1


def add_documents(
    source: str | ray.data.Dataset, index_dir: str, cfg: BuildConfig
) -> dict:
    """Append new documents (new doc ids) as a delta generation.

    cfg must match the base index's n_shards/n_buckets (checked)."""
    stats = read_stats(index_dir)
    if (stats["n_shards"], stats["n_buckets"]) != (cfg.n_shards, cfg.n_buckets):
        raise ValueError("cfg shards/buckets must match the existing index")
    from .build import _seal_termstats

    if _cleanup_uncommitted_gens(index_dir):  # drop half-added gens (retry)
        _seal_termstats(index_dir)  # stale term stats may include them
    repair_stats(index_dir)  # heal a prior crash between marker and stats
    stats = read_stats(index_dir)
    gen = _next_gen(index_dir)

    read_cols = list(
        dict.fromkeys(
            ([cfg.id_col] if cfg.id_col else list(cfg.key_cols))
            + list(cfg.meta_cols)
            + [cfg.text_col]
        )
    )
    docs = (
        ray.data.read_parquet(source, columns=read_cols)
        if isinstance(source, str)
        else source
    )

    # doc table delta (append-only part files)
    docs_dir = os.path.join(index_dir, "_docs")
    docs.map_batches(
        make_doc_stats_fn(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    ).write_parquet(os.path.join(docs_dir, f"gen={gen:04d}"))

    # delta segments
    triples = docs.map_batches(
        make_triples_fn(cfg, frozenset()), batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )

    def write_delta(group: pd.DataFrame) -> pd.DataFrame:
        gkey = int(group["gkey"].iloc[0])
        shard, bucket = divmod(gkey, cfg.n_buckets)
        # delta segments live in their own dir; write_segment's resume check
        # keys on the dir, so pass a gen-suffixed "index" root trick is not
        # needed — we write directly with a distinct name
        m = write_segment_gen(index_dir, shard, bucket, gen, group)
        return pd.DataFrame([{"shard": shard, "bucket": bucket,
                              "n_tokens": m["n_tokens"], "n_postings": m["n_postings"]}])

    seg_rows = (
        triples.groupby("gkey")
        .map_groups(write_delta, batch_format="pandas")
        .to_pandas()
    )

    # merge global stats + termstats
    n_new = int(
        ray.data.read_parquet(os.path.join(docs_dir, f"gen={gen:04d}"),
                              columns=["doc_id"]).count()
    )
    from .build import _seal_termstats

    _seal_termstats(index_dir)  # re-aggregates base + delta term dicts
    new_stats = {
        **stats,
        "n_docs": stats["n_docs"] + n_new,
        "total_len": stats["total_len"] + int(seg_rows["n_tokens"].sum() if len(seg_rows) else 0),
        "n_postings": sum(m["n_postings"] for m in _all_manifests(index_dir)),
    }
    new_stats["avgdl"] = (
        new_stats["total_len"] / new_stats["n_docs"] if new_stats["n_docs"] else 0.0
    )
    # commit order: segments + docs already durable → marker (the authority:
    # readers ignore unmarked gens; cleanup removes them) → stats. A crash
    # between marker and stats self-heals: the next add_documents calls
    # repair_stats() from disk truth.
    _commit_gen(index_dir, gen, {"n_docs": n_new,
                                 "n_tokens": int(seg_rows["n_tokens"].sum() if len(seg_rows) else 0)})
    write_stats(index_dir, new_stats)
    return new_stats


def repair_stats(index_dir: str) -> dict:
    """Recompute global stats from disk truth (live segments + doc-table
    parquet metadata) — heals a crash between gen commit and stats write."""
    stats = read_stats(index_dir)
    committed = committed_gens(index_dir)
    total_len = 0
    n_postings = 0
    for m in _all_manifests(index_dir):
        gen = m.get("lineage", {}).get("generation")
        if gen is not None and gen not in committed:
            continue
        total_len += m["n_tokens"]
        n_postings += m["n_postings"]
    docs_dir = os.path.join(index_dir, "_docs")
    n_docs = 0
    for root, _dirs, files in os.walk(docs_dir):
        gen_m = re.search(r"gen=(\d+)", root)
        if gen_m and int(gen_m.group(1)) not in committed:
            continue
        for f in files:
            if f.endswith(".parquet"):
                n_docs += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    stats.update(
        n_docs=n_docs,
        total_len=total_len,
        avgdl=total_len / n_docs if n_docs else 0.0,
        n_postings=n_postings,
    )
    write_stats(index_dir, stats)
    return stats


def write_segment_gen(index_dir, shard, bucket, gen, group) -> dict:
    """Delta-segment writer: same format, gen-suffixed directory."""
    import shutil
    import uuid

    from .. import PIPELINE_VERSION

    name = f"{segment_name(shard, bucket)}_g{gen:04d}"
    final_dir = os.path.join(index_dir, SEGMENTS, name)
    # reuse write_segment by writing into a scratch root then moving
    scratch = os.path.join(index_dir, SEGMENTS, f".gen-{uuid.uuid4().hex[:8]}")
    m = write_segment(scratch, shard, bucket, group,
                      lineage={"generation": gen, "pipeline_version": PIPELINE_VERSION})
    src = os.path.join(scratch, SEGMENTS, segment_name(shard, bucket))
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.replace(src, final_dir)
    shutil.rmtree(scratch, ignore_errors=True)
    return m


class MergerActor:
    """Actor-pool segment merger (T5/north_rule): holds codec state, merges
    all generations of a (shard, bucket) into one base segment per call."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import shutil
        import uuid

        from .postings import decode_posting_list

        out_shard, out_bucket, out_merged = [], [], []
        gens_map = list_segment_generations(self.index_dir)
        for shard, bucket in zip(
            batch["shard"].to_pylist(), batch["bucket"].to_pylist()
        ):
            # merge only the VISIBLE set: base + committed, unmerged gens
            names = live_gens(self.index_dir, gens_map.get((shard, bucket), []))
            if len(names) <= 1:
                out_shard.append(shard)
                out_bucket.append(bucket)
                out_merged.append(False)
                continue
            max_gen = max(
                int(m.group(3))
                for m in (_GEN_RE.match(n) for n in names)
                if m and m.group(3)
            )
            frames = []
            for name in names:
                # read the segment's triples back by decoding every term
                rdr = open_segment(self.index_dir, name)
                for term in rdr.terms["term"].to_pylist():
                    e = rdr.term_entry(term)
                    docs, tfs, dls = decode_posting_list(e["payload"], e["block_table"])
                    frames.append(
                        pd.DataFrame(
                            {"term": term, "doc_id": docs, "tf": tfs, "dl": dls}
                        )
                    )
            allt = pd.concat(frames, ignore_index=True)
            # deterministic rebuild in a scratch root (write_segment sorts
            # (term, doc_id)); crash-safe publish order: (1) stamp the merged
            # manifest with merged_through_gen, (2) atomically replace the
            # base, (3) delete deltas. A crash between 2 and 3 leaves deltas
            # on disk but readers skip gens <= merged_through_gen.
            scratch = os.path.join(
                self.index_dir, SEGMENTS, f".merge-{uuid.uuid4().hex[:8]}"
            )
            write_segment(scratch, shard, bucket, allt)
            seg_src = os.path.join(scratch, SEGMENTS, segment_name(shard, bucket))
            mpath = os.path.join(seg_src, "manifest.json")
            with open(mpath) as f:
                manifest = json.load(f)
            manifest["merged_through_gen"] = max_gen
            with open(mpath, "w") as f:
                json.dump(manifest, f)
            base_dir = os.path.join(
                self.index_dir, SEGMENTS, segment_name(shard, bucket)
            )
            if os.path.isdir(base_dir):
                shutil.rmtree(base_dir)
            os.replace(seg_src, base_dir)
            shutil.rmtree(scratch, ignore_errors=True)
            for name in names:
                if "_g" in name:
                    shutil.rmtree(
                        os.path.join(self.index_dir, SEGMENTS, name),
                        ignore_errors=True,
                    )
            out_shard.append(shard)
            out_bucket.append(bucket)
            out_merged.append(True)
        return pa.table(
            {
                "shard": pa.array(out_shard, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int32()),
                "merged": pa.array(out_merged, pa.bool_()),
            }
        )


def open_segment(index_dir: str, name: str):
    """SegmentReader over an arbitrary segment dir name (base or delta)."""
    from .segments import SegmentReader

    return SegmentReader(index_dir, name=name)


def merge_segments(index_dir: str, concurrency: int = 4) -> pd.DataFrame:
    """Merge every multi-generation (shard, bucket) back to a single base
    segment via the MergerActor pool. Returns the merge report."""
    gens = list_segment_generations(index_dir)
    work = [
        {"shard": s, "bucket": b}
        for (s, b), names in sorted(gens.items())
        if len(live_gens(index_dir, names)) > 1
    ]
    if not work:
        return pd.DataFrame(columns=["shard", "bucket", "merged"])
    ds = ray.data.from_items(work)
    out = ds.map_batches(
        MergerActor,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=min(concurrency, len(work)),
        num_cpus=1,
        fn_constructor_args=(index_dir,),
    ).to_pandas()
    # stats unchanged by a merge; refresh n_postings bookkeeping only
    stats = read_stats(index_dir)
    stats["n_postings"] = sum(m["n_postings"] for m in _all_manifests(index_dir))
    write_stats(index_dir, stats)
    return out


# --------------------------- deletes (tombstones) ---------------------------


def delete_documents(index_dir: str, doc_ids) -> int:
    """Tombstone doc ids. Lucene-delete semantics: masked from results at
    query time; df/length stats unchanged until rebuild/merge."""
    path = os.path.join(index_dir, GLOBAL, "tombstones.json")
    existing = load_tombstones(index_dir)
    merged = sorted(set(existing.tolist()) | {int(d) for d in doc_ids})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, path)
    return len(merged)


def load_tombstones(index_dir: str) -> np.ndarray:
    path = os.path.join(index_dir, GLOBAL, "tombstones.json")
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    with open(path) as f:
        return np.asarray(json.load(f), dtype=np.int64)
