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
- ``delete_documents``: generation-thresholded tombstones (Lucene-style):
  masked at query time, df/avgdl unchanged until a merge expunges the
  postings — same visibility semantics as Solr deletes before an optimize.
  A later re-add of the same id becomes visible automatically.
- ``add_documents(on_conflict="replace")``: Solr replace-by-id — old
  generations are masked atomically via the commit marker's replaces list.
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
from .locking import locked_on
from .segments import GLOBAL, SEGMENTS, segment_name, write_segment
from .segments import read_stats, write_stats

_GEN_RE = re.compile(r"^s(\d+)_b(\d+)(?:_g(\d+))?$")

# deltas at or below this row count index on the driver (no Ray groupby —
# its fixed cost dwarfs the work and dominates NRT ingestion latency);
# larger deltas take the distributed shuffle
_SMALL_DELTA_ROWS = 50_000


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
    folded = folded_gens(index_dir)
    root = os.path.join(index_dir, SEGMENTS)
    if os.path.isdir(root):
        for name in os.listdir(root):
            m = _GEN_RE.match(name)
            if not (m and m.group(3)):
                continue
            gen = int(m.group(3))
            # uncommitted = crashed add/merge; folded = superseded by a
            # COMMITTED tiered merge (its combined dir carries the data).
            # Folded leftovers only double-count in manifest sweeps — they
            # are already invisible to readers — but remove them so stats
            # recomputation stays a plain sum over dirs.
            if gen not in committed or gen in folded:
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


def live_gens(
    index_dir: str,
    names: list[str],
    folded: set[int] | None = None,
    committed: set[int] | None = None,
) -> list[str]:
    """Visible segment dirs for one (shard, bucket): the base plus delta
    generations that are (a) committed (gen marker landed), (b) not yet
    folded into the base (``merged_through_gen`` in the base manifest) and
    (c) not folded into a committed tiered merge. Callers iterating many
    pairs should pass ``folded=folded_gens(index_dir)`` once — computing it
    re-reads every commit marker. Readers racing a live writer should pass
    BOTH ``folded`` and ``committed`` from one marker snapshot (see
    ShardScorer._load) so visibility decisions are mutually consistent."""
    merged_through = -1
    base = [n for n in names if "_g" not in n]
    if base:
        mpath = os.path.join(index_dir, SEGMENTS, base[0], "manifest.json")
        try:
            with open(mpath) as f:
                merged_through = json.load(f).get("merged_through_gen", -1)
        except (OSError, ValueError):
            pass
    if committed is None:
        committed = committed_gens(index_dir)
    if folded is None:
        folded = folded_gens(index_dir)
    out = list(base)
    for n in names:
        m = re.search(r"_g(\d+)$", n)
        if (
            m
            and int(m.group(1)) > merged_through
            and int(m.group(1)) in committed
            and int(m.group(1)) not in folded
        ):
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


@locked_on("index_dir")
def add_documents(
    source: str | ray.data.Dataset,
    index_dir: str,
    cfg: BuildConfig,
    on_conflict: str = "error",
) -> dict:
    """Append documents as a delta generation.

    ``on_conflict`` controls what happens when an incoming doc_id is already
    LIVE in the index (the natural misuse the reference's incremental model
    invites — it re-posts changed docs and Solr replaces by id):

    - ``"error"`` (default): raise, listing the overlapping ids.
    - ``"replace"``: Solr/Lucene replace-by-id semantics — the replaced ids
      ride in the new generation's commit marker, so their old generations
      are masked ATOMICALLY with the new generation becoming visible (no
      window where both or neither version shows). df / total_len keep the
      old version's contribution until ``merge_segments`` folds generations
      (the same visibility rule as deletes); n_docs stays exact.

    cfg must match the base index's n_shards/n_buckets (checked)."""
    if on_conflict not in ("error", "replace"):
        raise ValueError(f"on_conflict must be 'error' or 'replace', got {on_conflict!r}")
    stats = read_stats(index_dir)
    if (stats["n_shards"], stats["n_buckets"]) != (cfg.n_shards, cfg.n_buckets):
        raise ValueError("cfg shards/buckets must match the existing index")
    if stats.get("analyzer", "plain") != cfg.analyzer:
        raise ValueError(
            f"cfg analyzer {cfg.analyzer!r} must match the existing index's "
            f"{stats.get('analyzer', 'plain')!r} — mixed token streams would "
            "silently corrupt postings")
    from .build import _assign_ids, _seal_termstats

    if _cleanup_uncommitted_gens(index_dir):  # drop half-added gens (retry)
        _seal_termstats(index_dir)  # stale term stats may include them
    repair_stats(index_dir)  # heal a prior crash between marker and stats
    stats = read_stats(index_dir)
    # delta segments must match the base's positional layout — adopt it
    # (mixing positional and non-positional generations would silently
    # disable phrase-by-positions for some docs)
    cfg.store_positions = bool(stats.get("positions", False))
    gen = _next_gen(index_dir)

    read_cols = list(
        dict.fromkeys(
            ([cfg.id_col] if cfg.id_col else list(cfg.key_cols))
            + list(cfg.meta_cols)
            + [cfg.text_col]
        )
    )
    # Small deltas from a parquet path load driver-side ONCE (delta_tbl) —
    # skipping two whole Ray Data executions (the id scan and the later
    # doc/triples pass) whose fixed cost dominates a small add's latency.
    delta_tbl: pa.Table | None = None
    docs = None
    if isinstance(source, str):
        src_files = _parquet_files(source)
        n_src_rows = sum(
            pq.ParquetFile(f).metadata.num_rows for f in src_files)
        if n_src_rows <= _SMALL_DELTA_ROWS:
            delta_tbl = pa.concat_tables(
                [pq.read_table(f, columns=read_cols) for f in src_files])
        else:
            docs = ray.data.read_parquet(source, columns=read_cols)
    else:
        docs = source

    # ---- conflict detection -------------------------------------------------
    # Incoming ids are delta-sized (collected); the corpus-sized side is
    # scanned distributed against the broadcast incoming set — only matches
    # (bounded by the delta) reach the driver.
    if delta_tbl is not None:
        inc_ids = np.asarray(_assign_ids(delta_tbl, cfg), dtype=np.int64)
    else:
        inc_parts = docs.map_batches(
            lambda t: pa.table(
                {"doc_id": pa.array(np.asarray(_assign_ids(t, cfg), dtype=np.int64))}
            ),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        ).to_pandas()
        inc_ids = inc_parts["doc_id"].to_numpy(np.int64)
    uniq_inc = np.unique(inc_ids)
    if len(uniq_inc) != len(inc_ids):
        raise ValueError("add_documents: incoming batch contains duplicate doc ids")
    inc_ref = ray.put(uniq_inc)  # sorted

    docs_dir = os.path.join(index_dir, "_docs")
    existing_cols = _docs_columns(docs_dir)
    scan_cols = ["doc_id"] + (["gen"] if "gen" in existing_cols else [])

    # per-file tasks instead of ray.data.read_parquet: the datasource's
    # metadata prefetch alone cost ~1.5 s against a 1M-doc forward table,
    # several times the actual columnar scan
    overlap_parts = ray.get([
        _overlap_scan.remote(f, scan_cols, inc_ref)
        for f in _parquet_files(docs_dir)
    ])
    overlap = (
        pd.concat(overlap_parts, ignore_index=True)
        if overlap_parts else pd.DataFrame(columns=scan_cols)
    )
    replaced: list[int] = []
    shadowed: list[int] = []
    if len(overlap):
        if "gen" in overlap.columns:
            latest = overlap.groupby("doc_id")["gen"].max()
        else:
            latest = pd.Series(0, index=pd.unique(overlap["doc_id"]))
        tomb_ids, tomb_thr = load_tombstone_thresholds(index_dir)
        lat_ids = latest.index.to_numpy(np.int64)
        lat_gen = latest.to_numpy(np.int64)
        dead = np.zeros(len(lat_ids), dtype=bool)
        if len(tomb_ids):
            pos = np.searchsorted(tomb_ids, lat_ids)
            ok = pos < len(tomb_ids)
            m = np.zeros(len(lat_ids), dtype=bool)
            m[ok] = tomb_ids[pos[ok]] == lat_ids[ok]
            dead[m] = tomb_thr[np.searchsorted(tomb_ids, lat_ids[m])] > lat_gen[m]
        live_overlap = np.sort(lat_ids[~dead])
        shadowed = [int(d) for d in np.sort(lat_ids[dead])]
        if len(live_overlap):
            if on_conflict == "error":
                sample = live_overlap[:10].tolist()
                raise ValueError(
                    f"add_documents: {len(live_overlap)} incoming doc ids already "
                    f"live in the index (e.g. {sample}); pass "
                    "on_conflict='replace' for replace-by-id semantics"
                )
            replaced = [int(d) for d in live_overlap]

    # ---- doc table delta + delta segments ----------------------------------
    # Small deltas take a DRIVER-SIDE path: the Ray groupby's fixed cost
    # (~2.6 s for a 5k-doc delta on the 1M-doc profile) dwarfs the actual
    # work, and near-real-time ingestion latency is this path's whole
    # point. Segments are byte-identical either way (write_segment sorts
    # deterministically). Large deltas keep the distributed shuffle.
    if delta_tbl is not None or len(inc_ids) <= _SMALL_DELTA_ROWS:
        tbl = (delta_tbl if delta_tbl is not None
               else pa.Table.from_pandas(docs.to_pandas(),
                                         preserve_index=False))
        gen_dir = os.path.join(docs_dir, f"gen={gen:04d}")
        os.makedirs(gen_dir, exist_ok=True)
        pq.write_table(make_doc_stats_fn(cfg, gen=gen)(tbl),
                       os.path.join(gen_dir, "part-0.parquet"))
        tdf = make_triples_fn(cfg, frozenset())(tbl).to_pandas()
        # tokenized on the driver (vectorized, delta-sized), but the
        # per-(shard,bucket) segment writes fan out as plain Ray tasks —
        # a layout can have hundreds of touched pairs and each write costs
        # ~10 ms of encode+fsync, which serialized would dominate the add
        futures, meta = [], []
        for gkey, group in tdf.groupby("gkey"):
            shard, bucket = divmod(int(gkey), cfg.n_buckets)
            futures.append(_write_delta_group.remote(
                index_dir, shard, bucket, gen, group))
            meta.append((shard, bucket))
        seg_rows = pd.DataFrame(
            [{"shard": s, "bucket": b,
              "n_tokens": m["n_tokens"], "n_postings": m["n_postings"]}
             for (s, b), m in zip(meta, ray.get(futures))],
            columns=["shard", "bucket", "n_tokens", "n_postings"])
    else:
        docs.map_batches(
            make_doc_stats_fn(cfg, gen=gen), batch_format="pyarrow",
            batch_size=cfg.batch_size,
        ).write_parquet(os.path.join(docs_dir, f"gen={gen:04d}"))

        triples = docs.map_batches(
            make_triples_fn(cfg, frozenset()), batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

        def write_delta(group: pd.DataFrame) -> pd.DataFrame:
            gkey = int(group["gkey"].iloc[0])
            shard, bucket = divmod(gkey, cfg.n_buckets)
            # delta segments live in their own dir; write_segment's resume
            # check keys on the dir, so a gen-suffixed "index" root trick is
            # not needed — we write directly with a distinct name
            m = write_segment_gen(index_dir, shard, bucket, gen, group)
            return pd.DataFrame([{"shard": shard, "bucket": bucket,
                                  "n_tokens": m["n_tokens"],
                                  "n_postings": m["n_postings"]}])

        seg_rows = (
            triples.groupby("gkey")
            .map_groups(write_delta, batch_format="pandas")
            .to_pandas()
        )

    n_new = int(len(uniq_inc))
    gen_tokens = int(seg_rows["n_tokens"].sum()) if len(seg_rows) else 0
    # commit order: segments + docs durable → marker (the authority: readers
    # ignore unmarked gens; cleanup removes them; `replaces` masks the old
    # versions atomically) → termstats seal (covers COMMITTED gens only; a
    # crash before the seal is healed by TermStatsStore's sealed-gens check)
    # → stats (a crash before stats self-heals via repair_stats()).
    _commit_gen(
        index_dir, gen,
        {"n_docs": n_new, "n_tokens": gen_tokens,
         "replaces": replaced, "n_replaced": len(replaced),
         "n_shadowed": len(shadowed)},
    )
    # delta-sized seal merge; any precondition miss falls back to the full
    # (vocab-sized) reseal — same resulting stats either way
    from .build import _seal_termstats_incremental

    if not _seal_termstats_incremental(index_dir, gen):
        _seal_termstats(index_dir)
    new_stats = {
        **stats,
        # stats["n_docs"] counts LIVE docs (repair_stats ran above, so dead
        # docs are already excluded): a brand-new id adds 1, a replace adds
        # 0 (its old version was counted), and a re-add over a DEAD id adds
        # 1 (its old version was not counted)
        "n_docs": stats["n_docs"] + n_new - len(replaced),
        "total_len": stats["total_len"] + gen_tokens,
        "n_postings": sum(m["n_postings"] for m in _all_manifests(index_dir)),
    }
    new_stats["avgdl"] = (
        new_stats["total_len"] / new_stats["n_docs"] if new_stats["n_docs"] else 0.0
    )
    write_stats(index_dir, new_stats)
    return new_stats


def _docs_columns(docs_dir: str) -> list[str]:
    """Column names of the forward doc table (sniffs one fragment)."""
    for root, _dirs, files in os.walk(docs_dir):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return pq.ParquetFile(os.path.join(root, f)).schema_arrow.names
    return []


def repair_stats(index_dir: str) -> dict:
    """Recompute global stats from disk truth (live segments + doc-table
    parquet metadata + tombstones) — heals a crash between gen commit and
    stats write, and folds in pending deletes.

    The n_docs identity is merge-independent and always exact:

        n_docs = rows - extra_versions - dead_now

    where ``rows`` counts every committed forward-table row, every marker's
    ``n_replaced + n_shadowed`` records one extra row for a doc the table
    already held, and ``dead_now`` counts docs whose LATEST version is
    masked by an explicit delete (recomputed fresh — a merge expunging the
    postings doesn't change it, because the forward rows remain)."""
    stats = read_stats(index_dir)
    committed = committed_gens(index_dir)
    folded = folded_gens(index_dir)
    total_len = 0
    n_postings = 0
    for m in _all_manifests(index_dir):
        gen = m.get("lineage", {}).get("generation")
        if gen is not None and (gen not in committed or gen in folded):
            continue  # uncommitted (crashed add) or superseded by a fold
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
    n_docs -= sum(
        int(info.get("n_replaced", 0)) + int(info.get("n_shadowed", 0))
        for info in _committed_markers(index_dir).values()
    )
    n_docs -= _dead_count_cached(index_dir, stats)
    stats.pop("n_docs_dead_merged", None)  # superseded by the identity above
    stats.update(
        n_docs=n_docs,
        total_len=total_len,
        avgdl=total_len / n_docs if n_docs else 0.0,
        n_postings=n_postings,
    )
    write_stats(index_dir, stats)
    return stats


def _parquet_files(path: str) -> list[str]:
    """All .parquet files under a file-or-directory path, sorted."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs if f.endswith(".parquet")
    )


@ray.remote(num_cpus=0.5)
def _overlap_scan(path: str, cols: list[str], inc: np.ndarray) -> pd.DataFrame:
    """One forward-table fragment vs the broadcast (sorted) incoming id
    set; returns only the matching rows (bounded by the delta)."""
    t = pq.read_table(path, columns=cols)
    ids = np.asarray(t["doc_id"].to_numpy(), dtype=np.int64)
    pos = np.searchsorted(inc, ids)
    ok = pos < len(inc)
    hit = np.zeros(len(ids), dtype=bool)
    hit[ok] = inc[pos[ok]] == ids[ok]
    return t.filter(pa.array(hit)).to_pandas()


@ray.remote(num_cpus=0.25)
def _write_delta_group(index_dir, shard, bucket, gen, group) -> dict:
    """Task wrapper for the small-delta fast path: one (shard, bucket)
    segment write per task — parallel without a groupby shuffle."""
    return write_segment_gen(index_dir, shard, bucket, gen, group)


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


def _read_expunged_triples(
    index_dir: str,
    names: list[str],
    mask_for_gen,
    merge_pos: bool,
    readers: dict | None = None,
) -> pd.DataFrame:
    """Decode every (term, doc) posting in ``names``, dropping postings
    masked at each source segment's own mask generation — the shared read
    half of both the full (base) merge and the tiered (partial) merge.
    ``mask_for_gen(gen)`` returns the sorted doc-id mask for postings read
    at generation ``gen``. Returns the (term, doc_id, tf, dl[, pos]) frame
    write_segment consumes (typed empty when nothing survives)."""
    from .postings import (
        decode_positions,
        decode_posting_list,
        position_bytes_array,
    )

    if readers is None:
        readers = {n: open_segment(index_dir, n) for n in names}
    frames = []
    for name in names:
        rdr = readers[name]
        mask = mask_for_gen(segment_mask_gen(index_dir, name))
        for term in rdr.terms["term"].to_pylist():
            e = rdr.term_entry(term)
            docs, tfs, dls = decode_posting_list(e["payload"], e["block_table"])
            pos_flat = (
                decode_positions(
                    e["pos_payload"], e["block_table"]["pos_bytes"], tfs
                )
                if merge_pos else None
            )
            if len(mask):
                keep = ~np.isin(docs, mask, assume_unique=True)
                if pos_flat is not None:
                    pos_flat = pos_flat[np.repeat(keep, tfs)]
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if len(docs) == 0:
                continue
            cols = {"term": term, "doc_id": docs, "tf": tfs, "dl": dls}
            if pos_flat is not None:
                cols["pos"] = position_bytes_array(tfs, pos_flat).to_pylist()
            frames.append(pd.DataFrame(cols))
    if not frames:
        frames.append(pd.DataFrame(
            {"term": pd.Series(dtype=object),
             "doc_id": pd.Series(dtype=np.int64),
             "tf": pd.Series(dtype=np.int64),
             "dl": pd.Series(dtype=np.int64),
             **({"pos": pd.Series(dtype=object)} if merge_pos else {})}
        ))
    return pd.concat(frames, ignore_index=True)


class MergerActor:
    """Actor-pool segment merger (T5/north_rule): holds codec + tombstone
    state, merges all generations of a (shard, bucket) into one base segment
    per call. Postings masked at their generation (deletes and replaced-away
    versions) are DROPPED during the merge, so the merged base is
    byte-identical to a rebuild over the union corpus's latest versions."""

    def __init__(self, index_dir: str):
        from .segments import read_stats as _read_stats

        self.index_dir = index_dir
        self.tomb_ids, self.tomb_thr = load_tombstone_thresholds(index_dir)
        self.n_shards = _read_stats(index_dir)["n_shards"]

    def _mask_for_gen(self, gen: int) -> np.ndarray:
        return self.tomb_ids[self.tomb_thr > gen]

    def _needs_expunge(self, shard: int, names: list[str]) -> bool:
        return any(
            segment_needs_expunge(
                self.index_dir, shard, n, self.tomb_ids, self.tomb_thr,
                self.n_shards,
            )
            for n in names
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import shutil
        import uuid

        out_shard, out_bucket, out_merged = [], [], []
        gens_map = list_segment_generations(self.index_dir)
        folded = folded_gens(self.index_dir)
        for shard, bucket in zip(
            batch["shard"].to_pylist(), batch["bucket"].to_pylist()
        ):
            # merge only the VISIBLE set: base + committed, unmerged gens.
            # A SINGLE-generation pair is still rewritten when it may hold
            # masked postings — a delete's expunge must not depend on a
            # delta happening to exist in that bucket.
            names = live_gens(self.index_dir, gens_map.get((shard, bucket), []),
                              folded=folded)
            if len(names) <= 1 and not (
                names and self._needs_expunge(shard, names)
            ):
                out_shard.append(shard)
                out_bucket.append(bucket)
                out_merged.append(False)
                continue
            max_gen = max(segment_gen(self.index_dir, n) for n in names)
            # positions carry through a merge iff every source generation
            # stores them (always true when built/added consistently)
            readers = {n: open_segment(self.index_dir, n) for n in names}
            merge_pos = all(r.has_positions for r in readers.values())
            allt = _read_expunged_triples(
                self.index_dir, names, self._mask_for_gen, merge_pos,
                readers=readers,
            )
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
            # every mask known NOW was applied — record the applied set's
            # signature so later merges skip this segment until the
            # relevant mask set actually CHANGES (an expunge must not
            # re-run as a byte-identical no-op forever, and a new delete
            # sharing the same threshold value must still trigger one)
            manifest["expunged_sig"] = mask_signature(
                self.tomb_ids, self.tomb_thr, shard, self.n_shards, max_gen
            )
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


@locked_on("index_dir")
def merge_segments(index_dir: str, concurrency: int = 4) -> pd.DataFrame:
    """Merge every multi-generation (shard, bucket) back to a single base
    segment via the MergerActor pool, and EXPUNGE masked postings — also
    from single-generation pairs in shards holding deleted docs, so a full
    merge always leaves stats exact. Returns the merge report."""
    from .segments import read_stats as _read_stats

    gens = list_segment_generations(index_dir)
    tomb_ids, tomb_thr = load_tombstone_thresholds(index_dir)
    n_shards = _read_stats(index_dir)["n_shards"]
    folded = folded_gens(index_dir)

    def needs_work(s: int, names: list[str]) -> bool:
        live = live_gens(index_dir, names, folded=folded)
        if len(live) > 1:
            return True
        return any(
            segment_needs_expunge(index_dir, s, n, tomb_ids, tomb_thr, n_shards)
            for n in live
        )

    work = [
        {"shard": s, "bucket": b}
        for (s, b), names in sorted(gens.items())
        if needs_work(s, names)
    ]
    if not work:
        return pd.DataFrame(columns=["shard", "bucket", "merged"])
    from .placement import merge_remote_args

    ds = ray.data.from_items(work)
    out = ds.map_batches(
        MergerActor,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=min(concurrency, len(work)),
        fn_constructor_args=(index_dir,),
        **merge_remote_args(index_dir),
    ).to_pandas()
    # a merge drops masked postings (deletes / replaced-away versions), so
    # corpus totals and per-term stats change: recompute stats from disk
    # truth and reseal the term dictionary. After a full merge, stats are
    # EXACT for the live corpus — the same numbers a from-scratch rebuild
    # over the latest versions would produce.
    from .build import _seal_termstats

    repair_stats(index_dir)
    _seal_termstats(index_dir)
    return out


class TieredMergerActor:
    """Actor-pool PARTIAL merger: folds one fixed set of delta generations
    of a (shard, bucket) into a single combined delta segment, leaving the
    base untouched — the Lucene TieredMergePolicy work unit. Postings are
    expunged with each SOURCE generation's own mask (exactly like the base
    merge), and the combined manifest records ``mask_gen`` = max(source
    gens) so query-time thresholds keep masking correctly (see
    segment_mask_gen). Output dirs stay INVISIBLE until the driver commits
    the fold's generation marker — a crash leaves uncommitted dirs that
    the next cleanup removes, sources intact."""

    def __init__(self, index_dir: str, fold_gens: list[int], out_gen: int):
        from .segments import read_stats as _read_stats

        self.index_dir = index_dir
        self.fold_gens = sorted(int(g) for g in fold_gens)
        self.out_gen = int(out_gen)
        self.mask_gen = max(self.fold_gens)
        self.tomb_ids, self.tomb_thr = load_tombstone_thresholds(index_dir)
        self.n_shards = _read_stats(index_dir)["n_shards"]

    def _mask_for_gen(self, gen: int) -> np.ndarray:
        return self.tomb_ids[self.tomb_thr > gen]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import shutil
        import uuid

        from .. import PIPELINE_VERSION

        fold_set = set(self.fold_gens)
        out_rows = {"shard": [], "bucket": [], "n_tokens": [],
                    "n_postings": [], "n_dropped": []}
        gens_map = list_segment_generations(self.index_dir)
        for shard, bucket in zip(
            batch["shard"].to_pylist(), batch["bucket"].to_pylist()
        ):
            names = [
                n for n in gens_map.get((shard, bucket), [])
                if (m := re.search(r"_g(\d+)$", n)) and int(m.group(1)) in fold_set
            ]
            if not names:
                continue
            src_postings = 0
            for n in names:
                with open(os.path.join(self.index_dir, SEGMENTS, n,
                                       "manifest.json")) as f:
                    src_postings += int(json.load(f).get("n_postings", 0))
            readers = {n: open_segment(self.index_dir, n) for n in names}
            merge_pos = all(r.has_positions for r in readers.values())
            allt = _read_expunged_triples(
                self.index_dir, names, self._mask_for_gen, merge_pos,
                readers=readers,
            )
            dropped = src_postings - int(len(allt))
            if not len(allt):
                # every posting was masked: committing the fold marker makes
                # the sources invisible and nothing replaces them — correct,
                # the postings were dead. No combined dir for this pair.
                out_rows["shard"].append(shard)
                out_rows["bucket"].append(bucket)
                out_rows["n_tokens"].append(0)
                out_rows["n_postings"].append(0)
                out_rows["n_dropped"].append(dropped)
                continue
            out_name = f"{segment_name(shard, bucket)}_g{self.out_gen:04d}"
            final_dir = os.path.join(self.index_dir, SEGMENTS, out_name)
            scratch = os.path.join(
                self.index_dir, SEGMENTS, f".tier-{uuid.uuid4().hex[:8]}"
            )
            m = write_segment(
                scratch, shard, bucket, allt,
                lineage={"generation": self.out_gen,
                         "pipeline_version": PIPELINE_VERSION},
            )
            seg_src = os.path.join(
                scratch, SEGMENTS, segment_name(shard, bucket)
            )
            mpath = os.path.join(seg_src, "manifest.json")
            with open(mpath) as f:
                manifest = json.load(f)
            manifest["mask_gen"] = self.mask_gen
            # the masks known NOW were applied physically; record their
            # signature at mask_gen so segment_needs_expunge only fires
            # again when the relevant mask set actually changes
            manifest["expunged_sig"] = mask_signature(
                self.tomb_ids, self.tomb_thr, shard, self.n_shards,
                self.mask_gen,
            )
            with open(mpath, "w") as f:
                json.dump(manifest, f)
            if os.path.isdir(final_dir):  # crashed previous attempt, retry
                shutil.rmtree(final_dir)
            os.replace(seg_src, final_dir)
            shutil.rmtree(scratch, ignore_errors=True)
            out_rows["shard"].append(shard)
            out_rows["bucket"].append(bucket)
            out_rows["n_tokens"].append(int(m["n_tokens"]))
            out_rows["n_postings"].append(int(m["n_postings"]))
            out_rows["n_dropped"].append(dropped)
        return pa.table(
            {
                "shard": pa.array(out_rows["shard"], pa.int32()),
                "bucket": pa.array(out_rows["bucket"], pa.int32()),
                "n_tokens": pa.array(out_rows["n_tokens"], pa.int64()),
                "n_postings": pa.array(out_rows["n_postings"], pa.int64()),
                "n_dropped": pa.array(out_rows["n_dropped"], pa.int64()),
            }
        )


def _restamp_sealed_gens(index_dir: str, expected: list[int]) -> bool:
    """Fast-path seal refresh after a DROP-FREE tiered fold: the fold only
    moved postings between segment dirs, so the sealed per-term stats are
    content-identical — only the committed-gen list grew. Refuses (returns
    False, caller must full-reseal) unless the current seal covers EXACTLY
    ``expected`` (the pre-fold committed set): restamping a stale seal
    would claim generations whose term stats it never aggregated."""
    from .build import termstats_dir

    path = os.path.join(termstats_dir(index_dir), "_SEALED.json")
    try:
        with open(path) as f:
            cur = json.load(f)
    except (OSError, ValueError):
        return False
    if sorted(cur.get("sealed_gens", [])) != sorted(expected):
        return False
    cur["sealed_gens"] = sorted(committed_gens(index_dir))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cur, f)
    os.replace(tmp, path)
    return True


def _live_delta_gen_sizes(index_dir: str) -> dict[int, int]:
    """gen -> token size for every VISIBLE delta generation (committed, not
    folded, not merged into the base), from the commit markers — no segment
    IO. Size drives tier assignment only; slight overstatement after an
    expunge is harmless."""
    markers = _committed_markers(index_dir)
    folded = folded_gens(index_dir)
    live: set[int] = set()
    for (_s, _b), names in list_segment_generations(index_dir).items():
        for n in live_gens(index_dir, names, folded=folded):
            m = re.search(r"_g(\d+)$", n)
            if m:
                live.add(int(m.group(1)))
    return {
        g: max(1, int(markers.get(g, {}).get("n_tokens", 1)))
        for g in sorted(live)
        if g not in folded
    }


def select_fold(
    gen_sizes: dict[int, int], merge_factor: int = 4
) -> list[int]:
    """Log-structured tier policy: bucket generations by
    floor(log_{merge_factor}(size)); the lowest level holding >=
    merge_factor gens is folded (all of its gens, oldest level first).
    Empty list = nothing to do. Deterministic in its inputs; total merge
    cost over n same-sized adds is O(n log n) tokens — each posting is
    rewritten once per level it climbs."""
    if merge_factor < 2:
        raise ValueError("merge_factor must be >= 2")
    levels: dict[int, list[int]] = {}
    for g, size in gen_sizes.items():
        lv = 0
        s = max(1, int(size))
        while s >= merge_factor:
            s //= merge_factor
            lv += 1
        levels.setdefault(lv, []).append(g)
    for lv in sorted(levels):
        if len(levels[lv]) >= merge_factor:
            return sorted(levels[lv])
    return []


@locked_on("index_dir")
def tiered_merge(
    index_dir: str,
    merge_factor: int = 4,
    concurrency: int = 4,
    max_rounds: int = 100,
) -> dict:
    """Fold delta generations LSM-style until every tier is below
    ``merge_factor`` — bounds read amplification (live generations per
    query) at O(merge_factor * log(total/smallest)) without ever rewriting
    the base, unlike :func:`merge_segments` whose cost is the whole index.

    Commit protocol per round (single maintenance writer assumed, like all
    index mutators here):

    1. clean uncommitted/folded leftovers (a crashed prior attempt),
    2. write every (shard, bucket) combined delta at a fresh generation M
       — invisible until committed,
    3. commit marker M with ``folds=[...]`` — the atomic visibility flip:
       readers now see the combined and skip the folded sources,
    4. delete the folded source dirs (lazy; step 1 / fsck also reap them),
    5. reseal stats + termstats (sealed_gens must cover M; postings counts
       shrink when masked postings were expunged).

    Returns {"rounds": [...]} with per-round folds/new_gen/pairs."""
    from .build import _seal_termstats

    report: dict = {"rounds": []}
    if _cleanup_uncommitted_gens(index_dir):
        _seal_termstats(index_dir)
        repair_stats(index_dir)
    seal_basis = sorted(committed_gens(index_dir))
    total_dropped = 0
    for _ in range(max_rounds):
        fold = select_fold(_live_delta_gen_sizes(index_dir), merge_factor)
        if not fold:
            break
        out_gen = _next_gen(index_dir)
        pairs = sorted(
            (s, b)
            for (s, b), names in list_segment_generations(index_dir).items()
            if any(
                (m := re.search(r"_g(\d+)$", n)) and int(m.group(1)) in set(fold)
                for n in names
            )
        )
        from .placement import merge_remote_args

        work = [{"shard": s, "bucket": b} for s, b in pairs]
        ds = ray.data.from_items(work)
        out = ds.map_batches(
            TieredMergerActor,
            batch_format="pyarrow",
            batch_size=1,
            concurrency=min(concurrency, max(1, len(work))),
            fn_constructor_args=(index_dir, fold, out_gen),
            **merge_remote_args(index_dir),
        ).to_pandas()
        _commit_gen(
            index_dir, out_gen,
            {"n_docs": 0, "n_tokens": int(out["n_tokens"].sum()) if len(out) else 0,
             "replaces": [], "n_replaced": 0, "n_shadowed": 0,
             "folds": [int(g) for g in fold], "tiered": True},
        )
        # sources are now invisible; reap them (crash here is harmless —
        # cleanup and fsck --repair both remove folded leftovers)
        import shutil

        fold_set = set(fold)
        root = os.path.join(index_dir, SEGMENTS)
        for name in os.listdir(root):
            m = _GEN_RE.match(name)
            if m and m.group(3) and int(m.group(3)) in fold_set:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        round_dropped = int(out["n_dropped"].sum()) if len(out) else 0
        total_dropped += round_dropped
        report["rounds"].append(
            {"folds": [int(g) for g in fold], "new_gen": int(out_gen),
             "pairs": int((out["n_postings"] > 0).sum()) if len(out) else 0,
             "n_dropped": round_dropped}
        )
    if report["rounds"]:
        # a DROP-FREE fold only moves postings between dirs: global term
        # stats and counters are content-identical, so restamping the
        # seal's gen list beats recomputing a vocab-sized aggregation.
        # Any expunged posting (or a stale pre-fold seal) takes the full
        # reseal + stats-recompute path.
        if total_dropped == 0 and _restamp_sealed_gens(index_dir, seal_basis):
            report["seal"] = "restamped"
        else:
            _seal_termstats(index_dir)
            repair_stats(index_dir)
            report["seal"] = "resealed"
    return report


def _dead_count_cached(index_dir: str, stats: dict) -> int:
    """Cached dead-doc count: the distributed forward-table probe reruns
    only when something that can change it changed — the tombstone file
    (deletes) or the total shadowed-re-add count (revivals). Everything
    else (adds of new ids, replaces of live ids, merges) preserves it, so
    steady-state ingest after a delete pays zero extra scans. The cache
    rides inside stats.json (the caller persists it)."""
    path = os.path.join(index_dir, GLOBAL, "tombstones.json")
    try:
        tkey = os.stat(path).st_mtime_ns
    except OSError:
        tkey = 0
    shadowed = sum(
        int(i.get("n_shadowed", 0)) for i in _committed_markers(index_dir).values()
    )
    key = [tkey, shadowed]
    cache = stats.get("dead_cache")
    if cache and cache.get("key") == key:
        return int(cache["n_dead"])
    n = _count_dead_docs(index_dir)
    stats["dead_cache"] = {"key": key, "n_dead": n}
    return n


def _count_dead_docs(index_dir: str) -> int:
    """Docs present in the forward table whose latest generation is masked
    by an EXPLICIT delete tombstone (replaced-away versions are accounted
    separately via the commit markers' n_replaced). The tombstone set is
    small; the corpus-sized side is scanned distributed against it."""
    thr_map = _read_tombstone_file(index_dir)
    if not thr_map:
        return 0
    ids = np.array(sorted(thr_map), dtype=np.int64)
    thr = np.array([thr_map[int(i)] for i in ids], dtype=np.int64)
    ids_ref = ray.put(ids)
    docs_dir = os.path.join(index_dir, "_docs")
    cols = ["doc_id"] + (["gen"] if "gen" in _docs_columns(docs_dir) else [])

    def hit(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"].to_numpy(), dtype=np.int64)
        tomb = ray.get(ids_ref)
        pos = np.searchsorted(tomb, d)
        ok = pos < len(tomb)
        keep = np.zeros(len(d), dtype=bool)
        keep[ok] = tomb[pos[ok]] == d[ok]
        return t.filter(pa.array(keep))

    rows = (
        ray.data.read_parquet(docs_dir, columns=cols)
        .map_batches(hit, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(rows):
        return 0
    if "gen" in rows.columns:
        latest = rows.groupby("doc_id")["gen"].max()
    else:
        latest = pd.Series(0, index=pd.unique(rows["doc_id"]))
    lat_ids = latest.index.to_numpy(np.int64)
    lat_gen = latest.to_numpy(np.int64)
    t = thr[np.searchsorted(ids, lat_ids)]
    return int((t > lat_gen).sum())


def _heal_crashed_vacuum(index_dir: str) -> bool:
    """Recover the rename-rename crash windows of :func:`vacuum_docs`:
    restore ``_docs`` from ``_docs.old`` if the crash hit between the two
    renames, and drop any leftover staging/backup dirs. Returns True if
    anything was healed (shared by vacuum_docs and fsck --repair)."""
    import shutil

    docs_dir = os.path.join(index_dir, "_docs")
    old_dir, tmp_dir = docs_dir + ".old", docs_dir + ".vtmp"
    healed = False
    if not os.path.isdir(docs_dir) and os.path.isdir(old_dir):
        os.replace(old_dir, docs_dir)
        healed = True
    for d in (tmp_dir, old_dir):
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
            healed = True
    return healed


@locked_on("index_dir")
def vacuum_docs(index_dir: str) -> dict:
    """Compact the forward doc table and clear fully-applied tombstones —
    the 'deletes actually reclaimed' step (Lucene's expungeDeletes makes
    postings disappear; this makes the doc-table rows and the tombstone
    file follow), run after a full expunging :func:`merge_segments`.

    Preconditions (ValueError otherwise): no visible delta generations and
    no live segment still holding masked postings — i.e. every mask is
    already physically applied, so dropping the bookkeeping loses nothing.

    1. Rewrite ``_docs`` keeping only rows with ``gen >= threshold(doc_id)``
       — exactly the segment mask rule: explicitly-deleted docs drop
       entirely, replaced-away versions drop, latest versions stay. The
       threshold map is small (deletes + replaces) and broadcast; the
       corpus-sized side streams through a filter — no shuffle, no
       driver-side data.
    2. Swap in via rename-rename (``_docs`` -> ``_docs.old``, staging ->
       ``_docs``); the crash window between the renames is healed by the
       next vacuum or ``fsck --repair`` (VACUUM_LEFTOVER).
    3. Delete ``tombstones.json``: every threshold it carried is applied,
       so the dead-doc count — and :func:`maintain`'s garbage metric —
       resets to 0. (Commit markers keep their ``replaces`` lists: they
       are the generation-numbering history and their thresholds are
       no-ops against post-merge segments.)

    Live stats are unchanged by construction; returns
    ``{"vacuumed", "rows_dropped", "tombstones_cleared"}``."""
    import shutil

    _heal_crashed_vacuum(index_dir)
    stats = read_stats(index_dir)
    n_shards = stats["n_shards"]
    tomb_ids, tomb_thr = load_tombstone_thresholds(index_dir)
    gens_map = list_segment_generations(index_dir)
    folded = folded_gens(index_dir)
    for (s, _b), names in gens_map.items():
        live = live_gens(index_dir, names, folded=folded)
        if any("_g" in n for n in live):
            raise ValueError(
                "vacuum_docs: visible delta generations remain — run "
                "merge_segments() first")
        for n in live:
            if segment_needs_expunge(index_dir, s, n, tomb_ids, tomb_thr,
                                     n_shards):
                raise ValueError(
                    f"vacuum_docs: segment {n} still holds masked postings "
                    "— run merge_segments() first")
    n_tomb = len(_read_tombstone_file(index_dir))
    if not len(tomb_ids):
        return {"vacuumed": False, "rows_dropped": 0, "tombstones_cleared": 0}

    docs_dir = os.path.join(index_dir, "_docs")
    old_dir, tmp_dir = docs_dir + ".old", docs_dir + ".vtmp"
    has_gen = "gen" in _docs_columns(docs_dir)
    ids_ref, thr_ref = ray.put(tomb_ids), ray.put(tomb_thr)

    def keep_live(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"].to_numpy(), dtype=np.int64)
        g = (np.asarray(t["gen"].to_numpy(), dtype=np.int64)
             if has_gen else np.zeros(len(d), np.int64))
        ti, th = ray.get(ids_ref), ray.get(thr_ref)
        pos = np.searchsorted(ti, d)
        ok = pos < len(ti)
        masked = np.zeros(len(d), dtype=bool)
        hit_pos = pos[ok]
        hit = ti[hit_pos] == d[ok]
        sub = np.zeros(int(ok.sum()), dtype=bool)
        sub[hit] = g[ok][hit] < th[hit_pos[hit]]
        masked[ok] = sub
        return t.filter(pa.array(~masked))

    n_before = ray.data.read_parquet(docs_dir).count()  # bare read: metadata
    (ray.data.read_parquet(docs_dir)
        .map_batches(keep_live, batch_format="pyarrow")
        .write_parquet(tmp_dir))
    n_after = ray.data.read_parquet(tmp_dir).count()
    os.replace(docs_dir, old_dir)
    os.replace(tmp_dir, docs_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    tpath = os.path.join(index_dir, GLOBAL, "tombstones.json")
    if os.path.exists(tpath):
        os.unlink(tpath)
    # the extra rows the markers accounted for (replaced-away versions,
    # shadowed re-adds) are physically gone now — zero the row-accounting
    # fields so repair_stats' identity (rows - extras - dead) stays exact,
    # and drop the replaces lists (their thresholds mask nothing after the
    # full merge). Rewrites are atomic per marker file.
    mdir = _gen_marker_dir(index_dir)
    for gen, info in _committed_markers(index_dir).items():
        if not (info.get("n_replaced") or info.get("n_shadowed")
                or info.get("replaces")):
            continue
        info = {**info, "replaces": [], "n_replaced": 0, "n_shadowed": 0,
                "vacuumed": True}
        tmp = os.path.join(mdir, f".g{gen:04d}.tmp")
        with open(tmp, "w") as f:
            json.dump(info, f)
        os.replace(tmp, os.path.join(mdir, f"g{gen:04d}.json"))
    repair_stats(index_dir)  # revalidates n_docs against the compacted table
    return {"vacuumed": True, "rows_dropped": int(n_before - n_after),
            "tombstones_cleared": n_tomb}


def _global_merged_through(index_dir: str) -> int:
    """Conservative (min over base segments) merged_through generation —
    markers at or below it had their replaced-away postings expunged by a
    full merge already."""
    mt = None
    for (_s, _b), names in list_segment_generations(index_dir).items():
        base = [n for n in names if "_g" not in n]
        if not base:
            return -1
        mpath = os.path.join(index_dir, SEGMENTS, base[0], "manifest.json")
        try:
            with open(mpath) as f:
                v = int(json.load(f).get("merged_through_gen", -1))
        except (OSError, ValueError):
            v = -1
        mt = v if mt is None else min(mt, v)
    return -1 if mt is None else mt


@locked_on("index_dir")
def maintain(
    index_dir: str,
    merge_factor: int = 4,
    max_fold_rounds: int = 4,
    dead_ratio: float = 0.10,
    vacuum: bool = True,
    concurrency: int = 4,
) -> dict:
    """One policy-driven maintenance pass — the per-index cron job on a
    cluster (Lucene's TieredMergePolicy + forceMergeDeletes rolled into
    one idempotent call):

    1. **tiered folds** (delta-sized cost, base untouched): coalesce small
       delta generations while the log-structured policy finds a tier;
    2. **full expunging merge** (index-sized cost, so gated): only when the
       garbage fraction — explicitly deleted docs plus replaced-away
       versions not yet expunged (markers above the base's merged_through)
       — reaches ``dead_ratio`` of the corpus;
    3. **vacuum** (optional, after a merge): compact the forward table and
       reset the tombstone bookkeeping via :func:`vacuum_docs`.

    The garbage fraction is an upper-bound estimate (marker counters +
    the cached dead-doc probe), never a corpus scan. Safe to run on any
    schedule: each step no-ops when there is nothing to do."""
    report: dict = {"tiered": tiered_merge(
        index_dir, merge_factor=merge_factor, max_rounds=max_fold_rounds,
        concurrency=concurrency)}
    stats = read_stats(index_dir)
    n_dead = _dead_count_cached(index_dir, stats)
    write_stats(index_dir, stats)  # persist the dead cache for next time
    mt = _global_merged_through(index_dir)
    n_replaced = sum(
        int(info.get("n_replaced", 0))
        for gen, info in _committed_markers(index_dir).items()
        if gen > mt
    )
    garbage = n_dead + n_replaced
    n_live = int(stats.get("n_docs", 0))
    frac = garbage / (n_live + garbage) if (n_live + garbage) else 0.0
    report["garbage_fraction"] = round(frac, 6)
    report["merged_pairs"] = 0
    if garbage and frac >= dead_ratio:
        merged = merge_segments(index_dir, concurrency=concurrency)
        report["merged_pairs"] = int(len(merged))
        if vacuum:
            report["vacuum"] = vacuum_docs(index_dir)
    return report


# --------------------------- deletes (tombstones) ---------------------------
#
# Tombstones are GENERATION-THRESHOLDED: each entry is doc_id ->
# masked_below_gen, and a posting read from a segment of generation ``g`` is
# masked iff ``g < masked_below_gen``. Two producers:
#
# - ``delete_documents`` records masked_below_gen = the next unused
#   generation, so every generation existing at delete time is masked but a
#   LATER re-add of the same doc id becomes visible automatically — no
#   tombstone clearing (and no crash window between clearing and commit).
# - ``add_documents(on_conflict="replace")`` records the replaced ids in the
#   new generation's COMMIT MARKER (threshold = that generation), so the old
#   version is masked atomically with the new version becoming visible.

_DELETE_FOREVER = 1 << 60  # legacy list-format tombstones: masked at any gen


@locked_on("index_dir")
def delete_documents(index_dir: str, doc_ids) -> int:
    """Tombstone doc ids. Lucene-delete semantics: masked from results at
    query time; df/length stats unchanged until rebuild/merge."""
    path = os.path.join(index_dir, GLOBAL, "tombstones.json")
    thr = _read_tombstone_file(index_dir)
    cut = _next_gen(index_dir)
    for d in doc_ids:
        thr[int(d)] = max(thr.get(int(d), 0), cut)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in sorted(thr.items())}, f)
    os.replace(tmp, path)
    return len(thr)


@locked_on("index_dir")
def delete_by_query(index_dir: str, text: str, mode: str = "and") -> int:
    """Solr deleteByQuery: tombstone every doc matching the boolean query
    (ALL terms for ``mode="and"``, ANY for ``"or"``). The match runs
    through the distributed pool (posting decode + set ops shard-local);
    only the matched id list reaches the driver, then the normal
    tombstone-threshold path applies (df/length stats unchanged until
    merge, exactly like id deletes). Returns the number of docs deleted
    by THIS call."""
    from .query import get_pool

    ids = get_pool(index_dir).matching_doc_ids(text, mode=mode)
    if len(ids):
        delete_documents(index_dir, ids.tolist())
    return int(len(ids))


def _read_tombstone_file(index_dir: str) -> dict[int, int]:
    path = os.path.join(index_dir, GLOBAL, "tombstones.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, list):  # legacy format: plain dead-forever ids
        return {int(d): _DELETE_FOREVER for d in raw}
    return {int(k): int(v) for k, v in raw.items()}


def _committed_markers(index_dir: str) -> dict[int, dict]:
    d = _gen_marker_dir(index_dir)
    out: dict[int, dict] = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        m = re.match(r"^g(\d+)\.json$", name)
        if not m:
            continue
        try:
            with open(os.path.join(d, name)) as f:
                out[int(m.group(1))] = json.load(f)
        except (OSError, ValueError):
            out[int(m.group(1))] = {}
    return out


def load_tombstone_thresholds(
    index_dir: str, markers: dict[int, dict] | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted doc ids, aligned masked_below_gen) merged from the explicit
    tombstone file and the committed generations' ``replaces`` lists."""
    thr = _read_tombstone_file(index_dir)
    if markers is None:
        markers = _committed_markers(index_dir)
    for gen, info in markers.items():
        for d in info.get("replaces", ()):
            thr[int(d)] = max(thr.get(int(d), 0), gen)
    if not thr:
        e = np.empty(0, dtype=np.int64)
        return e, e
    ids = np.array(sorted(thr), dtype=np.int64)
    return ids, np.array([thr[int(i)] for i in ids], dtype=np.int64)


def load_tombstones(index_dir: str) -> np.ndarray:
    """Legacy view: ids dead at EVERY live generation (plain deletes that no
    later generation has re-added)."""
    ids, thr = load_tombstone_thresholds(index_dir)
    if not len(ids):
        return ids
    max_gen = max(committed_gens(index_dir) | {0})
    return ids[thr > max_gen]


def mask_signature(
    tomb_ids: np.ndarray, tomb_thr: np.ndarray, shard: int, n_shards: int, gen: int
) -> str:
    """Deterministic fingerprint of the tombstone masks RELEVANT to a
    segment (this shard's docs with threshold above the segment's gen);
    "" when none apply. A scalar high-water threshold is NOT enough here:
    consecutive deletes with no intervening generation share the same
    threshold value, and the second would look already-expunged."""
    if not len(tomb_ids):
        return ""
    sel = (tomb_thr > gen) & (tomb_ids % n_shards == shard)
    if not bool(np.any(sel)):
        return ""
    import hashlib

    h = hashlib.md5()
    h.update(np.ascontiguousarray(tomb_ids[sel]).tobytes())
    h.update(np.ascontiguousarray(tomb_thr[sel]).tobytes())
    return h.hexdigest()


def segment_expunged_sig(index_dir: str, name: str) -> str:
    """The mask signature the last expunging merge applied to this segment
    (recorded by the merger; "" for never-expunged)."""
    mpath = os.path.join(index_dir, SEGMENTS, name, "manifest.json")
    try:
        with open(mpath) as f:
            return str(json.load(f).get("expunged_sig", ""))
    except (OSError, ValueError):
        return ""


def segment_needs_expunge(
    index_dir: str,
    shard: int,
    name: str,
    tomb_ids: np.ndarray,
    tomb_thr: np.ndarray,
    n_shards: int,
) -> bool:
    """True iff this segment may still hold masked postings: the CURRENT
    relevant mask set differs from the one already expunged into it.
    Shared by the merge work-list and the MergerActor's skip check — the
    two must never disagree."""
    sig = mask_signature(tomb_ids, tomb_thr, shard, n_shards,
                         segment_mask_gen(index_dir, name))
    if not sig:
        return False
    return sig != segment_expunged_sig(index_dir, name)


def segment_gen(index_dir: str, name: str) -> int:
    """VISIBILITY generation of a segment: a delta's own marker gen (from
    the dir name), or for a base segment the highest gen folded into it
    (0 for a virgin base). Drives live_gens / merged_through bookkeeping —
    use :func:`segment_mask_gen` when deciding which tombstone thresholds
    apply to the segment's postings."""
    m = re.search(r"_g(\d+)$", name)
    if m:
        return int(m.group(1))
    mpath = os.path.join(index_dir, SEGMENTS, name, "manifest.json")
    try:
        with open(mpath) as f:
            return max(0, int(json.load(f).get("merged_through_gen", 0)))
    except (OSError, ValueError):
        return 0


def segment_mask_gen(index_dir: str, name: str) -> int:
    """MASK generation of a segment: postings read from it are masked iff
    ``tombstone_threshold > mask_gen``. Equal to the visibility gen except
    for tiered-merge output, whose manifest records ``mask_gen`` = the
    highest SOURCE generation folded in: the combined dir carries a fresh
    marker gen M, but its postings were expunged with the per-source masks
    known at merge time, so only thresholds ABOVE the sources may still
    apply — and a delete racing the merge always lands with threshold
    > max(source gens), so it is never skipped."""
    mpath = os.path.join(index_dir, SEGMENTS, name, "manifest.json")
    try:
        with open(mpath) as f:
            m = json.load(f)
        if "mask_gen" in m:
            return int(m["mask_gen"])
    except (OSError, ValueError):
        pass
    return segment_gen(index_dir, name)


def folded_gens(index_dir: str,
                markers: dict[int, dict] | None = None) -> set[int]:
    """Generations superseded by a committed tiered merge: every gen listed
    in a committed marker's ``folds``. Their segment dirs are invisible
    (live_gens skips them) and removable (cleanup deletes them); their
    MARKERS stay forever — ``replaces`` lists still feed tombstone
    thresholds and ``_next_gen`` monotonicity."""
    if markers is None:
        markers = _committed_markers(index_dir)
    out: set[int] = set()
    for info in markers.values():
        out.update(int(g) for g in info.get("folds", ()))
    return out


def update_fields(index_dir: str, updates: pd.DataFrame) -> dict:
    """Atomic partial update (Solr atomic-update ``set`` on stored fields):
    overwrite metadata columns of LIVE docs WITHOUT touching postings —
    BM25 scores are bit-identical before and after; facets, grouping,
    boosts and filters see the new values atomically when the generation
    marker lands (readers ignore unmarked generations).

    ``updates``: doc_id plus the meta columns to set (a subset of the doc
    table's meta columns — never doc_id/gen/shard/sha256). Raises if a
    target id is not live or a column is unknown.

    Shape: the corpus-sized doc table scans DISTRIBUTED against the
    broadcast target-id set (only delta-sized matches reach the driver);
    the new generation is one small parquet of the resolved current rows
    with the fields overwritten. No segments, no stats change, and the
    commit marker carries no ``replaces`` — postings visibility is
    untouched.
    """
    from .build import _seal_termstats

    if _cleanup_uncommitted_gens(index_dir):
        _seal_termstats(index_dir)
    repair_stats(index_dir)

    docs_dir = os.path.join(index_dir, "_docs")
    existing_cols = _docs_columns(docs_dir)
    protected = {"doc_id", "gen", "shard", "sha256"}
    set_cols = [c for c in updates.columns if c != "doc_id"]
    unknown = [c for c in set_cols if c not in existing_cols or c in protected]
    if unknown:
        raise ValueError(f"update_fields: not updatable columns: {unknown}")
    if not set_cols:
        raise ValueError("update_fields: no columns to set")
    target = np.unique(updates["doc_id"].to_numpy(np.int64))
    if len(target) != len(updates):
        raise ValueError("update_fields: duplicate doc ids in updates")
    t_ref = ray.put(target)

    def _match(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(), dtype=np.int64)
        tg = ray.get(t_ref)
        pos = np.searchsorted(tg, ids)
        ok = pos < len(tg)
        hit = np.zeros(len(ids), dtype=bool)
        hit[ok] = tg[pos[ok]] == ids[ok]
        return t.filter(pa.array(hit))

    rows = (
        ray.data.read_parquet(docs_dir)
        .map_batches(_match, batch_format="pyarrow")
        .to_pandas()
    )
    if len(rows) == 0 or "doc_id" not in rows.columns:
        # all-empty blocks can drop the schema entirely
        rows = pd.DataFrame({c: pd.Series([], dtype=object)
                             for c in existing_cols})
        rows["doc_id"] = rows["doc_id"].astype(np.int64)
    if "gen" in rows.columns:
        rows = rows.sort_values("gen", kind="mergesort").drop_duplicates(
            "doc_id", keep="last"
        )
    else:
        rows = rows.drop_duplicates("doc_id")
        rows["gen"] = np.int64(0)
    # live check (tombstoned-current rows are dead)
    tomb_ids, tomb_thr = load_tombstone_thresholds(index_dir)
    if len(tomb_ids) and len(rows):
        d = rows["doc_id"].to_numpy(np.int64)
        g = rows["gen"].to_numpy(np.int64)
        pos = np.searchsorted(tomb_ids, d)
        ok = pos < len(tomb_ids)
        hit = np.zeros(len(d), dtype=bool)
        hit[ok] = tomb_ids[pos[ok]] == d[ok]
        dead = np.zeros(len(d), dtype=bool)
        dead[hit] = tomb_thr[np.searchsorted(tomb_ids, d[hit])] > g[hit]
        rows = rows[~dead]
    missing = np.setdiff1d(target, rows["doc_id"].to_numpy(np.int64))
    if len(missing):
        raise ValueError(
            f"update_fields: {len(missing)} target ids not live "
            f"(e.g. {missing[:10].tolist()})"
        )

    gen = _next_gen(index_dir)
    new_rows = rows.merge(updates, on="doc_id", suffixes=("", "__new"))
    for c in set_cols:
        new_rows[c] = new_rows[f"{c}__new"]
    new_rows = new_rows[existing_cols].copy()
    new_rows["gen"] = np.int64(gen)
    gen_dir = os.path.join(docs_dir, f"gen={gen:04d}")
    os.makedirs(gen_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(new_rows, preserve_index=False),
        os.path.join(gen_dir, "part-0.parquet"),
    )
    _commit_gen(
        index_dir, gen,
        {"n_docs": 0, "n_tokens": 0, "replaces": [], "n_replaced": 0,
         "n_shadowed": 0, "meta_update": int(len(new_rows))},
    )
    # a metadata-only generation has no term files: the incremental path
    # restamps the seal's gen list in place (O(1)); stale seal → full
    from .build import _seal_termstats, _seal_termstats_incremental

    if not _seal_termstats_incremental(index_dir, gen):
        _seal_termstats(index_dir)
    return {"gen": gen, "n_updated": int(len(new_rows)), "set_cols": set_cols}


def realtime_get(
    index_dir: str, doc_ids, columns: list[str] | None = None
) -> pd.DataFrame:
    """Solr /get (realtime get): the CURRENT stored fields of the given ids.

    The latest committed generation wins per doc (replace / update_fields
    semantics); tombstone-masked docs are absent — a get right after
    update_fields / delete_by_query / add_documents reflects the change
    with no merge and no searcher reopen. Solr serves this from the update
    log; here the gen-layered ``_docs`` table IS that log, so RTG is one
    pushdown ``isin`` read (point lookup — never a corpus scan into the
    driver; parquet row groups that can't contain the ids are pruned by
    their doc_id statistics). Crash remnants of uncommitted generations are
    cleaned first, exactly like the write paths do.

    Returns rows sorted by doc_id; ``columns`` (plus doc_id) prunes the
    output. Reference parity: the Solr endpoint the reference posts to
    exposes /get with these exact semantics (uvalib Solr usage; see
    SURVEY.md §2.1 S5 point lookups).
    """
    import pyarrow.dataset as pads

    from .build import _seal_termstats

    if _cleanup_uncommitted_gens(index_dir):
        _seal_termstats(index_dir)
    docs_dir = os.path.join(index_dir, "_docs")
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    dset = pads.dataset(docs_dir)
    pdf = dset.to_table(
        filter=pads.field("doc_id").isin(pa.array(ids, pa.int64()))
    ).to_pandas()
    if "gen" in pdf.columns:
        pdf = pdf.sort_values("gen", kind="mergesort").drop_duplicates(
            "doc_id", keep="last"
        )
        row_gen = pdf["gen"].to_numpy(np.int64)
    else:
        pdf = pdf.drop_duplicates("doc_id")
        row_gen = np.zeros(len(pdf), dtype=np.int64)
    tomb_ids, tomb_thr = load_tombstone_thresholds(index_dir)
    if len(tomb_ids) and len(pdf):
        d = pdf["doc_id"].to_numpy(np.int64)
        pos = np.searchsorted(tomb_ids, d)
        ok = pos < len(tomb_ids)
        hit = np.zeros(len(d), dtype=bool)
        hit[ok] = tomb_ids[pos[ok]] == d[ok]
        dead = np.zeros(len(d), dtype=bool)
        dead[hit] = tomb_thr[np.searchsorted(tomb_ids, d[hit])] > row_gen[hit]
        pdf = pdf[~dead]
    pdf = pdf.sort_values("doc_id", ignore_index=True)
    if columns is not None:
        keep = ["doc_id"] + [c for c in columns if c != "doc_id"]
        pdf = pdf[keep]
    return pdf
