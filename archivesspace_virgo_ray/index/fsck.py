"""Index integrity audit (fsck): cross-check every durable artifact the
engine writes — segment manifests vs their files, manifest counters vs
global stats, the termstats seal vs committed generations, the forward doc
table vs stats — and report (never repair) what disagrees.

At 100 TB an index outlives many runs, machines and operators; the audit is
the cheap answer to "is this index dir safe to serve / snapshot / reshard?".
Everything here reads metadata and file sizes only — no posting decode, so
a multi-TB index audits in seconds. (Posting-level byte checks already have
stronger guarantees: deterministic segments + atomic publish mean a visible
segment is either complete or absent.)

Reference parity: the reference trusts Solr commits and re-posts on doubt;
this is the self-hosted equivalent of its hash-gated "reindex if anything
looks off" check (IndexRecordsForV4.java:44-69).
"""

from __future__ import annotations

import json
import os

from .segments import DOCS, GLOBAL, read_stats


def fsck_index(index_dir: str) -> dict:
    """Audit ``index_dir``; returns {"ok": bool, "issues": [str, ...],
    "n_segments": int, "n_postings": int, "n_docs": int}."""
    from .. import PIPELINE_VERSION
    from .build import termstats_dir
    from .update import committed_gens

    issues: list[str] = []

    # ---- global stats ------------------------------------------------------
    try:
        stats = read_stats(index_dir)
    except (OSError, ValueError) as e:
        return {"ok": False, "issues": [f"stats.json unreadable: {e}"],
                "n_segments": 0, "n_postings": 0, "n_docs": 0}
    if stats.get("pipeline_version") != PIPELINE_VERSION:
        issues.append(
            f"stats pipeline_version {stats.get('pipeline_version')!r} != "
            f"current {PIPELINE_VERSION!r}")

    # ---- segments ----------------------------------------------------------
    seg_root = os.path.join(index_dir, "segments")
    n_segments = 0
    total_postings = 0
    total_tokens = 0
    positions_flags = set()
    for name in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
        d = os.path.join(seg_root, name)
        if name.startswith("."):
            # .tmp-* = crashed base writer staging; .gen-* = crashed delta
            # writer scratch — both unreferenced, both safe to remove
            issues.append(f"stray tmp segment dir: {name}")
            continue
        if not os.path.isdir(d):
            continue
        mpath = os.path.join(d, "manifest.json")
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (OSError, ValueError):
            issues.append(f"{name}: manifest missing/unreadable")
            continue
        if m.get("status") != "complete":
            issues.append(f"{name}: status {m.get('status')!r}")
            continue
        if m.get("pipeline_version") != PIPELINE_VERSION:
            issues.append(f"{name}: stale pipeline_version "
                          f"{m.get('pipeline_version')!r}")
        for fn in ("terms.parquet", "blocks.parquet", "postings.bin"):
            if not os.path.exists(os.path.join(d, fn)):
                issues.append(f"{name}: missing {fn}")
        ppath = os.path.join(d, "postings.bin")
        if os.path.exists(ppath):
            sz = os.path.getsize(ppath)
            if sz != m.get("payload_bytes"):
                issues.append(f"{name}: postings.bin {sz} bytes != manifest "
                              f"payload_bytes {m.get('payload_bytes')}")
        if m.get("positions"):
            xpath = os.path.join(d, "positions.bin")
            if not os.path.exists(xpath):
                issues.append(f"{name}: positional manifest but no "
                              "positions.bin")
            elif os.path.getsize(xpath) != m.get("positions_bytes"):
                issues.append(f"{name}: positions.bin size != manifest "
                              "positions_bytes")
        tpath = os.path.join(d, "terms.parquet")
        if os.path.exists(tpath):
            import pyarrow.parquet as pq

            n_terms = pq.read_metadata(tpath).num_rows
            if n_terms != m.get("n_terms"):
                issues.append(f"{name}: terms.parquet {n_terms} rows != "
                              f"manifest n_terms {m.get('n_terms')}")
        n_segments += 1
        # only BASE segments (s####_b####) feed the stats counters; delta
        # generations carry their own counters and merge later
        if "_g" not in name:
            total_postings += int(m.get("n_postings", 0))
            total_tokens += int(m.get("n_tokens", 0))
        positions_flags.add(bool(m.get("positions", False)))

    if len(positions_flags) > 1:
        issues.append("mixed positional and non-positional segments")
    if positions_flags and (bool(stats.get("positions", False))
                            not in positions_flags):
        issues.append("stats positions flag disagrees with segments")

    has_gens = bool(committed_gens(index_dir))
    if not has_gens:
        # with no deltas, base manifests must reproduce the sealed stats
        if total_postings != stats.get("n_postings"):
            issues.append(f"sum(manifest n_postings) {total_postings} != "
                          f"stats n_postings {stats.get('n_postings')}")
        if total_tokens != stats.get("total_len"):
            issues.append(f"sum(manifest n_tokens) {total_tokens} != "
                          f"stats total_len {stats.get('total_len')}")

    # ---- termstats seal ----------------------------------------------------
    ts = termstats_dir(index_dir)
    sealed_path = os.path.join(ts, "_SEALED.json")
    if not os.path.isdir(ts):
        issues.append("termstats dir missing (pointer dangles or never "
                      "sealed)")
    else:
        try:
            with open(sealed_path) as f:
                sealed = sorted(json.load(f).get("sealed_gens", []))
        except (OSError, ValueError):
            sealed = None
            issues.append("termstats _SEALED.json missing/unreadable")
        if sealed is not None and sealed != sorted(committed_gens(index_dir)):
            issues.append(f"termstats sealed gens {sealed} != committed "
                          f"{sorted(committed_gens(index_dir))} (stale seal "
                          "— readers will self-heal, but re-seal to clear)")

    # ---- forward doc table --------------------------------------------------
    docs_dir = os.path.join(index_dir, DOCS)
    n_docs = 0
    if not os.path.isdir(docs_dir):
        issues.append("_docs table missing")
    else:
        import pyarrow.parquet as pq

        for root, _dirs, files in os.walk(docs_dir):
            for f in files:
                if f.endswith(".parquet"):
                    n_docs += pq.read_metadata(os.path.join(root, f)).num_rows
        if not has_gens and n_docs != stats.get("n_docs"):
            issues.append(f"_docs rows {n_docs} != stats n_docs "
                          f"{stats.get('n_docs')}")

    # ---- tombstones ----------------------------------------------------------
    tpath = os.path.join(index_dir, GLOBAL, "tombstones.json")
    if os.path.exists(tpath):
        try:
            with open(tpath) as f:
                json.load(f)
        except (OSError, ValueError):
            issues.append("tombstones.json unreadable")

    return {"ok": not issues, "issues": issues, "n_segments": n_segments,
            "n_postings": total_postings, "n_docs": n_docs}


def repair_index(index_dir: str) -> dict:
    """Heal the SAFE-to-heal findings and re-audit:

    - stray ``.tmp-*`` segment dirs → removed (a crashed writer's staging —
      never referenced by anything)
    - stale termstats seal → resealed (the same self-heal readers perform)
    - drifted global stats counters → recomputed from disk truth
      (``update.repair_stats``)

    Structural damage (missing/truncated segment files) is NOT repairable
    here — those segments must be rebuilt (``build_index(resume=True)``
    rebuilds exactly the incomplete ones) — and is reported unchanged.

    Returns the post-repair audit plus an ``actions`` list."""
    import shutil

    from .build import _seal_termstats
    from .update import repair_stats

    actions: list[str] = []
    seg_root = os.path.join(index_dir, "segments")
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            if name.startswith("."):
                shutil.rmtree(os.path.join(seg_root, name),
                              ignore_errors=True)
                actions.append(f"removed stray tmp dir {name}")
    before = fsck_index(index_dir)
    if any("stale seal" in i or "termstats" in i for i in before["issues"]):
        _seal_termstats(index_dir)
        actions.append("resealed termstats")
    if any("stats" in i or "n_postings" in i or "total_len" in i
           or "n_docs" in i for i in before["issues"]):
        repair_stats(index_dir)
        actions.append("recomputed global stats from disk truth")
    after = fsck_index(index_dir)
    after["actions"] = actions
    return after
