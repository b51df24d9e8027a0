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

Findings carry STRUCTURED codes (``issue_codes`` parallel to ``issues``) so
``repair_index`` matches repairs to exactly the findings they fix — never by
substring-probing human-readable text.

Reference parity: the reference trusts Solr commits and re-posts on doubt;
this is the self-hosted equivalent of its hash-gated "reindex if anything
looks off" check (IndexRecordsForV4.java:44-69).
"""

from __future__ import annotations

import json
import os
import time

from .segments import DOCS, GLOBAL, read_stats
from .locking import locked_on

# issue codes (stable API: repair_index and external tooling key on these)
STATS_UNREADABLE = "stats_unreadable"
STATS_VERSION = "stats_version"
STRAY_TMP = "stray_tmp"
MANIFEST_MISSING = "manifest_missing"
SEG_INCOMPLETE = "seg_incomplete"
SEG_VERSION = "seg_version"
SEG_FILE_MISSING = "seg_file_missing"
SEG_PAYLOAD_SIZE = "seg_payload_size"
SEG_POSITIONS_MISSING = "seg_positions_missing"
SEG_POSITIONS_SIZE = "seg_positions_size"
SEG_TERMS_ROWS = "seg_terms_rows"
MIXED_POSITIONS = "mixed_positions"
STATS_POSITIONS_FLAG = "stats_positions_flag"
STATS_POSTINGS_SUM = "stats_postings_sum"
STATS_TOKENS_SUM = "stats_tokens_sum"
TERMSTATS_MISSING = "termstats_missing"
SEAL_UNREADABLE = "seal_unreadable"
SEAL_STALE = "seal_stale"
DOCS_MISSING = "docs_missing"
DOCS_ROWS = "docs_rows"
TOMBSTONES_UNREADABLE = "tombstones_unreadable"
FOLDED_LEFTOVER = "folded_leftover"
VACUUM_LEFTOVER = "vacuum_leftover"


def fsck_index(index_dir: str) -> dict:
    """Audit ``index_dir``; returns {"ok": bool, "issues": [str, ...],
    "issue_codes": [str, ...] (parallel), "n_segments": int,
    "n_postings": int, "n_docs": int}."""
    import re

    from .. import PIPELINE_VERSION
    from .build import termstats_dir
    from .update import committed_gens, folded_gens

    findings: list[tuple[str, str]] = []

    def add(code: str, msg: str) -> None:
        findings.append((code, msg))

    def result(n_segments: int, n_postings: int, n_docs: int) -> dict:
        return {
            "ok": not findings,
            "issues": [m for _, m in findings],
            "issue_codes": [c for c, _ in findings],
            "n_segments": n_segments,
            "n_postings": n_postings,
            "n_docs": n_docs,
        }

    # ---- global stats ------------------------------------------------------
    try:
        stats = read_stats(index_dir)
    except (OSError, ValueError) as e:
        add(STATS_UNREADABLE, f"stats.json unreadable: {e}")
        return result(0, 0, 0)
    if stats.get("pipeline_version") != PIPELINE_VERSION:
        add(STATS_VERSION,
            f"stats pipeline_version {stats.get('pipeline_version')!r} != "
            f"current {PIPELINE_VERSION!r}")

    # ---- segments ----------------------------------------------------------
    seg_root = os.path.join(index_dir, "segments")
    n_segments = 0
    total_postings = 0
    total_tokens = 0
    positions_flags = set()
    folded = folded_gens(index_dir)
    for name in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
        d = os.path.join(seg_root, name)
        if name.startswith("."):
            # .tmp-* = crashed base writer staging; .gen-* / .tier-* =
            # crashed delta/tiered writer scratch — all unreferenced; safe
            # to remove once the writer is certainly dead (repair uses an
            # mtime threshold)
            add(STRAY_TMP, f"stray tmp segment dir: {name}")
            continue
        if not os.path.isdir(d):
            continue
        gm = re.search(r"_g(\d+)$", name)
        if gm and int(gm.group(1)) in folded:
            # superseded by a committed tiered merge: invisible to readers
            # (live_gens skips folded gens) and safe to delete any time —
            # a crash between the fold's marker commit and source cleanup
            add(FOLDED_LEFTOVER, f"{name}: folded into a committed tiered "
                "merge but still on disk")
            continue
        mpath = os.path.join(d, "manifest.json")
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (OSError, ValueError):
            add(MANIFEST_MISSING, f"{name}: manifest missing/unreadable")
            continue
        if m.get("status") != "complete":
            add(SEG_INCOMPLETE, f"{name}: status {m.get('status')!r}")
            continue
        if m.get("pipeline_version") != PIPELINE_VERSION:
            add(SEG_VERSION, f"{name}: stale pipeline_version "
                f"{m.get('pipeline_version')!r}")
        for fn in ("terms.parquet", "blocks.parquet", "postings.bin"):
            if not os.path.exists(os.path.join(d, fn)):
                add(SEG_FILE_MISSING, f"{name}: missing {fn}")
        ppath = os.path.join(d, "postings.bin")
        if os.path.exists(ppath):
            sz = os.path.getsize(ppath)
            if sz != m.get("payload_bytes"):
                add(SEG_PAYLOAD_SIZE,
                    f"{name}: postings.bin {sz} bytes != manifest "
                    f"payload_bytes {m.get('payload_bytes')}")
        if m.get("positions"):
            xpath = os.path.join(d, "positions.bin")
            if not os.path.exists(xpath):
                add(SEG_POSITIONS_MISSING,
                    f"{name}: positional manifest but no positions.bin")
            elif os.path.getsize(xpath) != m.get("positions_bytes"):
                add(SEG_POSITIONS_SIZE,
                    f"{name}: positions.bin size != manifest positions_bytes")
        tpath = os.path.join(d, "terms.parquet")
        if os.path.exists(tpath):
            import pyarrow.parquet as pq

            n_terms = pq.read_metadata(tpath).num_rows
            if n_terms != m.get("n_terms"):
                add(SEG_TERMS_ROWS,
                    f"{name}: terms.parquet {n_terms} rows != "
                    f"manifest n_terms {m.get('n_terms')}")
        n_segments += 1
        # only BASE segments (s####_b####) feed the stats counters; delta
        # generations carry their own counters and merge later
        if "_g" not in name:
            total_postings += int(m.get("n_postings", 0))
            total_tokens += int(m.get("n_tokens", 0))
        positions_flags.add(bool(m.get("positions", False)))

    if len(positions_flags) > 1:
        add(MIXED_POSITIONS, "mixed positional and non-positional segments")
    if positions_flags and (bool(stats.get("positions", False))
                            not in positions_flags):
        add(STATS_POSITIONS_FLAG,
            "stats positions flag disagrees with segments")

    has_gens = bool(committed_gens(index_dir))
    if not has_gens:
        # with no deltas, base manifests must reproduce the sealed stats
        if total_postings != stats.get("n_postings"):
            add(STATS_POSTINGS_SUM,
                f"sum(manifest n_postings) {total_postings} != "
                f"stats n_postings {stats.get('n_postings')}")
        if total_tokens != stats.get("total_len"):
            add(STATS_TOKENS_SUM,
                f"sum(manifest n_tokens) {total_tokens} != "
                f"stats total_len {stats.get('total_len')}")

    # ---- termstats seal ----------------------------------------------------
    ts = termstats_dir(index_dir)
    sealed_path = os.path.join(ts, "_SEALED.json")
    if not os.path.isdir(ts):
        add(TERMSTATS_MISSING,
            "termstats dir missing (pointer dangles or never sealed)")
    else:
        try:
            with open(sealed_path) as f:
                sealed = sorted(json.load(f).get("sealed_gens", []))
        except (OSError, ValueError):
            sealed = None
            add(SEAL_UNREADABLE, "termstats _SEALED.json missing/unreadable")
        if sealed is not None and sealed != sorted(committed_gens(index_dir)):
            add(SEAL_STALE,
                f"termstats sealed gens {sealed} != committed "
                f"{sorted(committed_gens(index_dir))} (stale seal "
                "— readers will self-heal, but re-seal to clear)")

    # ---- forward doc table --------------------------------------------------
    docs_dir = os.path.join(index_dir, DOCS)
    for suffix in (".old", ".vtmp"):
        if os.path.isdir(docs_dir + suffix):
            add(VACUUM_LEFTOVER,
                f"{DOCS}{suffix} present (crashed vacuum_docs — repair "
                "restores/cleans it)")
    n_docs = 0
    if not os.path.isdir(docs_dir):
        if os.path.isdir(docs_dir + ".old"):
            pass  # covered by VACUUM_LEFTOVER: repair restores from .old
        else:
            add(DOCS_MISSING, "_docs table missing")
    else:
        import pyarrow.parquet as pq

        for root, _dirs, files in os.walk(docs_dir):
            for f in files:
                if f.endswith(".parquet"):
                    n_docs += pq.read_metadata(os.path.join(root, f)).num_rows
        if not has_gens and n_docs != stats.get("n_docs"):
            add(DOCS_ROWS,
                f"_docs rows {n_docs} != stats n_docs {stats.get('n_docs')}")

    # ---- tombstones ----------------------------------------------------------
    tpath = os.path.join(index_dir, GLOBAL, "tombstones.json")
    if os.path.exists(tpath):
        try:
            with open(tpath) as f:
                json.load(f)
        except (OSError, ValueError):
            add(TOMBSTONES_UNREADABLE, "tombstones.json unreadable")

    return result(n_segments, total_postings, n_docs)


# repairs keyed by the EXACT finding codes they fix
_RESEAL_CODES = frozenset({SEAL_STALE, SEAL_UNREADABLE, TERMSTATS_MISSING})
_RESTATS_CODES = frozenset({STATS_POSTINGS_SUM, STATS_TOKENS_SUM, DOCS_ROWS,
                            STATS_POSITIONS_FLAG, STATS_VERSION})

# Don't delete a dot-prefixed scratch dir younger than this: a delta add /
# build may still be writing into it (fsck --repair can run concurrently
# with writers; an in-flight writer's scratch mtime is recent by definition).
SCRATCH_MIN_AGE_SEC = 900.0


@locked_on("index_dir")
def repair_index(index_dir: str,
                 scratch_min_age_sec: float = SCRATCH_MIN_AGE_SEC) -> dict:
    """Heal the SAFE-to-heal findings and re-audit:

    - stray ``.tmp-*`` / ``.gen-*`` segment dirs older than
      ``scratch_min_age_sec`` → removed (a crashed writer's staging — never
      referenced by anything; younger dirs are skipped because they may
      belong to a LIVE writer)
    - folded leftover delta dirs (crash between a tiered merge's marker
      commit and its source cleanup) → removed (invisible to readers,
      superseded by the committed combined segment — safe at any age)
    - stale/unreadable termstats seal, or missing termstats dir → resealed
      from the segments (termstats is fully derived data)
    - drifted global stats counters / stale stats version → recomputed from
      disk truth (``update.repair_stats``)

    Repairs trigger on structured issue CODES, never on message text.
    Structural damage (missing/truncated segment files) is NOT repairable
    here — those segments must be rebuilt (``build_index(resume=True)``
    rebuilds exactly the incomplete ones) — and is reported unchanged.

    Returns the post-repair audit plus an ``actions`` list."""
    import shutil

    from .build import _seal_termstats
    from .update import repair_stats

    actions: list[str] = []
    now = time.time()
    seg_root = os.path.join(index_dir, "segments")
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            if not name.startswith("."):
                continue
            p = os.path.join(seg_root, name)
            try:
                age = now - os.path.getmtime(p)
            except OSError:
                age = float("inf")  # vanished mid-scan: nothing left to keep
            if age < scratch_min_age_sec:
                actions.append(
                    f"skipped scratch dir {name} (age {age:.0f}s < "
                    f"{scratch_min_age_sec:.0f}s — possibly a live writer)")
                continue
            shutil.rmtree(p, ignore_errors=True)
            actions.append(f"removed stray tmp dir {name}")
    before = fsck_index(index_dir)
    codes = set(before["issue_codes"])
    if FOLDED_LEFTOVER in codes:
        # folded gens are invisible to readers and superseded by their
        # COMMITTED combined segment — removal is safe at any age, even
        # under a live writer (the fold owner would delete them next)
        from .update import folded_gens as _folded

        import re as _re

        folded = _folded(index_dir)
        for name in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
            m = _re.search(r"_g(\d+)$", name)
            if m and int(m.group(1)) in folded:
                shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
                actions.append(f"removed folded leftover {name}")
    if VACUUM_LEFTOVER in codes:
        from .update import _heal_crashed_vacuum

        if _heal_crashed_vacuum(index_dir):
            actions.append("healed crashed vacuum (_docs restored/cleaned)")
    if codes & _RESEAL_CODES:
        _seal_termstats(index_dir)
        actions.append("resealed termstats")
    if codes & _RESTATS_CODES:
        repair_stats(index_dir)
        actions.append("recomputed global stats from disk truth")
    after = fsck_index(index_dir)
    after["actions"] = actions
    return after
