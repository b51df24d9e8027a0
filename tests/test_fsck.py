"""fsck: a clean index audits ok; each corruption class is detected."""

import json
import os
import shutil

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.fsck import fsck_index

CORPUS = "/root/testdata/sf0.001/documents.parquet"


def _build(tmp_path, positions=False):
    idx = str(tmp_path / "idx")
    build_index(CORPUS, idx, BuildConfig(
        n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
        meta_cols=("lang",), store_positions=positions))
    return idx


def test_clean_index_ok(ray_session, tmp_path):
    idx = _build(tmp_path)
    r = fsck_index(idx)
    assert r["ok"], r["issues"]
    assert r["n_segments"] > 0 and r["n_docs"] == 500


def test_detects_truncated_postings(ray_session, tmp_path):
    idx = _build(tmp_path)
    seg = sorted(os.listdir(os.path.join(idx, "segments")))[0]
    p = os.path.join(idx, "segments", seg, "postings.bin")
    with open(p, "r+b") as f:
        f.truncate(max(0, os.path.getsize(p) - 5))
    r = fsck_index(idx)
    assert not r["ok"]
    assert any("payload_bytes" in i for i in r["issues"])


def test_detects_missing_manifest_and_stray_tmp(ray_session, tmp_path):
    idx = _build(tmp_path)
    segs = sorted(os.listdir(os.path.join(idx, "segments")))
    os.remove(os.path.join(idx, "segments", segs[0], "manifest.json"))
    os.makedirs(os.path.join(idx, "segments", ".tmp-s0000_b0000-dead"))
    r = fsck_index(idx)
    assert not r["ok"]
    assert any("manifest missing" in i for i in r["issues"])
    assert any("stray tmp" in i for i in r["issues"])


def test_detects_stats_drift_and_missing_positions(ray_session, tmp_path):
    idx = _build(tmp_path, positions=True)
    # corrupt global stats counter
    sp = os.path.join(idx, "_global", "stats.json")
    s = json.load(open(sp))
    s["n_postings"] += 7
    json.dump(s, open(sp, "w"))
    # drop one positions stream
    seg = sorted(os.listdir(os.path.join(idx, "segments")))[0]
    os.remove(os.path.join(idx, "segments", seg, "positions.bin"))
    r = fsck_index(idx)
    assert not r["ok"]
    assert any("n_postings" in i for i in r["issues"])
    assert any("positions.bin" in i for i in r["issues"])


def test_detects_missing_docs_table(ray_session, tmp_path):
    idx = _build(tmp_path)
    shutil.rmtree(os.path.join(idx, "_docs"))
    r = fsck_index(idx)
    assert not r["ok"]
    assert any("_docs table missing" in i for i in r["issues"])


def test_repair_heals_safe_findings(ray_session, tmp_path):
    from archivesspace_virgo_ray.index.fsck import repair_index

    idx = _build(tmp_path)
    # plant every safe-to-heal class: stray tmp, drifted stats, stale seal
    dead = os.path.join(idx, "segments", ".tmp-s0000_b0000-dead")
    os.makedirs(dead)
    os.utime(dead, (0, 0))  # backdate: a LIVE-looking scratch is skipped
    sp = os.path.join(idx, "_global", "stats.json")
    s = json.load(open(sp))
    s["n_postings"] += 3
    s["total_len"] += 3
    json.dump(s, open(sp, "w"))
    r = repair_index(idx)
    assert r["ok"], r["issues"]
    assert any("stray tmp" in a for a in r["actions"])
    assert any("recomputed" in a for a in r["actions"])
    # structural damage is NOT healed, only reported
    seg = sorted(os.listdir(os.path.join(idx, "segments")))[0]
    os.remove(os.path.join(idx, "segments", seg, "postings.bin"))
    r2 = repair_index(idx)
    assert not r2["ok"]
    assert any("missing postings.bin" in i for i in r2["issues"])


def test_repair_skips_live_scratch_dirs(ray_session, tmp_path):
    """A freshly-touched .gen-* scratch dir (a possibly-LIVE delta writer)
    must survive --repair; passing scratch_min_age_sec=0 forces removal."""
    from archivesspace_virgo_ray.index.fsck import fsck_index, repair_index

    idx = _build(tmp_path)
    live = os.path.join(idx, "segments", ".gen-deadbeef")
    os.makedirs(live)  # mtime = now → under the default age threshold
    r = repair_index(idx)
    assert os.path.isdir(live), "live scratch dir was deleted"
    assert any("skipped scratch" in a for a in r["actions"])
    assert "stray_tmp" in r["issue_codes"]  # still reported, not healed
    r2 = repair_index(idx, scratch_min_age_sec=0)
    assert not os.path.isdir(live)
    assert r2["ok"], r2["issues"]


def test_issue_codes_parallel_and_targeted_repairs(ray_session, tmp_path):
    """issue_codes is parallel to issues, and repairs key on codes: a
    findings set with ONLY structural damage triggers NO reseal/restats."""
    from archivesspace_virgo_ray.index import fsck as F

    idx = _build(tmp_path)
    seg = sorted(os.listdir(os.path.join(idx, "segments")))[0]
    os.remove(os.path.join(idx, "segments", seg, "postings.bin"))
    r = F.fsck_index(idx)
    assert len(r["issue_codes"]) == len(r["issues"])
    assert F.SEG_FILE_MISSING in r["issue_codes"]
    r2 = F.repair_index(idx)
    assert "resealed termstats" not in r2["actions"]
    assert "recomputed global stats from disk truth" not in r2["actions"]
    assert F.SEG_FILE_MISSING in r2["issue_codes"]  # reported unchanged
