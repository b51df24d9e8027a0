"""Publish sinks (K5/K6) + source-system routing (M20).

The reference concatenates per-system batch docs and uploads to S3 under a
dated key layout ``{bucket}/{YYYY}/{aspace|avalon}/{yyyy-MM-dd_HHmm}.xml``
(IndexRecordsForV4.java:101-114, 135-144). Parquet is splittable, so the
concat step disappears; the dated per-system prefix survives as the
partition path, and a run manifest is committed only after the data lands —
the reference's commit-after-publish ordering (:116-125).
"""

from __future__ import annotations

import json
import os
import uuid


def route_by_system(ds, id_col: str = "doc_id"):
    """M20: ``as:*`` ids → aspace, everything else → avalon
    (IndexRecordsForV4.java:185-188). Returns (aspace_ds, avalon_ds)."""
    aspace = ds.map_batches(
        lambda df: df[df[id_col].astype(str).str.startswith("as:")].reset_index(drop=True),
        batch_format="pandas",
    )
    avalon = ds.map_batches(
        lambda df: df[~df[id_col].astype(str).str.startswith("as:")].reset_index(drop=True),
        batch_format="pandas",
    )
    return aspace, avalon


def publish_docs(ds, root: str, system: str, run_stamp: str) -> str:
    """Write a doc Dataset under the dated layout
    ``{root}/{YYYY}/{system}/{run_stamp}/part-*.parquet`` and commit a run
    manifest LAST (readers treat a run without ``_MANIFEST.json`` as
    unpublished). ``run_stamp`` like ``2026-08-17_0301`` is pinned by the
    caller (never wall clock inside the pipeline — determinism)."""
    year = run_stamp[:4]
    out_dir = os.path.join(root, year, system, run_stamp)
    mpath = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(mpath):  # already published — idempotent short-circuit
        return out_dir
    tmp = os.path.join(root, f".publish-{uuid.uuid4().hex[:8]}")
    ds.write_parquet(tmp)
    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    if os.path.isdir(out_dir):
        # manifest-less leftovers of a crashed publish of this run_stamp:
        # unpublished by definition (readers require the manifest) — replace
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    manifest = {
        "system": system,
        "run_stamp": run_stamp,
        "files": sorted(os.listdir(out_dir)),
        "status": "published",
    }
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    return out_dir


def list_published_runs(root: str, system: str) -> list[str]:
    runs = []
    if not os.path.isdir(root):
        return runs
    for year in sorted(os.listdir(root)):
        sysdir = os.path.join(root, year, system)
        if not os.path.isdir(sysdir):
            continue
        for stamp in sorted(os.listdir(sysdir)):
            if os.path.exists(os.path.join(sysdir, stamp, "_MANIFEST.json")):
                runs.append(os.path.join(sysdir, stamp))
    return runs
