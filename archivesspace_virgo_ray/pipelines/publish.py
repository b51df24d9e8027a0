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


def publish_docs(ds, root: str, system: str, run_stamp: str, filesystem=None) -> str:
    """Write a doc Dataset under the dated layout
    ``{root}/{YYYY}/{system}/{run_stamp}/part-*.parquet`` and commit a run
    manifest LAST (readers treat a run without ``_MANIFEST.json`` as
    unpublished). ``run_stamp`` like ``2026-08-17_0301`` is pinned by the
    caller (never wall clock inside the pipeline — determinism).

    ``filesystem``: an optional ``pyarrow.fs.FileSystem`` for a REMOTE root
    (S3 and friends — the reference's TransferManager upload leg,
    IndexRecordsForV4.java:101-114). Remote object stores have no atomic
    rename, so the commit protocol degrades gracefully: parts land directly
    under the run prefix and the manifest write IS the publish — readers
    (``list_published_runs``) never see a half-written run either way.

    Concurrency contract (remote path): ONE writer per run_stamp at a time
    (the reference's indexer is a single scheduled job; retries are
    sequential). Object stores offer no atomic check-and-put, so two
    concurrent publishers of the SAME run_stamp could interleave the
    leftover-cleanup and the manifest write; different run_stamps are
    always safe."""
    if filesystem is not None:
        return _publish_docs_fs(ds, root, system, run_stamp, filesystem)
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


def _publish_docs_fs(ds, root: str, system: str, run_stamp: str, fs) -> str:
    """Remote-FS publish: parts → run prefix, manifest last (= the commit)."""
    from pyarrow.fs import FileSelector, FileType

    year = run_stamp[:4]
    out_dir = f"{root}/{year}/{system}/{run_stamp}"
    mpath = f"{out_dir}/_MANIFEST.json"
    if fs.get_file_info(mpath).type != FileType.NotFound:
        return out_dir  # already published — idempotent short-circuit
    # leftovers of a crashed attempt are manifest-less (unpublished) and
    # MUST be cleared: a retry writes parts under fresh unique names, and a
    # manifest listing old + new files would publish every row twice
    if fs.get_file_info(out_dir).type == FileType.Directory:
        fs.delete_dir(out_dir)
    ds.write_parquet(out_dir, filesystem=fs)
    files = sorted(
        info.path.rsplit("/", 1)[-1]
        for info in fs.get_file_info(FileSelector(out_dir))
        if info.type == FileType.File
    )
    manifest = {
        "system": system,
        "run_stamp": run_stamp,
        "files": files,
        "status": "published",
    }
    with fs.open_output_stream(mpath) as f:
        f.write(json.dumps(manifest).encode())
    return out_dir


def list_published_runs(root: str, system: str, filesystem=None) -> list[str]:
    if filesystem is not None:
        from pyarrow.fs import FileSelector, FileType

        runs = []
        sel = FileSelector(root, allow_not_found=True)
        for year_info in sorted(filesystem.get_file_info(sel), key=lambda i: i.path):
            sysdir = f"{year_info.path}/{system}"
            ssel = FileSelector(sysdir, allow_not_found=True)
            for stamp in sorted(filesystem.get_file_info(ssel), key=lambda i: i.path):
                m = f"{stamp.path}/_MANIFEST.json"
                if filesystem.get_file_info(m).type == FileType.File:
                    runs.append(stamp.path)
        return runs
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
