"""Index snapshot/restore: marker ordering, resume skips, bit-identical
query results after restore."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.query import LocalSearcher
from archivesspace_virgo_ray.index.snapshot import restore_index, snapshot_index


@pytest.fixture(scope="module")
def snap_env(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("snap")
    docs_path = str(root / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(range(300)), pa.int64()),
            "text": pa.array(
                [f"alpha beta gamma delta tok{i % 53} tok{i % 11}" for i in range(300)]
            ),
        }),
        docs_path,
    )
    idx = str(root / "idx")
    build_index(docs_path, idx,
                BuildConfig(n_shards=2, n_buckets=4, text_col="text",
                            id_col="doc_id", meta_cols=()), resume=False)
    return root, idx


def test_snapshot_restore_roundtrip(snap_env):
    root, idx = snap_env
    before = LocalSearcher(idx).search("alpha tok7", 10)
    snap = str(root / "snap1")
    r1 = snapshot_index(idx, snap)
    assert r1["n_segments"] == 8 and r1["skipped"] == 0
    # re-snapshot: everything skips (resume)
    r2 = snapshot_index(idx, snap)
    assert r2["skipped"] == 8
    # destroy the live index, restore elsewhere, query identical
    shutil.rmtree(idx)
    dest = str(root / "restored")
    assert restore_index(snap, dest)["n_segments"] == 8
    after = LocalSearcher(dest).search("alpha tok7", 10)
    assert after == before  # bit-identical scores and order


def test_restore_refuses_incomplete_snapshot(snap_env, tmp_path):
    root, _ = snap_env
    snap = str(root / "snap1")
    # simulate a crash-before-marker: copy the snapshot without the marker
    broken = str(tmp_path / "broken")
    shutil.copytree(snap, broken)
    os.remove(os.path.join(broken, "_SNAPSHOT_COMPLETE.json"))
    with pytest.raises(ValueError, match="incomplete snapshot"):
        restore_index(broken, str(tmp_path / "dest"))
    # and a non-empty target is refused
    full = tmp_path / "full"
    full.mkdir()
    (full / "x").write_text("y")
    with pytest.raises(ValueError, match="not empty"):
        restore_index(snap, str(full))
