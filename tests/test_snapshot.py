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


def test_alias_blue_green_swap(ray_session, tmp_path):
    """Queries through an alias flip atomically between index generations;
    rollback is the same swap in reverse."""
    import pyarrow as pa

    from archivesspace_virgo_ray.index.alias import (
        get_pool_by_alias,
        resolve_alias,
        set_alias,
    )

    root = tmp_path
    for gen, text in (("blue", "alpha classic"), ("green", "alpha rebuilt")):
        corpus = root / f"c_{gen}"
        corpus.mkdir()
        pq.write_table(
            pa.table({
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([text]),
            }),
            str(corpus / "d.parquet"),
        )
        build_index(str(corpus), str(root / f"idx_{gen}"),
                    BuildConfig(n_shards=1, n_buckets=2, text_col="text",
                                id_col="doc_id", meta_cols=()), resume=False)

    q = pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": pa.array(["classic"]), "k": pa.array([5], pa.int32())})
    set_alias(str(root), "live", str(root / "idx_blue"))
    assert resolve_alias(str(root), "live").endswith("idx_blue")
    assert len(get_pool_by_alias(str(root), "live").topk(q)) == 1

    set_alias(str(root), "live", str(root / "idx_green"))  # blue-green swap
    assert len(get_pool_by_alias(str(root), "live").topk(q)) == 0  # no 'classic'
    q2 = pa.table({"query_id": pa.array([0], pa.int64()),
                   "text": pa.array(["rebuilt"]), "k": pa.array([5], pa.int32())})
    assert len(get_pool_by_alias(str(root), "live").topk(q2)) == 1

    set_alias(str(root), "live", str(root / "idx_blue"))  # rollback
    assert len(get_pool_by_alias(str(root), "live").topk(q)) == 1
    with pytest.raises(ValueError, match="not a directory"):
        set_alias(str(root), "live", str(root / "nope"))
