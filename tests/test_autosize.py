"""Auto-sized build shuffle: (n_shards, n_buckets) derived from input bytes
so no segment-writer task materializes more than ~256 MB of raw text."""

import os

from archivesspace_virgo_ray.index.build import (
    _TARGET_GROUP_BYTES,
    BuildConfig,
    auto_shards_buckets,
    build_index,
)


def test_auto_sizing_scales_with_bytes():
    # small corpus: CPU floor dominates (2 groups/core, 32 cores → 8×8)
    s, b = auto_shards_buckets(100 << 20, total_cpus=32)
    assert (s, b) == (8, 8)
    # 1 TB: bytes dominate; every group ≤ target after the 3× expansion
    s, b = auto_shards_buckets(1 << 40, total_cpus=32)
    assert (1 << 40) * 3.0 / (s * b) <= _TARGET_GROUP_BYTES
    # 100 TB: cluster-scale fan-out, shards a power of two
    s100, b100 = auto_shards_buckets(100 * (1 << 40), total_cpus=32)
    assert s100 & (s100 - 1) == 0 and s100 >= 512
    assert 100 * (1 << 40) * 3.0 / (s100 * b100) <= _TARGET_GROUP_BYTES
    # monotone: more bytes never means fewer groups
    prev = 0
    for gb in (1, 10, 100, 1000, 10000):
        s_, b_ = auto_shards_buckets(gb << 30, total_cpus=32)
        assert s_ * b_ >= prev
        prev = s_ * b_


def test_auto_config_build_and_query(tmp_path, ray_session, sf_dir):
    """A build with n_shards=None runs, records the chosen layout, and
    queries exactly like a fixed-config build."""
    from archivesspace_virgo_ray.index.query import LocalSearcher
    from archivesspace_virgo_ray.index.segments import read_stats

    src = os.path.join(sf_dir, "documents.parquet")
    idx_auto = str(tmp_path / "auto")
    idx_fixed = str(tmp_path / "fixed")
    stats = build_index(
        src, idx_auto,
        BuildConfig(n_shards=None, n_buckets=None, text_col="text",
                    id_col="doc_id", meta_cols=("lang",)),
        resume=False,
    )
    assert stats["n_shards"] >= 4 and stats["n_buckets"] >= 4
    assert read_stats(idx_auto)["n_shards"] == stats["n_shards"]
    build_index(
        src, idx_fixed,
        BuildConfig(n_shards=2, n_buckets=4, text_col="text",
                    id_col="doc_id", meta_cols=("lang",)),
        resume=False,
    )
    # sharding layout is invisible to results (W4 invariance)
    got = LocalSearcher(idx_auto).search("the data", 10)
    want = LocalSearcher(idx_fixed).search("the data", 10)
    assert got == want
