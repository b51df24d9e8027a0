"""Bloom filter primitive + the Bloom-composed incremental dedup entry."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from archivesspace_virgo_ray.state.bloom import BloomFilter


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200),
       st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(members, probes):
    b = BloomFilter(max(1, len(members)), fpr=0.01)
    m = np.asarray(members, dtype=np.uint64)
    b.add(m)
    got = b.contains(m)
    assert got.all()
    # a probe NOT in members may be True (fp) but a member is never False
    p = np.asarray(probes, dtype=np.uint64)
    res = b.contains(p)
    in_set = np.isin(p, m)
    assert res[in_set].all()


def test_bloom_fpr_is_sane():
    rng = np.random.default_rng(3)
    members = rng.integers(0, 2**63, 10_000, dtype=np.uint64)
    b = BloomFilter(len(members), fpr=0.01)
    b.add(members)
    probes = rng.integers(0, 2**63, 50_000, dtype=np.uint64)
    probes = probes[~np.isin(probes, members)]
    fpr = b.contains(probes).mean()
    assert fpr < 0.05  # target 1%, generous bound for hash luck


def test_bloom_distributed_merge_equals_single_build():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, 5_000, dtype=np.uint64)
    whole = BloomFilter(len(keys), fpr=0.01)
    whole.add(keys)
    merged = BloomFilter(len(keys), fpr=0.01)
    for chunk in np.array_split(keys, 7):
        part = BloomFilter(len(keys), fpr=0.01)
        part.add(chunk)
        merged.merge_bits(part.bits)
    assert np.array_equal(whole.bits, merged.bits)


def test_bloom_entry_matches_broadcast_entry(ray_session, tmp_path):
    from archivesspace_virgo_ray.pipelines.queries import (
        incremental_dedup_bloom,
        incremental_dedup_new_docs,
    )

    d = tmp_path / "sf"
    d.mkdir(parents=True, exist_ok=True)
    texts = [f"base {i}" for i in range(12)] + ["base 3", "twin", "twin"]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(15)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 15, pa.string()),
        "source": pa.array(["s"] * 15, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))
    a = incremental_dedup_new_docs(str(d))
    b = incremental_dedup_bloom(str(d))
    assert a.equals(b)
    assert b.set_index("doc_id")["status"].to_dict() == {
        12: "dup_of_base", 13: "new", 14: "dup_in_delta"}
