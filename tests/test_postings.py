"""Round-trip + property tests for the varbyte / block posting codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from archivesspace_virgo_ray.index.postings import (
    BLOCK_SIZE,
    decode_posting_list,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(vals)) == vals).all()


def test_varbyte_empty():
    assert varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr)) == arr).all()


def _mk_postings(n, seed=0):
    rng = np.random.default_rng(seed)
    docs = np.sort(rng.choice(np.arange(0, 10 * n + 1, dtype=np.int64), n, replace=False))
    tfs = rng.integers(1, 50, n).astype(np.int64)
    dls = rng.integers(1, 4000, n).astype(np.int64)
    return docs, tfs, dls


def test_posting_list_roundtrip_multi_block():
    n = 3 * BLOCK_SIZE + 17
    docs, tfs, dls = _mk_postings(n, seed=1)
    payload, table = encode_posting_list(docs, tfs, dls)
    d2, t2, l2 = decode_posting_list(payload, table)
    assert (d2 == docs).all() and (t2 == tfs).all() and (l2 == dls).all()
    # block metadata correct
    assert table["last_doc"][-1] == docs[-1]
    assert table["n"].sum() == n
    assert table["max_tf"][0] == tfs[:BLOCK_SIZE].max()
    assert table["min_dl"][0] == dls[:BLOCK_SIZE].min()


def test_posting_list_partial_decode():
    n = 5 * BLOCK_SIZE
    docs, tfs, dls = _mk_postings(n, seed=2)
    payload, table = encode_posting_list(docs, tfs, dls)
    mask = np.array([False, True, False, True, False])
    d2, t2, l2 = decode_posting_list(payload, table, mask)
    expect = np.concatenate([docs[BLOCK_SIZE : 2 * BLOCK_SIZE], docs[3 * BLOCK_SIZE : 4 * BLOCK_SIZE]])
    assert (d2 == expect).all()
    assert len(t2) == 2 * BLOCK_SIZE and len(l2) == 2 * BLOCK_SIZE


def test_posting_list_single():
    payload, table = encode_posting_list(
        np.array([42]), np.array([3]), np.array([100])
    )
    d2, t2, l2 = decode_posting_list(payload, table)
    assert d2.tolist() == [42] and t2.tolist() == [3] and l2.tolist() == [100]


def test_compression_is_compact():
    # dense small deltas should take ~1-2 bytes per doc id
    docs = np.arange(0, 10000, 2, dtype=np.int64)
    tfs = np.ones(len(docs), dtype=np.int64)
    dls = np.full(len(docs), 100, dtype=np.int64)
    payload, _ = encode_posting_list(docs, tfs, dls)
    assert len(payload) < len(docs) * 5
