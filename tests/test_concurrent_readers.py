"""Readers never block and never observe a half-applied mutation.

The write path is single-writer (write.lock) but readers take NO lock.
Two guarantees under test, each hammered while a mutator thread runs the
full lifecycle (adds, tiered folds, deletes, full merge, maintain+vacuum):

1. **Scorer atomicity**: a freshly-constructed ShardScorer always reflects
   exactly one committed state of its shard — construction snapshots the
   marker set once, retries when a commit races it (_StaleIndexRead /
   FileNotFoundError), and once built is immune to concurrent rmtrees
   (mmapped inodes).
2. **Pool snapshot consistency**: get_pool's post-build signature
   validation means a served boolean match reflects ONE committed state
   across ALL shards, not a mix.

Committed states are computed up front on a twin index by running the
same op sequence sequentially.
"""

import os
import threading

import numpy as np
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.corpus import generate_corpus
from archivesspace_virgo_ray.functions.hashing import doc_id_from_key
from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.postings import decode_posting_list
from archivesspace_virgo_ray.index.query import ShardScorer, matching_doc_ids
from archivesspace_virgo_ray.index.update import (
    add_documents,
    delete_documents,
    maintain,
    merge_segments,
    tiered_merge,
)

CFG = dict(n_shards=2, n_buckets=4, batch_size=128)
# sentinel term present in every doc — its match set IS the visible corpus
SENTINEL = "the"


def _shard_ids(idx: str, shard: int) -> tuple:
    """Sentinel match ids for ONE shard via a fresh ShardScorer — the
    scorer-atomicity surface (exercises the construction race + retry)."""
    sc = ShardScorer(idx, shard)
    ids = []
    for _b, readers in sc.readers.items():
        for gen, reader in readers:
            e = reader.term_entry(SENTINEL)
            if e is None:
                continue
            docs, _tfs, _dls = decode_posting_list(e["payload"],
                                                   e["block_table"])
            mask = sc.masked_for_gen(gen)
            if mask is not None and len(mask):
                pos = np.searchsorted(mask, docs)
                ok = pos < len(mask)
                dead = np.zeros(len(docs), dtype=bool)
                dead[ok] = mask[pos[ok]] == docs[ok]
                docs = docs[~dead]
            ids.append(docs)
    out = np.sort(np.concatenate(ids)) if ids else np.empty(0, np.int64)
    return tuple(out.tolist())


def _ops(idx: str, src: str, victims: list[int]):
    """The mutation sequence, shared by the twin (sequential) run and the
    race run."""
    yield lambda: add_documents(os.path.join(src, "d1.parquet"), idx,
                                BuildConfig(**CFG))
    yield lambda: tiered_merge(idx, merge_factor=2, concurrency=2)
    yield lambda: add_documents(os.path.join(src, "d2.parquet"), idx,
                                BuildConfig(**CFG))
    yield lambda: delete_documents(idx, victims)
    yield lambda: merge_segments(idx, concurrency=2)
    yield lambda: add_documents(os.path.join(src, "d3.parquet"), idx,
                                BuildConfig(**CFG))
    yield lambda: maintain(idx, merge_factor=2, dead_ratio=0.001,
                           concurrency=2)


@pytest.fixture()
def corpus(tmp_path):
    full = generate_corpus(260, seed=23)
    base = full.slice(0, 200)
    src = tmp_path / "corp"
    src.mkdir()
    pq.write_table(base, str(src / "base.parquet"))
    for i, name in enumerate(("d1", "d2", "d3")):
        pq.write_table(full.slice(200 + 20 * i, 20),
                       str(src / f"{name}.parquet"))
    base_ids = doc_id_from_key(base["repo"].to_pylist(),
                               base["path"].to_pylist(),
                               base["commit"].to_pylist())
    victims = sorted(set(base_ids.tolist()))[:15]
    return str(src), victims


def _race(idx, src, victims, observe):
    """Run the op sequence in a thread while calling ``observe()`` from
    this thread; returns (observations, mutator_errors)."""
    mut_err: list[BaseException] = []

    def mutate():
        try:
            for op in _ops(idx, src, victims):
                op()
        except BaseException as e:  # pragma: no cover - failure detail
            mut_err.append(e)

    t = threading.Thread(target=mutate)
    t.start()
    observed = []
    try:
        while t.is_alive():
            observed.append(observe())
    finally:
        # always join: an observe() failure must not leave the mutator
        # racing pytest's tmp_path teardown (that cascade kills the
        # whole pytest process with no traceback)
        t.join()
    observed.append(observe())  # final state
    return observed, mut_err


def test_shard_scorers_observe_only_committed_states(tmp_path, corpus,
                                                     ray_session):
    src, victims = corpus
    twin = str(tmp_path / "twin")
    build_index(os.path.join(src, "base.parquet"), twin, BuildConfig(**CFG),
                resume=False)
    per_shard = {s: {_shard_ids(twin, s)} for s in range(CFG["n_shards"])}
    for op in _ops(twin, src, victims):
        op()
        for s in range(CFG["n_shards"]):
            per_shard[s].add(_shard_ids(twin, s))
    assert all(len(v) >= 4 for v in per_shard.values())

    idx = str(tmp_path / "race")
    build_index(os.path.join(src, "base.parquet"), idx, BuildConfig(**CFG),
                resume=False)

    def observe():
        return [(s, _shard_ids(idx, s)) for s in range(CFG["n_shards"])]

    observed, mut_err = _race(idx, src, victims, observe)
    assert not mut_err, mut_err
    flat = [(s, ids) for obs in observed for (s, ids) in obs]
    bad = [(s, ids) for s, ids in flat if ids not in per_shard[s]]
    assert not bad, f"{len(bad)}/{len(flat)} shard reads matched no committed state"
    assert len(flat) >= 10  # the reader actually raced the mutations
    # final state converged
    for s, ids in observed[-1]:
        assert ids == _shard_ids(twin, s)


def test_pool_matches_observe_one_state_across_shards(tmp_path, corpus,
                                                      ray_session):
    src, victims = corpus
    twin = str(tmp_path / "twin2")
    build_index(os.path.join(src, "base.parquet"), twin, BuildConfig(**CFG),
                resume=False)
    states = {tuple(matching_doc_ids(twin, SENTINEL, mode="or").tolist())}
    for op in _ops(twin, src, victims):
        op()
        states.add(tuple(matching_doc_ids(twin, SENTINEL, mode="or").tolist()))
    assert len(states) >= 4

    idx = str(tmp_path / "race2")
    build_index(os.path.join(src, "base.parquet"), idx, BuildConfig(**CFG),
                resume=False)

    def observe():
        return tuple(matching_doc_ids(idx, SENTINEL, mode="or").tolist())

    observed, mut_err = _race(idx, src, victims, observe)
    assert not mut_err, mut_err
    bad = [o for o in observed if o not in states]
    assert not bad, (
        f"{len(bad)}/{len(observed)} pool reads mixed states across shards")
    assert observed[-1] == tuple(matching_doc_ids(twin, SENTINEL,
                                                  mode="or").tolist())
