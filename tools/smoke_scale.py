"""Reproducible scale smokes: corpus gen (Ray-parallel) + index build +
reshard + optional query-entry timing at configurable doc counts.

Usage:
    python tools/smoke_scale.py build   [n_docs] [object_store_gb]
    python tools/smoke_scale.py reshard [n_docs]
    python tools/smoke_scale.py dedup   [n_docs] [hash_kind md5|fast]
    python tools/smoke_scale.py ann     [n_vecs]

These are the scripts behind the numbers in SCALE.md / BASELINE.md — run
them to reproduce (expect ±40% VM drift per CLAUDE.md; best-of-N yourself).
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


def _init(store_gb: float = 0.0):
    kw = {"object_store_memory": int(store_gb * 2**30)} if store_gb else {}
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _corpus(n_docs: int) -> str:
    from archivesspace_virgo_ray.corpus import write_corpus_sharded

    d = f"/tmp/avr_smoke_corpus_{n_docs}"
    if not os.path.exists(d + "/_DONE"):
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.time()
        write_corpus_sharded(d, n_docs, seed=5)
        open(d + "/_DONE", "w").close()
        print(f"gen {time.time() - t0:.1f}s", flush=True)
    return d


def smoke_build(n_docs: int, store_gb: float) -> None:
    from archivesspace_virgo_ray.index.build import BuildConfig, build_index

    _init(store_gb)
    corpus = _corpus(n_docs)
    idx = f"/tmp/avr_smoke_idx_{n_docs}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    stats = build_index(corpus, idx, BuildConfig(batch_size=2000),
                        resume=False)
    dt = time.time() - t0
    print(f"n_docs={n_docs} store_gb={store_gb or 'default'} "
          f"build={dt:.1f}s docs_per_sec={stats['n_docs'] / dt:.0f} "
          f"postings={stats['n_postings']} layout="
          f"{stats['n_shards']}x{stats['n_buckets']}", flush=True)
    shutil.rmtree(idx, ignore_errors=True)
    ray.shutdown()


def smoke_reshard(n_docs: int) -> None:
    from archivesspace_virgo_ray.index.build import BuildConfig, build_index
    from archivesspace_virgo_ray.index.reshard import (
        reshard_index,
        segments_equal,
    )

    _init()
    corpus = _corpus(n_docs)
    a, b, c = (f"/tmp/avr_smoke_rs_{n_docs}_{x}" for x in "abc")
    for d in (a, b, c):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.time()
    build_index(corpus, a, BuildConfig(n_shards=8, n_buckets=8,
                                       batch_size=2000), resume=False)
    t_build = time.time() - t0
    t0 = time.time()
    reshard_index(a, b, n_shards=4, n_buckets=16)
    t_rs = time.time() - t0
    t0 = time.time()
    build_index(corpus, c, BuildConfig(n_shards=4, n_buckets=16,
                                       batch_size=2000), resume=False)
    t_rb = time.time() - t0
    same = segments_equal(b, c)
    print(f"n_docs={n_docs} build_8x8={t_build:.1f}s reshard={t_rs:.1f}s "
          f"rebuild_4x16={t_rb:.1f}s byte_identical={same}", flush=True)
    for d in (a, b, c):
        shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()


def smoke_dedup(n_docs: int, hash_kind: str) -> None:
    """minhash_pairs at scale: corpus + ~10% injected near-dups. The injected
    dup keeps ~97% of the original shingles (one token appended per ~30-token
    tail trim), so it lands above the 0.7 Jaccard verify threshold."""
    import pyarrow as pa

    from archivesspace_virgo_ray.pipelines.dedup import minhash_pairs

    _init()
    corpus = _corpus(n_docs)
    ds = ray.data.read_parquet(corpus, columns=["repo", "path", "content"])

    def inject(t: pa.Table) -> pa.Table:
        import hashlib as _h

        import numpy as np

        txt = t["content"].to_pylist()
        keys = [f"{r}:{p}" for r, p in zip(t["repo"].to_pylist(),
                                           t["path"].to_pylist())]
        ids = [int.from_bytes(_h.md5(k.encode()).digest()[:8], "big") >> 1
               for k in keys]
        out_ids, out_txt = list(ids), list(txt)
        for i in range(0, len(txt), 10):  # ~10% near-dups
            out_ids.append(ids[i] ^ 0x5A5A)
            out_txt.append(txt[i] + " injected_dup_marker")
        return pa.table({"doc_id": pa.array(np.asarray(out_ids, np.int64)),
                         "text": pa.array(out_txt, pa.string())})

    docs = ds.map_batches(inject, batch_format="pyarrow").materialize()
    n = docs.count()
    t0 = time.time()
    pairs = minhash_pairs(docs, threshold=0.7, hash_kind=hash_kind)
    import pandas as pd

    n_pairs = len(pairs) if isinstance(pairs, pd.DataFrame) else pairs.count()
    dt = time.time() - t0
    print(f"n_docs={n} hash_kind={hash_kind} pairs={n_pairs} "
          f"minhash_pairs={dt:.1f}s docs_per_sec={n / dt:.0f}", flush=True)
    ray.shutdown()


def smoke_ann(n_vecs: int, dim: int = 64) -> None:
    """Deterministic IVF/PQ twins at scale: N seeded random embeddings
    (sharded Ray gen), one query. Training touches only the md5-threshold
    sample (~4096 rows to the driver); assignment/encode/ADC stream. Recall
    is vs exact brute force over the same table."""
    import numpy as np
    import pyarrow as pa

    from archivesspace_virgo_ray.pipelines.similarity import (
        knn_brute_force, knn_ivf_det, knn_pq_det)

    _init()
    d = f"/tmp/avr_smoke_emb_{n_vecs}"
    if not os.path.exists(d + "/_DONE"):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        n_shards = max(1, n_vecs // 50_000)
        per = n_vecs // n_shards

        @ray.remote
        def gen(s: int) -> None:
            import pyarrow.parquet as pq
            rng = np.random.default_rng(1000 + s)
            n = per if s < n_shards - 1 else n_vecs - per * (n_shards - 1)
            mat = rng.standard_normal((n, dim))
            ids = np.arange(s * per, s * per + n, dtype=np.int64)
            pq.write_table(pa.table({
                "vec_id": pa.array(ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1)), dim),
            }), f"{d}/part-{s:04d}.parquet")

        t0 = time.time()
        ray.get([gen.remote(s) for s in range(n_shards)])
        open(d + "/_DONE", "w").close()
        print(f"gen {time.time() - t0:.1f}s", flush=True)
    ds = ray.data.read_parquet(d)
    q = ds.take(1)[0]["embedding"]
    q = np.asarray([q], dtype=np.float64)
    exact = set(knn_brute_force(ds, q, k=10, exclude_ids=[0])["vec_id"])
    # PQ's recall knob at scale is the ADC shortlist (gate-scale default 50
    # suits 500 vectors; ~1% of the corpus is the usual serving setting) and
    # code count; IVF needs no knob — probe 3/8 cells covers the neighbors.
    shortlist = max(50, n_vecs // 100)
    runs = (("ivf_det", lambda: knn_ivf_det(ds, q, k=10, exclude_ids=[0])),
            ("pq_det", lambda: knn_pq_det(ds, q, k=10, exclude_ids=[0],
                                          n_codes=16,
                                          shortlist=shortlist)))
    for name, fn in runs:
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        rec = len(exact & set(out["vec_id"])) / 10
        print(f"n_vecs={n_vecs} {name}={dt:.1f}s "
              f"vecs_per_sec={n_vecs / dt:.0f} recall@10={rec:.2f}",
              flush=True)
    ray.shutdown()


def smoke_maintain(n_docs: int) -> None:
    """Index lifecycle at scale: base build + 4 delta adds + deletes +
    replaces, then the two compaction strategies side by side — a tiered
    fold (cost ~ folded deltas) vs maintain's garbage-gated full merge +
    vacuum (cost ~ whole index). The printed ratio is the LSM claim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from archivesspace_virgo_ray.corpus import generate_corpus
    from archivesspace_virgo_ray.functions.hashing import doc_id_from_key
    from archivesspace_virgo_ray.index.build import BuildConfig, build_index
    from archivesspace_virgo_ray.index.fsck import fsck_index
    from archivesspace_virgo_ray.index.segments import read_stats
    from archivesspace_virgo_ray.index.update import (
        add_documents,
        delete_documents,
        maintain,
        tiered_merge,
    )

    _init()
    corpus = _corpus(n_docs)
    idx = f"/tmp/avr_smoke_mt_{n_docs}"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = BuildConfig(batch_size=2000)
    t0 = time.time()
    stats = build_index(corpus, idx, cfg, resume=False)
    cfg.n_shards, cfg.n_buckets = stats["n_shards"], stats["n_buckets"]
    t_build = time.time() - t0

    # 4 small delta generations with fresh keys
    n_delta = max(n_docs // 200, 500)
    t0 = time.time()
    deltas = []
    for i in range(4):
        t = generate_corpus(n_delta, seed=1000 + i)
        t = t.set_column(
            t.column_names.index("repo"), "repo",
            pa.array([f"delta{i}/{r}" for r in t["repo"].to_pylist()]))
        p = f"/tmp/avr_smoke_mt_delta{i}.parquet"
        pq.write_table(t, p)
        deltas.append(p)
        add_documents(p, idx, cfg)
    t_adds = time.time() - t0

    # delete ~1% of the base, replace one whole delta (same keys)
    first = next(
        os.path.join(r, f) for r, _d, fs in os.walk(corpus)
        for f in sorted(fs) if f.endswith(".parquet"))
    head = pq.read_table(first, columns=["repo", "path", "commit"])
    victims = doc_id_from_key(
        head["repo"].to_pylist(), head["path"].to_pylist(),
        head["commit"].to_pylist())[: max(n_docs // 100, 100)]
    t0 = time.time()
    delete_documents(idx, sorted(set(victims.tolist())))
    add_documents(deltas[0], idx, cfg, on_conflict="replace")
    t_mut = time.time() - t0

    t0 = time.time()
    fold = tiered_merge(idx, merge_factor=2)
    t_fold = time.time() - t0
    t0 = time.time()
    rep = maintain(idx, merge_factor=2, dead_ratio=0.001)
    t_maint = time.time() - t0
    ok = fsck_index(idx)["ok"]
    print(f"n_docs={n_docs} build={t_build:.1f}s adds4x{n_delta}={t_adds:.1f}s "
          f"del+repl={t_mut:.1f}s fold={t_fold:.1f}s "
          f"(rounds={len(fold['rounds'])}, seal={fold.get('seal')}) "
          f"maintain={t_maint:.1f}s (merged_pairs={rep['merged_pairs']}, "
          f"vacuum={rep.get('vacuum')}) fold/full={t_fold / max(t_maint, 1e-9):.2f} "
          f"n_docs_final={read_stats(idx)['n_docs']} fsck_ok={ok}", flush=True)
    shutil.rmtree(idx, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    if mode == "build":
        smoke_build(n, float(sys.argv[3]) if len(sys.argv) > 3 else 0.0)
    elif mode == "reshard":
        smoke_reshard(n)
    elif mode == "dedup":
        smoke_dedup(n, sys.argv[3] if len(sys.argv) > 3 else "md5")
    elif mode == "ann":
        smoke_ann(n)
    elif mode == "maintain":
        smoke_maintain(n)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
