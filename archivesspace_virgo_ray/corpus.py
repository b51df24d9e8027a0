"""Deterministic synthetic code corpus ``(repo, path, commit, lang, content)``.

This is the BASELINE.json ``input_hint`` table, generated locally (no external
data). Properties required by the engine's tests/bench (SURVEY.md §7.1):

- seeded & deterministic (same seed -> byte-identical parquet content);
- Zipfian term distribution with deliberate head terms (``the``, ``def``,
  ``license``, ``return``...) so head-term skew / salting is exercised;
- planted needle terms in known rows for exact-match assertions;
- per-row uniqueness of (repo, path, commit).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HEAD_TERMS = ["the", "def", "return", "license", "import", "self", "if", "for"]
LANGS = ["py", "java", "js", "go", "rs", "md"]
LANG_EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "rs": "rs", "md": "md"}

# ~1.6k distinct identifier-ish vocabulary terms, deterministic.
_STEMS = [
    "parse", "index", "token", "batch", "shard", "merge", "query", "score",
    "record", "field", "value", "stream", "block", "posting", "segment", "doc",
    "read", "write", "hash", "sort", "filter", "map", "reduce", "join", "group",
    "agg", "count", "sum", "split", "encode", "decode", "flush", "commit",
    "buffer", "cache", "client", "server", "config", "error", "retry", "state",
]
VOCAB = [f"{s}_{i}" for s in _STEMS for i in range(40)]

NEEDLE_FMT = "needle_{row}_xyzzy"  # planted in rows 0, 17, 401 (mod n)
NEEDLE_ROWS = (0, 17, 401)


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    n_repos: int = 16,
    min_tokens: int = 50,
    max_tokens: int = 1200,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.asarray(VOCAB, dtype=object)
    nv = len(vocab)
    # Zipfian ranks over the vocabulary.
    ranks = np.arange(1, nv + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    repos, paths, commits, langs, contents = [], [], [], [], []
    # repo weights ~ zipf too
    repo_probs = 1.0 / np.arange(1, n_repos + 1, dtype=np.float64)
    repo_probs /= repo_probs.sum()
    repo_idx = rng.choice(n_repos, size=n_docs, p=repo_probs)
    lang_idx = rng.choice(
        len(LANGS), size=n_docs, p=[0.35, 0.2, 0.15, 0.12, 0.1, 0.08]
    )
    n_tok = rng.integers(min_tokens, max_tokens + 1, size=n_docs)
    for i in range(n_docs):
        repo = f"repo{repo_idx[i]}"
        lang = LANGS[lang_idx[i]]
        path = (
            f"dir{rng.integers(0, 8)}/dir{rng.integers(0, 8)}/"
            f"file{i}.{LANG_EXT[lang]}"
        )
        commit = hashlib.sha256(f"{repo}:{seed}".encode()).hexdigest()[:40]
        toks = list(vocab[rng.choice(nv, size=n_tok[i], p=probs)])
        # sprinkle head terms at ~20% density
        n_head = int(0.2 * len(toks))
        head_pos = rng.choice(len(toks), size=n_head, replace=False)
        head_pick = rng.choice(len(HEAD_TERMS), size=n_head)
        for j, p_ in enumerate(head_pos):
            toks[p_] = HEAD_TERMS[head_pick[j]]
        if i in NEEDLE_ROWS:
            toks.append(NEEDLE_FMT.format(row=i))
        # light code-ish punctuation so the tokenizer has separators to chew on
        sep = rng.choice([" ", " ", " ", "\n", "(", ") ", "{ ", "} ", "."], size=len(toks))
        contents.append("".join(t + s for t, s in zip(toks, sep)))
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def generate_queries(seed: int = 42, k: int = 10) -> pa.Table:
    """Fixed reference query set: head terms, needles, multi-term, zero-hit."""
    qs = [
        "the",
        "license",
        "def return",
        "parse_0 index_1",
        "token_2 batch_3 shard_4",
        NEEDLE_FMT.format(row=0),
        NEEDLE_FMT.format(row=17),
        "zz_no_such_term_zz",
        "merge_5 the",
        "query_0 score_0 record_0 field_0",
        "stream_1",
        "block_9 posting_9",
        "segment_10 doc_10 read_10",
        "import self",
        "hash_33 license",
        "sort_7 filter_7 map_7 reduce_7",
        "join_21",
        "group_14 agg_14",
        "count_3 sum_3 split_3",
        "encode_11 decode_11 the def",
    ]
    return pa.table(
        {
            "query_id": pa.array(range(len(qs)), pa.int64()),
            "text": pa.array(qs, pa.string()),
            "k": pa.array([k] * len(qs), pa.int32()),
        }
    )


def write_corpus(
    out_dir: str, n_docs: int, seed: int = 42, rows_per_file: int = 20000
) -> str:
    """Write the corpus as a directory of parquet part files (splittable input)."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_corpus(n_docs, seed=seed)
    nfiles = max(1, (n_docs + rows_per_file - 1) // rows_per_file)
    for f in range(nfiles):
        part = tbl.slice(f * rows_per_file, rows_per_file)
        pq.write_table(part, os.path.join(out_dir, f"part-{f:05d}.parquet"))
    return out_dir


def write_corpus_sharded(
    out_dir: str, n_docs: int, seed: int = 42, rows_per_file: int = 25000
) -> str:
    """Parallel corpus writer for multi-million-doc smokes: each part file is
    generated by its own Ray task from a per-part derived seed, so generation
    scales with CPUs instead of a driver loop (the serial ``write_corpus``
    keeps its byte-exact output for the cached benchmark sizes). Same schema
    and statistical shape; content differs from the serial generator."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    nfiles = max(1, (n_docs + rows_per_file - 1) // rows_per_file)

    @ray.remote
    def gen_part(f: int) -> str:
        rows = min(rows_per_file, n_docs - f * rows_per_file)
        # derived seed: deterministic per (seed, part), disjoint streams
        part_seed = int(
            np.frombuffer(
                hashlib.sha256(f"{seed}:{f}".encode()).digest()[:8], dtype=np.uint64
            )[0] % np.uint64(2**31)
        )
        tbl = generate_corpus(rows, seed=part_seed)
        path = os.path.join(out_dir, f"part-{f:05d}.parquet")
        pq.write_table(tbl, path)
        return path

    ray.get([gen_part.remote(f) for f in range(nfiles)])
    return out_dir
