"""Snippet extraction / highlighting."""

import pandas as pd

from archivesspace_virgo_ray.index.snippets import (
    attach_snippets,
    best_window,
    make_snippet,
)


def test_best_window_prefers_distinct_terms():
    toks = ["x"] * 30 + ["foo", "y", "bar"] + ["x"] * 30 + ["foo", "foo"]
    s, e = best_window(toks, {"foo", "bar"}, window=5)
    assert s <= 30 < 33 <= e  # the foo..bar window wins over the foo,foo one


def test_best_window_tie_earliest():
    toks = ["a", "q", "b", "c", "d", "e", "q", "f"]
    s, e = best_window(toks, {"q"}, window=3)
    assert s == 0  # both windows have one hit; earliest wins


def test_make_snippet_marks_and_ellipses():
    text = "alpha beta gamma delta needle epsilon zeta " + "pad " * 40
    out = make_snippet(text, "needle", window=5)
    assert "**needle**" in out
    assert out.endswith("…")
    assert "alpha" not in out or out.startswith("… ") is False


def test_make_snippet_empty_and_nohit():
    assert make_snippet("", "x") == ""
    out = make_snippet("just some words here", "absent")
    assert "**" not in out


def test_attach_snippets_end_to_end(ray_session, sf_dir):
    import os

    import ray.data

    from archivesspace_virgo_ray.index.build import BuildConfig, build_index
    from archivesspace_virgo_ray.index.query import LocalSearcher

    idx = "/tmp/snip_idx"
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    build_index(
        os.path.join(sf_dir, "documents.parquet"), idx,
        BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                    meta_cols=("lang",)),
        resume=False,
    )
    s = LocalSearcher(idx)
    q = "the data"
    hits = s.search(q, 5)
    res = pd.DataFrame(
        {"query_id": [0] * len(hits), "doc_id": [d for d, _ in hits],
         "score": [x for _, x in hits]}
    )
    corpus = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    out = attach_snippets(res, corpus, {0: q})
    assert len(out) == len(hits)
    assert all("**" in sn for sn in out["snippet"])  # every top doc highlights
