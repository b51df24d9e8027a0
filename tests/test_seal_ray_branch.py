"""The termstats seal has two paths with identical output layout: a driver
pandas reduction (small vocab) and a Ray Data groupby shuffle (code-corpus
vocab scale). The Ray branch must produce byte-equivalent CONTENT — forcing
it via the size threshold and comparing against the driver-sealed index is
the only way to keep the 100-TB path honest at test scale."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import archivesspace_virgo_ray.index.build as build_mod
from archivesspace_virgo_ray.index.build import BuildConfig, build_index, termstats_dir


def _docs_table():
    rng = np.random.default_rng(21)
    vocab = [f"tok{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(20, 60)))
        for _ in range(200)
    ]
    return pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _read_termstats(idx: str) -> pd.DataFrame:
    import glob
    import os

    parts = []
    for f in glob.glob(os.path.join(termstats_dir(idx), "bucket=*", "*.parquet")):
        bucket = int(f.split("bucket=")[1].split("/")[0])
        d = pq.read_table(f).to_pandas()
        d["bucket"] = bucket
        parts.append(d)
    out = pd.concat(parts, ignore_index=True)
    cols = ["bucket", "term", "df", "cf", "max_tf", "min_dl"]
    return out[cols].sort_values(["bucket", "term"], ignore_index=True)


def test_ray_groupby_seal_matches_driver_seal(ray_session, tmp_path, monkeypatch):
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(), docs_path)
    cfg = dict(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
               meta_cols=())

    a = str(tmp_path / "driver_seal")
    build_index(docs_path, a, BuildConfig(**cfg), resume=False)
    ts_a = _read_termstats(a)

    monkeypatch.setattr(build_mod, "_SEAL_DRIVER_MAX_BYTES", 0)
    b = str(tmp_path / "ray_seal")
    build_index(docs_path, b, BuildConfig(**cfg), resume=False)
    ts_b = _read_termstats(b)

    pd.testing.assert_frame_equal(
        ts_a, ts_b.astype(ts_a.dtypes.to_dict()), check_like=False
    )

    # and query results are identical through the Ray-sealed stats
    from archivesspace_virgo_ray.index.query import LocalSearcher

    qa = LocalSearcher(a).search("tok1 tok42 tok7", 10)
    qb = LocalSearcher(b).search("tok1 tok42 tok7", 10)
    assert qa == qb and len(qa) == 10
