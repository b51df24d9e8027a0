"""Tests: dated publish layout (K6), system routing (M20), audio stage."""

import os

import numpy as np
import pandas as pd
import pytest

from archivesspace_virgo_ray.pipelines.publish import (
    list_published_runs,
    publish_docs,
    route_by_system,
)


def test_route_by_system(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": ["as:3r754", "avalon:1", "as:1a1"], "v": [1, 2, 3]})
    a, b = route_by_system(ray.data.from_pandas(df))
    assert sorted(a.to_pandas()["doc_id"]) == ["as:1a1", "as:3r754"]
    assert b.to_pandas()["doc_id"].tolist() == ["avalon:1"]


def test_publish_dated_layout(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "pub")
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ["as:1"], "v": [1]}))
    out = publish_docs(ds, root, "aspace", "2026-08-17_0301")
    assert out.endswith("2026/aspace/2026-08-17_0301")
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))
    runs = list_published_runs(root, "aspace")
    assert runs == [out]
    # unpublished (no manifest) runs are invisible
    os.remove(os.path.join(out, "_MANIFEST.json"))
    assert list_published_runs(root, "aspace") == []


def test_audio_stage(ray_session):
    import ray.data

    import numpy as np

    from archivesspace_virgo_ray.functions.wav import decode_wav, encode_wav
    from archivesspace_virgo_ray.pipelines.multimodal import (
        AudioFeatureStage,
        RealDecodeUnavailable,
        synthesize_audio_table,
    )

    tbl = synthesize_audio_table(10)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(AudioFeatureStage, batch_format="pyarrow", batch_size=4,
                     concurrency=2, num_cpus=1)
        .to_pandas()
    )
    assert len(out) == 10
    assert all(len(f) == AudioFeatureStage.FEATURE_DIM for f in out["feature"])
    # WAV round-trips exactly through the pure-Python codec
    samples = np.arange(-500, 500, dtype=np.int16).reshape(-1, 2)
    rate, back = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and np.array_equal(back, samples)
    # duration lands in the feature vector (feature 0 scales with n/rate)
    stage = AudioFeatureStage()
    s1 = stage._decode(encode_wav(np.zeros(8000, np.int16), 8000), "audio/wav")
    s2 = stage._decode(encode_wav(np.zeros(16000, np.int16), 8000), "audio/wav")
    assert abs(s1[0] - 1 / 60) < 1e-9 and abs(s2[0] - 2 / 60) < 1e-9
    # compressed codecs remain the marked stub
    with pytest.raises(RealDecodeUnavailable):
        stage._decode(b"x", "audio/mpeg")


def test_publish_retry_is_idempotent(tmp_path, ray_session):
    """Crash between data landing and manifest write: retrying the same
    run_stamp must succeed (replace the manifest-less leftovers); retrying a
    COMPLETED publish short-circuits without rewriting."""
    import os

    import pandas as pd
    import ray.data

    from archivesspace_virgo_ray.pipelines.publish import (
        list_published_runs,
        publish_docs,
    )

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1, 2], "v": ["a", "b"]}))
    root = str(tmp_path / "pub")
    out = publish_docs(ds, root, "aspace", "2026-08-17_0300")
    # simulate the crash: remove the manifest, leaving data files behind
    os.remove(os.path.join(out, "_MANIFEST.json"))
    assert list_published_runs(root, "aspace") == []
    out2 = publish_docs(ds, root, "aspace", "2026-08-17_0300")
    assert out2 == out and list_published_runs(root, "aspace") == [out]
    # completed publish: retry is a no-op short-circuit
    mtime = os.path.getmtime(os.path.join(out, "_MANIFEST.json"))
    assert publish_docs(ds, root, "aspace", "2026-08-17_0300") == out
    assert os.path.getmtime(os.path.join(out, "_MANIFEST.json")) == mtime


def test_publish_to_remote_filesystem(tmp_path, ray_session):
    """K6 remote leg: publish through an explicit pyarrow FileSystem — the
    no-atomic-rename protocol an object store (S3) requires: parts land
    under the run prefix, the manifest write IS the commit. LocalFileSystem
    stands in for S3 (fsspec memory:// is per-process, so Ray workers can't
    share it); the code path is the remote one either way."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data
    from pyarrow.fs import LocalFileSystem

    from archivesspace_virgo_ray.pipelines.publish import (
        list_published_runs,
        publish_docs,
    )

    fs = LocalFileSystem()
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3], "v": ["a", "b", "c"]}))
    root = f"{tmp_path}/bucket/solr-docs"
    out = publish_docs(ds, root, "avalon", "2026-08-17_0400", filesystem=fs)
    assert out == f"{root}/2026/avalon/2026-08-17_0400"
    assert list_published_runs(root, "avalon", filesystem=fs) == [out]
    # data round-trips through the remote store
    import json as _json  # noqa: F401

    with fs.open_input_stream(f"{out}/_MANIFEST.json") as f:
        manifest = _json.loads(f.read().decode())
    assert manifest["status"] == "published" and manifest["files"]
    back = pq.read_table(f"{out}/{manifest['files'][0]}", filesystem=fs)
    assert back.num_rows == 3
    # idempotent retry on the remote side too
    assert publish_docs(ds, root, "avalon", "2026-08-17_0400", filesystem=fs) == out
    # crash-retry must NOT accumulate the failed attempt's part files
    # (regression: the manifest listed old + new parts, duplicating rows)
    fs.delete_file(f"{out}/_MANIFEST.json")
    out3 = publish_docs(ds, root, "avalon", "2026-08-17_0400", filesystem=fs)
    with fs.open_input_stream(f"{out3}/_MANIFEST.json") as f:
        m3 = _json.loads(f.read().decode())
    total = sum(
        pq.read_table(f"{out3}/{name}", filesystem=fs).num_rows
        for name in m3["files"]
    )
    assert total == 3
