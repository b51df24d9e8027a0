"""corpus_version_diff: planted ids exercising each status exactly once."""

import pyarrow as pa
import pyarrow.parquet as pq

from archivesspace_virgo_ray.pipelines.queries import (
    DIFF_CLONE,
    DIFF_DROP,
    DIFF_EDIT,
    corpus_version_diff,
)


def test_all_four_statuses(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir(parents=True)
    # id 1: untouched -> unchanged
    # id DIFF_EDIT: edited in B -> changed
    # id DIFF_DROP: dropped from B -> removed
    # id DIFF_CLONE: kept AND cloned to +offset -> unchanged + added
    ids = [1, DIFF_EDIT, DIFF_DROP, DIFF_CLONE]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"doc {i}" for i in ids], pa.string()),
    }), str(d / "documents.parquet"))
    out = corpus_version_diff(str(d))
    got = dict(zip(out["status"], out["n_docs"]))
    assert got == {"added": 1, "changed": 1, "removed": 1, "unchanged": 2}
