"""End-to-end incremental reindex (§3.1 flagship entry point)."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.pipelines.docbuilder import DimTables
from archivesspace_virgo_ray.pipelines.reindex import run_incremental_reindex

REPO_NAME = "Albert and Shirley Small Special Collections Library"


def _record(uri, title="T", publish=True, **kw):
    base = dict(
        uri=uri, record_type="resource", lock_version=1, title=title,
        publish=publish, suppressed=False, content_description=None,
        id_0="MSS", id_1=uri.rsplit("/", 1)[-1], id_2=None, id_3=None,
        id_4=None, id_5=None, processing_status="completed",
        repository_ref="/repositories/3", subjects=None, linked_agents=None,
        extents=None, dates=[{"expression": "1994"}], notes=None,
        instances=[{"top_container_ref": "/tc/1", "digital_object_ref": None}],
        related_resources=None,
    )
    base.update(kw)
    return base


def test_run_incremental_reindex(ray_session, tmp_path):
    import ray.data

    records = pd.DataFrame(
        [
            _record("/repositories/3/resources/1"),       # dirty via update
            _record("/repositories/3/resources/2"),       # dirty via repo
            _record("/repositories/1/resources/3"),       # clean
            _record("/repositories/3/resources/4",
                    repository_ref="/repositories/404"),  # dirty + error path
        ]
    )
    updates = pd.DataFrame(
        [
            {"id": "/repositories/3/resources/1", "types": ["resource"],
             "user_mtime": pd.Timestamp("2026-01-02"), "ancestors": None,
             "related_accession_uris": None, "collection_uri_u_sstr": None},
            {"id": "/repositories/3", "types": ["repository"],
             "user_mtime": pd.Timestamp("2026-01-02"), "ancestors": None,
             "related_accession_uris": None, "collection_uri_u_sstr": None},
            {"id": "/repositories/3/resources/4", "types": ["resource"],
             "user_mtime": pd.Timestamp("2026-01-02"), "ancestors": None,
             "related_accession_uris": None, "collection_uri_u_sstr": None},
        ]
    )
    children = pd.DataFrame(
        [{"repo_ref": "/repositories/3", "child_ref": "/repositories/3/resources/2"}]
    )
    dims = DimTables(
        repositories={"/repositories/3": REPO_NAME},
        subjects={}, agents={},
        containers={"/tc/1": {"display_string": "Box 1", "barcode": "B1",
                              "room": None, "current_location": "L",
                              "uri": "/repositories/3/top_containers/1"}},
        digital_objects={}, manifests={}, use_rights={},
        published_resource_uris=set(),
    )
    report = run_incremental_reindex(
        ray.data.from_pandas(records),
        ray.data.from_pandas(updates),
        ray.data.from_pandas(children),
        dims,
        watermark=pd.Timestamp("2026-01-01"),
        now_year=2026,
        out_root=str(tmp_path / "out"),
        run_stamp="2026-08-17_0400",
    )
    assert report["dirty_refs"] == 3
    assert report["reindexed_docs"] == 2      # resources 1 and 2
    assert report["errors"] == 1              # unknown repo on resource 4
    assert report["exit_code"] == 1
    assert os.path.exists(os.path.join(report["docs_dir"], "_MANIFEST.json"))
    # MARC branch: only /repositories/3 refs, and only non-erroring builds
    marc_files = [f for f in os.listdir(report["marc_dir"]) if f.endswith(".parquet")]
    import pyarrow.parquet as pq_

    marc = pd.concat(
        [pq_.read_table(os.path.join(report["marc_dir"], f)).to_pandas() for f in marc_files],
        ignore_index=True,
    )
    assert set(marc["f001"].dropna()) >= {"as:3r1", "as:3r2"}


def test_explicit_ref_override(ray_session, tmp_path):
    import ray.data

    records = pd.DataFrame([_record("/repositories/3/resources/9")])
    dims = DimTables(
        repositories={"/repositories/3": REPO_NAME},
        subjects={}, agents={},
        containers={"/tc/1": {"display_string": "Box 1", "barcode": "B1",
                              "room": None, "current_location": "L",
                              "uri": "/repositories/3/top_containers/1"}},
        digital_objects={}, manifests={}, use_rights={},
        published_resource_uris=set(),
    )
    report = run_incremental_reindex(
        ray.data.from_pandas(records),
        None, None, dims,
        watermark=None, now_year=2026,
        out_root=str(tmp_path / "out"), run_stamp="2026-08-17_0401",
        explicit_refs=["/repositories/3/resources/9"],
    )
    assert report["reindexed_docs"] == 1 and report["exit_code"] == 0
