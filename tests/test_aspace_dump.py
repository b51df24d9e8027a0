"""ArchivesSpace REST-dump ingestion: the reference's own fixtures flow
dump → dims → build_solr_docs and reproduce the ASpaceAccessionTest field
bag (ASpaceAccessionTest.java:36-56 analog, now through the REAL dump→dims
step instead of hand-built dims)."""

import json
import os
import shutil

import pytest

from archivesspace_virgo_ray.pipelines.docbuilder import build_solr_docs
from archivesspace_virgo_ray.sources.aspace_dump import (
    load_aspace_dump,
    normalize_record,
)

FIXTURE_DIR = "/root/reference/src/test/resources"


def _dump_with_fixtures(tmp_path, extra=()):
    d = tmp_path / "dump"
    d.mkdir()
    for f in ("accession0.json", "repository0.json"):
        src = os.path.join(FIXTURE_DIR, f)
        if not os.path.exists(src):
            pytest.skip("reference fixtures unavailable")
        shutil.copy(src, d / f)
    for i, obj in enumerate(extra):
        (d / f"extra{i}.json").write_text(json.dumps(obj))
    return str(d)


def test_accession0_end_to_end_through_dump(ray_session, tmp_path):
    records, dims = load_aspace_dump(_dump_with_fixtures(tmp_path))
    # repository0.json landed in dims
    assert dims.repositories == {
        "/repositories/3":
        "Albert and Shirley Small Special Collections Library"}
    docs, errors = build_solr_docs(records, dims, now_year=2026)
    df = docs.to_pandas().sort_values("pos", ignore_index=True)
    assert errors.to_pandas().empty
    by_field = {}
    for _, r in df.iterrows():
        by_field.setdefault(r["field"], []).append(r["value"])
    # the reference test's assertion: exactly one id == as:0a0
    assert by_field["id"] == ["as:0a0"]
    assert by_field["shadowed_location_facet"] == ["HIDDEN"]
    assert by_field["call_number_facet"] == ["ViU-2018-0013"]
    assert by_field["source_facet"] == ["ArchivesSpace"]
    assert by_field["format_facet"] == ["Manuscript/Archive"]
    acc = json.load(open(os.path.join(FIXTURE_DIR, "accession0.json")))
    assert by_field["main_title_display"] == [acc["title"]]
    assert by_field["note_text"] == [acc["content_description"]]
    assert df["pos"].dtype == "int64"  # the round-4 hash-red class


def test_rich_dump_resolves_all_dim_families(ray_session, tmp_path):
    """A published resource whose refs span every dim family: repository,
    subject, agent, top_container, digital-object-free tree children."""
    extra = [
        {"jsonmodel_type": "repository", "uri": "/repositories/9",
         "name": "Albert and Shirley Small Special Collections Library"},
        {"jsonmodel_type": "subject", "uri": "/subjects/1",
         "title": "Papers", "publish": True},
        {"jsonmodel_type": "agent_person", "uri": "/agents/people/1",
         "publish": True,
         "names": [{"sort_name": "Wilson, James Southall"}]},
        {"jsonmodel_type": "top_container", "uri": "/repositories/9/top_containers/7",
         "display_string": "Box 1", "barcode": "X0007"},
        {"jsonmodel_type": "archival_object", "uri": "/repositories/9/archival_objects/2",
         "publish": True,
         "resource": {"ref": "/repositories/9/resources/1"},
         "instances": [{"sub_container": {"top_container":
                        {"ref": "/repositories/9/top_containers/7"}}}]},
        {"jsonmodel_type": "resource", "uri": "/repositories/9/resources/1",
         "lock_version": 4, "title": "The Papers", "publish": True,
         "suppressed": False, "id_0": "MSS", "id_1": "99",
         "collection_management": {"processing_status": "completed"},
         "repository": {"ref": "/repositories/9"},
         "subjects": [{"ref": "/subjects/1"}],
         "linked_agents": [{"ref": "/agents/people/1", "role": "creator"}],
         "extents": [{"number": "2", "extent_type": "cubic_feet"}],
         "dates": [{"expression": "1907"}]},
    ]
    records, dims = load_aspace_dump(_dump_with_fixtures(tmp_path, extra))
    # the archival-object tree got wired: resource → its child
    assert "/repositories/9/resources/1" in dims.published_resource_uris
    docs, errors = build_solr_docs(records, dims, now_year=2026)
    df = docs.to_pandas()
    assert errors.to_pandas().empty
    res = df.loc[df["doc_id"] == "as:9r1"]
    bag = {}
    for _, r in res.sort_values("pos").iterrows():
        bag.setdefault(r["field"], []).append(r["value"])
    assert bag["shadowed_location_facet"] == ["VISIBLE"]
    assert bag["library_facet"] == ["Special Collections"]
    assert bag["subject_facet"] == ["Papers"]
    assert bag["author_facet"] == ["Wilson, James Southall"]
    assert bag["extent_display"] == ["2 cubic feet"]
    assert bag["date_display"] == ["1907"]
    # the container reached the holdings via the TREE child's instance
    holding = json.loads(bag["special_collections_holding_display"][0])
    assert holding and holding[0]["barcode"] == "X0007"
    assert holding[0]["call_number"] == "MSS-99 Box 1"


def test_normalize_record_nested_shapes():
    raw = {
        "jsonmodel_type": "accession", "uri": "/repositories/1/accessions/2",
        "lock_version": 0, "publish": True, "suppressed": False,
        "subjects": [{"ref": "/subjects/5"}],
        "linked_agents": [{"ref": "/agents/people/3", "role": "creator",
                           "relator": "aut"}],
        "instances": [{"sub_container": {"top_container": {"ref": "/tc/1"}},
                       "digital_object": {"ref": "/do/2"}}],
        "related_resources": [{"ref": "/repositories/1/resources/9"}],
    }
    rec = normalize_record(raw)
    assert rec["subjects"] == ["/subjects/5"]
    assert rec["linked_agents"] == [{"ref": "/agents/people/3",
                                     "role": "creator"}]
    assert rec["instances"] == [{"top_container_ref": "/tc/1",
                                 "digital_object_ref": "/do/2"}]
    assert rec["related_resources"] == ["/repositories/1/resources/9"]


def test_ingest_cli_end_to_end(ray_session, tmp_path):
    """`cli ingest` drives dump → docbuilder → parquet with a JSON summary."""
    import json as _json

    import pyarrow.dataset as pads

    from archivesspace_virgo_ray import cli

    dump = _dump_with_fixtures(tmp_path)
    out = str(tmp_path / "out")
    rc = cli.main(["ingest", "--dump", dump, "--out", out])
    assert rc == 0
    # embedding contract: the CLI must NOT tear down a Ray session it did
    # not create — a stray shutdown here leaves every cached actor handle
    # in the suite pointing at a dead cluster (segfaults in _raylet)
    import ray as _ray

    assert _ray.is_initialized()
    docs = pads.dataset(out + "/docs").to_table().to_pandas()
    assert (docs.loc[docs["field"] == "id", "value"] == "as:0a0").all()
    assert docs["pos"].dtype == "int64"
    assert not (tmp_path / "out" / "errors").exists()  # no errors emitted
