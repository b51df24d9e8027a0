"""Flagship doc builder (M3) — golden test mirroring ASpaceAccessionTest
(ASpaceAccessionTest.java:46-56: doc for accession0.json must have exactly one
id == "as:0a0") plus richer assertions over every field family."""

import json
import os

import pandas as pd
import pytest

from archivesspace_virgo_ray.pipelines.docbuilder import (
    DimTables,
    build_record_fields,
    build_solr_docs,
)

FIXTURE_DIR = "/root/reference/src/test/resources"

EMPTY_DIMS = DimTables(
    repositories={}, subjects={}, agents={}, containers={},
    digital_objects={}, manifests={}, use_rights={},
    published_resource_uris=set(),
)


def _dims(**kw):
    base = dict(
        repositories={"/repositories/0": "Albert and Shirley Small Special Collections Library"},
        subjects={}, agents={}, containers={}, digital_objects={},
        manifests={}, use_rights={}, published_resource_uris=set(),
    )
    base.update(kw)
    return DimTables(**base)


@pytest.fixture(scope="module")
def accession0():
    path = os.path.join(FIXTURE_DIR, "accession0.json")
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    raw = json.load(open(path))
    return {
        "uri": raw["uri"],
        "record_type": "accession",
        "lock_version": raw["lock_version"],
        "title": raw["title"],
        "publish": raw["publish"],
        "suppressed": raw["suppressed"],
        "content_description": raw["content_description"],
        **{f"id_{i}": raw.get(f"id_{i}") for i in range(6)},
        "processing_status": None,
        "repository_ref": raw["repository"]["ref"],
        "subjects": raw["subjects"],
        "linked_agents": raw["linked_agents"],
        "extents": raw["extents"],
        "dates": raw["dates"],
        "notes": None,
        "instances": raw["instances"],
        "related_resources": raw["related_resources"],
    }


def test_accession0_golden(accession0):
    pairs = build_record_fields(accession0, _dims(), now_year=2026)
    by_field = {}
    for f, v in pairs:
        by_field.setdefault(f, []).append(v)
    # the reference test's assertion
    assert by_field["id"] == ["as:0a0"]
    # accession with no containers is not published -> HIDDEN
    assert by_field["shadowed_location_facet"] == ["HIDDEN"]
    assert by_field["aspace_version_facet"] == ["1"]
    assert by_field["call_number_facet"] == ["ViU-2018-0013"]
    assert by_field["main_title_display"] == [accession0["title"]]
    assert by_field["source_facet"] == ["ArchivesSpace"]
    assert by_field["format_facet"] == ["Manuscript/Archive"]
    # shadowed -> no library/subject/extent/date fields
    for f in ("library_facet", "extent_display", "date_display", "subject_facet"):
        assert f not in by_field
    # content_description flows even when shadowed (ASpaceObject.java:471-475)
    assert by_field["note_text"] == [accession0["content_description"]]
    assert by_field["note_display"] == [accession0["content_description"]]
    assert by_field["online_url_display"] == [
        "https://archives.lib.virginia.edu/repositories/0/accessions/0"
    ]
    assert by_field["feature_facet"] == [
        "suppress_endnote_export", "suppress_refworks_export", "suppress_ris_export",
    ]


def test_visible_record_full_families():
    rec = {
        "uri": "/repositories/3/resources/754",
        "record_type": "resource",
        "lock_version": 2,
        "title": "The Papers",
        "publish": True,
        "suppressed": False,
        "content_description": None,
        "id_0": "MSS", "id_1": "123", "id_2": None, "id_3": None,
        "id_4": None, "id_5": None,
        "processing_status": "completed",
        "repository_ref": "/repositories/3",
        "subjects": ["/subjects/1", "/subjects/2"],
        "linked_agents": [
            {"ref": "/agents/people/1", "role": "creator"},
            {"ref": "/agents/people/2", "role": "subject"},
            {"ref": "/agents/people/404", "role": "creator"},  # NPE-skip
        ],
        "extents": [{"number": "28", "extent_type": "cubic_feet",
                     "container_summary": "28 boxes"}],
        "dates": [{"expression": "1907-1994"}, {"expression": "circa 1900"},
                  {"begin": "1900", "end": "1910"}],
        "notes": [{"type": "scopecontent", "publish": True,
                   "subnotes": [{"publish": True, "content": "scope!"}]}],
        "instances": [
            {"top_container_ref": "/tc/1", "digital_object_ref": None},
            {"top_container_ref": "/tc/2", "digital_object_ref": "/do/1"},
        ],
        "related_resources": None,
    }
    dims = _dims(
        repositories={"/repositories/3": "Albert and Shirley Small Special Collections Library"},
        subjects={"/subjects/1": {"title": "Maps", "publish": True},
                  "/subjects/2": {"title": "Secret", "publish": False}},
        agents={"/agents/people/1": {"title": "Wilson, J.", "publish": True},
                "/agents/people/2": {"title": "Other", "publish": True}},
        containers={
            "/tc/1": {"display_string": "Box 10", "barcode": None, "room": None,
                      "current_location": "L1",
                      "uri": "/repositories/3/top_containers/1"},
            "/tc/2": {"display_string": "Box 2", "barcode": "B2", "room": "R5",
                      "current_location": "L2",
                      "uri": "/repositories/3/top_containers/2"},
        },
        digital_objects={"/do/1": {"publish": True, "file_versions": [
            {"publish": True, "use_statement": "image-service",
             "file_uri": "http://mirador.lib/x?manifest=https://m/1"}]}},
        manifests={"https://m/1": {
            "at_id": "https://iiif/x/MSS123", "license": "cc0", "label": "MSS 123 item",
            "thumbnail": "https://iiif/x/full/200,/0/default.jpg",
            "json": '{"@id":"https://iiif/x/MSS123"}'}},
        use_rights={"cc0": {"statement": "free", "commercial_use": 1,
                            "educational_use": 1, "modifications": 0}},
    )
    pairs = build_record_fields(rec, dims, now_year=2026)
    by_field = {}
    for f, v in pairs:
        by_field.setdefault(f, []).append(v)

    assert by_field["shadowed_location_facet"] == ["VISIBLE"]
    assert by_field["library_facet"] == ["Special Collections"]
    assert by_field["subject_facet"] == ["Maps"]          # unpublished dropped
    assert by_field["author_facet"] == ["Wilson, J."]     # role+publish+NPE-skip
    assert by_field["extent_display"] == ["28 cubic feet (28 boxes)"]
    # dates: first parsed year = END year 1994; unparseable buckets >50y
    assert by_field["date_multisort_i"] == ["1994"]
    assert by_field["date_display"] == ["1907-1994", "circa 1900", "1900-1910"]
    assert "More than 50 years ago" in by_field["published_date_facet"]
    assert "Last 50 years" in by_field["published_date_facet"]
    # holdings: natural sort by " "+display → Box 2 < Box 10; room quirk
    holdings = json.loads(by_field["special_collections_holding_display"][0])
    assert [h["call_number"] for h in holdings] == ["MSS-123 Box 2", "MSS-123 Box 10"]
    assert holdings[0]["location"] == '"R5"'   # JsonValue.toString quirk
    assert holdings[1]["location"] == "STACKS"
    assert holdings[1]["barcode"] == "AS:3C1"  # synthesized
    # IIIF
    assert by_field["alternate_id_facet"] == ["MSS123"]
    assert by_field["thumbnail_url_display"] == [
        "https://iiif/x/full/!115,125/0/default.jpg"
    ]
    assert "iiif" in by_field["feature_facet"]
    assert "rights_wrapper" in by_field["feature_facet"]
    assert by_field["use_facet"] == [
        "Commercial Use Permitted", "Educational Use Permitted"
    ]
    assert by_field["format_facet"] == ["Manuscript/Archive", "Online"]
    assert by_field["note_display"] == ["scope!"]


def test_error_channel(ray_session):
    import ray.data

    records = pd.DataFrame(
        [
            {
                "uri": "/repositories/1/accessions/1", "record_type": "accession",
                "lock_version": 0, "title": "T", "publish": False,
                "suppressed": False, "content_description": None,
                "id_0": "X", "id_1": None, "id_2": None, "id_3": None,
                "id_4": None, "id_5": None, "processing_status": None,
                "repository_ref": "/repositories/1", "subjects": None,
                "linked_agents": None, "extents": None, "dates": None,
                "notes": None, "instances": None, "related_resources": None,
            },
            {
                "uri": "/repositories/9/resources/9", "record_type": "resource",
                "lock_version": 0, "title": "Bad", "publish": True,
                "suppressed": False, "content_description": None,
                "id_0": "Y", "id_1": None, "id_2": None, "id_3": None,
                "id_4": None, "id_5": None, "processing_status": "completed",
                "repository_ref": "/repositories/404",  # unknown library -> error
                "subjects": None, "linked_agents": None, "extents": None,
                "dates": None,
                "notes": None,
                "instances": [{"top_container_ref": "/tc/1", "digital_object_ref": None}],
                "related_resources": None,
            },
        ]
    )
    dims = _dims(containers={"/tc/1": {"display_string": "Box 1", "barcode": "B",
                                       "room": None, "current_location": "",
                                       "uri": "/repositories/9/top_containers/1"}})
    docs, errors = build_solr_docs(ray.data.from_pandas(records), dims, now_year=2026)
    ddf, edf = docs.to_pandas(), errors.to_pandas()
    assert set(ddf["doc_id"]) == {"as:1a1"}  # shadowed but still emitted
    assert len(edf) == 1 and "Unknown location" in edf["error"].iloc[0]


def test_tree_instance_collection():
    """collectInstanceRefs recursion: containers/digital objects gathered
    from the published descendant tree, deduplicated; unpublished subtrees
    excluded (ASpaceObject.java:174-196)."""
    from archivesspace_virgo_ray.pipelines.docbuilder import collect_instance_refs

    rec = {
        "uri": "/repositories/3/resources/1",
        "instances": [{"top_container_ref": "/tc/root", "digital_object_ref": None}],
        "children": ["/ao/1", "/ao/2"],
    }
    dims = _dims(
        archival_objects={
            "/ao/1": {"publish": True,
                      "instances": [{"top_container_ref": "/tc/a", "digital_object_ref": "/do/1"}],
                      "children": ["/ao/3"]},
            "/ao/2": {"publish": False,  # unpublished subtree pruned entirely
                      "instances": [{"top_container_ref": "/tc/hidden", "digital_object_ref": None}],
                      "children": ["/ao/4"]},
            "/ao/3": {"publish": True,
                      "instances": [{"top_container_ref": "/tc/a",  # dup -> set
                                     "digital_object_ref": None}],
                      "children": []},
            "/ao/4": {"publish": True,
                      "instances": [{"top_container_ref": "/tc/under_hidden", "digital_object_ref": None}],
                      "children": []},
        }
    )
    containers, dos = collect_instance_refs(rec, dims)
    assert containers == ["/tc/a", "/tc/root"]
    assert dos == ["/do/1"]


def test_resource_published_via_descendant_container():
    """A resource with no own containers but a published child that has one
    is NOT shadowed (isPublished counts the tree's containers)."""
    from archivesspace_virgo_ray.pipelines.docbuilder import build_record_fields

    rec = {
        "uri": "/repositories/3/resources/2",
        "record_type": "resource", "lock_version": 1, "title": "T",
        "publish": True, "suppressed": False, "content_description": None,
        "id_0": "MSS", "id_1": "2", "id_2": None, "id_3": None, "id_4": None,
        "id_5": None, "processing_status": "completed",
        "repository_ref": "/repositories/3",
        "subjects": None, "linked_agents": None, "extents": None,
        "dates": None, "notes": None,
        "instances": None,  # no own containers
        "children": ["/ao/c"],
        "related_resources": None,
    }
    dims = _dims(
        repositories={"/repositories/3": "Albert and Shirley Small Special Collections Library"},
        archival_objects={"/ao/c": {"publish": True,
                                    "instances": [{"top_container_ref": "/tc/x", "digital_object_ref": None}],
                                    "children": []}},
        containers={"/tc/x": {"display_string": "Box 9", "barcode": "B9",
                              "room": None, "current_location": "L",
                              "uri": "/repositories/3/top_containers/9"}},
    )
    pairs = build_record_fields(rec, dims, now_year=2026)
    by_field = {}
    for f, v in pairs:
        by_field.setdefault(f, []).append(v)
    assert by_field["shadowed_location_facet"] == ["VISIBLE"]
    import json as _json

    rows = _json.loads(by_field["special_collections_holding_display"][0])
    assert [r["call_number"] for r in rows] == ["MSS-2 Box 9"]
