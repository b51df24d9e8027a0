"""Tests: field-map projection (M18/M19) + document-pipeline operators."""

import numpy as np
import pandas as pd
import pytest

from archivesspace_virgo_ray.pipelines.docpipe import (
    aggregate_notes,
    dedupe_first,
    dirty_set,
    format_extents,
    shadowed_flags,
)
from archivesspace_virgo_ray.pipelines.fieldmap import (
    apply_field_map_rows,
    aspace_field_map,
    avalon_field_map,
    build_header_rows,
    field_map_dataset,
)

RECORD_DATE = "2026-01-01T00:00:00Z"


def _long(doc_id, pairs):
    return pd.DataFrame(
        {
            "doc_id": [doc_id] * len(pairs),
            "field": [f for f, _ in pairs],
            "pos": np.arange(len(pairs), dtype=np.int64),
            "value": [v for _, v in pairs],
        }
    )


def _pairs(df):
    return sorted(zip(df["field"], df["value"]))


class TestAspaceFieldMap:
    def test_rename_and_drop(self):
        cfg = aspace_field_map()
        df = _long(
            "as:3r754",
            [
                ("id", "as:3r754"),
                ("subject_facet", "Maps"),
                ("totally_unmapped_field", "x"),
            ],
        )
        out = apply_field_map_rows(df, cfg)
        got = _pairs(out)
        assert ("id", "as:3r754") in got
        assert ("subject_tsearchf_stored", "Maps") in got
        # aspace drops unmapped (xsl:111-113)
        assert not any(f == "totally_unmapped_field" or v == "x" for f, v in got)

    def test_call_number_special(self):
        cfg = aspace_field_map()
        out = apply_field_map_rows(df := _long("d", [("call_number_facet", "ms 123")]), cfg)
        got = dict(_pairs(out))
        assert got["call_number_tsearch_stored"] == "MS 123"
        assert got["mss_work_key_sort"] == "MS_123"
        assert got["work_title3_key_ssort"] == "MS_123"

    def test_library_special_collections_gains_source(self):
        cfg = aspace_field_map()
        out = apply_field_map_rows(
            _long("d", [("library_facet", "Special Collections")]), cfg
        )
        got = _pairs(out)
        # the two golden assertions of IndexRecordsForV4Test.java:14-24
        assert ("source_f_stored", "Special Collections") in got
        out2 = apply_field_map_rows(_long("d", [("library_facet", "Law School")]), cfg)
        assert not any(f == "source_f_stored" for f, _ in _pairs(out2))
        assert ("library_f_stored", "Law School") in _pairs(out2)

    def test_headers_online(self):
        cfg = aspace_field_map()
        driver = _long("d", [("format_facet", "Online")])
        hdr = _pairs(build_header_rows(driver, cfg, RECORD_DATE))
        assert ("pool_f", "archival") in hdr
        assert ("circulating_f", "false") in hdr
        assert ("record_date_stored", RECORD_DATE) in hdr
        assert hdr.count(("uva_availability_f_stored", "Online")) == 1
        assert hdr.count(("uva_availability_f_stored", "On shelf")) == 1

    def test_date_special(self):
        cfg = aspace_field_map()
        out = apply_field_map_rows(_long("d", [("date_multisort_i", "1994")]), cfg)
        assert ("published_date", "1994-01-01T00:00:00Z") in _pairs(out)


class TestAvalonFieldMap:
    def test_role_suffix_and_catchall(self):
        cfg = avalon_field_map()
        df = _long(
            "avalon:23460",
            [("cmp_display", "Bach, J.S."), ("weird_field", "kept")],
        )
        out = apply_field_map_rows(df, cfg)
        got = _pairs(out)
        assert ("author_tsearchf_stored", "Bach, J.S. (composer)") in got
        assert ("avalon_tsearch", "kept") in got  # catch-all, opposite of aspace

    def test_headers_audio_pool(self):
        cfg = avalon_field_map()
        driver = _long(
            "avalon:1",
            [
                ("format_facet", "Streaming Audio"),
                ("id", "avalon:1"),
                ("title_sort_facet", 'flat broke "x"'),
                ("author_facet", "Some One"),
            ],
        )
        hdr = dict(_pairs(build_header_rows(driver, cfg, RECORD_DATE)))
        assert hdr["pool_f"] == "music_recordings"
        assert hdr["url_label_str_stored"] == "Listen Online"
        assert hdr["url_str_stored"] == "https://avalon.lib.virginia.edu/media_objects/avalon:1"
        assert hdr["work_title3_key_ssort"] == "flat_broke__x_//MusicRecording"
        assert hdr["work_title2_key_ssort"] == "flat_broke__x_/Some_One/MusicRecording"

    def test_avalon_id_extraction_fallback(self):
        cfg = avalon_field_map()
        driver = _long("d", [("id", "uva-lib:12345")])
        hdr = dict(_pairs(build_header_rows(driver, cfg, RECORD_DATE)))
        # substring(solrId, 8) is 1-based XSLT → drops exactly 7 chars
        assert hdr["url_str_stored"].endswith("/" + "uva-lib:12345"[7:])


def test_field_map_dataset_end_to_end(ray_session):
    import ray.data

    cfg = aspace_field_map()
    df = pd.concat(
        [
            _long("as:1r1", [("id", "as:1r1"), ("format_facet", "Online"), ("junk", "x")]),
            _long("as:1r2", [("id", "as:1r2"), ("subject_facet", "Art")]),
        ],
        ignore_index=True,
    )
    ds = ray.data.from_pandas(df)
    out = field_map_dataset(ds, cfg, RECORD_DATE).to_pandas()
    d1 = _pairs(out[out["doc_id"] == "as:1r1"])
    d2 = _pairs(out[out["doc_id"] == "as:1r2"])
    assert ("format_f_stored", "Online") in d1
    assert ("uva_availability_f_stored", "Online") in d1
    assert ("pool_f", "archival") in d1 and ("pool_f", "archival") in d2
    assert ("uva_availability_f_stored", "On shelf") in d2
    assert not any(f == "junk" for f, _ in d1)


# --------------------------- docpipe ---------------------------------------


def _rec(**kw):
    base = dict(
        uri="/repositories/1/resources/1",
        record_type="resource",
        publish=True,
        suppressed=False,
        processing_status="completed",
        instances=[{"instance_type": "mixed", "top_container_ref": "/tc/1", "digital_object_ref": None}],
        related_resources=None,
    )
    base.update(kw)
    return base


class TestPredicates:
    def test_resource_rules(self):
        df = pd.DataFrame(
            [
                _rec(),  # visible
                _rec(publish=False),
                _rec(processing_status="in_progress"),
                _rec(instances=[]),
            ]
        )
        out = shadowed_flags(df, set())
        assert out.tolist() == [False, True, True, True]

    def test_accession_semi_join_rule(self):
        acc = dict(
            uri="/repositories/1/accessions/1",
            record_type="accession",
            publish=True,
            suppressed=False,
            processing_status=None,
            instances=[{"instance_type": "m", "top_container_ref": "/tc/2", "digital_object_ref": None}],
        )
        df = pd.DataFrame(
            [
                {**acc, "related_resources": None},                      # visible
                {**acc, "related_resources": ["/repositories/1/resources/9"]},  # shadowed by published resource
                {**acc, "related_resources": ["/repositories/1/resources/8"]},  # visible (related not published)
                {**acc, "publish": False, "related_resources": None},     # shadowed
            ]
        )
        out = shadowed_flags(df, {"/repositories/1/resources/9"})
        assert out.tolist() == [False, True, False, True]


def test_extents_and_notes():
    assert format_extents(
        [
            {"number": "28", "extent_type": "cubic_feet", "container_summary": "28 boxes"},
            {"number": "1", "extent_type": "item", "container_summary": None},
        ]
    ) == ["28 cubic feet (28 boxes)", "1 item"]
    notes = [
        {"type": "scopecontent", "publish": True,
         "subnotes": [{"publish": True, "content": "a"}, {"publish": False, "content": "b"},
                      {"publish": True, "content": "c"}]},
        {"type": "other", "publish": True, "subnotes": [{"publish": True, "content": "d"}]},
        {"type": "scopecontent", "publish": False, "subnotes": [{"publish": True, "content": "e"}]},
    ]
    agg = aggregate_notes(notes)
    assert agg["note_display"] == ["a\nc"]
    assert agg["note_text"] == ["a\nc", "d"]


def test_dirty_set(ray_session):
    import ray.data

    wm = pd.Timestamp("2026-01-01")
    updates = pd.DataFrame(
        [
            {"id": "/repositories/1/resources/1", "types": ["resource"],
             "user_mtime": pd.Timestamp("2026-01-02"),
             "ancestors": None, "related_accession_uris": ["/repositories/1/accessions/5"],
             "collection_uri_u_sstr": None},
            {"id": "/ao/2", "types": ["archival_object"],
             "user_mtime": pd.Timestamp("2026-01-02"),
             "ancestors": ["/repositories/1/resources/7", "/not/a/resource"],
             "related_accession_uris": None, "collection_uri_u_sstr": None},
            {"id": "/tc/3", "types": ["top_container"],
             "user_mtime": pd.Timestamp("2026-01-02"),
             "ancestors": None, "related_accession_uris": None,
             "collection_uri_u_sstr": ["/repositories/1/resources/1"]},
            {"id": "/repositories/2", "types": ["repository"],
             "user_mtime": pd.Timestamp("2026-01-02"),
             "ancestors": None, "related_accession_uris": None, "collection_uri_u_sstr": None},
            {"id": "/repositories/1/resources/99", "types": ["resource"],
             "user_mtime": pd.Timestamp("2025-12-01"),  # before watermark
             "ancestors": None, "related_accession_uris": None, "collection_uri_u_sstr": None},
        ]
    )
    children = pd.DataFrame(
        [
            {"repo_ref": "/repositories/2", "child_ref": "/repositories/2/accessions/1"},
            {"repo_ref": "/repositories/2", "child_ref": "/repositories/2/resources/1"},
            {"repo_ref": "/repositories/1", "child_ref": "/repositories/1/resources/55"},
        ]
    )
    out = dirty_set(ray.data.from_pandas(updates), ray.data.from_pandas(children), wm)
    refs = sorted(r["ref"] for r in out.take_all())
    assert refs == sorted(
        [
            "/repositories/1/resources/1",
            "/repositories/1/accessions/5",
            "/repositories/1/resources/7",
            "/repositories/2/accessions/1",
            "/repositories/2/resources/1",
        ]
    )


def test_dedupe_first(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"call_number": ["A", "A", "B"], "ord": [2, 1, 5], "v": ["x", "y", "z"]}
    )
    out = dedupe_first(ray.data.from_pandas(df), "call_number", "ord").to_pandas()
    got = dict(zip(out["call_number"], out["v"]))
    assert got == {"A": "y", "B": "z"}


def test_marc_circulation_records():
    from archivesspace_virgo_ray.pipelines.marc import (
        circulation_records_batch,
        parse_marc21,
    )

    df = pd.DataFrame(
        {
            "uri": ["/repositories/3/resources/754"],
            "title": ["The Papers"],
            "call_number": ["MSS 123"],
            "containers": [
                [
                    {"display_string": "Box 1", "barcode": "X1",
                     "uri": "/repositories/3/top_containers/9"},
                    {"display_string": "Box 2", "barcode": None,
                     "uri": "/repositories/3/top_containers/10"},
                ]
            ],
        }
    )
    out = circulation_records_batch(df)
    r = out.iloc[0]
    assert r["f001"] == "as:3r754"
    assert r["f245_ind2"] == "4"
    assert r["f590_a"] == "From ArchivesSpace: /repositories/3/resources/754"
    assert r["f949"][0]["a"] == "MSS 123 Box 1" and r["f949"][0]["i"] == "X1"
    assert r["f949"][1]["i"] == "AS:3C10"  # synthesized barcode fallback
    fields = parse_marc21(r["marc21"])
    assert fields[0] == ("001", "as:3r754")
    assert fields[1][0] == "245" and "\x1faThe Papers" in fields[1][1]
    assert fields[1][1][:2] == "04"  # indicators
    assert len([f for f in fields if f[0] == "949"]) == 2
    assert 'tag="001">as:3r754<' in r["marcxml"]


def test_marc_special_collections_routing(ray_session):
    import ray.data

    from archivesspace_virgo_ray.pipelines.marc import special_collections_only

    df = pd.DataFrame(
        {"uri": ["/repositories/3/resources/1", "/repositories/1/resources/2"]}
    )
    out = special_collections_only(ray.data.from_pandas(df)).to_pandas()
    assert out["uri"].tolist() == ["/repositories/3/resources/1"]
