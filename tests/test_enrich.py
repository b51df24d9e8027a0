"""Tests: IIIF enrichment, holdings builder, dispatch/error channel, XML
rendering, paged scan."""

import json

import pandas as pd

from archivesspace_virgo_ray.pipelines.enrich import (
    build_holdings,
    dispatch_refs,
    iiif_enrich,
    paged_scan,
    render_solr_add_xml,
    resize_thumbnail_urls,
)


def test_thumbnail_resize():
    out = resize_thumbnail_urls(
        ["https://iiif.lib/x/full/200,/0/default.jpg", None, "no-match"]
    )
    assert out[0] == "https://iiif.lib/x/full/!115,125/0/default.jpg"
    assert out[1] is None and out[2] == "no-match"


def test_iiif_enrich(ray_session):
    import ray.data

    manifests = pd.DataFrame(
        {
            "digital_object_ref": [f"/do/{i}" for i in range(8)],
            "manifest_url": [f"https://m/{i}" for i in range(8)],
            "label": [f"L{i}" for i in range(8)],
            "license": ["cc0"] * 4 + [None] * 4,
            "thumbnail_url": [f"https://iiif/x{i}/full/200,/0/d.jpg" for i in range(8)],
        }
    )
    records = pd.DataFrame(
        {
            "uri": ["r1", "r2", "r3"],
            "digital_object_refs": [
                ["/do/0", "/do/4"],
                [f"/do/{i}" for i in range(7)],  # over the ≤5 cap
                None,
            ],
        }
    )
    out = iiif_enrich(ray.data.from_pandas(records), manifests).to_pandas()
    out = out.set_index("uri")
    assert out.loc["r1", "iiif_count"] == 2
    assert out.loc["r1", "feature_iiif"]
    assert out.loc["r1", "thumbnail_urls"][0].endswith("/full/!115,125/0/d.jpg")
    assert out.loc["r1", "licenses"] == ["cc0"]
    assert out.loc["r2", "iiif_count"] == 0  # capped out (O2)
    assert out.loc["r3", "iiif_count"] == 0


def test_build_holdings_natural_sort_and_dedup(ray_session):
    import ray.data

    containers = pd.DataFrame(
        {
            "ref": ["/tc/1", "/tc/2", "/tc/3", "/tc/4"],
            "display_string": ["Box 10", "Box 2", "Box 2 dup", "Oversize 1"],
            "barcode": ["b10", "b2", "b2d", "bo"],
            "current_location": ["L1", "L1", "L1", "L2"],
            "call_number": ["Box 10", "Box 2", "Box 2", "Oversize 1"],
        }
    )
    records = pd.DataFrame(
        {
            "uri": ["r1"],
            "container_refs": [["/tc/1", "/tc/2", "/tc/3", "/tc/4"]],
            "library": ["Special Collections"],
        }
    )
    out = build_holdings(ray.data.from_pandas(records), containers).to_pandas()
    rows = json.loads(out["special_collections_holding_display"][0])
    # natural order: Box 2 < Box 10 < Oversize 1; dup "Box 2" dropped first-wins
    assert [r["call_number"] for r in rows] == ["Box 2", "Box 10", "Oversize 1"]
    assert rows[0]["barcode"] == "b2"  # first-wins kept the first in sorted order


def test_dispatch_refs(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "ref": [
                "/repositories/3/resources/754",
                "/repositories/1/accessions/2",
                "repositories/2/top_containers/9",
                "/bogus/thing",
            ]
        }
    )
    ok, errors = dispatch_refs(ray.data.from_pandas(df))
    okp = ok.to_pandas()
    assert dict(zip(okp["ref"], okp["record_type"])) == {
        "/repositories/3/resources/754": "resource",
        "/repositories/1/accessions/2": "accession",
        "repositories/2/top_containers/9": "top_container",
    }
    ep = errors.to_pandas()
    assert len(ep) == 1 and "bogus" in ep["ref"].iloc[0]


def test_render_solr_add_xml():
    df = pd.DataFrame(
        {
            "doc_id": ["d1", "d1", "d2"],
            "field": ["id", "title_text", "id"],
            "pos": [0, 0, 0],
            "value": ["d1", 'A & B <"x">', "d2"],
        }
    )
    out = render_solr_add_xml(df)
    xml = dict(zip(out["doc_id"], out["xml"]))
    assert xml["d1"] == (
        '<add><doc><field name="id">d1</field>'
        '<field name="title_text">A &amp; B &lt;&quot;x&quot;&gt;</field></doc></add>'
    )
    assert xml["d2"] == '<add><doc><field name="id">d2</field></doc></add>'


def test_paged_scan(ray_session):
    import ray.data

    ds = ray.data.range(257)
    pages = list(paged_scan(ds, page_size=100))
    assert [len(p) for p in pages] == [100, 100, 57]
    all_ids = sorted(pd.concat(pages, ignore_index=True)["id"])
    assert all_ids == list(range(257))
