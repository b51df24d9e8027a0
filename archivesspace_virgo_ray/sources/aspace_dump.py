"""ArchivesSpace REST-dump ingestion — the on-ramp from real ArchivesSpace
data to the flagship doc builder.

The reference walks the live REST API per record
(``ArchivesSpaceClient.java:38-87`` auth/session + per-uri GETs,
``ASpaceObject.java:559-567`` reference resolution); per SURVEY §2.1 the
Ray-native engine never does per-row RPC — instead it consumes a DUMP: a
directory of ``*.json`` files (one jsonmodel object per file, exactly what
``GET /repositories/…`` returns and what the reference's own test fixtures
``accession0.json`` / ``repository0.json`` are) or a single ``.jsonl`` file
with one object per line.

``load_aspace_dump`` makes ONE streaming Ray pass over the dump to classify
objects by ``jsonmodel_type``:

- **record types** (accession, resource) stay a distributed Dataset and are
  normalized per batch into the ``archives_record`` frame
  ``build_solr_docs`` consumes (FIXTURES.md §2);
- **dimension types** (repository, subject, agent_*, top_container,
  digital_object, archival_object) are collected driver-side into
  ``DimTables`` — the broadcast small sides (J1–J7). Dims are small by
  nature (they are the resolve targets, not the corpus); archival-object
  tree nodes ride along as dims because the publish-descend recursion (J2)
  needs random access to the whole tree.

Resources double as both: each published resource also lands in
``published_resource_uris`` (the accession anti-join side).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..pipelines.docbuilder import DimTables

_RECORD_TYPES = ("accession", "resource")
_AGENT_TYPES = ("agent_person", "agent_corporate_entity", "agent_family",
                "agent_software")


def _refs(items) -> list:
    return [x["ref"] for x in (items or []) if isinstance(x, dict) and x.get("ref")]


def _norm_instances(instances) -> list:
    out = []
    for i in instances or []:
        tc = (((i.get("sub_container") or {}).get("top_container")) or {})
        do = (i.get("digital_object") or {})
        out.append({"top_container_ref": tc.get("ref"),
                    "digital_object_ref": do.get("ref")})
    return out


def _norm_notes(notes) -> list:
    out = []
    for n in notes or []:
        out.append({
            "publish": n.get("publish"),
            "type": n.get("type"),
            "subnotes": [
                {"publish": s.get("publish"), "content": s.get("content")}
                for s in (n.get("subnotes") or [])
            ],
        })
    return out


def normalize_record(raw: dict) -> dict:
    """One raw jsonmodel accession/resource → one ``archives_record`` row
    (the shape ``build_record_fields`` consumes; nested shapes reduced to
    exactly the keys the builder reads)."""
    rt = raw.get("jsonmodel_type")
    return {
        "uri": raw["uri"],
        "record_type": rt,
        "lock_version": raw.get("lock_version"),
        "title": raw.get("title"),
        "publish": bool(raw.get("publish")),
        "suppressed": bool(raw.get("suppressed")),
        "content_description": raw.get("content_description"),
        **{f"id_{i}": raw.get(f"id_{i}") for i in range(6)},
        # the reference reads it from the collection_management sub-object
        # (ASpaceCollection.java:46-48)
        "processing_status": (raw.get("collection_management") or {})
        .get("processing_status"),
        "repository_ref": (raw.get("repository") or {}).get("ref"),
        "subjects": _refs(raw.get("subjects")),
        "linked_agents": [
            {"ref": a.get("ref"), "role": a.get("role")}
            for a in (raw.get("linked_agents") or [])
        ],
        "extents": [
            {"number": e.get("number"), "extent_type": e.get("extent_type"),
             "container_summary": e.get("container_summary")}
            for e in (raw.get("extents") or [])
        ],
        "dates": [
            {"expression": d.get("expression"), "begin": d.get("begin"),
             "end": d.get("end")}
            for d in (raw.get("dates") or [])
        ],
        "notes": _norm_notes(raw.get("notes")),
        "instances": _norm_instances(raw.get("instances")),
        "related_resources": _refs(raw.get("related_resources")),
        # filled by the tree pass in load_aspace_dump (resource → its
        # top-level published archival objects)
        "children": [],
    }


def _agent_title(raw: dict):
    if raw.get("title") is not None:
        return raw["title"]
    names = raw.get("names") or []
    for n in names:
        if n.get("sort_name"):
            return n["sort_name"]
    return (raw.get("display_name") or {}).get("sort_name")


def _dims_from_objects(objs: list[dict]) -> tuple[DimTables, dict]:
    """Dimension objects → DimTables (+ parent→children edges for the
    archival-object tree)."""
    dims = DimTables(
        repositories={}, subjects={}, agents={}, containers={},
        digital_objects={}, manifests={}, use_rights={},
        published_resource_uris=set(), archival_objects={},
    )
    children: dict[str, list] = {}
    for raw in objs:
        t = raw.get("jsonmodel_type")
        uri = raw.get("uri")
        if t == "repository":
            dims.repositories[uri] = raw.get("name")
        elif t == "subject":
            dims.subjects[uri] = {"title": raw.get("title"),
                                  "publish": raw.get("publish")}
        elif t in _AGENT_TYPES:
            dims.agents[uri] = {"title": _agent_title(raw),
                                "publish": raw.get("publish")}
        elif t == "top_container":
            dims.containers[uri] = {
                "display_string": raw.get("display_string"),
                "barcode": raw.get("barcode"),
                "room": raw.get("room"),
                "current_location": raw.get("current_location"),
                "uri": uri,
            }
        elif t == "digital_object":
            dims.digital_objects[uri] = {
                "publish": raw.get("publish"),
                "file_versions": [
                    {"publish": v.get("publish"),
                     "use_statement": v.get("use_statement"),
                     "file_uri": v.get("file_uri")}
                    for v in (raw.get("file_versions") or [])
                ],
            }
        elif t == "archival_object":
            dims.archival_objects[uri] = {
                "publish": bool(raw.get("publish")),
                "instances": _norm_instances(raw.get("instances")),
                "children": [],
            }
            parent = ((raw.get("parent") or {}).get("ref")
                      or (raw.get("resource") or {}).get("ref"))
            if parent:
                children.setdefault(parent, []).append(uri)
        elif t == "resource" and raw.get("publish"):
            dims.published_resource_uris.add(uri)
    # wire the tree: each archival object learns its children; edges whose
    # parent is a resource are returned for the record pass
    resource_children: dict[str, list] = {}
    for parent, kids in children.items():
        kids = sorted(kids)
        if parent in dims.archival_objects:
            dims.archival_objects[parent]["children"] = kids
        else:
            resource_children[parent] = kids
    return dims, resource_children


def load_aspace_dump(dump_path: str):
    """``dump_path`` (dir of ``*.json`` REST objects, or one ``.jsonl``)
    → ``(records_ds, dims)`` ready for ``build_solr_docs(records_ds, dims,
    now_year)``. Records stream; dims collect driver-side (broadcast small
    sides). Unknown jsonmodel types are ignored."""
    import ray
    import ray.data

    if os.path.isdir(dump_path):
        paths = sorted(
            os.path.join(dump_path, f) for f in os.listdir(dump_path)
            if f.endswith(".json"))
    else:
        paths = [dump_path]

    def classify(batch) -> pd.DataFrame:
        kinds, payloads = [], []
        for raw_bytes in batch["bytes"]:
            text = bytes(raw_bytes).decode("utf-8")
            objs = ([json.loads(line) for line in text.splitlines() if line.strip()]
                    if dump_path.endswith(".jsonl") else [json.loads(text)])
            for o in objs:
                kinds.append(o.get("jsonmodel_type") or "")
                payloads.append(json.dumps(o))
        return pd.DataFrame({"kind": pd.Series(kinds, dtype=object),
                             "payload": pd.Series(payloads, dtype=object)})

    tagged = ray.data.read_binary_files(paths).map_batches(
        classify, batch_format="pandas")

    # dims: everything that is not a record type — small by design
    def _payloads(pdf: pd.DataFrame) -> list[str]:
        # an all-filtered-out pandas block can union to a column-less frame
        return list(pdf["payload"]) if "payload" in pdf.columns else []

    dim_df = tagged.map_batches(
        lambda df: df.loc[~df["kind"].isin(_RECORD_TYPES)].reset_index(drop=True),
        batch_format="pandas",
    ).to_pandas()
    dim_objs = [json.loads(p) for p in _payloads(dim_df)]
    # resources are dims too (published_resource_uris) — collect them from
    # the record side as well
    res_df = tagged.map_batches(
        lambda df: df.loc[df["kind"] == "resource"].reset_index(drop=True),
        batch_format="pandas",
    ).to_pandas()
    dims, resource_children = _dims_from_objects(
        dim_objs + [json.loads(p) for p in _payloads(res_df)])
    kids_ref = ray.put(resource_children)

    def to_records(df: pd.DataFrame) -> pd.DataFrame:
        kid_map = ray.get(kids_ref)
        rows = []
        if "payload" not in df.columns:
            df = pd.DataFrame({"kind": [], "payload": []})
        for p in df.loc[df["kind"].isin(_RECORD_TYPES), "payload"]:
            rec = normalize_record(json.loads(p))
            rec["children"] = kid_map.get(rec["uri"], [])
            rows.append(rec)
        if not rows:
            return pd.DataFrame(
                columns=list(normalize_record({"uri": "", "jsonmodel_type":
                                               "accession"}).keys()))
        return pd.DataFrame(rows)

    records_ds = tagged.map_batches(to_records, batch_format="pandas")
    return records_ds, dims
