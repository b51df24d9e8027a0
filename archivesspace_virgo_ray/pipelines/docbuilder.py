"""The flagship document builder (M3): generateSolrAddDoc as a set-oriented
Ray Data stage.

Faithful re-expression of ``ASpaceObject.generateSolrAddDoc``
(ASpaceObject.java:226-495) over the ``archives_record`` Arrow shape
(FIXTURES.md §2): every ``resolveReference`` point lookup becomes a broadcast
dimension lookup (J1-J7), the per-record try/catch becomes the error
side-channel Dataset (M17), and the output is the canonical long doc table
``(doc_id, field, pos, value)`` with ``pos`` preserving the reference's
field-emission order (so K1 XML rendering is order-faithful).

Reference quirks ported deliberately:
- container sort key is ``getContainerCallNumber("")`` = " " + display_string
  (ASpaceObject.java:383-389) while the emitted call number uses the real
  owning call number;
- ``getLocation()`` returns the JSON representation of ``room`` (quoted
  string) or "STACKS" (ASpaceTopContainer.java:94-101);
- manifest short-id "iiif-manifest.json" → "MSS16152" (the Shepherd hack,
  ASpaceObject.java:520-523);
- unparseable date expressions still bucket as "More than 50 years ago"
  (year stays -1, ASpaceObject.java:317-337);
- a missing rights row or unknown library RAISES in the reference → here the
  whole record routes to the error channel (IndexRecords.java:97-101).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions.text import (
    LIBRARY_MAP,
    extract_manifest_url,
    natural_sort_key,
    parse_expression_year,
    published_date_buckets,
    ref_to_short_id,
)

RIGHTS_WRAPPER_URL = "http://rightswrapper2.lib.virginia.edu:8090/rights-wrapper/"
STATIC_THUMBNAIL = "http://iiif.lib.virginia.edu/iiif/static:6/full/!115,125/0/default.jpg"
ONLINE_URL_PREFIX = "https://archives.lib.virginia.edu"

import re

_THUMB_RE = re.compile(r"(https://.*/full/)[^/]*(/.*)")


from dataclasses import field as _field


@dataclass
class DimTables:
    """Broadcast dimension tables (the J1-J7 small sides)."""

    repositories: dict      # ref -> name
    subjects: dict          # ref -> {"title", "publish"}
    agents: dict            # ref -> {"title", "publish"}
    containers: dict        # ref -> {"display_string","barcode","room",
                            #         "current_location","uri"}
    digital_objects: dict   # ref -> {"publish","file_versions":[{...}]}
    manifests: dict         # manifest_url -> {"at_id","license","label",
                            #                  "thumbnail","json"}
    use_rights: dict        # uri -> {"statement","commercial_use",
                            #         "educational_use","modifications"}
    published_resource_uris: set
    # archival-object tree nodes (J2 recursion): uri -> {"publish",
    # "instances": [...], "children": [uris]}
    archival_objects: dict = _field(default_factory=dict)


def collect_instance_refs(rec: dict, dims: "DimTables") -> tuple[list[str], list[str]]:
    """ASpaceObject.collectInstanceRefs (ASpaceObject.java:174-196): this
    record's instance refs plus those of its PUBLISHED descendant tree,
    deduplicated. The reference accumulates into HashSets (arbitrary JVM
    iteration order); here the order is pinned to sorted-ref for
    determinism. Returns (container_refs, digital_object_refs)."""
    containers: set[str] = set()
    dos: set[str] = set()
    visited: set[str] = set()

    def visit_instances(instances):
        for i in instances or []:
            if i and i.get("top_container_ref"):
                containers.add(i["top_container_ref"])
            if i and i.get("digital_object_ref"):
                dos.add(i["digital_object_ref"])

    visit_instances(rec.get("instances"))
    stack = list(rec.get("children") or [])
    while stack:
        uri = stack.pop()
        if uri in visited:
            continue
        visited.add(uri)
        node = dims.archival_objects.get(uri)
        if node is None or not node.get("publish"):
            continue  # recursion only descends through published children
        visit_instances(node.get("instances"))
        stack.extend(node.get("children") or [])
    return sorted(containers), sorted(dos)


def _call_number(rec) -> str:
    parts = [
        rec.get(f"id_{i}") for i in range(6)
        if rec.get(f"id_{i}") not in (None, "")
    ]
    return "-".join(parts).strip()


def _container_barcode(c: dict) -> str:
    if c.get("barcode"):
        return c["barcode"]
    m = re.match(r"/repositories/(\d+)/top_containers/(\d+)", c.get("uri") or "")
    return f"AS:{m.group(1)}C{m.group(2)}" if m else "UNKNOWN"


def _is_shadowed(rec, dims: DimTables) -> bool:
    rtype = rec["record_type"]
    publish = bool(rec.get("publish"))
    # "has containers" counts the published descendant tree too —
    # isPublished calls getTopContainers() which recurses (J2)
    has_container = bool(collect_instance_refs(rec, dims)[0])
    if rtype == "resource":
        return not (
            publish
            and rec.get("processing_status") == "completed"
            and has_container
        )
    if rtype == "accession":
        published = publish and has_container
        has_pub_related = any(
            r in dims.published_resource_uris
            for r in (rec.get("related_resources") or [])
        )
        return not (published and not has_pub_related)
    return not publish


def build_record_fields(rec: dict, dims: DimTables, now_year: int) -> list[tuple[str, str]]:
    """One record -> ordered (field, value) pairs. Raises on the reference's
    raising paths (caller routes to the error channel)."""
    uri = rec["uri"]
    out: list[tuple[str, str]] = []
    add = lambda f, v: out.append((f, v))

    call_number = _call_number(rec)
    title = rec.get("title")
    add("id", ref_to_short_id([uri])[0])
    add("aspace_version_facet", str(rec.get("lock_version")))
    add("call_number_facet", call_number)
    add("main_title_display", title)
    add("title_text", title)
    add("source_facet", "ArchivesSpace")
    add("format_facet", "Manuscript/Archive")
    shadowed = _is_shadowed(rec, dims)
    add("shadowed_location_facet", "HIDDEN" if shadowed else "VISIBLE")

    if not shadowed:
        repo_name = dims.repositories.get(rec.get("repository_ref"))
        if repo_name is None or repo_name not in LIBRARY_MAP:
            raise ValueError(f"Unknown location: {repo_name}")
        library = LIBRARY_MAP[repo_name]
        add("library_facet", library)

        # subjects (M8/J7): missing dim entry raises, like a failed resolve
        for ref in rec.get("subjects") or []:
            subject = dims.subjects.get(ref)
            if subject is None:
                raise KeyError(f"unresolvable subject {ref}")
            if subject.get("publish"):
                add("subject_facet", subject["title"])
                add("subject_text", subject["title"])

        # extents (M9)
        for e in rec.get("extents") or []:
            s = f"{e.get('number')} {str(e.get('extent_type', '')).replace('_', ' ')}"
            if e.get("container_summary") is not None:
                s += f" ({e['container_summary']})"
            add("extent_display", s)

        # dates (M10)
        sort_date_set = False
        for d in rec.get("dates") or []:
            expr = d.get("expression")
            if expr:
                year = int(parse_expression_year([expr])[0])
                if year != 0:
                    if not sort_date_set:
                        add("date_multisort_i", str(year))
                        sort_date_set = True
                    for bucket in published_date_buckets(
                        np.array([year]), now_year
                    )[0]:
                        add("published_date_facet", bucket)
                add("date_display", expr)
            elif d.get("begin") and d.get("end"):
                add("date_display", f"{d['begin']}-{d['end']}")

        # creators (M11/J7): NPE-skip semantics
        for link in rec.get("linked_agents") or []:
            agent = dims.agents.get(link.get("ref"))
            if agent is None or agent.get("publish") is None:
                continue
            if agent["publish"] and link.get("role") == "creator":
                add("author_facet", agent["title"])
                add("author_text", agent["title"])

        # containers (M12/J2/J6/O1) — record + published descendant tree
        container_refs, do_refs = collect_instance_refs(rec, dims)
        containers = [
            dims.containers[r] for r in container_refs if r in dims.containers
        ]
        keys = natural_sort_key([" " + c["display_string"] for c in containers])
        containers = [containers[j] for j in np.argsort(keys, kind="stable")]
        rows = []
        for c in containers:
            room = c.get("room")
            rows.append(
                {
                    "library": library,
                    "location": "STACKS" if room is None else json.dumps(room),
                    "call_number": f"{call_number} {c['display_string']}",
                    "barcode": _container_barcode(c),
                    "special_collections_location": c.get("current_location") or "",
                }
            )
        add(
            "special_collections_holding_display",
            json.dumps(rows, separators=(",", ":")),
        )

        # digital objects → manifests (M13/J3); ≤5 cap counts ALL digital
        # objects of the record+tree (ASpaceObject.java:409)
        manifests_included = 0
        if len(do_refs) <= 5:
            for ref in do_refs:
                dobj = dims.digital_objects.get(ref)
                if dobj is None:
                    continue
                iiif_url = _iiif_url(dobj)
                if iiif_url is None:
                    continue
                manifest = dims.manifests.get(iiif_url)
                if manifest is None:
                    continue  # "Unable to fetch manifest" skip (:416-418)
                _add_digital_images(
                    add, manifest, thumbnail=manifests_included == 0, dims=dims
                )
                manifests_included += 1
        if manifests_included > 0:
            add("feature_facet", "iiif")
            add("format_facet", "Online")
        else:
            add("thumbnail_url_display", STATIC_THUMBNAIL)

        # notes (M14)
        for note in rec.get("notes") or []:
            if not note.get("publish"):
                continue
            subs = [
                s["content"]
                for s in (note.get("subnotes") or [])
                if s.get("publish") and s.get("content") is not None
            ]
            if subs:
                text = "\n".join(subs)
                if note.get("type") == "scopecontent":
                    add("note_display", text)
                add("note_text", text)

    if rec.get("content_description") is not None:
        add("note_text", rec["content_description"])
        add("note_display", rec["content_description"])

    add("online_url_display", ONLINE_URL_PREFIX + uri)
    add("feature_facet", "suppress_endnote_export")
    add("feature_facet", "suppress_refworks_export")
    add("feature_facet", "suppress_ris_export")
    return out


def _iiif_url(dobj: dict):
    """ASpaceDigitalObject.getIIIFURL (ASpaceDigitalObject.java:46-59)."""
    for ver in dobj.get("file_versions") or []:
        try:
            if ver["publish"] and ver["use_statement"].startswith("image-service"):
                return extract_manifest_url(ver["file_uri"])
        except (KeyError, TypeError, AttributeError):
            return None  # "Skipping digital content" path
    return None


def _add_digital_images(add, manifest: dict, thumbnail: bool, dims: DimTables):
    """addDigitalImages (ASpaceObject.java:511-549) sans the HTTP fetch."""
    at_id = manifest["at_id"]
    short_id = at_id.rsplit("/", 1)[-1]
    if short_id == "iiif-manifest.json":
        short_id = "MSS16152"  # the Shepherd hack
    # rights (J5/S11): missing row raises → record error
    rights = dims.use_rights.get(manifest["license"])
    if rights is None:
        raise KeyError(
            f"Unable to find rights statement {manifest['license']} in tracksys db."
        )
    add("feature_facet", "rights_wrapper")
    add("rights_wrapper_url_display", f"{RIGHTS_WRAPPER_URL}?pid={short_id}&pagePid=")
    add("rs_uri_display", manifest["license"])
    add("rights_wrapper_display", rights["statement"])
    if rights.get("commercial_use") == 1:
        add("use_facet", "Commercial Use Permitted")
    if rights.get("educational_use") == 1:
        add("use_facet", "Educational Use Permitted")
    if rights.get("modifications") == 1:
        add("use_facet", "Modifications Permitted")
    add("alternate_id_facet", short_id)
    add("individual_call_number_display", manifest["label"])
    if thumbnail:
        m = _THUMB_RE.match(manifest["thumbnail"])
        if not m:
            raise ValueError(f"Unexpected thumbnail URL! ({manifest['thumbnail']})")
        add("thumbnail_url_display", f"{m.group(1)}!115,125{m.group(2)}")
    add("iiif_presentation_metadata_display", manifest["json"])


def build_solr_docs(records_ds, dims: DimTables, now_year: int):
    """Dataset operator: records → (docs_long_ds, errors_ds).

    Dims are broadcast once via ``ray.put``; each batch loops records (rich
    nested per-record logic — the map stage of the flagship pipeline), and
    failures take the M17 side-channel instead of failing the job."""
    import ray

    dims_ref = ray.put(dims)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dims_ref)
        rows = []
        errors = []
        for rec in df.to_dict("records"):
            try:
                pairs = build_record_fields(rec, d, now_year)
            except Exception as ex:  # per-record isolation (M17)
                errors.append((rec["uri"], f"{type(ex).__name__}: {ex}"))
                continue
            doc_id = pairs[0][1]  # the short id
            for pos, (f, v) in enumerate(pairs):
                rows.append((doc_id, f, pos, v))
        out = pd.DataFrame(rows, columns=["doc_id", "field", "pos", "value"])
        # Typed unconditionally: an empty/all-error batch must still emit
        # int64 so the block-schema union can't upcast `pos` to float64.
        out["pos"] = out["pos"].astype(np.int64)
        err = pd.DataFrame(errors, columns=["uri", "error"])
        err["__is_error__"] = True
        out["__is_error__"] = False
        return pd.concat([out, err], ignore_index=True)

    def _docs_only(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[~df["__is_error__"], ["doc_id", "field", "pos", "value"]].reset_index(
            drop=True
        )
        # The concat above NaN-pads `pos` to float64 whenever the batch had
        # any error row — restore the contract dtype after the filter.
        d["pos"] = d["pos"].astype(np.int64)
        return d

    tagged = records_ds.map_batches(fn, batch_format="pandas")
    docs = tagged.map_batches(_docs_only, batch_format="pandas")
    errors = tagged.map_batches(
        lambda df: df.loc[df["__is_error__"], ["uri", "error"]].reset_index(drop=True),
        batch_format="pandas",
    )
    return docs, errors
