"""Enrichment operators: IIIF manifests (M13), container holdings (M12),
type dispatch + validation with the per-record error side-channel (M1/M2/M17),
Solr-add XML rendering (K1), and the paged query scan (S6).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# M13 — IIIF enrichment (ASpaceObject.java:407-426, 511-549).
# Reference fetches each manifest by HTTP per record; here manifests are a
# pre-materialized Dataset joined in (S10 → "no per-row HTTP"). Semantics:
# - at most 5 digital objects per record get manifests (the ≤5 cap, :409)
# - thumbnail URL resize via regex (https://.*/full/)[^/]*(/.*) → \1!115,125\2
#   (:532-535)
# - manifestsIncluded > 0 ⇒ feature_facet=iiif + format_facet=Online (:421-426)
# ---------------------------------------------------------------------------

_THUMB_RE = re.compile(r"(https://.*/full/)[^/]*(/.*)")


def resize_thumbnail_urls(urls) -> np.ndarray:
    """Vectorized-enough thumbnail resize (compiled regex per row)."""
    out = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls):
        out[i] = _THUMB_RE.sub(r"\g<1>!115,125\g<2>", u) if u else u
    return out


def iiif_enrich(records_ds, manifests_df: pd.DataFrame, max_manifests: int = 5):
    """records: (uri, digital_object_refs: list<str>); manifests_df:
    (digital_object_ref, manifest_url, label, license, thumbnail_url).

    Broadcast join (manifest dim assumed small relative to corpus; at scale
    this becomes a hash join keyed on the ref). Adds per record:
    iiif_count, feature_facet list, format_facet_online flag, thumbnails.
    """
    import ray

    dim = {
        r: (u, lb, lc, tb)
        for r, u, lb, lc, tb in zip(
            manifests_df["digital_object_ref"],
            manifests_df["manifest_url"],
            manifests_df["label"],
            manifests_df["license"],
            manifests_df["thumbnail_url"],
        )
    }
    dim_ref = ray.put(dim)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        df = df.copy()
        counts, thumbs, labels, licenses = [], [], [], []
        for refs in df["digital_object_refs"]:
            refs = [r for r in (refs or []) if r in d]
            if len(refs) > max_manifests:  # the ≤5 cap (grouped limit O2)
                refs = []
                counts.append(0)
                thumbs.append([])
                labels.append([])
                licenses.append([])
                continue
            counts.append(len(refs))
            thumbs.append(
                list(resize_thumbnail_urls([d[r][3] for r in refs]))
            )
            labels.append([d[r][1] for r in refs])
            licenses.append([d[r][2] for r in refs if d[r][2]])
        df["iiif_count"] = pd.Series(counts, index=df.index, dtype=np.int64)
        df["thumbnail_urls"] = pd.Series(thumbs, index=df.index, dtype=object)
        df["manifest_labels"] = pd.Series(labels, index=df.index, dtype=object)
        df["licenses"] = pd.Series(licenses, index=df.index, dtype=object)
        df["feature_iiif"] = df["iiif_count"] > 0
        df["format_online"] = df["iiif_count"] > 0
        return df

    return records_ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# M12 + J2/J6 + O1 + O4 — container holdings builder
# (ASpaceObject.java:377-404; ASpaceTopContainer.java:53-101; natural sort at
# :383-389; dedupe helper :497-509).
# Per record: resolve container refs → {library, location, call_number,
# barcode, special_collections_location} rows → natural-sort by call number →
# first-wins dedup by call_number → JSON array string.
# ---------------------------------------------------------------------------


def build_holdings(records_ds, containers_df: pd.DataFrame, library_by_record=None):
    """records: (uri, container_refs: list<str>, library: str);
    containers_df: (ref, display_string, barcode, current_location,
    call_number)."""
    import ray

    from ..functions.text import natural_sort_key

    dim = containers_df.set_index("ref").to_dict("index")
    dim_ref = ray.put(dim)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        out = []
        for refs, lib in zip(df["container_refs"], df["library"]):
            rows = []
            for r in refs or []:
                c = d.get(r)
                if c is None:
                    continue
                rows.append(
                    {
                        "library": lib,
                        "location": c.get("current_location"),
                        "call_number": c.get("call_number"),
                        "barcode": c.get("barcode"),
                        "special_collections_location": c.get("display_string"),
                    }
                )
            if rows:
                keys = natural_sort_key([r["call_number"] or "" for r in rows])
                order = np.argsort(keys, kind="stable")
                rows = [rows[i] for i in order]
                seen, deduped = set(), []
                for r in rows:  # O4 first-wins, order-preserving
                    if r["call_number"] in seen:
                        continue
                    seen.add(r["call_number"])
                    deduped.append(r)
                rows = deduped
            out.append(json.dumps(rows))
        df = df.copy()
        df["special_collections_holding_display"] = out
        return df

    return records_ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# M1/M2 + M17 — type dispatch by ref regex with error side-channel.
# (parseObject ASpaceObject.java:104-114; per-record try/catch
# IndexRecords.java:87-101 — failures never kill the job.)
# ---------------------------------------------------------------------------

REF_PATTERNS = {
    "accession": re.compile(r"^/?repositories/\d+/accessions/\d+$"),
    "resource": re.compile(r"^/?repositories/\d+/resources/\d+$"),
    "archival_object": re.compile(r"^/?repositories/\d+/archival_objects/\d+$"),
    "top_container": re.compile(r"^/?repositories/\d+/top_containers/\d+$"),
    "digital_object": re.compile(r"^/?repositories/\d+/digital_objects/\d+$"),
}


def dispatch_refs(ds, ref_col: str = "ref"):
    """-> (ok_ds, errors_ds). ok rows gain record_type; unmatched refs go to
    the error side-channel with a reason, never raising."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        types = np.full(len(df), None, dtype=object)
        for name, pat in REF_PATTERNS.items():
            m = df[ref_col].map(lambda s: bool(s) and bool(pat.match(s)))
            types[np.asarray(m, dtype=bool)] = name
        df = df.copy()
        df["record_type"] = types
        df["error"] = np.where(
            pd.isna(df["record_type"]),
            "Unrecognized reference: " + df[ref_col].astype(str),
            None,
        )
        return df

    tagged = ds.map_batches(fn, batch_format="pandas")
    ok = tagged.map_batches(
        lambda df: df[df["error"].isna()].drop(columns=["error"]).reset_index(drop=True),
        batch_format="pandas",
    )
    errors = tagged.map_batches(
        lambda df: df.loc[df["error"].notna(), [ref_col, "error"]].reset_index(drop=True),
        batch_format="pandas",
    )
    return ok, errors


# ---------------------------------------------------------------------------
# K1 — Solr-add XML rendering of the long doc model (ASpaceObject.java:226-241,
# 596-604). Parquet is canonical; XML is a formatter for conformance only.
# ---------------------------------------------------------------------------


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def render_solr_add_xml(long_df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, field, pos, value) → one <add><doc> XML string per doc.
    Field order: (field, pos) sorted — the reference emits fields in builder
    order; the canonical long table makes order explicit instead."""
    out_ids, out_xml = [], []
    for doc_id, g in long_df.sort_values(["doc_id", "field", "pos"]).groupby(
        "doc_id", sort=True
    ):
        fields = "".join(
            f'<field name="{_xml_escape(str(f))}">{_xml_escape(str(v))}</field>'
            for f, v in zip(g["field"], g["value"])
        )
        out_ids.append(doc_id)
        out_xml.append(f"<add><doc>{fields}</doc></add>")
    return pd.DataFrame({"doc_id": out_ids, "xml": out_xml})


# ---------------------------------------------------------------------------
# S6/O3 — paged scan of query results (SolrHelper.getRecordsForQuery
# :39-80: rows=100, start cursor). In Ray the scan is a streaming iterator;
# paging survives as a windowed fetch utility for API parity.
# ---------------------------------------------------------------------------


def paged_scan(ds, page_size: int = 100):
    """Yield pandas pages of ``page_size`` rows (lazy, streaming — never
    materializes the full result)."""
    buf = []
    n = 0
    for batch in ds.iter_batches(batch_size=page_size, batch_format="pandas"):
        buf.append(batch)
        n += len(batch)
        while n >= page_size:
            cat = pd.concat(buf, ignore_index=True)
            yield cat.iloc[:page_size]
            rest = cat.iloc[page_size:]
            buf = [rest] if len(rest) else []
            n = len(rest)
    if n:
        yield pd.concat(buf, ignore_index=True)
