"""Config-driven field-map projection — the v3→v4 XSLT transforms (M18/M19).

The reference applies two XSLT 2.0 stylesheets per doc
(aspace-solr-v3-to-v4.xsl, avalon-solr-v3-to-v4.xsl, compiled once and reused
— IndexRecordsForV4.java:146-168). Here the same *policy* is a declarative
``FieldMapConfig`` and the transform is two streaming Ray Data passes over the
long doc model ``(doc_id, field, pos, value)``:

1. **row-wise pass** (``map_batches``, vectorized pandas): plain renames (with
   optional suffix append — the avalon role mapping), per-row special rules,
   and the unmapped policy (aspace DROPS unmapped fields, xsl:111-113; avalon
   routes them to a catch-all ``avalon_tsearch`` searchable field,
   avalon xsl:123-128);
2. **header pass**: per-doc constant + conditional fields (pool routing,
   availability, record_date, avalon work-title sort keys). Only the handful
   of driver fields (format_facet, id, title_sort_facet, author_facet) are
   filtered out of the stream, pivoted per doc with an in-batch pandas
   groupby after a ``groupby(doc_id)``-free pre-filter, and turned into
   header rows — the shuffle touches a tiny fraction of the rows.

``record_date`` is a pinned parameter (the XSLTs use ``current-dateTime()``,
aspace xsl:39 — pinned for determinism, SURVEY.md §7.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd


@dataclass
class FieldMapConfig:
    # v3 field -> list of (v4 field, suffix-or-"") — multiple targets allowed
    renames: dict[str, list[tuple[str, str]]]
    # "drop" (aspace) or the name of a catch-all field (avalon)
    unmapped: str = "drop"
    # fields consumed by special row-wise rules (handled before renames)
    specials: dict[str, object] = dc_field(default_factory=dict)
    # per-doc header builder: fn(doc_fields: dict[str, list[str]], record_date)
    #   -> list[(field, value)]
    header_fn: object = None
    # v3 fields the header builder needs
    header_driver_fields: tuple = ()


def _translate(s: str, frm: str, to: str) -> str:
    return s.translate(str.maketrans(frm, to))


def _normalize_space(s: str) -> str:
    return " ".join(s.split())


# --------------------------- aspace policy ---------------------------------


def _aspace_specials() -> dict:
    def call_number(v: str) -> list[tuple[str, str]]:
        return [
            ("call_number_tsearch_stored", _translate(v, "ms", "MS")),
            ("mss_work_key_sort", _translate(v, "ms ", "MS_")),
            ("work_title3_key_ssort", _translate(v, "ms ", "MS_")),
            ("work_title2_key_ssort", _translate(v, "ms ", "MS_")),
        ]

    def date_multisort(v: str) -> list[tuple[str, str]]:
        return [("published_date", v + "-01-01T00:00:00Z")]

    def sc_holding(v: str) -> list[tuple[str, str]]:
        return [
            (
                "sc_availability_large_single",
                v.replace('"location"', '"current_location"'),
            )
        ]

    def online_url(v: str) -> list[tuple[str, str]]:
        return [
            ("url_supp_a", v),
            ("url_label_supp_a", "GUIDE TO THE COLLECTION AVAILABLE ONLINE"),
        ]

    def library(v: str) -> list[tuple[str, str]]:
        out = [("library_f_stored", v)]
        if v == "Special Collections":
            out.append(("source_f_stored", v))
        return out

    return {
        "call_number_facet": call_number,
        "date_multisort_i": date_multisort,
        "special_collections_holding_display": sc_holding,
        "online_url_display": online_url,
        "library_facet": library,
    }


def _aspace_headers(doc_fields: dict[str, list[str]], record_date: str):
    out = [
        ("pool_f", "archival"),
        ("circulating_f", "false"),
        ("record_date_stored", record_date),
    ]
    if "Online" in doc_fields.get("format_facet", []):
        out += [
            ("uva_availability_f_stored", "Online"),
            ("anon_availability_f_stored", "Online"),
        ]
    out += [
        ("uva_availability_f_stored", "On shelf"),
        ("anon_availability_f_stored", "On shelf"),
    ]
    return out


def aspace_field_map() -> FieldMapConfig:
    """aspace-solr-v3-to-v4.xsl:5-25 rename table + special templates."""
    renames = {
        "id": [("id", "")],
        "shadowed_location_facet": [("shadowed_location_f", "")],
        "aspace_version_facet": [("aspace_version_f", "")],
        "main_title_display": [("title_tsearch_stored", "")],
        "title_text": [("full_title_tsearchf_stored", "")],
        "source_facet": [("source_f_stored", "")],
        "format_facet": [("format_f_stored", "")],
        "subject_facet": [("subject_tsearchf_stored", "")],
        "extent_display": [("extent_tsearch_stored", "")],
        "date_display": [("published_display_tsearch_stored", "")],
        "author_facet": [("author_tsearchf_stored", "")],
        "note_display": [("note_tsearch_stored", "")],
        "rs_uri_display": [("rs_uri_a", "")],
    }
    return FieldMapConfig(
        renames=renames,
        unmapped="drop",
        specials=_aspace_specials(),
        header_fn=_aspace_headers,
        header_driver_fields=("format_facet",),
    )


# --------------------------- avalon policy ---------------------------------

_AVALON_ID_RE = re.compile(r"^avalon:\d{1,8}$")

_AVALON_ROLES = {
    "act_display": " (actor)",
    "arr_display": " (arranger)",
    "aus_display": " (screenwriter)",
    "aut_display": "",
    "cmp_display": " (composer)",
    "cnd_display": " (conductor)",
    "cng_display": " (cinematographer)",
    "cre_display": " (creator)",
    "ctb_display": " (contributor)",
    "dst_display": " (distributor)",
    "edt_display": " (editor)",
    "hst_display": " (host)",
    "itr_display": " (instrumentalist)",
    "ive_display": " (interviewer)",
    "mod_display": " (moderator)",
    "msd_display": " (musical director)",
    "mus_display": " (musician)",
    "nrt_display": " (narrator)",
    "pan_display": " (panelist)",
    "pre_display": " (presenter)",
    "prn_display": " (production company)",
    "pro_display": " (producer)",
    "rcd_display": " (recordist)",
    "sng_display": " (singer)",
    "spk_display": " (speaker)",
}


def _avalon_headers(doc_fields: dict[str, list[str]], record_date: str):
    out = [
        ("circulating_f", "true"),
        ("source_f_stored", "Avalon"),
        ("source_f_stored", "UVA Library Digital Repository"),
        ("uva_availability_f_stored", "Online"),
        ("anon_availability_f_stored", "Online"),
        ("record_date_stored", record_date),
    ]
    ids = doc_fields.get("id", [])
    solr_id = ids[0] if ids else ""
    avalon_id = solr_id if _AVALON_ID_RE.match(solr_id) else solr_id[7:]
    out.append(
        ("url_str_stored", f"https://avalon.lib.virginia.edu/media_objects/{avalon_id}")
    )
    out.append(("data_source_str_stored", "avalon"))
    formats = doc_fields.get("format_facet", [])
    audio = "Streaming Audio" in formats
    video = "Online Video" in formats
    title_sort = doc_fields.get("title_sort_facet", [])
    title = _normalize_space(title_sort[0]) if title_sort else ""
    authors = doc_fields.get("author_facet", [])
    author = _normalize_space(authors[0]) if authors else ""
    if audio and not video:
        out += [
            ("url_label_str_stored", "Listen Online"),
            ("pool_f", "music_recordings"),
            ("work_title3_key_ssort", _translate(title, ' "', "__") + "//MusicRecording"),
            (
                "work_title2_key_ssort",
                _translate(title, ' "', "__")
                + "/"
                + _translate(author, " ", "_")
                + "/MusicRecording",
            ),
        ]
    if video:
        out += [
            ("url_label_str_stored", "Watch Online"),
            ("pool_f", "video"),
            ("work_title3_key_ssort", _translate(title, ' "', "__") + "//video"),
            (
                "work_title2_key_ssort",
                _translate(title, ' "', "__")
                + "/"
                + _translate(author, " ", "_")
                + "/video",
            ),
        ]
    out += [
        ("uva_availability_f_stored", "On shelf"),
        ("anon_availability_f_stored", "On shelf"),
    ]
    return out


def avalon_field_map() -> FieldMapConfig:
    """avalon-solr-v3-to-v4.xsl:6-57 rename table (incl. role suffixes) +
    catch-all policy + special templates."""
    renames = {
        "id": [("id", "")],
        "part_pid_display": [("identifier_e_stored", "")],
        "shadowed_location_facet": [("shadowed_location_f", "")],
        "title_display": [("title_tsearch_stored", "")],
        "author_added_entry_text": [("author_added_entry_tsearchf_stored", "")],
        "thumbnail_url_display": [("thumbnail_url_stored", "")],
        "format_facet": [("format_f_stored", "")],
        "library_facet": [("library_f_stored", "")],
        "subject_facet": [("subject_tsearchf_stored", "")],
        "extent_display": [("extent_tsearch_stored", "")],
        "issued_date_display": [("published_display_tsearch_stored", "")],
        "note_display": [("note_tsearch_stored", "")],
        "rs_uri_display": [("rs_uri_a", "")],
        "duration_display": [("video_run_time_stored", "")],
        "genre_display": [("topic_form_genre_tsearch_stored", "")],
        "publisher_display": [("publisher_name_tsearch_stored", "")],
        "digital_collection_facet": [("digital_collection_f", "")],
        "language_facet": [("language_f", "")],
        "abstract_display": [("notes", "")],
        "toc_display": [("title_notes_a", "")],
        "drt_display": [("author_director_a", "")],
        "prf_display": [("performers_a", "")],
    }
    for v3, suffix in _AVALON_ROLES.items():
        renames[v3] = [("author_tsearchf_stored", suffix)]

    def year_multisort(v: str) -> list[tuple[str, str]]:
        return [("published_date", v + "-01-01T00:00:00Z")]

    return FieldMapConfig(
        renames=renames,
        unmapped="avalon_tsearch",
        specials={"year_multisort_i": year_multisort},
        header_fn=_avalon_headers,
        header_driver_fields=("format_facet", "id", "title_sort_facet", "author_facet"),
    )


# --------------------------- the operator ----------------------------------


def apply_field_map_rows(df: pd.DataFrame, cfg: FieldMapConfig) -> pd.DataFrame:
    """Row-wise half: renames + suffixes + specials + unmapped policy.

    Pure per-row, safe in any batching. Columns in/out:
    (doc_id, field, pos, value).
    """
    fields = df["field"].to_numpy()
    special_mask = (
        np.isin(fields, list(cfg.specials.keys()))
        if cfg.specials
        else np.zeros(len(df), dtype=bool)
    )
    out_doc, out_field, out_pos, out_value = [], [], [], []

    # specials (small fraction of rows; per-row python over just those)
    if special_mask.any():
        sub = df[special_mask]
        for doc_id, f, pos, v in zip(
            sub["doc_id"], sub["field"], sub["pos"], sub["value"]
        ):
            for nf, nv in cfg.specials[f](v):
                out_doc.append(doc_id)
                out_field.append(nf)
                out_pos.append(pos)
                out_value.append(nv)

    rest = df[~special_mask]
    # vectorized rename join (a v3 field may map to several v4 targets)
    ren_rows = [
        {"field": v3, "_v4": v4, "_suffix": suf}
        for v3, targets in cfg.renames.items()
        for v4, suf in targets
    ]
    ren = pd.DataFrame(ren_rows, columns=["field", "_v4", "_suffix"])
    merged = rest.merge(ren, on="field", how="left")
    mapped = merged[merged["_v4"].notna()].copy()
    mapped["value"] = np.where(
        mapped["_suffix"] != "", mapped["value"] + mapped["_suffix"], mapped["value"]
    )
    mapped["field"] = mapped["_v4"]

    parts = [mapped[["doc_id", "field", "pos", "value"]]]
    if out_doc:
        parts.append(
            pd.DataFrame(
                {"doc_id": out_doc, "field": out_field, "pos": out_pos, "value": out_value}
            )
        )
    if cfg.unmapped != "drop":
        unmapped = merged[merged["_v4"].isna()].copy()
        # fields consumed by specials were excluded above; everything else
        # unmapped goes to the catch-all searchable field (avalon policy)
        unmapped["field"] = cfg.unmapped
        parts.append(unmapped[["doc_id", "field", "pos", "value"]])
    out = pd.concat(parts, ignore_index=True)
    return out.astype({"doc_id": object, "field": object, "value": object})


def build_header_rows(
    driver_df: pd.DataFrame, cfg: FieldMapConfig, record_date: str
) -> pd.DataFrame:
    """Per-doc header half. ``driver_df`` holds ONLY the driver fields for a
    set of complete docs (each doc's driver rows together — guaranteed by the
    groupby upstream)."""
    rows_doc, rows_field, rows_value = [], [], []
    order = driver_df.sort_values(["doc_id", "field", "pos"])
    for doc_id, g in order.groupby("doc_id", sort=False):
        doc_fields = {f: sub["value"].tolist() for f, sub in g.groupby("field", sort=False)}
        for nf, nv in cfg.header_fn(doc_fields, record_date):
            rows_doc.append(doc_id)
            rows_field.append(nf)
            rows_value.append(nv)
    return pd.DataFrame(
        {
            "doc_id": rows_doc,
            "field": rows_field,
            "pos": np.zeros(len(rows_doc), dtype=np.int64),
            "value": rows_value,
        }
    )


def field_map_dataset(
    ds, cfg: FieldMapConfig, record_date: str, all_doc_ids=None,
    n_docs_hint: int | None = None,
):
    """Full operator over a long-table Dataset (doc_id, field, pos, value).

    Row-wise pass streams; the header pass shuffles only the driver-field
    subset (plus a doc-id roster so docs with no driver fields still get
    their constant headers).

    ``all_doc_ids``: optional Dataset of (doc_id) covering every doc (e.g.
    ``ds.unique("doc_id")`` or the source-of-truth roster); if None it is
    derived with a distinct over ``ds`` (an extra small shuffle).

    ``n_docs_hint``: when provided and small (< 100k docs), the header pass
    runs in one task over the collected driver rows instead of a
    per-doc-group shuffle — Ray pays a Python call per group, and the
    driver-field subset is tiny by construction.
    """
    import ray.data  # noqa: F401

    mapped = ds.map_batches(
        lambda df: apply_field_map_rows(df, cfg), batch_format="pandas"
    )

    driver = ds.map_batches(
        lambda df: df[df["field"].isin(list(cfg.header_driver_fields))],
        batch_format="pandas",
    )

    if n_docs_hint is not None and n_docs_hint < 100_000:
        ddf = driver.to_pandas()
        if all_doc_ids is not None:
            roster_ids = pd.unique(all_doc_ids.to_pandas()["doc_id"])
        else:
            roster_ids = pd.unique(ds.to_pandas()["doc_id"])
        if len(ddf) == 0:  # no doc has any driver field
            ddf = pd.DataFrame(columns=["doc_id", "field", "pos", "value"])
        hdr = build_header_rows(ddf, cfg, record_date)
        missing = sorted(set(roster_ids) - set(hdr["doc_id"].unique()))
        extra_rows = []
        for doc_id in missing:
            for nf, nv in cfg.header_fn({}, record_date):
                extra_rows.append((doc_id, nf, 0, nv))
        if extra_rows:
            hdr = pd.concat(
                [hdr, pd.DataFrame(extra_rows, columns=["doc_id", "field", "pos", "value"])],
                ignore_index=True,
            )
        hdr["pos"] = hdr["pos"].astype(np.int64)
        return mapped.union(ray.data.from_pandas(hdr))
    if all_doc_ids is None:
        roster = ds.map_batches(
            lambda df: df[["doc_id"]].drop_duplicates(), batch_format="pandas"
        )
    else:
        roster = all_doc_ids
    # roster rows carry a sentinel field so every doc appears in the groupby
    roster_rows = roster.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].drop_duplicates(),
                "field": "__roster__",
                "pos": np.int64(0),
                "value": "",
            }
        ),
        batch_format="pandas",
    )

    def headers_for_group(g: pd.DataFrame) -> pd.DataFrame:
        doc_id = g["doc_id"].iloc[0]
        real = g[g["field"] != "__roster__"]
        if len(real):
            return build_header_rows(real, cfg, record_date)
        # doc with no driver fields: constant headers from an empty field dict
        hdr = cfg.header_fn({}, record_date)
        return pd.DataFrame(
            {
                "doc_id": [doc_id] * len(hdr),
                "field": [f for f, _ in hdr],
                "pos": np.zeros(len(hdr), dtype=np.int64),
                "value": [v for _, v in hdr],
            }
        )

    headers = (
        driver.union(roster_rows)
        .groupby("doc_id")
        .map_groups(headers_for_group, batch_format="pandas")
    )
    return mapped.union(headers)
