"""Document-pipeline operators: the reference's record transforms, set-oriented.

Operates on the ``archives_record`` Arrow shape (FIXTURES.md §2): one row per
record with nested list columns, plus small dimension tables. Every
row-at-a-time ``resolveReference`` lookup in the reference becomes either a
broadcast dict (small dims) or an explode→join→re-aggregate (SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# M7 — publish / shadow predicates per record type.
#   resource:        publish && processing_status=="completed" && has containers
#                    (ASpaceCollection.isPublished, ASpaceCollection.java:45-49)
#   accession:       published = publish && has containers; shadowed unless
#                    published and NO published related collection record
#                    (ASpaceAccession.java:32-52 — the left-semi-join rule J4)
#   archival_object: publish (ASpaceArchivalObject.java:30-32)
#   top_container:   is_linked_to_published_record (ASpaceTopContainer.java:43-46)
#   digital_object:  publish (ASpaceDigitalObject.java:41-44)
# Emitted as shadowed_location_facet HIDDEN/VISIBLE (ASpaceObject.java:256-257).
# ---------------------------------------------------------------------------


def _has_container(instances) -> bool:
    if instances is None:
        return False
    return any(
        i is not None and i.get("top_container_ref") not in (None, "")
        for i in instances
    )


def resource_is_published(df: pd.DataFrame) -> np.ndarray:
    return (
        df["publish"].fillna(False).to_numpy(dtype=bool)
        & (df["processing_status"] == "completed").to_numpy(dtype=bool)
        & df["instances"].map(_has_container).to_numpy(dtype=bool)
    )


def accession_is_published(df: pd.DataFrame) -> np.ndarray:
    return df["publish"].fillna(False).to_numpy(dtype=bool) & df["instances"].map(
        _has_container
    ).to_numpy(dtype=bool)


def shadowed_flags(df: pd.DataFrame, published_resource_uris: set[str]) -> np.ndarray:
    """Vector of bool (True = shadowed) for a mixed-type record batch.

    ``published_resource_uris`` is the broadcast small side of the J4
    semi-join (set of resource uris passing ``resource_is_published``).
    """
    out = np.ones(len(df), dtype=bool)
    rtype = df["record_type"].to_numpy()
    pub = df["publish"].fillna(False).to_numpy(dtype=bool)

    res_mask = rtype == "resource"
    if res_mask.any():
        out[res_mask] = ~resource_is_published(df[res_mask])

    acc_mask = rtype == "accession"
    if acc_mask.any():
        sub = df[acc_mask]
        published = accession_is_published(sub)
        has_pub_related = sub["related_resources"].map(
            lambda refs: bool(refs is not None)
            and any(r in published_resource_uris for r in refs)
        ).to_numpy(dtype=bool)
        # ASpaceAccession.isShadowed: !(isPublished && !hasPublishedCollectionRecord)
        out[acc_mask] = ~(published & ~has_pub_related)

    for t in ("archival_object", "digital_object"):
        m = rtype == t
        if m.any():
            out[m] = ~pub[m]
    return out


def add_shadow_facet(ds, published_resource_uris: set[str]):
    """Dataset operator: adds shadowed_location_facet HIDDEN/VISIBLE."""
    import ray

    uris_ref = ray.put(published_resource_uris)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        shadowed = shadowed_flags(df, ray.get(uris_ref))
        df = df.copy()
        df["shadowed_location_facet"] = np.where(shadowed, "HIDDEN", "VISIBLE")
        return df

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# M8 / M11 — subject & creator enrichment: explode refs → broadcast dim
# lookup → keep published → re-aggregate per record, input order preserved
# (ASpaceObject.java:271-282, :356-374). Dim tables are broadcast once
# (ray.put) — the J7 lookups without a shuffle.
# ---------------------------------------------------------------------------


def enrich_refs(ds, dim_df: pd.DataFrame, list_col: str, out_col: str, role: str | None = None):
    """dim_df: (ref, title, publish). role: filter linked_agents by role."""
    import ray

    dim = {
        r: t
        for r, t, p in zip(dim_df["ref"], dim_df["title"], dim_df["publish"])
        if p
    }
    dim_ref = ray.put(dim)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        df = df.copy()

        def resolve(refs):
            if refs is None:
                return []
            out = []
            for r in refs:
                if role is not None:
                    if r is None or r.get("role") != role:
                        continue
                    key = r.get("ref")
                else:
                    key = r
                title = d.get(key)
                if title is not None:
                    out.append(title)
            return out

        df[out_col] = df[list_col].map(resolve)
        return df

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# M9 — extent formatter (ASpaceObject.java:285-300):
# number + " " + extent_type.replace("_"," ") + (" (container_summary)")?
# ---------------------------------------------------------------------------


def format_extents(extents) -> list[str]:
    if extents is None:
        return []
    out = []
    for e in extents:
        if e is None:
            continue
        s = f"{e.get('number')} {str(e.get('extent_type', '')).replace('_', ' ')}"
        cs = e.get("container_summary")
        if cs is not None:
            s += f" ({cs})"
        out.append(s)
    return out


# ---------------------------------------------------------------------------
# M14 — notes aggregation (ASpaceObject.java:441-468): published notes →
# published subnote contents joined with "\n"; type=="scopecontent" also →
# note_display; all published → note_text.
# ---------------------------------------------------------------------------


def aggregate_notes(notes) -> dict[str, list[str]]:
    display, text = [], []
    if notes:
        for n in notes:
            if n is None or not n.get("publish"):
                continue
            subs = [
                s.get("content")
                for s in (n.get("subnotes") or [])
                if s and s.get("publish") and s.get("content") is not None
            ]
            if not subs:
                continue
            joined = "\n".join(subs)
            if n.get("type") == "scopecontent":
                display.append(joined)
            text.append(joined)
    return {"note_display": display, "note_text": text}


# ---------------------------------------------------------------------------
# W2 — change-propagation dirty-set expansion (IndexRecords.java:136-180).
# Input: an updates table (id, types:list, user_mtime, ancestors:list,
# related_accession_uris:list, collection_uri_u_sstr:list) + a repo-children
# edge table. Output: deduped set of refs to reindex. The if/else chain in
# the reference makes the type checks EXCLUSIVE in priority order
# resource > archival_object > top_container.
# ---------------------------------------------------------------------------

_RESOURCE_ID_RE = r"^/?repositories/\d+/resources/\d+$"


def dirty_set(updates_ds, repo_children_ds, watermark) -> "object":
    """Returns a Dataset with one column ``ref`` (distinct).

    updates_ds: the solr-ish updates table; repo_children_ds: (repo_ref,
    child_ref) edges enumerating each repository's accessions+resources
    (IndexRecords.java:64-70). watermark: pd.Timestamp lower bound (the
    NOW-xHOUR window; -1/full = pass pd.Timestamp.min).
    """
    import re

    res_re = re.compile(_RESOURCE_ID_RE)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["user_mtime"] >= watermark]
        refs: list[str] = []
        for _, row in df.iterrows():
            types = set(row["types"] or [])
            if "resource" in types:
                refs.append(row["id"])
                refs.extend(row["related_accession_uris"] or [])
            elif "archival_object" in types:
                refs.extend(
                    a for a in (row["ancestors"] or []) if res_re.match(a)
                )
            elif "top_container" in types:
                refs.extend(row["collection_uri_u_sstr"] or [])
        return pd.DataFrame({"ref": pd.Series(refs, dtype=object)})

    def repo_updates(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["user_mtime"] >= watermark) & df["types"].map(
            lambda t: "repository" in (t or [])
        )
        return pd.DataFrame({"repo_ref": df.loc[m, "id"].astype(object)})

    direct = updates_ds.map_batches(expand, batch_format="pandas")
    dirty_repos = updates_ds.map_batches(repo_updates, batch_format="pandas")
    # broadcast the (small) dirty repo set; children of dirty repos join in
    import ray

    dirty_repo_set = set(
        r["repo_ref"] for r in dirty_repos.take_all()
    )  # repos are few (reference: a handful)
    repos_ref = ray.put(dirty_repo_set)

    def children_of_dirty(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(repos_ref)
        return pd.DataFrame(
            {"ref": df.loc[df["repo_ref"].isin(s), "child_ref"].astype(object)}
        )

    from_repos = repo_children_ds.map_batches(children_of_dirty, batch_format="pandas")
    return distinct(direct.union(from_repos), "ref")


_DEDUP_BUCKETS = 256


def _key_bucket(cols: list[str]):
    """map_batches fn adding ``__kb__`` = row-hash(cols) % _DEDUP_BUCKETS —
    equal keys share a bucket, so per-bucket dedup is globally exact while
    the groupby stays BOUNDED (Ray pays a Python call per group; grouping
    by a ~row-cardinality key would pay it per distinct value)."""
    import pandas as pd

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[cols], index=False)
        df = df.copy()
        df["__kb__"] = (
            h.to_numpy("uint64") % np.uint64(_DEDUP_BUCKETS)
        ).astype(np.int64)
        return df

    return fn


def distinct(ds, col: str):
    """Dataset-valued distinct on one column (``ds.unique`` returns a driver
    list in this Ray version; this stays a Dataset — A1/O5 dedup shuffle).
    Hash-bucketed: the shuffle key is bounded, the per-group dedup is
    vectorized ``drop_duplicates`` (never a call per distinct value)."""
    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(col)[[col]]

    return (
        ds.map_batches(_key_bucket([col]), batch_format="pandas")
        .groupby("__kb__")
        .map_groups(dd, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# O4 / O5 — exact dedup, first-wins by key (dedupeContainerArray,
# ASpaceObject.java:497-509; ref-set dedup IndexRecords.java:63-74).
# Hash-partition by key then per-group first in a deterministic order.
# ---------------------------------------------------------------------------


def dedupe_first(ds, key: str, order_col: str):
    """Keep, per key, the row with the smallest order_col (deterministic
    'first'); hash-bucketed groupby (equal keys co-locate), per-bucket
    first-wins VECTORIZED (one sort + drop_duplicates, never a Python call
    per key)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        return g.drop_duplicates(key, keep="first").drop(columns="__kb__")

    return (
        ds.map_batches(_key_bucket([key]), batch_format="pandas")
        .groupby("__kb__")
        .map_groups(first, batch_format="pandas")
    )


# K3/K4 — MARC circulation records live in pipelines/marc.py (faithful port
# of ASpaceObject.writeCirculationRecord incl. ISO 2709 + MARCXML output).
