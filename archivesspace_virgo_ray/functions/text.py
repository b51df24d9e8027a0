"""Scalar text kernels from the reference's document pipeline.

Each mirrors a cited reference behavior (SURVEY.md §2.3/§2.8) but is
re-expressed as a batch kernel usable inside ``map_batches``.
"""

from __future__ import annotations

import re

import numpy as np

# ---------------------------------------------------------------------------
# M4 — id normalization (ASpaceObject.getId, ASpaceObject.java:205-207):
# uppercase, strip '-', '/', ' '.
# ---------------------------------------------------------------------------
_ID_STRIP = re.compile(r"[-/ ]")


def normalize_id(values) -> np.ndarray:
    return np.fromiter(
        (_ID_STRIP.sub("", v).upper() if v is not None else None for v in values),
        dtype=object,
        count=len(values),
    )


# ---------------------------------------------------------------------------
# M5 — call-number assembly (ASpaceObject.getCallNumber, :213-224):
# concat non-null id_0..id_5 joined by "-", trimmed.
# ---------------------------------------------------------------------------
def call_number(*id_cols) -> np.ndarray:
    n = len(id_cols[0])
    out = np.empty(n, dtype=object)
    for i in range(n):
        parts = [c[i] for c in id_cols if c[i] is not None and c[i] != ""]
        out[i] = "-".join(parts).strip()
    return out


# ---------------------------------------------------------------------------
# M6 — short-id codec (SolrHelper.getIdFromRef :105-111 / getRefIdForFile
# :113-120): "/repositories/3/resources/754" ⇄ "as:3r754".
# The reference codec covers ONLY accessions (a) and resources (r) and
# raises for anything else (`as:\d+[ar]\d+` guard) — it never emits docs for
# other types. This port is a documented SUPERSET: archival_objects→o,
# top_containers→c, digital_objects→d reuse the same scheme so every node
# type has a stable short id; unmatched refs map to None (error channel).
# ---------------------------------------------------------------------------
_REF_RE = re.compile(r"^/repositories/(\d+)/([a-z_]+)/(\d+)$")
_SHORT_RE = re.compile(r"^as:(\d+)([a-z])(\d+)$")
_TYPE_TO_LETTER = {
    "resources": "r",
    "accessions": "a",
    "archival_objects": "o",
    "top_containers": "c",
    "digital_objects": "d",
}
_LETTER_TO_TYPE = {v: k for k, v in _TYPE_TO_LETTER.items()}


def ref_to_short_id(refs) -> np.ndarray:
    out = np.empty(len(refs), dtype=object)
    for i, ref in enumerate(refs):
        m = _REF_RE.match(ref) if ref else None
        if m and m.group(2) in _TYPE_TO_LETTER:
            out[i] = f"as:{m.group(1)}{_TYPE_TO_LETTER[m.group(2)]}{m.group(3)}"
        else:
            out[i] = None
    return out


def short_id_to_ref(short_ids) -> np.ndarray:
    out = np.empty(len(short_ids), dtype=object)
    for i, sid in enumerate(short_ids):
        m = _SHORT_RE.match(sid) if sid else None
        if m and m.group(2) in _LETTER_TO_TYPE:
            out[i] = f"/repositories/{m.group(1)}/{_LETTER_TO_TYPE[m.group(2)]}/{m.group(3)}"
        else:
            out[i] = None
    return out


# ---------------------------------------------------------------------------
# SolrHelper.isUniqueVirgoId (:122-130): call-number-shaped ids that map to
# distinct Virgo records (no spaces/slashes; known prefixes).
# ---------------------------------------------------------------------------
_VIRGO_PREFIXES = ("VIU", "MSS", "VACVUCN", "RG_", "MS_")


def is_unique_virgo_id(id_: str) -> bool:
    if " " in id_ or "/" in id_:
        return False
    return id_.startswith(_VIRGO_PREFIXES)


# ---------------------------------------------------------------------------
# O1 — natural-order sort KEY encoding StringNaturalCompare.java:8-145
# semantics so ``ds.sort(key)`` reproduces the comparator's order (a
# comparator can't run on a distributed sort; a key encoding can).
#
# Comparator semantics (strnatcmp0): whitespace skipped; case folded to
# upper; digit runs compared as numbers — if either run has a leading zero
# the runs compare left-aligned digit-by-digit ("fractional",
# compareLeft, :57-83), else longest-run-wins then first-diff
# ("compareRight", :15-54).
#
# Key encoding per token (whitespace dropped; digit runs vs single chars):
#   non-digit char c   -> upper(c)
#   digit run, leading zero  -> '0' + '1' + digits + '!'
#   digit run, no leading 0  -> '0' + '2' + <12-digit zero-padded length>
#                               + digits
# Why it matches: the '0' class byte makes run-vs-char order agree with the
# comparator (any digit compares to any non-digit char identically, since
# digits occupy one contiguous code range); kind byte '1'<'2' makes
# zero-leading runs sort below value runs (first-digit rule); '!' < '0'
# makes a shorter fractional prefix sort first (compareLeft end-of-digits
# rule); the length field implements longest-run-wins.
# ---------------------------------------------------------------------------
_NAT_TOKEN = re.compile(r"(\d+)|(\S)")


def _nat_key_one(s: str) -> str:
    parts: list[str] = []
    for digits, ch in _NAT_TOKEN.findall(s):
        if digits:
            if digits[0] == "0":
                parts.append("01" + digits + "!")
            else:
                parts.append("02" + f"{len(digits):012d}" + digits)
        else:
            parts.append(ch.upper())
    return "".join(parts)


def natural_sort_key(values) -> np.ndarray:
    return np.fromiter(
        ("" if v is None else _nat_key_one(v) for v in values),
        dtype=object,
        count=len(values),
    )


# ---------------------------------------------------------------------------
# M10 — date parsing + year bucketing (ASpaceObject.java:303-353).
# expression "YYYY" -> that year; "YYYY-YYYY" -> the END year (substring(5));
# first parsed year per record -> date_multisort_i. Cumulative age buckets
# emitted against a PINNED "now" year (the reference uses wall clock,
# Calendar.getInstance() :322 — pinned here for determinism).
# ---------------------------------------------------------------------------
_YEAR_RE = re.compile(r"^\d{4}$")
_RANGE_RE = re.compile(r"^\d{4}-\d{4}$")


def parse_expression_year(expressions) -> np.ndarray:
    """-> int64 array, -1 where unparseable (mirrors silent skip)."""
    out = np.full(len(expressions), -1, dtype=np.int64)
    for i, e in enumerate(expressions):
        if e is None:
            continue
        if _YEAR_RE.match(e):
            out[i] = int(e)
        elif _RANGE_RE.match(e):
            out[i] = int(e[5:])
    return out


def published_date_buckets(years: np.ndarray, now_year: int) -> list[list[str]]:
    """Cumulative age-bucket facet values per year (ASpaceObject.java:322-337).

    Faithful to the reference: an unparseable expression yields year == -1,
    which still passes its ``year != 0`` guard, so it buckets as
    "More than 50 years ago" (yearsAgo = now + 1)."""
    out: list[list[str]] = []
    for y in years:
        age = now_year - int(y)
        buckets = []
        if age > 50:
            buckets.append("More than 50 years ago")
        if age <= 50:
            buckets.append("Last 50 years")
        if age <= 10:
            buckets.append("Last 10 years")
        if age <= 3:
            buckets.append("Last 3 years")
        if age <= 1:
            buckets.append("Last 12 months")
        out.append(buckets)
    return out


# ---------------------------------------------------------------------------
# O6 — MARC title non-filing indicator (ASpaceObject.java:660-668):
# leading "A " -> '2', "The " -> '4', else '0'.
# ---------------------------------------------------------------------------
def nonfiling_indicator(titles) -> np.ndarray:
    out = np.empty(len(titles), dtype=object)
    for i, t in enumerate(titles):
        if t is None:
            out[i] = "0"
        elif t.startswith("The "):
            out[i] = "4"
        elif t.startswith("A "):
            out[i] = "2"
        else:
            out[i] = "0"
    return out


# ---------------------------------------------------------------------------
# M16 — library normalizer (ASpaceObject.getLibrary :551-557;
# UvaHelper.normalizeLocation :8-20). Unknown repo name raises in the
# reference; here unknown maps to None and the caller routes it to the
# error side-channel (M17).
# ---------------------------------------------------------------------------
LIBRARY_MAP = {
    "Albert and Shirley Small Special Collections Library": "Special Collections",
    "University of Virginia, Special Collections Dept.": "Special Collections",
    "University of Virginia, Law Library": "Law School",
    "Arthur J. Morris Law Library Special Collections": "Law School",
    "Claude Moore Health Sciences Library": "Health Sciences",
    "The Eleanor Crowder Bjoring Center for Nursing Historical Inquiry": "Nursing",
}


def normalize_library(names) -> np.ndarray:
    return np.fromiter(
        (LIBRARY_MAP.get(n) for n in names), dtype=object, count=len(names)
    )


def extract_manifest_url(location: str) -> str:
    """UvaHelper.extractManifestUrl (UvaHelper.java:23-28): mirador viewer
    URLs carry the manifest after '='."""
    if location.startswith("http://mirador.lib"):
        return location[location.index("=") + 1 :]
    return location
