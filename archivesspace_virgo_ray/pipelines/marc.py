"""MARC circulation records (K3/K4) — faithful port of
ASpaceObject.writeCirculationRecord (ASpaceObject.java:649-692):

- 001 control field = short id of the record uri (SolrHelper codec)
- 245 ind1='0', ind2 = non-filing indicator ("A "→'2', "The "→'4', else '0')
  subfield a = title
- 590 ind1='1' ind2=' ', subfield a = "From ArchivesSpace: " + uri
- one 949 per top container: a = owning call number + " " + display_string
  (ASpaceTopContainer.java:53-55), h = "SC-STACKS-MANUSCRIPT",
  i = barcode or synthesized "AS:{repo}C{id}" (ASpaceTopContainer.java:80-92)

Canonical output is a columnar record (struct/list columns in Parquet); the
ISO 2709 binary and MARCXML renderings are real serializers for conformance
with K3/K4 sinks. MARC is emitted only for special-collections refs
(/repositories/3/…) per M21 (IndexRecords.java:91-93) — the caller filters.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.text import nonfiling_indicator, ref_to_short_id

_TC_RE = re.compile(r"/repositories/(\d+)/top_containers/(\d+)")

FIELD_TERM = "\x1e"
SUBFIELD_DELIM = "\x1f"
RECORD_TERM = "\x1d"


def container_barcode(barcode, container_uri: str) -> str:
    if barcode:
        return barcode
    m = _TC_RE.match(container_uri or "")
    return f"AS:{m.group(1)}C{m.group(2)}" if m else "UNKNOWN"


def circulation_records_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(uri, title, call_number, containers: list<dict display_string,
    barcode, uri>) → columnar MARC record + both serializations."""
    n = len(df)
    f001 = ref_to_short_id(df["uri"].to_numpy())
    ind2 = nonfiling_indicator(df["title"].to_numpy())
    out = pd.DataFrame(
        {
            "uri": df["uri"].to_numpy(),
            "f001": f001,
            "f245_ind2": ind2,
            "f245_a": df["title"].to_numpy(),
            "f590_a": "From ArchivesSpace: " + df["uri"].astype(str),
        }
    )
    f949 = []
    for call_number, containers in zip(df["call_number"], df["containers"]):
        rows = []
        for c in containers or []:
            rows.append(
                {
                    "a": f"{call_number} {c.get('display_string')}",
                    "h": "SC-STACKS-MANUSCRIPT",
                    "i": container_barcode(c.get("barcode"), c.get("uri")),
                }
            )
        f949.append(rows)
    out["f949"] = f949
    out["marc21"] = [marc21_binary(out.iloc[i]) for i in range(n)]
    out["marcxml"] = [marcxml(out.iloc[i]) for i in range(n)]
    return out


def _fields_of(rec) -> list[tuple[str, str]]:
    """(tag, field payload without terminator) in emit order."""
    fields = [("001", rec["f001"] or "")]
    fields.append(
        ("245", f"0{rec['f245_ind2']}{SUBFIELD_DELIM}a{rec['f245_a']}")
    )
    fields.append(("590", f"1 {SUBFIELD_DELIM}a{rec['f590_a']}"))
    for c in rec["f949"]:
        fields.append(
            (
                "949",
                f"  {SUBFIELD_DELIM}a{c['a']}{SUBFIELD_DELIM}h{c['h']}"
                f"{SUBFIELD_DELIM}i{c['i']}",
            )
        )
    return fields


def marc21_binary(rec) -> bytes:
    """ISO 2709 record: leader(24) + directory + data. Lengths in bytes."""
    fields = _fields_of(rec)
    payloads = [(tag, (body + FIELD_TERM).encode("utf-8")) for tag, body in fields]
    directory = bytearray()
    data = bytearray()
    pos = 0
    for tag, body in payloads:
        directory += f"{tag}{len(body):04d}{pos:05d}".encode("ascii")
        data += body
        pos += len(body)
    directory += FIELD_TERM.encode()
    base = 24 + len(directory)
    total = base + len(data) + 1
    # leader: 0-4 length, 5 'n'ew, 6 'p' mixed materials, 7 'c'ollection,
    # 8 ' ', 9 'a' utf-8, 10-11 '22', 12-16 base, 17-19 blanks, 20-23 '4500'
    leader = f"{total:05d}npc a22{base:05d}   4500".encode("ascii")
    assert len(leader) == 24
    return bytes(leader) + bytes(directory) + bytes(data) + RECORD_TERM.encode()


def parse_marc21(blob: bytes) -> list[tuple[str, str]]:
    """Minimal reader (for tests): -> [(tag, body)] without terminators."""
    base = int(blob[12:17])
    directory = blob[24 : base - 1].decode("ascii")
    out = []
    for i in range(0, len(directory), 12):
        tag = directory[i : i + 3]
        length = int(directory[i + 3 : i + 7])
        start = int(directory[i + 7 : i + 12])
        body = blob[base + start : base + start + length].decode("utf-8")
        out.append((tag, body.rstrip(FIELD_TERM)))
    return out


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def marcxml(rec) -> str:
    parts = ['<record xmlns="http://www.loc.gov/MARC21/slim">']
    parts.append(f'<controlfield tag="001">{_esc(rec["f001"] or "")}</controlfield>')

    def datafield(tag, ind1, ind2, subs):
        s = f'<datafield tag="{tag}" ind1="{ind1}" ind2="{ind2}">'
        for code, val in subs:
            s += f'<subfield code="{code}">{_esc(str(val))}</subfield>'
        return s + "</datafield>"

    parts.append(datafield("245", "0", rec["f245_ind2"], [("a", rec["f245_a"])]))
    parts.append(datafield("590", "1", " ", [("a", rec["f590_a"])]))
    for c in rec["f949"]:
        parts.append(
            datafield("949", " ", " ", [("a", c["a"]), ("h", c["h"]), ("i", c["i"])])
        )
    parts.append("</record>")
    return "".join(parts)


def special_collections_only(ds, uri_col: str = "uri"):
    """M21 routing: MARC written only for /repositories/3/… refs
    (IndexRecords.java:91-93, 118-120)."""
    return ds.map_batches(
        lambda df: df[df[uri_col].str.startswith("/repositories/3/")].reset_index(drop=True),
        batch_format="pandas",
    )
