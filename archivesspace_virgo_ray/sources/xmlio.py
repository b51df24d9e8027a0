"""Solr-add XML parsing (S8, XmlHelper.java:23-30) — the inverse of
``pipelines.enrich.render_solr_add_xml``. Used to ingest the reference's
golden v3 fixtures (src/test/resources/v3index/*.xml) into the long doc
model for conformance tests, and as a general XML source kernel."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd


def parse_solr_add_xml(xml_text: str, doc_id: str | None = None) -> pd.DataFrame:
    """One ``<add><doc><field name=..>..</field>...`` document → long rows
    (doc_id, field, pos, value). ``doc_id`` defaults to the doc's ``id``
    field value. ``pos`` is the within-(doc, field) ordinal (fields are
    repeatable — the multimap doc model, ASpaceObject.java:596-604)."""
    root = ET.fromstring(xml_text)
    docs = root.findall(".//doc") if root.tag == "add" else [root]
    rows = []
    for doc in docs:
        fields = [(f.get("name"), f.text or "") for f in doc.findall("field")]
        this_id = doc_id
        if this_id is None:
            this_id = next((v for n, v in fields if n == "id"), None)
        pos_counter: dict[str, int] = {}
        for name, value in fields:
            p = pos_counter.get(name, 0)
            pos_counter[name] = p + 1
            rows.append((this_id, name, p, value))
    out = pd.DataFrame(rows, columns=["doc_id", "field", "pos", "value"])
    out["pos"] = out["pos"].astype(np.int64)
    return out


def read_solr_add_files(paths: list[str]) -> pd.DataFrame:
    frames = []
    for p in paths:
        with open(p, encoding="utf-8") as f:
            frames.append(parse_solr_add_xml(f.read()))
    return pd.concat(frames, ignore_index=True)
