"""End-to-end incremental reindex — the §3.1 flagship entry point
(IndexRecords.main, IndexRecords.java:32-116) as one composed Ray pipeline:

1. **discovery**: mtime-window query + change-propagation closure (W1/W2)
   → dirty ref Dataset (or an explicit ref list — the CLI override,
   IndexRecords.java:76-81);
2. **build**: dirty records → flagship doc builder (M3, joins J1-J7,
   predicates M7, error side-channel M17) → long doc table;
3. **sinks**: published docs parquet (K1 canonical) under the dated layout
   (K6, commit-after-publish), plus the MARC branch for special-collections
   refs (K3/M21);
4. **report**: counters per the reference's run report (K7).

The reference runs this loop single-threaded with per-record HTTP; here each
stage is a streaming Dataset transform and the loop disappears.
"""

from __future__ import annotations

import pandas as pd

from .docbuilder import DimTables, build_solr_docs
from .docpipe import dirty_set
from .marc import circulation_records_batch, special_collections_only
from .publish import publish_docs


def run_incremental_reindex(
    records_ds,
    updates_ds,
    repo_children_ds,
    dims: DimTables,
    *,
    watermark,
    now_year: int,
    out_root: str,
    run_stamp: str,
    explicit_refs: list[str] | None = None,
) -> dict:
    """Returns the run report dict. ``records_ds`` must carry the
    archives_record schema with a ``uri`` column."""
    import ray

    # 1. discovery (or CLI override)
    if explicit_refs is not None:
        dirty = set(explicit_refs)
    else:
        dirty_ds = dirty_set(updates_ds, repo_children_ds, watermark)
        dirty = {r["ref"] for r in dirty_ds.take_all()}
        # NOTE: at 100 TB the dirty set joins against records instead of
        # broadcasting; broadcast matches the reference's regime
        # (thousands of refs per run, IndexRecords.java — Solr page 100).
    dirty_ref = ray.put(dirty)

    def only_dirty(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dirty_ref)
        return df[df["uri"].isin(d)].reset_index(drop=True)

    dirty_records = records_ds.map_batches(only_dirty, batch_format="pandas")

    # 2. flagship doc build with error side-channel
    docs, errors = build_solr_docs(dirty_records, dims, now_year)

    # 3a. publish canonical docs (dated layout, commit-after-publish)
    out_dir = publish_docs(docs, out_root, "aspace", run_stamp)

    # 3b. MARC branch: special-collections refs only (M21)
    sc = special_collections_only(dirty_records, uri_col="uri")

    def to_marc(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                columns=["uri", "f001", "f245_ind2", "f245_a", "f590_a", "marc21", "marcxml"]
            )
        from .docbuilder import _call_number

        src = pd.DataFrame(
            {
                "uri": df["uri"],
                "title": df["title"],
                "call_number": [_call_number(r) for r in df.to_dict("records")],
                "containers": [
                    [
                        {
                            "display_string": dims.containers[i["top_container_ref"]]["display_string"],
                            "barcode": dims.containers[i["top_container_ref"]].get("barcode"),
                            "uri": dims.containers[i["top_container_ref"]]["uri"],
                        }
                        for i in (r.get("instances") or [])
                        if i and i.get("top_container_ref") in dims.containers
                    ]
                    for r in df.to_dict("records")
                ],
            }
        )
        out = circulation_records_batch(src)
        return out.drop(columns=["f949"])

    marc = sc.map_batches(to_marc, batch_format="pandas")
    marc_out = publish_docs(marc, out_root, "marc", run_stamp)

    # 4. run report (K7: reindexed count, error count, exit-code semantics)
    err_rows = errors.to_pandas()
    import pyarrow.parquet as pq
    import glob
    import os

    doc_files = glob.glob(os.path.join(out_dir, "*.parquet"))
    seen: set = set()
    for f in doc_files:
        seen.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    n_docs = len(seen)
    report = {
        "dirty_refs": len(dirty),
        "reindexed_docs": n_docs,
        "errors": len(err_rows),
        "error_rows": err_rows.to_dict("records"),
        "docs_dir": out_dir,
        "marc_dir": marc_out,
        "exit_code": 1 if len(err_rows) else 0,  # IndexRecords.java:110-115
    }
    return report
