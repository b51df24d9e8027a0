"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``     : flagship pipeline on sf0.001 — build the inverted index
                    with the full engine and run the fixed BM25 query set.
- ``queries()``   : one entry per implemented operator/pipeline (SURVEY.md §2
                    + training-data ops).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible entry
                    (column names match the Ray results exactly).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from archivesspace_virgo_ray.pipelines.queries import (  # noqa: E402
    QUERIES,
    bm25_topk_docs,
    oracle_sql_map,
)


def entry() -> Any:
    """Flagship: index build + distributed BM25 top-k on sf0.001."""
    return bm25_topk_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
