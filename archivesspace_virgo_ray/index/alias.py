"""Collection aliases (the Solr CREATEALIAS / blue-green swap surface):
a named pointer file that resolves to a concrete index directory, swapped
atomically with ``os.replace`` — readers either see the old index or the
new one, never a mix.

This is the publish step a 100 TB reindex actually uses: build the new
index beside the live one (or ``restore_index`` a snapshot), validate it,
then ``set_alias`` — queries through the alias flip atomically, and
because ``get_pool`` fingerprints the RESOLVED directory, the next query
pool warms against the new index automatically while the old one stays
intact for rollback (swap back the same way).
"""

from __future__ import annotations

import json
import os


def _alias_path(root: str, name: str) -> str:
    return os.path.join(root, f"alias-{name}.json")


def set_alias(root: str, name: str, index_dir: str) -> None:
    """Point ``name`` at ``index_dir`` (atomic pointer replace). ``root``
    is the directory that holds alias files — typically the parent of the
    index generations it switches between."""
    if not os.path.isdir(index_dir):
        raise ValueError(f"alias target {index_dir} is not a directory")
    p = _alias_path(root, name)
    os.makedirs(root, exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"index_dir": os.path.abspath(index_dir)}, f)
    os.replace(tmp, p)


def resolve_alias(root: str, name: str) -> str:
    """-> the concrete index directory the alias points at."""
    with open(_alias_path(root, name)) as f:
        return json.load(f)["index_dir"]


def get_pool_by_alias(root: str, name: str):
    """Resolve the alias and hand out the (cached, staleness-fingerprinted)
    query pool for the CURRENT target — after a swap the next call returns
    a pool for the new index; the old pool ages out of the LRU."""
    from .query import get_pool

    return get_pool(resolve_alias(root, name))
