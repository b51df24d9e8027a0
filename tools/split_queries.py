"""One-shot refactoring tool: split pipelines/queries.py (±14k LoC) into
pipelines/oracles/{common,tpch,events,retrieval,curation}.py by DEPENDENCY,
keeping queries.py as the compatibility facade (star re-exports + the two
entry maps), so every entry name, oracle_sql_map() key, and external
`from ...queries import X` keeps working.

Partition rule:
- each ENTRY (a key of QUERIES / oracle_sql_map) is classified into a
  domain by the tables its oracle SQL touches, falling back to name
  heuristics for rows-only entries;
- every other top-level node's domain = the set of domains whose entries
  transitively reference it; exactly one domain -> that file, two or more
  (or zero — shared constants tests import directly) -> common.py;
- source order is preserved inside every output file (module-level
  f-string SQL referencing earlier constants keeps working), and each
  node carries its preceding comment block verbatim.

Run from the repo root:  python tools/split_queries.py
Then:  python tools/check_oracle.py /root/testdata/sf0.001
"""

from __future__ import annotations

import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "archivesspace_virgo_ray/pipelines/queries.py"
OUT_DIR = "archivesspace_virgo_ray/pipelines/oracles"
DOMAINS = ("tpch", "events", "retrieval", "ann", "curation")

_ANN_RE = re.compile(
    r"knn|mmr|ivf|pq_|_pq|embedding|quantiz|centroid|ann_|semantic|"
    r"silhouette|kmeans|label|pca|hybrid|rerank_dense")

# name fallbacks for rows-only entries (no SQL to sniff tables from)
_RETRIEVAL_RE = re.compile(
    r"bm25|topk|facet|spell|percolat|browse|phrase|near_|mlt|dismax|query|"
    r"search|snippet|rerank|hybrid|prf|grouped|cursor|kwic|explain|federat|"
    r"lmd|reshard|marc|fieldmap|docbuilder|index|incremental|realtime|"
    r"dirty|snapshot|alias|collection|fuzzy|regex|terms|suggest|highlight|"
    r"knn|mmr|ivf|pq_|_pq|embedding|quantiz|centroid|ann_")
_EVENTS_RE = re.compile(
    r"event|session|funnel|retention|churn|dau|anomaly|growth|hourly|"
    r"window|trend|transition|conversion")
_TPCH_RE = re.compile(
    r"^q\d|pricing|revenue|supplier|nation|region|customer|orders|lineitem|"
    r"part_|parts|budget|shipped|asof|gini|benford|priority|market|share")


def classify_entry(name: str, sql: str | None) -> str:
    tables = set()
    if sql:
        low = sql.lower()
        for t in ("lineitem", "orders", "customer", "supplier", "nation",
                  "region", "part", "events", "embeddings", "documents"):
            if re.search(rf"\b(from|join)\s+{t}\b", low):
                tables.add(t)
    if tables & {"lineitem", "orders", "customer", "supplier", "nation",
                 "region", "part"}:
        return "tpch"
    if "events" in tables:
        return "events"
    if "embeddings" in tables:
        return "ann"
    if _EVENTS_RE.search(name):
        return "events"
    if _TPCH_RE.search(name):
        return "tpch"
    if _ANN_RE.search(name):
        return "ann"
    if _RETRIEVAL_RE.search(name):
        return "retrieval"
    return "curation"


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # ---- collect top-level nodes -------------------------------------------
    header_nodes = []   # docstring + imports (replicated into every module)
    body_nodes = []     # everything else, in order
    for n in tree.body:
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            header_nodes.append(n)
        elif isinstance(n, ast.Expr) and isinstance(n.value, ast.Constant):
            header_nodes.append(n)  # module docstring
        else:
            body_nodes.append(n)

    def node_names(n) -> list[str]:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            return [n.name]
        if isinstance(n, ast.Assign):
            out = []
            for t in n.targets:
                for x in ast.walk(t):
                    if isinstance(x, ast.Name):
                        out.append(x.id)
            return out
        if isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
            return [n.target.id]
        return []

    defined: dict[str, int] = {}      # name -> body node index
    for i, n in enumerate(body_nodes):
        for nm in node_names(n):
            defined[nm] = i

    def refs(n) -> set[int]:
        out = set()
        for x in ast.walk(n):
            if isinstance(x, ast.Name) and x.id in defined:
                j = defined[x.id]
                if body_nodes[j] is not n:
                    out.add(j)
        return out

    node_refs = [refs(n) for n in body_nodes]

    # ---- the two maps stay in the facade ------------------------------------
    qmap_i = defined["QUERIES"]
    omap_i = defined["oracle_sql_map"]
    facade_idx = {qmap_i, omap_i}

    # entry -> function node, entry -> sql (execute oracle_sql_map via import)
    from archivesspace_virgo_ray.pipelines.queries import (  # noqa: E402
        QUERIES,
        oracle_sql_map,
    )
    sqls = oracle_sql_map()
    entry_domain: dict[str, str] = {
        name: classify_entry(name, sqls.get(name)) for name in QUERIES
    }

    # seed: each entry function node gets its entry's domain
    qmap_node = body_nodes[qmap_i]
    fn_of_entry: dict[str, str] = {}
    # parse the QUERIES dict literal: values are Names
    dict_node = qmap_node.value
    assert isinstance(dict_node, ast.Dict)
    for kn, vn in zip(dict_node.keys, dict_node.values):
        if isinstance(kn, ast.Constant) and isinstance(vn, ast.Name):
            fn_of_entry[kn.value] = vn.id

    domains_of: list[set] = [set() for _ in body_nodes]
    for entry, fname in fn_of_entry.items():
        if fname in defined:
            domains_of[defined[fname]].add(entry_domain[entry])
    # oracle_sql_map's dict: every name inside an entry's VALUE expression
    # (SQL_* constant or _*_sql() builder) seeds with that entry's domain —
    # otherwise map-only SQL constants would all orphan into common
    omap_fn = body_nodes[omap_i]
    for d in ast.walk(omap_fn):
        if isinstance(d, ast.Dict):
            for kn, vn in zip(d.keys, d.values):
                if not (isinstance(kn, ast.Constant) and kn.value in entry_domain):
                    continue
                for x in ast.walk(vn):
                    if isinstance(x, ast.Name) and x.id in defined:
                        domains_of[defined[x.id]].add(entry_domain[kn.value])

    # propagate: a node's domains flow into everything it references
    def propagate():
        changed = True
        while changed:
            changed = False
            for i, rs in enumerate(node_refs):
                if i in facade_idx:
                    continue
                for j in rs:
                    if j in facade_idx:
                        continue
                    before = len(domains_of[j])
                    domains_of[j] |= domains_of[i]
                    if len(domains_of[j]) != before:
                        changed = True

    propagate()
    # orphans (nothing in the entry graph references them — SQL constants
    # tests import, standalone helpers) land in common, and everything THEY
    # reference must be reachable from common: flow a pseudo-domain so a
    # single-domain referee of an orphan is forced into common too.
    for i in range(len(body_nodes)):
        if i not in facade_idx and not domains_of[i]:
            domains_of[i].add("~orphan")
    propagate()

    assign: list[str] = []
    for i in range(len(body_nodes)):
        if i in facade_idx:
            assign.append("facade")
        elif len(domains_of[i]) == 1 and "~orphan" not in domains_of[i]:
            assign.append(next(iter(domains_of[i])))
        else:
            assign.append("common")  # shared or orphan

    # facade-referenced names (map literals reference entry fns by name) are
    # already exported from their domain; nothing extra needed.

    # ---- source slices with leading comments --------------------------------
    def block(i: int) -> str:
        n = body_nodes[i]
        start = n.lineno - 1
        # absorb decorator lines
        for d in getattr(n, "decorator_list", []):
            start = min(start, d.lineno - 1)
        # absorb the contiguous comment block immediately above
        j = start - 1
        while j >= 0 and (lines[j].strip().startswith("#") or not lines[j].strip()):
            if not lines[j].strip():
                # stop at the blank line ABOVE a comment run; include blanks
                # only between comments and the node
                k = j - 1
                if k >= 0 and lines[k].strip().startswith("#"):
                    j -= 1
                    continue
                break
            j -= 1
        start = j + 1
        return "".join(lines[start:n.end_lineno])

    header_src = "".join(
        "".join(lines[h.lineno - 1:h.end_lineno]) for h in header_nodes
        if isinstance(h, (ast.Import, ast.ImportFrom)))
    # oracles/ modules sit one package level deeper than queries.py did —
    # every relative import needs one more leading dot
    header_src = re.sub(r"^from \.", "from ..", header_src,
                        flags=re.MULTILINE)

    os.makedirs(OUT_DIR, exist_ok=True)
    mod_doc = {
        "common": "Shared helpers, constants and multi-domain oracles",
        "tpch": "TPC-H-shaped relational oracles (lineitem/orders/... tables)",
        "events": "Event-stream oracles (sessions, funnels, retention, trends)",
        "retrieval": "Index / BM25 / retrieval-surface oracles",
        "ann": "Vector / embedding / ANN / clustering oracles",
        "curation": "Dedup / text-quality / sampling / curation oracles",
    }
    emitted: dict[str, list[int]] = {d: [] for d in
                                     ("common",) + DOMAINS}
    for i, a in enumerate(assign):
        if a != "facade":
            emitted[a].append(i)

    def names_of(idx_list) -> list[str]:
        out = []
        for i in idx_list:
            out.extend(node_names(body_nodes[i]))
        return out

    for mod in ("common",) + DOMAINS:
        parts = [f'"""{mod_doc[mod]} (split from queries.py; see that module '
                 f'for the facade)."""\n\n']
        parts.append(header_src)
        if mod != "common":
            parts.append("\nfrom .common import *  # noqa: F401,F403\n")
            parts.append("from .common import (" + ", ".join(
                sorted(n for n in names_of(emitted["common"])
                       if n.startswith("_"))) + ")  # noqa: F401\n")
        parts.append("\n")
        for i in emitted[mod]:
            src_i = re.sub(r"^(\s*)from (\.+)([\w.]*) import ",
                           r"\1from .\2\3 import ", block(i),
                           flags=re.MULTILINE)
            parts.append("\n" + src_i.rstrip("\n") + "\n\n")
        allnames = sorted(set(names_of(emitted[mod])))
        parts.append("\n__all__ = [\n" + "".join(
            f"    {n!r},\n" for n in allnames) + "]\n")
        open(os.path.join(OUT_DIR, f"{mod}.py"), "w").write("".join(parts))

    open(os.path.join(OUT_DIR, "__init__.py"), "w").write(
        '"""Domain-split oracle modules; import via pipelines.queries."""\n')

    # ---- the facade ----------------------------------------------------------
    doc = '"""' + tree.body[0].value.value + '"""\n' if isinstance(
        tree.body[0], ast.Expr) else ""
    facade = [doc]
    facade.append("""
from __future__ import annotations

# Domain-split oracle modules (tools/split_queries.py did the partition by
# entry dependency); this module remains the single import surface — every
# symbol that ever lived here is re-exported, and the two driver maps below
# are unchanged.
""")
    for mod in ("common",) + DOMAINS:
        facade.append(f"from .oracles.{mod} import *  # noqa: F401,F403\n")
    for mod in ("common",) + DOMAINS:
        priv = sorted(n for n in set(names_of(emitted[mod]))
                      if n.startswith("_"))
        if priv:
            facade.append(f"from .oracles.{mod} import ("
                          + ", ".join(priv) + ")  # noqa: F401\n")
    facade.append("\n\n" + block(qmap_i).rstrip("\n") + "\n\n")
    facade.append("\n" + block(omap_i).rstrip("\n") + "\n")
    open(SRC, "w").write("".join(facade))

    sizes = {m: len(emitted[m]) for m in emitted}
    print("nodes:", sizes, "| facade keeps QUERIES + oracle_sql_map")
    for mod in ("common",) + DOMAINS:
        p = os.path.join(OUT_DIR, f"{mod}.py")
        print(mod, sum(1 for _ in open(p)), "lines")


if __name__ == "__main__":
    main()
