"""Distributed connected components over an edge-list Dataset.

Alternating **large-star / small-star** rounds (Kiveris et al., "Connected
Components in MapReduce and Beyond"): each phase is ONE bucketed shuffle
keyed by a vertex hash with vectorized pandas reductions inside every bucket
group — never a Python call per vertex, never the edge list on the driver.
Intermediate edge counts never exceed the adjacency size (unlike
hash-to-min, which blows up to ~n² on path graphs — measured before this
design was chosen), and the alternation converges in O(log² n) rounds
worst-case, ~log n in practice (measured: 100k-edge path in 18 rounds,
400-ring in 8).

Convergence detection costs no extra shuffle: a group that rewires any edge
stamps a ``ch`` flag on its (always non-empty) output rows; the round's
materialized edge set sums the flags. At the fixpoint the edge set IS the
star set {(member, rep)}.

Small edge sets short-circuit to a driver-side union-find: exact same
result, none of the per-round shuffle fixed costs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

DRIVER_MAX_EDGES = 200_000


def _union_find(doc_a, doc_b) -> pd.DataFrame:
    """Driver-side min-label union-find over in-memory edge arrays."""
    label: dict[int, int] = {}

    def find(x):
        root = x
        while label.get(root, root) != root:
            root = label[root]
        while label.get(x, x) != x:
            label[x], x = root, label[x]
        return root

    for a_, b_ in zip(doc_a, doc_b):
        ra, rb = find(int(a_)), find(int(b_))
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            label[hi] = lo
    rows = sorted((int(d), find(int(d))) for d in set(doc_a) | set(doc_b))
    return pd.DataFrame(rows, columns=["doc_id", "rep_id"]).astype(np.int64)


def _vbucket(arr: np.ndarray, n_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(arr.astype(np.int64), categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def connected_components(
    edges,
    n_buckets: int = 64,
    max_iters: int = 64,
    driver_max_edges: int = DRIVER_MAX_EDGES,
):
    """edges: Dataset or DataFrame with int64 (doc_a, doc_b) columns.
    -> pandas/Dataset of (doc_id, rep_id), rep_id = min doc_id of the
    component, one row per vertex that appears in any edge.

    Returns pandas below ``driver_max_edges`` edges (union-find), a Dataset
    above it (distributed star rounds).
    """
    if isinstance(edges, pd.DataFrame):
        if len(edges) <= driver_max_edges:
            return _union_find(edges["doc_a"].to_numpy(), edges["doc_b"].to_numpy())
        import ray.data

        edges = ray.data.from_pandas(edges)
    # ONE canonicalize+materialize serves the count decision, the
    # union-find collect, AND the star rounds — counting the lazy handle
    # then re-consuming it would execute the whole LSH+verify lineage
    # twice, and keeping a separate raw materialized copy would double the
    # edge payload pinned in the object store
    E = edges.map_batches(_canon, batch_format="pandas").materialize()
    if E.count() <= driver_max_edges:
        pdf = E.to_pandas()
        return _union_find(pdf["a"].to_numpy(), pdf["b"].to_numpy())
    return _cc_distributed(E, n_buckets=n_buckets, max_iters=max_iters)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    x = df["doc_a"].to_numpy(np.int64)
    y = df["doc_b"].to_numpy(np.int64)
    a = np.maximum(x, y)
    b = np.minimum(x, y)
    out = pd.DataFrame({"a": a, "b": b, "ch": np.int64(0)})
    return out[out["a"] != out["b"]].drop_duplicates(["a", "b"]).reset_index(
        drop=True
    )


def _cc_distributed(E, n_buckets: int, max_iters: int):
    # E: materialized (a > b, ch) canonical edges; the working set
    # re-materializes per round (the algorithm's state — vertex-pair-sized,
    # 2 int64 columns)

    def sym_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # round start: the ch flag RESETS here (it only carries large-star's
        # verdict through small-star within one round)
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pd.DataFrame(
            {"u": u, "v": v, "ch": np.int64(0), "__vb__": _vbucket(u, n_buckets)}
        )

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        # per vertex u in this bucket: m = min(N(u) ∪ {u}); rewire each
        # neighbor v > u to m. A group changes iff m != u for some u that
        # has a larger neighbor.
        g = g.drop_duplicates(["u", "v"])
        ch_in = np.int64(1) if (g["ch"] > 0).any() else np.int64(0)
        mn = g.groupby("u", as_index=False)["v"].min().rename(columns={"v": "m"})
        mn["m"] = np.minimum(mn["m"].to_numpy(np.int64), mn["u"].to_numpy(np.int64))
        j = g.merge(mn, on="u")
        out = j.loc[j["v"] > j["u"], ["v", "m", "u"]]
        changed = np.int64(1) if (out["m"] != out["u"]).any() else np.int64(0)
        res = out[["v", "m"]].rename(columns={"v": "a", "m": "b"}).drop_duplicates()
        res["ch"] = max(changed, ch_in)
        return res.astype({"a": np.int64, "b": np.int64, "ch": np.int64})

    def max_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__vb__"] = _vbucket(df["a"].to_numpy(np.int64), n_buckets)
        return df

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        # edges arrive directed (a > b); per max-endpoint a: m = min(N⁻(a));
        # rewire every smaller neighbor (and a itself) to m. A group
        # changes iff it has ≥ 2 distinct smaller neighbors.
        g = g.drop_duplicates(["a", "b"])
        ch_in = np.int64(1) if (g["ch"] > 0).any() else np.int64(0)
        mn = g.groupby("a", as_index=False)["b"].min().rename(columns={"b": "m"})
        j = g.merge(mn, on="a")
        deg = j.groupby("a")["b"].transform("nunique")
        changed = np.int64(1) if (deg > 1).any() else np.int64(0)
        rewired = j.loc[j["b"] != j["m"], ["b", "m"]].rename(
            columns={"b": "a", "m": "b"}
        )
        stars = j[["a", "m"]].drop_duplicates().rename(columns={"m": "b"})
        res = pd.concat([rewired, stars], ignore_index=True).drop_duplicates()
        res = res[res["a"] != res["b"]]
        res["ch"] = max(changed, ch_in)
        return res.astype({"a": np.int64, "b": np.int64, "ch": np.int64})

    rounds = 0
    for rounds in range(1, max_iters + 1):
        E1 = (
            E.map_batches(sym_bucket, batch_format="pandas")
            .groupby("__vb__")
            .map_groups(large_star, batch_format="pandas")
        )
        E2 = (
            E1.map_batches(max_bucket, batch_format="pandas")
            .groupby("__vb__")
            .map_groups(small_star, batch_format="pandas")
            .materialize()
        )
        changed = E2.sum("ch")
        if os.environ.get("AVR_CC_DEBUG"):
            print(f"[cc] round={rounds} changed_groups={changed}", flush=True)
        E = E2
        if not changed:
            break

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # fixpoint edges are (member, rep); reps also list themselves
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        reps = np.unique(b)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([a, reps]),
                "rep_id": np.concatenate([b, reps]),
            }
        ).drop_duplicates()

    # the rep self-rows duplicate across blocks — one bucketed dedup keyed
    # by doc_id makes the output exact
    out = E.map_batches(finish, batch_format="pandas")

    def id_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__vb__"] = _vbucket(df["doc_id"].to_numpy(np.int64), n_buckets)
        return df

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", as_index=False)["rep_id"].min()

    return (
        out.map_batches(id_bucket, batch_format="pandas")
        .groupby("__vb__")
        .map_groups(dedup, batch_format="pandas")
    )


def graph_traverse(
    edges,
    seeds,
    max_depth: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """Bounded-depth BFS closure over an edge Dataset — the Solr
    ``{!graph from= to= maxDepth=N}`` qparser shape (reference gets this
    from Solr's GraphQuery; VirgoGenericFields-style ref hierarchies are
    the use case): every node reachable from ``seeds`` along src->dst
    edges in ≤ ``max_depth`` hops, with its MINIMUM hop count (seeds are
    depth 0).

    Each level is ONE column-pruned pass over the edge Dataset with the
    sorted frontier broadcast (``ray.put``) and matched vectorized
    (searchsorted); only matched dst values — per-batch deduped — leave
    the workers. The visited map lives on the driver: the contract is
    Solr's, where the reachable closure is query-result-sized even when
    the edge table is corpus-sized (the 100-TB shape is a huge edge
    Dataset streamed per level against a small expanding match set).

    -> DataFrame ``(node, depth)`` sorted by node.
    """
    import ray

    visited: dict[int, int] = {int(s): 0 for s in seeds}
    frontier = np.array(sorted(visited), dtype=np.int64)
    for depth in range(1, max_depth + 1):
        if len(frontier) == 0:
            break
        ref = ray.put(frontier)

        def expand(df: pd.DataFrame) -> pd.DataFrame:
            f = ray.get(ref)
            src = df[src_col].to_numpy(np.int64)
            pos = np.searchsorted(f, src)
            ok = pos < len(f)
            hit = np.zeros(len(src), dtype=bool)
            hit[ok] = f[pos[ok]] == src[ok]
            return pd.DataFrame(
                {"node": np.unique(df[dst_col].to_numpy(np.int64)[hit])}
            )

        out = edges.map_batches(expand, batch_format="pandas").to_pandas()
        # all-empty pandas blocks lose their schema (names=[]) in Ray
        if "node" in out.columns and len(out):
            nxt = sorted(
                int(n) for n in pd.unique(out["node"]) if int(n) not in visited
            )
        else:
            nxt = []
        for n in nxt:
            visited[n] = depth
        frontier = np.asarray(nxt, dtype=np.int64)
    rows = sorted(visited.items())
    return pd.DataFrame({
        "node": pd.Series([r[0] for r in rows], dtype=np.int64),
        "depth": pd.Series([r[1] for r in rows], dtype=np.int64),
    })
