"""connected_components: distributed propagation vs union-find ground truth."""

import numpy as np
import pandas as pd
import ray.data


def _ground_truth(edges: pd.DataFrame) -> pd.DataFrame:
    from archivesspace_virgo_ray.pipelines.components import _union_find

    return _union_find(edges["doc_a"].to_numpy(), edges["doc_b"].to_numpy())


def _norm(out) -> pd.DataFrame:
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    pdf = pdf.sort_values("doc_id", ignore_index=True)
    return pdf.astype({"doc_id": np.int64, "rep_id": np.int64})


def test_distributed_matches_union_find_random_graph(ray_session):
    from archivesspace_virgo_ray.pipelines.components import connected_components

    rng = np.random.default_rng(17)
    # several medium components + singleton edges + 63-bit ids (doc ids are
    # content-derived and wide — the hash/bucket path must not round-trip
    # them through float)
    a = rng.integers(0, 2**62, 400, dtype=np.int64)
    b = np.roll(a, 1)  # one big ring (diameter 400 — needs pointer doubling)
    c = rng.integers(0, 500, 300, dtype=np.int64)
    d = rng.integers(0, 500, 300, dtype=np.int64)
    edges = pd.DataFrame(
        {"doc_a": np.concatenate([a, c]), "doc_b": np.concatenate([b, d])}
    )
    edges = edges[edges["doc_a"] != edges["doc_b"]].reset_index(drop=True)
    exp = _ground_truth(edges)

    got = connected_components(
        ray.data.from_pandas(edges).repartition(5), driver_max_edges=0,
        n_buckets=8,
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_skew_component_100k_edges_off_driver(ray_session):
    """10^5-edge single component (boilerplate-corpus shape: a few hot hubs
    plus chains) through the distributed path — no driver-side edge
    materialization (driver_max_edges=0)."""
    from archivesspace_virgo_ray.pipelines.components import connected_components

    n = 100_000
    v = np.arange(1, n + 1, dtype=np.int64) * 7  # min vertex = 7
    rng = np.random.default_rng(3)
    hubs = rng.choice(v, 8, replace=False)
    doc_a = np.concatenate([v[:-1][: n // 2],
                            rng.choice(hubs, n - n // 2 + 1)])
    doc_b = np.concatenate([v[1:][: n // 2],  # chain prefix
                            rng.choice(v, n - n // 2 + 1)])
    edges = pd.DataFrame({"doc_a": doc_a, "doc_b": doc_b})
    edges = edges[edges["doc_a"] != edges["doc_b"]].reset_index(drop=True)

    got = connected_components(
        ray.data.from_pandas(edges).repartition(16), driver_max_edges=0
    )
    pdf = _norm(got)
    # the chain prefix and the hub edges overlap on v — everything is one
    # component rooted at min(v) = 7
    assert (pdf["rep_id"] == 7).all()
    assert len(pdf) == len(np.unique(np.concatenate([doc_a, doc_b])))


def test_small_path_threshold(ray_session):
    from archivesspace_virgo_ray.pipelines.components import connected_components

    edges = pd.DataFrame({"doc_a": [5, 2], "doc_b": [2, 9]})
    out = connected_components(edges)
    assert isinstance(out, pd.DataFrame)
    assert _norm(out).to_dict("list") == {
        "doc_id": [2, 5, 9], "rep_id": [2, 2, 2]
    }


def _bfs_reference(edges: pd.DataFrame, seeds, max_depth: int) -> pd.DataFrame:
    adj: dict[int, list[int]] = {}
    for s, d in zip(edges["src"].tolist(), edges["dst"].tolist()):
        adj.setdefault(int(s), []).append(int(d))
    visited = {int(s): 0 for s in seeds}
    frontier = sorted(visited)
    for depth in range(1, max_depth + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in visited:
                    nxt.add(m)
        for m in nxt:
            visited[m] = depth
        frontier = sorted(nxt)
    rows = sorted(visited.items())
    return pd.DataFrame({
        "node": pd.Series([r[0] for r in rows], dtype=np.int64),
        "depth": pd.Series([r[1] for r in rows], dtype=np.int64),
    })


def test_graph_traverse_min_depth_random_graph(ray_session):
    from archivesspace_virgo_ray.pipelines.components import graph_traverse

    rng = np.random.default_rng(23)
    # random sparse digraph with cycles and converging paths: min-depth
    # semantics must hold (a node reachable at depths 2 AND 4 reports 2)
    src = rng.integers(0, 300, 1200, dtype=np.int64)
    dst = rng.integers(0, 300, 1200, dtype=np.int64)
    edges = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    seeds = [0, 7, 250]
    exp = _bfs_reference(edges, seeds, 3)

    got = graph_traverse(
        ray.data.from_pandas(edges.reset_index(drop=True)).repartition(5),
        seeds, 3,
    )
    pd.testing.assert_frame_equal(got, exp)


def test_graph_traverse_empty_seeds_and_dead_ends(ray_session):
    from archivesspace_virgo_ray.pipelines.components import graph_traverse

    edges = pd.DataFrame({"src": [1, 2], "dst": [2, 3]}).astype(np.int64)
    ds = ray.data.from_pandas(edges)
    out = graph_traverse(ds, [], 3)
    assert len(out) == 0 and list(out.columns) == ["node", "depth"]
    # seed with no outgoing edges: returns itself only
    out2 = graph_traverse(ds, [99], 3)
    assert out2["node"].tolist() == [99] and out2["depth"].tolist() == [0]
    # chain stops at max_depth
    out3 = graph_traverse(ds, [1], 1)
    assert out3["node"].tolist() == [1, 2]
