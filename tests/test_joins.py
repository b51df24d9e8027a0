"""Bucketed hash join + as-of join operators."""

import numpy as np
import pandas as pd

from archivesspace_virgo_ray.pipelines.joins import asof_join_per_key, hash_join


def test_hash_join_matches_pandas(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50, 500), "lv": rng.standard_normal(500).round(3)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 50, 80), "rv": rng.standard_normal(80).round(3)}
    )
    got = (
        hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="k")
        .to_pandas()
        .sort_values(["k", "lv", "rv"], ignore_index=True)
    )
    want = left.merge(right, on="k").sort_values(["k", "lv", "rv"], ignore_index=True)
    # int columns come back as null-safe Int64 — compare values, not dtypes
    got = got[want.columns].astype({c: want[c].dtype for c in want.columns})
    pd.testing.assert_frame_equal(got, want)


def test_hash_join_inner_drops_unmatched(ray_session):
    import ray.data

    left = pd.DataFrame({"k": [1, 2, 3], "lv": ["a", "b", "c"]})
    right = pd.DataFrame({"k": [2], "rv": ["x"]})
    got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="k").to_pandas()
    assert got["k"].tolist() == [2] and got["rv"].tolist() == ["x"]


def test_asof_join_tie_break(ray_session):
    import ray.data

    left = pd.DataFrame(
        {"u": [1, 1], "ts": pd.to_datetime(["2026-01-01 10:00", "2026-01-01 12:00"]),
         "pid": [100, 101]}
    )
    right = pd.DataFrame(
        {
            "u": [1, 1, 1],
            "ts": pd.to_datetime(
                ["2026-01-01 09:00", "2026-01-01 09:00", "2026-01-01 11:00"]
            ),
            "val": [10.0, 20.0, 30.0],
            "event_id": [5, 7, 9],
        }
    )
    out = asof_join_per_key(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="u", ts="ts", value_cols=["val", "event_id"], tie_cols=["event_id"],
    ).to_pandas().sort_values("pid", ignore_index=True)
    # 10:00 purchase sees the 09:00 tie → highest event_id (7) wins
    assert out.loc[0, "val"] == 20.0
    assert out.loc[1, "val"] == 30.0


def test_hash_join_chains_keep_int_keys(ray_session):
    """Chaining joins must not lose rows: the first join's union NaN-pads
    the second key into float64, which used to hash into different buckets
    than the int64 right side."""
    import numpy as np
    import pandas as pd
    import ray.data

    from archivesspace_virgo_ray.pipelines.joins import hash_join

    pairs = ray.data.from_pandas(pd.DataFrame(
        {"a": np.arange(20, dtype=np.int64), "b": np.arange(20, 40, dtype=np.int64)}
    ))
    names_a = ray.data.from_pandas(pd.DataFrame(
        {"a": np.arange(20, dtype=np.int64), "name_a": [f"A{i}" for i in range(20)]}
    ))
    names_b = ray.data.from_pandas(pd.DataFrame(
        {"b": np.arange(20, 40, dtype=np.int64), "name_b": [f"B{i}" for i in range(20)]}
    ))
    out = hash_join(hash_join(pairs, names_a, on="a", n_buckets=4),
                    names_b, on="b", n_buckets=4).to_pandas()
    assert len(out) == 20
    # null-safe Int64 output dtype, no values lost
    assert str(out["a"].dtype) == "Int64" and str(out["b"].dtype) == "Int64"
    assert not out["a"].isna().any() and not out["b"].isna().any()
    out = out.sort_values("a", ignore_index=True)
    assert list(out["name_b"]) == [f"B{i}" for i in range(20)]


def test_hash_join_handles_nullable_int_sources(ray_session):
    """Source int columns containing nulls (Arrow nullable ints) must not
    crash the merge's dtype normalization, and left-join misses keep one
    schema across bucket groups."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from archivesspace_virgo_ray.pipelines.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array([10, None, 30, None], pa.int64()),  # nullable int
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 3], pa.int64()),
        "extra": pa.array([100, 300], pa.int64()),
    }))
    inner = hash_join(left, right, on="k", n_buckets=3).to_pandas()
    assert sorted(inner["k"]) == [1, 3]
    assert inner.set_index("k")["extra"].to_dict() == {1: 100, 3: 300}
    lj = hash_join(left, right, on="k", n_buckets=3, how="left").to_pandas()
    assert len(lj) == 4
    assert lj["extra"].isna().sum() == 2  # misses are nulls, not crashes


def test_hash_join_chains_wide_int64_keys_exactly(ray_session):
    """Content-derived doc ids are 61-63 bits — beyond float64's 2^53
    mantissa. A chained hash_join (whose intermediate carries nullable
    Int64 keys) must keep every such key's bucket consistent with a plain
    int64 side, or matches silently drop (the round-2 advisory repro)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from archivesspace_virgo_ray.pipelines.joins import hash_join

    # adjacent wide keys that collide when routed through float64
    base = np.int64(2**62)
    keys = np.array([base + i for i in range(8)], dtype=np.int64)
    a = ray.data.from_pandas(pd.DataFrame({"k": keys, "va": np.arange(8)}))
    b = ray.data.from_pandas(pd.DataFrame({"k": keys, "vb": np.arange(8) * 10}))
    c = ray.data.from_pandas(pd.DataFrame({"k": keys, "vc": np.arange(8) * 100}))

    step1 = hash_join(a, b, on="k", n_buckets=4)
    sch = step1.schema()
    ktype = dict(zip(sch.names, sch.types))["k"]
    assert str(ktype) == "int64"  # null-safe Int64 → arrow int64
    out = hash_join(step1, c, on="k", n_buckets=4).to_pandas()
    assert len(out) == 8  # every wide key matched through the chain
    out = out.sort_values("va", ignore_index=True)
    assert list(out["vc"]) == [i * 100 for i in range(8)]
    # and the keys survived bit-exactly
    assert sorted(int(k) for k in out["k"]) == sorted(int(k) for k in keys)
