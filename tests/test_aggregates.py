"""tree_aggregate: small-path vs keyed-fallback equivalence."""

import numpy as np
import pandas as pd
import ray.data


def test_keyed_fallback_matches_single_worker_path(ray_session):
    from archivesspace_virgo_ray.state.aggregates import tree_aggregate

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 700, n),
            "k2": rng.choice(["a", "b", None], n),
            "v": rng.integers(-100, 100, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["k1", "k2"], as_index=False, dropna=False).agg(
            total=("v", "sum"), lo=("v", "min"), n=("v", "size")
        )

    spec = {"total": "sum", "lo": "min", "n": "sum"}
    exp = partial(df).sort_values(["k1", "k2"], ignore_index=True)

    def norm(out_ds) -> pd.DataFrame:
        out = out_ds.to_pandas().sort_values(["k1", "k2"], ignore_index=True)
        for c in ("k1", "total", "lo", "n"):
            out[c] = out[c].astype(np.int64)
        return out

    small = tree_aggregate(ds, ["k1", "k2"], partial, spec).materialize()
    assert small.num_blocks() == 1  # single-worker final merge
    pd.testing.assert_frame_equal(norm(small), exp, check_dtype=False)

    # force the keyed fallback: merged partial table far exceeds 10 rows
    keyed = tree_aggregate(
        ds, ["k1", "k2"], partial, spec, keyed_fallback_rows=10
    )
    got = norm(keyed)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # null key groups survived both paths
    assert got["k2"].isna().any()
