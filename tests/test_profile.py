"""Table profiling: exactness of counts/min/max, HLL distinct contract,
null handling, partition invariance."""

import numpy as np
import pandas as pd
import pytest

from archivesspace_virgo_ray.pipelines.profile import profile_columns


@pytest.fixture(scope="module")
def tbl():
    return pd.DataFrame({
        "ik": pd.Series([9, 10, 2, 2, None, 7], dtype="Int64"),
        "sk": ["b", "aa", None, "z", "z", "aa"],
    })


def test_profile_exact_stats_and_null_counts(ray_session, tbl):
    import ray.data

    out = profile_columns(
        ray.data.from_pandas(tbl).repartition(3), ["ik"], ["sk"]
    ).set_index("column")
    assert out.loc["ik", "n_rows"] == 6 and out.loc["ik", "n_nulls"] == 1
    # numeric merge: min must be 2 (a string-min would say "10" < "2" false
    # ordering — regression guard for the stringified-int pitfall)
    assert out.loc["ik", "min_v"] == "2" and out.loc["ik", "max_v"] == "10"
    assert out.loc["sk", "n_nulls"] == 1
    assert out.loc["sk", "min_v"] == "aa" and out.loc["sk", "max_v"] == "z"
    # small-cardinality HLL is exact-ish (linear counting regime)
    assert abs(out.loc["ik", "distinct_hll"] - 4) < 0.5
    assert abs(out.loc["sk", "distinct_hll"] - 3) < 0.5


def test_profile_partition_invariant(ray_session, tbl):
    import ray.data

    a = profile_columns(ray.data.from_pandas(tbl).repartition(1), ["ik"], ["sk"])
    b = profile_columns(ray.data.from_pandas(tbl).repartition(4), ["ik"], ["sk"])
    pd.testing.assert_frame_equal(a, b)


def test_profile_matches_hll_distinct_contract(ray_session):
    """The per-column estimate equals sketches.hll_distinct on the same
    column (same hash, same registers, same bias rule)."""
    import ray.data

    from archivesspace_virgo_ray.pipelines.sketches import hll_distinct

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id"])
    whole = hll_distinct(ds, "event_id")["estimate"].iloc[0]
    prof = profile_columns(ds, ["event_id"], [])
    assert prof["distinct_hll"].iloc[0] == whole
